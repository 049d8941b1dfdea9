from memo_tpu.query.engine import QueryEngine  # noqa: F401
