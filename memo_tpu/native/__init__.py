from memo_tpu.native.build import load_libms  # noqa: F401
