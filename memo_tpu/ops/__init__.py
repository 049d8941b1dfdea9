from memo_tpu.ops.query_ops import coverage_marks, conservation_from_marks, membership_from_marks  # noqa: F401
