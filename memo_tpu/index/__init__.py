from memo_tpu.index.intervals import mem_overlap_intervals  # noqa: F401
from memo_tpu.index.store import IntervalStore  # noqa: F401
