from memo_tpu.utils.logging import get_logger  # noqa: F401
from memo_tpu.utils.profiling import stage_timer, trace_context  # noqa: F401
