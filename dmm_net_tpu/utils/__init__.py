"""Utilities: compilation cache, logging/metrics, checkpointing, profiling."""

from dmm_net_tpu.utils.cache import enable_compilation_cache  # noqa: F401
from dmm_net_tpu.utils.logging import MetricsWriter, get_logger  # noqa: F401
