from .logging import MetricsWriter, get_logger, save_episode_csv  # noqa: F401
from .profiling import Timer, mppi_roofline, time_fn, trace  # noqa: F401
