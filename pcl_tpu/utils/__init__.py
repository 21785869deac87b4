from pcl_tpu.utils.logging import get_logger, set_verbosity
from pcl_tpu.utils.timing import ScopeTime, StopWatch, EventFrequency

__all__ = ["get_logger", "set_verbosity", "ScopeTime", "StopWatch", "EventFrequency"]
