from .loop import TELEMETRY_DTYPE, RealtimeLoop  # noqa: F401
from .native import RatePacer, StateChannel, TelemetryRing, build_library  # noqa: F401
