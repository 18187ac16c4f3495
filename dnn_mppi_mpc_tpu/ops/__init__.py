from . import costs, filters, sampling, waypoints  # noqa: F401
