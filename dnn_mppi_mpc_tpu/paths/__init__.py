from .bezier import (  # noqa: F401
    bezier_course_with_yaw,
    calc_4points_bezier_path,
    calc_bezier_path,
)
from .generators import circle_with_speed, lemniscate, lemniscate_with_speed, line  # noqa: F401
from .splines import CubicSpline1D, CubicSpline2D, calc_spline_course  # noqa: F401
