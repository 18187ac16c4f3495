from .dynamics import (  # noqa: F401
    BicycleParams,
    DynamicBicycleParams,
    FourWheelParams,
    dynamic_bicycle,
    four_wheel_torque,
    kinematic_bicycle,
    residual_dynamics,
    unicycle,
)
from .integrators import discretize, erk_step, euler_step, rk4_step, rollout  # noqa: F401
