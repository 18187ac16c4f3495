from .bullet_bridge import BulletAckermannEnv, BulletDiffDriveEnv, has_pybullet  # noqa: F401
from .closed_loop import Episode, collect_residual_dataset, run_closed_loop  # noqa: F401
from .kinematics import ackermann_wheel_speeds, diff_drive_wheel_speeds  # noqa: F401
from .obstacles import chase_obstacles, drift_obstacles, sinusoid_obstacles  # noqa: F401
from .plants import Plant, PlantState  # noqa: F401
