from .cem import CEMConfig, CEMSolver, CEMState, cem_step  # noqa: F401
from .mppi import (  # noqa: F401
    MPPIAux,
    MPPISolver,
    MPPIState,
    make_generic_fused_tick,
    make_generic_pallas_rollout,
    make_pallas_diffdrive_rollout,
    make_tracking_costs,
    mppi_step,
    sampled_trajectories,
)
