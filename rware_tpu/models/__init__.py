from rware_tpu.models.ippo import (
    IPPOConfig,
    RunnerState,
    Transition,
    build_train_step,
    init_runner,
    make_optimizer,
)
from rware_tpu.models.networks import (
    ActorCritic,
    CentralCritic,
    RecurrentActorCritic,
    sample_action,
)

__all__ = [
    "ActorCritic",
    "CentralCritic",
    "IPPOConfig",
    "RecurrentActorCritic",
    "RunnerState",
    "Transition",
    "build_train_step",
    "init_runner",
    "make_optimizer",
    "sample_action",
]
