from .radam import (
    FusedRAdamState,
    PlateauState,
    RAdamState,
    plateau_init,
    plateau_update,
    riemannian_adam,
    riemannian_adam_fused,
)

__all__ = [
    "FusedRAdamState",
    "PlateauState",
    "RAdamState",
    "plateau_init",
    "plateau_update",
    "riemannian_adam",
    "riemannian_adam_fused",
]
