from .radam import (
    PlateauState,
    RAdamState,
    plateau_init,
    plateau_update,
    riemannian_adam,
)

__all__ = [
    "PlateauState",
    "RAdamState",
    "plateau_init",
    "plateau_update",
    "riemannian_adam",
]
