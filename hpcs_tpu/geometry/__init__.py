from .math_ops import arcosh, arsinh, artanh, cosh, rot_3d, sinh, tanh
from .poincare import (
    BALL_EPS_F32,
    MIN_NORM,
    egrad2rgrad,
    expmap,
    expmap0,
    get_midpoint_o,
    gyration,
    hyp_dist_o,
    hyp_distance,
    hyp_distance_mat,
    inner,
    lambda_,
    logmap0,
    mobius_add,
    mobius_mul,
    project,
    ptransp,
)
from .lca import euc_reflection, gyro_midpoint, hyp_lca, hyp_lca_mat, hyp_lca_midpoint

__all__ = [
    "arcosh", "arsinh", "artanh", "cosh", "sinh", "tanh", "rot_3d",
    "BALL_EPS_F32", "MIN_NORM",
    "egrad2rgrad", "expmap", "expmap0", "logmap0", "get_midpoint_o",
    "gyration", "hyp_dist_o", "hyp_distance", "hyp_distance_mat", "inner",
    "lambda_", "mobius_add", "mobius_mul", "project", "ptransp",
    "hyp_lca", "hyp_lca_mat", "hyp_lca_midpoint", "gyro_midpoint", "euc_reflection",
]
