from . import common_functions, loss_and_miner_utils  # noqa: F401
