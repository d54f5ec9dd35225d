"""Minimal pytorch_lightning shim: enough to instantiate the reference's
LightningModules and drive their *_step methods manually from a plain torch
loop (tools/parity_experiment.py). No Trainer machinery is reproduced."""
import torch


class LightningModule(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self._logged = {}
        self.current_epoch = 0

    def log(self, name, value, **kwargs):
        if torch.is_tensor(value) and value.numel() == 1:
            value = float(value.detach())
        self._logged[name] = value

    def log_dict(self, d, **kwargs):
        for k, v in d.items():
            self.log(k, v)

    def save_hyperparameters(self, *args, **kwargs):
        pass

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")


class Trainer:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "ref_compat does not reproduce pl.Trainer; drive the module's "
            "*_step methods directly (see tools/parity_experiment.py)")


from . import callbacks, loggers  # noqa: E402,F401
