import torch


def tanh(x):
    return torch.tanh(x)


def arsinh(x):
    return torch.asinh(x)


def _lambda_x(x, c, keepdim=False, dim=-1):
    return 2 / (1 - c * x.pow(2).sum(dim=dim, keepdim=keepdim)).clamp_min(1e-15)
