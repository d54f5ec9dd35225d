"""pytorch3d.transforms shim: uniform random rotations + batched application.

Only the surface used by the reference models (shapenet_hyp_hc.py:63-69):
`Rotate(R=random_rotations(B)).transform_points(points)` and
`RotateAxisAngle(angle, axis='Z', degrees=True)`. Points are [B, N, 3]; the
i-th object is rotated by the i-th matrix (row-vector convention, p @ R, as
in pytorch3d).
"""
import math

import torch


def random_quaternions(n, dtype=torch.float32, device=None):
    # Shoemake's method: uniform over SO(3)
    u = torch.rand(n, 3, dtype=dtype, device=device)
    u1, u2, u3 = u[:, 0], u[:, 1], u[:, 2]
    a, b = torch.sqrt(1 - u1), torch.sqrt(u1)
    q = torch.stack([
        a * torch.sin(2 * math.pi * u2),
        a * torch.cos(2 * math.pi * u2),
        b * torch.sin(2 * math.pi * u3),
        b * torch.cos(2 * math.pi * u3),
    ], dim=1)
    return q


def quaternion_to_matrix(q):
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = torch.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], dim=1).reshape(-1, 3, 3)
    return R


def random_rotations(n, dtype=torch.float32, device=None):
    return quaternion_to_matrix(random_quaternions(n, dtype=dtype, device=device))


class Rotate:
    def __init__(self, R, dtype=torch.float32, device=None, **kwargs):
        R = torch.as_tensor(R)
        if R.dim() == 2:
            R = R.unsqueeze(0)
        self.R = R

    def transform_points(self, points):
        pts = torch.as_tensor(points)
        R = self.R.to(pts.dtype)
        if pts.dim() == 2:
            return pts @ R[0]
        if R.shape[0] == 1 and pts.shape[0] > 1:
            R = R.expand(pts.shape[0], 3, 3)
        return torch.einsum("bnj,bji->bni", pts, R)


class RotateAxisAngle(Rotate):
    def __init__(self, angle, axis="X", degrees=True, dtype=torch.float32,
                 device=None, **kwargs):
        angle = torch.as_tensor(angle, dtype=dtype)
        if angle.dim() == 0:
            angle = angle.unsqueeze(0)
        if degrees:
            angle = angle * math.pi / 180.0
        c, s = torch.cos(angle), torch.sin(angle)
        one, zero = torch.ones_like(c), torch.zeros_like(c)
        axis = axis.upper()
        if axis == "X":
            rows = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            rows = [c, zero, s, zero, one, zero, -s, zero, c]
        elif axis == "Z":
            rows = [c, -s, zero, s, c, zero, zero, zero, one]
        else:
            raise ValueError(f"unknown axis {axis}")
        R = torch.stack(rows, dim=1).reshape(-1, 3, 3)
        super().__init__(R=R)
