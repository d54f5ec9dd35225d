"""Device-side random rotation augmentation.

The reference rotates on the *CPU* through pytorch3d
(/root/reference/hpcs/models/shapenet_hyp_hc.py:63-69), forcing a host
round-trip every step.  Here rotations are sampled and applied on device
inside the jitted step: uniform SO(3) via unit quaternions, or a uniform
z-axis (yaw) rotation.
"""
import jax
import jax.numpy as jnp


def random_so3(key, batch):
    """Uniform random rotation matrices [batch, 3, 3] (Shoemake quaternions)."""
    q = jax.random.normal(key, (batch, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def random_z(key, batch):
    """Random yaw rotations [batch, 3, 3]."""
    a = jax.random.uniform(key, (batch,)) * 2 * jnp.pi
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        axis=-2,
    )


def rotate_cloud(points, R):
    """points [B, N, 3] x R [B, 3, 3] -> rotated clouds.

    HIGHEST precision is load-bearing: at the TPU default (single-pass bf16)
    the APPLIED rotation quantizes coordinates by ~4e-3 relative — the
    'rotated' cloud is genuinely different geometry, and ~12% of kNN rows
    flip neighbors (measured, and confirmed by a float64 oracle flipping the
    SAME rows: benchmarks/so3_residual_probe.py).  That — not kNN scoring —
    was the round-2 'TPU SO(3) residual'.  The contraction dim is 3, so the
    exact pass costs nothing."""
    return jnp.einsum("bnv,bwv->bnw", points, R,
                      precision=jax.lax.Precision.HIGHEST)


def augment(key, points, mode: str):
    """mode in {'so3', 'z', 'none'} (reference train/test_rotation flags)."""
    if mode == "so3":
        return rotate_cloud(points, random_so3(key, points.shape[0]))
    if mode == "z":
        return rotate_cloud(points, random_z(key, points.shape[0]))
    return points
