"""Fused Pallas kNN kernel for TPU.

Replaces the reference's dense Gram + library top-k
(/root/reference/hpcs/nn/dgcnn/utils/vn_dgcnn_util.py:4-10) with a kernel
that computes a [TN, N] score tile on the MXU and selects the k nearest
in-register, so the [N, N] matrix never reaches HBM — materializing it costs
~25 ms at B=64/N=1024 (measured), which also rules out XLA's sort-based
lax.top_k path (~22 ms end to end vs ~4-8 ms here).

Precision: the TPU default single-pass-bf16 matmul perturbs scores enough to
flip ~12% of neighbor entries when the input cloud is rotated, which destroys
the SO(3)-invariance property this architecture exists for.  Three score
paths, all reaching (near-)fp32 stability without Mosaic's expensive HIGHEST
(6-pass) mode where possible:

- D <= 4 (coordinate graphs): EXACT fp32 scores from D broadcast-fma passes
  on the VPU — no matmul at all, so no precision tax;
- `mode="split"` (default for larger D): two-limb bf16 splitting — x = hi +
  lo with both limbs bf16-exact, scores from THREE single-pass bf16 matmuls
  (hi.hi + hi.lo + lo.hi, each exact under fp32 accumulation; the dropped
  lo.lo term is ~4e-6 relative, below the fp32 noise floor of the scores);
- `mode="exact"`: Precision.HIGHEST (6-pass), bit-level fp32;
- `mode="fast"` / HPCS_TPU_KNN_FAST=1: single-pass bf16, accepts graph
  jitter under rotation.

Ranking key: 2 x_i.x_j - |x_j|^2 (the row's own -|x_i|^2 is constant per row
and cannot change the ordering).  Ties pick the smallest index, matching
jax.lax.top_k / torch.topk.
"""
import functools
import os

import jax
import jax.numpy as jnp

from ..knn import knn as knn_xla

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_NEG_INF = -3.4e38  # python float: jnp scalars would be captured tracers


def _knn_kernel(x_rows_ref, x_allT_ref, idx_ref, *, k, mode, select="argmax"):
    x_rows = x_rows_ref[0]  # [TN, D]
    x_allT = x_allT_ref[0]  # [D, N] (component-major copy for the VPU path)
    d = x_rows.shape[1]
    n = x_allT.shape[1]
    tn = x_rows.shape[0]

    if d <= 4:
        # EXACT fp32 scores from d broadcast-fma VPU passes — no matmul
        scores = jnp.zeros((tn, n), jnp.float32)
        col_sq = jnp.zeros((1, n), jnp.float32)
        for dd in range(d):
            col = x_allT[dd:dd + 1, :]  # [1, N]
            row = x_rows[:, dd:dd + 1]  # [TN, 1]
            scores = scores + 2.0 * (row * col)
            col_sq = col_sq + col * col
        scores = scores - col_sq
    else:
        # matmul path: contract the row tile [TN, D] against the transposed
        # cloud [D, N] on the MXU
        col_sq = jnp.sum(x_allT * x_allT, axis=0)[None, :]  # [1, N]
        dims = (((1,), (0,)), ((), ()))
        if mode == "exact":
            inner = jax.lax.dot_general(x_rows, x_allT, dimension_numbers=dims,
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
        elif mode == "split":
            r_hi = x_rows.astype(jnp.bfloat16)
            r_lo = (x_rows - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            a_hi = x_allT.astype(jnp.bfloat16)
            a_lo = (x_allT - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def mm(a, b):
                return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                           preferred_element_type=jnp.float32)

            inner = mm(r_hi, a_hi) + mm(r_hi, a_lo) + mm(r_lo, a_hi)
        else:
            inner = jax.lax.dot_general(x_rows, x_allT, dimension_numbers=dims,
                                        preferred_element_type=jnp.float32)
        scores = 2.0 * inner - col_sq

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, n), dimension=1)
    if select == "argmax":
        # argmax returns the FIRST maximum = smallest tied index (same tie
        # rule as the max+where+min composition below) in one fused reduce.
        # Measured on v5e (N=4096/B=8, benchmarks/knn_kernel_experiments.py):
        # 5.47 vs 5.66 ms — only 1.03x, i.e. the kernel is NOT selection-
        # pass-bound (Mosaic already keeps the composition in vregs); kept
        # as default for the marginally better time and simpler code
        for j in range(k):
            amax = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [TN]
            idx_ref[0, :, j] = amax
            scores = jnp.where(col_ids == amax[:, None], _NEG_INF, scores)
    else:  # "iter": the original max -> tie mask -> min-index composition
        for j in range(k):
            m = jnp.max(scores, axis=1, keepdims=True)  # [TN, 1]
            hit = scores == m
            amax = jnp.min(jnp.where(hit, col_ids, n), axis=1)  # smallest tied
            idx_ref[0, :, j] = amax
            scores = jnp.where(col_ids == amax[:, None], _NEG_INF, scores)


def _pick_row_tile(n):
    for tn in (256, 128, 64, 32, 16, 8):
        if n % tn == 0:
            return tn
    return None


def _default_mode():
    if os.environ.get("HPCS_TPU_KNN_FAST") == "1":
        return "fast"
    # split: 0.9999 neighbor agreement with the fp32 oracle (D=63, B=64,
    # measured on v5e) at half the passes of HIGHEST; D <= 4 inputs always
    # take the exact VPU path regardless of mode
    return os.environ.get("HPCS_TPU_KNN_MODE", "split")


@functools.partial(jax.jit, static_argnames=("k", "interpret", "exact", "mode",
                                              "select", "tile"))
def knn_pallas(x, k, interpret=False, exact=None, mode=None, select=None,
               tile=None):
    """Indices [B, N, k] of the k nearest neighbors (self included).

    x: [B, N, D] fp32.  mode: "exact" | "split" | "fast" (see module
    docstring); `exact` is a legacy alias (True->"exact", False->"fast").
    select: "argmax" (default; one fused first-max reduce per neighbor) or
    "iter" (the original max->mask->min composition) — bit-identical outputs;
    measured a wash on v5e (1.03x at N=4096/B=8, ~1.03 Telem/s VPU element
    throughput either way: benchmarks/knn_kernel_experiments.py — the kernel
    is not selection-pass-bound).  tile overrides the row-tile size (tiles
    whose [tn, N] score block exceeds ~16 MB scoped vmem fail to compile;
    the default picker stays <= 256).
    For D <= 4 the kernel always computes exact fp32 scores on the VPU.
    Falls back to the XLA path when shapes do not tile or Pallas is
    unavailable.
    """
    if mode is None:
        if exact is not None:
            mode = "exact" if exact else "fast"
        else:
            mode = _default_mode()
    if select is None:
        select = os.environ.get("HPCS_TPU_KNN_SELECT", "argmax")
    B, N, D = x.shape
    tn = tile if tile is not None else _pick_row_tile(N)
    if not HAVE_PALLAS or tn is None or k > N or N % tn != 0:
        return knn_xla(x, k)

    # indices are piecewise-constant in x: no gradient flows through the
    # graph topology (matches torch.topk indices), and pallas_call has no
    # autodiff rule anyway.
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    xT = x.transpose(0, 2, 1)  # [B, D, N]
    kernel = functools.partial(_knn_kernel, k=k, mode=mode, select=select)
    grid = (B, N // tn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        interpret=interpret,
    )(x, xT)
