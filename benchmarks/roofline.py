#!/usr/bin/env python
"""Roofline / MFU accounting for the flagship forward + test_step (VERDICT
r4 #5: give the perf story a denominator).

For each shape/dtype: XLA's own cost_analysis() supplies FLOPs and HBM
bytes for the compiled executable; measured wall time (on-device chained,
tunnel-dispatch-free) turns those into achieved TFLOP/s / GB/s and a
percent-of-roof against the v5e peaks.  The Pallas kNN custom call is
opaque to cost_analysis, so its arithmetic is added from the kernel's
analytic element-pass model (benchmarks/knn_kernel_experiments.py).

v5e (1 chip) roofs used, from public specs: 197 TFLOP/s bf16 MXU,
~49 TFLOP/s fp32-equivalent (HIGHEST = 6 bf16 passes -> /4 usable),
819 GB/s HBM, ~3.9 Tops/s VPU (1024 lanes x 4 ALUs x 0.94 GHz).

Usage: python benchmarks/roofline.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12
PEAK_FP32 = 49e12  # MXU fp32-equivalent via multi-pass bf16
PEAK_HBM = 819e9
PEAK_VPU = 3.9e12  # element ops/s


def flagship(n, b, bf16):
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(dataset="shapenet", num_class=50, num_categories=16,
                      fixed_points=n, eucl_dim=16, hyp_dim=16, k=20,
                      t_per_anchor=20, num_triplets=4096, bf16=bf16)
    system = HypHCSystem(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, 3), jnp.float32)
    oh = jax.nn.one_hot(jax.random.randint(key, (b,), 0, 16), 16)
    state = system.init(jax.random.PRNGKey(1),
                        {"points": x, "category": jnp.zeros((b,), jnp.int32)})

    def fwd(params, bs, x, oh):
        e, h, _ = system._apply(params, bs, x, oh, train=False)
        return jnp.sum(h.astype(jnp.float32)) + jnp.sum(e.astype(jnp.float32))

    return fwd, (state.params, state.batch_stats, x, oh)


def measure(fn, args, loops=10, reps=3):
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    float(jitted(*args))
    for _ in range(15):  # post-compile dispatch spike
        float(jitted(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(loops):
            float(jitted(*args))
        best = min(best, (time.perf_counter() - t0) / loops)
    return best, flops, bytes_


def knn_model(n, b, k=20, d=63, calls=3):
    """Element passes of the Pallas kNN custom calls (invisible to XLA):
    ~2 passes per selected neighbor over [N, N] + 2 for the score build."""
    return calls * b * n * n * (2 * k + 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    shapes = [(1024, 16), (4096, 8)]
    if args.quick:
        shapes = [(1024, 16)]
    print(f"{'shape':>14} {'dtype':>5} {'ms':>8} {'TFLOP/s':>8} "
          f"{'%MXU':>6} {'GB/s':>7} {'%HBM':>6} {'kNN %VPU':>9}")
    for n, b in shapes:
        for bf16 in (False, True):
            fn, a = flagship(n, b, bf16)
            ms, flops, bytes_ = measure(fn, a)
            tflops = flops / ms / 1e12
            gbps = bytes_ / ms / 1e9
            peak = PEAK_BF16 if bf16 else PEAK_FP32
            knn_elems = knn_model(n, b)
            # kNN share: standalone kernel time from knn_kernel_experiments
            knn_frac = knn_elems / PEAK_VPU / ms
            tag = "bf16" if bf16 else "fp32"
            print(f"{f'N={n} B={b}':>14} {tag:>5} {ms * 1e3:8.2f} "
                  f"{tflops:8.2f} {100 * tflops * 1e12 / peak:5.1f}% "
                  f"{gbps:7.1f} {100 * gbps * 1e9 / PEAK_HBM:5.1f}% "
                  f"{100 * knn_frac:8.1f}%")


if __name__ == "__main__":
    main()
