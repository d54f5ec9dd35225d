#!/usr/bin/env python
"""A/B benchmark: VN feature layout "cv" [.., C, 3] vs lane-major "vc"
[.., 3, C] on the flagship VN-DGCNN forward (real TPU).

Usage: python benchmarks/layout_bench.py [B ...]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from hpcs_tpu.models import HypHCSystem, ModelConfig  # noqa: E402

NPOINTS = 1024
K = 20
LOOP = 10


def measure(layout, B):
    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=NPOINTS, eucl_dim=32, hyp_dim=32, k=K,
        temperature=0.05, t_per_anchor=50, layout=layout,
    )
    system = HypHCSystem(cfg)
    key = jax.random.PRNGKey(0)
    dv = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 16)
    batch = {"points": jax.random.normal(key, (B, NPOINTS, 3)),
             "labels": jnp.zeros((B, NPOINTS), jnp.int32),
             "category": jnp.zeros((B,), jnp.int32)}
    state = system.init(key, batch)
    points = batch["points"]

    @jax.jit
    def forward_loop(params, batch_stats, points, dv):
        def body(i, carry):
            pts = points + (i.astype(jnp.float32) * 1e-12) * carry[..., :1]
            _, x_poincare = system.net.apply(
                {"params": params, "batch_stats": batch_stats}, pts, dv, train=False
            )
            return carry + x_poincare.mean(axis=(1, 2), keepdims=True)

        out = jax.lax.fori_loop(
            0, LOOP, body, jnp.zeros((points.shape[0], 1, 1), jnp.float32)
        )
        return jnp.sum(out)

    t0 = time.perf_counter()
    float(forward_loop(state.params, state.batch_stats, points, dv))
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(forward_loop(state.params, state.batch_stats, points, dv))
    dt = time.perf_counter() - t0
    cps = B * LOOP * reps / dt
    ms = dt / (LOOP * reps) * 1e3
    print(f"layout={layout} B={B}: {cps:.1f} clouds/s ({ms:.2f} ms/forward, "
          f"compile {compile_s:.0f}s)", flush=True)
    return cps, ms


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [16, 32]
    out = {}
    for layout in ("cv", "vc"):
        for B in batches:
            cps, ms = measure(layout, B)
            out[f"{layout}_B{B}"] = {"clouds_per_sec": round(cps, 1),
                                     "ms_per_forward": round(ms, 2)}
    print(json.dumps(out))
