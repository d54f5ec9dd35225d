#!/usr/bin/env python
"""Batch-1 serving latency for the flagship VN-DGCNN forward.

The reference's own benchmark entry point is batch-1 inference
(/root/reference/infer.py:35-46 runs `--test_batches 10` at batch 1), so
single-cloud latency is the apples-to-apples serving metric next to
bench.py's batched throughput headline.

Measured v5e (2026-08-18, flagship config eucl/hyp 32, k=20, N=1024):
1.048 ms fp32 / 0.803 ms bf16 per cloud — ~2900x the reference's measured
CPU batch-1 (2326 ms/cloud, benchmarks/baseline_cpu.json).

Methodology note: the forward is chained ITERS times inside one jitted
fori_loop and the wall time divided, so the number is pure device latency.
Naive per-call timing through the remote axon tunnel reads ~28-35 ms —
that is network round-trip, not device time (and block_until_ready does
not synchronize on axon; float() of the result is the only barrier).

Usage: python benchmarks/latency_b1.py [--n 1024] [--iters 100]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from hpcs_tpu import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()

    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.models.base import decode_vector_for_batch

    for bf16 in (False, True):
        cfg = ModelConfig(
            dataset="shapenet", num_class=50, num_categories=16,
            fixed_points=args.n, eucl_dim=32, hyp_dim=32, k=20,
            t_per_anchor=50, temperature=0.05, bf16=bf16,
        )
        system = HypHCSystem(cfg)
        key = jax.random.PRNGKey(0)
        batch = {
            "points": jax.random.normal(key, (1, args.n, 3)),
            "labels": jnp.zeros((1, args.n), jnp.int32),
            "category": jnp.zeros((1,), jnp.int32),
        }
        state = system.init(key, batch)
        dv = decode_vector_for_batch(cfg, batch)

        @jax.jit
        def loop(p, bs, pts, d, _system=system):
            def body(i, carry):
                # carry*0.0 chains iterations so XLA cannot hoist the body
                out = _system._apply(p, bs, pts + carry * 0.0, d,
                                     train=False)[0]
                return carry + out.sum()

            return lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

        float(loop(state.params, state.batch_stats, batch["points"], dv))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(state.params, state.batch_stats, batch["points"], dv))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"bf16={int(bf16)} batch-1 N={args.n} on-device forward "
              f"latency: {best * 1e3:.3f} ms/cloud", flush=True)


if __name__ == "__main__":
    main()
