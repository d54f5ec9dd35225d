#!/usr/bin/env python
"""End-to-end decode throughput: the full jitted test_step driven the way
trainer.test drives it (per-batch dispatches, logs forced only at the end,
so dispatch overlaps device work).  This is the VERDICT round-3 target
metric: objects/sec through test_step at B=8/N=1024 and N=4096.

Usage: python benchmarks/bench_decode.py [--n 1024] [--batch 8] [--batches 8]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--num_class", type=int, default=50)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 backbone compute (decode math stays fp32)")
    args = ap.parse_args()

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(
        dataset="shapenet", num_class=args.num_class, num_categories=16,
        fixed_points=args.n, eucl_dim=16, hyp_dim=16, k=20,
        t_per_anchor=20, num_triplets=4096, temperature=0.1,
        bf16=args.bf16,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(
        num_objects=args.batch * args.batches, npoints=args.n,
        num_categories=16, parts_per_object=6, seed=5)
    loader = DataLoader(ds, args.batch, drop_last=True)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in loader
    ]
    key = jax.random.PRNGKey(0)
    state = system.init(key, batches[0])
    temp = jnp.float32(cfg.temperature)

    # warm compile + drain the post-compile dispatch spike (the first ~16
    # dispatches after a compile run 100+ ms each on this backend)
    logs, _ = system.test_step(state, batches[0], key, temp)
    _ = float(logs["score"])
    for w in range(2):
        for i, b in enumerate(batches):
            logs, _ = system.test_step(
                state, b, jax.random.fold_in(key, 99 + 16 * w + i), temp)
        _ = float(logs["score"])

    # pipelined: enqueue all dispatches, stack scores on device, ONE fetch
    # (fetching each batch's score separately pays a tunnel RTT per batch);
    # 3 passes, report the best (tunnel load jitters run-to-run)
    n_obj = args.batch * len(batches)
    best = None
    for p in range(3):
        t0 = time.perf_counter()
        outs = []
        for i, b in enumerate(batches):
            logs, _ = system.test_step(
                state, b, jax.random.fold_in(key, 1000 * p + i), temp)
            outs.append(logs["score"])
        mean_score = float(jnp.mean(jnp.stack(outs)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"  pass {p}: {n_obj / dt:.1f} obj/s")
    print(f"test_step pipelined: {n_obj / best:.1f} obj/s "
          f"({best / len(batches) * 1e3:.1f} ms/batch of {args.batch}, "
          f"N={args.n}, mean score {mean_score:.3f})")

    # single-dispatch wall (the old, blocking measurement for reference)
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        logs, _ = system.test_step(state, b, jax.random.fold_in(key, i), temp)
        _ = float(logs["score"])
    dt = time.perf_counter() - t0
    print(f"test_step blocking:  {n_obj / dt:.1f} obj/s "
          f"({dt / len(batches) * 1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
