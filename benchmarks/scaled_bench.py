#!/usr/bin/env python
"""Scaled-config benchmarks (BASELINE.json config #5): 4096-pt clouds.

Measures the Pallas-vs-XLA kNN at N=4096 (where the XLA path materializes a
16.8M-entry score matrix per cloud) plus the full VN-DGCNN forward, and the
training-step throughput at the flagship config.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def _barrier(x):
    return float(jnp.sum(x) if x.dtype != jnp.int32 else jnp.sum(x.astype(jnp.float32)))


def bench_knn(N=4096, B=8, k=20, d=3, iters=5):
    from hpcs_tpu.ops.knn import knn
    from hpcs_tpu.ops.pallas.knn_pallas import knn_pallas

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, d))
    out = {}
    for name, fn in [("xla", jax.jit(lambda x: knn(x, k))),
                     ("pallas", jax.jit(lambda x: knn_pallas(x, k)))]:
        idx = fn(x)
        _barrier(idx)
        t0 = time.perf_counter()
        for _ in range(iters):
            _barrier(fn(x))
        dt = (time.perf_counter() - t0) / iters
        out[name] = dt * 1e3
        print(f"knn[{name}] N={N} B={B}: {dt * 1e3:.2f} ms", file=sys.stderr, flush=True)
    return out


def bench_forward_4096(B=8, iters=3):
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(dataset="shapenet", num_class=50, num_categories=16,
                      fixed_points=4096, eucl_dim=32, hyp_dim=32, k=20)
    system = HypHCSystem(cfg)
    key = jax.random.PRNGKey(0)
    batch = {"points": jax.random.normal(key, (B, 4096, 3)),
             "labels": jnp.zeros((B, 4096), jnp.int32),
             "category": jnp.zeros((B,), jnp.int32)}
    state = system.init(key, batch)
    dv = jax.nn.one_hot(batch["category"], 16)

    @jax.jit
    def fwd(p, s, x, d):
        _, xp = system.net.apply({"params": p, "batch_stats": s}, x, d, train=False)
        return jnp.sum(xp)

    float(fwd(state.params, state.batch_stats, batch["points"], dv))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fwd(state.params, state.batch_stats, batch["points"], dv))
    dt = (time.perf_counter() - t0) / iters
    cps = B / dt
    print(f"forward 4096pt B={B}: {dt * 1e3:.1f} ms -> {cps:.1f} clouds/s",
          file=sys.stderr, flush=True)
    return cps


def bench_train_step(B=8, N=1024, iters=3):
    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(dataset="shapenet", num_class=12, num_categories=4,
                      fixed_points=N, eucl_dim=32, hyp_dim=32, k=20,
                      t_per_anchor=50, temperature=0.05)
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B, npoints=N, num_categories=4)
    batch = next(iter(DataLoader(ds, B)))
    key = jax.random.PRNGKey(0)
    state = system.init(key, batch)
    # two warm steps: the first post-compile dispatches on the axon tunnel
    # are erratically slow (100s-of-ms spikes); report the median
    for w in range(2):
        state, logs = system.train_step(state, batch, jax.random.fold_in(key, 100 + w),
                                        jnp.float32(0.05))
        float(logs["total_loss"])
    ts = []
    for i in range(max(iters, 8)):
        t0 = time.perf_counter()
        state, logs = system.train_step(state, batch, jax.random.fold_in(key, i),
                                        jnp.float32(0.05))
        float(logs["total_loss"])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"train_step B={B} N={N}: median {dt * 1e3:.1f} ms -> {B / dt:.1f} clouds/s",
          file=sys.stderr, flush=True)
    return B / dt


def bench_decode(B=8, N=1024, iters=3):
    from hpcs_tpu.decode import get_optimal_k
    from hpcs_tpu.decode.linkage import cosine_distance_matrix, linkage_from_distances_mnn as linkage_from_distances

    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (B, N, 32)) * 0.1
    labels = jax.random.randint(key, (B, N), 0, 12)

    @jax.jit
    def decode(emb, labels):
        def one(e, l):
            Z = linkage_from_distances(cosine_distance_matrix(e))
            _, _, s = get_optimal_k(l, Z, num_class=12, index="iou")
            return s

        return jax.vmap(one)(emb, labels)

    float(jnp.sum(decode(emb, labels)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(decode(emb, labels)))
    dt = (time.perf_counter() - t0) / iters
    print(f"decode(linkage+best-k) B={B} N={N}: {dt * 1e3:.1f} ms -> {B / dt:.1f} objects/s",
          file=sys.stderr, flush=True)
    return B / dt



def bench_fused_epoch(B=8, N=1024, steps=16):
    """Per-step cost inside the one-dispatch scanned epoch (the deployment
    training path) vs the per-dispatch step measured in bench_train_step."""
    import numpy as np

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.trainer import _make_fused_epoch, _stack_epoch

    cfg = ModelConfig(dataset="shapenet", num_class=12, num_categories=4,
                      fixed_points=N, eucl_dim=32, hyp_dim=32, k=20,
                      t_per_anchor=50, temperature=0.05)
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B * steps, npoints=N, num_categories=4)
    loader = DataLoader(ds, B)
    stacked, _ = _stack_epoch(loader)
    key = jax.random.PRNGKey(0)
    state = system.init(key, next(iter(loader)))
    epoch_fn = _make_fused_epoch(system)

    def run():
        st, k2, logs = epoch_fn(state, key, stacked, jnp.int32(0), jnp.float32(0.05))
        return float(jnp.sum(logs["total_loss"]))

    run()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps / steps
    print(f"fused-epoch train step B={B} N={N}: {dt * 1e3:.1f} ms/step -> {B / dt:.1f} clouds/s",
          file=sys.stderr, flush=True)
    return B / dt


if __name__ == "__main__":
    results = {}
    results["knn_4096_ms"] = bench_knn()
    results["forward_4096_clouds_per_s"] = bench_forward_4096()
    results["train_step_1024_clouds_per_s"] = bench_train_step()
    results["decode_1024_objects_per_s"] = bench_decode()
    results["fused_epoch_train_clouds_per_s"] = bench_fused_epoch()
    print(json.dumps(results))
