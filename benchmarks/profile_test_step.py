#!/usr/bin/env python
"""Decompose the full test_step cost on REAL model embeddings (not the
idealized clustered microbench data): forward+losses, linkage, sweep —
each timed as on-device chained fori_loops (tunnel discipline: scalar out,
float() barrier).

Usage: python benchmarks/profile_test_step.py [--n 1024] [--batch 8]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed_loop(make_one, iters=4, label=""):
    @jax.jit
    def chained(key):
        def body(i, acc):
            return acc + make_one(jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    float(chained(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms/call ({iters} chained)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_class", type=int, default=50)
    args = ap.parse_args()

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.decode import get_optimal_k
    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )
    from hpcs_tpu.geometry import project
    from hpcs_tpu.loss.hyphc import normalize_to_radius
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    B, N, C = args.batch, args.n, args.num_class
    cfg = ModelConfig(
        dataset="shapenet", num_class=C, num_categories=16,
        fixed_points=N, eucl_dim=16, hyp_dim=16, k=20,
        t_per_anchor=20, num_triplets=4096, temperature=0.1,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B, npoints=N, num_categories=16,
                              parts_per_object=6, seed=5)
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(DataLoader(ds, B))).items()}
    key = jax.random.PRNGKey(0)
    state = system.init(key, batch)
    temp = jnp.float32(cfg.temperature)

    # real embeddings (what decode actually consumes)
    from hpcs_tpu.models.base import decode_vector_for_batch
    dv = decode_vector_for_batch(cfg, batch)

    @jax.jit
    def embed(params, bs, pts):
        _, x_p, _ = system._apply(params, bs, pts, dv, False)
        return x_p

    x_p = embed(state.params, state.batch_stats, batch["points"])
    scale = state.params["scale"][0]
    labels = batch["labels"]
    leaves = jax.jit(jax.vmap(
        lambda e: project(normalize_to_radius(e, scale))))(x_p)
    D_all = jax.jit(jax.vmap(cosine_distance_matrix))(leaves)
    D_all = jax.device_get(D_all)
    D_all = jnp.asarray(D_all)

    def fwd_losses(key):
        logs = system.eval_step(state, batch, key, temp)
        return logs["val_loss"]

    # eval_step is its own jit; time it via repeated dispatch instead.
    # NB: the first ~8 dispatches after a compile spike to 100+ ms on this
    # backend — warm with a full pipelined pass before measuring.
    float(fwd_losses(key))
    for i in range(8):
        v = fwd_losses(jax.random.fold_in(key, 100 + i))
    float(v)
    t0 = time.perf_counter()
    for i in range(8):
        v = fwd_losses(jax.random.fold_in(key, i))
    float(v)
    print(f"eval_step (fwd+losses, pipelined dispatch): "
          f"{(time.perf_counter() - t0) / 8 * 1e3:.2f} ms/call")

    def linkage_only(k_):
        # perturb distances so XLA can't hoist, but keep realistic structure
        eps = 1e-6 * jax.random.uniform(k_, (1,))
        Z = jax.vmap(lambda d: linkage_from_distances_mnn(d + eps))(D_all)
        return jnp.sum(Z[:, -1, 2])

    def sweep_only(k_):
        eps = 1e-6 * jax.random.uniform(k_, (1,))
        Z = jax.vmap(lambda d: linkage_from_distances_mnn(d + eps))(D_all)

        def one(l, z):
            _, _, s = get_optimal_k(l, z, num_class=C, index="iou")
            return s

        return jnp.sum(jax.vmap(one)(labels, Z))

    if args.n <= 2048:
        t_link = timed_loop(linkage_only, label=f"linkage(real emb) B={B} N={N}")
        t_full = timed_loop(sweep_only, label=f"linkage+sweep(real emb) B={B} N={N}")
    else:
        # the chained-loop HLO exceeds the remote-compile payload limit at
        # N=4096 (HTTP 413); measure by pipelined dispatch instead (warm a
        # full pass first — the post-compile dispatch spike lasts ~8 calls)
        def dispatch_time(fn, label):
            jfn = jax.jit(fn)
            key = jax.random.PRNGKey(0)
            float(jfn(key))
            for i in range(8):
                v = jfn(jax.random.fold_in(key, 100 + i))
            float(v)
            t0 = time.perf_counter()
            for i in range(8):
                v = jfn(jax.random.fold_in(key, i))
            float(v)
            dt = (time.perf_counter() - t0) / 8
            print(f"{label}: {dt * 1e3:.2f} ms/call (pipelined dispatch)")
            return dt

        t_link = dispatch_time(linkage_only, f"linkage(real emb) B={B} N={N}")
        t_full = dispatch_time(sweep_only, f"linkage+sweep(real emb) B={B} N={N}")
    print(f"sweep alone: {(t_full - t_link) * 1e3:.2f} ms")
    print(f"objects/sec decode-only (device): {B / t_full:.1f}")


if __name__ == "__main__":
    main()
