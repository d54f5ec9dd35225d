#!/usr/bin/env python
"""Decode-path microbenchmarks (round-3 optimization target).

Times the vmapped MNN linkage and the best-k sweep separately, then the full
test_step, on the tunneled TPU.  Measurement discipline: chain iterations in
an on-device fori_loop with per-iteration fresh inputs derived from
fold_in(key, i) (prevents XLA hoisting), return one scalar, barrier with
float() — `block_until_ready` does not synchronize on this backend.

Usage: python benchmarks/profile_decode.py [--trace DIR]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed_loop(make_one, iters=8, label=""):
    """make_one(key) -> scalar; returns seconds per call (on-device chained)."""

    @jax.jit
    def chained(key):
        def body(i, acc):
            return acc + make_one(jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    k = jax.random.PRNGKey(0)
    float(chained(k))  # compile + warm
    t0 = time.perf_counter()
    float(chained(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms/call ({iters} chained)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--num_class", type=int, default=50)
    args = ap.parse_args()

    from hpcs_tpu.decode import get_optimal_k
    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )

    B, N, C = args.batch, args.n, args.num_class

    def make_x(key):
        # clustered data so the MNN round count matches realistic decode
        kc, kp, kl = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (B, 8, 8))
        assign = jax.random.randint(kl, (B, N), 0, 8)
        x = jnp.take_along_axis(centers, assign[..., None], axis=1) \
            + 0.05 * jax.random.normal(kp, (B, N, 8))
        return x, assign

    def linkage_only(key):
        x, _ = make_x(key)
        Z = jax.vmap(lambda v: linkage_from_distances_mnn(
            cosine_distance_matrix(v)))(x)
        return jnp.sum(Z[:, -1, 2])

    def sweep_only(key):
        x, labels = make_x(key)
        Z = jax.vmap(lambda v: linkage_from_distances_mnn(
            cosine_distance_matrix(v)))(x)
        Z = jax.lax.stop_gradient(Z)

        def one(l, z):
            _, _, s = get_optimal_k(l, z, num_class=C, index="iou")
            return s

        return jnp.sum(jax.vmap(one)(labels, Z))

    t_link = timed_loop(linkage_only, label=f"linkage B={B} N={N}")
    t_full = timed_loop(sweep_only, label=f"linkage+sweep B={B} N={N}")
    print(f"sweep alone: {(t_full - t_link) * 1e3:.2f} ms")
    print(f"objects/sec (device, fused): {B / t_full:.1f}")

    if args.trace:
        x, labels = jax.jit(make_x)(jax.random.PRNGKey(7))

        @jax.jit
        def one_shot(x, labels):
            Z = jax.vmap(lambda v: linkage_from_distances_mnn(
                cosine_distance_matrix(v)))(x)

            def one(l, z):
                _, _, s = get_optimal_k(l, z, num_class=C, index="iou")
                return s

            return jnp.sum(jax.vmap(one)(labels, Z))

        float(one_shot(x, labels))
        with jax.profiler.trace(args.trace):
            float(one_shot(x, labels))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
