#!/usr/bin/env python
"""Root-cause probe for the vc-layout training pathology (VERDICT r4 #7).

Measured round 2: layout=vc TRAIN step is ~2.7x slower than cv with the
fused (packed-bucket) optimizer, while inference is layout-neutral.  Two
candidate culprits:

  (a) the packed-optimizer pack/unpack interacting badly with the
      transposed [.., 3, C] leaves, or
  (b) an XLA backward-fusion pathology in the vc gradient graph itself
      (independent of the optimizer).

Disambiguate by the 2x2: {cv, vc} x {fused RAdam, per-leaf RAdam}, plus a
grad-only row ({cv, vc} x value_and_grad with NO optimizer apply) and an
optimizer-only row (apply precomputed grads).  If vc is slow even
grad-only, it's (b); if vc is only slow with the fused apply, (a).

Usage: python benchmarks/layout_backward_probe.py [--n 1024] [--batch 8]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import optax


def build(layout, args):
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=args.n, eucl_dim=args.eucl, hyp_dim=args.hyp, k=20,
        t_per_anchor=args.tpa, num_triplets=4096, temperature=0.1,
        layout=layout,
    )
    system = HypHCSystem(cfg)
    key = jax.random.PRNGKey(0)
    batch = {
        "points": jax.random.normal(key, (args.batch, args.n, 3)),
        "labels": jax.random.randint(key, (args.batch, args.n), 0, 50),
        "category": jnp.zeros((args.batch,), jnp.int32),
    }
    state = system.init(key, batch)
    return system, state, batch


def timeit(fn, *a):
    # float() of an output element is the completion barrier: on the axon
    # backend jax.block_until_ready does NOT synchronize (bench.py:167-169).
    # Executions are in-order per stream, so pulling one element of the
    # LAST output fences the whole 5-iteration burst.
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    sync(fn(*a))  # compile
    for _ in range(3):
        sync(fn(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / 5)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eucl", type=int, default=16)
    ap.add_argument("--hyp", type=int, default=16)
    ap.add_argument("--tpa", type=int, default=20)
    args = ap.parse_args()

    from hpcs_tpu.optim import riemannian_adam, riemannian_adam_fused

    results = {}
    key = jax.random.PRNGKey(7)
    temp = jnp.float32(0.1)
    for layout in ("cv", "vc"):
        system, state, batch = build(layout, args)

        # full train_step (fused optimizer — the production config)
        ms = timeit(lambda s, b: system.train_step(s, b, key, temp)[0].params,
                    state, batch)
        results[f"{layout}/train_fused"] = round(ms, 2)
        print(f"{layout} train_step fused-RAdam:   {ms:7.2f} ms", flush=True)

        # grad-only: forward+backward, no optimizer apply
        grad_fn = jax.jit(
            lambda s, b: system.grads_and_logs(s, b, key, temp)[0])
        ms = timeit(grad_fn, state, batch)
        results[f"{layout}/grad_only"] = round(ms, 2)
        print(f"{layout} value_and_grad only:      {ms:7.2f} ms", flush=True)

        grads = grad_fn(state, batch)

        # optimizer apply in isolation, on precomputed grads
        for name, tx_f in (("fused", riemannian_adam_fused),
                           ("perleaf", riemannian_adam)):
            tx = optax.inject_hyperparams(tx_f)(learning_rate=1e-3)
            opt_state = tx.init(state.params)

            @jax.jit
            def apply(opt_state, grads, params, _tx=tx):
                updates, new_opt = _tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_opt

            ms = timeit(apply, opt_state, grads, state.params)
            results[f"{layout}/opt_{name}"] = round(ms, 2)
            print(f"{layout} optimizer {name:8s} only: {ms:7.2f} ms",
                  flush=True)

        # grad + per-leaf optimizer end-to-end (the (a)-vs-(b) decider)
        tx = optax.inject_hyperparams(riemannian_adam)(learning_rate=1e-3)
        opt_state = tx.init(state.params)

        @jax.jit
        def step_perleaf(state, opt_state, batch, _tx=tx):
            grads = system.grads_and_logs(state, batch, key, temp)[0]
            updates, new_opt = _tx.update(grads, opt_state, state.params)
            return optax.apply_updates(state.params, updates), new_opt

        ms = timeit(step_perleaf, state, opt_state, batch)
        results[f"{layout}/train_perleaf"] = round(ms, 2)
        print(f"{layout} grad+perleaf-RAdam step:  {ms:7.2f} ms", flush=True)

    print(json.dumps({"n": args.n, "batch": args.batch, "ms": results}))


if __name__ == "__main__":
    main()
