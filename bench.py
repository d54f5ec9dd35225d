#!/usr/bin/env python
"""Headline benchmark: VN-DGCNN inference throughput (1024-pt clouds/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the ratio against the reference implementation's measured CPU
throughput (torch forward of /root/reference's VN_DGCNN_partseg on the same
shapes) — cached in benchmarks/baseline_cpu.json after first measurement.
North-star target (BASELINE.json): >= 50x.
"""
import json
import os
import sys
import time

NPOINTS = 1024
K = 20
EUCL = 32
HYP = 32
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_cpu.json")
FALLBACK_CPU_CPS = 0.717  # measured 2026-08-16 on this image (batch 4)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_cpu_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["clouds_per_sec"]
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from reference_baseline import measure_reference_cpu

        cps = measure_reference_cpu(batch=4, npoints=NPOINTS, k=K, out_features=EUCL)
        os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"clouds_per_sec": cps, "batch": 4, "npoints": NPOINTS, "k": K}, f)
        return cps
    except Exception as e:  # pragma: no cover
        log(f"baseline measurement failed ({e}); using cached constant")
        return FALLBACK_CPU_CPS


def measure_tpu(batch_sizes=(8, 16, 32)):
    import jax
    import jax.numpy as jnp

    from hpcs_tpu.models import HypHCSystem, ModelConfig

    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=NPOINTS, eucl_dim=EUCL, hyp_dim=HYP, k=K,
        temperature=0.05, t_per_anchor=50,
    )
    system = HypHCSystem(cfg)
    # bf16 backbone compute path (fp32 norm math/decode): decode-quality
    # parity vs fp32 is MEASURED on a trained flagship — purity delta 0.015 %,
    # score delta 6e-5 (benchmarks/bf16_quality.json; north star <= 0.5 %)
    import dataclasses

    system_bf16 = HypHCSystem(dataclasses.replace(cfg, bf16=True))
    key = jax.random.PRNGKey(0)

    LOOP = 10

    @jax.jit
    def forward_loop(params, batch_stats, points, dv):
        """LOOP forwards chained on device: measures pure device throughput
        without per-iteration host dispatch latency (the remote-TPU tunnel
        adds ~10 ms/dispatch).  Each iteration perturbs the input by an
        iteration-dependent epsilon so XLA cannot collapse the loop."""

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

    @jax.jit
    def forward_loop_bf16(params, batch_stats, points, dv):
        def body(i, carry):
            pts = points + (i.astype(jnp.float32) * 1e-12) * carry[..., :1]
            _, x_poincare = system_bf16.net.apply(
                {"params": params, "batch_stats": batch_stats}, pts, dv, train=False
            )
            return carry + x_poincare.astype(jnp.float32).mean(
                axis=(1, 2), keepdims=True)

        out = jax.lax.fori_loop(
            0, LOOP, body, jnp.zeros((points.shape[0], 1, 1), jnp.float32)
        )
        return jnp.sum(out)

    best = 0.0
    best_batch = 0
    best_path = "flax"
    for B in batch_sizes:
        dv = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 16)
        batch = {"points": jax.random.normal(key, (B, NPOINTS, 3)),
                 "labels": jnp.zeros((B, NPOINTS), jnp.int32),
                 "category": jnp.zeros((B,), jnp.int32)}
        state = system.init(key, batch)
        points = batch["points"]
        # serving paths only.  The fused Pallas EdgeConv engine is RETIRED
        # from this comparison (VERDICT r2 #2, decision recorded in
        # hpcs_tpu/models/inference.py): it measured 3.9x SLOWER than the
        # flax graph (340-356 vs 1328 clouds/s, BENCH_r02), Mosaic cannot
        # lower in-kernel gathers so a kernel must do the same one-hot
        # matmuls XLA already emits, and the kernel won its own XLA stage by
        # only ~1.1x while pinning fp32-HIGHEST.  It remains parity-tested
        # as the kernel harness (tests/test_inference_engine.py); the Pallas
        # kNN kernel DOES win (47 vs 100 ms at N=4096) and serves via
        # knn_auto inside both flax paths below.
        for path, loop_fn in (("flax", forward_loop),
                              ("flax-bf16", forward_loop_bf16)):
            try:
                # warmup + compile; float() is a completion barrier even where
                # block_until_ready does not synchronize (axon tunnel)
                float(loop_fn(state.params, state.batch_stats, points, dv))
                reps = 3
                t0 = time.perf_counter()
                for _ in range(reps):
                    float(loop_fn(state.params, state.batch_stats, points, dv))
                dt = time.perf_counter() - t0
            except Exception as e:  # pragma: no cover — fused path is optional
                log(f"batch {B} [{path}]: failed ({type(e).__name__}: {e})")
                continue
            cps = B * LOOP * reps / dt
            log(f"batch {B} [{path}]: {cps:.1f} clouds/sec "
                f"({dt / (LOOP * reps) * 1e3:.2f} ms/forward)")
            if cps > best:
                best, best_batch, best_path = cps, B, path
    log(f"best: {best:.1f} clouds/sec (batch {best_batch}, {best_path} path)")
    return best, best_batch


def main():
    cpu_cps = get_cpu_baseline()
    log(f"reference CPU baseline: {cpu_cps:.3f} clouds/sec")
    tpu_cps, best_batch = measure_tpu()
    result = {
        "metric": f"vn_dgcnn_infer_clouds_per_sec_per_chip_{NPOINTS}pt",
        "value": round(tpu_cps, 2),
        "unit": "clouds/sec",
        "vs_baseline": round(tpu_cps / cpu_cps, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
