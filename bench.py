#!/usr/bin/env python
"""Headline benchmark: VN-DGCNN inference throughput (1024-pt clouds/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "secondary": {...}}

vs_baseline is the ratio against the reference implementation's measured CPU
throughput (torch forward of /root/reference's VN_DGCNN_partseg on the same
shapes) — cached in benchmarks/baseline_cpu.json after first measurement.
North-star target (BASELINE.json): >= 50x.

Resilience (VERDICT r3 #1 + r4 #1): the axon TPU tunnel can fail backend
init transiently (BENCH_r03 rc=1) or hang entirely (BENCH_r04 rc=124 — the
old retry ladder overran the driver's window).  A LIVENESS PROBE runs
first: a tiny child that only initializes the backend and jits one op,
<=150 s, one retry.  Only a live probe unlocks the real measurement (child
process, bounded retries).  The parent ALWAYS prints the one-line JSON; on
persistent failure "value" is null (never a stale number — ADVICE r4) with
"error" and a separate clearly-named "last_known_good" field.  Dead-tunnel
worst case ~6 min; full worst case ~41 min.

Secondary metrics (driver-visible regression guards for training + decode):
  train_step_ms_b8_n1024 — flagship train step (fwd+losses+bwd+fused RAdam)
  decode_obj_per_sec_b8_n1024 — FULL jitted test_step (losses + vmapped MNN
  linkage + best-k sweep), pipelined, same config as benchmarks/bench_decode.py
"""
import json
import os
import subprocess
import sys
import time

NPOINTS = 1024
K = 20
EUCL = 32
HYP = 32
REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "benchmarks", "baseline_cpu.json")
FALLBACK_CPU_CPS = 0.717  # measured 2026-08-16 on this image (batch 4)
FALLBACK_LAST_GOOD = 1328.04  # BENCH_r02 driver-captured value
METRIC = f"vn_dgcnn_infer_clouds_per_sec_per_chip_{NPOINTS}pt"

ATTEMPTS = int(os.environ.get("HPCS_BENCH_ATTEMPTS", "2"))
# attempt 1 gets the cold-compile budget; later attempts are retries after
# a flake/hang and should fail fast so a dead tunnel can't eat hours.
# TOTAL worst case must stay inside the driver's window (~45 min; BENCH_r04
# rc=124 was the ladder overrunning it): probe 2x150s + 1500 + 600 + sleeps
# ~= 41 min.  A dead tunnel exits at the probe stage in <= ~6 minutes.
_DEFAULT_TIMEOUTS = (1500, 600)
ATTEMPT_TIMEOUT_S = int(os.environ.get("HPCS_BENCH_ATTEMPT_TIMEOUT_S", "0"))
RETRY_SLEEP_S = int(os.environ.get("HPCS_BENCH_RETRY_SLEEP_S", "30"))
PROBE_TIMEOUT_S = int(os.environ.get("HPCS_BENCH_PROBE_TIMEOUT_S", "150"))


def _attempt_timeout(attempt):
    if ATTEMPT_TIMEOUT_S > 0:
        return ATTEMPT_TIMEOUT_S
    return _DEFAULT_TIMEOUTS[min(attempt - 1, len(_DEFAULT_TIMEOUTS) - 1)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_cpu_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["clouds_per_sec"]
    try:
        sys.path.insert(0, os.path.join(REPO, "benchmarks"))
        from reference_baseline import measure_reference_cpu

        cps = measure_reference_cpu(batch=4, npoints=NPOINTS, k=K, out_features=EUCL)
        os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"clouds_per_sec": cps, "batch": 4, "npoints": NPOINTS, "k": K}, f)
        return cps
    except Exception as e:  # pragma: no cover
        log(f"baseline measurement failed ({e}); using cached constant")
        return FALLBACK_CPU_CPS


def last_known_good():
    """Best driver-captured primary value from previous rounds' BENCH files."""
    best = FALLBACK_LAST_GOOD
    try:
        import glob

        for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") or {}
            if parsed.get("error") or parsed.get("value_is_last_known_good"):
                continue  # that round's value was itself stale
            if parsed.get("metric") == METRIC and isinstance(
                parsed.get("value"), (int, float)
            ):
                best = max(best, float(parsed["value"]))
    except Exception:
        pass
    return best


# ---------------------------------------------------------------- child ----


def _measure_primary(out):
    """Infer throughput: LOOP forwards chained on device (the tunnel adds
    ~10 ms/dispatch, so per-call timing would measure dispatch, not compute)."""
    import dataclasses

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
    system_bf16 = HypHCSystem(dataclasses.replace(cfg, bf16=True))
    key = jax.random.PRNGKey(0)
    LOOP = 10

    def make_loop(sys_obj, cast_fp32):
        @jax.jit
        def forward_loop(params, batch_stats, points, dv):
            def body(i, carry):
                pts = points + (i.astype(jnp.float32) * 1e-12) * carry[..., :1]
                _, x_poincare = sys_obj.net.apply(
                    {"params": params, "batch_stats": batch_stats},
                    pts, dv, train=False,
                )
                if cast_fp32:
                    x_poincare = x_poincare.astype(jnp.float32)
                return carry + x_poincare.mean(axis=(1, 2), keepdims=True)

            out = jax.lax.fori_loop(
                0, LOOP, body, jnp.zeros((points.shape[0], 1, 1), jnp.float32)
            )
            return jnp.sum(out)

        return forward_loop

    loops = (("flax", make_loop(system, False)),
             ("flax-bf16", make_loop(system_bf16, True)))
    # The fused Pallas EdgeConv engine is RETIRED from this comparison
    # (VERDICT r2 #2, decision recorded in hpcs_tpu/models/inference.py):
    # 3.9x slower than the flax graph; Mosaic cannot lower in-kernel gathers.
    # The Pallas kNN kernel DOES win (47 vs 100 ms at N=4096) and serves via
    # knn_auto inside both flax paths.
    best, best_batch, best_path = 0.0, 0, "flax"
    for B in (8, 16, 32):
        dv = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 16)
        batch = {"points": jax.random.normal(key, (B, NPOINTS, 3)),
                 "labels": jnp.zeros((B, NPOINTS), jnp.int32),
                 "category": jnp.zeros((B,), jnp.int32)}
        state = system.init(key, batch)
        points = batch["points"]
        for path, loop_fn in loops:
            try:
                # warmup + compile; float() is a completion barrier even where
                # block_until_ready does not synchronize (axon tunnel)
                float(loop_fn(state.params, state.batch_stats, points, dv))
                reps = 3
                t0 = time.perf_counter()
                for _ in range(reps):
                    float(loop_fn(state.params, state.batch_stats, points, dv))
                dt = time.perf_counter() - t0
            except Exception as e:
                log(f"batch {B} [{path}]: failed ({type(e).__name__}: {e})")
                continue
            cps = B * LOOP * reps / dt
            log(f"batch {B} [{path}]: {cps:.1f} clouds/sec "
                f"({dt / (LOOP * reps) * 1e3:.2f} ms/forward)")
            if cps > best:
                best, best_batch, best_path = cps, B, path
    if best <= 0:
        raise RuntimeError("all primary measurement paths failed")
    log(f"best: {best:.1f} clouds/sec (batch {best_batch}, {best_path} path)")
    out["primary"] = {"value": best, "batch": best_batch, "path": best_path}


def _measure_train_step(out):
    """Flagship train step wall (pipelined dispatch, post-compile spike drained)."""
    import jax
    import jax.numpy as jnp

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    B = 8
    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=NPOINTS, eucl_dim=EUCL, hyp_dim=HYP, k=K,
        t_per_anchor=50, temperature=0.05,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B, npoints=NPOINTS,
                              num_categories=16, parts_per_object=6, seed=5)
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(DataLoader(ds, B))).items()}
    key = jax.random.PRNGKey(0)
    state = system.init(key, batch)
    temp = jnp.float32(cfg.temperature)

    st, logs = system.train_step(state, batch, jax.random.fold_in(key, 0), temp)
    float(logs["total_loss"])
    for i in range(12):  # drain the post-compile dispatch spike
        st, logs = system.train_step(st, batch, jax.random.fold_in(key, i), temp)
    float(logs["total_loss"])

    best = None
    for p in range(3):
        t0 = time.perf_counter()
        for i in range(8):
            st, logs = system.train_step(
                st, batch, jax.random.fold_in(key, 100 * p + i), temp)
        float(logs["total_loss"])
        wall = (time.perf_counter() - t0) / 8
        best = wall if best is None else min(best, wall)
    log(f"train_step: {best * 1e3:.2f} ms/step (B={B}, N={NPOINTS})")
    out["train_step_ms_b8_n1024"] = round(best * 1e3, 2)


def _measure_decode(out):
    """Full test_step throughput — same config as benchmarks/bench_decode.py
    (eucl 16, t_per_anchor 20) so values are comparable round-over-round."""
    import jax
    import jax.numpy as jnp

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    B, NB = 8, 8
    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=NPOINTS, eucl_dim=16, hyp_dim=16, k=K,
        t_per_anchor=20, num_triplets=4096, temperature=0.1,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B * NB, npoints=NPOINTS,
                              num_categories=16, parts_per_object=6, seed=5)
    batches = [{k: jnp.asarray(v) for k, v in b.items()}
               for b in DataLoader(ds, B, drop_last=True)]
    key = jax.random.PRNGKey(0)
    state = system.init(key, batches[0])
    temp = jnp.float32(cfg.temperature)

    logs, _ = system.test_step(state, batches[0], key, temp)
    float(logs["score"])
    for w in range(2):  # drain
        for i, b in enumerate(batches):
            logs, _ = system.test_step(
                state, b, jax.random.fold_in(key, 99 + 16 * w + i), temp)
        float(logs["score"])

    n_obj = B * len(batches)
    best = None
    for p in range(3):
        t0 = time.perf_counter()
        outs = []
        for i, b in enumerate(batches):
            logs, _ = system.test_step(
                state, b, jax.random.fold_in(key, 1000 * p + i), temp)
            outs.append(logs["score"])
        float(jnp.mean(jnp.stack(outs)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ops = n_obj / best
    log(f"decode (full test_step): {ops:.1f} obj/s (B={B}, N={NPOINTS})")
    out["decode_obj_per_sec_b8_n1024"] = round(ops, 1)


def child_main(out_path):
    """Run all measurements, writing partial results after each section so a
    late crash still leaves the earlier numbers for the parent."""
    out = {"secondary_errors": {}}

    def flush():
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, out_path)

    _measure_primary(out)  # primary failure = child failure (nonzero exit)
    flush()
    for name, fn in (("train_step", _measure_train_step),
                     ("decode", _measure_decode)):
        try:
            fn(out)
        except Exception as e:
            log(f"secondary [{name}] failed: {type(e).__name__}: {e}")
            out["secondary_errors"][name] = f"{type(e).__name__}: {e}"
        flush()


# --------------------------------------------------------------- parent ----


def probe_backend():
    """Attempt 0 (VERDICT r4 #1): a tiny child that only brings up the
    backend and jits a 1-op function, short timeout, one retry.  Only a live
    probe unlocks the expensive cold-compile measurement attempt — a dead
    tunnel must produce the fallback JSON within ~6 minutes, not ~45."""
    code = ("import jax; "
            "print('probe_ok', float(jax.jit(lambda x: x + 1.0)(1.0)), "
            "jax.default_backend())")
    for attempt in (1, 2):
        log(f"--- backend liveness probe {attempt}/2 "
            f"(timeout {PROBE_TIMEOUT_S}s) ---")
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], cwd=REPO,
                timeout=PROBE_TIMEOUT_S, capture_output=True, text=True,
            )
            if proc.returncode == 0 and "probe_ok" in proc.stdout:
                log(f"probe ok: {proc.stdout.strip().splitlines()[-1]}")
                return True
            log(f"probe rc={proc.returncode}: "
                f"{(proc.stderr or '').strip().splitlines()[-1:]}")
        except subprocess.TimeoutExpired:
            log(f"probe timed out after {PROBE_TIMEOUT_S}s")
        if attempt == 1:
            time.sleep(10)
    return False


def run_attempts():
    """Launch the child with bounded retries; return (result_dict, error)."""
    out_path = os.path.join(
        REPO, "benchmarks", f"_bench_child_{os.getpid()}.json")
    if not probe_backend():
        return None, "backend liveness probe failed twice (tunnel dead?)"
    last_err = None
    for attempt in range(1, ATTEMPTS + 1):
        if os.path.exists(out_path):
            os.remove(out_path)
        timeout_s = _attempt_timeout(attempt)
        log(f"--- bench attempt {attempt}/{ATTEMPTS} (timeout {timeout_s}s) ---")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", out_path],
                cwd=REPO, timeout=timeout_s,
            )
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc, last_err = -1, f"attempt {attempt}: timeout after {timeout_s}s"
            log(last_err)
        result = None
        if os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    result = json.load(f)
            except Exception as e:
                last_err = f"attempt {attempt}: unreadable child output ({e})"
        if result and result.get("primary"):
            os.remove(out_path)
            return result, None
        if rc not in (-1,) and last_err is None:
            last_err = f"attempt {attempt}: child exited rc={rc} without a primary result"
            log(last_err)
        if attempt < ATTEMPTS:
            log(f"retrying in {RETRY_SLEEP_S}s (backend/tunnel flake?)")
            time.sleep(RETRY_SLEEP_S)
    return None, last_err or "all attempts failed"


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
        return

    cpu_cps = get_cpu_baseline()
    log(f"reference CPU baseline: {cpu_cps:.3f} clouds/sec")
    result, err = run_attempts()
    if result is not None:
        value = result["primary"]["value"]
        line = {
            "metric": METRIC,
            "value": round(value, 2),
            "unit": "clouds/sec",
            "vs_baseline": round(value / cpu_cps, 2),
        }
        secondary = {k: v for k, v in result.items()
                     if k not in ("primary", "secondary_errors")}
        if secondary:
            line["secondary"] = secondary
        if result.get("secondary_errors"):
            line["secondary_errors"] = result["secondary_errors"]
    else:
        # value is null so a flag-unaware consumer can never mistake stale
        # data for a fresh measurement (ADVICE r4); the last driver-captured
        # number rides along in its own clearly-named field
        lkg = last_known_good()
        line = {
            "metric": METRIC,
            "value": None,
            "unit": "clouds/sec",
            "vs_baseline": None,
            "error": f"measurement failed: {err}",
            "last_known_good": round(lkg, 2),
            "last_known_good_vs_baseline": round(lkg / cpu_cps, 2),
        }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
