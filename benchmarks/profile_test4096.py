#!/usr/bin/env python
"""Trace the full test_step at N=4096 and print the device-time breakdown.

Usage: python benchmarks/profile_test4096.py [--n 4096] [--batch 8]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    B, N = args.batch, args.n
    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=N, eucl_dim=16, hyp_dim=16, k=20,
        t_per_anchor=20, num_triplets=4096, temperature=0.1, bf16=args.bf16,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B, npoints=N, num_categories=16,
                              parts_per_object=6, seed=5)
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(DataLoader(ds, B))).items()}
    key = jax.random.PRNGKey(0)
    state = system.init(key, batch)
    temp = jnp.float32(cfg.temperature)

    logs, _ = system.test_step(state, batch, key, temp)
    float(logs["score"])
    for i in range(10):
        logs, _ = system.test_step(state, batch, jax.random.fold_in(key, i), temp)
    float(logs["score"])

    t0 = time.perf_counter()
    for i in range(4):
        logs, _ = system.test_step(state, batch, jax.random.fold_in(key, 50 + i), temp)
    float(logs["score"])
    print(f"test_step pipelined: {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms "
          f"(B={B}, N={N}, bf16={args.bf16})")

    trace_dir = "/tmp/hpcs_trace_t4096"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(2):
        logs, _ = system.test_step(state, batch, jax.random.fold_in(key, 99 + i), temp)
        float(logs["score"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        pname = pid_names.get(e["pid"], "")
        if not ("TPU" in pname or "tpu" in pname.lower() or "XLA Ops" in tname):
            continue
        if "XLA Ops" not in tname and "Steps" in tname:
            continue
        if "XLA Ops" in tname or "TensorFlow Op" in tname:
            dur = e.get("dur", 0) / 1e3
            by_op[e["name"]] += dur
            total += dur
    print(f"total device op time: {total / 2:.2f} ms/step (2 steps)")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{ms / 2:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
