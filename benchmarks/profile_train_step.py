#!/usr/bin/env python
"""Trace the flagship train_step (forward + losses + backward + fused RAdam)
on the real TPU and print a device-time breakdown by op (VERDICT r2 #7:
re-profile after the fused RAdam + one-hot gather, name the top costs).

Usage: python benchmarks/profile_train_step.py [--n 1024] [--batch 8]
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_class", type=int, default=50)
    ap.add_argument("--eucl", type=int, default=32)
    args = ap.parse_args()

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig

    B, N, C = args.batch, args.n, args.num_class
    cfg = ModelConfig(
        dataset="shapenet", num_class=C, num_categories=16,
        fixed_points=N, eucl_dim=args.eucl, hyp_dim=args.eucl, k=20,
        t_per_anchor=50, temperature=0.05,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=B, npoints=N, num_categories=16,
                              parts_per_object=6, seed=5)
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(DataLoader(ds, B))).items()}
    key = jax.random.PRNGKey(0)
    state = system.init(key, batch)
    temp = jnp.float32(cfg.temperature)

    def one(i, st):
        st, logs = system.train_step(st, batch, jax.random.fold_in(key, i), temp)
        return st, logs

    # compile + drain the post-compile dispatch spike
    st, logs = one(0, state)
    float(logs["total_loss"])
    for i in range(12):
        st, logs = one(i, st)
    float(logs["total_loss"])

    t0 = time.perf_counter()
    for i in range(8):
        st, logs = one(i, st)
    float(logs["total_loss"])
    wall = (time.perf_counter() - t0) / 8
    print(f"train_step pipelined wall: {wall * 1e3:.2f} ms/step "
          f"(B={B}, N={N}, eucl={args.eucl})")

    trace_dir = "/tmp/hpcs_trace_train"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(3):
        st, logs = one(100 + i, st)
        float(logs["total_loss"])
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
        pname = pid_names.get(e["pid"], "")
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if not ("TPU" in pname or "tpu" in pname.lower() or "XLA Ops" in tname):
            continue
        if "XLA Ops" not in tname and "Steps" in tname:
            continue
        dur = e.get("dur", 0) / 1e3
        if "XLA Ops" in tname or "TensorFlow Op" in tname:
            by_op[e["name"]] += dur
            total += dur
    print(f"total device op time: {total / 3:.2f} ms/step (3 steps)")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms / 3:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
