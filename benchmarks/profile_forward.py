#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship forward on the real TPU and
print a device-time breakdown by fusion/op name.

Usage: python benchmarks/profile_forward.py [layout] [B]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from hpcs_tpu.models import HypHCSystem, ModelConfig  # noqa: E402

NPOINTS = 1024
K = 20


def main(layout="vc", B=16):
    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=NPOINTS, eucl_dim=32, hyp_dim=32, k=K,
        temperature=0.05, t_per_anchor=50, layout=layout,
    )
    system = HypHCSystem(cfg)
    key = jax.random.PRNGKey(0)
    dv = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 16)
    batch = {"points": jax.random.normal(key, (B, NPOINTS, 3)),
             "labels": jnp.zeros((B, NPOINTS), jnp.int32),
             "category": jnp.zeros((B,), jnp.int32)}
    state = system.init(key, batch)

    @jax.jit
    def fwd(params, batch_stats, points, dv):
        _, x_p = system.net.apply(
            {"params": params, "batch_stats": batch_stats}, points, dv, train=False)
        return jnp.sum(x_p)

    # warmup/compile
    float(fwd(state.params, state.batch_stats, batch["points"], dv))

    trace_dir = "/tmp/hpcs_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        float(fwd(state.params, state.batch_stats, batch["points"], dv))
    jax.profiler.stop_trace()

    # parse the perfetto trace
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found", glob.glob(f"{trace_dir}/**", recursive=True))
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # identify device tracks (TPU core / XLA Ops)
    pid_names = {}
    tid_names = {}
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
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if "XLA Ops" in tname or "TensorFlow Op" in tname:
            by_op[e["name"]] += dur
            total += dur
    if not by_op:
        # fallback: aggregate every complete event by (pid,tid) track
        tracks = defaultdict(float)
        for e in events:
            if e.get("ph") == "X":
                key = (pid_names.get(e["pid"], e["pid"]),
                       tid_names.get((e["pid"], e.get("tid")), e.get("tid")))
                tracks[key] += e.get("dur", 0) / 1e3
        for k, v in sorted(tracks.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{v:10.3f} ms  {k}")
        return
    print(f"total device op time: {total:.2f} ms over 3 forwards "
          f"({total / 3:.2f} ms/forward, layout={layout} B={B})")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms / 3:9.3f} ms  {name}")


if __name__ == "__main__":
    layout = sys.argv[1] if len(sys.argv) > 1 else "vc"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(layout, B)
