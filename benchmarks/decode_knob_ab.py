#!/usr/bin/env python
"""A/B the MNN-linkage knobs on the real TPU via full test_step throughput.

Runs bench_decode.py in a child per config (fresh process = fresh compile
cache keying off the env knobs, which are read at import time) and collects
the pipelined obj/s figure.  Knobs under test (decode/linkage.py):

  HPCS_TPU_MERGE_CAP_DIV / _CEIL  per-round merge cap = max(64, min(M//DIV, CEIL))
  HPCS_TPU_CASCADE_BIG            "34" = 3/4 compaction steps while M>=2048,
                                  "12" = halve everywhere
  HPCS_TPU_COMPACT                "transpose" (row-gather x2 + transposes)
                                  vs "direct" (axis-1 gather)
  HPCS_TPU_NN_REDUCE              "two_pass" vs "fused"

Usage: python benchmarks/decode_knob_ab.py [--n 4096] [--batch 8] [--bf16]
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("baseline(div8,ceil512,34,transpose,two_pass)", {}),
    ("cap div16 ceil256", {"HPCS_TPU_MERGE_CAP_DIV": "16",
                           "HPCS_TPU_MERGE_CAP_CEIL": "256"}),
    ("cap div8 ceil256", {"HPCS_TPU_MERGE_CAP_CEIL": "256"}),
    ("cascade 12", {"HPCS_TPU_CASCADE_BIG": "12"}),
    ("compact direct", {"HPCS_TPU_COMPACT": "direct"}),
    ("nn_reduce fused", {"HPCS_TPU_NN_REDUCE": "fused"}),
]


def run_one(name, env_extra, args):
    cmd = [sys.executable, os.path.join(REPO, "benchmarks", "bench_decode.py"),
           "--n", str(args.n), "--batch", str(args.batch),
           "--batches", str(args.batches)]
    if args.bf16:
        cmd.append("--bf16")
    env = dict(os.environ, **env_extra)
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=2400)
    m = re.search(r"test_step pipelined:\s+([\d.]+) obj/s", out.stdout)
    if not m:
        print(f"[{name}] FAILED\n{out.stdout[-400:]}\n{out.stderr[-800:]}",
              flush=True)
        return None
    objs = float(m.group(1))
    print(f"[{name}] {objs:.1f} obj/s", flush=True)
    return objs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on config names")
    args = ap.parse_args()
    results = {}
    for name, env_extra in CONFIGS:
        if args.only and args.only not in name:
            continue
        results[name] = run_one(name, env_extra, args)
    print(json.dumps({"n": args.n, "batch": args.batch,
                      "bf16": args.bf16, "obj_s": results}))


if __name__ == "__main__":
    main()
