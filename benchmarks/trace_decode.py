#!/usr/bin/env python
"""Op-level trace of the decode path (linkage + sweep) on the real TPU."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main(B=8, N=1024, C=50, what="both"):
    from hpcs_tpu.decode import get_optimal_k
    from hpcs_tpu.decode.linkage import (
        cosine_distance_matrix,
        linkage_from_distances_mnn,
    )

    key = jax.random.PRNGKey(7)
    kc, kp, kl = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (B, 8, 8))
    assign = jax.random.randint(kl, (B, N), 0, 8)
    x = jnp.take_along_axis(centers, assign[..., None], axis=1) \
        + 0.05 * jax.random.normal(kp, (B, N, 8))

    @jax.jit
    def linkage_only(x):
        Z = jax.vmap(lambda v: linkage_from_distances_mnn(
            cosine_distance_matrix(v)))(x)
        return Z

    @jax.jit
    def sweep_only(Z, labels):
        def one(l, z):
            _, _, s = get_optimal_k(l, z, num_class=C, index="iou")
            return s
        return jnp.sum(jax.vmap(one)(labels, Z))

    Z = linkage_only(x)
    float(jnp.sum(Z[:, -1, 2]))
    float(sweep_only(Z, assign))

    trace_dir = "/tmp/hpcs_decode_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    if what in ("both", "linkage"):
        Z2 = linkage_only(x)
        float(jnp.sum(Z2[:, -1, 2]))
    if what in ("both", "sweep"):
        float(sweep_only(Z, assign))
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
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
    print(f"total device op time: {total:.2f} ms (what={what} B={B} N={N})")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.3f} ms  {name}")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    main(what=what)
