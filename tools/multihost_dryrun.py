#!/usr/bin/env python
"""Multi-host (DCN) dryrun: 2 OS processes x 4 virtual CPU devices each,
one full data-parallel training step over the 8-device global hybrid mesh.

Run (driver-style evidence, writes MULTIHOST_DCN_r04.json):
    python tools/multihost_dryrun.py

Each process: per-host input pipeline (its own dataset slice), global batch
assembled via make_array_from_process_local_data, grads pmean'd over
("dcn", "data").  Validates that the multi-host path compiles and executes
without real multi-host hardware.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id, num_processes, port):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4").strip()
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.parallel.multihost import (
        global_batch_from_host_shards,
        initialize_distributed,
        make_hybrid_mesh,
        make_multihost_train_step,
        process_indices,
        replicate_global,
    )

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes, len(jax.devices())

    cfg = ModelConfig(dataset="shapenet", num_class=6, num_categories=2,
                      fixed_points=64, eucl_dim=4, hyp_dim=4, k=8,
                      t_per_anchor=5, num_triplets=512, temperature=0.1, lr=0.01)
    system = HypHCSystem(cfg)

    # per-host input pipeline: this process materializes ONLY its slice
    GLOBAL_B = 16
    ds = SyntheticPartDataset(num_objects=GLOBAL_B, npoints=64,
                              num_categories=2, parts_per_object=3)
    idxs = process_indices(GLOBAL_B)
    local_items = [ds[int(i)] for i in idxs]
    from hpcs_tpu.data.loader import _collate

    host_batch = _collate(local_items)

    mesh = make_hybrid_mesh()
    # init on host 0's RNG (identical on all hosts by construction)
    state = system.init(jax.random.PRNGKey(0), host_batch)
    state = jax.tree_util.tree_map(np.asarray, state)
    state = replicate_global(mesh, state)
    global_batch = global_batch_from_host_shards(mesh, host_batch)

    step = make_multihost_train_step(system, mesh)
    new_state, logs = step(state, global_batch, jax.random.PRNGKey(1),
                           jnp.float32(0.1))
    loss1 = float(logs["total_loss"])
    new_state2, logs2 = step(new_state, global_batch, jax.random.PRNGKey(2),
                             jnp.float32(0.1))
    loss2 = float(logs2["total_loss"])
    assert np.isfinite(loss1) and np.isfinite(loss2)
    if process_id == 0:
        print(json.dumps({"process_count": jax.process_count(),
                          "global_devices": len(jax.devices()),
                          "mesh": str(mesh.shape),
                          "loss_step1": loss1, "loss_step2": loss2,
                          "ok": True}), flush=True)


def main():
    port = 19734
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=1200) for p in procs]
    rcs = [p.returncode for p in procs]
    result = {"n_processes": 2, "rc": rcs, "wall_s": round(time.time() - t0, 1),
              "ok": all(r == 0 for r in rcs)}
    for (out, err), rc in zip(outs, rcs):
        for line in out.splitlines():
            if line.startswith("{"):
                result["step_evidence"] = json.loads(line)
        if rc != 0:
            result["stderr_tail"] = err[-2000:]
    with open(os.path.join(REPO, "MULTIHOST_DCN_r04.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
