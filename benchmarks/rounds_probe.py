#!/usr/bin/env python
"""Count MNN rounds per cascade stage on clustered vs real-model embeddings.

Explains the 11 ms (clustered microbench) vs 81 ms (real untrained-model
embeddings) linkage gap at B=8/N=1024 by showing where rounds concentrate.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from hpcs_tpu.decode.linkage import (
    _MIN_STAGE,
    _compact,
    _mnn_round_body,
    cosine_distance_matrix,
    _INF,
)


def staged_rounds(D, method="complete"):
    """Replicate linkage_from_distances_mnn's cascade, returning per-stage
    (M, rounds, active_in, active_out, cursor)."""
    N = D.shape[0]
    D = D.astype(jnp.float32)
    D = 0.5 * (D + D.T)
    D = jnp.where(jnp.eye(N, dtype=bool), _INF, D)
    state = dict(
        D=D,
        cluster_id=jnp.arange(N, dtype=jnp.int32),
        size=jnp.ones((N,), jnp.int32),
        active=jnp.ones((N,), bool),
        Z=jnp.zeros((N + max(64, N // 8), 4), jnp.float32),
        cursor=jnp.int32(0),
        rounds=jnp.int32(0),
    )

    def _bounded(body):
        def wrapped(s):
            rounds = s["rounds"]
            s = body(s)
            s["rounds"] = rounds + 1
            return s
        return wrapped

    report = []
    M = N
    while M > _MIN_STAGE:
        M_next = max(_MIN_STAGE, (3 * M + 3) // 4) if M >= 2048 \
            else max(_MIN_STAGE, (M + 1) // 2)

        def cond(s, _target=M_next):
            return (s["cursor"] < N - 1) & (s["rounds"] < N) & (
                jnp.sum(s["active"].astype(jnp.int32)) > _target)

        a_in = int(jnp.sum(state["active"].astype(jnp.int32)))
        r_in = int(state["rounds"])
        state = jax.lax.while_loop(
            cond, _bounded(_mnn_round_body(M, N, method)), state)
        a_out = int(jnp.sum(state["active"].astype(jnp.int32)))
        report.append((M, int(state["rounds"]) - r_in, a_in, a_out,
                       int(state["cursor"])))
        state = _compact(state, M_next)
        M = M_next

    a_in = int(jnp.sum(state["active"].astype(jnp.int32)))
    r_in = int(state["rounds"])
    state = jax.lax.while_loop(
        lambda s: (s["cursor"] < N - 1) & (s["rounds"] < N),
        _bounded(_mnn_round_body(M, N, method)), state)
    report.append((M, int(state["rounds"]) - r_in, a_in,
                   int(jnp.sum(state["active"].astype(jnp.int32))),
                   int(state["cursor"])))
    return report


def show(tag, D):
    rep = staged_rounds(D)
    total = sum(r for _, r, _, _, _ in rep)
    print(f"\n{tag}: total rounds {total}")
    for M, r, ain, aout, cur in rep:
        print(f"  M={M:5d}: rounds={r:3d} active {ain:5d}->{aout:5d} cursor={cur}")


def main():
    import sys
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    key = jax.random.PRNGKey(0)

    # clustered microbench data (8 tight clusters in 8-D)
    kc, kp, kl = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (8, 8))
    assign = jax.random.randint(kl, (N,), 0, 8)
    xc = jnp.take(centers, assign, axis=0) + 0.05 * jax.random.normal(kp, (N, 8))
    show("clustered (microbench)", cosine_distance_matrix(xc))

    # real untrained-model embeddings
    from hpcs_tpu.data import DataLoader, SyntheticPartDataset
    from hpcs_tpu.geometry import project
    from hpcs_tpu.loss.hyphc import normalize_to_radius
    from hpcs_tpu.models import HypHCSystem, ModelConfig
    from hpcs_tpu.models.base import decode_vector_for_batch

    cfg = ModelConfig(
        dataset="shapenet", num_class=50, num_categories=16,
        fixed_points=N, eucl_dim=16, hyp_dim=16, k=20,
        t_per_anchor=20, num_triplets=4096, temperature=0.1,
    )
    system = HypHCSystem(cfg)
    ds = SyntheticPartDataset(num_objects=4, npoints=N, num_categories=16,
                              parts_per_object=6, seed=5)
    batch = {k: jnp.asarray(v) for k, v in next(iter(DataLoader(ds, 4))).items()}
    state = system.init(jax.random.PRNGKey(0), batch)
    dv = decode_vector_for_batch(cfg, batch)
    _, x_p, _ = jax.jit(lambda p, bs, pts: system._apply(p, bs, pts, dv, False))(
        state.params, state.batch_stats, batch["points"])
    scale = state.params["scale"][0]
    leaves = jax.vmap(lambda e: project(normalize_to_radius(e, scale)))(x_p)
    for b in range(2):
        show(f"real untrained emb obj{b}", cosine_distance_matrix(leaves[b]))

    # random data for reference
    xr = jax.random.normal(jax.random.PRNGKey(7), (N, 16))
    show("pure random", cosine_distance_matrix(xr))


if __name__ == "__main__":
    main()
