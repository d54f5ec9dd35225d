"""On-device agglomerative linkage and dendrogram cutting.

Replaces the reference's CPU decode path — scipy linkage(method='complete',
metric='cosine') per object (/root/reference/hpcs/models/base_hyp_hc.py:81-86)
and fcluster(criterion='maxclust') sweeps
(/root/reference/hpcs/utils/scores.py:141-177) — with jit-able fixed-shape
algorithms:

- `linkage`: slot-based O(N^2)-per-merge agglomeration under lax.fori_loop.
  Each merge takes the argmin of the active-pair distance matrix and updates
  one row/column (complete = max, single = min, average = size-weighted
  mean), emitting scipy-format rows [id_a, id_b, dist, size].  N - 1 merges
  of N x N work = O(N^3) flops on the VPU — for N = 1024 this is ~1 GFLOP,
  microseconds-scale on TPU versus scipy's single-core CPU walk.
- `cut_maxclust`: cut to <= k clusters by applying the first N - k merges
  (exact for monotone linkages — complete/single/average all are) with
  parent pointer-doubling, then relabel to consecutive ids.

Both run per object; vmap over the batch.
"""
from functools import partial

import jax
import jax.numpy as jnp

# "infinite distance" sentinel.  Python float (a jnp scalar here would
# initialize the backend at import), and deliberately BELOW the bf16
# round-to-inf boundary (3.396e38): the one-hot selection matmuls below run
# at HIGHEST precision, whose bf16-limb decomposition of any operand above
# that boundary overflows to inf and turns the correction terms into NaN.
# Any value >> 2 (the max cosine distance) works as infinity here.
_INF = 1e30


def _select_rows(P, D):
    """Row selection D[j_of, :] as a one-hot MXU matmul.

    XLA's dynamic gather of [M] rows from [M, M] runs ~10x below HBM
    bandwidth on TPU (the round-2 EdgeConv lesson, PLAN.md); a 0/1 matrix
    times fp32 values at HIGHEST precision is a bit-exact selection and
    rides the MXU instead.  P[i, m] = 1 iff j_of[i] == m.
    """
    return jnp.einsum("im,mj->ij", P, D,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _limb3(x):
    """Exact 3-limb bf16 split: x == hi + mid + lo bit-for-bit (fp32 has a
    24-bit mantissa = 3 x 8 bf16 bits; each residual is exactly
    representable).  Lets one-hot selections run as a SINGLE bf16 MXU pass
    over a 3x contraction instead of HIGHEST's 6 passes."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _scatter_rows_onehot(Lsel, Rfix):
    """(Lsel^T @ Rfix, Rfix^T @ Lsel) — the [M, M] scatter-backs of the K
    merged rows/columns — as single bf16 dots over a 3-limb split of Rfix
    (exact: 0/1 weights are bf16-exact, each limb is bf16-exact, products
    accumulate in f32).  Halves the dominant MXU cost at large M vs the
    HIGHEST-precision form."""
    hi, mid, lo = _limb3(Rfix)
    B3 = jnp.concatenate([hi, mid, lo], axis=0)            # [3K, M] bf16
    A3 = jnp.concatenate([Lsel] * 3, axis=0).astype(jnp.bfloat16)  # [3K, M]
    scat = jnp.einsum("km,kj->mj", A3, B3,
                      preferred_element_type=jnp.float32)
    scatT = jnp.einsum("km,kj->mj", B3, A3,
                       preferred_element_type=jnp.float32)
    return scat, scatT


def cosine_distance_matrix(x):
    """Pairwise cosine distances 1 - cos(x_i, x_j) (scipy 'cosine' metric).

    Computed as ||x̂_i - x̂_j||² / 2 (identical in exact arithmetic) rather
    than 1 - x̂_i·x̂_j: the matmul form cancels catastrophically for
    near-parallel embeddings — every distance below ulp(1) ≈ 6e-8 rounds to
    a handful of quantized values (measured on an untrained flagship: 39% of
    entries exactly 0.0, and the surviving quantized grid made one cluster
    the nearest neighbor of 271 others, collapsing MNN linkage to ~2 merges
    per round).  The difference form keeps full fp32 RELATIVE precision at
    small distances, so near-parallel points stay distinct and the NN graph
    keeps its true local geometry.  Exactly symmetric by construction (both
    triangles square the same differences).  The O(N²F) elementwise work is
    chunked to bound the [chunk, N, F] broadcast at ~16 MB.
    """
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    N, F = xn.shape
    target = max(1, (1 << 22) // max(N * F, 1))
    if target >= N:
        diff = xn[:, None, :] - xn[None, :, :]
        D = 0.5 * jnp.sum(diff * diff, axis=-1)
    else:
        # ceil-split with a zero-padded tail (requiring an exact divisor
        # degraded prime-ish N to chunk=1: N sequential latency-bound steps)
        n_chunks = -(-N // target)
        chunk = -(-N // n_chunks)
        pad = n_chunks * chunk - N
        xp = jnp.pad(xn, ((0, pad), (0, 0)))
        blocks = xp.reshape(n_chunks, chunk, F)
        D = jax.lax.map(
            lambda blk: 0.5 * jnp.sum((blk[:, None, :] - xn[None, :, :]) ** 2, -1),
            blocks,
        ).reshape(n_chunks * chunk, N)[:N]
    return jnp.clip(D, 0.0, 2.0)


def euclidean_distance_matrix(x):
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] - 2.0 * (x @ x.T) + sq[None, :]
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@partial(jax.jit, static_argnames=("method",))
def linkage_from_distances(D, method="complete"):
    """Agglomerative linkage from a dense [N, N] distance matrix.

    Returns Z [N-1, 4] in scipy format: [id_a, id_b, dist, size] with
    original points 0..N-1 and merged cluster t getting id N + t.
    """
    N = D.shape[0]
    D = D.astype(jnp.float32)
    D = 0.5 * (D + D.T)  # exact symmetry (see linkage_from_distances_mnn)
    D = jnp.where(jnp.eye(N, dtype=bool), _INF, D)

    init = dict(
        D=D,
        cluster_id=jnp.arange(N, dtype=jnp.int32),
        size=jnp.ones((N,), jnp.int32),
        active=jnp.ones((N,), bool),
        Z=jnp.zeros((N - 1, 4), jnp.float32),
    )

    def body(t, s):
        D = s["D"]
        # argmin over active pairs (inactive rows/cols already hold +inf)
        flat = jnp.argmin(D)
        i, j = flat // N, flat % N
        i, j = jnp.minimum(i, j), jnp.maximum(i, j)
        dist = D[i, j]

        ci, cj = s["cluster_id"][i], s["cluster_id"][j]
        ida, idb = jnp.minimum(ci, cj), jnp.maximum(ci, cj)
        new_size = s["size"][i] + s["size"][j]
        Z = s["Z"].at[t].set(
            jnp.array([0.0, 0.0, 0.0, 0.0]).at[0].set(ida.astype(jnp.float32))
            .at[1].set(idb.astype(jnp.float32))
            .at[2].set(dist)
            .at[3].set(new_size.astype(jnp.float32))
        )

        row_i, row_j = D[i, :], D[j, :]
        if method == "complete":
            new_row = jnp.maximum(row_i, row_j)
        elif method == "single":
            new_row = jnp.minimum(row_i, row_j)
        elif method == "average":
            si = s["size"][i].astype(jnp.float32)
            sj = s["size"][j].astype(jnp.float32)
            # guard inf * 0-style blowups: inactive entries stay inf via where
            both_fin = (row_i < _INF) & (row_j < _INF)
            new_row = jnp.where(both_fin, (si * row_i + sj * row_j) / (si + sj), _INF)
        else:
            raise ValueError(f"unknown linkage method {method!r}")

        new_row = new_row.at[i].set(_INF)
        D = D.at[i, :].set(new_row).at[:, i].set(new_row)
        D = D.at[j, :].set(_INF).at[:, j].set(_INF)

        return dict(
            D=D,
            cluster_id=s["cluster_id"].at[i].set(N + t),
            size=s["size"].at[i].set(new_size),
            active=s["active"].at[j].set(False),
            Z=Z,
        )

    out = jax.lax.fori_loop(0, N - 1, body, init)
    return out["Z"]



# NN+tie selection strategy per MNN round: "two_pass" (min reduce, then a
# tie-masked hash argmin — the measured round-3 baseline) or "fused" (one
# variadic lax.reduce computing the lexicographic (d, h, row) minimum —
# saves one full [M, M] read per round; opt-in until TPU-benchmarked)
import os as _os

_NN_REDUCE_MODE = _os.environ.get("HPCS_TPU_NN_REDUCE", "two_pass")

_MIN_STAGE = 128  # below this the [M, M] round cost is dispatch-bound


_CAP_DIV = int(_os.environ.get("HPCS_TPU_MERGE_CAP_DIV", "8"))
_CAP_CEIL = int(_os.environ.get("HPCS_TPU_MERGE_CAP_CEIL", "512"))
# big-stage cascade step: "34" = compact to 3M/4 while M >= 2048 (default),
# "12" = halve everywhere (fewer, bigger compactions; A/B knob)
_CASCADE_BIG = _os.environ.get("HPCS_TPU_CASCADE_BIG", "34")
# merged-row write-back into [M, M]: "onehot" = two [3K, M] bf16-limb dots
# (scat + its transpose; exact), "take" = row-gather of the K finished rows
# from the compact [K, M] table + a transposed read for the columns (also
# exact — pure selection).  The dots cost M^2 * 3K MACs each (~0.26 ms/obj
# per dot at M=4096, K=512) where the gather is an HBM-floor M^2 write.
_SCATTER_MODE = _os.environ.get("HPCS_TPU_SCATTER", "onehot")


def _merge_cap(M):
    """Per-round merge cap.  The Z buffer in linkage_from_distances_mnn is
    padded by _merge_cap(N) so the contiguous dynamic_update_slice write in
    the round body can never clamp — change the two together.

    M // 8 everywhere up to 512: the old 256 ceiling was BINDING at the big
    stages (measured on clustered N=4096 data: stages M=4096/3072/2304 ran
    4/3/3 fully-capped rounds; at cap M//8 they run 3/2/2 with headroom),
    and big-stage rounds dominate — each costs several [M, M] passes, so
    one round saved at M=4096 outweighs the whole M=128 tail.  The
    per-round cost of a larger K (the [3K, M] scatter-back dots) is
    K-static MXU work, so oversizing K past the available mutual-pair
    count is pure waste — but while rounds are cap-BOUND the total MXU
    cost is ~K-independent (rounds ∝ 1/K) and every round saved is several
    [M, M] HBM passes saved.  Merging any subset of mutual pairs is exact
    (see _mnn_round_body), so the cap value never affects the dendrogram.
    Env knobs (HPCS_TPU_MERGE_CAP_DIV / _CEIL) exist for A/B runs.
    """
    return max(64, min(M // _CAP_DIV, _CAP_CEIL))


def _mnn_round_body(M, N, method):
    """One MNN round at compacted slot count M (Z/cluster ids stay global N).

    Merges are capped at K = _merge_cap(M) pairs per round and the merge
    set is COMPACTED to K slots, so every expensive operation is [K, M] or
    smaller instead of [M, M]: in practice the NN graph of tight clusters is
    star-shaped (measured: 17-37 mutual pairs among ~1000 active), so full-
    width partner selections did [M, M] work for ~3% of rows.  Merging any
    subset of the mutual-NN pairs is exact for reducible linkages: a merge
    elsewhere can only move other clusters *away* (complete = max, single =
    min over two values each >= the pair distance, average = convex
    combination of two such values), so every un-merged mutual pair remains
    mutual next round.
    """
    slots = jnp.arange(M, dtype=jnp.int32)
    eye = jnp.eye(M, dtype=bool)
    K = _merge_cap(M)
    ks = jnp.arange(K, dtype=jnp.int32)

    if method == "complete":
        comb = jnp.maximum
    elif method == "single":
        comb = jnp.minimum
    elif method == "average":
        comb = None
    else:
        raise ValueError(f"unknown linkage method {method!r}")

    def body(s):
        D = s["D"]
        active = s["active"]
        cursor = s["cursor"]
        # D is exactly symmetric here, so reducing over axis 0 (the major
        # axis — lanes accumulate over rows, measurably faster on TPU than
        # the minor-axis reduce) gives identical values to a row reduce.
        # EXACT-TIE break by a symmetric hash of the two cluster ids,
        # consulted only where D bit-equals the row min.  Real (especially
        # early-training) embeddings are near-parallel, so fp32 cosine
        # distances quantize: measured on an untrained flagship, 39% of
        # off-diagonal entries are exactly 0.0 and 1019/1024 rows have tied
        # minima.  First-index argmin then makes every tied row point at the
        # lowest tied slot — a star whose mutual-NN graph has ONE edge, i.e.
        # one merge per round (measured: 500 rounds vs 34 on tie-free data).
        # A pseudo-random tie order makes tied nodes pair up like a random
        # NN graph (~1/3 of nodes merge per round).  Tie-free comparisons
        # never consult the hash, so scipy-equality on distinct-distance
        # data is bit-for-bit unchanged; on tied data any consistent order
        # is a valid linkage (equal heights).  Fresh merged ids draw fresh
        # hashes, which keeps the order consistent ACROSS rounds too: a
        # merged cluster m has d(i,m) >= d(i, its children), so an unmerged
        # mutual pair stays i's nearest by distance, and equal-distance
        # preference is re-drawn — either choice is an equal-height merge.
        ids = s["cluster_id"].astype(jnp.uint32)
        hsum = (ids[None, :] + ids[:, None]) * jnp.uint32(0x9E3779B1)
        hprod = (ids[None, :] * ids[:, None]) * jnp.uint32(0x85EBCA77)
        h = hsum ^ hprod
        # top bit cleared so a candidate can never collide with the
        # non-candidate sentinel (a collision would let argmin pick a
        # non-tied row as NN — wrong partner at the recorded min distance)
        h = (h ^ (h >> 13)) & jnp.uint32(0x7FFFFFFF)
        if _NN_REDUCE_MODE == "fused":
            # single [M, M] pass: variadic lax.reduce computing the
            # lexicographic (d, h, row) minimum per column — saves one full
            # D read vs min-then-argmin (the combiner is associative and,
            # with the row index as final tiebreak, yields EXACTLY the
            # two-pass result: lowest row among equal (d, h)).  Opt-in via
            # HPCS_TPU_NN_REDUCE=fused until TPU-benchmarked.
            rows_idx = jnp.broadcast_to(
                jnp.arange(M, dtype=jnp.int32)[:, None], (M, M))

            def _lex_min(x, y):
                dx, hx, ix = x
                dy, hy, iy = y
                ty = (dy < dx) | ((dy == dx) & (
                    (hy < hx) | ((hy == hx) & (iy < ix))))
                return (jnp.where(ty, dy, dx), jnp.where(ty, hy, hx),
                        jnp.where(ty, iy, ix))

            nn_val, _, nn_idx = jax.lax.reduce(
                (D, h, rows_idx),
                (jnp.float32(_INF * 2), jnp.uint32(0x7FFFFFFF),
                 jnp.int32(M - 1)),
                _lex_min, (0,))
        else:
            nn_val = jnp.min(D, axis=0)
            tie = D == nn_val[None, :]
            nn_idx = jnp.argmin(
                jnp.where(tie, h, jnp.uint32(0xFFFFFFFF)), axis=0
            ).astype(jnp.int32)
        # inactive columns hold _INF, so an active row's NN is always an
        # active slot — no active[nn_idx] gather needed.  [M]-indexed
        # gathers are ~65-100 us each on TPU (latency-bound); the nn∘nn
        # composition is instead a fused [M, M] compare-reduce whose inputs
        # are only [M] vectors — a few us of pure VPU compute.
        mutual = active & jnp.any(
            (nn_idx[:, None] == slots[None, :]) & (nn_idx[None, :] == slots[:, None]),
            axis=1)
        lead_all = mutual & (slots < nn_idx)
        rank = jnp.cumsum(lead_all.astype(jnp.int32)) - 1
        leader = lead_all & (rank < K)
        n_pairs = jnp.sum(leader.astype(jnp.int32))

        # partner's (rank, leader) pulled through the same one-hot-reduce
        # trick (single nonzero term -> exact in s32)
        packed = rank * 2 + leader.astype(jnp.int32)
        packed_p = jnp.sum(
            jnp.where(nn_idx[:, None] == slots[None, :], packed[None, :], 0),
            axis=1)
        prank = packed_p // 2
        plead = (packed_p & 1).astype(bool)
        dead = mutual & (slots > nn_idx) & plead

        # one fused [2K, M] selector build (rows 0..K-1 = leaders, K..2K-1 =
        # partners); every piece of per-merge bookkeeping below is pulled
        # through ONE [2K, M] x [M, 5] one-hot matmul — an XLA scatter for
        # lead_slots alone was a 40 us serialized fusion, and each [K]-row
        # gather another ~10-25 us of latency
        k2 = jnp.arange(2 * K, dtype=jnp.int32)
        SelLP = jnp.where(
            (k2 < K)[:, None],
            (rank[None, :] == k2[:, None]) & leader[None, :],
            (prank[None, :] == (k2 - K)[:, None]) & dead[None, :],
        ).astype(jnp.float32)
        Lsel = SelLP[:K]
        V = jnp.stack(
            [slots.astype(jnp.float32), nn_idx.astype(jnp.float32),
             s["cluster_id"].astype(jnp.float32), s["size"].astype(jnp.float32),
             nn_val], axis=-1)  # [M, 5]; ints < 2^24 and f32 values are
        # exact through the HIGHEST-precision one-hot selection
        book = _select_rows(SelLP, V)  # [2K, 5]
        valid = ks < n_pairs
        lead_slots = jnp.where(valid, book[:K, 0].astype(jnp.int32), M)
        partner_slots = jnp.where(valid, book[:K, 1].astype(jnp.int32), M)
        ci = book[:K, 2].astype(jnp.int32)
        cj = book[K:, 2].astype(jnp.int32)
        size_l = book[:K, 3]
        size_p = book[K:, 3]
        new_size_k = size_l + size_p
        dist_k = book[:K, 4]
        rows_k = jnp.stack(
            [jnp.minimum(ci, cj).astype(jnp.float32),
             jnp.maximum(ci, cj).astype(jnp.float32),
             dist_k,
             new_size_k], axis=-1)  # [K, 4]
        # contiguous Z write: merges this round land at rows cursor..cursor+
        # n_pairs-1 (Z is padded by K rows so the slice never clamps)
        cur_rows = jax.lax.dynamic_slice(s["Z"], (cursor, 0), (K, 4))
        Z = jax.lax.dynamic_update_slice(
            s["Z"], jnp.where(valid[:, None], rows_k, cur_rows), (cursor, 0))

        # the K needed rows of D are plain gathers (K x M reads); a one-hot
        # matmul would re-read the whole [M, M] matrix per precision pass
        Rl = jnp.take(D, jnp.minimum(lead_slots, M - 1), axis=0)
        Rp = jnp.take(D, jnp.minimum(partner_slots, M - 1), axis=0)
        if comb is not None:
            R = comb(Rl, Rp)  # merged cluster k -> every old slot
            # merged-to-merged fix: d(k, k') = comb over k's row at columns
            # l_{k'} and p_{k'}; one [K, M]x[M, 2K] one-hot matmul (reads of
            # R only) beats latency-bound column gathers here
            Clp = _select_rows(R, SelLP.T)  # [K, 2K]
            C = comb(Clp[:, :K], Clp[:, K:])
        else:  # size-weighted average
            sl = size_l[:, None]
            sp = size_p[:, None]
            both = (Rl < _INF) & (Rp < _INF)
            R = jnp.where(both, (sl * Rl + sp * Rp) / jnp.maximum(sl + sp, 1.0),
                          _INF)
            Clp = _select_rows(R, SelLP.T)
            Cl, Cp = Clp[:, :K], Clp[:, K:]
            slT, spT = sl.reshape(1, K), sp.reshape(1, K)
            bothC = (Cl < _INF) & (Cp < _INF)
            C = jnp.where(bothC, (slT * Cl + spT * Cp) / jnp.maximum(slT + spT, 1.0),
                          _INF)
            # re-symmetrize: the two fp32 groupings of the nested weighted
            # average (row-k weights innermost vs row-k') round differently
            # by ulps, and everything here — the major-axis NN reduce, the
            # tie mask, mutuality — RELIES on exact D symmetry (complete/
            # single are max/min of symmetric values and need no fix).  The
            # mean of the two roundings is itself within 1 ulp of the exact
            # average and exactly symmetric.
            C = 0.5 * (C + C.T)
        # write the pair-pair distances into leader columns, kill dead
        # columns; then scatter the K finished rows (and, transposed, the K
        # finished columns) back into [M, M] via one-hot matmuls — their
        # cost is the single [M, M] write each
        Rfix = jnp.where(leader[None, :], _select_rows(C, Lsel),
                         jnp.where(dead[None, :], _INF, R))
        if _SCATTER_MODE == "take":
            # leader slot m's new row is Rfix[rank[m]]; non-leader rows are
            # masked off by the where, so any in-range index works there
            T = jnp.take(Rfix, jnp.where(leader, rank, 0), axis=0)
            scat, scatT = T, T.T
        else:
            # [M, M] scatter-backs (zero on non-merged rows); scatT ==
            # scat.T produced by a second dot instead of a transpose copy
            scat, scatT = _scatter_rows_onehot(Lsel, Rfix)
        D2 = jnp.where(leader[:, None], scat,
                       jnp.where(dead[:, None], _INF,
                                 jnp.where(leader[None, :], scatT,
                                           jnp.where(dead[None, :], _INF, D))))
        D2 = jnp.where(eye, _INF, D2)

        # cluster_id/active/size updates as pure [M] elementwise ops (each
        # XLA scatter lowers to a ~20 us serialized while on TPU); the size
        # increment spreads partner sizes back through the Lsel one-hot
        size_add = _select_rows(size_p[None, :], Lsel)[0]  # [M], 0 off-leader
        return dict(
            D=D2,
            cluster_id=jnp.where(leader, N + cursor + rank, s["cluster_id"]),
            size=s["size"] + size_add.astype(jnp.int32),
            active=active & ~dead,
            Z=Z,
            cursor=cursor + n_pairs,
        )

    return body


_COMPACT_MODE = _os.environ.get("HPCS_TPU_COMPACT", "transpose")


def _compact(s, half):
    """Pack the (<= half) active slots into a [half, half] state.

    Stable argsort on ~active keeps the surviving clusters in slot order, so
    tie-breaking by slot index matches the uncompacted run on tie-free data.
    """
    order = jnp.argsort(~s["active"], stable=True).astype(jnp.int32)
    keep = order[:half]
    # two ROW gathers with a transpose between (row gathers read only
    # half x M; a one-hot matmul re-reads the whole [M, M] per precision
    # pass, and a direct column gather is stride-hostile on TPU)
    if _COMPACT_MODE == "direct":  # A/B knob: axis-1 gather, no transposes
        Dc = jnp.take(jnp.take(s["D"], keep, axis=0), keep, axis=1)
    else:
        Dc = jnp.take(jnp.take(s["D"], keep, axis=0).T, keep, axis=0).T
    out = dict(
        D=Dc,
        cluster_id=s["cluster_id"][keep],
        size=s["size"][keep],
        active=s["active"][keep],
        Z=s["Z"],
        cursor=s["cursor"],
    )
    if "rounds" in s:
        out["rounds"] = s["rounds"]
    return out


@partial(jax.jit, static_argnames=("method",))
def linkage_from_distances_mnn(D, method="complete"):
    """Mutual-nearest-neighbor-rounds linkage — same dendrogram, ~30x faster.

    Complete/single/average linkage are *reducible*, so merging every
    mutually-nearest pair of clusters simultaneously yields the same
    dendrogram as scipy's sequential algorithm (the NN-chain theorem).  Each
    round costs a few [M, M] passes and merges many pairs, so O(tens) of
    rounds replace N - 1 sequential merges.  The active-cluster count decays
    geometrically (~30 %/round on real data), so the state is *compacted* to
    half size every time the active count permits: total D-matrix traffic
    drops from ~rounds x N^2 to ~(rounds_at_full) x N^2 + a geometric tail
    (~7x less at N = 1024).  Rows are then stable-sorted by merge distance
    (children precede equal-height parents because they merge in earlier
    rounds) and cluster ids renumbered to the scipy convention.
    """
    N = D.shape[0]
    D = D.astype(jnp.float32)
    # the round bodies, lazy-column reads and compactions all rely on exact
    # symmetry; a matmul-built distance matrix is only symmetric to fp32
    # rounding (both triangles computed independently), which is enough to
    # make a pair mutual on one side only
    D = 0.5 * (D + D.T)
    D = jnp.where(jnp.eye(N, dtype=bool), _INF, D)

    state = dict(
        D=D,
        cluster_id=jnp.arange(N, dtype=jnp.int32),
        size=jnp.ones((N,), jnp.int32),
        active=jnp.ones((N,), bool),
        # padded by the max per-round merge cap so the contiguous
        # dynamic-slice Z write in the round body never clamps
        Z=jnp.zeros((N + _merge_cap(N), 4), jnp.float32),
        cursor=jnp.int32(0),
    )

    # every round merges >= 1 pair on finite symmetric D (the global-min
    # pair is always mutual), so N - 1 rounds upper-bound the whole run; the
    # explicit bound keeps an all-NaN D (e.g. after a NaN-diverged training
    # run) from livelocking the device loop (argmin -> 0 everywhere, no
    # leaders, cursor never advances) — it exits with garbage rows instead,
    # matching NaN-in/garbage-out elsewhere
    state["rounds"] = jnp.int32(0)

    def _bounded(body):
        def wrapped(s):
            rounds = s["rounds"]  # the round body rebuilds the state dict
            s = body(s)
            s["rounds"] = rounds + 1
            return s
        return wrapped

    # NEGATIVE RESULT (round 3, measured): an O(K*M)-per-round "lazy
    # columns + carried nn" body is SLOWER than this full-update body at
    # every size (41 vs 19 ms at N=1024/B=16, 611 vs 389 ms at N=4096/B=8)
    # because reading K scattered COLUMNS of a row-major [M, M] touches
    # every row's cache lines — a column gather is a full-matrix read at
    # best, and XLA's gather runs 3-4x below even that floor.  Large N is
    # served instead by a finer compaction ladder (below).
    M = N
    while M > _MIN_STAGE:  # static (python) cascade: 3/4 steps while the
        # matrix is large (rounds merge a roughly constant number of pairs,
        # so cost concentrates in the biggest stages), halving below 1024
        if M >= 2048 and _CASCADE_BIG == "34":
            M_next = max(_MIN_STAGE, (3 * M + 3) // 4)
        else:
            M_next = max(_MIN_STAGE, (M + 1) // 2)

        def cond(s, _target=M_next):
            return (s["cursor"] < N - 1) & (s["rounds"] < N) & (
                jnp.sum(s["active"].astype(jnp.int32)) > _target)

        state = jax.lax.while_loop(
            cond, _bounded(_mnn_round_body(M, N, method)), state)
        state = _compact(state, M_next)
        M = M_next

    state = jax.lax.while_loop(
        lambda s: (s["cursor"] < N - 1) & (s["rounds"] < N),
        _bounded(_mnn_round_body(M, N, method)), state)
    Z = state["Z"][: N - 1]

    # stable sort by merge distance; renumber merged-cluster ids to row order
    perm = jnp.argsort(Z[:, 2], stable=True)
    Zs = Z[perm]
    inv = jnp.argsort(perm).astype(jnp.float32)  # old row r -> new position

    def remap(col):
        is_merged = col >= N
        old_row = jnp.clip(col.astype(jnp.int32) - N, 0, N - 2)
        return jnp.where(is_merged, N + inv[old_row], col)

    a = remap(Zs[:, 0])
    b = remap(Zs[:, 1])
    Zs = jnp.stack([jnp.minimum(a, b), jnp.maximum(a, b), Zs[:, 2], Zs[:, 3]], axis=-1)
    return Zs

def linkage(x, method="complete", metric="cosine", algorithm="mnn"):
    """scipy.cluster.hierarchy.linkage equivalent from raw observations.

    algorithm: 'mnn' (mutual-NN rounds, default, ~30x faster) or
    'sequential' (one merge per step, mirrors scipy's loop)."""
    if metric == "cosine":
        D = cosine_distance_matrix(x)
    elif metric == "euclidean":
        D = euclidean_distance_matrix(x)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if algorithm == "mnn":
        return linkage_from_distances_mnn(D, method=method)
    return linkage_from_distances(D, method=method)


def _doubling_steps(n):
    s, k = 1, 0
    while s < 2 * n:
        s *= 2
        k += 1
    return k


def build_cut_tables(Z):
    """Shared preprocessing for cutting one dendrogram at MANY levels.

    Returns (child_row, up, is_b):
    - child_row[v]: merge row where node v is absorbed as a child (N-1
      sentinel for the root — larger than any cut level, so the root never
      counts as merged).  child_row is strictly increasing along any
      leaf-to-root path, which makes every cut a monotone predicate on it.
    - up[j][v]: 2^j-th ancestor of v (root maps to itself) — a binary-lifting
      table, built once and reused by every cut level.
    - is_b[v]: 1 when v is the *second* child of its absorbing row.  With it,
      `2 * (child_row[root] - m) + is_b[root]` is a collision-free cluster
      label bounded by 2k for a cut after m = N - k merges — no sort needed
      (the two children of any unapplied row are distinct clusters).

    The k-sweep in get_optimal_k previously rebuilt a [2N-1, N-1] hit matrix
    and ran its own pointer-doubling chain per k; these tables amortize that
    to one pass (VERDICT round-1 item 5).
    """
    N = Z.shape[0] + 1
    nodes = jnp.arange(2 * N - 1, dtype=jnp.int32)
    child_row, is_b = _invert_children(Z)
    is_root = nodes == 2 * N - 2
    parent = jnp.where(is_root, nodes, N + child_row).astype(jnp.int32)
    ups = [parent]
    for _ in range(_doubling_steps(N) - 1):
        ups.append(ups[-1][ups[-1]])
    return child_row, jnp.stack(ups), is_b


def _invert_children(Z):
    """(child_row, is_b) for every node, in O(N log N) instead of the
    [2N-1, N-1] hit-matrix compare the cut paths used before (33M-element
    masks per object at N=4096).

    Every node id except the root is a child of EXACTLY one merge row, and
    the root is always id 2N-2, so sorting concat(Z[:,0], Z[:,1]) yields
    exactly 0..2N-3 in order — the permutation that sorts the child ids IS
    the inverse map.  child_row[root] = N-1 (the sentinel larger than any
    cut level, appended).
    """
    N = Z.shape[0] + 1
    a = Z[:, 0].astype(jnp.int32)
    b = Z[:, 1].astype(jnp.int32)
    ids = jnp.concatenate([a, b])
    rows2 = jnp.tile(jnp.arange(N - 1, dtype=jnp.int32), 2)
    isb2 = jnp.concatenate([jnp.zeros((N - 1,), jnp.int32),
                            jnp.ones((N - 1,), jnp.int32)])
    order = jnp.argsort(ids)
    child_row = jnp.concatenate(
        [rows2[order], jnp.full((1,), N - 1, jnp.int32)])
    is_b = jnp.concatenate([isb2[order], jnp.zeros((1,), jnp.int32)])
    return child_row, is_b


def _climb_to_cut(child_row, up, num_merges):
    """Cluster root of every leaf after `num_merges` merges, via lifting.

    The answer for leaf l is the first ancestor v with child_row[v] >=
    num_merges; we lift to the last ancestor still merged before the cut,
    then step to its parent.
    """
    N = (child_row.shape[0] + 1) // 2
    cur = jnp.arange(N, dtype=jnp.int32)
    merged = child_row[cur] < num_merges
    for j in range(up.shape[0] - 1, -1, -1):
        nxt = up[j][cur]
        cur = jnp.where(merged & (child_row[nxt] < num_merges), nxt, cur)
    return jnp.where(merged, up[0][cur], cur)


def _relabel_consecutive(roots):
    """Root node ids -> consecutive 0..C-1 labels (sort-based, scatter-free)."""
    order = jnp.argsort(roots)
    sr = roots[order]
    newl = jnp.cumsum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         (sr[1:] != sr[:-1]).astype(jnp.int32)]))
    return newl[jnp.argsort(order)].astype(jnp.int32)


def cut_roots_sweep(Z, child_row, up, is_b, k_hi):
    """Roots + sort-free bounded labels for EVERY cut k = 1..k_hi.

    One binary-lifting climb computes the deepest cut (k_hi clusters); the
    remaining cuts follow by *applying* merge rows N-k_hi..N-2 one at a time
    in a lax.scan — each step is a [N] compare-select (clusters whose root is
    a child of row r re-root to N+r), no gathers beyond two scalars.  This
    replaces a per-k climb (log N gather levels x k_hi) with log N gathers
    total + k_hi elementwise passes.

    Returns (roots [k_hi, N], labels [k_hi, N], ks [k_hi]) ordered k = k_hi
    down to 1; labels are collision-free and < 2*k_hi (see build_cut_tables).
    """
    N = Z.shape[0] + 1
    m0 = N - k_hi
    roots0 = _climb_to_cut(child_row, up, m0)
    cr0 = child_row[roots0]
    ib0 = is_b[roots0]
    a = Z[:, 0].astype(jnp.int32)
    b = Z[:, 1].astype(jnp.int32)

    def step(carry, r):
        roots, cr, ib = carry
        hit = (roots == a[r]) | (roots == b[r])
        new_root = N + r
        roots = jnp.where(hit, new_root, roots)
        cr = jnp.where(hit, child_row[new_root], cr)
        ib = jnp.where(hit, is_b[new_root], ib)
        return (roots, cr, ib), (roots, cr, ib)

    _, (roots_seq, cr_seq, ib_seq) = jax.lax.scan(
        step, (roots0, cr0, ib0), jnp.arange(m0, N - 1, dtype=jnp.int32))

    roots = jnp.concatenate([roots0[None], roots_seq], axis=0)  # [k_hi, N]
    cr = jnp.concatenate([cr0[None], cr_seq], axis=0)
    ib = jnp.concatenate([ib0[None], ib_seq], axis=0)
    ks = k_hi - jnp.arange(k_hi, dtype=jnp.int32)  # k_hi, k_hi-1, ..., 1
    ms = N - ks
    labels = 2 * (cr - ms[:, None]) + ib
    return roots, labels, ks


@jax.jit
def cut_maxclust_many(Z, ks):
    """Flat-cut labels for MANY k values at once: [K, N] int32.

    Equivalent to stacking cut_maxclust(Z, k) for k in ks, but the hit
    matrix and ancestor tables are built once and shared across the sweep.
    """
    N = Z.shape[0] + 1
    child_row, up, _ = build_cut_tables(Z)

    def one(k):
        m = N - jnp.clip(k, 1, N)
        return _relabel_consecutive(_climb_to_cut(child_row, up, m))

    return jax.vmap(one)(ks)


@partial(jax.jit, static_argnames=())
def _roots_after_merges(Z, num_merges):
    """Root node id of every leaf after applying the first `num_merges` rows.

    The child -> merge-row relation comes from the O(N log N) sort-based
    inversion (_invert_children) — no scatters (which serialize on TPU) and
    no [2N-1, N-1] hit matrix (33M-element masks per object at N=4096).
    """
    N = Z.shape[0] + 1
    nodes = jnp.arange(2 * N - 1, dtype=jnp.int32)
    child_row, _ = _invert_children(Z)
    # root's sentinel row N-1 is never < num_merges (num_merges <= N-1)
    applied = child_row < num_merges
    parent = jnp.where(applied, N + child_row, nodes).astype(jnp.int32)
    # pointer doubling to the root
    for _ in range(_doubling_steps(N)):
        parent = parent[parent]
    return parent[:N]


def cut_maxclust(Z, k):
    """Labels in [0, k) cutting the dendrogram into <= k flat clusters.

    Matches scipy fcluster(criterion='maxclust') for monotone linkages: the
    smallest threshold yielding <= k clusters corresponds to stopping before
    the last k - 1 merges.  Labels are consecutive but arbitrary — all
    downstream scores are permutation-invariant.
    """
    N = Z.shape[0] + 1
    k = jnp.clip(k, 1, N)
    roots = _roots_after_merges(Z, N - k)
    # relabel to consecutive ids (ascending root order) via the sort-based
    # relabel — O(N log N), vs the [2N-1, N] compare-any this used before
    return _relabel_consecutive(roots)


@jax.jit
def cut_maxclust_fcluster(Z, k):
    """Flat cut matching scipy ``fcluster(Z, k, 'maxclust') - 1`` bit-for-bit.

    Two behaviors distinguish it from `cut_maxclust` (whose labels are only
    permutation-equal), both needed so the reference's numbering-sensitive
    weighted-jaccard metric (scores.py:239) is comparable across pipelines:

    1. *Threshold tie semantics.* scipy picks the smallest merge height whose
       threshold cut yields <= k clusters, so a tie block straddling the
       k-boundary collapses entirely and the cut can have FEWER than k
       clusters; `cut_maxclust` applies exactly N - k merges instead.
    2. *DFS cluster numbering.* scipy's cluster_monocrit numbers clusters in
       discovery order of a pre-order DFS that descends INTERNAL children
       before labeling LEAF children (left-first within each class); when
       k >= N it special-cases to identity labels.  Both rules validated
       bitwise against fcluster (tests/test_decode.py): 84 fast cases
       (3 methods x tied/untied x 14 k's) plus a ~2.3k-case seeded sweep
       in the slow suite (30 seeds x 3 methods x full k range, mixed
       duplicate-point tie structure).

    Discovery order equals the order of each cluster's first leaf in the
    reordered tree's leaf sequence, so it is computed in parallel rather
    than by a sequential walk: pos(leaf) = sum over ancestor edges of the
    leaf-count of siblings preceding that edge's child (weighted binary
    lifting, O(N log N)), then clusters rank by their minimum leaf position.
    """
    N = Z.shape[0] + 1
    nodes = jnp.arange(2 * N - 1, dtype=jnp.int32)
    kc = jnp.clip(k, 1, N)
    h = Z[:, 2]
    m0 = N - kc  # merge count for an exact-k cut
    # tie semantics: extend through the whole tie block at the boundary
    hb = h[jnp.maximum(m0 - 1, 0)]
    m = jnp.where(m0 > 0, jnp.sum((h <= hb).astype(jnp.int32)), 0)
    roots = _roots_after_merges(Z, m)

    child_row, up, is_b = build_cut_tables(Z)
    a = Z[:, 0].astype(jnp.int32)
    b = Z[:, 1].astype(jnp.int32)
    # transformed sibling order: internal children precede leaf children,
    # left-first within each class -> a precedes b unless a is a leaf and
    # b is internal
    a_first = ~((a < N) & ~(b < N))  # [N-1]
    sizes = jnp.concatenate(
        [jnp.ones((N,), jnp.int32), Z[:, 3].astype(jnp.int32)])
    row = child_row  # child_row[root] aliases the last row; val zeroed below
    isb = is_b.astype(bool)
    later = jnp.where(isb, a_first[row], ~a_first[row])
    sibling = jnp.where(isb, a[row], b[row])
    val = jnp.where(later, sizes[sibling], 0)
    val = jnp.where(nodes == 2 * N - 2, 0, val)  # root has no parent edge

    # path-sum binary lifting: root is absorbing (val 0, parent self), so
    # overshooting the depth adds zeros
    P = up[0]
    s = val
    for _ in range(_doubling_steps(N)):
        s = s + s[P]
        P = P[P]
    pos = s[:N]  # leaf index in the transformed leaf sequence, a permutation

    # min leaf position per cluster root: sort by (root, pos), forward-fill
    # each group's first pos, unsort.  Two stable argsorts instead of a
    # packed scalar key: roots reaches 2N-2, so roots*N+pos (~2N^2) would
    # overflow int32 at N >= ~32768 (ADVICE r4)
    by_pos = jnp.argsort(pos, stable=True)
    order = by_pos[jnp.argsort(roots[by_pos], stable=True)]
    rs = roots[order]
    ps = pos[order]
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), rs[1:] != rs[:-1]])
    lead = jax.lax.cummax(
        jnp.where(boundary, jnp.arange(N, dtype=jnp.int32), 0))
    minpos_sorted = ps[lead]
    minpos = minpos_sorted[jnp.argsort(order)]

    labels = _relabel_consecutive(minpos)
    return jnp.where(kc >= N, jnp.arange(N, dtype=jnp.int32), labels)
