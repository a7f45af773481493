"""Greedy person assembly as ONE Pallas kernel — the slot table never
leaves VMEM. Exact-parity variant; NOT the default (see below).

The XLA scan twin (decode/assemble_device.py) keeps its union-merge state
— the (B, P=L*M, K) person/slot table — in HBM across L*M scan steps
(~5.6 GB of traffic per batch-256), so a VMEM-resident kernel looked like
a clear win. Measured on v5e it is 9x SLOWER (64 vs 7 ms/b256): with
grid=(B,) the B x L*M tiny merge iterations run SEQUENTIALLY on the one
TensorCore, while the XLA scan vectorizes every step over the whole batch
on the VPU — batch parallelism beats memory locality when the sequential
chain has trivial per-step work. The lesson (recorded in NOTES.md): a
Pallas win requires keeping the batch dimension vectorized INSIDE the
block (tile B into the block and carry (Bt, ...) state), not one grid
block per row. Kept as an exact-parity variant and the starting point for
that batch-tiled rewrite if assembly ever dominates the decode profile.

Semantics are IDENTICAL to the XLA twin (same argmax tie rules, same merge
cases incl. the reference's "already"/overlap quirks, same f32 mean-score
filter); parity on the adversarial dense-candidate suite is pinned in
tests/test_assemble_device.py. Reference behavior being reproduced:
lib/pafprocess/pafprocess.cpp:96-191 and lib/utils/paf_to_pose.py:234-351.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")  # plain float: a jnp array here would be a captured
                     # constant, which pallas kernels reject


def _assemble_kernel(s_ref, ps_ref, srct_ref, dstt_ref, ids_ref, cnt_ref, *,
                     L, M, K, P, p_out, min_parts, min_score):
    S = s_ref[0]              # (L, M, M) pre-masked scores (-inf = not ok)
    PS = ps_ref[0]            # (K, M) peak scores
    SRCT = srct_ref[:, :]     # (L, M) src joint type, repeated per column
    DSTT = dstt_ref[:, :]

    iota_LM1 = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
    iota_LM0 = jax.lax.broadcasted_iota(jnp.int32, (L, M), 0)

    # ---- stage 1: greedy 1-1 matching, vectorized over limbs -------------
    # "stable-sort desc, take free pairs" == M iterations of masked argmax
    # with row-major tie order: first row holding the global max, then the
    # first column within it (decode/assemble_device.py:70-87).
    s = S
    CI = jnp.zeros((L, M), jnp.int32)
    CJ = jnp.zeros((L, M), jnp.int32)
    CV = jnp.full((L, M), NEG, jnp.float32)
    for m in range(M):
        rowmax = jnp.max(s, axis=2)                        # (L, M)
        r = jnp.argmax(rowmax, axis=1)                     # (L,)
        # additive -inf masks: Mosaic cannot insert a minor dim on i1
        # vectors, so row/col selection and kills ride f32 adds instead of
        # 3-D bool wheres (x + -inf == -inf; no +inf exists, so no NaN)
        keep_r = jnp.where(iota_LM1 == r[:, None], 0.0, NEG)   # (L, M) f32
        srow = jnp.max(s + keep_r[:, :, None], axis=1)         # (L, M)
        c = jnp.argmax(srow, axis=1)
        v = jnp.max(srow, axis=1)
        kill_r = jnp.where(iota_LM1 == r[:, None], NEG, 0.0)
        kill_c = jnp.where(iota_LM1 == c[:, None], NEG, 0.0)
        s = s + kill_r[:, :, None] + kill_c[:, None, :]
        put = iota_LM1 == m
        CI = jnp.where(put, r[:, None], CI)
        CJ = jnp.where(put, c[:, None], CJ)
        CV = jnp.where(put, v[:, None], CV)

    # ---- stage 2: sequential union-merge, slot table in VMEM -------------
    iota_PK1 = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
    iota_P0 = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    iota_KM0 = jax.lax.broadcasted_iota(jnp.int32, (K, M), 0)
    iota_KM1 = jax.lax.broadcasted_iota(jnp.int32, (K, M), 1)
    iota_1K = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def merge(t, state):
        ids, score, count, alive, ncre = state
        l = t // M
        m = t - l * M
        sel = (iota_LM0 == l) & (iota_LM1 == m)            # (L, M)
        i = jnp.sum(jnp.where(sel, CI, 0))
        j = jnp.sum(jnp.where(sel, CJ, 0))
        v = jnp.max(jnp.where(sel, CV, NEG))
        good = v > NEG
        cs = jnp.where(good, v, 0.0)
        src_t = jnp.sum(jnp.where(sel, SRCT, 0))
        dst_t = jnp.sum(jnp.where(sel, DSTT, 0))

        ids_src = jnp.sum(
            jnp.where(iota_PK1 == src_t, ids, 0), axis=1, keepdims=True
        )                                                   # (P, 1)
        ids_dst = jnp.sum(
            jnp.where(iota_PK1 == dst_t, ids, 0), axis=1, keepdims=True
        )
        match = (alive > 0) & ((ids_src == i) | (ids_dst == j))  # (P, 1)
        mf = match.astype(jnp.float32)  # Mosaic argmax is f32-only
        a0 = jnp.argmax(mf, axis=0)[0]
        oh0 = iota_P0 == a0                                 # (P, 1)
        has0 = jnp.max(mf) > 0
        m2 = mf * (1.0 - oh0.astype(jnp.float32))
        a1 = jnp.argmax(m2, axis=0)[0]
        oh1 = iota_P0 == a1
        has1 = jnp.max(m2) > 0

        src_sc = jnp.sum(
            jnp.where((iota_KM0 == src_t) & (iota_KM1 == i), PS, 0.0)
        )
        dst_sc = jnp.sum(
            jnp.where((iota_KM0 == dst_t) & (iota_KM1 == j), PS, 0.0)
        )

        row0 = jnp.sum(jnp.where(oh0, ids, 0), axis=0, keepdims=True)  # (1, K)
        row1 = jnp.sum(jnp.where(oh1, ids, 0), axis=0, keepdims=True)
        sc0 = jnp.sum(jnp.where(oh0, score, 0.0))
        sc1 = jnp.sum(jnp.where(oh1, score, 0.0))
        ct0 = jnp.sum(jnp.where(oh0, count, 0))
        ct1 = jnp.sum(jnp.where(oh1, count, 0))

        oh_src = (iota_1K == src_t).astype(jnp.int32)       # (1, K)
        oh_dst = (iota_1K == dst_t).astype(jnp.int32)
        row0_dst = jnp.sum(jnp.where(iota_1K == dst_t, row0, 0))
        already = row0_dst == j
        overlap = jnp.max(((row0 >= 0) & (row1 >= 0)).astype(jnp.int32)) > 0

        case_new = good & ~has0
        case_two = good & has1
        case_setdst = (good & has0 & ~has1 & ~already) | (case_two & overlap)
        case_merge = case_two & ~overlap
        do_write = case_new | case_setdst | case_merge

        row_setdst = row0 * (1 - oh_dst) + j * oh_dst
        row_merge = row0 + row1 + 1
        row_new = -1 + (i + 1) * oh_src + (j + 1) * oh_dst
        new_row = jnp.where(
            case_new, row_new, jnp.where(case_merge, row_merge, row_setdst)
        )
        new_sc = jnp.where(
            case_new, src_sc + dst_sc + cs,
            jnp.where(case_merge, sc0 + sc1 + cs, sc0 + dst_sc + cs),
        )
        new_ct = jnp.where(case_new, 2, jnp.where(case_merge, ct0 + ct1, ct0 + 1))

        p_tgt = jnp.where(case_new, ncre, a0)
        wmask = (iota_P0 == p_tgt) & do_write               # (P, 1)

        ids = jnp.where(wmask, new_row, ids)
        score = jnp.where(wmask, new_sc, score)
        count = jnp.where(wmask, new_ct, count)
        alive = jnp.where(wmask, 1, alive)
        alive = jnp.where(oh1 & case_merge, 0, alive)
        ncre = ncre + case_new.astype(jnp.int32)
        return ids, score, count, alive, ncre

    ids0 = jnp.full((P, K), -1, jnp.int32)
    score0 = jnp.zeros((P, 1), jnp.float32)
    count0 = jnp.zeros((P, 1), jnp.int32)
    alive0 = jnp.zeros((P, 1), jnp.int32)
    ids, score, count, alive, _ = jax.lax.fori_loop(
        0, L * M, merge, (ids0, score0, count0, alive0, jnp.int32(0))
    )

    # ---- stage 3: filter + pack in creation order -------------------------
    mean_sc = score / jnp.maximum(count, 1).astype(jnp.float32)
    survive = (
        (alive > 0) & (count >= min_parts)
        & (mean_sc >= jnp.float32(min_score))
    )                                                       # (P, 1)
    sf = survive.astype(jnp.float32)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    ).astype(jnp.float32)
    rank = jnp.dot(tri, sf, preferred_element_type=jnp.float32) - 1.0  # (P, 1)
    n_surv = jnp.sum(sf).astype(jnp.int32)
    counts = jnp.minimum(n_surv, p_out)

    # selector (p_out, P): row r picks the r-th survivor (creation order)
    rank_t = rank.astype(jnp.int32).reshape(1, P)  # exact small ints
    keep_t = sf.reshape(1, P)
    iota_out0 = jax.lax.broadcasted_iota(jnp.int32, (p_out, P), 0)
    sel = ((iota_out0 == rank_t) & (keep_t > 0)).astype(jnp.float32)
    out = jnp.dot(sel, ids.astype(jnp.float32),
                  preferred_element_type=jnp.float32)        # (p_out, K)
    filled = jax.lax.broadcasted_iota(jnp.int32, (p_out, 1), 0) < counts
    out = jnp.where(filled, out, -1.0)
    ids_ref[0] = out.astype(jnp.int32)
    cnt_ref[0] = jnp.zeros((1, 8), jnp.int32) + counts


@functools.partial(
    jax.jit,
    static_argnames=("limbs", "max_people", "min_parts", "min_score",
                     "interpret"),
)
def assemble_ids_pallas(peak_score, s_masked, limbs, max_people: int = 16,
                        min_parts: int = 3, min_score: float = 0.2,
                        interpret: bool = False):
    """Greedy assembly to packed peak-id tables.

    peak_score: (B, K, M) f32; s_masked: (B, L, M, M) f32 with -inf at
    non-candidates. Returns (ids (B, max_people, K) int32 peak indices with
    -1 holes, counts (B,) int32).
    """
    B, K, M = peak_score.shape
    limbs_arr = np.asarray(limbs, dtype=np.int32)
    L = limbs_arr.shape[0]
    P = L * M
    srct = jnp.asarray(np.repeat(limbs_arr[:, 0:1], M, axis=1))  # (L, M)
    dstt = jnp.asarray(np.repeat(limbs_arr[:, 1:2], M, axis=1))
    kernel = functools.partial(
        _assemble_kernel, L=L, M=M, K=K, P=P, p_out=max_people,
        min_parts=min_parts, min_score=float(min_score),
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    ids, cnt = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, max_people, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, M, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((L, M)), rep((L, M)),
        ],
        out_specs=(
            pl.BlockSpec((1, max_people, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(s_masked.astype(jnp.float32), peak_score.astype(jnp.float32),
      srct, dstt)
    return ids, cnt[:, 0, 0]
