"""Greedy person assembly ON DEVICE — the last host stage moved into XLA.

Consumes the fixed-size outputs of decode/device.py (peaks, validity, limb
pair scores) and runs the reference's greedy 1-1 limb assignment +
union-merge (reference: lib/pafprocess/pafprocess.cpp:96-191 and
lib/utils/paf_to_pose.py:234-351) entirely inside one jitted program, so the
Open-Pose+ inference path never materializes the dense (B, L, M, M)
candidate tensors on the host.

Two exact equivalences make this XLA-friendly:

1. The reference's "stable-sort candidates by descending score, then greedily
   take pairs whose src/dst peaks are unused" is identical to iterating
   "masked argmax over the (M, M) score matrix, then kill that row+column" at
   most M times: each accepted candidate is the current global max among
   pairs with free endpoints, and argmax's first-flat-index tie rule matches
   stable_sort's row-major tie order.
2. The person union-merge is order-dependent but tiny: at most L*M accepted
   connections, each touching a (P, K) slot table. A `lax.scan` over the
   connection list (limb-major, score-descending within a limb — the exact
   reference order) with tombstoned person slots reproduces the C++ vector
   semantics: `erase` preserves relative order, so slot order == creation
   order == output order.

Semantics are float32 throughout, matching the native C++ twin
(popnet_tpu/native/assembler.cpp) bit-for-bit on identical inputs; the
host NumPy assembler (decode/assemble.py) is the readable spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from popnet_tpu.core.skeleton import LIMBS


@functools.partial(
    jax.jit,
    static_argnames=(
        "limbs", "max_people", "min_parts", "min_score", "slots", "method"
    ),
)
def assemble_batched(
    peaks: jnp.ndarray,       # (B, K, M, 3) float32 (x, y, score)
    peak_valid: jnp.ndarray,  # (B, K, M) bool
    scores: jnp.ndarray,      # (B, L, M, M) float32
    ok: jnp.ndarray,          # (B, L, M, M) bool
    limbs: tuple = LIMBS,
    max_people: int = 16,
    min_parts: int = 3,
    min_score: float = 0.2,
    slots: int | None = None,
    method: str | None = None,
):
    """Batched greedy assembly; returns (joints (B, max_people, K, 3),
    counts (B,)) — the same contract as native.assemble_batch_native.

    `slots` bounds the live-person table; the default L*M is a strict upper
    bound (every person is created by exactly one accepted connection).

    method: "scan" (default) is the batched XLA formulation — it vectorizes
    every merge step over the whole batch, which on TPU beats the
    "pallas" per-row VMEM kernel (decode/assemble_pallas.py) 9x: a
    grid-per-batch-row kernel SERIALIZES B x L*M tiny iterations on one
    TensorCore (measured 64 vs 7 ms/b256 — NOTES.md). The kernel stays as
    an exact-parity variant (tests/test_assemble_device.py) and as the
    starting point for a batch-tiled rewrite if assembly ever dominates.
    """
    limbs_arr = np.asarray(limbs, dtype=np.int32)
    B, K, M, _ = peaks.shape
    L = limbs_arr.shape[0]
    P = int(slots) if slots is not None else L * M
    if method is None:
        method = "scan"

    scores = scores.astype(jnp.float32)
    peaks = peaks.astype(jnp.float32)

    # ---- stage 1: per-limb greedy 1-1 matching, descending score ----------
    s0 = jnp.where(ok, scores, -jnp.inf)  # (B, L, M, M)

    if method == "pallas":
        from popnet_tpu.decode.assemble_pallas import assemble_ids_pallas

        out_ids, counts = assemble_ids_pallas(
            peaks[..., 2], s0, limbs=limbs, max_people=max_people,
            min_parts=min_parts, min_score=min_score,
            interpret=jax.default_backend() != "tpu",
        )
        return _emit_joints(peaks, out_ids, counts, M)

    def pick(s, _):
        flat = s.reshape(B, L, M * M)
        idx = jnp.argmax(flat, axis=-1)                      # (B, L)
        val = jnp.take_along_axis(flat, idx[..., None], -1)[..., 0]
        i = idx // M
        j = idx % M
        kill = (
            jax.nn.one_hot(i, M, dtype=bool)[..., None]
            | jax.nn.one_hot(j, M, dtype=bool)[..., None, :]
        )
        return jnp.where(kill, -jnp.inf, s), (i, j, val)

    _, (ci, cj, cv) = jax.lax.scan(pick, s0, None, length=M)
    # (M, B, L) -> (B, L*M) limb-major, connection order within each limb
    ci = jnp.moveaxis(ci, 0, -1).reshape(B, L * M)
    cj = jnp.moveaxis(cj, 0, -1).reshape(B, L * M)
    cv = jnp.moveaxis(cv, 0, -1).reshape(B, L * M)
    cgood = jnp.isfinite(cv)
    cv = jnp.where(cgood, cv, 0.0)

    src_t_all = jnp.repeat(jnp.asarray(limbs_arr[:, 0]), M)  # (L*M,)
    dst_t_all = jnp.repeat(jnp.asarray(limbs_arr[:, 1]), M)

    # ---- stage 2: sequential union-merge over connections -----------------
    peak_score = peaks[..., 2]  # (B, K, M)
    barange = jnp.arange(B)

    ids0 = jnp.full((B, P, K), -1, dtype=jnp.int32)
    score0 = jnp.zeros((B, P), jnp.float32)
    count0 = jnp.zeros((B, P), jnp.int32)
    alive0 = jnp.zeros((B, P), bool)
    ncre0 = jnp.zeros((B,), jnp.int32)

    def merge(state, xs):
        # Scatter-free: every row select is a one-hot contraction and every
        # state write is a masked dense where(). TPU scatters serialize per
        # update row and dominated this scan (44 ms/batch-256 profiled);
        # the dense forms are pure VPU selects with identical values.
        ids, score, count, alive, ncre = state
        src_t, dst_t, i, j, cs, good = xs  # src_t/dst_t scalar; i,j,cs,good (B,)

        ids_src = jax.lax.dynamic_index_in_dim(ids, src_t, axis=2, keepdims=False)
        ids_dst = jax.lax.dynamic_index_in_dim(ids, dst_t, axis=2, keepdims=False)
        match = alive & ((ids_src == i[:, None]) | (ids_dst == j[:, None]))  # (B, P)
        a0 = jnp.argmax(match, axis=1)
        oh0 = jax.nn.one_hot(a0, P, dtype=bool)  # (B, P)
        has0 = jnp.any(match, axis=1)
        m2 = match & ~oh0
        a1 = jnp.argmax(m2, axis=1)
        oh1 = jax.nn.one_hot(a1, P, dtype=bool)
        has1 = jnp.any(m2, axis=1)

        src_sc = peak_score[barange, src_t, i]
        dst_sc = peak_score[barange, dst_t, j]

        oh0i = oh0.astype(jnp.int32)
        oh1i = oh1.astype(jnp.int32)
        row0 = jnp.sum(oh0i[:, :, None] * ids, axis=1)  # (B, K)
        row1 = jnp.sum(oh1i[:, :, None] * ids, axis=1)
        sc0 = jnp.sum(oh0.astype(score.dtype) * score, axis=1)
        sc1 = jnp.sum(oh1.astype(score.dtype) * score, axis=1)
        ct0 = jnp.sum(oh0i * count, axis=1)
        ct1 = jnp.sum(oh1i * count, axis=1)

        oh_src = jax.nn.one_hot(src_t, K, dtype=jnp.int32)  # (K,)
        oh_dst = jax.nn.one_hot(dst_t, K, dtype=jnp.int32)
        row0_dst = jax.lax.dynamic_index_in_dim(row0, dst_t, axis=1, keepdims=False)
        already = row0_dst == j

        overlap = jnp.any((row0 >= 0) & (row1 >= 0), axis=1)
        case_new = good & ~has0
        case_two = good & has1
        case_setdst = (good & has0 & ~has1 & ~already) | (case_two & overlap)
        case_merge = case_two & ~overlap
        do_write = case_new | case_setdst | case_merge

        row_setdst = row0 * (1 - oh_dst[None, :]) + j[:, None] * oh_dst[None, :]
        row_merge = row0 + row1 + 1
        row_new = (
            -jnp.ones((B, K), jnp.int32)
            + (i + 1)[:, None] * oh_src[None, :]
            + (j + 1)[:, None] * oh_dst[None, :]
        )
        new_row = jnp.where(
            case_new[:, None],
            row_new,
            jnp.where(case_merge[:, None], row_merge, row_setdst),
        )
        new_sc = jnp.where(
            case_new,
            src_sc + dst_sc + cs,
            jnp.where(case_merge, sc0 + sc1 + cs, sc0 + dst_sc + cs),
        )
        new_ct = jnp.where(case_new, 2, jnp.where(case_merge, ct0 + ct1, ct0 + 1))

        p_tgt = jnp.where(case_new, ncre, a0)
        wmask = jax.nn.one_hot(p_tgt, P, dtype=bool) & do_write[:, None]  # (B, P)

        ids = jnp.where(wmask[:, :, None], new_row[:, None, :], ids)
        score = jnp.where(wmask, new_sc[:, None], score)
        count = jnp.where(wmask, new_ct[:, None], count)
        alive = alive | wmask
        alive = alive & ~(oh1 & case_merge[:, None])
        ncre = ncre + case_new.astype(jnp.int32)
        return (ids, score, count, alive, ncre), None

    (ids, score, count, alive, _), _ = jax.lax.scan(
        merge,
        (ids0, score0, count0, alive0, ncre0),
        (
            src_t_all,
            dst_t_all,
            ci.T.astype(jnp.int32),
            cj.T.astype(jnp.int32),
            cv.T,
            cgood.T,
        ),
    )

    # ---- stage 3: filter + emit in creation order --------------------------
    # f32 division, not score >= min_score*count: matches the C++ twin's
    # `score / count < min_score` rounding exactly (dead slots divide 0/0 ->
    # nan -> False, and alive excludes them anyway)
    mean_sc = score / jnp.maximum(count, 1).astype(jnp.float32)
    survive = alive & (count >= min_parts) & (mean_sc >= jnp.float32(min_score))
    rank = jnp.cumsum(survive.astype(jnp.int32), axis=1) - 1
    keep = survive & (rank < max_people)
    counts = jnp.minimum(jnp.sum(survive, axis=1), max_people).astype(jnp.int32)

    dump = max_people  # all non-kept rows scatter into one discard slot
    out_slot = jnp.where(keep, rank, dump)
    out_ids = jnp.full((B, max_people + 1, K), -1, jnp.int32)
    out_ids = out_ids.at[barange[:, None], out_slot].set(
        jnp.where(keep[:, :, None], ids, -1)
    )[:, :max_people]

    return _emit_joints(peaks, out_ids, counts, M)


def _emit_joints(peaks, out_ids, counts, M):
    """Packed peak-id table -> (joints (B, Pout, K, 3), counts)."""
    B, K = peaks.shape[0], peaks.shape[1]
    idx_cl = jnp.clip(out_ids, 0, M - 1)  # (B, Pout, K)
    g = peaks[
        jnp.arange(B)[:, None, None],
        jnp.arange(K)[None, None, :],
        idx_cl,
    ]  # (B, Pout, K, 3)
    hole = jnp.asarray([-1.0, -1.0, 0.0], jnp.float32)
    joints = jnp.where(out_ids[..., None] >= 0, g, hole)
    return joints, counts
