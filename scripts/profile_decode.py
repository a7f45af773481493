"""Decode-stage device-throughput breakdown for the Open-Pose+ path.

Times each decode stage as an isolated jitted program over realistic
CNN-output shapes: N dispatches back-to-back, materializing only the final
tiny reduction (device program order makes this a clean device-throughput
number; the serving drain is measured separately by bench.py/bench_sweep).

Prints one JSON line per stage with ms per batch-256.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from popnet_tpu.core.camera import KDH3D_INTRINSICS
from popnet_tpu.core.config import DecodeConfig, EncoderConfig, KDH3D_DEPTH
from popnet_tpu.core.skeleton import LIMBS
from popnet_tpu.decode.assemble_device import assemble_batched
from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched
from popnet_tpu.decode.openpose_infer import openpose_decode, window_readout_heat_weighted

B = int(os.environ.get("PROF_BATCH", "256"))
N = int(os.environ.get("PROF_ITERS", "20"))
ECFG = EncoderConfig()
DCFG = DecodeConfig()


PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
PEAK_BW = float(os.environ.get("BENCH_PEAK_GBPS", "819")) * 1e9


def _stage_roofline(fn, *args):
    """XLA cost analysis of the compiled stage -> (flops, bytes,
    roofline ms/batch = max(compute, bandwidth) at chip peaks)."""
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        return flops, byts, max(flops / PEAK_FLOPS, byts / PEAK_BW) * 1e3
    except Exception:
        return None, None, None


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    # drain one scalar-ish leaf: forces completion of the whole chain
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / N
    flops, byts, roof = _stage_roofline(fn, *args)
    print(json.dumps({
        "stage": name, "ms_per_batch": round(dt * 1e3, 2),
        "fps": round(B / dt, 1),
        "roofline_ms": round(roof, 3) if roof is not None else None,
        "gflops": round(flops / 1e9, 2) if flops else None,
        "mb_accessed": round(byts / 1e6, 1) if byts else None,
        # which peak binds: compute (MXU) or HBM bandwidth
        "bound": (None if roof is None else
                  ("compute" if flops / PEAK_FLOPS > byts / PEAK_BW
                   else "bandwidth")),
    }), flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    H, W, K, L = 28, 28, 15, 14
    heat = jnp.asarray(rng.uniform(0, 1, (B, H, W, K + 1)).astype(np.float32))
    paf = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 2 * L)).astype(np.float32))
    zmap = jnp.asarray(rng.uniform(-1, 1, (B, H, W, K)).astype(np.float32))
    img = jnp.asarray(rng.uniform(-1.5, 1.5, (B, 224, 224, 1)).astype(np.float32))

    peaks_fn = jax.jit(lambda h: find_peaks_batched(
        h, max_peaks=DCFG.max_peaks, thresh=DCFG.thresh_heatmap,
        factor=DCFG.downsample, win_size=DCFG.win_size, num_joints=K))
    peaks_xla = jax.jit(lambda h: find_peaks_batched(
        h, max_peaks=DCFG.max_peaks, thresh=DCFG.thresh_heatmap,
        factor=DCFG.downsample, win_size=DCFG.win_size, num_joints=K,
        refine="xla"))
    timeit("find_peaks_xla_refine", peaks_xla, heat)
    peaks, pvalid = timeit("find_peaks", peaks_fn, heat)

    score_fn = jax.jit(lambda p, pk, pv: score_limb_pairs_batched(
        p, pk, pv, num_intermed_pts=DCFG.num_intermed_pts,
        thresh_paf=DCFG.thresh_paf, factor=DCFG.downsample, limbs=LIMBS))
    scores, ok = timeit("score_limbs", score_fn, paf, peaks, pvalid)

    score_up = jax.jit(lambda p, pk, pv: score_limb_pairs_batched(
        p, pk, pv, num_intermed_pts=DCFG.num_intermed_pts,
        thresh_paf=DCFG.thresh_paf, factor=DCFG.downsample, limbs=LIMBS,
        method="upsample"))
    if os.environ.get("PROF_UPSAMPLE"):
        timeit("score_limbs_upsample", score_up, paf, peaks, pvalid)

    score_pl = jax.jit(lambda p, pk, pv: score_limb_pairs_batched(
        p, pk, pv, num_intermed_pts=DCFG.num_intermed_pts,
        thresh_paf=DCFG.thresh_paf, factor=DCFG.downsample, limbs=LIMBS,
        method="pallas"))
    timeit("score_limbs_pallas", score_pl, paf, peaks, pvalid)

    asm_fn = jax.jit(lambda pk, pv, s, o: assemble_batched(
        pk, pv, s, o, limbs=LIMBS, max_people=DCFG.max_people,
        min_parts=DCFG.min_parts, min_score=DCFG.min_score))
    joints, counts = timeit("assemble", asm_fn, peaks, pvalid, scores, ok)

    gx = (joints[..., 0] / DCFG.downsample).astype(jnp.int32)
    gy = (joints[..., 1] / DCFG.downsample).astype(jnp.int32)
    read_xla = jax.jit(lambda z, h, x, y: window_readout_heat_weighted(
        z, h[..., :K], x, y, use_pallas=False))
    timeit("z_readout_xla", read_xla, zmap, heat, gx, gy)
    read_fn = jax.jit(lambda z, h, x, y: window_readout_heat_weighted(
        z, h[..., :K], x, y))
    timeit("z_readout", read_fn, zmap, heat, gx, gy)

    full_fn = jax.jit(lambda h, p, z, x: openpose_decode(
        h, p, z, x, ECFG, DCFG, KDH3D_DEPTH, KDH3D_INTRINSICS))
    timeit("full_decode", full_fn, heat, paf, zmap, img)


if __name__ == "__main__":
    main()
