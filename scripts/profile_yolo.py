"""Yolo-Pose+ serving-row stage breakdown (VERDICT r3 item 7).

The yolo serving row sits at MFU 0.27 vs openpose's 0.55; the standing
explanation ("shallower CNN, same fixed wire cost") was never backed by a
committed profile the way yolo_a2j's was (0.09 -> 0.63). This script times
each prefix of build_yolo_pipeline two ways:

  chained   N dispatches back-to-back, one final materialization ->
            pure device throughput of the prefix program
  drained   serve_stream per-batch host materialization (bench.py's
            serving discipline) -> device + tunnel wire

so (drained - chained) isolates the wire per output tensor, and the stage
deltas within `chained` isolate preproc / CNN / prior-decode+NMS / pack
(reference decode being attributed: prior_pose_align.py:39-123, timed by
evaluation_yolo_posenet_kdh3d_mpreal.py:166-169).

Run on the chip:  python scripts/profile_yolo.py
Env: PROF_BATCH=256 PROF_ITERS=30 PROF_PASSES=3 BENCH_PEAK_TFLOPS=197
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
from popnet_tpu.decode.prior import decode_prior_maps
from popnet_tpu.models import YoloPoseNet
from popnet_tpu.serving import (
    _apply_model,
    build_yolo_pipeline,
    init_variables,
    preproc_depth,
    serve_stream,
    variables_from_npz,
)

B = int(os.environ.get("PROF_BATCH", "256"))
N = int(os.environ.get("PROF_ITERS", "30"))
PASSES = int(os.environ.get("PROF_PASSES", "3"))
PEAK = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
ECFG = EncoderConfig()
DCFG = DecodeConfig()


def _cost(jfn, *args):
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def profile(name, fn, frames):
    jfn = jax.jit(fn)
    flops, _ = _cost(jfn, frames)
    out = jfn(frames)
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0])  # compile + settle
    out_mb = sum(l.size * l.dtype.itemsize for l in leaves) / 1e6

    # chained: device throughput of the prefix program
    chained = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        for _ in range(N):
            out = jfn(frames)
        for l in jax.tree.leaves(out):
            np.asarray(l)
        chained = min(chained, (time.perf_counter() - t0) / N)

    # drained: bench.py's per-batch serving discipline (device + wire)
    drained = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        for _ in serve_stream(jfn, (frames for _ in range(N)), queue_depth=3):
            pass
        drained = min(drained, (time.perf_counter() - t0) / N)

    print(json.dumps({
        "stage": name,
        "chained_ms": round(chained * 1e3, 2),
        "drained_ms": round(drained * 1e3, 2),
        "wire_ms": round((drained - chained) * 1e3, 2),
        "out_mb_per_batch": round(out_mb, 2),
        "chained_fps": round(B / chained, 1),
        "drained_fps": round(B / drained, 1),
        "mfu_drained": round(flops / drained / PEAK, 4) if flops else None,
        "gflops": round(flops / 1e9, 1),
    }), flush=True)


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0.5, 6.0, (B, 512, 480)).astype(np.float32))

    results = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "results")
    ckpt = os.path.join(results, "bench_weights_yolo.npz")
    variables = (variables_from_npz(ckpt) if os.path.exists(ckpt) else None)
    model = YoloPoseNet(dtype=jnp.bfloat16)
    if variables is None:
        variables = init_variables(model)
    anchors = jnp.asarray(np.asarray(ECFG.anchors, np.float32))
    K = ECFG.num_joints
    depth = KDH3D_DEPTH

    profile("preproc", lambda f: preproc_depth(f, depth, ECFG.input_y,
                                               ECFG.input_x), frames)

    def cnn(f):
        x = preproc_depth(f, depth, ECFG.input_y, ECFG.input_x)
        return _apply_model(model, variables, x, None)

    profile("preproc+cnn", cnn, frames)

    def decode(f):
        prior = cnn(f)
        dets, valid = decode_prior_maps(
            prior.astype(jnp.float32), anchors, depth.mean, depth.std,
            num_joints=K, conf_threshold=DCFG.conf_threshold,
            nms_threshold=DCFG.nms_threshold, max_det=DCFG.max_people,
        )
        # serve_stream materializes each yield with one np.asarray, so the
        # stage must emit a single array: fold valid in as a trailing column
        # (same device program, one extra (B, M) f32 on the wire)
        return jnp.concatenate([dets, valid[..., None].astype(dets.dtype)], -1)

    profile("+prior_decode_nms", decode, frames)

    profile("full_f32", build_yolo_pipeline(variables, pack="f32"), frames)
    profile("full_q16", build_yolo_pipeline(variables, pack="q16"), frames)


if __name__ == "__main__":
    main()
