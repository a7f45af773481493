"""End-to-end throughput benchmark: depth frames -> aligned 3D poses.

Measures the full PoP-Net inference path on one chip:
preprocessing (clip + normalize + resize 512x480 -> 224x224) + CNN forward
+ prior decode/NMS + alignment & z readout + back-projection — all one jitted
XLA program per batch.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north-star of 2000 depth frames/sec/chip.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.core.camera import KDH3D_INTRINSICS
from popnet_tpu.core.config import DecodeConfig, EncoderConfig, KDH3D_DEPTH
from popnet_tpu.decode.popnet_infer import popnet_decode
from popnet_tpu.models import PopNet
from popnet_tpu.ops.resize import resize_bilinear_cv2

BASELINE_FPS = 2000.0


def build_pipeline(batch: int, dtype=jnp.bfloat16):
    ecfg = EncoderConfig()
    dcfg = DecodeConfig()
    model = PopNet(dtype=dtype)
    # initialize on host CPU: param init needs no TPU and skips a slow
    # tunneled compile
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 1), jnp.float32), train=False
        )
    variables = jax.device_put(variables, jax.devices()[0])

    @jax.jit
    def pipeline(raw_depth):  # (B, 512, 480) meters
        x = jnp.clip(raw_depth, 0.0, KDH3D_DEPTH.max)
        # one gather for the whole batch: (B, H, W) -> (H, W, B) channels
        x = resize_bilinear_cv2(jnp.transpose(x, (1, 2, 0)), 224, 224)
        x = jnp.transpose(x, (2, 0, 1))
        x = (x - KDH3D_DEPTH.mean) / KDH3D_DEPTH.std
        (heat, z, align, prior), _ = model.apply(variables, x[..., None], train=False)
        out = popnet_decode(
            heat.astype(jnp.float32), z.astype(jnp.float32),
            align.astype(jnp.float32), prior.astype(jnp.float32),
            ecfg, dcfg, KDH3D_DEPTH, KDH3D_INTRINSICS,
        )
        return out["joints2d"], out["joints3d"], out["conf"], out["valid"]

    return pipeline


def build_openpose_pipeline(dtype=jnp.bfloat16):
    """Open-Pose+ path: preproc + RTPoseLight3D + batched peak NMS/subpixel
    refine + PAF pair scoring on device; greedy assembly on host (C++)."""
    from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched
    from popnet_tpu.models import RTPoseLight3D
    from popnet_tpu import native

    dcfg = DecodeConfig()
    model = RTPoseLight3D(dtype=dtype)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 1), jnp.float32), train=False
        )
    variables = jax.device_put(variables, jax.devices()[0])

    @jax.jit
    def device_part(raw_depth):
        x = jnp.clip(raw_depth, 0.0, KDH3D_DEPTH.max)
        x = resize_bilinear_cv2(jnp.transpose(x, (1, 2, 0)), 224, 224)
        x = jnp.transpose(x, (2, 0, 1))
        x = (x - KDH3D_DEPTH.mean) / KDH3D_DEPTH.std
        (paf, heat, z), _ = model.apply(variables, x[..., None], train=False)
        heat = heat.astype(jnp.float32)
        paf = paf.astype(jnp.float32)
        peaks, valid = find_peaks_batched(
            heat, max_peaks=dcfg.max_peaks, thresh=dcfg.thresh_heatmap
        )
        scores, ok = score_limb_pairs_batched(paf, peaks, valid)
        return peaks, valid, scores, ok, z.astype(jnp.float32)

    assert native.available(), "native assembler required for the bench"

    def pipeline(frames):
        return _assemble_from_device(device_part(frames))

    return pipeline, device_part


def _assemble_from_device(dev_out):
    from popnet_tpu import native
    from popnet_tpu.core.skeleton import LIMBS

    peaks, valid, scores, ok, _z = dev_out
    return native.assemble_batch_native(
        np.asarray(peaks), np.asarray(valid), np.asarray(scores),
        np.asarray(ok), LIMBS,
    )


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    mode = os.environ.get("BENCH_MODEL", "popnet")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0.5, 6.0, (batch, 512, 480)).astype(np.float32))

    if mode == "openpose":
        pipeline, device_part = build_openpose_pipeline()
        pipeline(frames)  # warmup / compile (assembly materializes outputs)
        # double-buffer: dispatch batch i+1 before draining batch i so the
        # host fetch + C++ assembly overlap device compute
        t0 = time.perf_counter()
        prev = device_part(frames)
        for _ in range(iters - 1):
            nxt = device_part(frames)
            _assemble_from_device(prev)
            prev = nxt
        out = _assemble_from_device(prev)
        dt = time.perf_counter() - t0
        metric = "openpose_e2e_inference"
    else:
        pipeline = build_pipeline(batch)
        # warmup / compile; fetch to host — on this backend only a real
        # materialization proves execution finished
        [np.asarray(o) for o in pipeline(frames)]
        [np.asarray(o) for o in pipeline(frames)]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipeline(frames)
        # steady-state pipelined throughput: dispatch all, then drain the
        # final iteration's results to host
        [np.asarray(o) for o in out]
        dt = time.perf_counter() - t0
        metric = "popnet_e2e_inference"

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
