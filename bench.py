"""End-to-end throughput benchmark: raw depth frames -> 3D human lists.

Two pipelines, both ONE jitted XLA program per batch with EVERY batch's
human tensors materialized on the host (per-batch double-buffered drain —
an honest serving number, not device-dispatch throughput):

- openpose (default, the north-star path "preproc + CNN + assembly"):
  clip/resize/normalize + RTPoseLight3D + batched peak NMS + subpixel
  refine + PAF scoring + ON-DEVICE greedy assembly + heat-weighted z
  readout + back-projection (decode/openpose_infer.py).
- popnet: preproc + PopNet + prior decode/NMS + alignment & z readout +
  back-projection (decode/popnet_infer.py).

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


def _preproc(raw_depth):
    """(B, 512, 480) meters -> (B, 224, 224, 1) normalized."""
    x = jnp.clip(raw_depth, 0.0, KDH3D_DEPTH.max)
    # one gather for the whole batch: (B, H, W) -> (H, W, B) channels
    x = resize_bilinear_cv2(jnp.transpose(x, (1, 2, 0)), 224, 224)
    x = jnp.transpose(x, (2, 0, 1))
    return ((x - KDH3D_DEPTH.mean) / KDH3D_DEPTH.std)[..., None]


def _init_on_cpu(model):
    # initialize on host CPU: param init needs no TPU and skips a slow
    # tunneled compile
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 1), jnp.float32), train=False
        )
    return jax.device_put(variables, jax.devices()[0])


def build_popnet_pipeline(dtype=jnp.bfloat16):
    ecfg = EncoderConfig()
    dcfg = DecodeConfig()
    model = PopNet(dtype=dtype)
    variables = _init_on_cpu(model)

    @jax.jit
    def pipeline(raw_depth):
        x = _preproc(raw_depth)
        (heat, z, align, prior), _ = model.apply(variables, x, train=False)
        out = popnet_decode(
            heat.astype(jnp.float32), z.astype(jnp.float32),
            align.astype(jnp.float32), prior.astype(jnp.float32),
            ecfg, dcfg, KDH3D_DEPTH, KDH3D_INTRINSICS,
        )
        return _pack(out["joints2d"], out["joints3d"], out["conf"],
                     out["valid"].astype(jnp.float32))

    return pipeline


def _pack(*tensors):
    """Flatten per-batch outputs into ONE f32 buffer: a single D2H transfer.

    Through the axon tunnel every materialized array is a ~40-50 ms
    synchronous round trip, so fetching 4 small arrays per batch costs more
    than the whole CNN. One packed buffer -> one round trip; the host
    unpacks with numpy views (see unpack_human_tensors)."""
    B = tensors[0].shape[0]
    return jnp.concatenate(
        [t.astype(jnp.float32).reshape(B, -1) for t in tensors], axis=1
    )


def unpack_human_tensors(buf, max_people, num_joints):
    """Host-side inverse of _pack for the (joints2d, joints3d, conf, n) layout."""
    B = buf.shape[0]
    P, K = max_people, num_joints
    s1, s2, s3 = P * K * 2, P * K * 3, P * K
    j2 = buf[:, :s1].reshape(B, P, K, 2)
    j3 = buf[:, s1 : s1 + s2].reshape(B, P, K, 3)
    cf = buf[:, s1 + s2 : s1 + s2 + s3].reshape(B, P, K)
    n = buf[:, s1 + s2 + s3 :]
    return j2, j3, cf, n


def build_openpose_pipeline(dtype=jnp.bfloat16):
    """Open-Pose+ end-to-end on device: preproc + CNN + NMS/refine + PAF
    scoring + greedy assembly + z readout + back-projection. Only the
    (B, P, K, ...) human tensors come back to the host."""
    from popnet_tpu.decode.openpose_infer import openpose_decode
    from popnet_tpu.models import RTPoseLight3D

    ecfg = EncoderConfig()
    dcfg = DecodeConfig()
    model = RTPoseLight3D(dtype=dtype)
    variables = _init_on_cpu(model)

    @jax.jit
    def pipeline(raw_depth):
        x = _preproc(raw_depth)
        (paf, heat, z), _ = model.apply(variables, x, train=False)
        out = openpose_decode(
            heat.astype(jnp.float32), paf.astype(jnp.float32),
            z.astype(jnp.float32), x.astype(jnp.float32),
            ecfg, dcfg, KDH3D_DEPTH, KDH3D_INTRINSICS,
        )
        return _pack(out["joints2d"], out["joints3d"], out["conf"],
                     out["counts"].astype(jnp.float32))

    return pipeline


def materialize(out):
    # on the axon backend only host materialization proves execution
    # finished (block_until_ready does not reliably wait)
    return np.asarray(out)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    qdepth = int(os.environ.get("BENCH_QUEUE", "3"))
    mode = os.environ.get("BENCH_MODEL", "openpose")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0.5, 6.0, (batch, 512, 480)).astype(np.float32))

    pipeline = (
        build_openpose_pipeline() if mode == "openpose" else build_popnet_pipeline()
    )
    metric = f"{mode}_e2e_inference"

    materialize(pipeline(frames))  # warmup / compile
    materialize(pipeline(frames))

    # pipelined per-batch drain: keep `qdepth` batches in flight, fetch the
    # oldest each step — EVERY batch's packed human tensors reach the host
    # inside the timed region (serving semantics), while the single-buffer
    # fetch overlaps device compute of the in-flight batches
    from collections import deque

    t0 = time.perf_counter()
    q = deque()
    for _ in range(min(qdepth, iters)):
        q.append(pipeline(frames))
    for _ in range(iters - len(q)):
        q.append(pipeline(frames))
        materialize(q.popleft())
    while q:
        materialize(q.popleft())
    dt = time.perf_counter() - t0

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
