"""End-to-end throughput benchmark: raw depth frames -> 3D human lists.

Two pipelines (popnet_tpu/serving.py), both ONE jitted XLA program per batch
with EVERY batch's human tensors materialized on the host (per-batch
double-buffered drain — an honest serving number, not device-dispatch
throughput):

- openpose (default, the north-star path "preproc + CNN + assembly"):
  clip/resize/normalize + RTPoseLight3D + batched peak NMS + subpixel
  refine + PAF scoring + ON-DEVICE greedy assembly + heat-weighted z
  readout + back-projection (decode/openpose_infer.py).
- popnet: preproc + PopNet + prior decode/NMS + alignment & z readout +
  back-projection (decode/popnet_infer.py).

Env knobs: BENCH_MODEL=openpose|popnet, BENCH_BATCH, BENCH_ITERS,
BENCH_QUEUE, BENCH_STAGE=full|cnn (cnn truncates after the CNN to
attribute time between CNN and decode+D2H), BENCH_PACK=q16|f32 (default
q16: the fixed-point uint16 wire buffer, 3x fewer D2H bytes; quantization
<=1/32 px / <=0.13 mm, far under the benchmark thresholds — BENCH_PACK=f32
for the exact-float wire).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north-star of 2000 depth frames/sec/chip.
"""

import json
import os
import time

import numpy as np

import jax.numpy as jnp

from popnet_tpu.serving import (
    build_openpose_pipeline,
    build_popnet_pipeline,
    serve_stream,
)

BASELINE_FPS = 2000.0


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    qdepth = int(os.environ.get("BENCH_QUEUE", "3"))
    mode = os.environ.get("BENCH_MODEL", "openpose")
    stage = os.environ.get("BENCH_STAGE", "full")
    pack = os.environ.get("BENCH_PACK", "q16")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0.5, 6.0, (batch, 512, 480)).astype(np.float32))

    pipeline = (
        build_openpose_pipeline(stage=stage, pack=pack)
        if mode == "openpose"
        else build_popnet_pipeline(pack=pack)
    )
    metric = f"{mode}_e2e_inference" if stage == "full" else f"{mode}_{stage}_only"

    np.asarray(pipeline(frames))  # warmup / compile
    np.asarray(pipeline(frames))

    # pipelined per-batch drain: keep `qdepth` batches in flight, fetch the
    # oldest each step — EVERY batch's packed human tensors reach the host
    # inside the timed region (serving semantics), while the single-buffer
    # fetch overlaps device compute of the in-flight batches
    t0 = time.perf_counter()
    for _ in serve_stream(pipeline, (frames for _ in range(iters)),
                          queue_depth=qdepth):
        pass
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
