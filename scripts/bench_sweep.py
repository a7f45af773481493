"""One-process bench sweep: stage split + pack format + batch size.

Runs several serving configurations in a single process (the compile cache
here does not survive process restarts) and prints one JSON line per
config, same schema as bench.py. Use to attribute time between the CNN,
the decode, and the D2H drain, and to pick the headline config.

Env: SWEEP_ITERS (default 20), SWEEP_CONFIGS (comma list of
"mode:stage:pack:batch", default a standard matrix).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from popnet_tpu.serving import (
    build_openpose_pipeline,
    build_popnet_pipeline,
    serve_stream,
)

BASELINE_FPS = 2000.0
DEFAULT = (
    "openpose:cnn:f32:256,"
    "openpose:full:f32:256,"
    "openpose:full:q16:256,"
    "openpose:full:q16:512,"
    "openpose:full:q16:1024,"
    "popnet:full:f32:256,"
    "popnet:full:q16:256,"
    "popnet:full:q16:512"
)


def run_config(mode, stage, pack, batch, iters, qdepth=3):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0.5, 6.0, (batch, 512, 480)).astype(np.float32)
    )
    if mode == "openpose":
        pipe = build_openpose_pipeline(stage=stage, pack=pack)
    else:
        pipe = build_popnet_pipeline(pack=pack)
    np.asarray(pipe(frames))
    np.asarray(pipe(frames))
    t0 = time.perf_counter()
    for _ in serve_stream(pipe, (frames for _ in range(iters)), queue_depth=qdepth):
        pass
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": f"{mode}_{stage}_{pack}_b{batch}",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        ),
        flush=True,
    )


def main():
    iters = int(os.environ.get("SWEEP_ITERS", "20"))
    configs = os.environ.get("SWEEP_CONFIGS", DEFAULT)
    for c in configs.split(","):
        mode, stage, pack, batch = c.strip().split(":")
        run_config(mode, stage, pack, int(batch), iters)


if __name__ == "__main__":
    main()
