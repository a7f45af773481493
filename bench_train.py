"""Training-throughput benchmark: PoP-Net train step + real input pipeline.

Measures, on the real chip:
  1. end-to-end train frames/sec (host IO + on-device augment/encode +
     fwd/bwd/update) with the background-prefetch iterator,
  2. the input pipeline alone (same iteration, no step) -> headroom.

Run: python bench_train.py            (env: TRAIN_BATCH=64,128 TRAIN_DTYPE=bf16)
TRAIN_PIPELINE=host (default) uses the single-person host-IO dataset;
TRAIN_PIPELINE=bank uses DeviceMPAugDataset — the HBM-resident mp-aug scene
bank where per-step H2D is indices + labels only.
Prints one JSON line per configuration. Not driver-facing (bench.py is the
inference headline); results recorded in PARITY.md.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from popnet_tpu.core.config import EncoderConfig
    from popnet_tpu.data.datasets import KDH3DDataset
    from popnet_tpu.losses import popnet_loss
    from popnet_tpu.models import PopNet
    from popnet_tpu.parallel.mesh import make_mesh
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.steps import make_popnet_train_step

    from tests import synthetic_data

    n_images = int(os.environ.get("TRAIN_IMAGES", "256"))
    batches = [int(b) for b in os.environ.get("TRAIN_BATCH", "64,128").split(",")]
    dtype = jnp.bfloat16 if os.environ.get("TRAIN_DTYPE", "bf16") == "bf16" else jnp.float32
    transfer = os.environ.get("TRAIN_TRANSFER", "u16mm")

    pipeline = os.environ.get("TRAIN_PIPELINE", "host")
    root = tempfile.mkdtemp(prefix="bench_train_")
    paths = synthetic_data.build(root, n_images=n_images)
    ecfg = EncoderConfig()
    if pipeline == "bank":
        from popnet_tpu.data.datasets import DeviceMPAugDataset

        ds = DeviceMPAugDataset(
            paths["img_dir"], paths["labels_locs"], bg_file=paths["labels_bg"],
            bg_dir=paths["bg_dir"], seg_dir=paths["seg_dir"], ecfg=ecfg,
            is_train=True,
        )
    elif pipeline == "stream":
        # chunk-streaming bank: bank-exceeding sets stream through HBM in
        # double-buffered shards (TRAIN_SHARD indices/shard, TRAIN_REPEATS
        # passes per resident shard)
        from popnet_tpu.data.streaming import StreamingDeviceMPAugDataset

        ds = StreamingDeviceMPAugDataset(
            paths["img_dir"], paths["labels_locs"], bg_file=paths["labels_bg"],
            bg_dir=paths["bg_dir"], seg_dir=paths["seg_dir"], ecfg=ecfg,
            is_train=True,
            shard_indices=int(os.environ.get("TRAIN_SHARD", "64")),
            shard_repeats=int(os.environ.get("TRAIN_REPEATS", "1")),
        )
        print(json.dumps({
            "note": "stream geometry",
            "n_shards": ds.n_shards,
            "shard_mb": round(ds.shard_bytes() / 1e6, 1),
        }))
    else:
        ds = KDH3DDataset(paths["img_dir"], paths["labels"], ecfg=ecfg,
                          is_train=True, transfer=transfer)

    model = PopNet(dtype=dtype)
    step = make_popnet_train_step()

    def eval_loss(state, batch):
        (_, saved) = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        loss, _ = popnet_loss(
            saved, batch["heatmaps"], batch["zmaps"], batch["fg_masks_z"],
            batch["align_maps"], batch["fg_masks_align"], batch["prior_map"],
            batch["prior_mask_conf"], batch["prior_mask_coord"],
            ecfg.num_joints, prior_weight_map=batch["prior_weight_map"],
        )
        return loss

    for batch_size in batches:
        mesh = make_mesh(jax.devices()[:1])
        trainer = Trainer(
            model, step, eval_loss, learning_rate=1.0,
            mesh=mesh, out_dir=os.path.join(root, f"run{batch_size}"),
            print_freq=10**9,
        )

        # input pipeline alone (second pass so file cache is warm)
        for _ in ds.iter_batches(batch_size):
            pass
        t0 = time.perf_counter()
        n = 0
        for b in ds.iter_batches(batch_size):
            n += batch_size
            jax.block_until_ready(b["image"])
        dt_data = time.perf_counter() - t0
        # frames actually yielded per epoch: shard_repeats>1 streams R
        # passes over each resident shard, so an epoch sees R*n_images
        # frames — count what the iterator produced, don't assume n_images
        epoch_frames = n

        # host assembly stage alone (no device work): the stage the
        # pipelined iterator overlaps with H2D + step
        host_fps = None
        if pipeline == "host":
            order = np.arange(len(ds))
            t0 = time.perf_counter()
            nh = 0
            for s in range(0, n_images - batch_size + 1, batch_size):
                ds.get_batch_host(order[s : s + batch_size])
                nh += batch_size
            host_fps = round(nh / (time.perf_counter() - t0), 1)

        # warm epoch (compile), then timed epoch; final loss materialization
        # is the hard sync (block_until_ready is unreliable on this backend)
        trainer.train_epoch(ds, batch_size)
        t0 = time.perf_counter()
        loss = trainer.train_epoch(ds, batch_size)
        dt = time.perf_counter() - t0
        steps = epoch_frames // batch_size

        # device step alone (input pipeline excluded): one cached device
        # batch stepped repeatedly, loss materialized as the hard sync
        cached = next(iter(ds.iter_batches(batch_size, prefetch=0)))
        state = trainer.state
        step_iters = max(steps, 8)
        step_flops = step_bytes = None
        try:
            cost = trainer.step_fn.lower(state, cached).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            step_flops = float(cost.get("flops", 0.0)) or None
            step_bytes = float(cost.get("bytes accessed", 0.0)) or None
        except Exception:
            pass
        state, logs = trainer.step_fn(state, cached)
        float(logs["loss"])
        t0 = time.perf_counter()
        for _ in range(step_iters):
            state, logs = trainer.step_fn(state, cached)
        lval = float(logs["loss"])
        dt_step = time.perf_counter() - t0
        assert np.isfinite(lval)

        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        PEAK_BW = float(os.environ.get("BENCH_PEAK_GBPS", "819")) * 1e9
        mfu = (
            round(step_flops * step_iters / dt_step / peak, 4)
            if step_flops else None
        )
        print(json.dumps({
            "metric": "popnet_train_throughput",
            "pipeline": pipeline,
            "batch": batch_size,
            "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
            "transfer": transfer,
            "frames_per_sec": round(steps * batch_size / dt, 1),
            "input_pipeline_fps": round(n / dt_data, 1),
            "host_stage_fps": host_fps,
            "device_step_fps": round(step_iters * batch_size / dt_step, 1),
            "train_mfu": mfu,
            "gflops_per_step": round(step_flops / 1e9, 1) if step_flops else None,
            # deterministic cost-model figure (VERDICT r3 item 9): the
            # roofline lower bound of the compiled program, immune to the
            # +-30% tunnel/wall-clock noise — compare THIS across rounds
            "roofline_ms_per_frame": (
                round(max(step_flops / peak, (step_bytes or 0) / PEAK_BW)
                      / batch_size * 1e3, 4)
                if step_flops else None
            ),
            "final_loss": round(float(loss), 4),
        }))


if __name__ == "__main__":
    main()
