"""Export trained model weights for bench.py's BENCH_CKPT path.

Produces examples/results/bench_weights_{popnet,openpose}.npz (float16,
compressed) so the committed throughput numbers run with realistic decode
occupancy instead of random init (VERDICT r2 weak #6). Static shapes make
throughput data-independent, but trained weights give honest peak counts /
NMS survivors in the decode stage.

- popnet: restored from a syngen run checkpoint (--popnet-ckpt, the orbax
  dir written by scripts/syngen.py), i.e. the exact weights behind the
  committed generalization metrics.
- openpose: a short on-chip overfit of RTPoseLight3D on the synthetic set
  (--train-openpose EPOCHS) — enough signal for realistic sparse heatmaps.

Run on the TPU host:
  python scripts/export_bench_weights.py --popnet-ckpt /tmp/syngen_*/run/ckpt \
      --popnet-step 1247 --train-openpose 40
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

OUT_DIR = os.path.join(REPO, "examples", "results")


def _to_f16(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float16), tree
    )


def export_popnet(ckpt_dir, step):
    from popnet_tpu.serving import variables_to_npz
    from popnet_tpu.train.checkpoint import restore_params

    params, batch_stats, _, got = restore_params(ckpt_dir, step=step)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    path = os.path.join(OUT_DIR, "bench_weights_popnet.npz")
    variables_to_npz(_to_f16(variables), path)
    print(f"popnet step {got} -> {path} ({os.path.getsize(path)/1e6:.1f} MB)")


def train_openpose(epochs):
    from popnet_tpu.data.datasets import KDH3DDataset
    from popnet_tpu.losses import rtpose_light3d_loss_fgweight
    from popnet_tpu.models import RTPoseLight3D
    from popnet_tpu.serving import variables_to_npz
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.steps import make_rtpose_train_step
    from tests import synthetic_data

    root = "/tmp/bench_weights_data"
    paths = synthetic_data.build(root, n_images=96, seed=0)
    ds = KDH3DDataset(
        paths["img_dir"], paths["labels"], bg_aug=True,
        bg_file=paths["labels_bg"], bg_dir=paths["bg_dir"],
        seg_dir=paths["seg_dir"], render_max=1.1, seed=0,
    )

    def eval_loss(state, batch):
        (_, saved) = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        loss, _ = rtpose_light3d_loss_fgweight(
            saved, batch["heatmaps"], batch["pafs"], batch["zmaps"],
            batch["fg_masks_z"],
        )
        return loss

    trainer = Trainer(
        RTPoseLight3D(), make_rtpose_train_step(), eval_loss,
        learning_rate=0.05, out_dir="/tmp/bench_weights_run", print_freq=20,
    )
    trainer.scheduler.patience = 10**9
    trainer.fit(ds, None, epochs=epochs, batch_size=16)
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    path = os.path.join(OUT_DIR, "bench_weights_openpose.npz")
    variables_to_npz(_to_f16(variables), path)
    print(f"openpose {epochs} epochs -> {path} "
          f"({os.path.getsize(path)/1e6:.1f} MB)")


def train_yolo(epochs):
    """Short Yolo-Pose+ train via the CLI recipe -> bench_weights_yolo.npz
    (realistic prior-decode confidence/NMS occupancy for the yolo and
    yolo_a2j bench rows)."""
    from popnet_tpu.cli.main import main as cli
    from popnet_tpu.serving import variables_to_npz
    from popnet_tpu.train.checkpoint import restore_params
    from tests import synthetic_data

    root = "/tmp/bench_weights_data"
    synthetic_data.build(root, n_images=96, seed=0)
    run = "/tmp/bench_weights_yolo_run"
    cli(["train", "--model", "yolo", "--data-root", root,
         "--epochs", str(epochs), "--batch-size", "16", "--lr", "0.05",
         "--out-dir", run])
    params, batch_stats, _, _ = restore_params(os.path.join(run, "ckpt"))
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    path = os.path.join(OUT_DIR, "bench_weights_yolo.npz")
    variables_to_npz(_to_f16(variables), path)
    print(f"yolo {epochs} epochs -> {path} ({os.path.getsize(path)/1e6:.1f} MB)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--popnet-ckpt", default=None)
    ap.add_argument("--popnet-step", type=int, default=None)
    ap.add_argument("--train-openpose", type=int, default=0)
    ap.add_argument("--train-yolo", type=int, default=0)
    args = ap.parse_args()
    if args.popnet_ckpt:
        export_popnet(args.popnet_ckpt, args.popnet_step)
    if args.train_openpose:
        train_openpose(args.train_openpose)
    if args.train_yolo:
        train_yolo(args.train_yolo)


if __name__ == "__main__":
    main()
