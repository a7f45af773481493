"""Synthetic-generalization benchmark (VERDICT r2 items 1 + 2).

Trains PoP-Net from scratch on a procedural mp-aug train set and scores it
on a FROZEN mp-aug val set built from a disjoint random seed — so a good
score demonstrates learning, not memorization. Both alignment readouts
("gated" and "universe") are scored at every curve point, settling which
semantics the flagship decode should default to with a measured delta.

Round-3 recipe: Adam + warmup/cosine over the whole budget (the reference's
SGD lr=1.0 + plateau is tuned for its ~1M-step, 176k-image runs,
train_rtpose_light3d_kdh3d.py:313-319, and underfits badly at a bounded
budget — round-2 runs 1-2 showed loss still descending at cutoff with
PCK ~0). Training happens in resumed chunks with a metric eval between
chunks, producing the metric-vs-step curve; the script rewrites the summary
JSON after every chunk so partial runs still record evidence.

Run on the chip:  python scripts/syngen.py
Writes examples/results/syngen_r3.json; tests/test_syngen.py pins it.
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from popnet_tpu.cli import evaluate as ev
    from popnet_tpu.cli.main import main as cli
    from popnet_tpu.core.config import DecodeConfig, EncoderConfig, KDH3D_DATASET
    from popnet_tpu.data.datasets import (
        DeviceMPAugDataset, KDH3DDataset, MPRealDataset,
    )
    from popnet_tpu.losses import popnet_loss
    from popnet_tpu.models import PopNet
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.schedule import WarmupCosine
    from popnet_tpu.train.steps import make_popnet_train_step

    from tests import synthetic_data

    n_train = int(os.environ.get("SYNGEN_TRAIN", "512"))
    n_val = int(os.environ.get("SYNGEN_VAL", "64"))
    # 512 scenes / batch 32 = 16 steps/epoch; 1250 epochs = 20k steps —
    # the VERDICT r2 item-1 budget (~1-2 h of chip time with the cached
    # input pipeline).
    epochs = int(os.environ.get("SYNGEN_EPOCHS", "1250"))
    chunk = int(os.environ.get("SYNGEN_CHUNK", "125"))
    batch = int(os.environ.get("SYNGEN_BATCH", "32"))
    lr = float(os.environ.get("SYNGEN_LR", "1e-3"))
    warmup = int(os.environ.get("SYNGEN_WARMUP", "30"))
    val_every = int(os.environ.get("SYNGEN_VAL_EVERY", "10"))
    out_name = os.environ.get("SYNGEN_OUT", "syngen_r3.json")

    work = os.environ.get("SYNGEN_DIR") or tempfile.mkdtemp(prefix="syngen_")
    train_root = os.path.join(work, "train")
    val_root = os.path.join(work, "val")
    frozen = os.path.join(work, "val_frozen")
    run_dir = os.path.join(work, os.environ.get("SYNGEN_RUN", "run"))
    if os.path.exists(run_dir):
        # datasets are reusable across invocations; checkpoints are not
        # (orbax would mix steps from different recipes)
        import shutil

        shutil.rmtree(run_dir)

    print(f"[syngen] workdir {work}", flush=True)
    # the procedural build is deterministic in (n, seed); reuse it across
    # invocations of the same SYNGEN_DIR (the last-written artifact is the
    # completeness marker)
    if not os.path.exists(os.path.join(train_root, "labels_loc4.json")):
        synthetic_data.build(train_root, n_images=n_train, n_locations=5, seed=0)
    if not os.path.exists(os.path.join(val_root, "labels_loc4.json")):
        synthetic_data.build(val_root, n_images=n_val, n_locations=5, seed=777)

    # freeze a disjoint-seed multi-person val benchmark
    if not os.path.exists(os.path.join(frozen, "labels_test.json")):
        cli(["generate-augset", "--kind", "mpaug", "--data-root", val_root,
             "--out-dir", frozen, "--seed", "777"])

    ecfg = EncoderConfig()
    dcfg = DecodeConfig()
    model = PopNet()
    step = make_popnet_train_step(pred_vis=False)

    def eval_loss(state, batch_):
        (_, saved) = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch_["image"], train=False,
        )
        loss, _ = popnet_loss(
            saved, batch_["heatmaps"], batch_["zmaps"], batch_["fg_masks_z"],
            batch_["align_maps"], batch_["fg_masks_align"], batch_["prior_map"],
            batch_["prior_mask_conf"], batch_["prior_mask_coord"],
            ecfg.num_joints, prior_weight_map=batch_["prior_weight_map"],
            pred_vis=False,
        )
        return loss

    ann_files = sorted(
        os.path.join(train_root, f) for f in os.listdir(train_root)
        if f.startswith("labels_loc") and f.endswith(".json")
    )
    common = dict(ecfg=ecfg, dcfg=KDH3D_DATASET, pose_align=True,
                  with_prior=True, transfer="u16mm", cache_images=True)
    # device-resident scene bank: per-step H2D is indices + labels only —
    # the tunnel's ~90 fps image-transfer ceiling disappears
    train_ds = DeviceMPAugDataset(
        os.path.join(train_root, "depth_maps"), ann_files,
        bg_file=os.path.join(train_root, "labels_bg.json"),
        bg_dir=os.path.join(train_root, "bg_maps"),
        seg_dir=os.path.join(train_root, "seg_maps"), seed=0, **common,
    )
    val_ds = KDH3DDataset(
        os.path.join(val_root, "depth_maps"),
        os.path.join(val_root, "labels.json"), seed=1, **common,
    )
    val_ds.augment = False

    trainer = Trainer(
        model, step, eval_loss, sample_input_shape=(1, 224, 224, 1),
        learning_rate=lr, out_dir=run_dir, seed=0, optimizer="adam",
        scheduler=WarmupCosine(lr, total_epochs=epochs, warmup_epochs=warmup),
    )

    frozen_ds = MPRealDataset(
        os.path.join(frozen, "depth_maps"),
        os.path.join(frozen, "labels_test.json"), ecfg=ecfg,
    )
    steps_per_epoch = len(train_ds) // batch

    def score(state):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats

        def infer(images):
            (heat, z, align, prior), _ = model.apply(variables, images, train=False)
            return heat, z, align, prior

        res = {}
        for readout in ("gated", "universe"):
            data = ev.run_popnet_eval(infer, frozen_ds, 16, ecfg, dcfg,
                                      readout=readout)
            m = ev.evaluate_eval_data(data, verbose=False)
            res[readout] = {
                k: round(float(v), 4) for k, v in m.items()
                if not k.startswith("per_")
            }
        return res

    out = {
        "train_images": n_train, "val_images": len(frozen_ds),
        "epochs": epochs, "batch": batch, "lr": lr,
        "optimizer": "adam", "schedule": f"warmup({warmup})+cosine",
        "steps_per_epoch": steps_per_epoch,
        "train_seed": 0, "val_seed": 777, "curve": [],
    }
    dest = os.path.join(REPO, "examples", "results", out_name)

    t0 = time.time()
    done = 0
    while done < epochs:
        n = min(chunk, epochs - done)
        trainer.fit(train_ds, val_ds, epochs=n, batch_size=batch,
                    checkpoint_every=n, val_every=val_every)
        done += n
        point = {
            "epoch": trainer.epoch, "step": trainer.epoch * steps_per_epoch,
            "train_loss": trainer.history[-1]["train_loss"],
            "val_loss": trainer.history[-1]["val_loss"],
            "wall_s": round(time.time() - t0, 1),
        }
        point.update(score(trainer.state))
        out["curve"].append(point)
        g, u = point["gated"], point["universe"]
        print(f"[syngen] epoch {trainer.epoch} ({point['step']} steps, "
              f"{point['wall_s']}s): loss {point['train_loss']:.4f} "
              f"gated {g} universe {u}", flush=True)
        # final metrics = the latest curve point (full-budget model)
        out["gated"], out["universe"] = g, u
        with open(dest, "w") as f:
            json.dump(out, f, indent=2)
    print(f"[syngen] wrote {dest}")


if __name__ == "__main__":
    main()
