"""Synthetic-generalization regression pin (VERDICT r1 items 4 + 7).

Trains PoP-Net via the CLI recipe on a fixed procedural mp-aug train set
and scores it on a FROZEN mp-aug val set built from a disjoint random seed
— so a good score demonstrates learning, not memorization. Both alignment
readouts ("gated" and "universe") are scored, settling which semantics the
flagship decode should default to.

Run on the chip:  python scripts/syngen.py
Writes examples/results/syngen_r2.json; tests/test_syngen.py pins it.
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from popnet_tpu.cli import evaluate as ev
    from popnet_tpu.cli.main import main as cli
    from popnet_tpu.core.config import DecodeConfig, EncoderConfig
    from popnet_tpu.data.datasets import MPRealDataset
    from popnet_tpu.models import PopNet
    from popnet_tpu.train.checkpoint import restore_checkpoint
    from popnet_tpu.train.state import create_train_state

    from tests import synthetic_data

    # budget note: 20 epochs x 16 steps left the loss still descending and
    # scored PCK 0 (the PCK matcher gates on bbox IoU>=0.5, so a half-trained
    # detector shows mAP>0 with PCK=0); ~2k+ steps is the regime where the
    # overfit examples converge, so default to 128 epochs here.
    n_train = int(os.environ.get("SYNGEN_TRAIN", "256"))
    n_val = int(os.environ.get("SYNGEN_VAL", "64"))
    epochs = int(os.environ.get("SYNGEN_EPOCHS", "500"))
    batch = int(os.environ.get("SYNGEN_BATCH", "32"))
    # the reference's SGD lr=1.0 + plateau is tuned for its 176k-image,
    # ~1M-step runs; at this bounded synthetic budget it underfits (run 1:
    # 2048 steps, loss plateaued 0.06, PCK 0 with mAP2D 0.39 — the
    # half-trained-detector signature). The overfit examples converge with
    # lr=0.05, so that is the default here.
    lr = os.environ.get("SYNGEN_LR", "0.05")

    work = os.environ.get("SYNGEN_DIR") or tempfile.mkdtemp(prefix="syngen_")
    train_root = os.path.join(work, "train")
    val_root = os.path.join(work, "val")
    frozen = os.path.join(work, "val_frozen")
    run_dir = os.path.join(work, "run")

    print(f"[syngen] workdir {work}")
    synthetic_data.build(train_root, n_images=n_train, n_locations=5, seed=0)
    synthetic_data.build(val_root, n_images=n_val, n_locations=5, seed=777)

    # freeze a disjoint-seed multi-person val benchmark
    cli(["generate-augset", "--kind", "mpaug", "--data-root", val_root,
         "--out-dir", frozen, "--seed", "777"])

    # the reference PoP-Net recipe, bounded budget
    # constant lr: the plateau controller starves bounded runs (run 3: lr
    # decayed 0.05 -> 0.02 by epoch 43 while the loss was still descending)
    cli(["train", "--model", "popnet", "--data-root", train_root,
         "--labels", "labels.json", "--mp-aug", "--out-dir", run_dir,
         "--epochs", str(epochs), "--batch-size", str(batch), "--lr", lr,
         "--lr-patience", str(10 * epochs),
         "--val-labels", "labels.json", "--transfer", "u16mm"])

    ecfg = EncoderConfig()
    dcfg = DecodeConfig()
    model = PopNet()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 1))
    )
    state, meta, step = restore_checkpoint(os.path.join(run_dir, "ckpt_best"), state)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    def infer(images):
        (heat, z, align, prior), _ = model.apply(variables, images, train=False)
        return heat, z, align, prior

    dataset = MPRealDataset(
        os.path.join(frozen, "depth_maps"),
        os.path.join(frozen, "labels_test.json"), ecfg=ecfg,
    )

    out = {
        "train_images": n_train, "val_images": len(dataset),
        "epochs": epochs, "batch": batch, "lr": float(lr),
        "best_epoch": (meta or {}).get("epoch", step),
        "val_loss": (meta or {}).get("val_loss"),
        "train_seed": 0, "val_seed": 777,
    }
    for readout in ("gated", "universe"):
        data = ev.run_popnet_eval(infer, dataset, 16, ecfg, dcfg, readout=readout)
        res = ev.evaluate_eval_data(data, verbose=False)
        out[readout] = {
            k: round(float(v), 4) for k, v in res.items() if not k.startswith("per_")
        }
        print(f"[syngen] {readout}: {out[readout]}")

    dest = os.path.join(REPO, "examples", "results", "syngen_r2.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[syngen] wrote {dest}")


if __name__ == "__main__":
    main()
