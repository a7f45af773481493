"""Synthetic ITOP end-to-end benchmark (VERDICT r3 item 5).

Trains the two ITOP recipes FROM SCRATCH on a synthetic ITOP-geometry set
(320x240, f = 1/0.0035, 5 m clip — tests/synthetic_data.build_itop) and
scores each through its complete pipeline with the single-person 10-cm
protocol on a FROZEN disjoint-seed val set:

- a2j       torso-box crops (xy_thres=120, depth_thres=0.4, the reference
            itop_train_64.py recipe: Adam 3.5e-4 + L2 1e-4) -> anchor
            voting -> uncrop -> flipped-Y camera -> acc@10cm
            (cli/itop_eval.run_itop_a2j_eval == itop_test.py)
- openpose  RTPoseLight3D at ITOP geometry -> full decode -> best person
            -> acc@10cm (run_itop_openpose_eval == the single-person read
            of evaluation_rtpose_light3d_itop.py + eval_pose_single.py)

Writes examples/results/itop_syngen.json after every chunk (crash-safe);
tests/test_itop_syngen.py pins the committed floors.

Run on the chip:  python scripts/itop_table.py
Env: ITOP_METHODS=a2j,openpose ITOP_TRAIN=256 ITOP_VAL=64
     ITOP_EPOCHS=500 ITOP_A2J_EPOCHS=300 ITOP_CHUNK=100 ITOP_DIR=<workdir>
     ITOP_OUT=<json path> (point smoke runs AWAY from the committed artifact)
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

OUT = os.environ.get(
    "ITOP_OUT", os.path.join(REPO, "examples", "results", "itop_syngen.json")
)


def main():
    if os.environ.get("ITOP_CPU"):
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from popnet_tpu.cli.itop_eval import run_itop_a2j_eval, run_itop_openpose_eval
    from popnet_tpu.core.config import EncoderConfig, ITOP_DATASET
    from popnet_tpu.data.a2j_crops import CROP, ITOPA2JCropDataset
    from popnet_tpu.data.datasets import KDH3DDataset, MPRealDataset
    from popnet_tpu.losses import a2j_loss, rtpose_light3d_loss_fgweight
    from popnet_tpu.models import A2J, RTPoseLight3D
    from popnet_tpu.models.a2j import generate_anchors, shift_anchors
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.schedule import WarmupCosine
    from popnet_tpu.train.steps import make_a2j_train_step, make_rtpose_train_step

    from tests import synthetic_data

    methods = os.environ.get("ITOP_METHODS", "a2j,openpose").split(",")
    n_train = int(os.environ.get("ITOP_TRAIN", "256"))
    n_val = int(os.environ.get("ITOP_VAL", "64"))
    epochs = int(os.environ.get("ITOP_EPOCHS", "500"))
    a2j_epochs = int(os.environ.get("ITOP_A2J_EPOCHS", "300"))
    chunk = int(os.environ.get("ITOP_CHUNK", "100"))
    batch = int(os.environ.get("ITOP_BATCH", "32"))
    warmup = int(os.environ.get("ITOP_WARMUP", "20"))

    work = os.environ.get("ITOP_DIR") or tempfile.mkdtemp(prefix="itop_")
    train_root, val_root = os.path.join(work, "train"), os.path.join(work, "val")
    print(f"[itop] workdir {work}", flush=True)
    if not os.path.exists(os.path.join(train_root, "labels.json")):
        synthetic_data.build_itop(train_root, n_images=n_train, seed=0)
    if not os.path.exists(os.path.join(val_root, "labels.json")):
        synthetic_data.build_itop(val_root, n_images=n_val, seed=777)

    ecfg = EncoderConfig()

    out = {"budget": {"train_images": n_train, "val_images": n_val,
                      "epochs": epochs, "a2j_epochs": a2j_epochs,
                      "batch": batch, "train_seed": 0, "val_seed": 777,
                      "protocol": "single-person acc@10cm "
                                  "(eval_pose_single.py / itop_test.py)"},
           "methods": {}}
    if os.path.exists(OUT):
        try:
            prev = json.load(open(OUT))
            if prev.get("budget") == out["budget"]:
                out = prev
        except Exception:
            pass

    def save():
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)

    def train_chunked(name, trainer, train_ds, val_ds, total, score_fn, spe):
        rec = out["methods"].setdefault(name, {"curve": []})
        if rec.get("done"):
            print(f"[itop] {name}: already done", flush=True)
            return
        t0 = time.time()
        while trainer.epoch < total:
            n = min(chunk, total - trainer.epoch)
            trainer.fit(train_ds, val_ds, epochs=n, batch_size=batch,
                        checkpoint_every=n, val_every=max(1, n // 2))
            m = score_fn(trainer)
            point = {"epoch": trainer.epoch, "step": trainer.epoch * spe,
                     "train_loss": trainer.history[-1]["train_loss"],
                     "wall_s": round(time.time() - t0, 1), "metrics": m}
            rec["curve"].append(point)
            rec["final"] = m
            rec["steps"] = point["step"]
            save()
            print(f"[itop] {name} epoch {trainer.epoch}: {m}", flush=True)
        rec["done"] = True
        save()

    def variables_of(trainer):
        v = {"params": trainer.state.params}
        if trainer.state.batch_stats is not None:
            v["batch_stats"] = trainer.state.batch_stats
        return v

    def _strip(m):
        return {"acc_10cm": round(m["acc_10cm"], 4),
                "per_joint": [round(x, 4) for x in m["per_joint"]]}

    val_ds_a2j = KDH3DDataset(
        os.path.join(val_root, "depth_maps"),
        os.path.join(val_root, "labels.json"),
        ecfg=EncoderConfig(max_people=2), dcfg=ITOP_DATASET,
        is_train=False, seed=1,
    )

    if "a2j" in methods:
        # ITOP labels are torso-RELATIVE z (~0): the zero-bias depth head
        # (the A2J default) already starts the vote at the label mean, and
        # the crops normalize with the MEASURED relative stats, the
        # reference's itop_side_mean/std.npy (itop_train_64.py:85-86, :260).
        model = A2J()
        anchors = jnp.asarray(
            shift_anchors((CROP // 16, CROP // 16), 16, generate_anchors()),
            jnp.float32,
        )
        step = make_a2j_train_step(anchors)

        def a2j_eval_loss(state, b):
            heads = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                b["crops"], train=False,
            )
            al, rl = a2j_loss(heads, b["labels"], anchors)
            return al + rl * 3.0

        inner = KDH3DDataset(
            os.path.join(train_root, "depth_maps"),
            os.path.join(train_root, "labels.json"),
            ecfg=EncoderConfig(max_people=2), dcfg=ITOP_DATASET, seed=0,
            cache_images=True,
        )
        from popnet_tpu.data.itop_a2j import itop_relative_stats

        rel_mean, rel_std = itop_relative_stats(inner)
        print(f"[itop] a2j relative stats: mean {rel_mean:.6f} "
              f"std {rel_std:.6f}", flush=True)
        rec = out["methods"].setdefault("a2j", {"curve": []})
        rec["rel_stats"] = [round(rel_mean, 6), round(rel_std, 6)]

        def a2j_score(trainer):
            v = variables_of(trainer)

            def infer(crops):
                return model.apply(v, crops, train=False)

            return _strip(run_itop_a2j_eval(infer, val_ds_a2j, 16,
                                            mean=rel_mean, std=rel_std))

        train_ds = ITOPA2JCropDataset(inner, seed=0,
                                      mean=rel_mean, std=rel_std)
        run_dir = os.path.join(work, "run_a2j")
        trainer = Trainer(
            model, step, a2j_eval_loss, sample_input_shape=(1, CROP, CROP, 1),
            learning_rate=3.5e-4, weight_decay=1e-4, optimizer="adam",
            scheduler=WarmupCosine(3.5e-4, total_epochs=a2j_epochs,
                                   warmup_epochs=warmup),
            out_dir=run_dir, seed=0,
        )
        if os.path.exists(os.path.join(run_dir, "ckpt")):
            trainer.resume()
        train_chunked("a2j", trainer, train_ds, None, a2j_epochs, a2j_score,
                      n_train // batch)

    if "openpose" in methods:
        model = RTPoseLight3D()
        step = make_rtpose_train_step()

        def op_eval_loss(state, b):
            (_, saved) = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                b["image"], train=False,
            )
            loss, _ = rtpose_light3d_loss_fgweight(
                saved, b["heatmaps"], b["pafs"], b["zmaps"], b["fg_masks_z"],
            )
            return loss

        val_mp = MPRealDataset(
            os.path.join(val_root, "depth_maps"),
            os.path.join(val_root, "labels.json"), ecfg=ecfg, dcfg=ITOP_DATASET,
        )

        def op_score(trainer):
            v = variables_of(trainer)

            def infer(images):
                (paf, heat, z), _ = model.apply(v, images, train=False)
                return paf, heat, z

            return _strip(run_itop_openpose_eval(infer, val_mp, 16, ecfg))

        train_ds = KDH3DDataset(
            os.path.join(train_root, "depth_maps"),
            os.path.join(train_root, "labels.json"),
            ecfg=ecfg, dcfg=ITOP_DATASET, seed=0, pose_align=False,
            with_prior=False, transfer="u16mm", cache_images=True,
        )
        run_dir = os.path.join(work, "run_openpose")
        trainer = Trainer(
            model, step, op_eval_loss,
            sample_input_shape=(1, ecfg.input_y, ecfg.input_x, 1),
            learning_rate=1e-3, optimizer="adam",
            scheduler=WarmupCosine(1e-3, total_epochs=epochs,
                                   warmup_epochs=warmup),
            out_dir=run_dir, seed=0,
        )
        if os.path.exists(os.path.join(run_dir, "ckpt")):
            trainer.resume()
        train_chunked("openpose", trainer, train_ds, None, epochs, op_score,
                      n_train // batch)

    print(f"[itop] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
