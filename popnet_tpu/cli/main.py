"""popnet-tpu command line: train / evaluate / benchmark / visualize / augset.

Replaces the reference's per-script argparse CLIs (train_*.py,
evaluate/evaluation_*.py, main_evaluate_mp_human_3D.py,
main_visualize_{gt,pred}.py, generate_kdh3d_*_set.py) with one entry point:

    python -m popnet_tpu.cli.main train --model popnet --data-root ...
    python -m popnet_tpu.cli.main evaluate --model popnet --ckpt ...
    python -m popnet_tpu.cli.main benchmark --gt labels.json --pred pop_results.json
    python -m popnet_tpu.cli.main visualize-gt --data-root ... --out vis/
    python -m popnet_tpu.cli.main generate-augset --kind bgaug ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from popnet_tpu.core.config import DecodeConfig, EncoderConfig, ITOP_DATASET, KDH3D_DATASET


def _dataset_cfg(name):
    return ITOP_DATASET if name == "itop" else KDH3D_DATASET


def _build_model(name, dtype=None):
    import jax.numpy as jnp

    from popnet_tpu.models import A2J, PopNet, RTPoseLight3D, YoloPoseNet

    dtype = dtype or jnp.float32
    if name == "popnet":
        return PopNet(dtype=dtype)
    if name == "openpose":
        return RTPoseLight3D(dtype=dtype)
    if name == "yolo":
        return YoloPoseNet(dtype=dtype)
    if name == "a2j":
        # depth head starts at the dataset depth prior (3.0 m for both
        # KDH3D and ITOP) — see models/a2j.py A2J.depth_prior
        return A2J(dtype=dtype, depth_prior=3.0)
    if name == "rtpose_vgg":
        raise ValueError("rtpose_vgg trains with --dataset coco")
    if name == "popnet_rgb":
        raise ValueError("popnet_rgb trains with --dataset mpii")
    raise ValueError(name)


def _train_dataset(args, ecfg, dcfg):
    from popnet_tpu.data.datasets import KDH3DDataset, KDH3DMPAugDataset

    pose_align = args.model == "popnet"
    with_prior = args.model in ("popnet", "yolo")
    common = dict(
        ecfg=ecfg, dcfg=dcfg, pose_align=pose_align, with_prior=with_prior,
        pred_vis=args.pred_vis, seed=args.seed,
        transfer=getattr(args, "transfer", "f32"),
        cache_images=getattr(args, "cache_images", False),
    )
    if args.mp_aug:
        from popnet_tpu.data.datasets import DeviceMPAugDataset

        ann_files = sorted(
            os.path.join(args.data_root, f)
            for f in os.listdir(args.data_root)
            if f.startswith(args.mp_label_prefix) and f.endswith(".json")
        )
        if getattr(args, "stream_bank", 0):
            from popnet_tpu.data.streaming import StreamingDeviceMPAugDataset

            cls = StreamingDeviceMPAugDataset
            common.update(
                shard_indices=args.stream_bank,
                shard_repeats=getattr(args, "stream_repeats", 1),
            )
        else:
            cls = DeviceMPAugDataset if getattr(args, "device_bank", False) \
                else KDH3DMPAugDataset
        return cls(
            os.path.join(args.data_root, "depth_maps"), ann_files,
            bg_file=os.path.join(args.data_root, "labels_bg.json"),
            bg_dir=os.path.join(args.data_root, "bg_maps"),
            seg_dir=os.path.join(args.data_root, "seg_maps"), **common,
        )
    return KDH3DDataset(
        os.path.join(args.data_root, "depth_maps"),
        os.path.join(args.data_root, args.labels),
        bg_aug=args.bg_aug,
        bg_file=os.path.join(args.data_root, "labels_bg.json") if args.bg_aug else None,
        bg_dir=os.path.join(args.data_root, "bg_maps") if args.bg_aug else None,
        seg_dir=os.path.join(args.data_root, "seg_maps") if args.bg_aug else None,
        **common,
    )


def _parse_mesh(spec: str):
    """--mesh "data=4,model=2" -> (layout, Mesh). Axes: data (optional,
    defaults to the remaining devices) plus at most one of model (tensor
    parallel, parallel/tensor.py), spatial (parallel/spatial.py), or pipe
    (GPipe, parallel/pipeline.py)."""
    import jax

    try:
        sizes = {k: int(v) for k, v in (p.split("=") for p in spec.split(","))}
    except ValueError:
        raise SystemExit(f"bad --mesh spec {spec!r} (want e.g. data=4,model=2)")
    n_data = sizes.pop("data", None)
    if not sizes:
        from popnet_tpu.parallel.mesh import make_mesh

        return "dp", make_mesh(jax.devices()[:n_data] if n_data else None)
    if len(sizes) > 1:
        raise SystemExit("--mesh supports data plus ONE of model|spatial|pipe")
    (axis, n), = sizes.items()
    n_total = (n_data or max(1, len(jax.devices()) // n)) * n
    devices = jax.devices()[:n_total]
    if axis == "model":
        from popnet_tpu.parallel.tensor import make_mesh_2d

        return "tp", make_mesh_2d(n, devices)
    if axis == "spatial":
        from popnet_tpu.parallel.spatial import make_spatial_mesh

        return "sp", make_spatial_mesh(n, devices)
    if axis == "pipe":
        from popnet_tpu.parallel.pipeline import make_pipe_mesh

        return "pp", make_pipe_mesh(n, devices)
    raise SystemExit(f"unknown mesh axis {axis!r} (model | spatial | pipe)")


def cmd_train(args):
    import jax.numpy as jnp

    from popnet_tpu.losses import popnet_loss, rtpose_light3d_loss_fgweight, yolo_loss
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.steps import (
        make_popnet_train_step, make_rtpose_train_step, make_yolo_train_step,
    )

    layout, mesh = ("dp", None)
    if getattr(args, "mesh", None):
        layout, mesh = _parse_mesh(args.mesh)
    if layout == "pp":
        if args.model != "openpose":
            raise SystemExit("--mesh ...,pipe=N pipelines the CPM stage "
                             "family; use --model openpose")
        return _train_openpose_pipelined(args, mesh)

    if args.dataset == "coco":
        return _train_coco(args)
    if args.dataset == "mpii":
        return _train_mpii(args)
    dcfg = _dataset_cfg(args.dataset)
    ecfg = EncoderConfig(input_x=args.input_size, input_y=args.input_size)
    model = _build_model(args.model)

    if args.model == "popnet":
        step = make_popnet_train_step(pred_vis=args.pred_vis)

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
                pred_vis=args.pred_vis,
            )
            return loss

    elif args.model == "openpose":
        step = make_rtpose_train_step()

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

    elif args.model == "a2j":
        return _train_a2j(args, ecfg, dcfg)
    else:
        step = make_yolo_train_step()

        def eval_loss(state, batch):
            pred = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["image"], train=False,
            )
            loss, _ = yolo_loss(
                pred, batch["prior_map"], batch["prior_mask_conf"],
                batch["prior_mask_coord"], ecfg.num_joints,
                weight_map=batch["prior_weight_map"],
            )
            return loss

    train_ds = _train_dataset(args, ecfg, dcfg)
    val_args = argparse.Namespace(**vars(args))
    val_args.labels = args.val_labels
    val_args.mp_aug = False
    val_ds = _train_dataset(val_args, ecfg, dcfg) if args.val_labels else None
    if val_ds is not None:
        val_ds.augment = False

    scheduler = None
    if args.schedule == "cosine":
        from popnet_tpu.train.schedule import WarmupCosine

        scheduler = WarmupCosine(
            args.lr, total_epochs=args.total_epochs or args.epochs,
            warmup_epochs=args.warmup_epochs,
        )
    trainer = Trainer(
        model, step, eval_loss,
        sample_input_shape=(1, args.input_size, args.input_size, 1),
        learning_rate=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay,
        out_dir=args.out_dir, seed=args.seed,
        optimizer=args.optimizer, scheduler=scheduler,
        mesh=mesh, layout=layout,
    )
    if args.lr_patience is not None and args.schedule == "plateau":
        # patience beyond the epoch budget == constant lr (the plateau
        # controller starves short/bounded runs; the reference default of 5
        # is tuned for its 200-epoch, 176k-image training)
        trainer.scheduler.patience = args.lr_patience
    if args.resume:
        trainer.resume()
    trainer.fit(train_ds, val_ds, epochs=args.epochs, batch_size=args.batch_size,
                checkpoint_every=args.ckpt_every, val_every=args.val_every)


def _train_openpose_pipelined(args, mesh):
    """GPipe-pipelined Open-Pose+ training from the CLI: stem data-parallel,
    one CPM stage per "pipe" device (parallel/pipeline.py). The final
    checkpoint is saved in the SEQUENTIAL RTPoseLight3D layout
    (unstack_pipelined_variables), so `evaluate --ckpt <out>/ckpt` scores a
    pipeline-trained model through the standard path."""
    import jax
    import jax.numpy as jnp

    from popnet_tpu.models import RTPoseLight3D
    from popnet_tpu.models.layers import ResPreprocessStem
    from popnet_tpu.parallel import pipeline as pp
    from popnet_tpu.train import checkpoint as ckpt
    from popnet_tpu.train.state import create_train_state

    dcfg = _dataset_cfg(args.dataset)
    ecfg = EncoderConfig(input_x=args.input_size, input_y=args.input_size)
    n_micro = getattr(args, "n_micro", None) or 2
    n_data = mesh.shape["data"]
    if args.batch_size % (n_data * n_micro):
        raise SystemExit(
            f"batch {args.batch_size} must divide data axis ({n_data}) x "
            f"n_micro ({n_micro})"
        )

    model = RTPoseLight3D()
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.input_size, args.input_size, 1)), train=False,
    )
    state = pp.create_pipeline_train_state(
        variables, learning_rate=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay,
    )
    state = pp.shard_pipeline_state(state, mesh)
    step = pp.jit_pipeline_step(
        pp.make_pipeline_train_step(
            ResPreprocessStem(), pp.CPMStageUniform(), mesh, n_micro
        ),
        mesh, state,
    )

    train_ds = _train_dataset(args, ecfg, dcfg)
    os.makedirs(args.out_dir, exist_ok=True)
    for epoch in range(args.epochs):
        losses = []
        for batch in train_ds.iter_batches(args.batch_size):
            state, logs = step(state, batch)
            losses.append(logs["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        print(f"epoch {epoch} [pipelined x{mesh.shape['pipe']}] "
              f"loss {train_loss:.4f}")
        with open(os.path.join(args.out_dir, "history.jsonl"), "a") as f:
            f.write(json.dumps({"epoch": epoch, "train_loss": train_loss}) + "\n")

    # save in the sequential layout for the standard evaluate path
    stem_np = jax.tree.map(lambda a: jax.device_get(a), state.params["stem"])
    stages_np = jax.tree.map(lambda a: jax.device_get(a), state.params["stages"])
    stem_bs = stages_bs = None
    if state.batch_stats is not None:
        stem_bs = jax.tree.map(jax.device_get, state.batch_stats["stem"])
        stages_bs = jax.tree.map(jax.device_get, state.batch_stats["stages"])
    seq_vars = pp.unstack_pipelined_variables(
        {"params": {"stem": stem_np},
         **({"batch_stats": {"stem": stem_bs}} if stem_bs is not None else {})},
        {"params": stages_np,
         **({"batch_stats": stages_bs} if stages_bs is not None else {})},
    )
    seq_state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, args.input_size, args.input_size, 1)),
        learning_rate=args.lr,
    )
    seq_state = seq_state.replace(
        params=seq_vars["params"],
        batch_stats=seq_vars.get("batch_stats"),
    )
    ckpt.save_checkpoint(
        os.path.join(args.out_dir, "ckpt"), seq_state, step=args.epochs - 1,
        metadata={"pipelined": True, "n_pipe": int(mesh.shape["pipe"])},
    )


def _train_coco(args):
    """COCO RGB recipe: CocoKeypointsDataset -> rtpose_vgg -> 6-stage MSE.

    Data layout: <data-root>/images/*.jpg + --labels pointing at a
    person_keypoints_*.json (and optionally --val-labels). The reference has
    no COCO train entry script; this CLI completes that path."""
    from popnet_tpu.data.coco_dataset import CocoKeypointsDataset
    from popnet_tpu.losses import rtpose_light_loss
    from popnet_tpu.models.rtpose_vgg import RTPoseVGG
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.steps import make_rtpose_vgg_train_step

    if args.model != "rtpose_vgg":
        raise SystemExit("--dataset coco trains --model rtpose_vgg")
    model = RTPoseVGG(trunk=args.trunk)
    step = make_rtpose_vgg_train_step()

    def eval_loss(state, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        _, saved = state.apply_fn(variables, batch["image"], train=False)
        loss, _ = rtpose_light_loss(saved, batch["heat"], batch["paf"], 6)
        return loss

    jitter = None
    if args.scale_jitter:
        lo, hi = (float(v) for v in args.scale_jitter.split(","))
        jitter = (lo, hi)

    def make_ds(ann, is_train):
        return CocoKeypointsDataset(
            os.path.join(args.data_root, "images"),
            os.path.join(args.data_root, ann),
            input_y=args.input_size, input_x=args.input_size,
            is_train=is_train, seed=args.seed,
            rotate_max_deg=args.rotate_aug, scale_jitter=jitter,
            blur_max_sigma=args.blur_aug,
        )

    train_ds = make_ds(args.labels, True)
    val_ds = make_ds(args.val_labels, False) if args.val_labels else None
    trainer = Trainer(
        model, step, eval_loss,
        sample_input_shape=(1, args.input_size, args.input_size, 3),
        learning_rate=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, out_dir=args.out_dir, seed=args.seed,
    )
    if args.resume:
        trainer.resume()
    trainer.fit(train_ds, val_ds, epochs=args.epochs, batch_size=args.batch_size)


def _train_mpii(args):
    """MPII RGB PoP-Net recipe: MPIIKeypointsDataset -> PopNetRGB ->
    pop_net_rgb loss. Data layout: <data-root>/images/*.jpg + --labels
    pointing at an MPII annotation JSON (standard release list format)."""
    from popnet_tpu.data.mpii import MPII_NUM_JOINTS, MPIIKeypointsDataset
    from popnet_tpu.losses import popnet_rgb_loss
    from popnet_tpu.models.popnet import PopNetRGB
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.steps import make_popnet_rgb_train_step

    if args.model != "popnet_rgb":
        raise SystemExit("--dataset mpii trains --model popnet_rgb")
    model = PopNetRGB(num_parts=MPII_NUM_JOINTS)
    step = make_popnet_rgb_train_step(num_joints=MPII_NUM_JOINTS)

    def eval_loss(state, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        _, saved = state.apply_fn(variables, batch["image"], train=False)
        loss, _ = popnet_rgb_loss(
            saved, batch["heatmaps"], batch["align_maps"],
            batch["fg_masks_align"], batch["prior_map"],
            batch["prior_mask_conf"], batch["prior_mask_coord"],
            MPII_NUM_JOINTS,
        )
        return loss

    def make_ds(ann, is_train):
        return MPIIKeypointsDataset(
            os.path.join(args.data_root, "images"),
            os.path.join(args.data_root, ann),
            input_y=args.input_size, input_x=args.input_size,
            is_train=is_train, seed=args.seed,
        )

    train_ds = make_ds(args.labels, True)
    val_ds = make_ds(args.val_labels, False) if args.val_labels else None
    trainer = Trainer(
        model, step, eval_loss,
        sample_input_shape=(1, args.input_size, args.input_size, 3),
        learning_rate=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, out_dir=args.out_dir, seed=args.seed,
    )
    if args.resume:
        trainer.resume()
    trainer.fit(train_ds, val_ds, epochs=args.epochs, batch_size=args.batch_size)


def _train_a2j(args, ecfg, dcfg):
    """A2J training recipe: Adam 3.5e-4 + L2 1e-4, StepLR(10, 0.2),
    RegLossFactor 3, spatialFactor 0.5, random erasing, per-epoch
    checkpoints (reference: train_a2j_mpaug_new.py:427-567; ITOP variant
    itop_train_64.py:40-52 — xy_thres=120, depth_thres=0.4)."""
    import argparse as _ap

    import jax.numpy as jnp

    from popnet_tpu.data.a2j_crops import A2JCropDataset, CROP, ITOPA2JCropDataset
    from popnet_tpu.losses import a2j_loss
    from popnet_tpu.models.a2j import generate_anchors, shift_anchors
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.schedule import StepLR
    from popnet_tpu.train.steps import make_a2j_train_step

    model = _build_model("a2j")
    all_anchors = jnp.asarray(
        shift_anchors((CROP // 16, CROP // 16), 16, generate_anchors()),
        jnp.float32,
    )
    # ITOP regresses torso-RELATIVE z; the offset head stays in the same
    # units either way (is_3d toggles nothing here — loss is identical)
    step = make_a2j_train_step(all_anchors)

    def eval_loss(state, batch):
        heads = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["crops"], train=False,
        )
        anchor_l, reg_l = a2j_loss(heads, batch["labels"], all_anchors)
        return anchor_l + reg_l * 3.0

    def wrap(inner, seed):
        if args.dataset == "itop":
            return ITOPA2JCropDataset(inner, seed=seed)
        return A2JCropDataset(inner, seed=seed)

    train_ds = wrap(_train_dataset(args, ecfg, dcfg), args.seed)
    val_ds = None
    if args.val_labels:
        val_args = _ap.Namespace(**vars(args))
        val_args.labels = args.val_labels
        val_args.mp_aug = False
        inner = _train_dataset(val_args, ecfg, dcfg)
        inner.augment = False
        val_ds = wrap(inner, args.seed + 1)
        val_ds.augment = False

    lr = args.lr if args.lr != 1.0 else 3.5e-4  # recipe default when unset
    wd = args.weight_decay if args.weight_decay else 1e-4
    trainer = Trainer(
        model, step, eval_loss,
        sample_input_shape=(1, CROP, CROP, 1),
        learning_rate=lr, weight_decay=wd,
        optimizer="adam", scheduler=StepLR(lr, step_size=10, gamma=0.2),
        out_dir=args.out_dir, seed=args.seed,
    )
    if args.resume:
        trainer.resume()
    trainer.fit(train_ds, val_ds, epochs=args.epochs, batch_size=args.batch_size)


def cmd_evaluate(args):
    import jax

    from popnet_tpu.cli import evaluate as ev
    from popnet_tpu.data.datasets import MPRealDataset
    from popnet_tpu.train.checkpoint import restore_params
    from popnet_tpu.train.state import create_train_state

    import jax.numpy as jnp

    dcfg = _dataset_cfg(args.dataset)
    ecfg = EncoderConfig(input_x=args.input_size, input_y=args.input_size)
    decfg = DecodeConfig()
    if args.model == "a2j":
        return _evaluate_yolo_a2j(args, ecfg, dcfg, decfg)
    model = _build_model(args.model)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, args.input_size, args.input_size, 1))
    )
    if args.ckpt:
        # template-free: works whatever optimizer wrote the checkpoint
        params, batch_stats, _, _ = restore_params(args.ckpt)
        state = state.replace(params=params, batch_stats=batch_stats)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    if getattr(args, "fold_bn", False):
        # exact Conv->BN fold (ops/fold_bn.py; parity in tests/test_fold_bn.py)
        from popnet_tpu.ops.fold_bn import fold_batchnorm

        variables = fold_batchnorm(variables)[0]

    dataset = MPRealDataset(
        os.path.join(args.data_root, "depth_maps"),
        os.path.join(args.data_root, args.labels), ecfg=ecfg, dcfg=dcfg,
    )

    if getattr(args, "quant", None) == "int8":
        # dynamic-int8 MXU convs (ops/quant.py; metric-parity proven in
        # tests/test_quant_int8.py)
        from popnet_tpu.ops.quant import quantized_apply

        def apply_fn(images):
            return quantized_apply(model, variables, images, train=False)
    else:
        def apply_fn(images):
            return model.apply(variables, images, train=False)

    def _maybe_spatial(infer):
        """--spatial N: height-shard the CNN forward over a (data, spatial)
        mesh; GSPMD inserts the conv halo exchanges (parallel/spatial.py)."""
        n_sp = getattr(args, "spatial", 0)
        if not n_sp:
            return infer
        from popnet_tpu.parallel.spatial import (
            jit_forward_spatial, make_spatial_mesh,
        )

        if args.input_size % n_sp:
            raise SystemExit(
                f"--spatial {n_sp} must divide --input-size {args.input_size}"
            )
        mesh = make_spatial_mesh(n_sp)
        sp_fn = jit_forward_spatial(infer, mesh)
        n_data = mesh.shape["data"]

        def wrapped(images):
            # a ragged tail batch can't shard over the data axis; score it
            # on the plain path (same values — sharding is layout only)
            if images.shape[0] % n_data:
                return infer(images)
            return sp_fn(images)

        return wrapped

    if args.model == "popnet":
        def infer(images):
            (heat, z, align, prior), _ = apply_fn(images)
            return heat, z, align, prior

        data = ev.run_popnet_eval(
            _maybe_spatial(infer), dataset, args.batch_size, ecfg, decfg,
            readout=getattr(args, "readout", "universe"),
        )
    elif args.model == "openpose":
        def infer(images):
            (paf, heat, z), _ = apply_fn(images)
            return paf, heat, z

        data = ev.run_openpose_eval(
            _maybe_spatial(infer), dataset, args.batch_size, ecfg, decfg,
            device_decode=getattr(args, "device_decode", False),
        )
    else:
        def infer(images):
            return apply_fn(images)

        data = ev.run_yolo_eval(
            _maybe_spatial(infer), dataset, args.batch_size, ecfg, decfg
        )

    os.makedirs(args.out_dir, exist_ok=True)
    out_json = os.path.join(args.out_dir, f"{args.model}_results.json")
    with open(out_json, "w") as f:
        json.dump(data, f)
    print(f"wrote {out_json}")
    ev.evaluate_eval_data(data)
    if "human_pred_set_3d_perfect_2d" in data:
        print("ablation 3D-PCK channels:",
              json.dumps(ev.evaluate_ablation_channels(data, ecfg.num_joints)))


def _evaluate_yolo_a2j(args, ecfg, dcfg, decfg):
    """Two-stage Yolo-A2J benchmark row from the CLI: stage-1 detector boxes
    + stage-2 A2J crops (reference: evaluation_yolo_posenet_kdh3d_mpreal_
    a2j_preprocess.py + a2j_test_pred_box.py)."""
    import jax
    import jax.numpy as jnp

    from popnet_tpu.cli import evaluate as ev
    from popnet_tpu.cli.yolo_a2j import run_yolo_a2j_eval
    from popnet_tpu.data.a2j_crops import CROP
    from popnet_tpu.data.datasets import MPRealDataset
    from popnet_tpu.train.checkpoint import restore_params
    from popnet_tpu.train.state import create_train_state

    if not args.yolo_ckpt and not args.gt_boxes:
        raise SystemExit(
            "evaluate --model a2j requires --yolo-ckpt (stage-1 detector) "
            "or --gt-boxes (label-box ablation)"
        )

    a2j = _build_model("a2j")
    a2j_state = create_train_state(
        a2j, jax.random.PRNGKey(0), jnp.zeros((1, CROP, CROP, 1))
    )
    if args.ckpt:
        params, batch_stats, _, _ = restore_params(args.ckpt)
        a2j_state = a2j_state.replace(params=params, batch_stats=batch_stats)
    yolo = yolo_state = None
    if args.yolo_ckpt:
        yolo = _build_model("yolo")
        yolo_state = create_train_state(
            yolo, jax.random.PRNGKey(0),
            jnp.zeros((1, args.input_size, args.input_size, 1)),
        )
        yparams, ybs, _, _ = restore_params(args.yolo_ckpt)
        yolo_state = yolo_state.replace(params=yparams, batch_stats=ybs)

    dataset = MPRealDataset(
        os.path.join(args.data_root, "depth_maps"),
        os.path.join(args.data_root, args.labels), ecfg=ecfg, dcfg=dcfg,
    )

    def _variables(state):
        v = {"params": state.params}
        if state.batch_stats is not None:
            v["batch_stats"] = state.batch_stats
        if getattr(args, "fold_bn", False):
            # exact Conv->BN fold for BOTH stages (ADVICE r3: the flag used
            # to be silently ignored on the a2j path)
            from popnet_tpu.ops.fold_bn import fold_batchnorm

            v = fold_batchnorm(v)[0]
        return v

    a2j_v = _variables(a2j_state)
    yolo_v = _variables(yolo_state) if yolo_state is not None else None

    def infer_yolo(images):
        return yolo.apply(yolo_v, images, train=False)

    def infer_a2j(crops):
        return a2j.apply(a2j_v, crops, train=False)

    data = run_yolo_a2j_eval(
        infer_yolo if yolo_state is not None else None, infer_a2j, dataset,
        args.batch_size, ecfg, decfg, gt_boxes=args.gt_boxes,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    out_json = os.path.join(args.out_dir, "a2j_results.json")
    with open(out_json, "w") as f:
        json.dump(data, f)
    print(f"wrote {out_json}")
    ev.evaluate_eval_data(data)


def cmd_benchmark(args):
    """Score a prediction JSON against a labels JSON
    (reference: main_evaluate_mp_human_3D.py:40-99)."""
    from popnet_tpu.cli.evaluate import evaluate_predictions
    from popnet_tpu.data.labels import load_label_file

    res = json.load(open(args.pred))
    if args.aligned or ("pop" in os.path.basename(args.pred) and "human_pred_set_2d_aligned" in res):
        p2, p3 = res["human_pred_set_2d_aligned"], res["human_pred_set_3d_aligned"]
    else:
        p2, p3 = res["human_pred_set_2d"], res["human_pred_set_3d"]

    anno_dic, _ = load_label_file(args.gt)
    gt2d = [[a["2d_joints"] for a in anns] for anns in anno_dic.values()]
    gt3d = [[a["3d_joints"] for a in anns] for anns in anno_dic.values()]
    evaluate_predictions(p2, p3, res.get("human_pred_set_part_conf", []), gt2d, gt3d)


def cmd_visualize(args, gt: bool):
    import cv2

    from popnet_tpu.data.labels import load_label_file
    from popnet_tpu.viz import visualize_gt, visualize_pred

    anno_dic, _ = load_label_file(os.path.join(args.data_root, args.labels))
    os.makedirs(args.out_dir, exist_ok=True)
    preds = json.load(open(args.pred)) if not gt else None
    for i, (image_id, anns) in enumerate(anno_dic.items()):
        if args.limit and i >= args.limit:
            break
        depth = np.load(os.path.join(args.data_root, "depth_maps", image_id))
        if gt:
            seg_path = os.path.join(args.data_root, "seg_maps", image_id)
            seg = np.load(seg_path) if os.path.exists(seg_path) else None
            img = visualize_gt(depth, anns, seg=seg)
        else:
            key = "human_pred_set_2d_aligned" if "human_pred_set_2d_aligned" in preds else "human_pred_set_2d"
            img = visualize_pred(depth, [np.asarray(h) for h in preds[key][i]])
        cv2.imwrite(os.path.join(args.out_dir, f"{i:06d}.jpg"), img)
    print(f"wrote images to {args.out_dir}")


def cmd_generate_augset(args):
    from popnet_tpu.data import construction
    from popnet_tpu.data.datasets import KDH3DDataset, KDH3DMPAugDataset

    ecfg = EncoderConfig()
    if args.kind == "bgaug":
        ds = KDH3DDataset(
            os.path.join(args.data_root, "depth_maps"),
            os.path.join(args.data_root, args.labels),
            bg_aug=True,
            bg_file=os.path.join(args.data_root, "labels_bg.json"),
            bg_dir=os.path.join(args.data_root, "bg_maps"),
            seg_dir=os.path.join(args.data_root, "seg_maps"),
            ecfg=ecfg, is_train=False, augment=False, seed=args.seed,
        )
        construction.generate_bgaug_set(ds, args.out_dir, args.n_images,
                                        device=args.device,
                                        augment=args.augment)
    else:
        ann_files = sorted(
            os.path.join(args.data_root, f)
            for f in os.listdir(args.data_root)
            if f.startswith(args.mp_label_prefix) and f.endswith(".json")
        )
        ds = KDH3DMPAugDataset(
            os.path.join(args.data_root, "depth_maps"), ann_files,
            bg_file=os.path.join(args.data_root, "labels_bg.json"),
            bg_dir=os.path.join(args.data_root, "bg_maps"),
            seg_dir=os.path.join(args.data_root, "seg_maps"),
            ecfg=ecfg, is_train=False, augment=False, seed=args.seed,
        )
        construction.generate_mpaug_set(ds, args.out_dir, args.n_images,
                                        device=args.device,
                                        augment=args.augment)
    print(f"frozen {args.kind} set written to {args.out_dir}")


def build_parser():
    p = argparse.ArgumentParser(prog="popnet-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--data-root", required=True)
        sp.add_argument("--labels", default="labels.json")
        sp.add_argument("--dataset", choices=["kdh3d", "itop", "coco", "mpii"],
                        default="kdh3d")
        sp.add_argument(
            "--model",
            choices=["popnet", "openpose", "yolo", "a2j", "rtpose_vgg",
                     "popnet_rgb"],
            default="popnet",
        )
        sp.add_argument("--input-size", type=int, default=224)
        sp.add_argument("--batch-size", type=int, default=32)
        sp.add_argument("--out-dir", default="runs/out")
        sp.add_argument("--seed", type=int, default=0)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--lr", type=float, default=1.0)
    t.add_argument("--momentum", type=float, default=0.9)
    t.add_argument("--transfer", choices=["f32", "u16mm"], default="f32",
                   help="host->device image transfer: f32 meters (exact) or "
                        "uint16 millimeters (half the bytes; lossless for "
                        "mm-native recordings)")
    t.add_argument("--weight-decay", type=float, default=0.0)
    t.add_argument("--trunk", choices=["vgg19", "mobilenet"], default="vgg19",
                   help="rtpose_vgg trunk (COCO RGB recipe)")
    t.add_argument("--optimizer", choices=["sgd", "adam"], default="sgd",
                   help="sgd = the reference CPM recipe (nesterov 0.9); adam "
                        "converges far faster on bounded budgets")
    t.add_argument("--schedule", choices=["plateau", "cosine"], default="plateau",
                   help="plateau = reference ReduceLROnPlateau; cosine = "
                        "warmup+cosine over --total-epochs")
    t.add_argument("--warmup-epochs", type=int, default=0)
    t.add_argument("--total-epochs", type=int, default=None,
                   help="cosine horizon (defaults to --epochs; set it when "
                        "training in resumed chunks)")
    t.add_argument("--val-every", type=int, default=1,
                   help="validate/update-best every N epochs (final epoch always)")
    t.add_argument("--ckpt-every", type=int, default=None,
                   help="save the periodic checkpoint every N epochs")
    t.add_argument("--device-bank", action="store_true",
                   help="mp-aug only: keep the whole scene bank resident in "
                        "device HBM (uint16 mm, ~0.5 MB/frame) and composite "
                        "on device — per step only indices+labels cross the "
                        "host->device link")
    t.add_argument("--cache-images", action="store_true",
                   help="keep decoded .npy frames in host RAM across epochs "
                        "(~1 MB/frame; for datasets that fit in memory)")
    t.add_argument("--lr-patience", type=int, default=None,
                   help="ReduceLROnPlateau patience override (reference "
                        "default 5; set >= epochs for a constant lr)")
    t.add_argument("--stream-bank", type=int, default=0, metavar="N",
                   help="mp-aug only: chunk-streaming scene bank with N "
                        "sample indices per HBM shard (data/streaming.py; "
                        "double-buffered staging for banks past HBM)")
    t.add_argument("--stream-repeats", type=int, default=1,
                   help="--stream-bank: passes over each resident shard per "
                        "epoch (windowed-shuffle repetition)")
    t.add_argument("--mesh", default=None,
                   help="device mesh layout, e.g. data=4 | data=4,model=2 "
                        "(tensor parallel) | data=2,spatial=4 (height-"
                        "sharded) | data=1,pipe=2 (GPipe CPM stages; "
                        "--model openpose)")
    t.add_argument("--n-micro", type=int, default=2,
                   help="GPipe microbatches per device batch (--mesh pipe=N)")
    t.add_argument("--rotate-aug", type=float, default=0.0, metavar="DEG",
                   help="COCO RGB train-time random rotation, uniform in "
                        "+-DEG with canvas expansion (reference "
                        "transforms.py RandomRotate)")
    t.add_argument("--scale-jitter", default=None, metavar="LO,HI",
                   help="COCO RGB train-time uniform scale jitter folded "
                        "into the letterbox (reference transforms.py "
                        "RescaleRelative), e.g. 0.5,1.0")
    t.add_argument("--blur-aug", type=float, default=0.0, metavar="SIGMA",
                   help="COCO RGB train-time Gaussian blur, sigma ~ "
                        "U[0, SIGMA] (reference transforms.py "
                        "blur_augmentation)")
    t.add_argument("--bg-aug", action="store_true")
    t.add_argument("--mp-aug", action="store_true")
    t.add_argument("--mp-label-prefix", default="labels_loc")
    t.add_argument("--pred-vis", action="store_true")
    t.add_argument("--val-labels", default=None)
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate")
    common(e)
    e.add_argument("--ckpt", default=None)
    e.add_argument(
        "--yolo-ckpt", default=None,
        help="stage-1 detector checkpoint for --model a2j (two-stage Yolo-A2J)",
    )
    e.add_argument(
        "--gt-boxes", action="store_true",
        help="--model a2j: crop from the labels' person bboxes instead of "
             "detector boxes (a2j_test_gt_box ablation)",
    )
    e.add_argument(
        "--readout", choices=["gated", "universe"], default="universe",
        help="PoP-Net alignment readout: heat-gated window refinement "
             "(default) or the reference's universe_align_map fusion",
    )
    e.add_argument(
        "--spatial", type=int, default=0, metavar="N",
        help="height-shard the CNN forward over a (data, spatial=N) mesh "
             "(parallel/spatial.py GSPMD halo exchanges) — for Kinect-native "
             "512x480 or larger inference past one chip's activation memory",
    )
    e.add_argument(
        "--device-decode", action="store_true",
        help="run the full Open-Pose+ decode (assembly + z readout + "
             "back-projection) on device as one jitted program",
    )
    e.add_argument(
        "--quant", choices=["int8"], default=None,
        help="serve the CNN through dynamic-int8 MXU convolutions "
             "(ops/quant.py; ~1.2-1.35x on TPU, metric-parity proven in "
             "tests/test_quant_int8.py)",
    )
    e.add_argument(
        "--fold-bn", action="store_true", dest="fold_bn",
        help="fold Conv->BatchNorm pairs into the conv weights before "
             "compiling (exact; ops/fold_bn.py)",
    )
    e.set_defaults(fn=cmd_evaluate)

    b = sub.add_parser("benchmark")
    b.add_argument("--gt", required=True)
    b.add_argument("--pred", required=True)
    b.add_argument("--aligned", action="store_true")
    b.set_defaults(fn=cmd_benchmark)

    vg = sub.add_parser("visualize-gt")
    common(vg)
    vg.add_argument("--limit", type=int, default=0)
    vg.set_defaults(fn=lambda a: cmd_visualize(a, gt=True))

    vp = sub.add_parser("visualize-pred")
    common(vp)
    vp.add_argument("--pred", required=True)
    vp.add_argument("--limit", type=int, default=0)
    vp.set_defaults(fn=lambda a: cmd_visualize(a, gt=False))

    g = sub.add_parser("generate-augset")
    common(g)
    g.add_argument("--kind", choices=["bgaug", "mpaug"], required=True)
    g.add_argument("--n-images", type=int, default=None)
    g.add_argument("--mp-label-prefix", default="labels_loc")
    g.add_argument("--device", action="store_true",
                   help="composite on the accelerator (byte-identical sets)")
    g.add_argument("--augment", action="store_true",
                   help="freeze-time Rotate/RenderDepth/Resize like the "
                        "reference generator (exact host path)")
    g.set_defaults(fn=cmd_generate_augset)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
