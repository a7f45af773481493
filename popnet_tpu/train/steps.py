"""Jitted data-parallel train steps for each model family.

Each factory returns `step(state, batch) -> (state, logs)` — a pure function
jitted over a device mesh: parameters/optimizer state replicated, the batch
sharded on its leading axis, gradients all-reduced by XLA over ICI
(replaces the reference's DataParallel scatter/gather,
reference: train_rtpose_light3d_kdh3d.py:153-213).
"""

from __future__ import annotations

import jax

from popnet_tpu.losses import (
    popnet_loss,
    rtpose_light3d_loss_fgweight,
    rtpose_light_loss,
    yolo_loss,
)
from popnet_tpu.parallel.mesh import batch_sharding, replicated_sharding


def _apply(state, params, image, train=True):
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
        out, mutated = state.apply_fn(
            variables, image, train=train, mutable=["batch_stats"]
        )
        return out, mutated["batch_stats"]
    return state.apply_fn(variables, image, train=train), None


def make_rtpose_train_step(num_stages: int = 2):
    """Open-Pose+ step with the fg-weighted loss
    (reference: losses.py:65-106, train loop :153-213)."""

    def step(state, batch):
        def loss_fn(params):
            (_, saved), new_stats = _apply(state, params, batch["image"])
            loss, logs = rtpose_light3d_loss_fgweight(
                saved, batch["heatmaps"], batch["pafs"], batch["zmaps"],
                batch["fg_masks_z"], num_stages,
            )
            return loss, (logs, new_stats)

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        logs["loss"] = loss
        return state, logs

    return step


def make_rtpose_vgg_train_step(num_stages: int = 6):
    """COCO RGB 6-stage CPM step: per-stage heat + PAF MSE. The reference
    ships CocoKeypoints + rtpose_vgg but no COCO train entry
    (only the test_dataloader.py smoke); this completes the recipe with the
    classic rtpose objective over data/coco_dataset.py batches."""

    def step(state, batch):
        def loss_fn(params):
            (_, saved), new_stats = _apply(state, params, batch["image"])
            loss, logs = rtpose_light_loss(
                saved, batch["heat"], batch["paf"], num_stages
            )
            return loss, (logs, new_stats)

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        logs["loss"] = loss
        return state, logs

    return step


def make_popnet_rgb_train_step(num_joints: int = 16, num_stages: int = 2):
    """RGB PoP-Net step over MPII batches (reference: losses.py:468-539
    pop_net_rgb_loss_fgweight; the reference ships MPII_Keypoints + the loss
    but no train entry — this completes the recipe)."""
    from popnet_tpu.losses import popnet_rgb_loss

    def step(state, batch):
        def loss_fn(params):
            (_, saved), new_stats = _apply(state, params, batch["image"])
            loss, logs = popnet_rgb_loss(
                saved, batch["heatmaps"], batch["align_maps"],
                batch["fg_masks_align"], batch["prior_map"],
                batch["prior_mask_conf"], batch["prior_mask_coord"],
                num_joints, num_stages=num_stages,
            )
            return loss, (logs, new_stats)

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        logs["loss"] = loss
        return state, logs

    return step


def make_yolo_train_step(num_joints: int = 15, use_pose_weight: bool = True):
    """Yolo-Pose+ step (reference: losses.py:397-465,
    train_yolo_posenet_kdh3d.py:284-342)."""

    def step(state, batch):
        def loss_fn(params):
            pred, new_stats = _apply(state, params, batch["image"])
            wm = batch["prior_weight_map"] if use_pose_weight else None
            loss, logs = yolo_loss(
                pred, batch["prior_map"], batch["prior_mask_conf"],
                batch["prior_mask_coord"], num_joints, weight_map=wm,
            )
            return loss, (logs, new_stats)

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        logs["loss"] = loss
        return state, logs

    return step


def make_popnet_train_step(num_joints: int = 15, num_stages: int = 2,
                           use_pose_weight: bool = True, pred_vis: bool = False,
                           prior_subnet_only: bool = False):
    """PoP-Net step with the composite loss (reference: losses.py:237-394)."""

    def step(state, batch):
        def loss_fn(params):
            (_, saved), new_stats = _apply(state, params, batch["image"])
            wm = batch["prior_weight_map"] if use_pose_weight else None
            loss, logs = popnet_loss(
                saved, batch["heatmaps"], batch["zmaps"], batch["fg_masks_z"],
                batch["align_maps"], batch["fg_masks_align"], batch["prior_map"],
                batch["prior_mask_conf"], batch["prior_mask_coord"], num_joints,
                prior_weight_map=wm, num_stages=num_stages,
                prior_subnet_only=prior_subnet_only, pred_vis=pred_vis,
            )
            return loss, (logs, new_stats)

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        logs["loss"] = loss
        return state, logs

    return step


def jit_step_over_mesh(step, mesh, axis_name: str = "data"):
    """Jit a step with replicated state and batch-sharded inputs."""
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh, axis_name)
    return jax.jit(
        step,
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_a2j_train_step(all_anchors, spatial_factor: float = 0.5,
                        reg_factor: float = 3.0, is_3d: bool = True):
    """A2J step: loss = cls_anchor_loss + reg_loss * RegLossFactor
    (reference: train_a2j_mpaug_new.py:439-500, anchor.py:84-154).

    batch: {"crops": (N, S, S, 1), "labels": (N, K, 3) crop-space (y, x, z)}.
    """
    from popnet_tpu.losses import a2j_loss

    def step(state, batch):
        def loss_fn(params):
            heads, new_stats = _apply(state, params, batch["crops"])
            anchor_l, reg_l = a2j_loss(
                heads, batch["labels"], all_anchors,
                spatial_factor=spatial_factor, is_3d=is_3d,
            )
            loss = anchor_l + reg_l * reg_factor
            return loss, ({"loss_cls": anchor_l, "loss_reg": reg_l}, new_stats)

        (loss, (logs, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        logs["loss"] = loss
        return state, logs

    return step
