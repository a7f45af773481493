"""Epoch-driven trainer: the reference's train loop, framework-ized.

Reference recipe (train_rtpose_light3d_kdh3d.py:153-342): per-epoch train +
validate, ReduceLROnPlateau on val loss, best-val checkpoint, throughput
meters, scalar logging. Upgrades: full-state orbax checkpoints with resume,
optional jax.profiler traces, one jitted step over the device mesh.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

from popnet_tpu.parallel.mesh import make_mesh, shard_batch
from popnet_tpu.train import checkpoint as ckpt
from popnet_tpu.train.schedule import ReduceLROnPlateau
from popnet_tpu.train.state import create_train_state, get_learning_rate, set_learning_rate
from popnet_tpu.train.steps import jit_step_over_mesh


class AverageMeter:
    """Running average (reference: train_rtpose_light3d_kdh3d.py:272-287)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Trainer:
    def __init__(
        self,
        model,
        make_step,
        make_eval_loss,
        sample_input_shape=(1, 224, 224, 1),
        learning_rate: float = 1.0,
        momentum: float = 0.9,
        weight_decay: float = 0.0,
        mesh=None,
        out_dir: str = "runs/default",
        print_freq: int = 20,
        profile_epoch: int | None = None,
        seed: int = 0,
        optimizer: str = "sgd",
        scheduler=None,
        layout: str = "dp",
    ):
        import jax.numpy as jnp

        self.model = model
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.print_freq = print_freq
        self.profile_epoch = profile_epoch

        self.state = create_train_state(
            model, jax.random.PRNGKey(seed), jnp.zeros(sample_input_shape),
            learning_rate=learning_rate, momentum=momentum, weight_decay=weight_decay,
            optimizer=optimizer,
        )
        self._make_step = make_step
        # parallel layout: "dp" replicates params and shards the batch
        # (reference DataParallel's mesh-native twin); "tp" channel-shards
        # params + optimizer moments over a ("data", "model") mesh
        # (parallel/tensor.py); "sp" height-shards the NHWC batch over a
        # ("data", "spatial") mesh (parallel/spatial.py). All three run the
        # SAME step function — the layout is pure sharding.
        self.layout = layout
        if layout == "dp":
            self.mesh = mesh or make_mesh()
            self.step_fn = jit_step_over_mesh(make_step, self.mesh)
            self._shard = lambda b: shard_batch(b, self.mesh)
        elif layout == "tp":
            from popnet_tpu.parallel import tensor

            self.mesh = mesh or tensor.make_mesh_2d()
            self.state = tensor.shard_state(self.state, self.mesh)
            self.step_fn = tensor.jit_step_tensor_parallel(
                make_step, self.mesh, self.state
            )
            self._shard = lambda b: shard_batch(b, self.mesh)
        elif layout == "sp":
            from popnet_tpu.parallel import spatial

            self.mesh = mesh or spatial.make_spatial_mesh()
            self.state = spatial.replicate_state(self.state, self.mesh)
            self.step_fn = spatial.jit_step_spatial(make_step, self.mesh)
            self._shard = lambda b: spatial.shard_batch_spatial(b, self.mesh)
        else:
            raise ValueError(f"unknown layout {layout!r} (dp | tp | sp)")
        self.eval_loss_fn = jax.jit(make_eval_loss)
        # default: the reference CPM recipe's plateau controller; A2J passes
        # StepLR(10, 0.2) (reference: train_a2j_mpaug_new.py:444)
        self.scheduler = scheduler or ReduceLROnPlateau(learning_rate)
        # warmup schedules start below the nominal lr; honor epoch 0's value
        lr0 = getattr(self.scheduler, "initial_lr", None)
        if lr0 is not None and abs(lr0 - learning_rate) > 1e-12:
            self.state = set_learning_rate(self.state, lr0)
        self.best_val = float("inf")
        self.epoch = 0
        self.history = []
        # per-epoch scalars also go to TensorBoard when available
        # (reference: train_rtpose_light3d_kdh3d.py:322,340-341 tensorboardX)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(out_dir, "tb"))
        except Exception:
            self.writer = None

    def train_epoch(self, dataset, batch_size: int):
        batch_time, data_time = AverageMeter(), AverageMeter()
        device_losses = []  # sync once per epoch, not per step
        end = time.time()
        for i, batch in enumerate(dataset.iter_batches(batch_size)):
            data_time.update(time.time() - end)
            batch = self._shard(batch)
            self.state, logs = self.step_fn(self.state, batch)
            device_losses.append(logs["loss"])
            batch_time.update(time.time() - end)
            end = time.time()
            if i % self.print_freq == 0:
                # materializing the scalar blocks on the device only here
                print(
                    f"epoch {self.epoch} [{i}] loss {float(logs['loss']):.4f} "
                    f"batch {batch_time.avg:.3f}s data {data_time.avg:.3f}s "
                    f"lr {get_learning_rate(self.state):.4g}"
                )
        return float(np.mean([float(l) for l in device_losses])) if device_losses else 0.0

    def validate(self, dataset, batch_size: int):
        losses = AverageMeter()
        n_data = self.mesh.shape["data"]
        for batch in dataset.iter_batches(batch_size, shuffle=False, drop_last=False):
            first = batch.get("image", next(iter(batch.values())))
            n = int(np.asarray(first).shape[0])
            # a ragged tail batch can't shard over the mesh; score it on one
            # device via the plain jit
            if n % n_data == 0:
                batch = self._shard(batch)
            loss = float(self.eval_loss_fn(self.state, batch))
            losses.update(loss, n)
        if losses.count == 0:
            raise ValueError(
                f"validation set yielded no batches (len={len(dataset)}, "
                f"batch_size={batch_size})"
            )
        return losses.avg

    def fit(self, train_ds, val_ds, epochs: int, batch_size: int,
            checkpoint_every: int | None = None, val_every: int = 1):
        """`val_every`/`checkpoint_every` thin the per-epoch validate/save
        cadence for many-small-epoch runs (the synthetic-generalization
        recipe runs 16-step epochs, where per-epoch orbax saves would cost
        more wall-clock than the steps); the final epoch always validates
        and checkpoints."""
        n_data = self.mesh.shape["data"]
        if batch_size % n_data != 0:
            if self.layout != "dp":
                raise ValueError(
                    f"batch {batch_size} must divide the mesh's data axis "
                    f"({n_data}) under layout {self.layout!r}"
                )
            # shrink the data-parallel mesh to the largest divisor of batch
            n = max(d for d in range(1, n_data + 1) if batch_size % d == 0)
            self.mesh = make_mesh(jax.devices()[:n])
            self.step_fn = jit_step_over_mesh(self._make_step, self.mesh)
            self._shard = lambda b: shard_batch(b, self.mesh)
        for k in range(epochs):
            last = k == epochs - 1
            if self.profile_epoch is not None and self.epoch == self.profile_epoch:
                jax.profiler.start_trace(os.path.join(self.out_dir, "trace"))
            train_loss = self.train_epoch(train_ds, batch_size)
            if self.profile_epoch is not None and self.epoch == self.profile_epoch:
                jax.profiler.stop_trace()

            do_val = val_ds is not None and (last or (self.epoch + 1) % val_every == 0)
            val_loss = self.validate(val_ds, batch_size) if do_val else train_loss
            new_lr = self.scheduler.step(val_loss)
            if abs(new_lr - get_learning_rate(self.state)) > 1e-12:
                self.state = set_learning_rate(self.state, new_lr)

            rec = {
                "epoch": self.epoch,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": new_lr,
            }
            self.history.append(rec)
            with open(os.path.join(self.out_dir, "history.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")
            if self.writer is not None:
                self.writer.add_scalar("train_loss", train_loss, self.epoch)
                self.writer.add_scalar("val_loss", val_loss, self.epoch)
                self.writer.add_scalar("lr", new_lr, self.epoch)

            meta = {
                "val_loss": val_loss,
                "epoch": self.epoch,
                "lr": new_lr,
                "scheduler_best": self.scheduler.best,
                "best_val": min(self.best_val, val_loss),
            }
            if (do_val or val_ds is None) and val_loss < self.best_val:
                self.best_val = val_loss
                # best-val weights live in their own directory so periodic
                # checkpoints can never evict them (max_to_keep)
                ckpt.save_checkpoint(
                    os.path.join(self.out_dir, "ckpt_best"), self.state,
                    step=self.epoch, metadata=meta, keep=1,
                )
            if last or checkpoint_every is None or (self.epoch + 1) % checkpoint_every == 0:
                ckpt.save_checkpoint(
                    os.path.join(self.out_dir, "ckpt"), self.state,
                    step=self.epoch, metadata=meta,
                )
            self.epoch += 1
        return self.history

    def resume(self, best: bool = False):
        """Resume from the latest (or best-val) checkpoint, restoring the
        full train state AND the plateau-scheduler state so the reduced
        learning rate survives restarts."""
        d = "ckpt_best" if best else "ckpt"
        state, meta, step = ckpt.restore_checkpoint(
            os.path.join(self.out_dir, d), self.state
        )
        self.state = state
        meta = meta or {}
        self.epoch = meta.get("epoch", step) + 1
        self.best_val = meta.get("best_val", meta.get("val_loss", float("inf")))
        if "lr" in meta:
            self.scheduler.lr = meta["lr"]
            self.scheduler.best = meta.get("scheduler_best")
            if hasattr(self.scheduler, "epoch"):  # StepLR counts epochs
                self.scheduler.epoch = self.epoch
            self.state = set_learning_rate(self.state, meta["lr"])
        return self
