"""Train-step MFU decomposition (VERDICT r3 item 3).

bench_train.py reports the full jitted fwd+bwd+update program at MFU 0.39
(b128) vs the serving CNN's 0.55. This script attributes that gap by timing
four nested programs over the SAME cached device batch:

  fwd_infer   forward + loss, train=False (frozen BN stats, no grad) —
              the serving-like floor
  fwd_stats   forward + loss, train=True (mutable BN batch stats, no grad)
              -> delta vs fwd_infer = the BN-statistics cost
  fwd_bwd     value_and_grad of fwd_stats (no optimizer update)
              -> delta = the backward pass
  full_step   the Trainer's jitted donated step (fwd+bwd+Adam+BN update)
              -> delta = optimizer + state plumbing

Each row reports XLA compiled-cost FLOPs/bytes, measured wall ms, MFU vs
the bf16 peak, and the roofline bound — so "irreducible for this layer
mix" is a number, not a claim (reference train loop:
train_rtpose_light3d_kdh3d.py:153-213 has no such figure at all).

Run on the chip:  python scripts/profile_train.py
Env: PROF_BATCH=128,256,512  PROF_ITERS=20  BENCH_PEAK_TFLOPS=197
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    from popnet_tpu.core.config import EncoderConfig
    from popnet_tpu.losses import popnet_loss
    from popnet_tpu.models import PopNet
    from popnet_tpu.parallel.mesh import make_mesh
    from popnet_tpu.train.loop import Trainer
    from popnet_tpu.train.steps import make_popnet_train_step

    from tests import synthetic_data

    batches = [int(b) for b in os.environ.get("PROF_BATCH", "128,256,512").split(",")]
    iters = int(os.environ.get("PROF_ITERS", "20"))
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    peak_bw = float(os.environ.get("BENCH_PEAK_GBPS", "819")) * 1e9

    ecfg = EncoderConfig()
    model = PopNet(dtype=jnp.bfloat16)

    # one b128 batch from the real dataset, tiled up for larger sizes:
    # batch CONTENT is irrelevant to throughput, shapes are what compile
    root = tempfile.mkdtemp(prefix="prof_train_")
    paths = synthetic_data.build(root, n_images=128)
    from popnet_tpu.data.datasets import KDH3DDataset

    ds = KDH3DDataset(paths["img_dir"], paths["labels"], ecfg=ecfg,
                      is_train=True, transfer="u16mm")
    base = next(iter(ds.iter_batches(128, prefetch=0)))
    base = {k: np.asarray(v) for k, v in base.items()}

    step = make_popnet_train_step()

    def loss_of(saved, b):
        loss, _ = popnet_loss(
            saved, b["heatmaps"], b["zmaps"], b["fg_masks_z"],
            b["align_maps"], b["fg_masks_align"], b["prior_map"],
            b["prior_mask_conf"], b["prior_mask_coord"], ecfg.num_joints,
            prior_weight_map=b["prior_weight_map"],
        )
        return loss

    trainer = Trainer(model, step, lambda s, b: 0.0, learning_rate=1e-3,
                      mesh=make_mesh(jax.devices()[:1]),
                      out_dir=os.path.join(root, "run"), print_freq=10**9)
    state = trainer.state
    params, stats = state.params, state.batch_stats

    def fwd_infer(p, b):
        (_, saved) = state.apply_fn(
            {"params": p, "batch_stats": stats}, b["image"], train=False)
        return loss_of(saved, b)

    def fwd_stats(p, b):
        (_, saved), mut = state.apply_fn(
            {"params": p, "batch_stats": stats}, b["image"], train=True,
            mutable=["batch_stats"])
        return loss_of(saved, b), mut

    def fwd_bwd(p, b):
        def inner(pp):
            out, mut = fwd_stats(pp, b)
            return out, mut
        (loss, mut), grads = jax.value_and_grad(inner, has_aux=True)(p)
        return loss, grads, mut

    def run(name, fn, *args, materialize):
        jfn = jax.jit(fn)
        out = jfn(*args)
        np.asarray(materialize(out))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        np.asarray(materialize(out))
        dt = (time.perf_counter() - t0) / iters
        return dt, out

    for B in batches:
        reps = B // 128
        batch = {k: jnp.asarray(np.concatenate([v] * reps, axis=0))
                 for k, v in base.items()}
        rows = {}

        flops, bytes_ = _cost(fwd_infer, params, batch)
        dt, _ = run("fwd_infer", fwd_infer, params, batch,
                    materialize=lambda o: o)
        rows["fwd_infer"] = (flops, bytes_, dt)

        flops, bytes_ = _cost(fwd_stats, params, batch)
        dt, _ = run("fwd_stats", fwd_stats, params, batch,
                    materialize=lambda o: o[0])
        rows["fwd_stats"] = (flops, bytes_, dt)

        flops, bytes_ = _cost(fwd_bwd, params, batch)
        dt, _ = run("fwd_bwd", fwd_bwd, params, batch,
                    materialize=lambda o: o[0])
        rows["fwd_bwd"] = (flops, bytes_, dt)

        # the Trainer's actual donated program. step_fn donates its state
        # argument (train/steps.py donate_argnums), so run it on a deep COPY:
        # donating trainer.state itself would delete the very buffers the
        # fwd_* closures above capture (params/stats) and crash the next
        # batch-size iteration with "Array has been deleted".
        st = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x,
            trainer.state)
        cost = trainer.step_fn.lower(st, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
        st, logs = trainer.step_fn(st, batch)
        float(logs["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, logs = trainer.step_fn(st, batch)
        float(logs["loss"])
        dt = (time.perf_counter() - t0) / iters
        rows["full_step"] = (flops, bytes_, dt)

        prev_dt = 0.0
        for name in ("fwd_infer", "fwd_stats", "fwd_bwd", "full_step"):
            flops, bytes_, dt = rows[name]
            print(json.dumps({
                "program": name, "batch": B,
                "ms": round(dt * 1e3, 2),
                "delta_ms_vs_prev": round((dt - prev_dt) * 1e3, 2),
                "gflops": round(flops / 1e9, 1),
                "gbytes": round(bytes_ / 1e9, 3),
                "mfu": round(flops / dt / peak, 4),
                "roofline_ms": round(
                    max(flops / peak, bytes_ / peak_bw) * 1e3, 2),
                "fps": round(B / dt, 1),
            }), flush=True)
            prev_dt = dt


if __name__ == "__main__":
    main()
