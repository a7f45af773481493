"""Regression pins for the profiling scripts' two advisor-found crashes
(ADVICE r4): the donated-step state consumption in profile_train.py and the
tuple-through-serve_stream materialization in profile_yolo.py. Both are
pinned at miniature scale with the exact access patterns the scripts use.
"""

import numpy as np
import jax
import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig, KDH3D_DEPTH
from popnet_tpu.data.datasets import KDH3DDataset
from popnet_tpu.decode.prior import decode_prior_maps
from popnet_tpu.models import YoloPoseNet
from popnet_tpu.serving import serve_stream
from popnet_tpu.train.loop import Trainer
from popnet_tpu.train.steps import make_yolo_train_step

from tests import synthetic_data
from tests.test_trainer import ECFG, make_eval_loss


def test_donated_step_on_copied_state_preserves_captured_params(tmp_path):
    """profile_train.py runs fwd-only closures over `trainer.state.params`
    AND times the donated `trainer.step_fn` in the same loop. Donating
    trainer.state itself deletes the captured buffers; the script's fix is
    to donate a deep copy. Pin that pattern: after two donated steps on the
    copy, the original params must still be readable and jit-usable."""
    paths = synthetic_data.build(str(tmp_path / "data"), n_images=8)
    ds = KDH3DDataset(paths["img_dir"], paths["labels"], bg_aug=False,
                      ecfg=ECFG, pose_align=False, seed=0)
    batch = next(iter(ds.iter_batches(4, prefetch=0)))
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()}

    from popnet_tpu.parallel.mesh import make_mesh

    trainer = Trainer(YoloPoseNet(), make_yolo_train_step(), make_eval_loss,
                      learning_rate=0.02, out_dir=str(tmp_path / "run"),
                      mesh=make_mesh(jax.devices()[:1]),  # as the script does
                      print_freq=10**9)
    params = trainer.state.params

    def fwd(p, b):
        return jnp.sum(trainer.state.apply_fn(
            {"params": p, "batch_stats": trainer.state.batch_stats},
            b["image"], train=False))

    before = float(jax.jit(fwd)(params, batch))

    # the profile_train.py discipline: donate a COPY, never trainer.state
    st = jax.tree.map(lambda x: x.copy() if isinstance(x, jax.Array) else x,
                      trainer.state)
    for _ in range(2):
        st, logs = trainer.step_fn(st, batch)
    assert np.isfinite(float(logs["loss"]))

    # captured buffers survive: same jitted fn, same params, same value
    after = float(jax.jit(fwd)(params, batch))
    assert after == before


def test_prior_decode_stage_is_single_array_through_serve_stream():
    """serve_stream materializes each yield with ONE np.asarray
    (serving.py), so a profiled stage must emit a single array.
    decode_prior_maps returns (dets (B,M,naf), valid (B,M)) — profile_yolo's
    stage folds valid in as a trailing column; pin that the folded form
    round-trips through serve_stream and the columns survive unchanged."""
    ecfg, dcfg = EncoderConfig(), DecodeConfig()
    anchors = jnp.asarray(np.asarray(ecfg.anchors, np.float32))
    rng = np.random.default_rng(0)
    naf = 5 + 3 * ecfg.num_joints  # [cx cy w h conf, K*(x y z)] per anchor
    prior = jnp.asarray(rng.normal(0, 1, (2, ecfg.grid_h, ecfg.grid_w,
                                          len(ecfg.anchors) * naf)
                                   ).astype(np.float32))

    def stage(p):
        dets, valid = decode_prior_maps(
            p, anchors, KDH3D_DEPTH.mean, KDH3D_DEPTH.std,
            num_joints=ecfg.num_joints, conf_threshold=dcfg.conf_threshold,
            nms_threshold=dcfg.nms_threshold, max_det=dcfg.max_people)
        return jnp.concatenate([dets, valid[..., None].astype(dets.dtype)], -1)

    jfn = jax.jit(stage)
    outs = list(serve_stream(jfn, (prior for _ in range(3)), queue_depth=2))
    assert len(outs) == 3
    dets, valid = map(np.asarray, decode_prior_maps(
        prior, anchors, KDH3D_DEPTH.mean, KDH3D_DEPTH.std,
        num_joints=ecfg.num_joints, conf_threshold=dcfg.conf_threshold,
        nms_threshold=dcfg.nms_threshold, max_det=dcfg.max_people))
    for o in outs:
        assert isinstance(o, np.ndarray) and o.ndim == 3
        np.testing.assert_array_equal(o[..., :-1], dets)
        np.testing.assert_array_equal(o[..., -1], valid.astype(o.dtype))
