"""Chunk-streaming scene bank (data/streaming.py): per-draw equality with
the full-resident bank, epoch coverage, repeats, and bounded HBM residency
(VERDICT r3 item 2a).
"""

import numpy as np
import pytest

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.data.datasets import DeviceMPAugDataset
from popnet_tpu.data.streaming import StreamingDeviceMPAugDataset

from tests import synthetic_data

ECFG = EncoderConfig(input_x=64, input_y=64)
N_IMAGES = 8


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_ds"))
    synthetic_data.build(root, n_images=N_IMAGES, n_locations=2, seed=3)
    return root


def _make(cls, root, seed=0, **kw):
    import os

    ann_files = sorted(
        os.path.join(root, f) for f in os.listdir(root)
        if f.startswith("labels_loc") and f.endswith(".json")
    )
    return cls(
        os.path.join(root, "depth_maps"), ann_files,
        bg_file=os.path.join(root, "labels_bg.json"),
        bg_dir=os.path.join(root, "bg_maps"),
        seg_dir=os.path.join(root, "seg_maps"),
        ecfg=ECFG, seed=seed, **kw,
    )


def test_stream_matches_full_bank(data_root):
    """A streamed batch over a staged shard == the full-bank batch for the
    same indices and rng state — the sampling semantics are shared code
    (_bank_batch), only the bank rows differ."""
    full = _make(DeviceMPAugDataset, data_root, seed=11)
    stream = _make(StreamingDeviceMPAugDataset, data_root, seed=11,
                   shard_indices=4)
    assert stream.n_shards == 2

    shard = stream._stage(0)
    idxs = np.arange(4)
    b_full = full.get_batch(idxs)
    b_stream = stream._bank_batch(
        idxs, shard.row_of, shard.bank_depth, shard.bank_seg, stream.bank_bg
    )
    assert set(b_full) == set(b_stream)
    for k in b_full:
        np.testing.assert_array_equal(
            np.asarray(b_full[k]), np.asarray(b_stream[k]), err_msg=k
        )
    stream._release(shard)


def test_stream_epoch_coverage_and_residency(data_root):
    """One epoch visits every index exactly once (repeats=1), batches only
    mix shard-local samples, and at most two shard banks are ever resident
    (double buffering)."""
    stream = _make(StreamingDeviceMPAugDataset, data_root, seed=0,
                   shard_indices=4, is_train=False)
    seen = []
    for batch in stream.iter_batches(2, shuffle=True, drop_last=False):
        idxs = np.asarray(batch["index"])
        seen.extend(int(i) for i in idxs)
        # shard-locality: a batch never spans shards
        assert len({int(i) // 4 for i in idxs}) == 1
    assert sorted(seen) == list(range(N_IMAGES))
    assert stream.max_live_shards <= 2
    assert stream._live_shards == 0  # all released after the epoch


def test_stream_repeats(data_root):
    """shard_repeats=R yields R passes over each shard per epoch, with each
    resident shard uploaded once."""
    stream = _make(StreamingDeviceMPAugDataset, data_root, seed=0,
                   shard_indices=4, shard_repeats=3, is_train=False)
    seen = []
    for batch in stream.iter_batches(2, shuffle=False):
        seen.extend(int(i) for i in np.asarray(batch["index"]))
    assert len(seen) == 3 * N_IMAGES
    counts = np.bincount(seen, minlength=N_IMAGES)
    assert (counts == 3).all()


def test_stream_trains(data_root):
    """The streaming iterator feeds a real train step (encode=True path)."""
    import jax

    from popnet_tpu.models import YoloPoseNet
    from popnet_tpu.train.state import create_train_state
    from popnet_tpu.train.steps import make_yolo_train_step

    import jax.numpy as jnp

    stream = _make(StreamingDeviceMPAugDataset, data_root, seed=0,
                   shard_indices=4, with_prior=True, pose_align=False)
    model = YoloPoseNet()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
        learning_rate=1e-3, optimizer="adam",
    )
    step = jax.jit(make_yolo_train_step())
    n = 0
    for batch in stream.iter_batches(2):
        state, logs = step(state, batch)
        n += 1
    assert n == N_IMAGES // 2
    assert np.isfinite(float(logs["loss"]))


def test_stream_shard_bytes_bounded(data_root):
    """shard_bytes reports the padded per-shard HBM cost and is independent
    of the dataset's total size — the point of streaming."""
    s4 = _make(StreamingDeviceMPAugDataset, data_root, shard_indices=4)
    s8 = _make(StreamingDeviceMPAugDataset, data_root, shard_indices=8)
    assert s4.shard_bytes() <= s8.shard_bytes()
    # 2 locations x 4 indices -> at most 8 rows/shard
    h, w = s4.dcfg.height, s4.dcfg.width
    assert s4.shard_bytes() <= 8 * h * w * 3
