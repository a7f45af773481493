"""Device decode path vs the exact host path on interior-peak scenes."""

import numpy as np

import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.ops import encoders
from popnet_tpu.decode import paf_np
from popnet_tpu.decode.human_list import paf_to_human_list
from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched
from popnet_tpu.decode.assemble import assemble_batch

CFG = EncoderConfig()


def synth(seed, n_people, B=2):
    rng = np.random.default_rng(seed)
    heats, pafs = [], []
    for b in range(B):
        j2 = np.full((CFG.max_people, 15, 2), -1e6, dtype=np.float32)
        valid = np.zeros(CFG.max_people, dtype=bool)
        for p in range(n_people):
            center = rng.uniform(60, 164, size=2)
            j2[p] = center + rng.normal(0, 22, size=(15, 2))
            valid[p] = True
        h = np.asarray(encoders.encode_heatmaps(jnp.asarray(j2), jnp.asarray(valid), CFG))
        f = np.asarray(encoders.encode_pafs(jnp.asarray(j2), jnp.asarray(valid), CFG))
        heats.append(h + rng.normal(0, 0.005, h.shape))
        pafs.append(f + rng.normal(0, 0.005, f.shape))
    return np.stack(heats).astype(np.float32), np.stack(pafs).astype(np.float32)


def sorted_humans(humans):
    return sorted(
        [tuple(np.round(np.array(h).ravel(), 2)) for h in humans]
    )


def test_device_matches_host_pipeline():
    heat, paf = synth(0, 2)
    peaks, valid = find_peaks_batched(jnp.asarray(heat))
    scores, ok = score_limb_pairs_batched(jnp.asarray(paf), peaks, valid)
    device_out = assemble_batch(peaks, valid, scores, ok)

    for b in range(heat.shape[0]):
        jl, people = paf_np.paf_to_pose(heat[b].astype(np.float64), paf[b].astype(np.float64))
        host_h, host_v, host_c = paf_to_human_list(jl, people)
        dev_h, dev_v, dev_c = device_out[b]
        assert len(dev_h) == len(host_h)
        assert sorted_humans(dev_h) == sorted_humans(host_h)


def test_device_peaks_match_host_nms():
    heat, _ = synth(1, 3)
    from popnet_tpu.decode.peaks_np import nms_heatmaps

    peaks, valid = find_peaks_batched(jnp.asarray(heat))
    peaks = np.asarray(peaks)
    valid = np.asarray(valid)
    for b in range(heat.shape[0]):
        host = nms_heatmaps(heat[b].astype(np.float64))
        for k in range(15):
            hp = host[k]
            n = int(valid[b, k].sum())
            assert n == len(hp)
            # compare as score-sorted sets
            dev = peaks[b, k, :n]
            dev_sorted = dev[np.argsort(-dev[:, 2])]
            host_sorted = hp[np.argsort(-hp[:, 2])]
            np.testing.assert_allclose(dev_sorted[:, :3], host_sorted[:, :3], atol=1e-3)
