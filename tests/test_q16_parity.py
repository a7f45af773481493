"""q16 wire-format metric parity (VERDICT r2 item 8).

The serving headline rides the fixed-point uint16 wire
(serving.pack_outputs_q16). Its quantization is unit-bounded by
tests/test_serving.py; this test proves the stronger property: scoring the
BENCHMARK METRICS through the q16 wire equals the exact-f32 wire within
1e-3 on a synthetic multi-person set, using the GT-map oracle so the
metrics sit in a demanding (~1.0) regime rather than comparing zeros.

Reference metric stack: util/eval_pck.py + util/eval_mAP.py via
main_evaluate_mp_human_3D.py; wire format is ours (no reference analogue).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from popnet_tpu.cli import evaluate as ev
from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.data.datasets import MPRealDataset
from popnet_tpu.decode.openpose_infer import openpose_decode
from popnet_tpu.serving import (
    pack_outputs,
    pack_outputs_q16,
    unpack_outputs,
    unpack_outputs_q16,
)

from tests import synthetic_data
from tests.test_e2e_eval import make_oracle

ECFG = EncoderConfig(max_people=6)
DCFG = DecodeConfig()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdh3d_q16")
    paths = synthetic_data.build(str(root), n_images=8)
    return MPRealDataset(paths["img_dir"], paths["labels"], ecfg=ECFG)


def _pred_lists(out, n_images):
    """Unpacked wire dict -> (pred2d, pred3d, conf) benchmark lists."""
    counts = np.asarray(out["counts"]).reshape(n_images, -1)[:, 0].astype(int)
    pred2d, pred3d, conf = [], [], []
    for b in range(n_images):
        nb = counts[b]
        pred2d.append([out["joints2d"][b, p].tolist() for p in range(nb)])
        pred3d.append([out["joints3d"][b, p].tolist() for p in range(nb)])
        conf.append([list(map(float, out["conf"][b, p])) for p in range(nb)])
    return pred2d, pred3d, conf


def test_q16_wire_metric_parity(dataset):
    targets = make_oracle(dataset)
    depth = dataset.dcfg.depth
    cam = dataset.intrinsics

    n = len(dataset)
    bufs_f32, bufs_q16 = [], []
    for s in range(0, n, 4):
        idx = list(range(s, min(s + 4, n)))
        batch = dataset.get_batch(idx)
        t = targets(len(idx))
        out = openpose_decode(
            t["heatmaps"], t["pafs"], t["zmaps"], batch["image"],
            ECFG, DCFG, depth, cam,
            w_out=float(dataset.dcfg.width), h_out=float(dataset.dcfg.height),
        )
        args = (out["joints2d"], out["joints3d"][..., 2], out["conf"],
                out["counts"])
        bufs_f32.append(np.asarray(pack_outputs(
            out["joints2d"], out["joints3d"], out["conf"],
            out["counts"].astype(jnp.float32))))
        bufs_q16.append(np.asarray(pack_outputs_q16(*args)))

    gt2d, gt3d = dataset.gt_human_lists()
    P, K = DCFG.max_people, ECFG.num_joints

    f32 = unpack_outputs(np.concatenate(bufs_f32), P, K)
    q16 = unpack_outputs_q16(np.concatenate(bufs_q16), P, K, cam=cam)

    res = {}
    for name, out in (("f32", f32), ("q16", q16)):
        pred2d, pred3d, conf = _pred_lists(out, n)
        res[name] = ev.evaluate_predictions(
            pred2d, pred3d, conf, gt2d, gt3d, verbose=False
        )

    # the oracle regime must be demanding — comparing zeros proves nothing
    assert res["f32"]["pck2d"] > 0.9
    assert res["f32"]["map2d"] > 0.85
    assert res["f32"]["pck3d"] > 0.85
    for k in ("pck2d", "pck3d", "map2d", "map3d"):
        assert abs(res["f32"][k] - res["q16"][k]) <= 1e-3, (
            k, res["f32"][k], res["q16"][k]
        )
