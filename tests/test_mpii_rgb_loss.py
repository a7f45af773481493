"""MPII parsing + RGB PoP-Net loss."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.data import mpii
from popnet_tpu.losses import popnet_rgb_loss
from popnet_tpu.models import PopNetRGB


def test_prepare_mpii_labels(tmp_path):
    annos = [
        {"image": "a.jpg", "joints": [[1.0, 2.0]] * 16, "joints_vis": [1] * 16},
        {"image": "a.jpg", "joints": [[5.0, 6.0]] * 16, "joints_vis": [0] * 16},
        {"image": "b.jpg", "joints": [[7.0, 8.0]] * 16, "joints_vis": [1] * 16},
    ]
    p = tmp_path / "train.json"
    json.dump(annos, open(p, "w"))
    labels = mpii.prepare_mpii_labels(str(p))
    assert set(labels) == {"a.jpg", "b.jpg"}
    assert len(labels["a.jpg"]) == 2


def test_visibility_from_border():
    anns = [{"2d_joints": [[1.0, 50.0], [50.0, 50.0], [250.0, 50.0]] ,
             "visible_joints": [1, 0, 1]}]
    out = mpii.assign_visibility_from_border(anns, 100, 200, margin=3)
    assert out[0]["visible_joints"] == [0, 1, 0]
    out2 = mpii.assign_visibility_from_border(anns, 100, 200, intersect_gt=True)
    assert out2[0]["visible_joints"] == [0, 0, 0]


def test_mpii_limb_table():
    assert len(mpii.MPII_LIMBS) == 15
    assert len(mpii.MPII_SWAP_INDICES) == 16
    # swap is an involution
    s = np.asarray(mpii.MPII_SWAP_INDICES)
    assert (s[s] == np.arange(16)).all()


def test_popnet_rgb_loss_runs_and_grads():
    K = 16
    model = PopNetRGB(num_parts=K)
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    (_, rgb_saved) = model.apply(v, x, train=False)

    rng = np.random.default_rng(0)
    b, h, w = 2, 8, 8
    heat_gt = jnp.asarray(rng.uniform(0, 1, (b, h, w, K + 1)).astype(np.float32))
    align_gt = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * K)).astype(np.float32))
    fg_align = jnp.asarray((rng.uniform(size=(b, h, w, 2 * K)) > 0.5).astype(np.float32))
    A = 2
    naf = 5 + 3 * K  # x, y, vis per joint (no z in RGB)
    prior_gt = jnp.asarray(rng.uniform(-1, 1, (b, 4, 4, A * naf)).astype(np.float32))
    mconf = jnp.asarray(rng.uniform(0, 1, (b, 4, 4, A)).astype(np.float32))
    mcoord = jnp.asarray((rng.uniform(size=(b, 4, 4, A)) > 0.7).astype(np.float32))

    loss, logs = popnet_rgb_loss(
        rgb_saved, heat_gt, align_gt, fg_align, prior_gt, mconf, mcoord, K
    )
    assert np.isfinite(float(loss))
    assert {"loss_prior", "loss_bbox", "loss_obj", "loss_selfpose"} <= set(logs)


def test_prepare_mpii_labels_from_mat(tmp_path):
    """Synthetic RELEASE .mat with the official nesting round-trips."""
    sio = __import__("scipy.io", fromlist=["io"])

    def cell(arr_list):
        c = np.empty((1, len(arr_list)), dtype=object)
        for i, a in enumerate(arr_list):
            c[0, i] = a
        return c

    n_j = 3
    point = np.zeros((1, 1), dtype=[("id", "O"), ("x", "O"), ("y", "O"), ("is_visible", "O")])
    point[0, 0]["id"] = cell([np.array([[j]]) for j in range(n_j)])
    point[0, 0]["x"] = cell([np.array([[10.0 * j]]) for j in range(n_j)])
    point[0, 0]["y"] = cell([np.array([[20.0 * j]]) for j in range(n_j)])
    point[0, 0]["is_visible"] = cell([np.array([["1"]]) for _ in range(n_j)])

    annopoint = np.zeros((1, 1), dtype=[("point", "O")])
    annopoint[0, 0]["point"] = point

    annorect = np.zeros((1, 1), dtype=[
        ("annopoints", "O"), ("x1", "O"), ("y1", "O"), ("x2", "O"), ("y2", "O")
    ])
    annorect[0, 0]["annopoints"] = annopoint[0, 0]
    annorect[0, 0]["x1"] = np.array([[5.0]])
    annorect[0, 0]["y1"] = np.array([[6.0]])
    annorect[0, 0]["x2"] = np.array([[50.0]])
    annorect[0, 0]["y2"] = np.array([[60.0]])

    image = np.zeros((1, 1), dtype=[("name", "O")])
    image[0, 0]["name"] = np.array(["im1.jpg"])

    anno = np.zeros((1, 1), dtype=[("image", "O"), ("annorect", "O")])
    anno[0, 0]["image"] = image
    anno[0, 0]["annorect"] = annorect

    release = {
        "RELEASE": {
            "annolist": anno.reshape(1, 1),
            "img_train": np.array([[1]]),
        }
    }
    p = str(tmp_path / "mpii.mat")
    sio.savemat(p, release)

    labels = mpii.prepare_mpii_labels_from_mat(p)
    assert "im1.jpg" in labels
    ann = labels["im1.jpg"][0]
    assert ann["head_rect"] == [5.0, 6.0, 50.0, 60.0]
    assert ann["2d_joints"][1] == [10.0, 20.0]
    assert ann["visible_joints"][2] == 1
