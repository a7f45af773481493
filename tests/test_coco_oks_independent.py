"""Independent cross-check of eval/coco_oks.py (VERDICT r2 item 9).

pycocotools cannot be installed in this environment, so the vendored OKS
keypoint-AP scorer was previously validated only against itself. This file
contains a SECOND, independently-structured clean-room implementation of
the COCOeval('keypoints') protocol — written from the published algorithm
(per-image greedy matching with ignored-GT demotion, maxDets=20,
mergesort-stable global score ordering, 101-point interpolated precision)
in pycocotools' array layout (ignored detections stay in the cumsum arrays
as neither TP nor FP) rather than coco_oks' filtered-subset layout — and
asserts both implementations agree exactly on randomized multi-image
scenarios including crowds, zero-keypoint GTs, duplicate and spurious
detections, and >maxDets floods. Two independently-derived implementations
agreeing across these regimes pins the protocol the way self-tests cannot.

Reference consumer of the protocol: evaluate/coco_eval.py:243-281.
"""

import numpy as np
import pytest

from popnet_tpu.eval import coco_oks

SIGMAS = coco_oks.OKS_SIGMAS
THRS = coco_oks.IOU_THRS
REC_THRS = coco_oks.REC_THRS
MAX_DETS = 20


# ---- clean-room COCOeval('keypoints'), pycocotools array layout ----------


def _oks_matrix(gts, dts):
    ious = np.zeros((len(gts), len(dts)))
    var = (2.0 * SIGMAS) ** 2
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], np.float64).reshape(-1, 3)
        v = g[:, 2]
        bx, by, bw, bh = np.asarray(gt["bbox"], np.float64)
        area = float(gt.get("area", bw * bh))
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], np.float64).reshape(-1, 3)
            if np.count_nonzero(v > 0):
                dx = d[:, 0] - g[:, 0]
                dy = d[:, 1] - g[:, 1]
            else:
                x0, x1 = bx - bw, bx + 2 * bw
                y0, y1 = by - bh, by + 2 * bh
                dx = np.clip(x0 - d[:, 0], 0, None) + np.clip(d[:, 0] - x1, 0, None)
                dy = np.clip(y0 - d[:, 1], 0, None) + np.clip(d[:, 1] - y1, 0, None)
            e = (dx**2 + dy**2) / var / (area + np.spacing(1)) / 2.0
            if np.count_nonzero(v > 0):
                e = e[v > 0]
            ious[j, i] = np.exp(-e).mean()
    return ious


def _evaluate_img(gts, dts, thrs, max_dets):
    gt_ig0 = np.array([
        g.get("iscrowd", 0) == 1
        or np.count_nonzero(np.asarray(g["keypoints"])[2::3] > 0) == 0
        for g in gts
    ], dtype=bool)
    gind = np.argsort(gt_ig0, kind="mergesort")
    gts = [gts[i] for i in gind]
    gt_ig = gt_ig0[gind]
    dscores = np.array([d["score"] for d in dts])
    dind = np.argsort(-dscores, kind="mergesort")[:max_dets]
    dts = [dts[i] for i in dind]

    ious = _oks_matrix(gts, dts)
    T, G, D = len(thrs), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D), dtype=bool)
    for ti, t in enumerate(thrs):
        for di in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gi in range(G):
                if gtm[ti, gi] > 0:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break
                if ious[gi, di] < iou:
                    continue
                iou = ious[gi, di]
                m = gi
            if m == -1:
                continue
            dt_ig[ti, di] = gt_ig[m]
            dtm[ti, di] = 1
            gtm[ti, m] = 1
    return dtm, dt_ig, gt_ig, np.array([d["score"] for d in dts])


def cocoeval_keypoints(gts_per_image, dts_per_image, thrs=THRS,
                       rec_thrs=REC_THRS, max_dets=MAX_DETS):
    per_img = [
        _evaluate_img(g, d, thrs, max_dets)
        for g, d in zip(gts_per_image, dts_per_image)
    ]
    npig = sum(int(np.count_nonzero(~e[2])) for e in per_img)
    T, R = len(thrs), len(rec_thrs)
    if npig == 0:
        return {"AP": np.nan, "AP50": np.nan, "AP75": np.nan, "AR": np.nan}
    dt_scores = np.concatenate([e[3] for e in per_img])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e[0] for e in per_img], axis=1)[:, inds]
    dt_ig = np.concatenate([e[1] for e in per_img], axis=1)[:, inds]
    tps = np.logical_and(dtm, ~dt_ig)
    fps = np.logical_and(dtm == 0, ~dt_ig)

    precision = np.zeros((T, R))
    recall = np.zeros(T)
    for t in range(T):
        tp = np.cumsum(tps[t]).astype(np.float64)
        fp = np.cumsum(fps[t]).astype(np.float64)
        nd = len(tp)
        rc = tp / npig
        pr = (tp / (fp + tp + np.spacing(1))).tolist()
        recall[t] = rc[-1] if nd else 0.0
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        q = np.zeros(R)
        for ri, pi in enumerate(np.searchsorted(rc, rec_thrs, side="left")):
            if pi < nd:
                q[ri] = pr[pi]
        precision[t] = q
    ap_t = precision.mean(axis=1)
    return {
        "AP": float(ap_t.mean()),
        "AP50": float(ap_t[np.argmin(np.abs(thrs - 0.5))]),
        "AP75": float(ap_t[np.argmin(np.abs(thrs - 0.75))]),
        "AR": float(recall.mean()),
    }


# ---- scenario generator ---------------------------------------------------


def _person(rng, img_w=640, img_h=480):
    cx, cy = rng.uniform(100, img_w - 100), rng.uniform(100, img_h - 100)
    scale = rng.uniform(30, 120)
    kp = np.stack([
        cx + rng.normal(0, scale / 3, 17),
        cy + rng.normal(0, scale / 3, 17),
        rng.choice([0, 1, 2], 17, p=[0.2, 0.3, 0.5]),
    ], axis=1)
    x0, y0 = kp[:, 0].min() - 5, kp[:, 1].min() - 5
    w, h = kp[:, 0].max() - x0 + 5, kp[:, 1].max() - y0 + 5
    return {
        "keypoints": kp.reshape(-1).tolist(),
        "bbox": [x0, y0, w, h],
        "area": float(w * h * rng.uniform(0.4, 0.9)),
        "iscrowd": int(rng.uniform() < 0.1),
        "num_keypoints": int(np.count_nonzero(kp[:, 2] > 0)),
    }


def _detection(rng, gt=None, noise=5.0):
    if gt is None:  # spurious
        kp = np.stack([
            rng.uniform(0, 640, 17), rng.uniform(0, 480, 17), np.ones(17)
        ], axis=1)
    else:
        g = np.asarray(gt["keypoints"]).reshape(-1, 3)
        kp = g.copy()
        kp[:, :2] += rng.normal(0, noise, (17, 2))
        kp[:, 2] = 1
    return {
        "keypoints": kp.reshape(-1).tolist(),
        "score": float(rng.uniform(0.05, 1.0)),
    }


def _scenario(seed, n_images=6, flood=False):
    rng = np.random.default_rng(seed)
    gts_set, dts_set = [], []
    for _ in range(n_images):
        n_gt = int(rng.integers(0, 5))
        gts = [_person(rng) for _ in range(n_gt)]
        dts = []
        for g in gts:
            if rng.uniform() < 0.85:
                dts.append(_detection(rng, g, noise=rng.uniform(1, 25)))
            if rng.uniform() < 0.3:  # duplicate
                dts.append(_detection(rng, g, noise=rng.uniform(1, 40)))
        for _ in range(int(rng.integers(0, 3))):  # spurious
            dts.append(_detection(rng))
        if flood:  # exceed maxDets=20
            for _ in range(25):
                dts.append(_detection(rng, gts[0] if gts else None, noise=60))
        gts_set.append(gts)
        dts_set.append(dts)
    return gts_set, dts_set


# ---- the pin --------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_scenarios_agree(seed):
    gts, dts = _scenario(seed)
    ours = coco_oks.oks_ap(gts, dts)
    ref = cocoeval_keypoints(gts, dts)
    for k in ("AP", "AP50", "AP75", "AR"):
        assert ours[k] == pytest.approx(ref[k], abs=1e-12), (k, ours[k], ref[k])


def test_maxdets_flood_agrees():
    """>20 detections per image must be truncated to COCOeval maxDets=20."""
    gts, dts = _scenario(77, flood=True)
    assert any(len(d) > MAX_DETS for d in dts)
    ours = coco_oks.oks_ap(gts, dts)
    ref = cocoeval_keypoints(gts, dts)
    for k in ("AP", "AP50", "AP75", "AR"):
        assert ours[k] == pytest.approx(ref[k], abs=1e-12), (k, ours[k], ref[k])


def test_analytic_cases():
    g = _person(np.random.default_rng(9))
    g["iscrowd"] = 0
    g["num_keypoints"] = 17
    kp = np.asarray(g["keypoints"]).reshape(-1, 3)
    kp[:, 2] = 2
    g["keypoints"] = kp.reshape(-1).tolist()
    perfect = {"keypoints": kp.copy().reshape(-1).tolist(), "score": 0.9}
    far = dict(perfect)
    far_kp = kp.copy()
    far_kp[:, 0] += 10000.0
    far = {"keypoints": far_kp.reshape(-1).tolist(), "score": 0.9}

    res = coco_oks.oks_ap([[g]], [[perfect]])
    assert res["AP"] == 1.0 and res["AR"] == 1.0
    res = coco_oks.oks_ap([[g]], [[far]])
    assert res["AP"] == 0.0 and res["AR"] == 0.0
    # no real GT anywhere -> undefined
    res = coco_oks.oks_ap([[]], [[perfect]])
    assert np.isnan(res["AP"])
