"""resize_bilinear_cv2 must match cv2.resize INTER_LINEAR."""

import cv2
import numpy as np

from popnet_tpu.ops.resize import resize_bilinear_cv2


def test_downsample_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 6, (224, 224)).astype(np.float32)
    ref = cv2.resize(img, (28, 28))  # INTER_LINEAR default
    ours = np.asarray(resize_bilinear_cv2(img, 28, 28))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (28, 28, 3)).astype(np.float32)
    ref = cv2.resize(img, (224, 224))
    ours = np.asarray(resize_bilinear_cv2(img, 224, 224))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nonsquare_matches_cv2():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 6, (512, 480)).astype(np.float32)
    ref = cv2.resize(img, (224, 224))
    ours = np.asarray(resize_bilinear_cv2(img, 224, 224))
    # cv2 quantizes interpolation coefficients; sub-mm noise on metric depth
    np.testing.assert_allclose(ours, ref, atol=5e-4)
