"""RGB image preprocessing variants + crop-with-factor inference helper.

The COCO RGB side of the reference normalizes images four different ways
depending on the trunk (reference: lib/datasets/preprocessing.py:16-99) and
its eval driver resizes/pads every image so the CNN sees a stride-aligned
canvas (reference: lib/network/im_transform.py:113-135 ``crop_with_factor``,
called from evaluate/coco_eval.py:206-240 ``get_outputs``).

TPU-first departures from the reference:

- Everything stays HWC / NHWC (the reference transposes to CHW for torch).
- The normalizations are closed-form array expressions (no per-channel
  Python loops) and run fine under jit on device; ``crop_with_factor``
  involves a data-dependent output shape, so it stays a host-side NumPy
  helper that produces the static-shaped canvas the jitted model consumes.
- ``rgb_infer`` fuses preprocess + model + optional flip-averaging into the
  device program; only the dense maps for ONE image cross back.

Images are BGR uint8/float HWC as read by cv2, matching the reference.
"""

from __future__ import annotations

import numpy as np

_VGG_MEANS = np.asarray([0.485, 0.456, 0.406], np.float32)  # RGB order
_VGG_STDS = np.asarray([0.229, 0.224, 0.225], np.float32)
_SSD_MEANS = np.asarray([104.0, 117.0, 123.0], np.float32)  # RGB order


def rtpose_preprocess(image):
    """x/256 - 0.5, BGR kept (reference: preprocessing.py:16-21)."""
    return np.asarray(image, np.float32) / 256.0 - 0.5


def inverse_rtpose_preprocess(image):
    return ((np.asarray(image, np.float32) + 0.5) * 256.0).astype(np.uint8)


def vgg_preprocess(image):
    """BGR->RGB, /255, imagenet mean/std (reference: preprocessing.py:32-43)."""
    x = np.asarray(image, np.float32)[..., ::-1] / 255.0
    return (x - _VGG_MEANS) / _VGG_STDS


def inverse_vgg_preprocess(image):
    x = np.asarray(image, np.float32) * _VGG_STDS + _VGG_MEANS
    return x[..., ::-1] * 255.0


def inception_preprocess(image):
    """BGR->RGB, x/128 - 1 (reference: preprocessing.py:46-52)."""
    return np.asarray(image, np.float32)[..., ::-1] / 128.0 - 1.0


def inverse_inception_preprocess(image):
    x = (np.asarray(image, np.float32) + 1.0) * 128.0
    return x[..., ::-1].astype(np.uint8)


def ssd_preprocess(image):
    """RGB mean subtraction, emitted back in BGR order
    (reference: preprocessing.py:78-87: BGR->RGB, -means, then ::-1)."""
    x = np.asarray(image, np.float32)[..., ::-1] - _SSD_MEANS
    return x[..., ::-1]


PREPROCESSORS = {
    "rtpose": rtpose_preprocess,
    "vgg": vgg_preprocess,
    "inception": inception_preprocess,
    "ssd": ssd_preprocess,
}


def preprocess(image, mode: str):
    """Dispatch like the reference's ``preprocess`` (preprocessing.py:91-99):
    unknown modes pass the image through unchanged."""
    fn = PREPROCESSORS.get(mode)
    return image if fn is None else fn(image)


def _factor_closest(num: float, factor: int, is_ceil: bool = True) -> int:
    num = np.ceil(float(num) / factor) if is_ceil else np.floor(float(num) / factor)
    return int(num) * factor


def crop_with_factor(im: np.ndarray, dest_size: int, factor: int = 32,
                     is_ceil: bool = True):
    """Resize so min(H, W) == dest_size, zero-pad H/W up to multiples of
    `factor` (reference: im_transform.py:119-135).

    Returns (canvas, im_scale, resized_shape). The canvas top-left contains
    the resized image; the model's outputs map back to original coordinates
    via stride / im_scale (coco_eval.py:276)."""
    import cv2

    im = np.asarray(im)
    im_scale = float(dest_size) / np.min(im.shape[0:2])
    im = cv2.resize(im, None, fx=im_scale, fy=im_scale)
    if im.ndim == 2:
        im = im[:, :, None]
    h, w, c = im.shape
    canvas = np.zeros(
        [_factor_closest(h, factor, is_ceil), _factor_closest(w, factor, is_ceil), c],
        dtype=im.dtype,
    )
    canvas[0:h, 0:w, :] = im
    return canvas, im_scale, im.shape


def rgb_infer(
    infer,
    image: np.ndarray,           # (H, W, 3) BGR, as cv2.imread returns
    mode: str = "vgg",
    dest_size: int = 368,
    factor: int = 8,
    flip: bool = False,
    limbs=None,
    swap_indices=None,
):
    """The ``get_outputs`` equivalent (reference: coco_eval.py:206-240):
    crop_with_factor -> preprocess -> CNN (-> optional flip-averaged second
    pass, coco_eval.py:158 handle_paf_and_heat) -> (paf, heat, im_scale).

    `infer(images_nhwc) -> (paf, heat, ...)` is the jitted model call; with
    flip=True the mirrored pass is averaged in via
    decode/flip_average.flip_average_infer using the skeleton tables
    (`limbs`, `swap_indices`)."""
    canvas, im_scale, _ = crop_with_factor(image, dest_size, factor=factor)
    x = preprocess(canvas, mode)[None].astype(np.float32)
    if flip:
        from popnet_tpu.decode.flip_average import flip_average_infer

        paf, heat = flip_average_infer(infer, x, limbs, swap_indices)[:2]
    else:
        paf, heat = infer(x)[:2]
    return np.asarray(paf)[0], np.asarray(heat)[0], im_scale
