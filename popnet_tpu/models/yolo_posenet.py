"""Yolo-Pose+ : single-shot anchor-based person+pose detector.

Reference: lib/network/yolo_posenet.py:87-168. ResNet-34 layer1-2 stem
(stride 8, 128 ch) -> 5x conv3 @256 tower -> conv+maxpool to stride 16 ->
head producing A * (5 + 3K) channels, cast per anchor:

    dx, dy        (sigmoid - 0.5) * 2     in (-1, 1)
    w, h          sigmoid * 2             in (0, 2)   (ratio to anchor)
    conf          sigmoid                 in (0, 1)
    x, y, z       (sigmoid - 0.5) * 4     in (-2, 2)  (anchor-normalized)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from popnet_tpu.models.layers import ConvBN, ResNet34Stem, max_pool_2x2


def cast_prior_map(raw: jnp.ndarray, num_anchors: int, num_parts: int) -> jnp.ndarray:
    """Apply the YOLO output casting to a raw (..., A*naf) head
    (reference: yolo_posenet.py:144-156). naf is inferred so the pred_vis
    variant (5 + 4K per anchor) casts its visibility channels too."""
    naf = raw.shape[-1] // num_anchors
    shape = raw.shape
    r = raw.reshape(shape[:-1] + (num_anchors, naf))
    box_xy = (nn.sigmoid(r[..., 0:2]) - 0.5) * 2.0
    box_wh = nn.sigmoid(r[..., 2:4]) * 2.0
    conf = nn.sigmoid(r[..., 4:5])
    joints = (nn.sigmoid(r[..., 5:]) - 0.5) * 4.0
    out = jnp.concatenate([box_xy, box_wh, conf, joints], axis=-1)
    return out.reshape(shape)


class YoloPoseNet(nn.Module):
    num_parts: int = 15
    anchors: tuple[tuple[float, float], ...] = ((6.0, 3.0), (12.0, 6.0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNet34Stem(dtype=self.dtype, name="stem")(x, train)
        # 5-conv tower; the last conv is bare (make_stages leaves the final
        # entry without BN/activation, reference: yolo_posenet.py:101-105)
        for i in range(4):
            x = ConvBN(256, 3, dtype=self.dtype, name=f"tower{i}")(x, train)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01), name="tower4")(x)
        x = ConvBN(256, 3, use_bias=False, dtype=self.dtype, name="head0")(x, train)
        x = max_pool_2x2(x)
        x = ConvBN(256, 3, use_bias=False, dtype=self.dtype, name="head1")(x, train)
        x = ConvBN(128, 3, use_bias=False, dtype=self.dtype, name="head2")(x, train)
        n_out = len(self.anchors) * (5 + 3 * self.num_parts)
        x = nn.Conv(n_out, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01), name="head3")(x)
        return cast_prior_map(x, len(self.anchors), self.num_parts)
