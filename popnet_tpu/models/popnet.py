"""PoP-Net: pose-over-parts network — dense heads + YOLO-style prior subnet.

The reference repo ships PoP-Net only as (a) its composite loss
(reference: lib/network/losses.py:237-309 pop_net_loss_fgweight), (b) the
dense-head twin rtpose_align3d (reference: lib/network/rtpose_align3d.py:260)
and (c) its prediction JSONs. This module realizes the full model those
artifacts describe:

- stem: ResPreprocessStem (stride 8, 128 ch) shared by all heads
- 2 stages x 3 dense branches: heatmap (K+1), z-map (K), 2D-align (2K),
  with stage-2 input = concat(stage-1 outputs, stem)
- prior subnet: conv tower on the stem -> maxpool to stride 16 -> head
  emitting A * (5 + 3K) anchor-pose channels with YOLO casting

saved_for_loss layout matches pop_net_loss exactly:
[heat1, z1, align1, heat2, z2, align2, prior]  (loss indexes 3j..3j+2, -1).

Output casting (design choice; the reference's dense twin returns raw convs):
heat sigmoid in (0,1); z and align (sigmoid-0.5)*4 in (-2,2) which covers
the normalized z range (-1.5, 1.5] and align range [-1, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from popnet_tpu.models.layers import ConvBN, CPMBranch, ResPreprocessStem, max_pool_2x2
from popnet_tpu.models.yolo_posenet import cast_prior_map


class PopNet(nn.Module):
    num_parts: int = 15
    num_stages: int = 2
    anchors: tuple[tuple[float, float], ...] = ((6.0, 3.0), (12.0, 6.0))
    pred_vis: bool = False  # RGB variant predicts per-joint visibility too
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = ResPreprocessStem(dtype=self.dtype, name="stem")(x, train)

        # --- prior subnet (anchor poses at stride 16) ---
        p = stem
        for i in range(3):
            p = ConvBN(256, 3, dtype=self.dtype, name=f"prior_tower{i}")(p, train)
        p = max_pool_2x2(p)
        p = ConvBN(256, 3, dtype=self.dtype, name="prior_head0")(p, train)
        p = ConvBN(128, 3, dtype=self.dtype, name="prior_head1")(p, train)
        n_joint_feats = 4 if self.pred_vis else 3
        n_out = len(self.anchors) * (5 + n_joint_feats * self.num_parts)
        p = nn.Conv(n_out, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01), name="prior_out")(p)
        prior = cast_prior_map(p, len(self.anchors), self.num_parts)

        # --- dense heads ---
        saved_for_loss = []
        inp = stem
        heat = z = align = None
        for i in range(1, self.num_stages + 1):
            if i == 1:
                heat = CPMBranch(((128, 3), (128, 3), (128, 3), (512, 1)),
                                 self.num_parts + 1, 1, self.dtype, norm=False,
                                 name=f"stage{i}_heat")(inp, train)
                z = CPMBranch(((64, 3), (32, 3), (32, 1)),
                              self.num_parts, 1, self.dtype,
                              name=f"stage{i}_z")(inp, train)
                align = CPMBranch(((256, 3), (256, 3), (256, 3), (128, 1)),
                                  2 * self.num_parts, 1, self.dtype,
                                  name=f"stage{i}_align")(inp, train)
            else:
                heat = CPMBranch(((128, 3),) * 5 + ((128, 1),),
                                 self.num_parts + 1, 1, self.dtype, norm=False,
                                 name=f"stage{i}_heat")(inp, train)
                z = CPMBranch(((128, 3), (64, 3), (32, 3), (32, 1)),
                              self.num_parts, 1, self.dtype,
                              name=f"stage{i}_z")(inp, train)
                align = CPMBranch(((128, 3), (256, 3), (256, 3), (256, 3), (128, 1)),
                                  2 * self.num_parts, 1, self.dtype,
                                  name=f"stage{i}_align")(inp, train)
            heat = nn.sigmoid(heat)
            z = (nn.sigmoid(z) - 0.5) * 4.0
            align = (nn.sigmoid(align) - 0.5) * 4.0
            saved_for_loss += [heat, z, align]
            inp = jnp.concatenate([heat, z, align, stem], axis=-1)

        saved_for_loss.append(prior)
        return (heat, z, align, prior), saved_for_loss


class PopNetRGB(nn.Module):
    """RGB PoP-Net variant: heat + align dense heads (no z) and a prior
    subnet emitting A * (5 + 3K) channels of (box, conf, K x x, K x y,
    K x visibility) — the head layout pop_net_rgb_loss trains
    (reference: lib/network/losses.py:468-539)."""

    num_parts: int = 16  # MPII
    num_stages: int = 2
    anchors: tuple[tuple[float, float], ...] = ((6.0, 3.0), (12.0, 6.0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = ResPreprocessStem(dtype=self.dtype, name="stem")(x, train)

        p = stem
        for i in range(3):
            p = ConvBN(256, 3, dtype=self.dtype, name=f"prior_tower{i}")(p, train)
        p = max_pool_2x2(p)
        p = ConvBN(256, 3, dtype=self.dtype, name="prior_head0")(p, train)
        p = ConvBN(128, 3, dtype=self.dtype, name="prior_head1")(p, train)
        n_out = len(self.anchors) * (5 + 3 * self.num_parts)
        p = nn.Conv(n_out, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01), name="prior_out")(p)
        prior = cast_prior_map(p, len(self.anchors), self.num_parts)

        saved_for_loss = []
        inp = stem
        heat = align = None
        for i in range(1, self.num_stages + 1):
            if i == 1:
                heat = CPMBranch(((128, 3), (128, 3), (128, 3), (512, 1)),
                                 self.num_parts + 1, 1, self.dtype, norm=False,
                                 name=f"stage{i}_heat")(inp, train)
                align = CPMBranch(((256, 3), (256, 3), (256, 3), (128, 1)),
                                  2 * self.num_parts, 1, self.dtype,
                                  name=f"stage{i}_align")(inp, train)
            else:
                heat = CPMBranch(((128, 3),) * 5 + ((128, 1),),
                                 self.num_parts + 1, 1, self.dtype, norm=False,
                                 name=f"stage{i}_heat")(inp, train)
                align = CPMBranch(((128, 3), (256, 3), (256, 3), (256, 3), (128, 1)),
                                  2 * self.num_parts, 1, self.dtype,
                                  name=f"stage{i}_align")(inp, train)
            heat = nn.sigmoid(heat)
            align = (nn.sigmoid(align) - 0.5) * 4.0
            saved_for_loss += [heat, align]
            inp = jnp.concatenate([heat, align, stem], axis=-1)

        saved_for_loss.append(prior)
        return (heat, align, prior), saved_for_loss
