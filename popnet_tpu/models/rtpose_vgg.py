"""Original 6-stage VGG19 CPM for COCO RGB (the rtpose baseline).

Reference: lib/network/rtpose_vgg.py:59-250. VGG19 conv1_1..conv4_2 trunk +
two CPM convs (stride 8, 128 ch), then 6 stages x 2 branches (PAF 38ch,
heatmap 19ch); stage>=2 input = concat(paf, heat, features) = 185 ch with
7x7 convs. All convs are conv+ReLU (no BN).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from popnet_tpu.models.layers import CPMBranch


class VGG19Trunk(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(x, feats, name):
            x = nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype, name=name,
                        kernel_init=nn.initializers.normal(0.01))(x)
            return nn.relu(x)

        x = conv(x, 64, "conv1_1")
        x = conv(x, 64, "conv1_2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, 128, "conv2_1")
        x = conv(x, 128, "conv2_2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(1, 5):
            x = conv(x, 256, f"conv3_{i}")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, 512, "conv4_1")
        x = conv(x, 512, "conv4_2")
        x = conv(x, 256, "conv4_3_CPM")
        x = conv(x, 128, "conv4_4_CPM")
        return x


class RTPoseVGG(nn.Module):
    num_parts: int = 18   # COCO
    num_limbs: int = 19
    num_stages: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = VGG19Trunk(dtype=self.dtype, name="trunk")(x, train)
        saved_for_loss = []
        inp = feat
        paf = heat = None
        for i in range(1, self.num_stages + 1):
            if i == 1:
                spec = ((128, 3), (128, 3), (128, 3), (512, 1))
            else:
                spec = ((128, 7),) * 5 + ((128, 1),)
            paf = CPMBranch(spec, 2 * self.num_limbs, 1, self.dtype,
                            act="relu", norm=False, name=f"stage{i}_paf")(inp, train)
            heat = CPMBranch(spec, self.num_parts + 1, 1, self.dtype,
                             act="relu", norm=False, name=f"stage{i}_heat")(inp, train)
            saved_for_loss += [paf, heat]
            inp = jnp.concatenate([paf, heat, feat], axis=-1)
        return (paf, heat), saved_for_loss
