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


class MobileNetTrunk(nn.Module):
    """MobileNet-style trunk per the reference's `use_mobilenet` block0
    config (reference: rtpose_vgg.py:84-91): conv_bn(32, s2) then four
    depthwise-separable blocks (64/s1, 128/s2, 128/s1, 256/s2), then the
    two CPM reduction convs to 128 ch at stride 8.

    NOTE: the reference ships this CONFIG but its builder never constructs
    block0 for the mobilenet branch (rtpose_vgg.py:130-133 builds block0
    only for vgg19), so the torch path crashes if selected; this is the
    working realization of that intent with standard MobileNet-v1
    conv_dw semantics (dw3x3+BN+ReLU, pw1x1+BN+ReLU).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn_relu(x):
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            return nn.relu(x)

        def conv_bn(x, feats, stride):
            x = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype)(x)
            return bn_relu(x)

        def conv_dw(x, feats, stride):
            c = x.shape[-1]
            x = nn.Conv(c, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), feature_group_count=c,
                        use_bias=False, dtype=self.dtype)(x)
            x = bn_relu(x)
            x = nn.Conv(feats, (1, 1), use_bias=False, dtype=self.dtype)(x)
            return bn_relu(x)

        x = conv_bn(x, 32, 2)
        x = conv_dw(x, 64, 1)
        x = conv_dw(x, 128, 2)
        x = conv_dw(x, 128, 1)
        x = conv_dw(x, 256, 2)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv4_3_CPM")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv4_4_CPM")(x)
        return nn.relu(x)


class RTPoseVGG(nn.Module):
    num_parts: int = 18   # COCO
    num_limbs: int = 19
    num_stages: int = 6
    trunk: str = "vgg19"  # "vgg19" | "mobilenet" (reference get_model(trunk))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk_cls = {"vgg19": VGG19Trunk, "mobilenet": MobileNetTrunk}[self.trunk]
        feat = trunk_cls(dtype=self.dtype, name="trunk")(x, train)
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
