"""Shared building blocks for the depth-pose CNNs (Flax, NHWC).

TPU notes: all convs run in NHWC so XLA tiles channels onto the 128-wide
lanes; BatchNorm keeps float32 statistics while activations may be bfloat16.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv -> [BatchNorm] -> activation. The reference CPM variants differ
    here: rtpose_light3d uses conv+BN+LeakyReLU(0.1); rtpose_light uses
    conv+ReLU (no BN); rtpose_align3d normalizes only its z/align branches
    (reference: rtpose_light3d.py / rtpose_light.py / rtpose_align3d.py
    make_stages)."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "leaky_relu"  # "leaky_relu" | "relu" | "none"
    norm: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME" if self.kernel > 1 else "VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act == "leaky_relu":
            x = nn.leaky_relu(x, negative_slope=0.1)
        elif self.act == "relu":
            x = nn.relu(x)
        return x


class CPMBranch(nn.Module):
    """A CPM prediction branch: N x (conv+BN+LeakyReLU) then a bare conv.

    `spec` is a sequence of (features, kernel) for the hidden convs; the final
    conv has `out_features` channels and `out_kernel` size with no norm/act
    (reference: rtpose_light3d.py make_stages — the last layer is conv only).
    """

    spec: Sequence[tuple[int, int]]
    out_features: int
    out_kernel: int = 1
    dtype: jnp.dtype = jnp.float32
    act: str = "leaky_relu"
    norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats, k in self.spec:
            x = ConvBN(feats, k, act=self.act, norm=self.norm, dtype=self.dtype)(x, train)
        x = nn.Conv(
            self.out_features,
            (self.out_kernel, self.out_kernel),
            padding="SAME" if self.out_kernel > 1 else "VALID",
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        return x


class BasicBlock(nn.Module):
    """torchvision-style residual BasicBlock (3x3-BN-ReLU-3x3-BN + skip)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # explicit (1, 1) pad: torch-symmetric at stride 2, where TF-SAME
        # would pad (0, 1) and shift the grid (weight-import parity)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(),
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal(),
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.kaiming_normal(),
            )(x)
            identity = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """torchvision-style residual Bottleneck (1x1 -> 3x3 -> 1x1 x4)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = self.features * self.expansion
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.kaiming_normal())(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.kaiming_normal())(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.kaiming_normal())(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_features:
            identity = nn.Conv(out_features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=nn.initializers.kaiming_normal())(x)
            identity = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(identity)
        return nn.relu(y + identity)


def avg_pool_3x3_s2(x):
    """3x3 stride-2 average pool with pad 1 (reference: ResPreprocessNet
    avgpool1/2). Matches torch's count_include_pad=True zero padding."""
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


def max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class ResPreprocessStem(nn.Module):
    """Depth-image stem: 7x7/2 conv -> BasicBlock x2 @64 -> avgpool/2 ->
    BasicBlock @128 -> 1x1 conv -> avgpool/2  => stride 8, 128 channels
    (reference: rtpose_light3d.py:124-219 ResPreprocessNet(BasicBlock, [2,1]))."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pad (3, 3): torch-symmetric for the stride-2 stem (TF-SAME pads 2/3)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = BasicBlock(64, dtype=self.dtype)(x, train)
        x = BasicBlock(64, dtype=self.dtype)(x, train)
        x = avg_pool_3x3_s2(x)
        x = BasicBlock(128, dtype=self.dtype)(x, train)
        x = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.kaiming_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = avg_pool_3x3_s2(x)
        return x


class ResNet34Stem(nn.Module):
    """ResNet-34 layer1-2 stem at stride 8, 128 channels
    (reference: yolo_posenet.py:26-56 ResNetBackBone)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pad (3, 3): torch-symmetric for the stride-2 stem (TF-SAME pads 2/3)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for _ in range(3):  # resnet34 layer1
            x = BasicBlock(64, dtype=self.dtype)(x, train)
        x = BasicBlock(128, stride=2, dtype=self.dtype)(x, train)  # layer2
        for _ in range(3):
            x = BasicBlock(128, dtype=self.dtype)(x, train)
        return x
