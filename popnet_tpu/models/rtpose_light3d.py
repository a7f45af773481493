"""Open-Pose+ : light 2-stage CPM with PAF, heatmap, and Z branches.

TPU-native (NHWC Flax) re-design of the reference architecture
(reference: lib/network/rtpose_light3d.py:249-363):

- stem: ResPreprocessStem (stride 8, 128 ch)
- per stage, three branches:
    paf:      [256x3 conv3, 128 conv1] -> 2*L
    heatmap:  [128x4 conv3]            -> K+1 (conv3 out)
    z:        [128, 64x3 conv3]        -> L+1 (conv3 out)
- stage 2 input = concat(stage-1 paf, heat, z, stem features)
- output casting: paf & z (sigmoid - 0.5) * 4, heatmap sigmoid

Returns ((paf, heat, z), saved_for_loss) where saved_for_loss is
[paf1, heat1, z1, paf2, heat2, z2] after casting, matching the loss
contract (reference: lib/network/losses.py:65-106).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from popnet_tpu.models.layers import CPMBranch, ResPreprocessStem


class RTPoseLight3D(nn.Module):
    num_parts: int = 15
    num_limbs: int = 14
    num_stages: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = ResPreprocessStem(dtype=self.dtype, name="stem")(x, train)

        def stage(inp, idx):
            paf = CPMBranch(
                spec=((256, 3), (256, 3), (256, 3), (128, 1)),
                out_features=2 * self.num_limbs, out_kernel=1,
                dtype=self.dtype, name=f"stage{idx}_paf",
            )(inp, train)
            heat = CPMBranch(
                spec=((128, 3),) * 4,
                out_features=self.num_parts + 1, out_kernel=3,
                dtype=self.dtype, name=f"stage{idx}_heat",
            )(inp, train)
            z = CPMBranch(
                spec=((128, 3), (64, 3), (64, 3), (64, 3)),
                out_features=self.num_limbs + 1, out_kernel=3,
                dtype=self.dtype, name=f"stage{idx}_z",
            )(inp, train)
            paf = (nn.sigmoid(paf) - 0.5) * 4.0
            heat = nn.sigmoid(heat)
            z = (nn.sigmoid(z) - 0.5) * 4.0
            return paf, heat, z

        saved_for_loss = []
        inp = stem
        paf = heat = z = None
        for i in range(1, self.num_stages + 1):
            paf, heat, z = stage(inp, i)
            saved_for_loss += [paf, heat, z]
            inp = jnp.concatenate([paf, heat, z, stem], axis=-1)

        return (paf, heat, z), saved_for_loss
