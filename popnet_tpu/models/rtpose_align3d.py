"""Dense-head twin of PoP-Net: PAF + heatmap + depth + 2D-align branches.

Reference: lib/network/rtpose_align3d.py:260-407. Raw conv outputs (the
reference applies no casting in forward); stage 2's PAF branch uses 7x7
convs for limb-scale context.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from popnet_tpu.models.layers import CPMBranch, ResPreprocessStem


class RTPoseAlign3D(nn.Module):
    num_parts: int = 15
    num_limbs: int = 14
    num_stages: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = ResPreprocessStem(dtype=self.dtype, name="stem")(x, train)

        saved_for_loss = []
        inp = stem
        outs = None
        for i in range(1, self.num_stages + 1):
            if i == 1:
                paf = CPMBranch(((128, 3), (128, 3), (128, 3), (512, 1)),
                                2 * self.num_limbs, 1, self.dtype, norm=False,
                                name=f"stage{i}_paf")(inp, train)
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
                paf = CPMBranch(((128, 7),) * 5 + ((128, 1),),
                                2 * self.num_limbs, 1, self.dtype, norm=False,
                                name=f"stage{i}_paf")(inp, train)
                heat = CPMBranch(((128, 3),) * 5 + ((128, 1),),
                                 self.num_parts + 1, 1, self.dtype, norm=False,
                                 name=f"stage{i}_heat")(inp, train)
                z = CPMBranch(((128, 3), (64, 3), (32, 3), (32, 1)),
                              self.num_parts, 1, self.dtype,
                              name=f"stage{i}_z")(inp, train)
                align = CPMBranch(((128, 3), (256, 3), (256, 3), (256, 3), (128, 1)),
                                  2 * self.num_parts, 1, self.dtype,
                                  name=f"stage{i}_align")(inp, train)
            saved_for_loss += [paf, heat, z, align]
            outs = (paf, heat, z, align)
            inp = jnp.concatenate([paf, heat, z, align, stem], axis=-1)

        return outs, saved_for_loss
