"""2D-only light CPM (PAF + heatmap), the ablation baseline.

Reference: lib/network/rtpose_light.py:248-353. Stage 1 branches are
[128x3 conv3, 512 conv1] -> out; stage 2 uses 7x7 convs. No output casting
in the reference forward; raw conv outputs are returned.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from popnet_tpu.models.layers import CPMBranch, ResPreprocessStem


class RTPoseLight(nn.Module):
    num_parts: int = 15
    num_limbs: int = 14
    num_stages: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem = ResPreprocessStem(dtype=self.dtype, name="stem")(x, train)

        saved_for_loss = []
        inp = stem
        paf = heat = None
        for i in range(1, self.num_stages + 1):
            if i == 1:
                spec = ((128, 3), (128, 3), (128, 3), (512, 1))
            else:
                spec = ((128, 7),) * 5 + ((128, 1),)
            # reference rtpose_light stages are conv + ReLU with no BN
            paf = CPMBranch(spec=spec, out_features=2 * self.num_limbs, out_kernel=1,
                            act="relu", norm=False,
                            dtype=self.dtype, name=f"stage{i}_paf")(inp, train)
            heat = CPMBranch(spec=spec, out_features=self.num_parts + 1, out_kernel=1,
                             act="relu", norm=False,
                             dtype=self.dtype, name=f"stage{i}_heat")(inp, train)
            saved_for_loss += [paf, heat]
            inp = jnp.concatenate([paf, heat, stem], axis=-1)

        return (paf, heat), saved_for_loss
