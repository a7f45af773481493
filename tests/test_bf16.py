"""bfloat16 compute-path sanity: forward + train step stay finite and learn."""

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.models import PopNet, YoloPoseNet
from popnet_tpu.train.state import create_train_state
from popnet_tpu.train.steps import make_yolo_train_step
from tests.test_train_step import make_batch


def test_popnet_bf16_forward_finite():
    model = PopNet(dtype=jnp.bfloat16)
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    # params stay float32 (flax param_dtype default); compute runs bf16
    assert v["params"]["stage1_heat"]["Conv_0"]["kernel"].dtype == jnp.float32
    (heat, z, align, prior), _ = model.apply(v, x, train=False)
    for o in (heat, z, align, prior):
        assert np.isfinite(np.asarray(o, dtype=np.float32)).all()


def test_yolo_bf16_training_learns():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch=8)
    batch = {k: batch[k] for k in
             ["image", "prior_map", "prior_mask_conf", "prior_mask_coord", "prior_weight_map"]}
    state = create_train_state(
        YoloPoseNet(dtype=jnp.bfloat16), jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1)), learning_rate=0.02,
    )
    step = jax.jit(make_yolo_train_step())
    losses = []
    for _ in range(5):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
