"""Regression: bf16-compute training grads work for deconv-using models.

Guards the ConvTransposeExact dtype rule (a f32 preferred_element_type
output against bf16 kernels breaks the conv transpose rule under grad).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.losses import make_loss_evaluator
from densematchingbenchmark_tpu.losses.builder import total_loss

CASES = {
    "PSMNet/scene_flow": {
        "model.cost_processor.cost_computation.max_disp": 8},
    "GCNet/scene_flow": {
        "model.cost_processor.cost_computation.max_disp": 16},
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_bf16_train_grad(name):
    cfg = get_config(name, **{
        "model.max_disp": 32, "model.dtype": "bfloat16",
        "model.disp_predictor.max_disp": 32,
        "model.losses.l1_loss.max_disp": 32,
        "model.cost_processor.cost_aggregator.max_disp": 32,
        **CASES[name]})
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 64, 64, 1) * 30 + 1, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, left, train=False)
    evaluator = make_loss_evaluator(cfg["model"]["losses"], sparse=False)

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            left, left, train=True, mutable=["batch_stats"])
        return total_loss(evaluator(o["disps"], o["costs"], gt))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    # params stay f32 (master weights), grads f32 and finite
    for g in jax.tree.leaves(grads):
        assert g.dtype == jnp.float32
        assert np.isfinite(np.asarray(g)).all()
