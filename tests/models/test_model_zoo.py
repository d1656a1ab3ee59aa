"""Build + forward + grad smoke tests across the model zoo (tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.losses import make_loss_evaluator
from densematchingbenchmark_tpu.losses.builder import total_loss


def scaled(name, maxd, **extra):
    over = {"model.max_disp": maxd,
            "model.disp_predictor.max_disp": maxd,
            "model.losses.l1_loss.max_disp": maxd,
            "model.cost_processor.cost_aggregator.max_disp": maxd}
    over.update(extra)
    return get_config(name, **over)


CASES = {
    "GCNet/scene_flow": lambda: scaled(
        "GCNet/scene_flow", 32,
        **{"model.cost_processor.cost_computation.max_disp": 16}),
    "StereoNet/scene_flow_8x_2stage": lambda: scaled(
        "StereoNet/scene_flow_8x_2stage", 32,
        **{"model.cost_processor.cost_computation.max_disp": 4,
           "model.disp_predictor.max_disp": 4}),
}

EXPECTED_DISPS = {"GCNet/scene_flow": 1,
                  "StereoNet/scene_flow_8x_2stage": 2}

# reference param counts: GCNet ~2.84M (not published; sanity range),
# StereoNet-2stage 399.066K (BASELINE.md)
PARAM_RANGE = {"GCNet/scene_flow": (1e6, 6e6),
               "StereoNet/scene_flow_8x_2stage": (0.35e6, 0.45e6)}


@pytest.mark.parametrize("name", list(CASES))
def test_build_forward_backward(name):
    cfg = CASES[name]()
    model = build_model(cfg)
    b, h, w = 1, 64, 64
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    lo, hi = PARAM_RANGE[name]
    assert lo < n_params < hi, f"{name}: {n_params}"

    out = model.apply(variables, left, right, train=False)
    assert len(out["disps"]) == EXPECTED_DISPS[name]
    assert out["disps"][0].shape == (b, h, w, 1)
    assert np.isfinite(np.asarray(out["disps"][0])).all()

    gt = jnp.asarray(rng.rand(b, h, w, 1) * 20 + 1, jnp.float32)
    evaluator = make_loss_evaluator(cfg["model"]["losses"],
                                    sparse=cfg["data"]["sparse"])

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"])
        return total_loss(evaluator(o["disps"], o["costs"], gt))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
