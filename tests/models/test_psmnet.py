"""PSMNet end-to-end model tests (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.losses import make_loss_evaluator
from densematchingbenchmark_tpu.losses.builder import total_loss

B, H, W, MAXD = 1, 64, 64, 16


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = get_config(
        "PSMNet/scene_flow",
        **{"model.max_disp": MAXD,
           "model.cost_processor.cost_computation.max_disp": MAXD // 4,
           "model.cost_processor.cost_aggregator.max_disp": MAXD,
           "model.disp_predictor.max_disp": MAXD,
           "model.losses.l1_loss.max_disp": MAXD,
           # exercise the Pallas fused eval path (interpret mode on CPU)
           "model.eval.fused_upsample_argmin": True})
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    left = jnp.zeros((B, H, W, 3))
    variables = model.init(rng, left, left, train=False)
    return cfg, model, variables


def test_param_count_structure(model_and_vars):
    _, model, variables = model_and_vars
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree.leaves(variables["params"]))
    # reference PSMNet has 5.225M params at max_disp=192; the only
    # disp-dependent pieces are interpolations, so count must match closely
    assert 5.0e6 < n_params < 5.5e6, n_params


def test_eval_forward_shapes(model_and_vars):
    _, model, variables = model_and_vars
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    out = model.apply(variables, left, right, train=False)
    assert len(out["disps"]) == 3 and len(out["costs"]) == 3
    for d in out["disps"]:
        assert d.shape == (B, H, W, 1)
    for c in out["costs"]:
        # fused eval path: costs stay at aggregation resolution
        assert c.shape == (B, MAXD // 4, H // 4, W // 4)
    assert np.isfinite(np.asarray(out["disps"][0])).all()


def test_fused_eval_matches_unfused(model_and_vars):
    """Pallas-fused eval == XLA upsample+soft-argmin eval (same params)."""
    cfg, model, variables = model_and_vars
    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2["model"]["eval"]["fused_upsample_argmin"] = False
    from densematchingbenchmark_tpu.models import build_model
    model2 = build_model(cfg2)
    rng = np.random.RandomState(7)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    fused = model.apply(variables, left, right, train=False)
    plain = model2.apply(variables, left, right, train=False)
    np.testing.assert_allclose(np.asarray(fused["disps"][0]),
                               np.asarray(plain["disps"][0]), atol=1e-3)


def test_train_step_decreases_loss(model_and_vars):
    cfg, model, variables = model_and_vars
    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(B, H, W, 1) * (MAXD - 2) + 1, jnp.float32)
    evaluator = make_loss_evaluator(cfg["model"]["losses"],
                                    sparse=cfg["data"]["sparse"])

    @jax.jit
    def step(params, batch_stats):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                left, right, train=True, mutable=["batch_stats"])
            ld = evaluator(out["disps"], out["costs"], gt)
            return total_loss(ld), (ld, updates["batch_stats"])
        (loss, (ld, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params = jax.tree.map(lambda p, g: p - 1e-4 * g, params, grads)
        return loss, ld, new_params, bs

    params, bs = variables["params"], variables["batch_stats"]
    loss0, ld, params, bs = step(params, bs)
    assert np.isfinite(float(loss0))
    assert set(ld) == {"l1_loss_lvl0", "l1_loss_lvl1", "l1_loss_lvl2"}
    losses = [float(loss0)]
    for _ in range(4):
        loss, _, params, bs = step(params, bs)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses  # sgd on one batch must descend
