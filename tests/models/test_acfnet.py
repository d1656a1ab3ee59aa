"""AcfNet tests: uniform (fixed variance) and adaptive (cmn) paths."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.losses import make_loss_evaluator
from densematchingbenchmark_tpu.losses.builder import total_loss

MAXD = 16
B, H, W = 1, 64, 64


def cfg_for(name):
    over = {"model.max_disp": MAXD,
            "model.cost_processor.cost_computation.max_disp": MAXD // 4,
            "model.cost_processor.cost_aggregator.max_disp": MAXD,
            "model.disp_predictor.max_disp": MAXD,
            "model.losses.l1_loss.max_disp": MAXD,
            "model.losses.focal_loss.max_disp": MAXD}
    cfg = get_config(name, **over)
    if "cmn" in cfg["model"]:
        cfg["model"]["cmn"]["in_planes"] = MAXD
        cfg["model"]["cmn"]["losses"]["nll_loss"]["max_disp"] = MAXD
    return cfg


def _data():
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(B, H, W, 1) * (MAXD - 2) + 1, jnp.float32)
    return left, right, gt


def test_acfnet_uniform_train_loss():
    cfg = cfg_for("AcfNet/scene_flow_uniform")
    model = build_model(cfg)
    left, right, gt = _data()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    evaluator = make_loss_evaluator(cfg["model"]["losses"], sparse=False)
    out, _ = model.apply(variables, left, right, train=True,
                         mutable=["batch_stats"])
    assert "confs" not in out
    ld = evaluator(out["disps"], out["costs"], gt)
    assert any(k.startswith("stereo_focal_loss") for k in ld)
    assert any(k.startswith("l1_loss") for k in ld)
    assert np.isfinite(float(total_loss(ld)))


def test_acfnet_adaptive_cmn_variance_and_losses():
    cfg = cfg_for("AcfNet/scene_flow_adaptive")
    model = build_model(cfg)
    left, right, gt = _data()
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    evaluator = make_loss_evaluator(
        cfg["model"]["losses"], sparse=False,
        cmn_losses_cfg=cfg["model"]["cmn"]["losses"])

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"])
        # variance maps from the confidence heads, one per cost volume
        assert len(out["variances"]) == 3
        assert out["variances"][0].shape == (B, H, W, 1)
        ld = evaluator(out["disps"], out["costs"], gt,
                       variance=out["variances"])
        ld.update(evaluator.cmn_loss(out["conf_costs"], gt))
        return total_loss(ld), ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert any(k.startswith("conf_loss") for k in ld)
    assert np.isfinite(float(loss))
    # confidence head grads flow
    cmn_grads = jax.tree.leaves(grads["cmn"])
    assert sum(float(jnp.abs(g).sum()) for g in cmn_grads) > 0

    # eval mode returns confidences in [0, 1]
    out = model.apply(variables, left, right, train=False)
    assert len(out["confs"]) == 3
    c = np.asarray(out["confs"][0])
    assert (c >= 0).all() and (c <= 1).all()
    # variance = alpha*(1-conf)+beta in [beta, alpha+beta] = [1, 2]
    v = np.asarray(out["variances"][0])
    assert (v >= 1.0 - 1e-5).all() and (v <= 2.0 + 1e-5).all()
