"""Flow model family: warp/correlation/soft-argmax golden numerics,
PWCFlow forward contract, multi-scale loss, and a tiny overfit run.

The reference registers zero flow models
(dmb/modeling/flow/models/__init__.py:2-4); everything here exceeds its
capability, so the tests are golden-numeric against hand computations
rather than cross-framework parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.flow.losses import (flow_l1_loss,
                                                    _rescale_gt_flow)
from densematchingbenchmark_tpu.flow.models import PWCFlow, build_flow_model
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.ops.cost_volume import correlation2d_volume
from densematchingbenchmark_tpu.ops.soft_argmin import soft_argmax_2d
from densematchingbenchmark_tpu.ops.warp import flow_warp


def test_flow_warp_integer_shift():
    rng = np.random.RandomState(0)
    img = rng.randn(1, 5, 7, 3).astype(np.float32)
    flow = np.zeros((1, 5, 7, 2), np.float32)
    flow[..., 0] = 2.0   # u: sample from x+2
    flow[..., 1] = -1.0  # v: sample from y-1
    out = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
    expect = np.zeros_like(img)
    expect[:, 1:, :-2] = img[:, :-1, 2:]
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_flow_warp_subpixel_and_grad():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    flow = jnp.full((1, 4, 4, 2), 0.5, jnp.float32)
    out = flow_warp(img, flow)
    # interior pixel: average of the 4 neighbors at (+0.5, +0.5)
    expect = 0.25 * (img[0, 1, 1] + img[0, 1, 2] + img[0, 2, 1]
                     + img[0, 2, 2])
    np.testing.assert_allclose(np.asarray(out[0, 1, 1]), np.asarray(expect),
                               atol=1e-6)
    g = jax.grad(lambda f: jnp.sum(flow_warp(img, f) ** 2))(flow)
    assert np.all(np.isfinite(np.asarray(g)))


def test_correlation2d_golden():
    rng = np.random.RandomState(2)
    ref = rng.randn(1, 4, 5, 3).astype(np.float32)
    tgt = rng.randn(1, 4, 5, 3).astype(np.float32)
    r = 1
    out = np.asarray(correlation2d_volume(jnp.asarray(ref), jnp.asarray(tgt),
                                          radius=r))
    assert out.shape == (1, 4, 5, 9)
    for y in range(4):
        for x in range(5):
            k = 0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < 4 and 0 <= xx < 5:
                        expect = np.mean(ref[0, y, x] * tgt[0, yy, xx])
                    else:
                        expect = 0.0
                    np.testing.assert_allclose(out[0, y, x, k], expect,
                                               atol=1e-5)
                    k += 1


def test_soft_argmax_2d_peaked():
    r = 2
    n = 2 * r + 1
    score = np.full((1, 1, 1, n * n), -50.0, np.float32)
    # peak at dy=+1, dx=-2 (row-major: k = (dy+r)*n + (dx+r))
    score[0, 0, 0, (1 + r) * n + (-2 + r)] = 50.0
    out = np.asarray(soft_argmax_2d(jnp.asarray(score), radius=r))
    np.testing.assert_allclose(out[0, 0, 0], [-2.0, 1.0], atol=1e-4)


def test_rescale_gt_flow_scales_values():
    gt = np.ones((1, 8, 8, 2), np.float32) * 4.0
    out = np.asarray(_rescale_gt_flow(jnp.asarray(gt), 4, 4))
    np.testing.assert_allclose(out, 2.0)


def test_pwcflow_forward_contract():
    cfg = get_config("PWCFlow/flying_chairs")
    model = build_model(cfg)
    assert isinstance(model, PWCFlow)
    b, h, w = 1, 64, 96
    ref = jnp.zeros((b, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ref, ref, train=False)
    out = model.apply(variables, ref, ref, train=False)
    flows = out["flows"]
    assert len(flows) == 5  # full-res + 4 pyramid levels, best first
    assert flows[0].shape == (b, h, w, 2)
    assert flows[1].shape == (b, h // 2, w // 2, 2)
    assert flows[-1].shape == (b, h // 16, w // 16, 2)
    assert all(np.all(np.isfinite(np.asarray(f))) for f in flows)


def test_flow_loss_masks_nan():
    flows = [jnp.zeros((1, 4, 4, 2), jnp.float32)]
    gt = np.ones((1, 4, 4, 2), np.float32)
    gt[0, 0, 0] = np.nan
    losses = flow_l1_loss(flows, jnp.asarray(gt), weights=(1.0,))
    loss = float(losses["flow_loss_lvl0"])
    np.testing.assert_allclose(loss, np.sqrt(2.0), atol=1e-3)


def test_pwcflow_overfits_constant_shift():
    """Few gradient steps on a constant-translation pair reduce the loss."""
    cfg = get_config("PWCFlow/flying_chairs",
                     **{"model.chans": (8, 16), "model.radius": 2,
                        "model.hidden": 16})
    model = build_flow_model(cfg)
    rng = np.random.RandomState(3)
    base = rng.rand(1, 36, 36, 3).astype(np.float32)
    ref = jnp.asarray(base[:, 2:34, 2:34])
    tgt = jnp.asarray(base[:, 2:34, 0:32])  # content shifted: u = -2
    gt = jnp.full((1, 32, 32, 2), 0.0, jnp.float32).at[..., 0].set(-2.0)
    variables = model.init(jax.random.PRNGKey(0), ref, tgt, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    weights = (1.0, 1.0, 0.5)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, ref, tgt,
                train=True, mutable=["batch_stats"])
            losses = flow_l1_loss(out["flows"], gt, weights)
            return sum(losses.values()), mut["batch_stats"]
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    first = None
    for i in range(12):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))


def test_train_flow_driver_end_to_end(tmp_path):
    """train_flow: synthetic flow data -> train steps + per-epoch eval +
    vis dumps + checkpoint (the flow analog of the stereo trainer test;
    no reference counterpart — its flow registry is empty)."""
    import os
    import glob
    import jax
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.flow.trainer import train_flow
    from densematchingbenchmark_tpu.flow.datasets import SyntheticFlowDataset
    from densematchingbenchmark_tpu.flow import transforms as ftrans
    from densematchingbenchmark_tpu.parallel import make_mesh

    cfg = get_config("PWCFlow/flying_chairs",
                     **{"data.batch_size_per_device": 1,
                        "total_epochs": 1})
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    train_ds = SyntheticFlowDataset(
        length=4, height=64, width=96,
        transform=ftrans.make_train_transform((64, 96), mean, std))
    eval_ds = SyntheticFlowDataset(
        length=2, height=64, width=96,
        transform=ftrans.make_eval_transform((64, 96), mean, std))
    work = str(tmp_path / "flow_work")
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    state = train_flow(cfg, work, train_dataset=train_ds,
                       eval_dataset=eval_ds, vis_dataset=eval_ds,
                       max_steps=2, mesh=mesh, log_interval=1)
    assert int(state.step) == 2
    import json
    with open(os.path.join(work, "metrics.log.json")) as fp:
        records = [json.loads(l) for l in fp]
    assert any("eval/epe" in r for r in records)
    pngs = glob.glob(os.path.join(work, "vis", "sample_*", "flow_0_*.png"))
    assert pngs, "flow vis hook produced no images"
