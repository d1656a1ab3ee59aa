"""DeepPruner tests: PatchMatch ops + full 2-stage model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.ops.patch_match import (
    patch_match, uniform_sample, adjust_sample_range)
from densematchingbenchmark_tpu.configs import get_config
from densematchingbenchmark_tpu.models import build_model
from densematchingbenchmark_tpu.losses import make_loss_evaluator
from densematchingbenchmark_tpu.losses.builder import total_loss


def test_uniform_sampler():
    lo = np.full((1, 2, 3, 1), 4.0, np.float32)
    hi = np.full((1, 2, 3, 1), 12.0, np.float32)
    s = np.asarray(uniform_sample(lo, hi, disparity_sample_number=9))
    assert s.shape == (1, 9, 2, 3)
    np.testing.assert_allclose(s[0, 0], 4.0)
    np.testing.assert_allclose(s[0, -1], 12.0)
    np.testing.assert_allclose(np.diff(s[0, :, 0, 0]), 1.0, atol=1e-5)


def test_adjust_sample_range_stretches_small_ranges():
    lo = np.full((1, 2, 2, 1), 10.0, np.float32)
    hi = np.full((1, 2, 2, 1), 12.0, np.float32)  # range 2 < 9 samples
    nlo, nhi = adjust_sample_range(lo, hi, 9, 48)
    assert float((nhi - nlo)[0, 0, 0, 0]) >= 9.0 - 1e-4
    # wide ranges are untouched
    hi2 = np.full((1, 2, 2, 1), 40.0, np.float32)
    nlo2, nhi2 = adjust_sample_range(lo, hi2, 9, 48)
    np.testing.assert_allclose(np.asarray(nlo2), 10.0)
    np.testing.assert_allclose(np.asarray(nhi2), 40.0)


def test_patch_match_finds_true_disparity():
    """PatchMatch samples should concentrate near the true disparity."""
    rng = np.random.RandomState(0)
    TRUE_D, MAXD = 6, 16
    left = rng.randn(1, 16, 48, 32).astype(np.float32)
    right = np.roll(left, -TRUE_D, axis=2)
    lo = np.zeros((1, 16, 48, 1), np.float32)
    hi = lo + MAXD
    samples = np.asarray(patch_match(
        jnp.asarray(left), jnp.asarray(right), lo, hi,
        jax.random.PRNGKey(0), disparity_sample_number=14, iterations=3))
    assert samples.shape == (1, 14, 16, 48)
    assert np.isfinite(samples).all()
    # min/max endpoints preserved
    np.testing.assert_allclose(samples[:, 0], 0.0)
    np.testing.assert_allclose(samples[:, -1], MAXD)
    # the best sample per pixel lands near the true disparity (interior)
    interior = samples[0, 1:-1, :, TRUE_D:48 - TRUE_D]
    best = np.abs(interior - TRUE_D).min(axis=0)
    assert np.median(best) < 1.0


def test_patch_match_corr_path_matches_warp_path():
    """static_search_range scoring (precomputed integer-shift correlation +
    1-D interp) must equal the feature-warp scoring exactly — the dot
    product is linear in the warped operand (ops/patch_match.py
    _integer_shift_corr)."""
    rng = np.random.RandomState(2)
    MAXD = 12
    left = rng.randn(2, 12, 40, 16).astype(np.float32)
    right = rng.randn(2, 12, 40, 16).astype(np.float32)
    lo = np.zeros((2, 12, 40, 1), np.float32)
    hi = lo + MAXD
    kwargs = dict(disparity_sample_number=10, iterations=2, temperature=7.0)
    s_warp = np.asarray(patch_match(
        jnp.asarray(left), jnp.asarray(right), lo, hi,
        jax.random.PRNGKey(3), **kwargs))
    s_corr = np.asarray(patch_match(
        jnp.asarray(left), jnp.asarray(right), lo, hi,
        jax.random.PRNGKey(3), static_search_range=MAXD, **kwargs))
    np.testing.assert_allclose(s_corr, s_warp, rtol=1e-4, atol=1e-4)


def test_patch_match_is_differentiable():
    rng = np.random.RandomState(1)
    left = rng.randn(1, 8, 16, 8).astype(np.float32)
    right = np.roll(left, -2, axis=2)
    lo = np.zeros((1, 8, 16, 1), np.float32)

    def f(l):
        s = patch_match(l, jnp.asarray(right), lo, lo + 8,
                        jax.random.PRNGKey(0), 6, iterations=1)
        return jnp.sum(s ** 2)

    g = jax.grad(f)(jnp.asarray(left))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("name,scale", [("DeepPruner/scene_flow_4x", 4),
                                        ("DeepPruner/scene_flow_8x", 8)])
def test_deeppruner_model(name, scale):
    MAXD = 32
    cfg = get_config(name, **{
        "model.max_disp": MAXD,
        "model.disp_sampler.max_disp": MAXD // scale,
        "model.disp_sampler.iterations": 1,
        "model.losses.l1_loss.max_disp": MAXD,
        "model.losses.quantile_loss.max_disp": MAXD})
    model = build_model(cfg)
    # H/scale must be divisible by 8 for the HW-hourglass
    B, H, W = 1, 64, 64
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # reference: Best 7.390M, Fast 7.470M (BASELINE.md)
    assert 6.5e6 < n_params < 8.5e6, n_params

    out = model.apply(variables, left, right, train=False)
    n_refine = cfg["model"]["disp_refinement"]["num"]
    assert len(out["disps"]) == n_refine + 1 + 2  # stages + min + max
    for d in out["disps"]:
        assert d.shape == (B, H, W, 1)
        assert np.isfinite(np.asarray(d)).all()

    if scale == 8:
        # grad path covered by the 4x case; a second full backward compile
        # of the twin HW-hourglass graph costs ~2 min of CPU compile time
        return

    gt = jnp.asarray(rng.rand(B, H, W, 1) * (MAXD - 2) + 1, jnp.float32)
    evaluator = make_loss_evaluator(cfg["model"]["losses"], sparse=False)

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"],
            rngs={"patch_match": jax.random.PRNGKey(1)})
        ld = evaluator(o["disps"], None, gt,
                       min_disparity=o["min_disparity"],
                       max_disparity=o["max_disparity"])
        return total_loss(ld), ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert "quantile_loss" in ld
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
