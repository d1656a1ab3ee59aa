"""GCNet phase-form cost head + phase-space soft-argmin parity.

The phase pipeline (ops/conv3d.conv3d_transpose_s2_c1_phase_form ->
ops/soft_argmin.phase_soft_argmin) must equal the direct pipeline
(materialized ConvTranspose3d volume -> soft_argmin) exactly: it is a
reassociation, not an approximation. Parity target: reference
aggregators/GCNet.py:7-120 layer 37 + faster_soft_argmin.py:6-89.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.ops.conv3d import (
    conv3d_transpose_s2_c1_phase, conv3d_transpose_s2_c1_phase_form,
    phase_cost_to_volume, pack_volume)
from densematchingbenchmark_tpu.ops.soft_argmin import (phase_soft_argmin,
                                                        soft_argmin)


def _inputs(ci=6, d=8, h=6, w=10, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, d, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, 1) * 0.2, jnp.float32)
    return x, k


@pytest.mark.parametrize("pack,out_blocks", [(1, 1), (2, 1), (4, 1),
                                             (1, 4), (2, 2), (2, 4)])
def test_phase_form_matches_pixel_shuffled_head(pack, out_blocks):
    x, k = _inputs()
    ref = conv3d_transpose_s2_c1_phase(x, k)          # [B, 2D, 2H, 2W]
    xin = pack_volume(x, pack) if pack > 1 else x
    yp = conv3d_transpose_s2_c1_phase_form(xin, k, pack=pack,
                                           out_blocks=out_blocks)
    eff = pack * out_blocks
    assert yp.shape == (2, x.shape[1] // eff, 6, 10, eff * 8)
    vol = phase_cost_to_volume(yp, pack=eff)
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pack", [1, 2])
@pytest.mark.parametrize("normalize", [True, False])
def test_phase_soft_argmin_matches_volume_argmin(pack, normalize):
    rng = np.random.RandomState(1)
    b, dq, h, w = 2, 4, 5, 7
    yp = jnp.asarray(rng.randn(b, dq, h, w, pack * 8), jnp.float32)
    vol = phase_cost_to_volume(yp, pack=pack)         # [B, D, 2H, 2W]
    want = soft_argmin(vol, max_disp=2 * dq * pack, alpha=1.3,
                       normalize=normalize)
    got = phase_soft_argmin(yp, pack=pack, alpha=1.3, normalize=normalize)
    assert got.shape == want.shape == (b, 2 * h, 2 * w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gcnet_model_phase_argmin_parity():
    """Whole-model: GCNet with phase_argmin on vs off, identical weights."""
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    tiny = {"model.max_disp": 32, "model.dtype": "float32",
            "model.cost_processor.cost_computation.max_disp": 16,
            "model.cost_processor.cost_aggregator.max_disp": 32,
            "model.disp_predictor.max_disp": 32,
            "model.losses.l1_loss.max_disp": 32}
    on = build_model(get_config(
        "GCNet/scene_flow",
        **{**tiny, "model.cost_processor.cost_aggregator.phase_argmin": True}))
    off = build_model(get_config("GCNet/scene_flow", **tiny))

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    variables = on.init(jax.random.PRNGKey(0), left, right, train=False)

    d_on = on.apply(variables, left, right, train=False)["disps"][0]
    out_off = off.apply(variables, left, right, train=False)
    d_off = out_off["disps"][0]
    np.testing.assert_allclose(np.asarray(d_on), np.asarray(d_off),
                               rtol=1e-4, atol=1e-4)

    # gradients flow through the phase head (train step viability)
    def loss(params):
        out = on.apply({**variables, "params": params}, left, right,
                       train=False)
        return jnp.mean(jnp.abs(out["disps"][0]))

    g = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.square(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.parametrize("pack", [0, 2])
def test_gcnet_split_concat_parity(pack):
    """conv(cat(a,b)) == conv(a)+conv(b) with the shared sliced kernel:
    GCNet with split_concat on vs off, identical weights, packed and
    unpacked trunks."""
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    tiny = {"model.max_disp": 32, "model.dtype": "float32",
            "model.cost_processor.cost_computation.max_disp": 16,
            "model.cost_processor.cost_aggregator.max_disp": 32,
            "model.cost_processor.cost_aggregator.pack": pack,
            "model.disp_predictor.max_disp": 32,
            "model.losses.l1_loss.max_disp": 32}
    on = build_model(get_config(
        "GCNet/scene_flow",
        **{**tiny, "model.cost_processor.cost_aggregator.split_concat": True}))
    off = build_model(get_config(
        "GCNet/scene_flow",
        **{**tiny,
           "model.cost_processor.cost_aggregator.split_concat": False}))

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    variables = on.init(jax.random.PRNGKey(0), left, right, train=False)
    d_on = on.apply(variables, left, right, train=False)["disps"][0]
    d_off = off.apply(variables, left, right, train=False)["disps"][0]
    np.testing.assert_allclose(np.asarray(d_on), np.asarray(d_off),
                               rtol=1e-4, atol=1e-4)

    # train mode too (BN batch stats on the summed conv output)
    t_on, _ = on.apply(variables, left, right, train=True,
                       mutable=["batch_stats"])
    t_off, _ = off.apply(variables, left, right, train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t_on["disps"][0]),
                               np.asarray(t_off["disps"][0]),
                               rtol=1e-4, atol=1e-4)
