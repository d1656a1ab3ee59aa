"""AcfNet LocalSoftArgmin eval-time ablation (VERDICT r1 item 10).

Reference: configs/AcfNet/ResultOfAcfNet.md "Disparity Predictor Ablation" —
swapping FasterSoftArgmin for LocalSoftArgmin at EVAL on a trained AcfNet
improves 1PE 8.626 -> 5.983. The swap must work on an existing checkpoint:
the predictor is parameter-free, so rebuilding the model with
model.disp_predictor.type=LOCAL and applying the SAME variables is the
whole mechanism (tools/test.py --override model.disp_predictor.type=LOCAL).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"


def test_acfnet_local_predictor_swap_same_variables():
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    over = {"model.max_disp": 16,
            "model.cost_processor.cost_computation.max_disp": 4,
            "model.cost_processor.cost_aggregator.max_disp": 16,
            "model.disp_predictor.max_disp": 16,
            "model.cmn.in_planes": 16}
    cfg = get_config("AcfNet/scene_flow_adaptive", **over)
    cfg_local = get_config("AcfNet/scene_flow_adaptive", **over,
                           **{"model.disp_predictor.type": "LOCAL"})

    model = build_model(cfg)
    model_local = build_model(cfg_local)

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    right = jnp.asarray(np.roll(np.asarray(left), -3, axis=2))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    out_f = model.apply(variables, left, right, train=False)
    # checkpoint-compatible: SAME variables drive the LOCAL-predictor model
    out_l = model_local.apply(variables, left, right, train=False)
    d_f, d_l = np.asarray(out_f["disps"][0]), np.asarray(out_l["disps"][0])
    assert d_f.shape == d_l.shape
    assert np.isfinite(d_l).all()
    assert not np.allclose(d_f, d_l)  # the ablation changes the estimate


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference repo not mounted")
def test_local_soft_argmin_matches_reference_module():
    """ops.local_soft_argmin == the live torch LocalSoftArgmin on the same
    cost volume (reference disp_predictors/local_soft_argmin.py:5-123)."""
    sys.path.insert(0, REFERENCE)
    for name, attrs in [
        ("spatial_correlation_sampler", ["SpatialCorrelationSampler"]),
        ("gaterecurrent2dnoind_cuda", []),
        ("detectron2", []),
        ("detectron2.layers", ["DeformConv", "ModulatedDeformConv"]),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, object)
            sys.modules[name] = m
    import torch
    import jax.numpy as jnp
    from dmb.modeling.stereo.disp_predictors.local_soft_argmin import (
        LocalSoftArgmin)
    from densematchingbenchmark_tpu.ops import local_soft_argmin

    rng = np.random.RandomState(1)
    D = 24
    cost = rng.randn(2, D, 9, 11).astype(np.float32)
    t_pred = LocalSoftArgmin(max_disp=D, radius=2, start_disp=0, dilation=1,
                             radius_dilation=1, alpha=1.0, normalize=True)
    with torch.no_grad():
        t_disp = t_pred(torch.from_numpy(cost))
    f_disp = local_soft_argmin(jnp.asarray(cost), max_disp=D, radius=2)
    np.testing.assert_allclose(
        np.asarray(f_disp)[..., 0],
        t_disp.numpy()[:, 0], rtol=1e-4, atol=1e-4)
