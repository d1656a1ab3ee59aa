"""Activation-level parity vs the reference implementation.

Loads the reference's PyTorch modules (CPU, CUDA extensions stubbed),
converts their randomly-initialized weights into the Flax models via
utils/torch_convert, and diffs forward activations on the same input —
the strongest EPE-parity evidence available without dataset access.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref():
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
    from dmb.modeling.stereo.backbones.PSMNet import PSMNetBackbone
    from dmb.modeling.stereo.cost_processors.aggregators.PSMNet import (
        PSMAggregator)
    from dmb.modeling.stereo.cost_processors.utils.cat_fms import cat_fms
    from dmb.modeling.stereo.disp_predictors.faster_soft_argmin import (
        FasterSoftArgmin)
    return types.SimpleNamespace(
        torch=torch, PSMNetBackbone=PSMNetBackbone,
        PSMAggregator=PSMAggregator, cat_fms=cat_fms,
        FasterSoftArgmin=FasterSoftArgmin)


def test_psmnet_backbone_parity(ref):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.psmnet import (
        PSMNetBackbone)
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module

    torch = ref.torch
    torch.manual_seed(0)
    tmodel = ref.PSMNetBackbone(3, True).eval()

    fmodel = PSMNetBackbone(in_planes=3, batch_norm=True)
    x = np.random.RandomState(0).rand(1, 3, 256, 256).astype(np.float32)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), x_nhwc, x_nhwc,
                            train=False)
    variables = convert_module(tmodel, variables)

    with torch.no_grad():
        t_left, _ = tmodel(torch.from_numpy(x), torch.from_numpy(x))
    f_left, _ = fmodel.apply(variables, x_nhwc, x_nhwc, train=False)

    t_out = np.transpose(t_left.numpy(), (0, 2, 3, 1))
    f_out = np.asarray(f_left)
    assert t_out.shape == f_out.shape == (1, 64, 64, 32)
    np.testing.assert_allclose(f_out, t_out, atol=2e-4, rtol=1e-3)


def test_psmnet_full_pipeline_parity(ref):
    """backbone -> cat volume -> aggregation -> soft-argmin, end to end."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.psmnet import (
        PSMNetBackbone)
    from densematchingbenchmark_tpu.models.aggregators.psmnet import (
        PSMAggregator)
    from densematchingbenchmark_tpu.ops import cat_volume, soft_argmin
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module

    torch = ref.torch
    torch.manual_seed(1)
    MAXD = 64
    t_bb = ref.PSMNetBackbone(3, True).eval()
    t_agg = ref.PSMAggregator(MAXD, 64, True).eval()
    t_pred = ref.FasterSoftArgmin(MAXD)

    f_bb = PSMNetBackbone(in_planes=3, batch_norm=True)
    f_agg = PSMAggregator(max_disp=MAXD, batch_norm=True)

    rng = np.random.RandomState(1)
    xl = rng.rand(1, 3, 256, 256).astype(np.float32)
    xr = np.roll(xl, -5, axis=3)
    jl = jnp.asarray(np.transpose(xl, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(xr, (0, 2, 3, 1)))

    bb_vars = f_bb.init(jax.random.PRNGKey(0), jl, jr, train=False)
    bb_vars = convert_module(t_bb, bb_vars)
    f_l, f_r = f_bb.apply(bb_vars, jl, jr, train=False)

    raw = cat_volume(f_l, f_r, MAXD // 4)              # [B, D, H, W, 2C]
    agg_vars = f_agg.init(jax.random.PRNGKey(0), raw, train=False)
    agg_vars = convert_module(t_agg, agg_vars)
    costs = f_agg.apply(agg_vars, raw, train=False)
    disp = soft_argmin(costs[0].astype(jnp.float32), max_disp=MAXD)

    with torch.no_grad():
        t_l, t_r = t_bb(torch.from_numpy(xl), torch.from_numpy(xr))
        t_raw = ref.cat_fms(t_l, t_r, MAXD // 4)
        t_costs = t_agg(t_raw)
        t_disp = t_pred(t_costs[0])

    t_cost = t_costs[0].numpy()
    f_cost = np.asarray(costs[0], np.float32)
    assert f_cost.shape == t_cost.shape == (1, MAXD, 256, 256)
    # cost volumes agree to float tolerance through ~40 conv layers
    np.testing.assert_allclose(f_cost, t_cost, atol=5e-3, rtol=1e-2)

    t_d = np.transpose(t_disp.numpy(), (0, 2, 3, 1))
    f_d = np.asarray(disp)
    max_err = np.abs(t_d - f_d).max()
    assert max_err < 0.05, f"disparity parity max err {max_err}"


def test_gcnet_backbone_parity(ref):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.gcnet import (
        GCNetBackbone)
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.GCNet import GCNetBackbone as TGC

    torch = ref.torch
    torch.manual_seed(2)
    tmodel = TGC(3, True).eval()
    fmodel = GCNetBackbone(in_planes=3, batch_norm=True)
    x = np.random.RandomState(2).rand(1, 3, 128, 128).astype(np.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), xj, xj, train=False)
    variables = convert_module(tmodel, variables)
    with torch.no_grad():
        t_l, _ = tmodel(torch.from_numpy(x), torch.from_numpy(x))
    f_l, _ = fmodel.apply(variables, xj, xj, train=False)
    np.testing.assert_allclose(np.asarray(f_l),
                               np.transpose(t_l.numpy(), (0, 2, 3, 1)),
                               atol=2e-4, rtol=1e-3)


def test_stereonet_backbone_and_aggregator_parity(ref):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.stereonet import (
        StereoNetBackbone)
    from densematchingbenchmark_tpu.models.aggregators.stereonet import (
        StereoNetAggregator)
    from densematchingbenchmark_tpu.ops import dif_volume
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.StereoNet import (
        StereoNetBackbone as TSB)
    from dmb.modeling.stereo.cost_processors.aggregators.StereoNet import (
        StereoNetAggregator as TSA)
    from dmb.modeling.stereo.cost_processors.utils.dif_fms import dif_fms

    torch = ref.torch
    torch.manual_seed(3)
    t_bb = TSB(3, True, 3, 6).eval()
    t_agg = TSA(max_disp=64, in_planes=32, batch_norm=True, num=4).eval()
    f_bb = StereoNetBackbone(in_planes=3, batch_norm=True)
    f_agg = StereoNetAggregator(max_disp=64, num=4, batch_norm=True)

    rng = np.random.RandomState(3)
    xl = rng.rand(1, 3, 128, 128).astype(np.float32)
    xr = np.roll(xl, -4, axis=3)
    jl = jnp.asarray(np.transpose(xl, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(xr, (0, 2, 3, 1)))

    bvars = f_bb.init(jax.random.PRNGKey(0), jl, jr, train=False)
    bvars = convert_module(t_bb, bvars)
    f_l, f_r = f_bb.apply(bvars, jl, jr, train=False)

    raw = dif_volume(f_l, f_r, 8)                      # [B, 8, 16, 16, 32]
    avars = f_agg.init(jax.random.PRNGKey(0), raw, train=False)
    avars = convert_module(t_agg, avars)
    f_cost = f_agg.apply(avars, raw, train=False)[0]

    with torch.no_grad():
        t_l, t_r = t_bb(torch.from_numpy(xl), torch.from_numpy(xr))
        t_raw = dif_fms(t_l, t_r, 8)
        t_cost = t_agg(t_raw)[0]

    np.testing.assert_allclose(np.asarray(f_l),
                               np.transpose(t_l.numpy(), (0, 2, 3, 1)),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f_cost, np.float32),
                               t_cost.numpy(), atol=1e-3, rtol=1e-2)


def test_acfnet_aggregator_parity(ref):
    """Covers the learned-deconv upsampling (ConvTranspose3d with I==O==1,
    where the kernel-flip rule is shape-ambiguous)."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.aggregators.acfnet import (
        AcfAggregator)
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.cost_processors.aggregators.AcfNet import (
        AcfAggregator as TAA)

    torch = ref.torch
    torch.manual_seed(4)
    MAXD = 32
    t_agg = TAA(MAXD, 64, True).eval()
    f_agg = AcfAggregator(max_disp=MAXD, batch_norm=True)

    rng = np.random.RandomState(4)
    raw = rng.rand(1, 64, MAXD // 4, 16, 16).astype(np.float32)
    raw_j = jnp.asarray(np.transpose(raw, (0, 2, 3, 4, 1)))
    avars = f_agg.init(jax.random.PRNGKey(0), raw_j, train=False)
    avars = convert_module(t_agg, avars)
    f_costs = f_agg.apply(avars, raw_j, train=False)
    with torch.no_grad():
        t_costs = t_agg(torch.from_numpy(raw))
    for fc, tc in zip(f_costs, t_costs):
        np.testing.assert_allclose(np.asarray(fc, np.float32), tc.numpy(),
                                   atol=2e-3, rtol=1e-2)


def test_anynet_backbone_parity(ref):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.anynet import (
        AnyNetBackbone)
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.AnyNet import AnyNetBackbone as TAB

    torch = ref.torch
    torch.manual_seed(5)
    tmodel = TAB(3, 1, 2, True).eval()
    fmodel = AnyNetBackbone(in_planes=3, C=1, block_num=2, batch_norm=True)
    x = np.random.RandomState(5).rand(1, 3, 64, 64).astype(np.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), xj, xj, train=False)
    variables = convert_module(tmodel, variables)
    with torch.no_grad():
        t_group, _ = tmodel(torch.from_numpy(x), torch.from_numpy(x))
    f_group, _ = fmodel.apply(variables, xj, xj, train=False)
    for t_f, f_f in zip(t_group, f_group):
        np.testing.assert_allclose(np.asarray(f_f),
                                   np.transpose(t_f.numpy(), (0, 2, 3, 1)),
                                   atol=2e-4, rtol=1e-2)


def test_deeppruner_backbone_parity(ref):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.deeppruner import (
        DeepPrunerBestBackbone)
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.DeepPruner import (
        DeepPrunerBestBackbone as TDB)

    torch = ref.torch
    torch.manual_seed(6)
    tmodel = TDB(3, True).eval()
    fmodel = DeepPrunerBestBackbone(in_planes=3, batch_norm=True)
    x = np.random.RandomState(6).rand(1, 3, 256, 256).astype(np.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), xj, xj, train=False)
    variables = convert_module(tmodel, variables)
    with torch.no_grad():
        (t_fms, t_guides), _ = tmodel(torch.from_numpy(x),
                                      torch.from_numpy(x))
    (f_fms, f_guides), _ = fmodel.apply(variables, xj, xj, train=False)
    np.testing.assert_allclose(np.asarray(f_fms),
                               np.transpose(t_fms.numpy(), (0, 2, 3, 1)),
                               atol=3e-4, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(f_guides[0]),
        np.transpose(t_guides[0].numpy(), (0, 2, 3, 1)),
        atol=3e-4, rtol=1e-2)


def test_hw_hourglass_parity(ref):
    """DeepPruner's HW-striding hourglass incl. output_padding=(0,1,1)
    transposed convs."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.layers import HWHourglass
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.cost_processors.utils.hw_hourglass import (
        HWHourglass as THW)

    torch = ref.torch
    torch.manual_seed(8)
    tmodel = THW(8, True).eval()
    fmodel = HWHourglass(8, True)
    raw = np.random.RandomState(8).rand(1, 8, 6, 16, 16).astype(np.float32)
    raw_j = jnp.asarray(np.transpose(raw, (0, 2, 3, 4, 1)))
    variables = fmodel.init(jax.random.PRNGKey(0), raw_j, train=False)
    variables = convert_module(
        tmodel, variables,
        torch_module_order=["conv1_a", "conv1_b", "conv2_a", "conv2_b",
                            "conv3_a", "conv3_b", "conv3_d", "conv2_d",
                            "conv1_d"])
    with torch.no_grad():
        want = tmodel(torch.from_numpy(raw)).numpy()
    got = np.asarray(fmodel.apply(variables, raw_j, train=False))
    np.testing.assert_allclose(np.transpose(got, (0, 4, 1, 2, 3)), want,
                               atol=1e-4, rtol=1e-2)


def test_compat_grid_sample_matches_torch_warp(ref):
    """compat mode reproduces the reference's grid_sample numerics exactly
    (align_corners=True normalization + align_corners=False sampling)."""
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.ops.warp import inverse_warp_3d

    torch = ref.torch
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.layers.inverse_warp_3d import (
        inverse_warp_3d as t_warp)

    rng = np.random.RandomState(9)
    fm = rng.rand(1, 4, 6, 16).astype(np.float32)        # torch NCHW
    ds = (rng.rand(1, 3, 6, 16) * 4).astype(np.float32)  # [B, D, H, W]
    with torch.no_grad():
        want = t_warp(torch.from_numpy(fm), -torch.from_numpy(ds)).numpy()
    fm_j = jnp.asarray(np.transpose(fm, (0, 2, 3, 1)))   # NHWC
    got, _ = inverse_warp_3d(fm_j, jnp.asarray(ds), compat_grid_sample=True)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))  # [B, C, D, H, W]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and WITHOUT compat the exact warp deviates (the documented quirk)
    got2, _ = inverse_warp_3d(fm_j, jnp.asarray(ds))
    got2 = np.transpose(np.asarray(got2), (0, 4, 1, 2, 3))
    assert np.abs(got2 - want).max() > 1e-3


def test_stereonet_full_model_parity(ref):
    """backbone -> dif volume -> aggregation -> soft-argmin -> edge-aware
    refinement, end to end (covers the align_corners=False upsampling)."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.stereonet import (
        StereoNetBackbone)
    from densematchingbenchmark_tpu.models.aggregators.stereonet import (
        StereoNetAggregator)
    from densematchingbenchmark_tpu.models.refinement.stereonet import (
        StereoNetRefinement)
    from densematchingbenchmark_tpu.ops import dif_volume, soft_argmin
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.StereoNet import (
        StereoNetBackbone as TSB)
    from dmb.modeling.stereo.cost_processors.aggregators.StereoNet import (
        StereoNetAggregator as TSA)
    from dmb.modeling.stereo.disp_refinement.StereoNet import (
        StereoNetRefinement as TSR)
    from dmb.modeling.stereo.cost_processors.utils.dif_fms import dif_fms
    from dmb.modeling.stereo.disp_predictors.faster_soft_argmin import (
        FasterSoftArgmin)

    torch = ref.torch
    torch.manual_seed(10)
    MAXD = 64
    t_bb = TSB(3, True, 3, 6).eval()
    t_agg = TSA(max_disp=MAXD, in_planes=32, batch_norm=True, num=4).eval()
    t_ref = TSR(in_planes=4, batch_norm=True, num=1).eval()
    t_pred = FasterSoftArgmin(MAXD // 8)

    f_bb = StereoNetBackbone(in_planes=3, batch_norm=True)
    f_agg = StereoNetAggregator(max_disp=MAXD, num=4, batch_norm=True)
    f_ref = StereoNetRefinement(num=1, batch_norm=True)

    rng = np.random.RandomState(10)
    xl = rng.rand(1, 3, 128, 128).astype(np.float32)
    xr = np.roll(xl, -4, axis=3)
    jl = jnp.asarray(np.transpose(xl, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(xr, (0, 2, 3, 1)))

    bvars = convert_module(
        t_bb, f_bb.init(jax.random.PRNGKey(0), jl, jr, train=False))
    f_l, f_r = f_bb.apply(bvars, jl, jr, train=False)
    raw = dif_volume(f_l, f_r, MAXD // 8)
    avars = convert_module(
        t_agg, f_agg.init(jax.random.PRNGKey(0), raw, train=False))
    f_cost = f_agg.apply(avars, raw, train=False)[0]
    f_disp = soft_argmin(f_cost.astype(jnp.float32), max_disp=MAXD // 8)
    rvars = f_ref.init(jax.random.PRNGKey(0), [f_disp], f_l, f_r, jl, jr,
                       train=False)
    rvars = convert_module(t_ref, rvars)
    f_disps = f_ref.apply(rvars, [f_disp], f_l, f_r, jl, jr, train=False)

    with torch.no_grad():
        t_l, t_r = t_bb(torch.from_numpy(xl), torch.from_numpy(xr))
        t_cost = t_agg(dif_fms(t_l, t_r, MAXD // 8))[0]
        t_disp = t_pred(t_cost)
        t_disps = t_ref([t_disp], t_l, t_r, torch.from_numpy(xl),
                        torch.from_numpy(xr))

    for f_d, t_d in zip(f_disps, t_disps):
        err = np.abs(np.asarray(f_d) -
                     np.transpose(t_d.numpy(), (0, 2, 3, 1))).max()
        assert err < 0.05, f"refined disparity parity max err {err}"


def test_acfnet_full_model_parity(ref):
    """backbone -> cat volume -> Acf aggregation -> confidence heads ->
    soft-argmin: the third full model proven numerically identical."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.psmnet import (
        PSMNetBackbone)
    from densematchingbenchmark_tpu.models.aggregators.acfnet import (
        AcfAggregator)
    from densematchingbenchmark_tpu.models.cmn import Cmn
    from densematchingbenchmark_tpu.ops import cat_volume, soft_argmin
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.cost_processors.aggregators.AcfNet import (
        AcfAggregator as TAA)
    from dmb.modeling.stereo.cmn.cmn import ConfHead as TCH

    torch = ref.torch
    torch.manual_seed(11)
    MAXD = 32
    t_bb = ref.PSMNetBackbone(3, True).eval()
    t_agg = TAA(MAXD, 64, True).eval()
    t_heads = [TCH(MAXD, True).eval() for _ in range(3)]

    f_bb = PSMNetBackbone(in_planes=3, batch_norm=True)
    f_agg = AcfAggregator(max_disp=MAXD, batch_norm=True)
    f_cmn = Cmn(in_planes=MAXD, num=3, alpha=1.0, beta=1.0, batch_norm=True)

    rng = np.random.RandomState(11)
    # 256x256: the torch SPP backbone needs features >= its 64-wide pool
    xl = rng.rand(1, 3, 256, 256).astype(np.float32)
    xr = np.roll(xl, -3, axis=3)
    jl = jnp.asarray(np.transpose(xl, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(xr, (0, 2, 3, 1)))

    bvars = convert_module(
        t_bb, f_bb.init(jax.random.PRNGKey(0), jl, jr, train=False))
    f_l, f_r = f_bb.apply(bvars, jl, jr, train=False)
    raw = cat_volume(f_l, f_r, MAXD // 4)
    avars = convert_module(
        t_agg, f_agg.init(jax.random.PRNGKey(0), raw, train=False))
    f_costs = [c.astype(jnp.float32)
               for c in f_agg.apply(avars, raw, train=False)]

    cvars = f_cmn.init(jax.random.PRNGKey(0), f_costs, train=False)

    class Heads(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.heads = torch.nn.ModuleList(t_heads)

    cvars = convert_module(Heads(), cvars)
    f_vars_, f_confs, _ = f_cmn.apply(cvars, f_costs, train=False)

    with torch.no_grad():
        t_l, t_r = t_bb(torch.from_numpy(xl), torch.from_numpy(xr))
        t_costs = t_agg(ref.cat_fms(t_l, t_r, MAXD // 4))
        t_confs = [torch.sigmoid(h(c)) for h, c in zip(t_heads, t_costs)]

    for fc, tc in zip(f_costs, t_costs):
        assert np.abs(np.asarray(fc) - tc.numpy()).max() < 5e-3
    for fc, tc in zip(f_confs, t_confs):
        err = np.abs(np.asarray(fc) -
                     np.transpose(tc.numpy(), (0, 2, 3, 1))).max()
        assert err < 1e-3, f"confidence parity max err {err}"
    f_disp = soft_argmin(f_costs[0], max_disp=MAXD)
    t_disp = ref.FasterSoftArgmin(MAXD)(t_costs[0])
    err = np.abs(np.asarray(f_disp) -
                 np.transpose(t_disp.numpy(), (0, 2, 3, 1))).max()
    assert err < 0.05, f"disparity parity max err {err}"


def test_gcnet_full_model_parity(ref):
    """backbone -> concat volume at 1/2 -> 19-37 layer encoder-decoder ->
    soft-argmin: fourth full model."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.backbones.gcnet import (
        GCNetBackbone)
    from densematchingbenchmark_tpu.models.aggregators.gcnet import (
        GCAggregator)
    from densematchingbenchmark_tpu.ops import cat_volume, soft_argmin
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.GCNet import GCNetBackbone as TGC
    from dmb.modeling.stereo.cost_processors.aggregators.GCNet import (
        GCAggregator as TGA)
    from dmb.modeling.stereo.cost_processors.utils.cat_fms import cat_fms
    from dmb.modeling.stereo.disp_predictors.faster_soft_argmin import (
        FasterSoftArgmin)

    torch = ref.torch
    torch.manual_seed(12)
    MAXD = 32  # D/2=16 survives the 4 stride-2 stages (16->8->4->2->1)
    t_bb = TGC(3, True).eval()
    t_agg = TGA(MAXD, 64, True).eval()
    f_bb = GCNetBackbone(in_planes=3, batch_norm=True)
    f_agg = GCAggregator(max_disp=MAXD, in_planes=64, batch_norm=True)

    rng = np.random.RandomState(12)
    xl = rng.rand(1, 3, 64, 64).astype(np.float32)
    xr = np.roll(xl, -3, axis=3)
    jl = jnp.asarray(np.transpose(xl, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(xr, (0, 2, 3, 1)))

    bvars = convert_module(
        t_bb, f_bb.init(jax.random.PRNGKey(0), jl, jr, train=False))
    f_l, f_r = f_bb.apply(bvars, jl, jr, train=False)
    raw = cat_volume(f_l, f_r, MAXD // 2)
    avars = convert_module(
        t_agg, f_agg.init(jax.random.PRNGKey(0), raw, train=False))
    f_cost = f_agg.apply(avars, raw, train=False)[0].astype(jnp.float32)
    f_disp = soft_argmin(f_cost, max_disp=MAXD)

    with torch.no_grad():
        t_l, t_r = t_bb(torch.from_numpy(xl), torch.from_numpy(xr))
        t_cost = t_agg(cat_fms(t_l, t_r, MAXD // 2))[0]
        t_disp = FasterSoftArgmin(MAXD)(t_cost)

    np.testing.assert_allclose(np.asarray(f_cost), t_cost.numpy(),
                               atol=5e-3, rtol=1e-2)
    err = np.abs(np.asarray(f_disp) -
                 np.transpose(t_disp.numpy(), (0, 2, 3, 1))).max()
    assert err < 0.05, f"disparity parity max err {err}"


def test_anynet_stages_parity_compat_warp(ref):
    """AnyNet's three coarse-to-fine stages (pre-SPN) with compat warp:
    fifth model family proven numerically identical."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.backbones.AnyNet import AnyNetBackbone as TAB
    from dmb.modeling.stereo.cost_processors.aggregators.AnyNet import (
        AnyNetAggregator as TAG)
    from dmb.modeling.stereo.cost_processors.utils.dif_fms import fast_dif_fms
    from dmb.modeling.stereo.disp_predictors.faster_soft_argmin import (
        FasterSoftArgmin)

    torch = ref.torch
    F = torch.nn.functional
    torch.manual_seed(13)
    t_bb = TAB(3, 1, 2, True).eval()
    t_aggs = {"init_guess": TAG(8, 16, 4, True).eval(),
              "warp_level_8": TAG(4, 4, 4, True).eval(),
              "warp_level_4": TAG(2, 4, 4, True).eval()}
    conf = dict(init_guess=(4, 0), warp_level_8=(5, -2), warp_level_4=(5, -2))

    from densematchingbenchmark_tpu.models.anynet import AnyNet
    from densematchingbenchmark_tpu.models.backbones.anynet import (
        AnyNetBackbone)
    f_model = AnyNet(
        backbone=AnyNetBackbone(in_planes=3, C=1, block_num=2,
                                batch_norm=True),
        disp_refinement=None, max_disp=64,
        stage_max_disp={k: v[0] for k, v in conf.items()},
        stage_start_disp={k: v[1] for k, v in conf.items()},
        stage_dilation={k: 1 for k in conf},
        stage_agg_planes=dict(init_guess=16, warp_level_8=4,
                              warp_level_4=4),
        agg_num=4, batch_norm=True, compat_warp=True)

    rng = np.random.RandomState(13)
    xl = rng.rand(1, 3, 64, 64).astype(np.float32)
    xr = np.roll(xl, -3, axis=3)
    jl = jnp.asarray(np.transpose(xl, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(xr, (0, 2, 3, 1)))

    variables = f_model.init(jax.random.PRNGKey(0), jl, jr, train=False)

    class Wrapper(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = t_bb
            self.agg_init_guess = t_aggs["init_guess"]
            self.agg_warp_level_8 = t_aggs["warp_level_8"]
            self.agg_warp_level_4 = t_aggs["warp_level_4"]

    variables = convert_module(Wrapper(), variables)
    out = f_model.apply(variables, jl, jr, train=False)

    # reference forward (AnyNet.py stage logic, no SPN)
    def t_stage(st, left, right, disp):
        B, C, H, W = left.shape
        maxd, start = conf[st]
        ds = torch.linspace(start, start + maxd - 1, maxd).view(
            1, maxd, 1, 1).expand(B, maxd, H, W).float()
        if disp is not None:
            scale = W / disp.shape[-1]
            disp = F.interpolate(disp * scale, size=(H, W), mode="bilinear",
                                 align_corners=False)
            ds = ds + disp
        cost = t_aggs[st](fast_dif_fms(left, right, disp_sample=ds))[0]
        pred = FasterSoftArgmin(maxd, start)(cost)
        return pred if disp is None else pred + disp

    with torch.no_grad():
        (l16, l8, l4), (r16, r8, r4) = t_bb(torch.from_numpy(xl),
                                            torch.from_numpy(xr))
        d16 = t_stage("init_guess", l16, r16, None)
        d8 = t_stage("warp_level_8", l8, r8, d16)
        d4 = t_stage("warp_level_4", l4, r4, d8)
        H, W = 64, 64
        t_disps = [F.interpolate(d * W / d.shape[-1], size=(H, W),
                                 mode="bilinear", align_corners=False)
                   for d in (d4, d8, d16)]

    for f_d, t_d in zip(out["disps"], t_disps):
        err = np.abs(np.asarray(f_d) -
                     np.transpose(t_d.numpy(), (0, 2, 3, 1))).max()
        assert err < 0.05, f"AnyNet stage disparity parity max err {err}"


def test_deeppruner_range_predictor_parity(ref):
    """DeepPruner's deterministic core given identical disparity samples:
    compat cat volume + ConfidenceRangePredictor (twin HW-hourglasses) ->
    min/max disparity. Sixth family component-verified (the PatchMatch
    sampler itself is stochastic and cannot share RNG across frameworks)."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.models.deeppruner import (
        ConfidenceRangePredictor)
    from densematchingbenchmark_tpu.ops import cat_volume
    from densematchingbenchmark_tpu.utils.torch_convert import convert_module
    sys.path.insert(0, REFERENCE)
    from dmb.modeling.stereo.cost_processors.DeepPruner import (
        ConfidenceRangePredictor as TCRP)
    from dmb.modeling.stereo.cost_processors.utils.cat_fms import fast_cat_fms

    torch = ref.torch
    torch.manual_seed(14)
    NSAMP, C = 6, 16
    t_crp = TCRP(in_planes=2 * C + 1, hourglass_in_planes=8,
                 disparity_sample_number=NSAMP, batch_norm=True).eval()
    f_crp = ConfidenceRangePredictor(hourglass_in_planes=8, batch_norm=True)

    rng = np.random.RandomState(14)
    left = rng.rand(1, C, 16, 16).astype(np.float32)
    right = np.roll(left, -2, axis=3)
    samples = np.sort(rng.rand(1, NSAMP, 16, 16) * 6, axis=1).astype(
        np.float32)

    jl = jnp.asarray(np.transpose(left, (0, 2, 3, 1)))
    jr = jnp.asarray(np.transpose(right, (0, 2, 3, 1)))
    js = jnp.asarray(samples)
    raw = cat_volume(jl, jr, 8, disp_sample=js, compat_grid_sample=True)
    raw = jnp.concatenate([raw, js[..., None]], axis=-1)

    variables = f_crp.init(jax.random.PRNGKey(0), raw, js, train=False)
    order = ["dres0", "dres1", "min_disparity_predictor",
             "max_disparity_predictor", "min_disparity_conv",
             "max_disparity_conv", "min_disparity_feature_conv",
             "max_disparity_feature_conv"]
    hw = ["conv1_a", "conv1_b", "conv2_a", "conv2_b", "conv3_a", "conv3_b",
          "conv3_d", "conv2_d", "conv1_d"]
    variables = convert_module(
        t_crp, variables, torch_module_order=order,
        torch_child_orders={"min_disparity_predictor.0": hw,
                            "max_disparity_predictor.0": hw})
    f_min, f_max, f_minf, f_maxf = f_crp.apply(variables, raw, js,
                                               train=False)

    with torch.no_grad():
        t_raw = fast_cat_fms(torch.from_numpy(left), torch.from_numpy(right),
                             disp_sample=torch.from_numpy(samples))
        t_raw = torch.cat((t_raw, torch.from_numpy(samples).unsqueeze(1)), 1)
        t_min, t_max, t_minf, t_maxf = t_crp(t_raw,
                                             torch.from_numpy(samples))

    for f_x, t_x in ((f_min, t_min), (f_max, t_max)):
        err = np.abs(np.asarray(f_x) -
                     np.transpose(t_x.numpy(), (0, 2, 3, 1))).max()
        assert err < 0.02, f"range predictor parity max err {err}"
    for f_x, t_x in ((f_minf, t_minf), (f_maxf, t_maxf)):
        err = np.abs(np.asarray(f_x) - t_x.numpy()).max()
        assert err < 0.01, f"range feature parity max err {err}"
