"""Metric-level parity vs the live reference evaluation code.

The last link in the no-dataset EPE proxy chain (VERDICT r3 missing #1):
activations, losses and gradients are already diffed against the live
reference; this file diffs the EVALUATION pipeline itself —
  calc_error            vs dmb/.../evaluation/stereo/pixel_error.py:6-73
  occlusion eval        vs dmb/.../evaluation/stereo/eval.py:74-134
  remove_padding        vs dmb/.../evaluation/stereo/eval.py:12-37
  sparsification_plot   vs dmb/visualization/stereo/sparsification_plot.py:21-136
plus one end-to-end check: this repo's batched `evaluate()` table equals a
reference-semantics per-sample eval loop on identical model outputs.
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
        # the dmb.data/visualization package __init__ chains pull mmcv;
        # only name-level stubs are needed (the eval math itself is pure
        # torch/numpy)
        ("mmcv", ["mkdir_or_exist", "ProgressBar", "load", "dump",
                  "imread", "imwrite"]),
        ("mmcv.parallel", ["collate", "scatter", "MMDistributedDataParallel",
                           "MMDataParallel"]),
        ("mmcv.runner", ["Hook", "obj_from_dict", "get_dist_info",
                         "LogBuffer", "Runner", "DistSamplerSeedHook",
                         "load_checkpoint"]),
        ("png", ["Reader", "Writer"]),  # pypng, used by the .flo loader
        ("torchvision", []),
        ("torchvision.transforms", []),
        ("torchvision.transforms.functional", ["to_tensor", "normalize"]),
        ("skimage", []),
        ("skimage.io", ["imread", "imsave"]),
        ("skimage.transform", ["resize"]),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, type(a, (), {}) if a[0].isupper() else
                        (lambda *args, **kw: None))
            sys.modules[name] = m
    import torch
    from dmb.data.datasets.evaluation.stereo.pixel_error import calc_error
    from dmb.data.datasets.evaluation.stereo.eval import (
        do_evaluation, do_occlusion_evaluation, remove_padding)
    from dmb.visualization.stereo.sparsification_plot import (
        sparsification_plot)
    return types.SimpleNamespace(
        torch=torch, calc_error=calc_error, do_evaluation=do_evaluation,
        do_occlusion_evaluation=do_occlusion_evaluation,
        remove_padding=remove_padding,
        sparsification_plot=sparsification_plot)


def _rand_disps(seed, b=2, h=24, w=40, scale=48.0, sparse=False):
    """NCHW torch-style float disparity maps; sparse zeroes ~40% (KITTI)."""
    rng = np.random.RandomState(seed)
    est = (rng.rand(b, 1, h, w) * scale).astype(np.float32)
    gt = (rng.rand(b, 1, h, w) * scale).astype(np.float32)
    if sparse:
        gt = gt * (rng.rand(b, 1, h, w) > 0.4)
    return est, gt


def _to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("lb,ub,sparse", [
    (0, 192, False),       # SceneFlow eval bounds
    (0, 192, True),        # KITTI sparse-GT convention (invalid = 0)
    (None, None, False),   # unbounded
    (3.0, 20.0, False),    # interior (lb, ub) — exclusive on both ends
])
def test_calc_error_parity(ref, lb, ub, sparse):
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.evaluation.metrics import calc_error

    est, gt = _rand_disps(0, sparse=sparse)
    t = ref.calc_error(ref.torch.from_numpy(est), ref.torch.from_numpy(gt),
                       lb=lb, ub=ub)
    ours = calc_error(jnp.asarray(_to_nhwc(est)), jnp.asarray(_to_nhwc(gt)),
                      lb=lb, ub=ub)
    assert set(t) == set(ours)
    for k in t:
        np.testing.assert_allclose(
            float(np.asarray(ours[k])), float(t[k]), rtol=1e-5, atol=1e-5,
            err_msg=f"{k} lb={lb} ub={ub} sparse={sparse}")


def test_calc_error_no_valid_pixels_returns_zeros(ref):
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.evaluation.metrics import calc_error

    est, gt = _rand_disps(1)
    t = ref.calc_error(ref.torch.from_numpy(est), ref.torch.from_numpy(gt),
                       lb=1000.0, ub=2000.0)
    ours = calc_error(jnp.asarray(_to_nhwc(est)), jnp.asarray(_to_nhwc(gt)),
                      lb=1000.0, ub=2000.0)
    for k in t:
        assert float(t[k]) == 0.0
        assert float(np.asarray(ours[k])) == 0.0, k


def test_occlusion_eval_parity(ref):
    """occ/noc split vs do_occlusion_evaluation on identical inputs.

    Uses the compat grid_sample warp so the LR-consistency mask is
    bit-faithful to the reference (its warp carries an align_corners
    normalization bias; the shipped default is the exact warp — a
    documented divergence, DESIGN.md §4)."""
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.evaluation.metrics import (
        calc_error_with_occlusion)

    rng = np.random.RandomState(2)
    b, h, w = 2, 24, 40
    est = (rng.rand(b, 1, h, w) * 30).astype(np.float32)
    left_gt = (rng.rand(b, 1, h, w) * 30).astype(np.float32)
    right_gt = (rng.rand(b, 1, h, w) * 30).astype(np.float32)

    t = ref.do_occlusion_evaluation(
        ref.torch.from_numpy(est), ref.torch.from_numpy(left_gt),
        ref.torch.from_numpy(right_gt), lb=0, ub=192)
    ours = calc_error_with_occlusion(
        jnp.asarray(_to_nhwc(est)), jnp.asarray(_to_nhwc(left_gt)),
        jnp.asarray(_to_nhwc(right_gt)), lb=0, ub=192,
        compat_grid_sample=True)
    assert set(t) == set(ours)
    for k in t:
        np.testing.assert_allclose(float(np.asarray(ours[k])), float(t[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_remove_padding_parity(ref):
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.evaluation.metrics import remove_padding

    rng = np.random.RandomState(3)
    x = rng.rand(2, 1, 544, 960).astype(np.float32)  # SceneFlow eval pad
    t = ref.remove_padding(ref.torch.from_numpy(x), (540, 960)).numpy()
    ours = remove_padding(jnp.asarray(_to_nhwc(x)), 540, 960)
    np.testing.assert_array_equal(np.asarray(ours), _to_nhwc(t))


def test_sparsification_parity(ref):
    """est/oracle sparsification curves vs the reference (the random curve
    draws from each framework's own RNG and is excluded by construction)."""
    from densematchingbenchmark_tpu.evaluation.sparsification import (
        sparsification_plot)

    rng = np.random.RandomState(4)
    h, w = 32, 48
    est = (rng.rand(1, 1, h, w) * 48).astype(np.float32)
    gt = (rng.rand(1, 1, h, w) * 48).astype(np.float32)
    conf = rng.rand(1, 1, h, w).astype(np.float32)

    t = ref.sparsification_plot(
        ref.torch.from_numpy(est), ref.torch.from_numpy(gt),
        ref.torch.from_numpy(conf), bins=10, lb=0, ub=192)
    ours = sparsification_plot(est, gt, conf, bins=10, lb=0, ub=192)
    compared = 0
    for k in t:
        if k.startswith("random"):
            continue
        np.testing.assert_allclose(ours[k], float(t[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)
        compared += 1
    assert compared >= 20  # est_0..90 + oracle_0..90 (+ the zeroed _100s)


def test_evaluate_table_matches_reference_eval_loop(ref):
    """End-to-end: this repo's batched `evaluate()` equals a
    reference-semantics per-sample loop (do_evaluation +
    do_occlusion_evaluation, averaged like eval_hooks.py:211-241) on
    identical model outputs over an identical synthetic mini-dataset."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.data import (SyntheticStereoDataset,
                                                 transforms)
    from densematchingbenchmark_tpu.evaluation.eval_loop import evaluate

    cfg = get_config(
        "StereoNet/scene_flow_8x_2stage",
        **{"model.max_disp": 32, "model.dtype": "float32",
           "model.cost_processor.cost_computation.max_disp": 4,
           "model.cost_processor.cost_aggregator.max_disp": 32,
           "model.disp_predictor.max_disp": 4,
           "model.losses.l1_loss.max_disp": 32})
    model = build_model(cfg)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    ds = SyntheticStereoDataset(length=5, height=64, width=128, max_disp=24,
                                with_right_disp=True)
    ds.transform = transforms.make_eval_transform((64, 128), mean, std)

    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    eval_cfg = {"lower_bound": 0, "upper_bound": 32, "eval_occlusion": True,
                "occ_compat_warp": True}
    table, n = evaluate(model, variables, ds, eval_cfg, batch_size=2)
    assert n == 5

    # Reference-semantics loop: per-sample forward + do_evaluation +
    # do_occlusion_evaluation, then plain averaging (mmcv LogBuffer).
    sums = {}
    for i in range(len(ds)):
        s = ds[i]
        left = jnp.asarray(s["leftImage"])[None]
        right = jnp.asarray(s["rightImage"])[None]
        out = model.apply(variables, left, right, train=False)
        est_t = ref.torch.from_numpy(
            np.transpose(np.asarray(out["disps"][0]), (0, 3, 1, 2)))
        gt_t = ref.torch.from_numpy(
            np.transpose(s["leftDisp"][None], (0, 3, 1, 2)))
        rgt_t = ref.torch.from_numpy(
            np.transpose(s["rightDisp"][None], (0, 3, 1, 2)))
        m = ref.do_evaluation(est_t, gt_t, lb=0, ub=32)
        m.update(ref.do_occlusion_evaluation(est_t, gt_t, rgt_t, lb=0,
                                             ub=32))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    ref_table = {f"disp_0/{k}": v / len(ds) for k, v in sums.items()}

    assert set(table) == set(ref_table)
    for k in ref_table:
        np.testing.assert_allclose(table[k], ref_table[k], rtol=1e-4,
                                   atol=1e-4, err_msg=k)
