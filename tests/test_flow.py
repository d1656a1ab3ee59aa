"""Flow scaffolding tests: .flo IO, metrics, color wheel, transforms."""

import numpy as np
import pytest

from densematchingbenchmark_tpu.flow import (load_flo, save_flo,
                                             calc_flow_error, flow_to_color,
                                             build_flow_model)
from densematchingbenchmark_tpu.flow import transforms as ft


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(13, 17, 2).astype(np.float32) * 10
    path = str(tmp_path / "f.flo")
    save_flo(path, flow)
    np.testing.assert_allclose(load_flo(path), flow, atol=1e-6)


def test_flow_error():
    gt = np.zeros((1, 4, 4, 2), np.float32)
    gt[..., 0] = 3.0
    est = gt.copy()
    est[0, 0, 0, 0] = 8.0  # one pixel off by 5
    out = calc_flow_error(est, gt)
    np.testing.assert_allclose(float(out["epe"]), 5.0 / 16, atol=1e-5)
    np.testing.assert_allclose(float(out["3px"]), 100.0 / 16, atol=1e-4)
    # sparse: zero-flow pixels masked out
    gt_sparse = gt.copy()
    gt_sparse[0, 1] = 0.0
    out_s = calc_flow_error(est, gt_sparse, sparse=True)
    assert float(out_s["epe"]) > 0


def test_flow_color_wheel():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:, :4, 0] = 5.0
    flow[:, 4:, 0] = -5.0
    rgb = flow_to_color(flow)
    assert rgb.shape == (8, 8, 3)
    assert not np.allclose(rgb[0, 0], rgb[0, 7])  # direction changes hue


def test_flow_transforms_fix_values():
    rng = np.random.default_rng(0)
    s = {"leftImage": np.random.rand(8, 8, 3).astype(np.float32),
         "rightImage": np.random.rand(8, 8, 3).astype(np.float32),
         "flow": np.ones((8, 8, 2), np.float32)}
    flipped = ft.random_horizontal_flip(s, rng, prob=1.0)
    np.testing.assert_allclose(flipped["flow"][..., 0], -1.0)
    np.testing.assert_allclose(flipped["flow"][..., 1], 1.0)
    scaled = ft.scale(s, 2.0)
    assert scaled["leftImage"].shape == (16, 16, 3)
    np.testing.assert_allclose(scaled["flow"], 2.0, atol=1e-5)


def test_flow_registry():
    # Unknown architectures raise; PWCFlow is registered (the reference's
    # registry is empty — dmb/modeling/flow/models/__init__.py:2-4 — so any
    # registered flow model exceeds its capability).
    with pytest.raises(ValueError, match="no flow meta-architecture"):
        build_flow_model({"model": {"meta_architecture": "NoSuchNet"}})
    from densematchingbenchmark_tpu.flow.models import (
        FLOW_META_ARCHITECTURES)
    assert "PWCFlow" in FLOW_META_ARCHITECTURES
