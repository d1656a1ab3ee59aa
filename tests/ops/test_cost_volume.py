"""Golden tests for cost-volume builders.

Mirrors the reference's hand-readable cases
(tests/modeling/stereo/cost_processors/utils/test_cat_fms.py): tiny H=3, W=4
tensors, negative start_disp, dilation, plus fixed-range vs per-pixel-sample
equivalence.
"""

import numpy as np
import pytest

from densematchingbenchmark_tpu.ops import (
    cat_volume, dif_volume, correlation1d_volume, disp_sample_values)


def make_fms(b=1, h=3, w=4, c=2, seed=0):
    rng = np.random.RandomState(seed)
    ref = rng.rand(b, h, w, c).astype(np.float32)
    tgt = rng.rand(b, h, w, c).astype(np.float32)
    return ref, tgt


def naive_cat(ref, tgt, max_disp, start_disp=0, dilation=1):
    """Direct transliteration of the slow reference cat_fms semantics."""
    b, h, w, c = ref.shape
    vals = disp_sample_values(max_disp, start_disp, dilation)
    out = np.zeros((b, len(vals), h, w, 2 * c), np.float32)
    for k, v in enumerate(vals):
        d = int(v)
        for x in range(w):
            if 0 <= x - d <= w - 1:
                out[:, k, :, x, :c] = ref[:, :, x, :]
                out[:, k, :, x, c:] = tgt[:, :, x - d, :]
    return out


def test_cat_volume_matches_naive_basic():
    ref, tgt = make_fms()
    got = np.asarray(cat_volume(ref, tgt, max_disp=3))
    want = naive_cat(ref, tgt, max_disp=3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cat_volume_negative_start_disp():
    ref, tgt = make_fms(seed=1)
    got = np.asarray(cat_volume(ref, tgt, max_disp=4, start_disp=-2))
    want = naive_cat(ref, tgt, max_disp=4, start_disp=-2)
    assert got.shape == (1, 4, 3, 4, 4)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cat_volume_dilation():
    ref, tgt = make_fms(seed=2)
    got = np.asarray(cat_volume(ref, tgt, max_disp=4, dilation=2))
    want = naive_cat(ref, tgt, max_disp=4, dilation=2)
    assert got.shape[1] == 2  # (4 + 2 - 1) // 2
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cat_volume_per_pixel_samples_match_fixed_range():
    """Integer per-pixel samples == fixed-range build on valid region."""
    ref, tgt = make_fms(b=2, h=3, w=6, c=2, seed=3)
    max_disp = 3
    fixed = np.asarray(cat_volume(ref, tgt, max_disp=max_disp))
    vals = disp_sample_values(max_disp)
    disp_sample = np.broadcast_to(
        vals[None, :, None, None], (2, 3, 3, 6)).astype(np.float32)
    sampled = np.asarray(cat_volume(ref, tgt, max_disp=max_disp,
                                    disp_sample=disp_sample))
    np.testing.assert_allclose(sampled, fixed, atol=1e-5)


def test_cat_volume_subpixel_sample_interpolates():
    ref, tgt = make_fms(b=1, h=1, w=4, c=1, seed=4)
    disp_sample = np.full((1, 1, 1, 4), 0.5, np.float32)
    got = np.asarray(cat_volume(ref, tgt, max_disp=1, disp_sample=disp_sample))
    # x=2 gathers 0.5*tgt[1] + 0.5*tgt[2]
    want = 0.5 * (tgt[0, 0, 1, 0] + tgt[0, 0, 2, 0])
    np.testing.assert_allclose(got[0, 0, 0, 2, 1], want, atol=1e-6)
    # x=0 warps to -0.5: one tap out of frame -> half contribution
    np.testing.assert_allclose(got[0, 0, 0, 0, 1], 0.5 * tgt[0, 0, 0, 0],
                               atol=1e-6)


def test_dif_volume():
    ref, tgt = make_fms(seed=5)
    got = np.asarray(dif_volume(ref, tgt, max_disp=2))
    cat = naive_cat(ref, tgt, max_disp=2)
    want = cat[..., :2] - cat[..., 2:]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # normalized variant reduces channels with an L1 norm
    got_n = np.asarray(dif_volume(ref, tgt, max_disp=2, normalize=True))
    np.testing.assert_allclose(got_n, np.abs(want).sum(-1), atol=1e-6)


def test_correlation1d_volume():
    ref, tgt = make_fms(seed=6)
    got = np.asarray(correlation1d_volume(ref, tgt, max_disp=2))
    cat = naive_cat(ref, tgt, max_disp=2)
    dot = (cat[..., :2] * cat[..., 2:]).sum(-1)
    want = np.where(dot >= 0, dot, 0.1 * dot)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_volume_is_differentiable():
    import jax
    import jax.numpy as jnp
    ref, tgt = make_fms(b=1, h=2, w=4, c=1)
    ds = np.full((1, 2, 2, 4), 0.3, np.float32)

    def f(d):
        return jnp.sum(cat_volume(jnp.asarray(ref), jnp.asarray(tgt),
                                  max_disp=2, disp_sample=d) ** 2)

    g = jax.grad(f)(jnp.asarray(ds))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
