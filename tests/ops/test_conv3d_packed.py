"""Parity: trunk-packed conv3d schedules == direct XLA conv3d.

Covers ops/conv3d.py pack_volume/unpack_volume, conv3d_packed (D-stride 1
and 2), and conv3d_transpose_packed against lax.conv_general_dilated on the
unpacked volume (reference semantics: torch Conv3d/ConvTranspose3d as used
by dmb/modeling/stereo/cost_processors/aggregators/PSMNet.py:9-95).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax import lax

from densematchingbenchmark_tpu.ops.conv3d import (
    pack_volume, unpack_volume, conv3d_packed, conv3d_transpose_packed)


def _dense(x, k, strides=(1, 1, 1), padding=(1, 1, 1), lhs_dil=(1, 1, 1),
           pads=None):
    return lax.conv_general_dilated(
        x, k, window_strides=strides,
        padding=pads if pads is not None else [(p, p) for p in padding],
        lhs_dilation=lhs_dil,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 5, 6, 3), jnp.float32)
    for pack in (2, 4):
        xp = pack_volume(x, pack)
        assert xp.shape == (2, 8 // pack, 5, 6, pack * 3)
        np.testing.assert_array_equal(np.asarray(unpack_volume(xp, pack)),
                                      np.asarray(x))
        # slot q of row r is depth r*pack + q
        np.testing.assert_array_equal(
            np.asarray(xp[:, 1, ..., 3:6]), np.asarray(x[:, pack + 1]))


@pytest.mark.parametrize("pack", [2, 4])
@pytest.mark.parametrize("hw", [(1, 1, (1, 1)), (2, 2, (1, 1))])
def test_conv3d_packed_parity(pack, hw):
    sh, sw, (ph, pw) = hw
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 9, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 7) * 0.2, jnp.float32)
    for sd in (1, 2):
        ref = _dense(x, k, strides=(sd, sh, sw), padding=(1, ph, pw))
        got = unpack_volume(
            conv3d_packed(pack_volume(x, pack), k, pack,
                          strides=(sd, sh, sw), padding=(1, ph, pw)), pack)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pack", [2, 4])
def test_conv3d_transpose_packed_parity(pack):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 5, 6, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6) * 0.2, jnp.float32)
    # reference: ConvTransposeExact's formulation (k3 s2 p1 op1, unflipped)
    ref = _dense(x, k, lhs_dil=(2, 2, 2), pads=[(1, 2)] * 3)
    got = unpack_volume(
        conv3d_transpose_packed(pack_volume(x, pack), k, pack), pack)
    assert got.shape == ref.shape == (2, 16, 10, 12, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_packed_hpack_route_parity_and_grad():
    """ci >= 2*co auto-routes stride-1 convs to conv3d_hpack (the route
    PSMNet's 64->32 entry conv takes in production) — parity + gradients.
    ADVICE r1: this branch was previously untested (tests used ci=5/co=7).
    """
    import jax
    from densematchingbenchmark_tpu.ops import conv3d as c3

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 6, 7, 64) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 64, 32) * 0.05, jnp.float32)
    assert c3.get_packed_schedules()["s1"] == "auto"

    def packed_sum(k_, sched):
        c3.set_packed_schedules(s1=sched)
        try:
            y = conv3d_packed(pack_volume(x, 4), k_, 4)
        finally:
            c3.set_packed_schedules(s1="auto")
        return y

    ref = _dense(x, k)
    got = unpack_volume(packed_sum(k, "auto"), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the hpack form is what "auto" picks here; check it differs from win3
    # only numerically-not-at-all (forced schedules agree)
    got_win3 = unpack_volume(packed_sum(k, "win3"), 4)
    got_hpack = unpack_volume(packed_sum(k, "hpack"), 4)
    np.testing.assert_allclose(np.asarray(got_hpack), np.asarray(got_win3),
                               rtol=1e-4, atol=1e-4)

    # gradient parity through the halo/packed index math
    gref = jax.grad(lambda k_: jnp.sum(_dense(x, k_) ** 2))(k)
    ghpk = jax.grad(lambda k_: jnp.sum(packed_sum(k_, "hpack") ** 2))(k)
    np.testing.assert_allclose(np.asarray(ghpk), np.asarray(gref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("h", [16, 32])
def test_conv3d_packed_classify_route_parity(h):
    """co=1 k3/s1/p1 routes to the H-opacked classify form when H % hq == 0
    (hq picked largest of 32/16/8); parity vs dense + vs forced win3."""
    from densematchingbenchmark_tpu.ops import conv3d as c3

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, h, 5, 6) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 6, 1) * 0.1, jnp.float32)
    xp = pack_volume(x, 4)

    ref = _dense(x, k)
    got = unpack_volume(conv3d_packed(xp, k, 4), 4)  # classify='hq' default
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    c3.set_packed_schedules(classify="win3")
    try:
        got_w3 = unpack_volume(conv3d_packed(xp, k, 4), 4)
    finally:
        c3.set_packed_schedules(classify="hq")
    np.testing.assert_allclose(np.asarray(got_w3), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_hpack_classify_benchform_parity():
    """The bench-only halo classify form (never dispatched) stays correct."""
    from densematchingbenchmark_tpu.ops.conv3d import conv3d_hpack_classify

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 16, 5, 6) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 6, 1) * 0.1, jnp.float32)
    ref = _dense(x, k)
    got = unpack_volume(conv3d_hpack_classify(pack_volume(x, 4), k, 4, 8), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pack,dil", [(4, 1), (4, 2), (4, 4), (4, 8),
                                      (2, 3)])
def test_conv2d_rowpacked_parity(pack, dil):
    """Row-packed 2-D dilated conv == dense conv2d (pad = dilation), the
    schedule for full-res refinement/backbone convs (reference
    edge_aware.py dilations 1,2,4,8)."""
    import jax
    from densematchingbenchmark_tpu.ops.conv3d import (
        pack_rows2d, unpack_rows2d, conv2d_rowpacked)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 11, 5) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 5, 6) * 0.2, jnp.float32)
    ref = lax.conv_general_dilated(
        x, k, (1, 1), [(dil, dil), (dil, dil)], rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpack_rows2d(
        conv2d_rowpacked(pack_rows2d(x, pack), k, pack, (dil, dil)), pack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # gradients route through the block-sparse packed kernel correctly
    gref = jax.grad(lambda k_: jnp.sum(lax.conv_general_dilated(
        x, k_, (1, 1), [(dil, dil), (dil, dil)], rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2))(k)
    gpk = jax.grad(lambda k_: jnp.sum(conv2d_rowpacked(
        pack_rows2d(x, pack), k_, pack, (dil, dil)) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gpk), np.asarray(gref),
                               rtol=1e-3, atol=1e-3)


def test_te_classify_matches_win3():
    """Tap-expansion classify (1x1 true-MAC conv + 9 shifted adds) ==
    window-3 packed classify, f32, incl. all boundary pixels."""
    import numpy as np
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.ops import conv3d as c3

    from jax import lax
    rng = np.random.RandomState(7)
    pack, ci = 4, 8
    xp = jnp.asarray(rng.randn(2, 3, 8, 10, pack * ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, 1), jnp.float32)
    # window-3 packed form, dispatch-free
    win3 = lax.conv_general_dilated(
        xp, c3.dpack_kernel(k, pack), window_strides=(1, 1, 1),
        padding=[(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    te = c3.conv3d_packed_classify_te(xp, k, pack)
    np.testing.assert_allclose(np.asarray(te), np.asarray(win3),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pack,ci,co", [(2, 8, 4), (2, 4, 4), (4, 8, 8)])
def test_conv3d_shalo_parity_and_grad(pack, ci, co):
    """Split-halo form == hpack == dense conv3d, values AND gradients.

    conv3d_shalo evaluates the same banded depth contraction as
    conv3d_hpack (identical dense MACs) but with no halo-widened input
    materialization — the GCNet c19/c20 copies fix (DESIGN.md §9,
    reference aggregators/GCNet.py:31-37 workload)."""
    import jax
    from densematchingbenchmark_tpu.ops.conv3d import (conv3d_hpack,
                                                       conv3d_shalo)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6, 8, 10, pack * ci) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, jnp.float32)
    ref = conv3d_hpack(x, k, pack)
    got = conv3d_shalo(x, k, pack)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradients route to the true kernel through all three split kernels
    gr = jax.grad(lambda k_: jnp.sum(jnp.sin(conv3d_hpack(x, k_, pack))))(k)
    gs = jax.grad(lambda k_: jnp.sum(jnp.sin(conv3d_shalo(x, k_, pack))))(k)
    # (grad reassociates the three-conv sum — float noise, not structure)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-3, atol=1e-4)
