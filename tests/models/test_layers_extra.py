"""Tests for extra layers (Hourglass2D, DilatedHourglass3D, DenseASPP,
WarpErrorRefinement) and the generic Registry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.models.layers_extra import (
    Hourglass2D, DilatedHourglass3D, DenseAspp)
from densematchingbenchmark_tpu.models.refinement.warp_error import (
    WarpErrorRefinement)
from densematchingbenchmark_tpu.utils.registry import Registry


def test_hourglass2d_shapes():
    m = Hourglass2D(8)
    x = jnp.zeros((1, 16, 16, 8))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out, pre, post = m.apply(vars_, x)
    assert out.shape == (1, 16, 16, 8)
    assert pre.shape == (1, 8, 8, 16) and post.shape == (1, 8, 8, 16)


def test_dilated_hourglass3d_shapes():
    m = DilatedHourglass3D(4)
    x = jnp.zeros((1, 8, 8, 8, 4))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out, pre, post = m.apply(vars_, x)
    assert out.shape == (1, 8, 8, 8, 4)
    assert pre.shape == (1, 4, 4, 4, 8)


def test_dense_aspp():
    m = DenseAspp(in_planes=16, out_planes=8)
    x = jnp.zeros((1, 16, 16, 16))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 16, 16, 8)


def test_warp_error_refinement():
    m = WarpErrorRefinement(C=4)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, 16, 16, 8), jnp.float32)
    right = jnp.asarray(rng.rand(1, 16, 16, 8), jnp.float32)
    disp = jnp.asarray(rng.rand(1, 8, 8, 1) * 4, jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), disp, left, right)
    out = m.apply(vars_, disp, left, right)
    assert out.shape == (1, 16, 16, 1)
    assert (np.asarray(out) >= 0).all()


def test_registry():
    reg = Registry("test")

    @reg.register
    class Foo:
        pass

    @reg.register("Bar")
    class Baz:
        pass

    assert reg["Foo"] is Foo and reg["Bar"] is Baz
    with pytest.raises(KeyError):
        reg.register("Foo", Foo)
