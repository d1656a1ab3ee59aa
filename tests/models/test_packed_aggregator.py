"""Parity: trunk-packed PSMAggregator == unpacked, sharing one param tree.

The packed trunk (PSMAggregator(pack=P)) is a pure MXU schedule change:
identical variable names/shapes, different conv lowering (ops/conv3d.py
packed kernels). Reference semantics target:
dmb/modeling/stereo/cost_processors/aggregators/PSMNet.py:9-95.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densematchingbenchmark_tpu.models.aggregators.psmnet import PSMAggregator
from densematchingbenchmark_tpu.models.aggregators.acfnet import AcfAggregator


def _mk(pack, return_low_res=True):
    return PSMAggregator(max_disp=64, batch_norm=True, dtype=jnp.float32,
                         return_low_res=return_low_res, pack=pack)


@pytest.mark.parametrize("pack", [2, 4])
def test_packed_psm_aggregator_eval_parity(pack):
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(1, 16, 8, 12, 16), jnp.float32)
    ref_mod, packed_mod = _mk(0), _mk(pack)
    variables = ref_mod.init(jax.random.PRNGKey(0), raw, train=False)
    pvars = packed_mod.init(jax.random.PRNGKey(0), raw, train=False)
    # identical variable trees (names, shapes, dtypes)
    ref_tree = jax.tree.map(lambda x: (x.shape, x.dtype), variables)
    packed_tree = jax.tree.map(lambda x: (x.shape, x.dtype), pvars)
    assert ref_tree == packed_tree

    ref = ref_mod.apply(variables, raw, train=False)
    got = packed_mod.apply(variables, raw, train=False)
    for r, g in zip(ref, got):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_packed_psm_aggregator_train_parity():
    """Train mode: outputs AND updated BN batch_stats match unpacked."""
    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.randn(2, 16, 8, 12, 16), jnp.float32)
    ref_mod, packed_mod = _mk(0), _mk(4)
    variables = ref_mod.init(jax.random.PRNGKey(0), raw, train=False)

    ref, ref_state = ref_mod.apply(variables, raw, train=True,
                                   mutable=["batch_stats"])
    got, got_state = packed_mod.apply(variables, raw, train=True,
                                      mutable=["batch_stats"])
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_state)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got_state))
    assert len(flat_r) == len(flat_g) > 0
    for path, leaf in flat_r:
        np.testing.assert_allclose(np.asarray(flat_g[path]),
                                   np.asarray(leaf), rtol=1e-4, atol=1e-4,
                                   err_msg=str(path))


def test_packed_psm_aggregator_grads():
    """Gradients through the packed schedule are finite and match unpacked."""
    rng = np.random.RandomState(2)
    raw = jnp.asarray(rng.randn(1, 16, 8, 8, 8), jnp.float32)
    ref_mod, packed_mod = _mk(0), _mk(4)
    variables = ref_mod.init(jax.random.PRNGKey(0), raw, train=False)

    def loss(params, mod):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            raw, train=True, mutable=["batch_stats"])
        return sum(jnp.mean(jnp.square(c)) for c in out)

    lr, gr = jax.value_and_grad(loss)(variables["params"], ref_mod)
    lp, gp = jax.value_and_grad(loss)(variables["params"], packed_mod)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(gr)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, leaf in flat_r:
        assert np.isfinite(np.asarray(flat_g[path])).all(), path
        np.testing.assert_allclose(np.asarray(flat_g[path]),
                                   np.asarray(leaf), rtol=2e-3, atol=2e-4,
                                   err_msg=str(path))


def test_packed_acf_aggregator_eval_parity():
    rng = np.random.RandomState(3)
    raw = jnp.asarray(rng.randn(1, 16, 8, 12, 16), jnp.float32)
    ref_mod = AcfAggregator(max_disp=64, pack=0)
    packed_mod = AcfAggregator(max_disp=64, pack=4)
    variables = ref_mod.init(jax.random.PRNGKey(0), raw, train=False)
    pvars = packed_mod.init(jax.random.PRNGKey(0), raw, train=False)
    assert (jax.tree.map(lambda x: (x.shape, x.dtype), variables)
            == jax.tree.map(lambda x: (x.shape, x.dtype), pvars))
    ref = ref_mod.apply(variables, raw, train=False)
    got = packed_mod.apply(variables, raw, train=False)
    for r, g in zip(ref, got):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_packed_fallback_when_not_divisible():
    """max_disp/4 not divisible by 4*pack -> silently runs unpacked."""
    rng = np.random.RandomState(4)
    raw = jnp.asarray(rng.randn(1, 8, 8, 8, 16), jnp.float32)  # d=8 % 16 != 0
    mod = PSMAggregator(max_disp=32, return_low_res=True, pack=4)
    variables = mod.init(jax.random.PRNGKey(0), raw, train=False)
    ref = PSMAggregator(max_disp=32, return_low_res=True, pack=0).apply(
        variables, raw, train=False)
    got = mod.apply(variables, raw, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_packed_gc_aggregator_eval_parity():
    from densematchingbenchmark_tpu.models.aggregators.gcnet import (
        GCAggregator)
    rng = np.random.RandomState(5)
    # depth 32 = max_disp/2; needs depth % 32 == 0 for pack=2 (4 s2 stages)
    raw = jnp.asarray(rng.randn(1, 32, 16, 16, 8), jnp.float32)
    ref_mod = GCAggregator(max_disp=64, in_planes=8, pack=0)
    packed_mod = GCAggregator(max_disp=64, in_planes=8, pack=2)
    variables = ref_mod.init(jax.random.PRNGKey(0), raw, train=False)
    pvars = packed_mod.init(jax.random.PRNGKey(0), raw, train=False)
    assert (jax.tree.map(lambda x: (x.shape, x.dtype), variables)
            == jax.tree.map(lambda x: (x.shape, x.dtype), pvars))
    ref = ref_mod.apply(variables, raw, train=False)
    got = packed_mod.apply(variables, raw, train=False)
    for r, g in zip(ref, got):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_packed_gc_aggregator_train_parity():
    from densematchingbenchmark_tpu.models.aggregators.gcnet import (
        GCAggregator)
    rng = np.random.RandomState(6)
    raw = jnp.asarray(rng.randn(1, 32, 16, 16, 8), jnp.float32)
    ref_mod = GCAggregator(max_disp=64, in_planes=8, pack=0)
    packed_mod = GCAggregator(max_disp=64, in_planes=8, pack=2)
    variables = ref_mod.init(jax.random.PRNGKey(0), raw, train=False)
    ref, ref_state = ref_mod.apply(variables, raw, train=True,
                                   mutable=["batch_stats"])
    got, got_state = packed_mod.apply(variables, raw, train=True,
                                      mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got_state))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_state):
        np.testing.assert_allclose(np.asarray(flat_g[path]),
                                   np.asarray(leaf), rtol=1e-4, atol=1e-4,
                                   err_msg=str(path))


def test_stereonet_aggregator_packed_matches_unpacked():
    """StereoNetAggregator pack=4 == pack=1 on identical params (pure MXU
    schedule change; reference aggregators/StereoNet.py:9-55 workload)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.models.aggregators.stereonet import (
        StereoNetAggregator)

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(2, 8, 8, 12, 6) * 0.3, jnp.float32)
    a1 = StereoNetAggregator(max_disp=64, num=4, batch_norm=True, pack=1)
    a4 = StereoNetAggregator(max_disp=64, num=4, batch_norm=True, pack=4)
    variables = a1.init(jax.random.PRNGKey(0), raw, train=False)

    # same variable tree across pack settings (checkpoint compatibility)
    v4 = a4.init(jax.random.PRNGKey(0), raw, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v4)

    r1 = a1.apply(variables, raw, train=False)
    r4 = a4.apply(variables, raw, train=False)
    np.testing.assert_allclose(np.asarray(r4[0]), np.asarray(r1[0]),
                               rtol=2e-4, atol=2e-4)

    # train mode: batch stats update identically
    _, s1 = a1.apply(variables, raw, train=True, mutable=["batch_stats"])
    _, s4 = a4.apply(variables, raw, train=True, mutable=["batch_stats"])
    for l1, l4 in zip(jax.tree.leaves(s1), jax.tree.leaves(s4)):
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=1e-4, atol=1e-5)


def test_edge_aware_refinement_rowpacked_matches_unpacked():
    """EdgeAwareRefinement pack=4 == pack=1 on identical params (row-packed
    2-D trunk; reference edge_aware.py:8-69 workload incl. dilations
    1,2,4,8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.models.refinement.stereonet import (
        EdgeAwareRefinement)

    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.rand(1, 32, 24, 3), jnp.float32)
    disp = jnp.asarray(rng.rand(1, 16, 12, 1) * 8, jnp.float32)
    r1 = EdgeAwareRefinement(batch_norm=True, pack=1)
    r4 = EdgeAwareRefinement(batch_norm=True, pack=4)
    variables = r1.init(jax.random.PRNGKey(0), disp, left, train=False)
    v4 = r4.init(jax.random.PRNGKey(0), disp, left, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v4)

    o1 = r1.apply(variables, disp, left, train=False)
    o4 = r4.apply(variables, disp, left, train=False)
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)

    # train-mode batch stats identical (PackedBatchNorm over true channels)
    _, s1 = r1.apply(variables, disp, left, train=True,
                     mutable=["batch_stats"])
    _, s4 = r4.apply(variables, disp, left, train=True,
                     mutable=["batch_stats"])
    for l1, l4 in zip(jax.tree.leaves(s1), jax.tree.leaves(s4)):
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=1e-4, atol=1e-5)


def test_psmnet_backbone_rowpacked_matches_unpacked():
    """PSMNetBackbone pack=4 (row-packed firstconv[1:] + layer1) == pack=1
    on identical params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.models.backbones.psmnet import (
        PSMNetBackbone)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    b1 = PSMNetBackbone(in_planes=3, batch_norm=True, pack=1)
    b4 = PSMNetBackbone(in_planes=3, batch_norm=True, pack=4)
    variables = b1.init(jax.random.PRNGKey(0), x, x, train=False)
    v4 = b4.init(jax.random.PRNGKey(0), x, x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v4)
    o1, _ = b1.apply(variables, x, x, train=False)
    o4, _ = b4.apply(variables, x, x, train=False)
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)


def test_deeppruner_refinement_head_rowpacked_matches_unpacked():
    """DeepPruner RefinementHead pack=4 == pack=1 on identical params
    (reference disp_refinement/DeepPruner.py:8-94 workload: dilations
    1,1,1,2,4,1 on [guide ‖ disp])."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.models.deeppruner import RefinementHead

    rng = np.random.RandomState(3)
    guide = jnp.asarray(rng.rand(1, 32, 24, 20), jnp.float32)
    disp = jnp.asarray(rng.rand(1, 32, 24, 1) * 8, jnp.float32)
    r1 = RefinementHead(batch_norm=True, pack=1)
    r4 = RefinementHead(batch_norm=True, pack=4)
    variables = r1.init(jax.random.PRNGKey(0), disp, guide, train=False)
    v4 = r4.init(jax.random.PRNGKey(0), disp, guide, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v4)
    o1 = r1.apply(variables, disp, guide, train=False)
    o4 = r4.apply(variables, disp, guide, train=False)
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)
    _, s1 = r1.apply(variables, disp, guide, train=True,
                     mutable=["batch_stats"])
    _, s4 = r4.apply(variables, disp, guide, train=True,
                     mutable=["batch_stats"])
    for l1, l4 in zip(jax.tree.leaves(s1), jax.tree.leaves(s4)):
        np.testing.assert_allclose(np.asarray(l4), np.asarray(l1),
                                   rtol=1e-4, atol=1e-5)


def test_anynet_refinement_rowpacked_matches_unpacked():
    """AnyNetRefinement pack=4 == pack=1 (gate-conv stack packed; SPN scan
    unpacked; reference disp_refinement/AnyNet.py:8-96 workload)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.models.refinement.anynet import (
        AnyNetRefinement)

    rng = np.random.RandomState(4)
    left = jnp.asarray(rng.rand(1, 64, 48, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, 64, 48, 3), jnp.float32)
    disp = jnp.asarray(rng.rand(1, 16, 12, 1) * 8, jnp.float32)
    r1 = AnyNetRefinement(batch_norm=True, pack=1)
    r4 = AnyNetRefinement(batch_norm=True, pack=4)
    variables = r1.init(jax.random.PRNGKey(0), [disp], None, None,
                        left, right, train=False)
    v4 = r4.init(jax.random.PRNGKey(0), [disp], None, None,
                 left, right, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v4)
    o1 = r1.apply(variables, [disp], None, None, left, right, train=False)
    o4 = r4.apply(variables, [disp], None, None, left, right, train=False)
    np.testing.assert_allclose(np.asarray(o4[0]), np.asarray(o1[0]),
                               rtol=2e-4, atol=2e-4)


def test_gc_aggregator_wpad_exact():
    """Masked W-pad schedule (GCAggregator.w_pad): padding W to a static
    alignment and re-zeroing pad columns after every unit is EXACT — every
    valid-region conv window sees identical operands (masked zeros ==
    implicit boundary pad zeros), at all 4 stride levels and the deconv
    chain. Eval-only schedule for XLA's W=624 tiling deficit
    (tools/microbench_gcnet_c19.py; DESIGN.md §9)."""
    from densematchingbenchmark_tpu.models.aggregators.gcnet import (
        GCAggregator)
    rng = np.random.RandomState(7)
    # W=48 pads to 64 at alignment 32; stride chain 48->24->12->6->3
    raw = jnp.asarray(rng.randn(1, 32, 16, 48, 8), jnp.float32)
    base = GCAggregator(max_disp=64, in_planes=8, pack=0)
    padded = GCAggregator(max_disp=64, in_planes=8, pack=0, w_pad=32)
    variables = base.init(jax.random.PRNGKey(0), raw, train=False)
    pvars = padded.init(jax.random.PRNGKey(0), raw, train=False)
    assert (jax.tree.map(lambda x: (x.shape, x.dtype), variables)
            == jax.tree.map(lambda x: (x.shape, x.dtype), pvars))
    ref = base.apply(variables, raw, train=False)
    got = padded.apply(variables, raw, train=False)
    for r, g in zip(ref, got):
        assert g.shape == r.shape, (g.shape, r.shape)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)

    # composes with the packed trunk (pk=2) and the phase-form head
    packed = GCAggregator(max_disp=64, in_planes=8, pack=2)
    packed_pad = GCAggregator(max_disp=64, in_planes=8, pack=2, w_pad=32)
    ref2 = packed.apply(variables, raw, train=False)
    got2 = packed_pad.apply(variables, raw, train=False)
    np.testing.assert_allclose(np.asarray(got2[0]), np.asarray(ref2[0]),
                               rtol=1e-5, atol=1e-5)

    ph = GCAggregator(max_disp=64, in_planes=8, pack=2, phase_argmin=True)
    ph_pad = GCAggregator(max_disp=64, in_planes=8, pack=2,
                          phase_argmin=True, w_pad=32)
    ref3 = ph.apply(variables, raw, train=False)
    got3 = ph_pad.apply(variables, raw, train=False)
    assert got3[0].shape == ref3[0].shape
    np.testing.assert_allclose(np.asarray(got3[0]), np.asarray(ref3[0]),
                               rtol=1e-5, atol=1e-5)

    # train mode ignores w_pad (BN batch stats must not see pad columns)
    t_ref, st_ref = base.apply(variables, raw, train=True,
                               mutable=["batch_stats"])
    t_got, st_got = padded.apply(variables, raw, train=True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t_got[0]), np.asarray(t_ref[0]),
                               rtol=1e-6, atol=1e-6)
