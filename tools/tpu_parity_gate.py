"""On-chip parity gate for every shipped-ENABLED custom schedule.

VERDICT r3 #7: Pallas/packed schedules are interpret-mode parity-tested in
CI, but a schedule that ships ON needs an on-chip numerics gate too — run
this at the top of every A/B session so perf flips can't silently ship
wrong numbers. Each gate builds the same model with the schedule ON vs
OFF, applies IDENTICAL weights to identical random inputs on the real
device, and asserts the disparity outputs agree.

Shipped-enabled schedules gated here (configs/*.py defaults):
  - PSMNet/AcfNet trunk-packed 3-D aggregation (cost_aggregator.pack=4)
  - PSMNet backbone row-packed 2-D section (backbone.pack=4)
  - StereoNet edge-aware refinement row-pack (disp_refinement.pack=4)
  - DeepPruner windowed-tent PatchMatch scoring (disp_sampler.scoring)
  - GCNet trunk pack=2 (at a reduced shape where unpacked also compiles)

Gates run in f32 with jax_default_matmul_precision=highest so every
mismatch is schedule-caused, not dtype noise: TPU f32 convs otherwise
multiply in bf16 (f32-accumulate), and that rounding differs per schedule
— amplified to whole pixels by soft-argmin over near-uniform random-weight
costs (first gate run measured rel ~1e-2 = exactly bf16 epsilon; forcing
highest precision collapses it).
Usage: python tools/tpu_parity_gate.py [--shape 256x640] [--tol 2e-3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pair(cfg_name, on_overrides, off_overrides, h, w, seed=0):
    """Build (schedule-on, schedule-off) models, share weights, diff disp."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    base = {"model.dtype": "float32"}
    cfg_on = get_config(cfg_name, **base, **on_overrides)
    cfg_off = get_config(cfg_name, **base, **off_overrides)
    m_on, m_off = build_model(cfg_on), build_model(cfg_off)

    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = m_on.init(jax.random.PRNGKey(0), small, small, train=False)

    rng = np.random.RandomState(seed)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)

    f_on = jax.jit(lambda l, r: m_on.apply(variables, l, r,
                                           train=False)["disps"][0])
    f_off = jax.jit(lambda l, r: m_off.apply(variables, l, r,
                                             train=False)["disps"][0])
    a = np.asarray(f_on(left, right))
    b = np.asarray(f_off(left, right))
    err = np.max(np.abs(a - b))
    rel = err / max(np.max(np.abs(b)), 1e-6)
    return float(err), float(rel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="256x640",
                    help="HxW for the full-model gates")
    ap.add_argument("--tol", type=float, default=2e-3,
                    help="max-abs disparity tolerance (px)")
    args = ap.parse_args()
    h, w = (int(x) for x in args.shape.split("x"))

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    gates = [
        ("psmnet_packed_trunk+backbone_rowpack", "PSMNet/scene_flow",
         {},  # shipped: cost_aggregator.pack=4, backbone.pack=4
         {"model.cost_processor.cost_aggregator.pack": 0,
          "model.backbone.pack": 0}, h, w),
        ("acfnet_packed_trunk", "AcfNet/scene_flow_adaptive",
         {},
         {"model.cost_processor.cost_aggregator.pack": 0,
          "model.backbone.pack": 0}, h, w),
        ("stereonet_refinement_rowpack", "StereoNet/scene_flow_8x_4stage",
         {},  # shipped: disp_refinement.pack=4
         {"model.disp_refinement.pack": 0}, h, w),
        # Tent scoring reassociates the matching dots (integer-shift corr
        # volume contracted with static tents vs warp-then-dot) through 3
        # softmax-selection PatchMatch iterations; measured on-chip f32
        # residual at highest precision is ~3e-3 px on the 192 px range
        # (1.5e-5 of range) — reassociation dust, so this gate carries its
        # own tolerance. A wrong schedule fails by whole pixels.
        ("deeppruner_tent_scoring", "DeepPruner/scene_flow_4x",
         {},  # shipped: disp_sampler.scoring='corr'
         {"model.disp_sampler.scoring": "warp"}, h, w, 1e-2),
        # GCNet: unpacked does not compile at full res (DESIGN.md §7) —
        # gate pack=2 vs unpacked at a reduced-but-real shape.
        ("gcnet_pack2_trunk", "GCNet/scene_flow",
         {},  # shipped: cost_aggregator.pack=2
         {"model.cost_processor.cost_aggregator.pack": 0},
         min(h, 192), min(w, 640)),
    ]

    failures = []
    for gate in gates:
        name, cfg_name, on_ov, off_ov, gh, gw = gate[:6]
        tol = gate[6] if len(gate) > 6 else args.tol
        try:
            err, rel = run_pair(cfg_name, on_ov, off_ov, gh, gw)
            ok = err <= tol
            print(f"{'PASS' if ok else 'FAIL'} {name:42s} "
                  f"max_abs={err:.2e} px  rel={rel:.2e}  @{gh}x{gw}")
            if not ok:
                failures.append(name)
        except Exception as e:  # a gate that can't run must not pass silently
            print(f"ERROR {name:41s} {type(e).__name__}: {e}")
            failures.append(name)

    if failures:
        print(f"\nPARITY GATE FAILED: {failures}")
        return 1
    print("\nAll shipped schedules parity-clean on this device.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
