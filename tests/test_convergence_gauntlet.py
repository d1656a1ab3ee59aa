"""CPU-tiny convergence gauntlet: every family's SHIPPED loss path must
descend when trained (VERDICT r4 #2).

One test per family, each a miniature of tools/convergence_gauntlet.py
(which runs the real 300-step bf16 schedule on-chip): tiny model configs
(the dryrun's), a few train steps on the exact-GT synthetic generator,
asserting the loss drops materially and the eval EPE does not regress.
This is what proves AcfNet's cmn+focal path, DeepPruner's
quantile+PatchMatch path and AnyNet's SPN path actually TRAIN — not just
produce finite losses.

Training-behavior parity target:
dmb/modeling/stereo/models/general_stereo_model.py:60-78.
"""

import pytest

import __graft_entry__ as ge
from tools.convergence_gauntlet import run_stereo_family, run_flow_family

STEPS = 24
# CI variant: single-batch OVERFIT (noise-free monotone descent signal;
# the on-chip tools/convergence_gauntlet.py run uses the full stochastic
# schedule with held-out EPE instead)
KW = dict(steps=STEPS, batch=2, crop_hw=(64, 96), gen_hw=(96, 160),
          gen_max_disp=12, train_len=8, eval_len=2, log_every=4,
          overfit=True)


def _speed_overrides(cfg_factory=None, name=None, extra=None):
    """Tiny config + fast-descent optimizer (no warmup, higher lr)."""
    from densematchingbenchmark_tpu.configs import get_config
    cfg = cfg_factory() if cfg_factory else get_config(name)
    cfg["optimizer"]["lr"] = 2e-3
    cfg.setdefault("lr_schedule", {})["warmup_iters"] = 0
    if extra:
        cfg.update(extra)
    return cfg


def _check(r):
    assert r["loss_last"] < 0.7 * r["loss_first"], r
    assert r["epe_final"] < r["epe_init"], r


# (family, tiny-config factory from the dryrun)
STEREO = [
    ("PSMNet", ge._tiny_cfg),
    ("AcfNet-adaptive", ge._tiny_acfnet_cfg),
    ("GCNet", ge._tiny_gcnet_cfg),
    ("StereoNet-2stage", ge._tiny_stereonet_cfg),
    ("StereoNet-4stage", ge._tiny_stereonet4_cfg),
    ("AnyNet", None),
    ("DeepPruner-4x", ge._tiny_deeppruner_cfg),
    ("DeepPruner-8x", ge._tiny_deeppruner8_cfg),
]


@pytest.mark.parametrize("family,factory", STEREO,
                         ids=[f[0] for f in STEREO])
def test_stereo_family_converges(family, factory):
    cfg = _speed_overrides(factory, name="AnyNet/scene_flow")
    kw = dict(KW)
    if family == "DeepPruner-8x":
        # the Fast backbone's HWHourglass needs W/8 halvable twice
        kw.update(crop_hw=(64, 128), gen_hw=(96, 192))
    r = run_stereo_family(cfg, **kw)
    _check(r)


FLOW_KW = {k: v for k, v in KW.items() if k != "gen_max_disp"}


def test_pwcflow_converges():
    cfg = _speed_overrides(name="PWCFlow/flying_chairs")
    r = run_flow_family(cfg, **{**FLOW_KW, "max_flow": 4})
    _check(r)


def test_raft_converges():
    from densematchingbenchmark_tpu.configs import get_config
    cfg = get_config("RAFT/flying_chairs",
                     **{"model.iters": 4,
                        "model.losses.flow_l1_loss.weights":
                            (1.0, 1.0, 0.8, 0.64, 0.512)})
    cfg["optimizer"]["lr"] = 2e-3
    cfg.setdefault("lr_schedule", {})["warmup_iters"] = 0
    r = run_flow_family(cfg, **{**FLOW_KW, "max_flow": 4})
    _check(r)
