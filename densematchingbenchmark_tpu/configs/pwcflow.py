"""PWCFlow config (optical flow on FlyingChairs).

No reference parity target: the reference registers zero flow models
(dmb/modeling/flow/models/__init__.py:2-4) — this config exercises the
capability extension. Data fields follow the reference's FlyingChairs
dataset scaffolding (dmb/data/datasets/flow/flying_chairs/base.py:9-44).
"""

import copy

from .psmnet import _apply_overrides, _BASE


def flying_chairs(**overrides):
    cfg = copy.deepcopy(_BASE)
    cfg["task"] = "flow"
    cfg["model"] = dict(
        meta_architecture="PWCFlow",
        chans=(16, 32, 64, 96),
        radius=4,
        hidden=96,
        batch_norm=True,
        dtype="float32",
        losses=dict(
            flow_l1_loss=dict(
                # best-first: full-res, then pyramid fine -> coarse
                weights=(1.0, 1.0, 0.5, 0.25, 0.125),
                weight=1.0,
            ),
        ),
        eval=dict(sparse=False),
    )
    cfg["data"].update(
        type="FlyingChairs",
        # FlyingChairs native resolution 384x512; crop divisible by 2**4.
        crop_size=(320, 448),
        pad_to_size=(384, 512),
        batch_size_per_device=8,
    )
    cfg["optimizer"].update(type="adam", lr=1e-4)
    cfg["total_epochs"] = 30
    return _apply_overrides(cfg, overrides)


def raft_flying_chairs(**overrides):
    """RAFT-style recurrent flow (second flow family; the reference
    registers zero — flow/raft.py docstring). Sequence loss: final convex
    upsample at weight 1.0, then the per-iteration flows with the RAFT
    gamma=0.8 decay, latest iteration first."""
    iters = 8
    cfg = flying_chairs()
    cfg["model"] = dict(
        meta_architecture="RAFTFlow",
        iters=iters,
        radius=3,
        levels=4,
        hidden=96,
        context=64,
        batch_norm=True,
        dtype="float32",
        losses=dict(
            flow_l1_loss=dict(
                weights=(1.0,) + tuple(0.8 ** k for k in range(iters)),
                weight=1.0,
            ),
        ),
        eval=dict(sparse=False),
    )
    cfg["optimizer"].update(type="adam", lr=4e-4)
    return _apply_overrides(cfg, overrides)
