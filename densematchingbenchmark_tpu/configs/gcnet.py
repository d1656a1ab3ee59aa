"""GCNet configs. Parity: configs/GCNet/{scene_flow,kitti_2015}.py."""

import copy

from .psmnet import _apply_overrides, _BASE


def _base():
    cfg = copy.deepcopy(_BASE)
    cfg["model"].update(
        backbone=dict(type="GCNet", in_planes=3),
        cost_processor=dict(
            type="Concatenation",
            cost_computation=dict(max_disp=96, start_disp=0, dilation=1),
            # pack=2: trunk-packed MXU schedule (ops/conv3d.py). Besides the
            # per-conv speedup, packing is what makes full-res (384x1248)
            # GCNet compile at all on v5e: the unpacked 1-channel
            # ConvTranspose output tile-pads 128x in HBM and OOMs.
            # pack=2 + phase_argmin + split_concat: measured v5e 384x1248
            # b1 bf16: 211.1 (r3 baseline) -> 182.5 (phase head: the
            # full-res volume's only consumer is soft-argmin, so the
            # 28 ms 1-lane deconv head is computed in phase layout and
            # the volume never materializes except for vis, via DCE) ->
            # 155.5 ms (split_concat: the dense skip concats' stride-2
            # convs run as sum-of-sliced-kernel convs, killing ~27 ms of
            # concat/pad relayouts) -> 146.2 ms (phase head lane-widening:
            # out_blocks=4 lifts the head conv from 16 to 64 output
            # lanes). All are exact schedule changes
            # (tests/ops/test_phase_argmin.py).
            cost_aggregator=dict(type="GCNet", max_disp=192, in_planes=64,
                                 pack=2, phase_argmin=True),
        ),
        losses=dict(
            l1_loss=dict(max_disp=192, weights=(1.0,), weight=1.0),
        ),
    )
    cfg["data"]["batch_size_per_device"] = 1
    return cfg


def scene_flow(**overrides):
    return _apply_overrides(_base(), overrides)


def _kitti(dataset_type):
    cfg = _base()
    cfg["data"].update(type=dataset_type, sparse=True)
    cfg["data"]["eval"]["input_shape"] = (384, 1248)
    cfg["data"]["test"]["input_shape"] = (384, 1248)
    return cfg


def kitti_2015(**overrides):
    return _apply_overrides(_kitti("KITTI-2015"), overrides)


def kitti_2012(**overrides):
    """KITTI-2012 variant (dataset support exists in the reference at
    dmb/data/datasets/stereo/kitti/kitti_2012.py; no reference config)."""
    return _apply_overrides(_kitti("KITTI-2012"), overrides)
