"""Data pipeline tests: IO round-trips, transforms, sampler, loader."""

import json
import os

import numpy as np
import pytest

from densematchingbenchmark_tpu.data import (
    SyntheticStereoDataset, SceneFlowDataset, DataLoader, EpochSampler,
    transforms, io)


def test_pfm_roundtrip(tmp_path):
    disp = np.random.RandomState(0).rand(17, 23).astype(np.float32) * 100
    path = str(tmp_path / "d.pfm")
    io.save_pfm(path, disp)
    back, scale = io.load_pfm(path)
    np.testing.assert_allclose(back, disp, atol=1e-6)


def test_kitti_png_roundtrip(tmp_path):
    disp = np.round(np.random.RandomState(0).rand(16, 16) * 100 * 256) / 256
    path = str(tmp_path / "d.png")
    io.save_kitti_disp(path, disp.astype(np.float32))
    back = io.load_kitti_disp(path)
    np.testing.assert_allclose(back, disp, atol=1 / 256)


def test_scene_flow_dataset_json_annotations(tmp_path):
    """Reference-format JSON annotations load unchanged."""
    from imageio import imwrite
    img = (np.random.RandomState(0).rand(8, 12, 3) * 255).astype(np.uint8)
    imwrite(str(tmp_path / "l.png"), img)
    imwrite(str(tmp_path / "r.png"), img)
    io.save_pfm(str(tmp_path / "d.pfm"), np.ones((8, 12), np.float32) * 3)
    ann = [dict(left_image_path="l.png", right_image_path="r.png",
                left_disp_map_path="d.pfm")]
    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as fp:
        json.dump(ann, fp)
    ds = SceneFlowDataset(ann_path, str(tmp_path))
    s = ds[0]
    assert s["leftImage"].shape == (8, 12, 3)
    assert s["leftDisp"].shape == (8, 12, 1)
    np.testing.assert_allclose(s["leftDisp"], 3.0)
    assert s["original_size"] == (8, 12)


def test_synthetic_dataset_gt_is_exact():
    """left[y, x] == right[y, x - d] — matching at GT disparity is perfect."""
    ds = SyntheticStereoDataset(length=2, height=32, width=64, max_disp=8)
    s = ds[0]
    l, r, d = s["leftImage"], s["rightImage"], s["leftDisp"][..., 0]
    h, w = d.shape
    err = 0.0
    cnt = 0
    for y in range(0, h, 5):
        for x in range(int(d.max()), w):
            err += np.abs(l[y, x] - r[y, x - int(d[y, x])]).sum()
            cnt += 1
    assert err / cnt < 1e-4


def test_transforms_pipeline():
    ds = SyntheticStereoDataset(length=1, height=32, width=64, max_disp=8)
    s = ds[0]
    rng = np.random.default_rng(0)
    t = transforms.make_train_transform((16, 32), (128.,) * 3, (64.,) * 3)
    out = t(s, rng)
    assert out["leftImage"].shape == (16, 32, 3)
    assert out["leftDisp"].shape == (16, 32, 1)
    te = transforms.make_eval_transform((48, 80), (128.,) * 3, (64.,) * 3)
    out = te(ds[0])
    assert out["leftImage"].shape == (48, 80, 3)
    # pad is top+right: bottom-left corner preserved
    orig = (ds[0]["leftImage"] - 128.) / 64.
    np.testing.assert_allclose(out["leftImage"][-32:, :64], orig, atol=1e-5)
    # disparity zero-padded the same way (pad_disp default, static shapes)
    assert out["leftDisp"].shape == (48, 80, 1)
    assert out["leftDisp"][:16].max() == 0.0  # padded rows invalid
    np.testing.assert_allclose(out["leftDisp"][-32:, :64],
                               ds[0]["leftDisp"])


def test_epoch_sampler_shards_and_determinism():
    s0 = EpochSampler(10, 4, shuffle=True, num_shards=2, shard_id=0, seed=1)
    s1 = EpochSampler(10, 4, shuffle=True, num_shards=2, shard_id=1, seed=1)
    a0, a1 = s0.epoch_indices(3), s1.epoch_indices(3)
    assert a0.shape == (3, 2) and a1.shape == (3, 2)
    # shards are disjoint per step and together cover the padded epoch
    full = np.concatenate([a0, a1], axis=1).ravel()
    assert len(full) == 12
    assert set(full) == set(range(10))  # padding wraps, all covered
    # deterministic across constructions
    np.testing.assert_array_equal(a0, EpochSampler(
        10, 4, True, 2, 0, seed=1).epoch_indices(3))
    # different epochs differ
    assert not np.array_equal(a0, s0.epoch_indices(4))


def test_dataloader_batches():
    ds = SyntheticStereoDataset(length=6, height=32, width=64, max_disp=8)
    t = transforms.make_train_transform((16, 32), (128.,) * 3, (64.,) * 3)
    ds.transform = t
    loader = DataLoader(ds, global_batch=2, num_workers=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["leftImage"].shape == (2, 16, 32, 3)
        assert b["leftDisp"].shape == (2, 16, 32, 1)
    # determinism: same epoch -> same batches
    again = list(loader.epoch(0))
    np.testing.assert_allclose(batches[0]["leftImage"],
                               again[0]["leftImage"])


def test_grouped_epoch_sampler_semantics_and_determinism():
    """GroupedEpochSampler: every batch single-group, all samples covered,
    deterministic in (seed, epoch), distinct across epochs, and shards
    partition each batch (reference DistributedGroupSampler semantics,
    dmb/data/loaders/samplers.py:12-159)."""
    import numpy as np
    from densematchingbenchmark_tpu.data.sampler import GroupedEpochSampler

    n, gb = 23, 4
    flags = np.asarray([0, 1] * 11 + [0])  # 12 zeros, 11 ones
    s = GroupedEpochSampler(n, gb, flags, seed=3)
    idx = s.epoch_indices(0)
    assert idx.shape == (s.steps_per_epoch(), gb)
    assert s.steps_per_epoch() == 3 + 3  # ceil(12/4) + ceil(11/4)
    # every batch drawn from exactly one aspect group
    for row in idx:
        assert len({int(flags[i]) for i in row}) == 1, row
    # full coverage (wrap-padding duplicates allowed)
    assert set(idx.ravel()) == set(range(n))
    # determinism + epoch variation
    np.testing.assert_array_equal(idx, GroupedEpochSampler(
        n, gb, flags, seed=3).epoch_indices(0))
    assert not np.array_equal(idx, s.epoch_indices(1))

    # two shards partition each global batch, preserving the group property
    sh0 = GroupedEpochSampler(n, gb, flags, num_shards=2, shard_id=0,
                              seed=3).epoch_indices(0)
    sh1 = GroupedEpochSampler(n, gb, flags, num_shards=2, shard_id=1,
                              seed=3).epoch_indices(0)
    recombined = np.concatenate([sh0, sh1], axis=1)
    np.testing.assert_array_equal(np.sort(recombined, 1), np.sort(idx, 1))


def test_loader_group_flags_round_trip():
    """DataLoader(group_flags=...) yields homogeneous-group batches."""
    import numpy as np
    from densematchingbenchmark_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i, rng=None):
            return {"leftImage": np.full((4, 4, 3), i, np.float32),
                    "rightImage": np.zeros((4, 4, 3), np.float32),
                    "original_size": (4, 4)}

    flags = np.asarray([0] * 5 + [1] * 5)
    loader = DataLoader(DS(), 2, group_flags=flags, num_workers=2)
    for batch in loader.epoch(0):
        ids = batch["leftImage"][:, 0, 0, 0].astype(int)
        assert len({int(flags[i]) for i in ids}) == 1, ids
