"""Launcher resolution for multi-host init (reference env.py:16-53 parity).

Pure-function tests of parallel.distributed.resolve_launcher — the
end-to-end 2-process path is covered by test_multihost_cli.py."""

import pytest

from densematchingbenchmark_tpu.parallel.distributed import (
    resolve_launcher, _first_slurm_node)


def test_none_launcher_single_process_is_noop():
    assert resolve_launcher("none") is None
    assert resolve_launcher(None) is None


def test_none_launcher_with_explicit_flags():
    kw = resolve_launcher("none", coordinator="h0:1234", num_processes=4,
                          process_id=2)
    assert kw == dict(coordinator_address="h0:1234", num_processes=4,
                      process_id=2)


def test_env_launcher_reads_torch_dist_vars(monkeypatch):
    monkeypatch.setenv("MASTER_ADDR", "worker-0")
    monkeypatch.setenv("MASTER_PORT", "29501")
    monkeypatch.setenv("WORLD_SIZE", "8")
    monkeypatch.setenv("RANK", "3")
    kw = resolve_launcher("env")
    assert kw == dict(coordinator_address="worker-0:29501",
                      num_processes=8, process_id=3)


def test_slurm_launcher(monkeypatch):
    monkeypatch.setenv("SLURM_NODELIST", "node[003-007,010]")
    monkeypatch.setenv("SLURM_NTASKS", "5")
    monkeypatch.setenv("SLURM_PROCID", "4")
    kw = resolve_launcher("slurm", port=29500)
    assert kw == dict(coordinator_address="node003:29500",
                      num_processes=5, process_id=4)


def test_explicit_flags_override_launcher(monkeypatch):
    monkeypatch.setenv("MASTER_ADDR", "worker-0")
    monkeypatch.setenv("WORLD_SIZE", "8")
    monkeypatch.setenv("RANK", "3")
    kw = resolve_launcher("env", coordinator="elsewhere:1", process_id=0)
    assert kw["coordinator_address"] == "elsewhere:1"
    assert kw["process_id"] == 0
    assert kw["num_processes"] == 8


def test_invalid_launcher_raises():
    with pytest.raises(ValueError):
        resolve_launcher("mpi")


@pytest.mark.parametrize("nodelist,first", [
    ("host1,host2", "host1"),
    ("prefix[003-007,010]", "prefix003"),
    ("single-host", "single-host"),
    ("gpu[12,15-17]", "gpu12"),
])
def test_first_slurm_node(nodelist, first):
    assert _first_slurm_node(nodelist) == first
