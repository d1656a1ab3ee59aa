"""Test env: CPU backend with 8 virtual devices, repo root on sys.path.

Runs before any test imports jax. Two subtleties of this machine:
- The axon TPU plugin (sitecustomize) force-sets jax_platforms=axon,cpu at
  interpreter start, overriding the JAX_PLATFORMS env var — so we must
  override via jax.config after import, before any backend initializes.
  Tests must NOT touch the real TPU: the tunnel is a single-client resource
  and every eager op would round-trip through it.
- XLA_FLAGS must be set before the CPU backend is created to get the
  8-device virtual mesh for sharding tests.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
