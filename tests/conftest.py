"""Test harness config: force an 8-device virtual CPU mesh (SURVEY.md §4d).

Must run before jax is imported anywhere: tests exercise the sharded code
paths without a pod, per the standard
``xla_force_host_platform_device_count`` trick.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Force the CPU backend (override even if the site config registered a TPU
# platform at interpreter start): the suite needs the 8-device virtual mesh.
# Set TERRA_TEST_PLATFORM=tpu to run on the real accelerator instead (the
# device may register under a platform name other than "tpu" — e.g. the
# relay here registers "axon" — so "tpu" means "leave the site default").
_platform = os.environ.get("TERRA_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = _platform
    jax.config.update("jax_platforms", _platform)
jax.config.update("jax_threefry_partitionable", True)
