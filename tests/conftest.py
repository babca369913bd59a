"""Test configuration: force an 8-device virtual CPU mesh.

The environment ships an `axon` TPU plugin that a sitecustomize registers at
interpreter start (JAX_PLATFORMS=axon with remote compilation — very slow for
tests). We hard-override to CPU *and* update jax.config in case jax was
already imported by site customization.

The reference never tests its distributed paths (SURVEY.md §4); we do, via
CPU-device emulation with 8 virtual devices.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
