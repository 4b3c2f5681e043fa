"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run without TPU hardware (SURVEY.md §4 implication)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
