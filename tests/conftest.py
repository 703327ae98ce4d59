"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware (SURVEY.md §4 item 4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off TPU: tests are CPU-only
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
