"""Test configuration.

Tests run CPU-only with an 8-device virtual mesh (SURVEY.md §4 item 4).

This box injects an axon TPU sitecustomize into every python process via
PYTHONPATH; it registers a remote-compile PJRT hook that intermittently
deadlocks XLA *CPU* compiles and slows them ~15x.  If we detect it, re-exec
the test process with a clean environment before jax is imported.
"""
import os
import sys

if "axon_site" in os.environ.get("PYTHONPATH", "") and "jax" not in sys.modules:
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"  # force off TPU: tests are CPU-only
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
