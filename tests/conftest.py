"""Test configuration.

Tests run CPU-only with an 8-device virtual mesh (SURVEY.md §4 item 4).

This box injects an axon TPU sitecustomize into every python process via
PYTHONPATH; it registers a remote-compile PJRT hook that intermittently
deadlocks XLA *CPU* compiles and slows them ~15x.  If we detect it, re-exec
the test process with a clean environment before jax is imported.
"""
import os
import sys

if ("axon_site" in os.environ.get("PYTHONPATH", "")
        and os.environ.get("REFIGN_TPU_CLEAN_REEXEC") != "1"):
    # pytest has already redirected fds 1/2 into capture tempfiles; restore
    # the real stdio first or the re-exec'd run's output vanishes.
    try:
        import gc
        from _pytest.capture import CaptureManager
        for _obj in gc.get_objects():
            if isinstance(_obj, CaptureManager):
                _obj.suspend_global_capture(in_=True)
                break
    except Exception:
        pass
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["REFIGN_TPU_CLEAN_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"  # force off TPU: tests are CPU-only
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---- fast tier (-m fast) --------------------------------------------------
# The full suite is ~55 min on this 1-core box (VERDICT r3 weak #7); the
# fast tier must stay <5 min so it keeps being run on every change.  Module
# granularity: the slow set is the torch-oracle goldens, the e2e CLI drives,
# and the multi-device/train-loop integration tests — everything else
# (kernels, ops, losses, loaders, configs, transforms, metrics units) is
# fast.  New golden/e2e modules must be added here.
SLOW_MODULES = {
    "test_e2e_cli", "test_matching_data", "test_multidevice",
    "test_uda_train", "test_uawarpc", "test_segmentor",
    "test_full_pipeline_golden", "test_hrda_train_golden",
    "test_trajectory_golden", "test_align_trajectory_golden",
    "test_refign_trajectory_golden", "test_mit_golden",
    "test_pretrained", "test_checkpoint_interop", "test_resnet",
    "test_alignment", "test_convergence",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(pytest.mark.slow if mod in SLOW_MODULES
                        else pytest.mark.fast)
