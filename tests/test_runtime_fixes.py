"""Regression tests for runtime-layer review fixes (round 3, wave 4).

Each test pins a behavior found broken by review against the reference:
shard_batch divisibility fallback, reference-schema callback cadence,
CLI override guards, logger-list workdir parsing, and the drop-half
semi-supervised assert (reference combined_data_module.py:301-303).
"""
import numpy as np
import pytest

import jax

from refign_tpu.parallel.mesh import make_mesh, shard_batch


def test_shard_batch_replicates_non_divisible_axes():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(devs[:2])
    b = shard_batch(mesh, {"even": np.ones((4, 3)), "odd": np.ones((3, 2))})
    assert not b["even"].sharding.is_fully_replicated
    assert b["odd"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(b["odd"]), np.ones((3, 2)))


def test_fit_bookkeeper_honors_callback_cadence(tmp_path):
    from refign_tpu.train.loop import FitBookkeeper
    bk = FitBookkeeper(str(tmp_path), {
        "max_steps": 100,
        "callbacks": [
            {"class_path": "pytorch_lightning.callbacks.LearningRateMonitor",
             "init_args": {"logging_interval": "step"}},
            {"class_path": "helpers.callbacks.ValEveryNSteps",
             "init_args": {"every_n_steps": 7}},
        ]}, lambda s: 0.1, lambda hs: {}, 40000)
    assert bk.val_every == 7
    # explicit key still wins
    bk2 = FitBookkeeper(str(tmp_path), {
        "max_steps": 100, "val_every_n_steps": 5,
        "callbacks": [{"class_path": "helpers.callbacks.ValEveryNSteps",
                       "init_args": {"every_n_steps": 7}}]},
        lambda s: 0.1, lambda hs: {}, 40000)
    assert bk2.val_every == 5


def test_cli_override_rejects_unknown_section():
    from refign_tpu.cli import _apply_override
    cfg = {"trainer": {"max_steps": 10}, "model": {"init_args": {}}}
    with pytest.raises(SystemExit, match="no section"):
        _apply_override(cfg, "trianer.max_steps", "5")
    # introducing a new leaf under an existing section is allowed (warns)
    _apply_override(cfg, "model.init_args.use_align", "false")
    assert cfg["model"]["init_args"]["use_align"] is False


def test_cli_workdir_accepts_logger_list(tmp_path):
    """Reference configs define trainer.logger as a LIST
    (refign_hrda_star.yaml:165-169); deriving the workdir must not crash.
    Exercised through main() with a config that fails AFTER workdir
    derivation (unknown model) to keep the test hermetic."""
    import yaml
    from refign_tpu.cli import main
    cfg = {
        "trainer": {"logger": [
            {"class_path": "pytorch_lightning.loggers.TensorBoardLogger",
             "init_args": {"save_dir": str(tmp_path / "logs")}}]},
        "model": {"class_path": "does.not.Exist", "init_args": {}},
        "data": {"class_path": "data_modules.CombinedDataModule",
                 "init_args": {"load_config": {}}},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="Exist|unknown"):
        main(["fit", "--config", str(p)])


def test_drop_half_requires_semi_supervised():
    from refign_tpu.data.module import CombinedDataModule
    dm = CombinedDataModule.__new__(CombinedDataModule)
    dm.ignore_every_second_semantic_training_batch = True
    dm.batch_size = 4
    dm.stage_on = {"train": ["A", "B"]}
    sub = [{"image": np.ones((2, 8, 8, 3)), "semantic": np.ones((2, 8, 8))},
           {"image": np.ones((2, 8, 8, 3)), "semantic": np.ones((2, 8, 8))}]
    # two labeled sources: full merge passes, probe variant is deterministic
    full = dm.merge_train_batch(sub, drop_half=False)
    assert full["image_src"].shape[0] == 4
    # single labeled source: reference asserts (combined_data_module:301)
    dm.stage_on = {"train": ["A"]}
    single = [{"image": np.ones((2, 8, 8, 3)),
               "semantic": np.ones((2, 8, 8))}]
    with pytest.raises(AssertionError, match="semi-supervised"):
        dm.merge_train_batch(single)


def test_align_host_batch_concatenates_all_loaders():
    from refign_tpu.tasks.align_task import _host_batch_from
    raw = [{"image": np.ones((2, 4, 4, 3)), "image_ref": np.ones((2, 4, 4, 3))},
           {"image": np.zeros((1, 4, 4, 3)),
            "image_ref": np.zeros((1, 4, 4, 3))}]
    out = _host_batch_from(raw)
    assert out["image_trg"].shape[0] == 3
    assert out["image_ref"].shape[0] == 3
    assert out["image_trg"][2].max() == 0.0
