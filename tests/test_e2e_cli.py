"""End-to-end smoke: mini synthetic datasets -> fit/validate/predict through
the CLI (SURVEY.md §4 item 5 — the reference's `debug` flag analog)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import yaml


def _make_cityscapes(root, n=2, size=(64, 128)):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        img_dir = os.path.join(root, "leftImg8bit", split, "cityA")
        sem_dir = os.path.join(root, "gtFine", split, "cityA")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(sem_dir, exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 255, size=size + (3,), dtype=np.uint8)
            sem = rng.randint(0, 19, size=size).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"a_{i:02d}_leftImg8bit.png"))
            Image.fromarray(sem).save(os.path.join(
                sem_dir, f"a_{i:02d}_gtFine_labelTrainIds.png"))


def _make_acdc(root, n=2, size=(64, 128)):
    rng = np.random.RandomState(1)
    for split in ("train", "val"):
        for cond in ("fog",):
            img_dir = os.path.join(root, "rgb_anon", cond, split, "r0")
            ref_dir = os.path.join(root, "rgb_anon", cond, split + "_ref",
                                   "r0")
            sem_dir = os.path.join(root, "gt", cond, split, "r0")
            for d in (img_dir, ref_dir, sem_dir):
                os.makedirs(d, exist_ok=True)
            for i in range(n):
                img = rng.randint(0, 255, size=size + (3,), dtype=np.uint8)
                ref = rng.randint(0, 255, size=size + (3,), dtype=np.uint8)
                sem = rng.randint(0, 19, size=size).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(img_dir, f"f_{i:02d}_rgb_anon.png"))
                Image.fromarray(ref).save(
                    os.path.join(ref_dir, f"f_{i:02d}_rgb_ref_anon.png"))
                Image.fromarray(sem).save(os.path.join(
                    sem_dir, f"f_{i:02d}_gt_labelTrainIds.png"))


CONFIG = {
    "seed_everything": 0,
    "data": {
        "class_path": "data_modules.CombinedDataModule",
        "init_args": {
            "num_workers": 2,
            "batch_size": 2,
            "load_config": {
                "train": {
                    "Cityscapes": {
                        "load_keys": ["image", "semantic"],
                        "dims": [64, 128],
                        "transforms": [
                            {"class_path":
                             "data_modules.transforms.ToTensor"},
                            {"class_path":
                             "data_modules.transforms.RandomCrop",
                             "init_args": {"size": [64, 64],
                                           "cat_max_ratio": 0.75}},
                            {"class_path":
                             "data_modules.transforms."
                             "RandomHorizontalFlip"},
                            {"class_path":
                             "data_modules.transforms.ConvertImageDtype"},
                            {"class_path":
                             "data_modules.transforms.Normalize"},
                        ],
                    },
                    "ACDC": {
                        "condition": ["fog"],
                        "load_keys": ["image", "image_ref"],
                        "dims": [64, 128],
                        "transforms": [
                            {"class_path":
                             "data_modules.transforms.ToTensor"},
                            {"class_path":
                             "data_modules.transforms.RandomCrop",
                             "init_args": {"size": [64, 64]}},
                            {"class_path":
                             "data_modules.transforms.ConvertImageDtype"},
                            {"class_path":
                             "data_modules.transforms.Normalize"},
                        ],
                    },
                },
                "val": {
                    "ACDC": {
                        "condition": ["fog"],
                        "load_keys": ["image", "semantic"],
                        "dims": [64, 128],
                        "transforms": [
                            {"class_path":
                             "data_modules.transforms.ToTensor"},
                            {"class_path":
                             "data_modules.transforms.ConvertImageDtype"},
                            {"class_path":
                             "data_modules.transforms.Normalize"},
                        ],
                    },
                },
                "test": {
                    "ACDC": {
                        "condition": ["fog"],
                        "load_keys": ["image", "semantic"],
                        "dims": [64, 128],
                        "transforms": [
                            {"class_path":
                             "data_modules.transforms.ToTensor"},
                            {"class_path":
                             "data_modules.transforms.ConvertImageDtype"},
                            {"class_path":
                             "data_modules.transforms.Normalize"},
                        ],
                    },
                    "NighttimeDriving": {
                        "load_keys": ["image", "semantic"],
                        "dims": [64, 128],
                        "transforms": [
                            {"class_path":
                             "data_modules.transforms.ToTensor"},
                            {"class_path":
                             "data_modules.transforms.ConvertImageDtype"},
                            {"class_path":
                             "data_modules.transforms.Normalize"},
                        ],
                    },
                },
                "predict": {
                    "ACDC": {
                        "condition": ["fog"],
                        "load_keys": ["image"],
                        "dims": [64, 128],
                        "predict_on": "val",
                        "transforms": [
                            {"class_path":
                             "data_modules.transforms.ToTensor"},
                            {"class_path":
                             "data_modules.transforms.ConvertImageDtype"},
                            {"class_path":
                             "data_modules.transforms.Normalize"},
                        ],
                    },
                },
            },
        },
    },
    "model": {
        "class_path": "models.DomainAdaptationSegmentationModel",
        "init_args": {
            "enable_fdist": True,
            "use_refign": True,
            "use_align": False,
            "backbone": {
                "class_path": "models.backbones.MixVisionTransformer",
                "init_args": {"model_type": "mit_b0"},
            },
            "head": {
                "class_path": "models.heads.SegFormerHead",
                "init_args": {"num_classes": 19, "channels": 32,
                              "in_index": [0, 1, 2, 3],
                              "input_transform": "multiple_select"},
            },
            "loss": {"class_path":
                     "models.losses.PixelWeightedCrossEntropyLoss"},
            "metrics": {
                "val": {"ACDC": [
                    {"class_path": "helpers.metrics.IoU",
                     "init_args": {"num_classes": 19,
                                   "ignore_index": 255}}]},
                "test": {
                    "ACDC": [
                        {"class_path": "helpers.metrics.IoU",
                         "init_args": {"num_classes": 19,
                                       "ignore_index": 255}}],
                    "NighttimeDriving": [
                        {"class_path": "helpers.metrics.IoU",
                         "init_args": {"num_classes": 19,
                                       "ignore_index": 255}}],
                },
            },
        },
    },
    "optimizer": {
        "class_path": "torch.optim.AdamW",
        "init_args": {"lr": 6e-4, "weight_decay": 0.01},
    },
    "lr_scheduler": {
        "class_path": "helpers.lr_scheduler.LinearWarmupPolynomialLR",
        "init_args": {"warmup_iters": 10, "max_steps": 3},
    },
    "trainer": {"max_steps": 3, "val_every_n_steps": 3,
                "log_every_n_steps": 1},
}


def _make_nighttime_driving(root, n=2, size=(64, 128)):
    rng = np.random.RandomState(2)
    img_dir = os.path.join(root, "leftImg8bit", "test", "night")
    sem_dir = os.path.join(root, "gtCoarse_daytime_trainvaltest",
                           "test", "night")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(sem_dir, exist_ok=True)
    for i in range(n):
        img = rng.randint(0, 255, size=size + (3,), dtype=np.uint8)
        sem = rng.randint(0, 19, size=size).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(img_dir, f"n_{i:02d}_leftImg8bit.png"))
        Image.fromarray(sem).save(os.path.join(
            sem_dir, f"n_{i:02d}_gtCoarse_labelTrainIds.png"))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    _make_cityscapes(os.path.join(root, "Cityscapes"))
    _make_acdc(os.path.join(root, "ACDC"))
    # reference data-dir layout nests this set under NighttimeDrivingTest
    # (combined_data_module.py:46-55 / our module.DATA_SUBDIRS)
    _make_nighttime_driving(os.path.join(root, "NighttimeDrivingTest"))
    return str(root)


def test_cli_fit_validate_predict(data_root, tmp_path):
    from refign_tpu.cli import main
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CONFIG, f)
    workdir = str(tmp_path / "run")

    rc = main(["fit", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root])
    assert rc == 0
    assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(workdir, "checkpoints", "last"))
    lines = [json.loads(l) for l in open(
        os.path.join(workdir, "metrics.jsonl"))]
    assert any("val_ACDC_IoU" in l for l in lines)
    assert all(np.isfinite(l.get("train_loss_total", 0.0)) for l in lines)

    rc = main(["validate", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root])
    assert rc == 0
    metrics = json.load(open(os.path.join(workdir, "val_metrics.json")))
    assert "val_ACDC_IoU" in metrics

    rc = main(["predict", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root])
    assert rc == 0
    preds = os.listdir(os.path.join(workdir, "preds", "ACDC"))
    assert len(preds) == 2
    colors = os.listdir(os.path.join(workdir, "color_preds", "ACDC"))
    assert len(colors) == 2

    # the reference's primary published workflow (README.md:274-282):
    # `run.py test --config ... --ckpt_path ...` -> per-test-dataset
    # metrics, restored from the trained checkpoint
    rc = main(["test", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root,
               "--ckpt_path", os.path.join(workdir, "checkpoints", "last")])
    assert rc == 0
    metrics = json.load(open(os.path.join(workdir, "test_metrics.json")))
    assert "test_ACDC_IoU" in metrics
    assert "test_NighttimeDriving_IoU" in metrics
    assert all(np.isfinite(v) for v in metrics.values())


def test_apply_override_handles_null_sections_and_bad_args(tmp_path):
    """Dot-overrides must survive empty YAML sections (`trainer:` -> None)
    and reject malformed arguments loudly (regression)."""
    import pytest
    from refign_tpu.cli import _apply_override

    cfg = {"trainer": None}
    _apply_override(cfg, "trainer.max_steps", "100")
    assert cfg["trainer"]["max_steps"] == 100

    cfg = {"trainer": {"max_steps": 5}}
    with pytest.raises(SystemExit, match="not a mapping"):
        _apply_override(cfg, "trainer.max_steps.deeper", "1")

    # trailing valueless flag -> clean error, not IndexError
    from refign_tpu.cli import main
    cfg_path = tmp_path / "empty.yaml"
    cfg_path.write_text("trainer:\n")
    with pytest.raises(SystemExit, match="missing a value"):
        main(["fit", "--config", str(cfg_path), "--trainer.max_steps"])
