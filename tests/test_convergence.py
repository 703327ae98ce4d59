"""Long-horizon synthetic convergence harness (r4 verdict missing #1).

The per-module goldens and 3/10-step trajectory goldens catch per-step
numerics but cannot catch slow drift — an optimizer-semantics or
BN-momentum bug that only diverges over hundreds of steps would pass them.
Real-data mIoU is impossible here (no datasets/checkpoints), so this is
the in-repo substitute: a ~300-step Refign fit on a tiny in-memory
LEARNABLE set (pixel color encodes the class, so the task is memorizable)
through the PRODUCTION CLI fit loop (SegTask.fit: real data module, real
optimizer/schedule, EMA teacher, DACS, fdist), asserting the trajectory
actually behaves like training:

  * source CE falls strongly (memorization of the color->class map),
  * the teacher's pseudo-label confidence (train_pseudo_weight) rises,
  * the mixed-batch UDA loss falls (student agrees with pseudo-labels),
  * every logged loss is finite at every step (no NaN / blowup).

Reference anchor: models/segmentation_model.py:146-253 (the training loop
whose long-horizon behavior this pins).
"""
import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

MAX_STEPS = 300
SIZE = (64, 128)

# 19 well-separated RGB colors: class k = color  (the learnable mapping)
_COLORS = np.stack(np.meshgrid([40, 110, 180], [40, 110, 180],
                               [40, 110, 180], indexing="ij"),
                   axis=-1).reshape(-1, 3)[:19].astype(np.uint8)


# draw from 8 well-separated classes (incl. fdist classes 11-18 so the
# ImageNet-feature-distance mask is non-empty): 8-way color->class is
# memorizable within the 300-step budget, while 32-px blocks survive the
# fdist label downscale (min_ratio 0.75 at stride 32 ignores any cell
# containing a class boundary — 16-px blocks zeroed the fdist loss for
# the whole run)
_CLASS_SET = np.asarray([0, 4, 8, 11, 13, 15, 17, 18])


def _class_image(rng, size, block=32, noise=8.0, shift=0):
    """Blocky class map + its color rendering (+domain shift +noise)."""
    h, w = size
    blocks = _CLASS_SET[rng.randint(0, len(_CLASS_SET),
                                    size=(h // block, w // block))]
    sem = np.kron(blocks, np.ones((block, block), np.int64))
    img = _COLORS[sem].astype(np.float32)
    img = img + shift + rng.randn(h, w, 3) * noise
    return np.clip(img, 0, 255).astype(np.uint8), sem.astype(np.uint8)


def _make_cityscapes(root, n=4, size=SIZE):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        img_dir = os.path.join(root, "leftImg8bit", split, "cityA")
        sem_dir = os.path.join(root, "gtFine", split, "cityA")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(sem_dir, exist_ok=True)
        for i in range(n):
            img, sem = _class_image(rng, size)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"a_{i:02d}_leftImg8bit.png"))
            Image.fromarray(sem).save(os.path.join(
                sem_dir, f"a_{i:02d}_gtFine_labelTrainIds.png"))


def _make_acdc(root, n=4, size=SIZE):
    rng = np.random.RandomState(1)
    for split in ("train", "val"):
        img_dir = os.path.join(root, "rgb_anon", "fog", split, "r0")
        ref_dir = os.path.join(root, "rgb_anon", "fog", split + "_ref", "r0")
        sem_dir = os.path.join(root, "gt", "fog", split, "r0")
        for d in (img_dir, ref_dir, sem_dir):
            os.makedirs(d, exist_ok=True)
        for i in range(n):
            # same color->class mapping, mild domain shift (darker + noise)
            img, sem = _class_image(rng, size, shift=-25, noise=12.0)
            ref, _ = _class_image(rng, size)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"f_{i:02d}_rgb_anon.png"))
            Image.fromarray(ref).save(
                os.path.join(ref_dir, f"f_{i:02d}_rgb_ref_anon.png"))
            Image.fromarray(sem).save(os.path.join(
                sem_dir, f"f_{i:02d}_gt_labelTrainIds.png"))


def _config():
    t = [{"class_path": "data_modules.transforms.ToTensor"},
         {"class_path": "data_modules.transforms.RandomCrop",
          "init_args": {"size": [64, 64]}},
         {"class_path": "data_modules.transforms.ConvertImageDtype"},
         {"class_path": "data_modules.transforms.Normalize"}]
    return {
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
                            "dims": list(SIZE), "transforms": t},
                        "ACDC": {
                            "condition": ["fog"],
                            "load_keys": ["image", "image_ref"],
                            "dims": list(SIZE), "transforms": t},
                    },
                    "val": {
                        "ACDC": {
                            "condition": ["fog"],
                            "load_keys": ["image", "semantic"],
                            "dims": list(SIZE), "transforms": t[:1] + t[2:]},
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
                                       "ignore_index": 255,
                                       "over_present_classes": True}}]},
                },
            },
        },
        "optimizer": {
            "class_path": "torch.optim.AdamW",
            "init_args": {"lr": 6e-4, "weight_decay": 0.01},
        },
        "lr_scheduler": {
            "class_path": "helpers.lr_scheduler.LinearWarmupPolynomialLR",
            "init_args": {"warmup_iters": 20, "max_steps": MAX_STEPS},
        },
        "trainer": {"max_steps": MAX_STEPS,
                    "val_every_n_steps": MAX_STEPS,
                    "log_every_n_steps": 1},
    }


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("convdata")
    _make_cityscapes(os.path.join(root, "Cityscapes"))
    _make_acdc(os.path.join(root, "ACDC"))
    return str(root)


def test_synthetic_convergence_through_production_fit(data_root, tmp_path):
    from refign_tpu.cli import main

    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_config(), f)
    workdir = str(tmp_path / "run")

    rc = main(["fit", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root])
    assert rc == 0

    rows = [json.loads(l) for l in open(
        os.path.join(workdir, "metrics.jsonl"))]
    steps = [r for r in rows if "train_loss_total" in r]
    assert len(steps) >= MAX_STEPS, f"only {len(steps)} train-log rows"

    # no NaN / blowup anywhere along the trajectory
    for i, r in enumerate(steps):
        for k, v in r.items():
            if k.startswith("train_"):
                assert np.isfinite(v), f"{k} not finite at logged step {i}"

    def mean_of(key, rows_):
        return float(np.mean([r[key] for r in rows_ if key in r]))

    head, tail = steps[:15], steps[-15:]

    # the fdist mask must be non-empty (32-px blocks survive the
    # downscale) — otherwise the fdist branch is silently untested
    assert mean_of("train_loss_featdist_src", steps) > 0.0, \
        "fdist loss identically zero: mask empty"

    # source CE memorizes the color->class map (calibrated: a healthy run
    # measures 2.92 -> 1.56 over 300 steps, still falling; ln(8)=2.08 is
    # the no-learning baseline for the 8-class set)
    src0, src1 = mean_of("train_loss_src", head), \
        mean_of("train_loss_src", tail)
    assert src1 < 0.56 * src0 and src1 < 1.8, (
        f"source CE did not converge: first-15 {src0:.4f} "
        f"-> last-15 {src1:.4f}")

    # teacher pseudo-label confidence rises
    pw0, pw1 = mean_of("train_pseudo_weight", head), \
        mean_of("train_pseudo_weight", tail)
    assert pw1 > pw0 + 0.05, (
        f"pseudo-label confidence did not rise: {pw0:.4f} -> {pw1:.4f}")

    # student agrees with the pseudo-labels more over time
    mix0, mix1 = mean_of("train_loss_uda_trg", head), \
        mean_of("train_loss_uda_trg", tail)
    assert mix1 < mix0, (
        f"UDA mixed loss did not fall: {mix0:.4f} -> {mix1:.4f}")

    # the trained student is materially better than chance on the target
    # val set (19 classes, learnable mapping)
    rc = main(["validate", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root,
               "--ckpt_path", os.path.join(workdir, "checkpoints", "last")])
    assert rc == 0
    metrics = json.load(open(os.path.join(workdir, "val_metrics.json")))
    assert metrics["val_ACDC_IoU"] > 0.25, metrics
