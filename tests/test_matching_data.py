"""MegaDepth + RobotCar dataset fixtures and the alignment CLI E2E smoke."""
import csv
import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image


def _make_megadepth(root, scenes=("0001", "0121"), n_img=3, size=(96, 96)):
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "scene_info"), exist_ok=True)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    for scene in scenes:
        image_paths = []
        for i in range(n_img):
            rel = f"imgs/{scene}_{i}.jpg"
            Image.fromarray(rng.randint(0, 255, size + (3,),
                                        dtype=np.uint8)).save(
                os.path.join(root, rel))
            image_paths.append(rel)
        image_paths = np.array(image_paths + [None], dtype=object)
        depth_paths = np.array(["d"] * n_img + [None], dtype=object)
        # shared 3D points: ids 0..9 visible in all images
        p2d = np.array([
            {pid: np.array([10.0 + pid * 5, 12.0 + pid * 4], np.float32)
             for pid in range(10)}
            for _ in range(n_img)] + [None], dtype=object)
        overlap = np.zeros((n_img + 1, n_img + 1), np.float32)
        overlap[0, 1] = overlap[1, 0] = 0.5
        overlap[0, 2] = 0.6
        np.savez(os.path.join(root, "scene_info", f"{scene}.0.npz"),
                 image_paths=image_paths, depth_paths=depth_paths,
                 points3D_id_to_2D=p2d, overlap_matrix=overlap)
    # test CSV
    os.makedirs(os.path.join(root, "Test", "test1600Pairs"), exist_ok=True)
    for name in ("a.jpg", "b.jpg"):
        Image.fromarray(rng.randint(0, 255, size + (3,),
                                    dtype=np.uint8)).save(
            os.path.join(root, "Test", "test1600Pairs", name))
    with open(os.path.join(root, "Test", "test1600Pairs.csv"), "w") as f:
        w = csv.writer(f)
        w.writerow(["scene", "source_image", "target_image",
                    "XA", "YA", "XB", "YB"])
        w.writerow(["/", "a.jpg", "b.jpg", "10;20;30", "10;15;20",
                    "12;22;31", "11;14;22"])


def test_megadepth_train_pairs(tmp_path):
    from refign_tpu.data.datasets.matching_datasets import MegaDepth
    root = str(tmp_path / "md")
    _make_megadepth(root)
    ds = MegaDepth(root, stage="train",
                   load_keys=["image_ref", "image", "image_prime"],
                   dims=(64, 64), debug=True)
    assert len(ds) > 0
    s = ds[0]
    assert s["image"].size == (64, 64)
    assert s["image_prime"].size == (64, 64)
    assert s["corr_pts"].shape == s["corr_pts_ref"].shape
    assert s["corr_pts"].shape[1] == 2
    # keypoints rescaled from 96 -> 64
    assert s["corr_pts"].max() < 70


def test_megadepth_test_split(tmp_path):
    from refign_tpu.data.datasets.matching_datasets import MegaDepth
    root = str(tmp_path / "md")
    _make_megadepth(root)
    ds = MegaDepth(root, stage="test", load_keys=["image_ref", "image"],
                   dims=(48, 48))
    assert len(ds) == 1
    s = ds[0]
    np.testing.assert_allclose(s["corr_pts"][0],
                               [12 * 48 / 96, 11 * 48 / 96])


def test_robotcar_corr_pairs(tmp_path):
    import h5py
    from refign_tpu.data.datasets.seg_datasets import RobotCar
    root = str(tmp_path / "rc")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "correspondence_data"), exist_ok=True)
    rng = np.random.RandomState(1)
    for name in ("day1.png", "night1.png"):
        Image.fromarray(rng.randint(0, 255, (48, 48, 3),
                                    dtype=np.uint8)).save(
            os.path.join(root, "images", name))

    def str_to_mat(s):
        return np.array([[ord(c)] for c in s], dtype=np.uint16)

    with h5py.File(os.path.join(root, "correspondence_data",
                                "pair0.mat"), "w") as f:
        f["im_i_path"] = str_to_mat("day1.png")
        f["im_j_path"] = str_to_mat("night1.png")
    ds = RobotCar(root, stage="train", load_keys=["image_ref", "image"],
                  dims=(32, 32))
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].size == (32, 32)
    assert s["filename"] == "night1.png"


ALIGN_CONFIG = {
    "seed_everything": 0,
    "data": {
        "class_path": "data_modules.CombinedDataModule",
        "init_args": {
            "num_workers": 2,
            "batch_size": 2,
            "debug": True,
            "load_config": {
                "train": {"MegaDepth": {
                    "load_keys": ["image_ref", "image", "image_prime"],
                    "dims": [64, 64],
                    "exchange_images_with_proba": 0.5,
                    "transforms": [
                        {"class_path": "data_modules.transforms.ToTensor"},
                        {"class_path":
                         "data_modules.transforms.ConvertImageDtype"},
                        {"class_path": "data_modules.transforms.Normalize"},
                        {"class_path":
                         "data_modules.transforms.CompositeFlow",
                         "init_args": {
                             "apply_keys": ["image_prime"],
                             "include_transforms": ["hom", "tps", "afftps"],
                             "random_t_hom": 0.333,
                             "random_t_tps": 0.333,
                             "random_t_tps_for_afftps": 0.08}},
                    ],
                }},
                "val": {"MegaDepth": {
                    "load_keys": ["image_ref", "image"],
                    "dims": [64, 64],
                    "transforms": [
                        {"class_path": "data_modules.transforms.ToTensor"},
                        {"class_path":
                         "data_modules.transforms.ConvertImageDtype"},
                        {"class_path": "data_modules.transforms.Normalize"},
                    ],
                }},
            },
        },
    },
    "model": {
        "class_path": "models.AlignmentModel",
        "init_args": {
            "alignment_backbone": {
                "class_path": "models.backbones.VGG",
                "init_args": {"model_type": "vgg11",
                              "out_indices": [2, 3, 4]}},
            "alignment_head": {
                "class_path": "models.heads.UAWarpCHead",
                "init_args": {"in_index": [0, 1],
                              "estimate_uncertainty": True}},
            "metrics": {"val": {"MegaDepth": [
                {"class_path": "helpers.metrics.SparseEPE",
                 "init_args": {"uncertainty_estimation": True}}]}},
        },
    },
    "optimizer": {"class_path": "torch.optim.Adam",
                  "init_args": {"lr": 1e-4, "weight_decay": 4e-4}},
    "lr_scheduler": {"class_path": "torch.optim.lr_scheduler.MultiStepLR",
                     "init_args": {"milestones": [100], "gamma": 0.5}},
    "trainer": {"max_steps": 2, "val_every_n_steps": 2,
                "log_every_n_steps": 1},
}


def test_align_cli_fit_and_validate(tmp_path):
    from refign_tpu.cli import main
    data_root = str(tmp_path / "data")
    # debug mode points MegaDepth at MegaDepth_debug
    _make_megadepth(os.path.join(data_root, "MegaDepth_debug"))
    cfg_path = tmp_path / "align.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ALIGN_CONFIG, f)
    workdir = str(tmp_path / "run")
    rc = main(["fit", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root])
    assert rc == 0
    lines = [json.loads(l) for l in open(
        os.path.join(workdir, "metrics.jsonl"))]
    assert any("train_matching_loss" in l for l in lines)
    assert any("val_MegaDepth_AEPE" in l for l in lines)
    assert any("val_MegaDepth_AUSE_AEPE" in l for l in lines)
    assert os.path.exists(os.path.join(workdir, "checkpoints", "last"))

    # checkpointed validate: AlignTrainState is a NamedTuple — the CLI
    # restore template must not index into it like SegTask's
    # (state, align_params) tuple (regression: init[0] was state.step)
    rc = main(["validate", "--config", str(cfg_path), "--workdir", workdir,
               "--data_dir", data_root,
               "--ckpt_path", os.path.join(workdir, "checkpoints", "last")])
    assert rc == 0
    metrics = json.load(open(os.path.join(workdir, "val_metrics.json")))
    assert "val_MegaDepth_AEPE" in metrics

    # predict is unsupported for alignment configs: must fail loudly
    import pytest
    with pytest.raises(SystemExit, match="not supported"):
        main(["predict", "--config", str(cfg_path), "--workdir", workdir,
              "--data_dir", data_root])


def test_cityscapes_rare_class_sampling(tmp_path):
    """RCS draws rare classes preferentially (reference cityscapes.py:139-191)."""
    import json
    import random as pyrandom
    from PIL import Image as PILImage
    from refign_tpu.data.datasets.seg_datasets import Cityscapes
    from refign_tpu.data import transforms as T

    root = str(tmp_path / "cs")
    img_dir = os.path.join(root, "leftImg8bit", "train", "a")
    sem_dir = os.path.join(root, "gtFine", "train", "a")
    os.makedirs(img_dir)
    os.makedirs(sem_dir)
    rng = np.random.RandomState(0)
    stats, swc = [], {}
    for i, rare in enumerate([False, True]):
        sem = np.zeros((32, 32), np.uint8)  # class 0 everywhere
        if rare:
            sem[:16] = 7  # rare class on half the image
        name = f"a_{i:02d}"
        PILImage.fromarray(rng.randint(0, 255, (32, 32, 3),
                                       dtype=np.uint8)).save(
            os.path.join(img_dir, name + "_leftImg8bit.png"))
        sem_path = os.path.join(sem_dir, name + "_gtFine_labelTrainIds.png")
        PILImage.fromarray(sem).save(sem_path)
        cls, cnt = np.unique(sem, return_counts=True)
        st = {str(int(c)): int(n) for c, n in zip(cls, cnt)}
        st["file"] = sem_path
        stats.append(st)
        for c, n in zip(cls, cnt):
            swc.setdefault(str(int(c)), []).append([sem_path, int(n)])
    with open(os.path.join(root, "sample_class_stats.json"), "w") as f:
        json.dump(stats, f)
    with open(os.path.join(root, "samples_with_class.json"), "w") as f:
        json.dump(swc, f)

    pyrandom.seed(0)
    ds = Cityscapes(root, stage="train", load_keys=["image", "semantic"],
                    dims=(32, 32), rcs_enabled=True, rcs_min_pixels=10,
                    rcs_min_crop_ratio=0.5,
                    transforms=T.Compose([T.ToTensor()]))
    # class 7 is far rarer than 0 globally -> temperature softmax
    # concentrates nearly all probability on it
    counts = {0: 0, 7: 0}
    for _ in range(20):
        s = ds[0]
        if (np.asarray(s["semantic"]) == 7).sum() > 0:
            counts[7] += 1
        else:
            counts[0] += 1
    assert counts[7] >= 18, counts
