"""All shipped configs parse and build their tasks/modules.

The config inventory mirrors the reference's 17 YAMLs 1:1
(reference configs/** — 3 ACDC, 6 ACDC ablations, 3 DarkZurich,
3 RobotCar... see test_config_inventory for the exact manifest).
"""
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "*", "*.yaml"))
    + glob.glob(os.path.join(REPO, "configs", "*", "*", "*.yaml")))


def test_config_inventory_matches_reference():
    """Every reference config file has a same-named counterpart here."""
    expected = {
        "cityscapes_acdc/refign_daformer.yaml",
        "cityscapes_acdc/refign_deeplabv2.yaml",
        "cityscapes_acdc/refign_hrda_star.yaml",
        "cityscapes_acdc/ablations/refign_daformer_row1.yaml",
        "cityscapes_acdc/ablations/refign_daformer_row2.yaml",
        "cityscapes_acdc/ablations/refign_daformer_row3.yaml",
        "cityscapes_acdc/ablations/refign_daformer_row4.yaml",
        "cityscapes_acdc/ablations/refign_daformer_row5.yaml",
        "cityscapes_acdc/ablations/refign_daformer_row6.yaml",
        "cityscapes_darkzurich/refign_daformer.yaml",
        "cityscapes_darkzurich/refign_deeplabv2.yaml",
        "cityscapes_darkzurich/refign_hrda_star.yaml",
        "cityscapes_robotcar/refign_daformer.yaml",
        "cityscapes_robotcar/refign_deeplabv2.yaml",
        "megadepth/uawarpc_evalonly.yaml",
        "megadepth/uawarpc_stage1.yaml",
        "megadepth/uawarpc_stage2.yaml",
    }
    shipped = {os.path.relpath(p, os.path.join(REPO, "configs"))
               for p in CONFIGS}
    assert shipped == expected


@pytest.mark.parametrize("path", CONFIGS, ids=[
    os.path.relpath(p, os.path.join(REPO, "configs")) for p in CONFIGS])
def test_config_builds_task(path):
    from refign_tpu.config import build_task, load_yaml
    cfg = load_yaml(path)
    task, dm = build_task(cfg, data_dir="/nonexistent")
    assert task is not None
    # model modules constructed
    if hasattr(task, "segmentor"):
        assert task.segmentor.head.num_classes == 19
        if "hrda_star" in path:
            assert task.use_hrda and task.segmentor.scale_attention is not None
            assert task.use_slide_inference
        if "refign" in path and "ablations" not in path:
            assert task.uda_cfg.use_refign
            assert task.align_head is not None
        if "deeplabv2" in path:
            from refign_tpu.models.resnet import ResNet
            assert isinstance(task.segmentor.backbone, ResNet)
        if "darkzurich" in path or "robotcar" in path:
            # per-dataset metric routing for the extra night test sets
            tests = task.metrics_cfg.get("test", {})
            if "darkzurich" in path:
                assert set(tests) == {"DarkZurich", "NighttimeDriving",
                                      "BDD100kNight"}
            else:
                assert set(tests) == {"RobotCar"}
    else:
        assert task.head is not None
        assert task.align_cfg.include_transforms == ("hom", "tps", "afftps")
        if "stage2" in path:
            assert task.align_cfg.add_elastic
            assert task.align_cfg.random_t_hom == 0.4
            # reference uawarpc_stage2.yaml:144 sets visibility_mask: True
            assert task.align_cfg.visibility_mask
        if "stage1" in path:
            assert not task.align_cfg.visibility_mask
    if "robotcar" in path:
        # reference robotcar configs set over_present_classes: True
        for specs in task.metrics_cfg.get("test", {}).values():
            for _name, args in specs:
                assert args.get("over_present_classes", False)


# the six ablation rows toggle exactly these UDAConfig flags (reference
# configs/cityscapes_acdc/ablations/refign_daformer_row{1-6}.yaml:
# model.init_args adapt_to_ref/gamma/disable_M/disable_P/use_align)
_ABLATION_FLAGS = {
    1: dict(adapt_to_ref=False, gamma=0.0, disable_M=True, disable_P=False,
            use_align=False),
    2: dict(adapt_to_ref=False, gamma=0.0, disable_M=True, disable_P=True,
            use_align=True),
    3: dict(adapt_to_ref=False, gamma=0.0, disable_M=True, disable_P=False,
            use_align=True),
    4: dict(adapt_to_ref=False, gamma=0.0, disable_M=False, disable_P=False,
            use_align=True),
    5: dict(adapt_to_ref=False, gamma=0.25, disable_M=False, disable_P=False,
            use_align=True),
    6: dict(adapt_to_ref=True, gamma=0.25, disable_M=False, disable_P=False,
            use_align=True),
}


@pytest.mark.parametrize("row", sorted(_ABLATION_FLAGS))
def test_ablation_rows_set_uda_flags(row):
    from refign_tpu.config import build_task, load_yaml
    path = os.path.join(REPO, "configs", "cityscapes_acdc", "ablations",
                        f"refign_daformer_row{row}.yaml")
    task, _ = build_task(load_yaml(path), data_dir="/nonexistent")
    cfg = task.uda_cfg
    for name, want in _ABLATION_FLAGS[row].items():
        assert getattr(cfg, name) == want, (row, name, getattr(cfg, name))
    assert cfg.use_refign
