"""All shipped configs parse and build their tasks/modules."""
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yaml")))


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
        if "refign" in path:
            assert task.uda_cfg.use_refign
            assert task.align_head is not None
    else:
        assert task.head is not None
        assert task.align_cfg.include_transforms == ("hom", "tps", "afftps")
        if "stage2" in path:
            assert task.align_cfg.add_elastic
            assert task.align_cfg.random_t_hom == 0.4
