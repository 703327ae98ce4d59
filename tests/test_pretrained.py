"""Pretrained keyword/path/URL resolution (reference
mix_transformer.py:445-462, segmentation_model.py:421-436).

The round-1 behavior of silently random-initializing when the source is
missing is now a hard error; keywords resolve through per-family tables and
the $TORCH_HOME/hub cache like the reference.
"""
import os

import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.utils.pretrained import (backbone_family, keyword_to_source,
                                         resolve_pretrained)
from refign_tpu.utils.checkpoint import load_torch_backbone
from refign_tpu.utils.torch_convert import subset_like


def test_keyword_tables_match_reference():
    assert keyword_to_source("imagenet", "mix_transformer", "mit_b5") == \
        "./pretrained_models/mit_b5.pth"
    assert keyword_to_source("cityscapes", "mix_transformer", "mit_b5") == \
        "./pretrained_models/segformer.b5.1024x1024.city.160k.pth"
    assert keyword_to_source("imagenet", "vgg", "vgg16").startswith(
        "https://download.pytorch.org/models/vgg16-")
    assert keyword_to_source("imagenet", "resnet", "resnet101_v1c").startswith(
        "https://download.openmmlab.com/")
    with pytest.raises(KeyError):
        keyword_to_source("cityscapes", "vgg", "vgg16")


def test_missing_source_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError):
        resolve_pretrained("pretrained_models/uawarpc_megadepth.ckpt")
    with pytest.raises(FileNotFoundError):
        resolve_pretrained("cityscapes", family="mix_transformer",
                           model_type="mit_b5")


def test_url_download_failure_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    import torch.hub

    def boom(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(torch.hub, "download_url_to_file", boom)
    with pytest.raises(RuntimeError, match="download"):
        resolve_pretrained("imagenet", family="vgg", model_type="vgg16")


def test_url_uses_hub_checkpoint_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    cache = tmp_path / "hub" / "checkpoints" / "vgg16-397923af.pth"
    cache.parent.mkdir(parents=True)
    cache.write_bytes(b"x")
    got = resolve_pretrained("imagenet", family="vgg", model_type="vgg16")
    assert got == str(cache)


def test_keyword_resolves_through_hub_and_loads(tmp_path, monkeypatch):
    """End-to-end: 'imagenet' keyword -> $TORCH_HOME/hub/<table path> ->
    converted weights land in the flax backbone tree."""
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    torch.manual_seed(0)
    ref = mt.MixVisionTransformer("mit_b0", drop_path_rate=0.0)
    ckpt_dir = tmp_path / "hub" / "pretrained_models"
    ckpt_dir.mkdir(parents=True)
    # reference checkpoints wrap the weights in {'state_dict': ...}
    torch.save({"state_dict": ref.state_dict()},
               ckpt_dir / "mit_b0.pth")

    from refign_tpu.models.mix_transformer import MixVisionTransformer
    model = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.0)
    assert backbone_family(model) == "mix_transformer"
    path = resolve_pretrained("imagenet", family="mix_transformer",
                              model_type="mit_b0")
    assert path == str(ckpt_dir / "mit_b0.pth")

    import jax
    x = np.zeros((1, 64, 64, 3), np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), x)
    loaded = load_torch_backbone(path)
    merged = subset_like(loaded["params"], init_vars["params"])
    q = merged["block1_0"]["attn"]["q"]["kernel"]
    want = ref.state_dict()["block1.0.attn.q.weight"].numpy().T
    np.testing.assert_array_equal(np.asarray(q), want)


def test_subset_like_drops_extra_and_errors_on_missing():
    conv = {"a": {"x": 1, "y": 2}, "b": 3}
    assert subset_like(conv, {"a": {"x": None}}) == {"a": {"x": 1}}
    with pytest.raises(KeyError):
        subset_like(conv, {"c": None})
