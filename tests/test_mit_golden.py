"""Golden test: MiT backbone + heads vs the reference torch implementation
with converted weights (SURVEY.md §4 item 2 — per-pixel fidelity)."""
import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.models.mix_transformer import MixVisionTransformer
from refign_tpu.models.heads.segformer import SegFormerHead
from refign_tpu.models.heads.daformer import DAFormerHead
from refign_tpu.models.heads.deeplabv2 import DeepLabV2Head
from refign_tpu.utils.torch_convert import (check_tree_match,
                                            convert_state_dict)


def _run_flax(model, variables, x_nhwc, **kwargs):
    import jax
    out = model.apply(variables, x_nhwc, **kwargs)
    return out


def test_mit_b0_forward_matches_reference():
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    torch.manual_seed(0)
    ref = mt.MixVisionTransformer("mit_b0", drop_path_rate=0.0)
    ref.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    variables = convert_state_dict(ref.state_dict())
    model = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.0)
    # check the converted tree matches the model's expected structure
    import jax
    init_vars = model.init(jax.random.PRNGKey(0), np.zeros_like(x))
    errs = check_tree_match(variables["params"], init_vars["params"])
    assert not errs, "\n".join(errs[:20])

    outs = model.apply({"params": variables["params"]}, x)
    assert len(outs) == 4
    for got, w in zip(outs, want):
        w = np.transpose(w.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), w, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("head_cls", ["segformer", "daformer"])
def test_heads_match_reference(head_cls):
    mods = {
        "segformer": ("models.heads.segformer", "SegFormerHead"),
        "daformer": ("models.heads.daformer", "DAFormerHead"),
    }
    mod = ref_oracle.load_ref_module(mods[head_cls][0])
    torch.manual_seed(1)
    in_channels = [32, 64, 160, 256]
    if head_cls == "segformer":
        ref = mod.SegFormerHead(in_channels=in_channels, in_index=[0, 1, 2, 3],
                                num_classes=19, channels=128,
                                input_transform="multiple_select",
                                dropout_ratio=0.1)
        mine = SegFormerHead(num_classes=19, channels=128)
    else:
        ref = mod.DAFormerHead(in_channels=in_channels, in_index=[0, 1, 2, 3],
                               num_classes=19, channels=256, embed_dims=256,
                               input_transform="multiple_select",
                               dropout_ratio=0.1)
        mine = DAFormerHead(num_classes=19, channels=256, embed_dims=256)
    ref.eval()

    rng = np.random.RandomState(2)
    feats_nhwc = [rng.randn(2, 16 // (2 ** i) * 2, 24 // (2 ** i) * 2,
                            c).astype(np.float32) * 0.5
                  for i, c in enumerate(in_channels)]
    # reference expects 1/4..1/32 scales: build them decreasing
    feats_nhwc = [rng.randn(2, 32 >> i, 48 >> i, c).astype(np.float32)
                  for i, c in enumerate(in_channels)]
    feats_t = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
               for f in feats_nhwc]
    with torch.no_grad():
        want = ref(feats_t).numpy()

    variables = convert_state_dict(ref.state_dict())
    import jax
    init_vars = mine.init(jax.random.PRNGKey(0), feats_nhwc)
    errs = check_tree_match(variables["params"], init_vars["params"])
    assert not errs, "\n".join(errs[:20])
    errs = check_tree_match(variables["batch_stats"],
                            init_vars["batch_stats"])
    assert not errs, "\n".join(errs[:20])

    got = mine.apply({"params": variables["params"],
                      "batch_stats": variables["batch_stats"]}, feats_nhwc)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-4, atol=1e-4)


def test_deeplabv2_head_matches_reference():
    mod = ref_oracle.load_ref_module("models.heads.deeplabv2")
    torch.manual_seed(3)
    ref = mod.DeepLabV2Head(in_channels=64, in_index=-1, num_classes=19)
    ref.eval()
    rng = np.random.RandomState(3)
    f = rng.randn(2, 9, 11, 64).astype(np.float32)
    with torch.no_grad():
        want = ref([torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))]).numpy()
    variables = convert_state_dict(ref.state_dict())
    mine = DeepLabV2Head(num_classes=19)
    got = mine.apply({"params": variables["params"]}, [f])
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-4, atol=1e-4)
