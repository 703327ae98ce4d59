"""Golden tests: VGG pyramid backbone + UAWarpC head vs reference torch."""
import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.models.heads.uawarpc import UAWarpCHead
from refign_tpu.models.vgg import VGG
from refign_tpu.utils.torch_convert import convert_state_dict


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))


def test_vgg16_pyramid_matches_reference():
    vm = ref_oracle.load_ref_module("models.backbones.vgg")
    torch.manual_seed(0)
    ref = vm.VGG("vgg16", out_indices=[2, 3, 4])
    ref.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        want_full = ref(_nchw(x), extract_only_indices=[-3, -2])
        want_256 = ref(_nchw(x), extract_only_indices=[-2, -1])

    variables = convert_state_dict(ref.state_dict())
    mine = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    got_full = mine.apply({"params": variables["params"]}, x,
                          extract_only_indices=[-3, -2])
    got_256 = mine.apply({"params": variables["params"]}, x,
                         extract_only_indices=[-2, -1])
    assert len(got_full) == 2 and len(got_256) == 2
    for g, w in zip(got_full + got_256, want_full + want_256):
        np.testing.assert_allclose(np.asarray(g), _nhwc(w),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("uncertainty", [True, False])
def test_uawarpc_head_matches_reference(uncertainty):
    um = ref_oracle.load_ref_module("models.heads.uawarpc")
    torch.manual_seed(1)
    ref = um.UAWarpCHead(in_index=[0, 1], input_transform="multiple_select",
                         estimate_uncertainty=uncertainty, batch_norm=True)
    ref.eval()

    rng = np.random.RandomState(1)
    out_size = (64, 96)
    c11 = rng.randn(1, 16, 24, 128).astype(np.float32)
    c12 = rng.randn(1, 8, 12, 256).astype(np.float32)
    c13 = rng.randn(1, 32, 32, 256).astype(np.float32)
    c14 = rng.randn(1, 16, 16, 512).astype(np.float32)
    c21 = rng.randn(1, 16, 24, 128).astype(np.float32)
    c22 = rng.randn(1, 8, 12, 256).astype(np.float32)
    c23 = rng.randn(1, 32, 32, 256).astype(np.float32)
    c24 = rng.randn(1, 16, 16, 512).astype(np.float32)

    with torch.no_grad():
        want = ref([_nchw(c11), _nchw(c12)], [_nchw(c21), _nchw(c22)],
                   [_nchw(c13), _nchw(c14)], [_nchw(c23), _nchw(c24)],
                   out_size)

    variables = convert_state_dict(ref.state_dict())
    mine = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=uncertainty)
    got = mine.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        [c11, c12], [c21, c22], [c13, c14], [c23, c24], out_size)

    assert len(got) == 4
    for lvl in range(4):
        if uncertainty:
            wf, wu = want[lvl]
            gf, gu = got[lvl]
            np.testing.assert_allclose(
                np.transpose(np.asarray(gu), (0, 3, 1, 2)),
                wu.detach().numpy(), rtol=1e-3, atol=1e-3,
                err_msg=f"uncert level {lvl}")
        else:
            wf, gf = want[lvl], got[lvl]
        np.testing.assert_allclose(
            np.transpose(np.asarray(gf), (0, 3, 1, 2)),
            wf.detach().numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"flow level {lvl}")
