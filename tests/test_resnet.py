"""ResNet v1c golden fidelity vs reference torch (incl. DeepLabV2's dilated
configuration)."""
import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.models.resnet import ResNet
from refign_tpu.utils.torch_convert import check_tree_match, convert_state_dict


@pytest.mark.parametrize("model_type,strides,dilations", [
    ("resnet18_v1c", (1, 2, 2, 2), (1, 1, 1, 1)),
    ("resnet50_v1c", (1, 2, 1, 1), (1, 1, 2, 4)),   # DeepLabV2 config
])
def test_resnet_matches_reference(model_type, strides, dilations):
    rm = ref_oracle.load_ref_module("models.backbones.resnet")
    torch.manual_seed(0)
    ref = rm.ResNet(model_type, strides=strides, dilations=dilations,
                    out_indices=(0, 1, 2, 3))
    ref.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    variables = convert_state_dict(ref.state_dict())
    mine = ResNet(model_type=model_type, strides=strides,
                  dilations=dilations, out_indices=(0, 1, 2, 3))
    import jax
    init_vars = mine.init(jax.random.PRNGKey(0), np.zeros_like(x))
    errs = check_tree_match(variables["params"], init_vars["params"])
    assert not errs, "\n".join(errs[:10])
    errs = check_tree_match(variables["batch_stats"],
                            init_vars["batch_stats"])
    assert not errs, "\n".join(errs[:10])

    outs = mine.apply(variables, x)
    assert len(outs) == 4
    for got, w in zip(outs, want):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), w.numpy(),
            rtol=1e-3, atol=1e-3)
