"""Torch-matching weight initialization (VERDICT r1 item 7).

Checks distribution moments of fresh init against the reference rules:
* MiT: Linear trunc_normal(.02)/zero-bias, conv kaiming fan_out//groups
  (reference mix_transformer.py:429-442);
* heads: mmseg classifier N(0,.01), ConvBNReLU kaiming fan_out
  (daformer.py:187-201, segformer.py:62-76, deeplabv2.py:21-23);
* VGG/ResNet: kaiming fan_out + BN 1/0 + zero-init residual BN
  (vgg.py:81-90, resnet.py:320-339);
* everything else: torch Conv2d/Linear defaults
  (kaiming_uniform(a=sqrt(5)) kernel, U(+-1/sqrt(fan_in)) bias).

Matters for from-scratch training parity (UAWarpC pretraining); converted
checkpoints overwrite these anyway.
"""
import numpy as np
import jax
import jax.numpy as jnp


def _std(a):
    return float(jnp.std(a))


def test_mit_init_moments():
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    m = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.0)
    p = m.init(jax.random.PRNGKey(0),
               np.zeros((1, 64, 64, 3), np.float32))["params"]
    # Linear layers: trunc_normal(std=.02), zero bias
    q = p["block3_0"]["attn"]["q"]["kernel"]
    assert abs(_std(q) - 0.02) < 0.002
    assert float(jnp.abs(p["block3_0"]["attn"]["q"]["bias"]).max()) == 0.0
    # fc1/fc2 are Linear in the reference
    fc1 = p["block1_0"]["mlp"]["fc1"]["kernel"]
    assert abs(_std(fc1) - 0.02) < 0.004
    # dwconv: kaiming fan_out // groups => fan_out = 3*3
    dw = p["block1_0"]["mlp"]["dwconv"]["kernel"]
    assert abs(_std(dw) - np.sqrt(2.0 / 9.0)) < 0.05
    # patch embed conv: kaiming fan_out = 7*7*32
    pe = p["patch_embed1"]["proj"]["kernel"]
    assert abs(_std(pe) - np.sqrt(2.0 / (49 * 32))) < 0.005
    assert float(jnp.abs(p["patch_embed1"]["proj"]["bias"]).max()) == 0.0


def test_daformer_head_init_moments():
    from refign_tpu.models.heads.daformer import DAFormerHead
    h = DAFormerHead(num_classes=19, channels=64, embed_dims=64)
    feats = [np.zeros((1, 16 // s, 16 // s, c), np.float32)
             for s, c in [(1, 32), (2, 64), (4, 160), (8, 256)]]
    p = h.init(jax.random.PRNGKey(0), feats)["params"]
    seg = p["conv_seg"]["kernel"]
    assert abs(_std(seg) - 0.01) < 0.002
    assert float(jnp.abs(p["conv_seg"]["bias"]).max()) == 0.0
    # bottleneck ConvBNReLU: kaiming fan_out = 3*3*64 (torch semantics)
    bk = p["fuse_layer"]["bottleneck"]["conv"]["kernel"]
    assert abs(_std(bk) - np.sqrt(2.0 / (9 * 64))) < 0.01
    # MLP embeds keep the torch Linear default: U(+-1/sqrt(fan_in))
    emb = p["embed_layers_0"]["proj"]["kernel"]  # fan_in 32
    bound = 1 / np.sqrt(32)
    assert float(jnp.abs(emb).max()) <= bound + 1e-6
    assert abs(_std(emb) - bound / np.sqrt(3)) < 0.02
    b = p["embed_layers_0"]["proj"]["bias"]
    assert 0 < float(jnp.abs(b).max()) <= bound + 1e-6


def test_matching_decoder_torch_defaults():
    from refign_tpu.models.matching_modules import OpticalFlowEstimator
    m = OpticalFlowEstimator(batch_norm=True)
    p = m.init(jax.random.PRNGKey(0),
               np.zeros((1, 8, 8, 81), np.float32))["params"]
    k = p["conv_0"]["conv"]["kernel"]  # 3x3x81 -> fan_in 729
    bound = 1 / np.sqrt(9 * 81)
    assert float(jnp.abs(k).max()) <= bound + 1e-6
    assert abs(_std(k) - bound / np.sqrt(3)) < bound * 0.1
    pred = p["predict_mapping"]  # biased conv, torch default bias
    fan_in = 9 * 32
    bb = 1 / np.sqrt(fan_in)
    assert 0 < float(jnp.abs(pred["bias"]).max()) <= bb + 1e-6


def test_vgg_resnet_init_moments():
    from refign_tpu.models.vgg import VGG
    v = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    p = v.init(jax.random.PRNGKey(0),
               np.zeros((1, 64, 64, 3), np.float32))["params"]
    k = p["features_2"]["kernel"]  # 3x3x64->64: fan_out 9*64
    assert abs(_std(k) - np.sqrt(2.0 / (9 * 64))) < 0.01
    assert float(jnp.abs(p["features_2"]["bias"]).max()) == 0.0

    from refign_tpu.models.resnet import ResNet
    r = ResNet(model_type="resnet50_v1c")
    rp = r.init(jax.random.PRNGKey(0),
                np.zeros((1, 64, 64, 3), np.float32))["params"]
    # zero-init residual: last BN scale of each bottleneck is 0
    assert float(jnp.abs(rp["layer1_0"]["bn3"]["scale"]).max()) == 0.0
    assert float(jnp.abs(rp["layer1_0"]["bn2"]["scale"] - 1).max()) == 0.0
