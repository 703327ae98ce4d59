"""Structural ablation of the HRDA 1080p bench pipeline.

Device profiling is unavailable over the axon tunnel, so this measures the
honest wall cost of each component by replacing it with (near-)identity and
re-timing the full bench program: the delta vs the unablated run is that
component's contribution.  Ablations change numerics, never shapes.

Usage: python tools/bench_ablate.py [none ln attn dwconv resize head ...]
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def apply_ablation(which: str):
    import jax
    import jax.numpy as jnp

    if which == "none":
        return
    if which == "ln":
        import flax.linen as fnn
        from flax.linen.module import wrap_method_once
        from refign_tpu.nn import layers

        def ln_call(self, x):
            scale = self.param("scale", fnn.initializers.ones,
                               (x.shape[-1],), jnp.float32)
            bias = self.param("bias", fnn.initializers.zeros,
                              (x.shape[-1],), jnp.float32)
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

        layers.TorchLayerNorm.__call__ = wrap_method_once(
            fnn.compact(ln_call))
        return
    if which == "lnbf16":
        # shippable candidate: fp32 stats, bf16 apply (y = x*s' + t')
        import flax.linen as fnn
        from flax.linen.module import wrap_method_once
        from refign_tpu.nn import layers

        def ln_bf16(self, x):
            scale = self.param("scale", fnn.initializers.ones,
                               (x.shape[-1],), jnp.float32)
            bias = self.param("bias", fnn.initializers.zeros,
                              (x.shape[-1],), jnp.float32)
            m = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
            m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=-1,
                          keepdims=True)
            r = jax.lax.rsqrt(m2 - jnp.square(m) + self.epsilon)
            s = (r * scale).astype(x.dtype)
            t = (bias - m * r * scale).astype(x.dtype)
            return x * s + t

        layers.TorchLayerNorm.__call__ = wrap_method_once(
            fnn.compact(ln_bf16))
        return
    if which == "gelu":
        # keep the depthwise conv + bias, drop only the exact-erf GELU
        from refign_tpu.models import mix_transformer
        from refign_tpu.ops import dwconv as dw

        def dw_nogelu(x, w, b, use_pallas=None, interpret=False):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1]) + b

        dw.dwconv3x3_gelu = dw_nogelu
        mix_transformer.dwconv3x3_gelu = dw_nogelu
        return
    if which == "gelutanh":
        # tanh-approx GELU (max abs err ~3e-4, below bf16 resolution)
        from refign_tpu.models import mix_transformer
        from refign_tpu.ops import dwconv as dw

        def dw_tanh(x, w, b, use_pallas=None, interpret=False):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            return jax.nn.gelu(y + b, approximate=True)

        dw.dwconv3x3_gelu = dw_tanh
        mix_transformer.dwconv3x3_gelu = dw_tanh
        return
    if which == "attn":
        from refign_tpu.ops import attention

        def attn_id(q, k, v, scale, use_pallas=None):
            return q

        attention.sra_attention = attn_id
        # mix_transformer imported the symbol directly
        from refign_tpu.models import mix_transformer
        mix_transformer.sra_attention = attn_id
        return
    if which == "dwconv":
        from refign_tpu.ops import dwconv as dw

        def dw_id(x, w, b, use_pallas=None, interpret=False):
            return x

        dw.dwconv3x3_gelu = dw_id
        from refign_tpu.models import mix_transformer
        mix_transformer.dwconv3x3_gelu = dw_id
        return
    if which == "resize":
        from refign_tpu.ops import resize as rs

        def _axis_resize(x, axis, out):
            # strided slice (down) / repeat (up) — both vectorized on TPU,
            # unlike gathers; numerics are wrong, shapes/dtype are right
            n = x.shape[axis]
            if out <= n:
                s = max(n // out, 1)
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(0, s * out, s)
                x = x[tuple(sl)]
                sl[axis] = slice(0, out)
                return x[tuple(sl)]
            r = -(-out // n)
            x = jnp.repeat(x, r, axis=axis)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, out)
            return x[tuple(sl)]

        def fake_interpolate(x, size, mode="bilinear", align_corners=None,
                             spatial_axes=(1, 2)):
            ah, aw = spatial_axes
            x = _axis_resize(x, ah, int(size[0]))
            return _axis_resize(x, aw, int(size[1]))

        rs.interpolate = fake_interpolate
        for modname in ("refign_tpu.models.segmentor",
                        "refign_tpu.models.heads.base",
                        "refign_tpu.models.heads.daformer",
                        "refign_tpu.models.heads.segformer"):
            mod = __import__(modname, fromlist=["interpolate"])
            if hasattr(mod, "interpolate"):
                mod.interpolate = fake_interpolate
        return
    if which == "head":
        from flax.linen.module import wrap_method_once
        from refign_tpu.models.heads import daformer, segformer

        def head_id(self, feats, train=False, deterministic=True):
            # depends on EVERY feature map, else XLA dead-code-eliminates
            # the unused backbone stages and the number is meaningless
            f = feats[0]
            s = sum(jnp.mean(g).astype(f.dtype) for g in feats)
            return jnp.zeros(f.shape[:3] + (self.num_classes,), f.dtype) + s

        daformer.DAFormerHead.__call__ = wrap_method_once(head_id)
        segformer.SegFormerHead.__call__ = wrap_method_once(head_id)
        return
    if which == "patchembed":
        # replace the 7x7/3x3 overlapping patch conv with a 1x1 stride-s
        # conv (same output shape, no halo) — isolates the halo cost
        import flax.linen as fnn
        from flax.linen.module import wrap_method_once
        from refign_tpu.models import mix_transformer as mt
        from refign_tpu.nn.layers import TorchLayerNorm, conv2d

        def pe_call(self, x):
            x = conv2d(self.embed_dim, kernel_size=1, stride=self.stride,
                       padding=0, name="proj1x1")(x)
            x = TorchLayerNorm(epsilon=1e-5, name="norm")(x)
            return x

        mt.OverlapPatchEmbed.__call__ = wrap_method_once(fnn.compact(pe_call))
        return
    if which == "srconv":
        # replace the KV spatial-reduction conv (k=s=sr) with a 1x1
        # stride-sr conv — isolates the reduction-window cost
        import flax.linen as fnn
        from flax.linen.module import wrap_method_once
        from refign_tpu.models import mix_transformer as mt
        from refign_tpu.nn.layers import TorchLayerNorm, conv2d
        from refign_tpu.ops.attention import sra_attention as _sra

        def attn_call(self, x, deterministic=True):
            import flax.linen as nn
            B, H, W, C = x.shape
            nh = self.num_heads
            hd = C // nh
            scale = self.qk_scale or hd ** -0.5
            q = nn.Dense(C, use_bias=self.qkv_bias,
                         param_dtype=jnp.float32, name="q")(x)
            q = q.reshape(B, H * W, nh, hd)
            if self.sr_ratio > 1:
                kv_in = conv2d(C, kernel_size=1, stride=self.sr_ratio,
                               padding=0, name="sr1x1")(x)
                kv_in = TorchLayerNorm(epsilon=1e-5, name="norm")(kv_in)
                kv_in = kv_in.reshape(B, -1, C)
            else:
                kv_in = x.reshape(B, H * W, C)
            kv = nn.Dense(2 * C, use_bias=self.qkv_bias,
                          param_dtype=jnp.float32, name="kv")(kv_in)
            kv = kv.reshape(B, -1, 2, nh, hd)
            out = _sra(q, kv[:, :, 0], kv[:, :, 1], scale)
            out = out.reshape(B, H, W, C)
            return nn.Dense(C, param_dtype=jnp.float32, name="proj")(out)

        mt.SRAttention.__call__ = wrap_method_once(fnn.compact(attn_call))
        return
    if which == "ffnmm":
        # ablate the Mix-FFN fc1/fc2 matmuls: tile C->4C and slice back
        from flax.linen.module import wrap_method_once
        from refign_tpu.models import mix_transformer as mt

        def ffn_call(self, x, deterministic=True):
            h = jnp.tile(x, (1, 1, 1, self.hidden_dim // x.shape[-1]))
            h = mt.DWConvGELU(self.hidden_dim, name="dwconv")(h)
            return h[..., :self.out_dim]

        import flax.linen as fnn
        mt.MixFFN.__call__ = wrap_method_once(fnn.compact(ffn_call))
        return
    raise ValueError(which)


def run_bench(tiny_heads: bool = False):
    import jax
    import jax.numpy as jnp
    from flax import linen as fnn
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor, slide_inference
    from refign_tpu.parallel.mesh import cast_floating

    class TinyHead(fnn.Module):
        """Shape-correct stand-in depending on all features (anti-DCE)."""
        num_classes: int = 19

        @fnn.compact
        def __call__(self, feats, train=False, deterministic=True):
            f = feats[0]
            s = sum(jnp.mean(g).astype(f.dtype) for g in feats)
            return jnp.zeros(f.shape[:3] + (self.num_classes,),
                             f.dtype) + s

    if tiny_heads:
        head, att = TinyHead(), TinyHead()
    else:
        head = DAFormerHead(num_classes=19)
        att = SegFormerHead(num_classes=19)
    seg = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b5",
                                      drop_path_rate=0.0),
        head=head,
        scale_attention=att,
    )
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32),
                         method=Segmentor.hrda_eval)
    variables = {"params": cast_floating(variables["params"], jnp.bfloat16),
                 "batch_stats": variables.get("batch_stats", {})}

    from refign_tpu.ops.resize import interpolate

    def whole(crops):
        logits = seg.apply(variables, crops, method=Segmentor.hrda_eval)
        return interpolate(logits, crops.shape[1:3], mode="bilinear",
                           align_corners=False)

    @jax.jit
    def forward(img):
        return slide_inference(whole, img, (1080, 1080), (420, 420))

    img = jnp.asarray(np.random.randn(1, 1080, 1920, 3), jnp.bfloat16)
    for attempt in range(4):
        try:
            _sync(forward(img))
            break
        except Exception as e:
            if attempt == 3:
                raise
            print(f"  compile retry ({type(e).__name__})", file=sys.stderr,
                  flush=True)
            time.sleep(10)
    from _timing import chained_timeit

    def chain(args, out):
        # feed a zero-scaled scalar of the output back into the input:
        # identical math, forces every iteration on the relay
        (im,) = args
        return (im + (out[0, 0, 0, 0] * 0).astype(im.dtype),)

    return chained_timeit(forward, chain, img, iters=10) / 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "none"
    import refign_tpu  # noqa: F401
    if which == "head2":
        dt = run_bench(tiny_heads=True)
    else:
        apply_ablation(which)
        dt = run_bench()
    print(json.dumps({"ablate": which, "ms_per_image": round(dt * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: F401  (used in ablation closures)
    main()
