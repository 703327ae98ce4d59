"""Time the UDA train step's no-grad prefix (EMA + teacher + align +
refine + DACS) separately from the gradient section, at the exact step
shapes.  Chained inputs + scalar sync (axon timing rules, PARITY.md).

Usage: python tools/bench_step_parts.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor
    from refign_tpu.models.vgg import VGG
    from refign_tpu.ops.resize import interpolate
    from refign_tpu.ops.warp import confidence_from_logvar, warp
    from refign_tpu.parallel.mesh import cast_floating
    from refign_tpu.uda.dacs import dacs_mix
    from refign_tpu.uda.refine import refine

    B, S = 2, 512
    seg = Segmentor(backbone=MixVisionTransformer(model_type="mit_b5",
                                                  drop_path_rate=0.1),
                    head=DAFormerHead(num_classes=19))
    vgg = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    img_trg = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    img_ref = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    img_src = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    sem_src = jnp.asarray(rng.randint(0, 19, size=(B, S, S)))

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        tvars = seg.init(key, np.zeros((1, 64, 64, 3), np.float32),
                         method=Segmentor.logits_and_features)
        vv = vgg.init(key, np.zeros((1, 256, 256, 3), np.float32))
        feats = vgg.apply(vv, np.zeros((1, S, S, 3), np.float32),
                          extract_only_indices=[-3, -2])
        f256 = vgg.apply(vv, np.zeros((1, 256, 256, 3), np.float32),
                         extract_only_indices=[-2, -1])
        hv = head.init(key, feats, feats, f256, f256, (S, S))
    cdt = jnp.bfloat16
    tparams = cast_floating(tvars["params"], cdt)
    tstats = tvars.get("batch_stats", {})
    vparams = cast_floating(vv["params"], cdt)
    hparams = cast_floating(hv["params"], cdt)
    hstats = hv["batch_stats"]

    def teacher_fwd(images):
        out, _ = seg.apply({"params": tparams, "batch_stats": tstats},
                           images.astype(cdt), train=True,
                           mutable=["batch_stats"], method=Segmentor.whole)
        return out

    def align_fn(logits_ref, images_ref, images_trg):
        ir = images_ref.astype(cdt)
        it = images_trg.astype(cdt)
        trg256 = interpolate(it, (256, 256), mode="area")
        ref256 = interpolate(ir, (256, 256), mode="area")
        full = vgg.apply({"params": vparams}, jnp.concatenate([ir, it]),
                         extract_only_indices=[-3, -2])
        small = vgg.apply({"params": vparams},
                          jnp.concatenate([ref256, trg256]),
                          extract_only_indices=[-2, -1])
        pr = [f[:B] for f in full]
        pt = [f[B:] for f in full]
        pr2 = [f[:B] for f in small]
        pt2 = [f[B:] for f in small]
        flow, logvar = head.apply(
            {"params": hparams, "batch_stats": hstats},
            pt, pr, pt2, pr2, (S, S))[-1]
        flow = interpolate(flow, (S, S), mode="bilinear",
                           align_corners=False)
        logvar = interpolate(logvar, (S, S), mode="bilinear",
                             align_corners=False)
        cert = confidence_from_logvar(logvar, R=1.0)
        warped, mask = warp(logits_ref, flow, return_mask=True)
        return warped, mask, cert

    def stage(images_trg, images_ref, upto: str):
        m_in = jnp.concatenate([images_trg, images_ref])
        m_logits = teacher_fwd(m_in)
        m_trg, m_ref = m_logits[:B], m_logits[B:]
        if upto == "teacher":
            return jax.nn.softmax(m_trg.astype(jnp.float32), -1)
        warped, mask, cert = align_fn(m_ref, images_ref, images_trg)
        if upto == "align":
            return warped.astype(jnp.float32)
        probs = refine(m_trg, warped, mask, cert, 0.25, False, False)
        if upto == "refine":
            return probs
        mixed_img, mixed_lbl, mixed_w = dacs_mix(
            jax.random.PRNGKey(1), images_trg, probs, img_src, sem_src,
            pseudo_label_threshold=0.968, color_jitter_s=0.2,
            color_jitter_p=0.2, blur=True, psweight_ignore_top=0,
            psweight_ignore_bottom=0, num_classes=19)
        return mixed_img.astype(jnp.float32)

    for upto in ("teacher", "align", "refine", "dacs"):
        @jax.jit
        def step(it, ir):
            out = stage(it, ir, upto)
            return it + jnp.mean(out).astype(it.dtype) * 1e-12, ir

        it, ir = img_trg, img_ref
        it, ir = step(it, ir)
        _sync(it)
        it, ir = step(it, ir)
        _sync(it)
        t0 = time.perf_counter()
        _sync(it)
        rpc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            it, ir = step(it, ir)
        _sync(it)
        t = max(time.perf_counter() - t0 - rpc, 1e-9) / 10
        print(f"prefix upto {upto}: {t * 1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
