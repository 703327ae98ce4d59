"""Checkpoint save/restore (orbax) + PyTorch checkpoint interop.

Three layers, mirroring the reference (SURVEY.md §5.4):
1. full train-state checkpoints (params/teacher/opt-state/step) via orbax,
   with ``save_last`` semantics;
2. module-level pretrained init from converted torch checkpoints
   (reference models/segmentation_model.py:421-436);
3. sub-module key-remapped loads: 'backbone.' stripping
   (mix_transformer.py:470-476), 'alignment_head.' extraction
   (uawarpc.py:298-305), classifier dropping.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

from .torch_convert import convert_state_dict


def _load_torch_state_dict(path: str):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    return ckpt


def load_torch_backbone(path: str) -> Dict:
    """ImageNet/Cityscapes backbone checkpoint -> flax variables.
    Strips 'backbone.' prefixes and drops 'head.'/'fc.'/'classifier.'
    (reference mix_transformer.py:445-479, resnet.py:341-359)."""
    sd = _load_torch_state_dict(path)
    if any(k.startswith("backbone.") for k in sd):
        sd = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}
    return convert_state_dict(
        sd, drop_prefixes=("head.", "fc.", "classifier.", "conv_seg."))


def load_torch_alignment_head(path: str) -> Dict:
    """AlignmentModel .ckpt -> UAWarpCHead variables ('alignment_head.'
    extraction, reference uawarpc.py:282-305)."""
    sd = _load_torch_state_dict(path)
    return convert_state_dict(sd, strip_prefix="alignment_head.")


def load_torch_full_uda(path: str) -> Dict[str, Dict]:
    """Full reference UDA checkpoint -> per-submodule variable trees
    (the reference registers student+teacher+imnet+aligner in one module,
    segmentation_model.py:66-88)."""
    sd = _load_torch_state_dict(path)
    groups = {
        "backbone": "backbone.", "head": "head.",
        "scale_attention": "hrda_scale_attention.",
        "m_backbone": "m_backbone.", "m_head": "m_head.",
        "m_scale_attention": "m_hrda_scale_attention.",
        "imnet_backbone": "imnet_backbone.",
        "alignment_backbone": "alignment_backbone.",
        "alignment_head": "alignment_head.",
    }
    out = {}
    for name, prefix in groups.items():
        sub = {k[len(prefix):]: v for k, v in sd.items()
               if k.startswith(prefix)}
        if sub:
            out[name] = convert_state_dict(sub)
    return out


# ---------------------------------------------------------------------------
# orbax train-state checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    keep: int = 3, save_last: bool = True) -> None:
    """Save a full train-state checkpoint; atomically re-point ``last``.

    Crash-safety (SURVEY.md §5.3 — resume via ``last`` is the framework's
    only recovery mechanism): the ``last`` symlink is swapped with an
    atomic rename (a crash leaves either the old or the new target, never
    a missing/dangling link), and pruning never removes the directory
    ``last`` currently points to, even if an older copy of the link
    survives a partial run.
    """
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(ckpt_dir, f"step_{step}")
        ckptr.save(path, jax.device_get(state), force=True)
    last = os.path.join(ckpt_dir, "last")
    if save_last:
        if os.path.exists(last) and not os.path.islink(last):
            import shutil
            shutil.rmtree(last)
        tmp = os.path.join(ckpt_dir, f".last.tmp.{os.getpid()}")
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(path, tmp)
        os.replace(tmp, last)  # atomic swap
    # prune old checkpoints, but never the one `last` points to
    pinned = None
    if os.path.islink(last):
        pinned = os.path.basename(os.readlink(last))
    # only fully-numeric suffixes: a crash mid-save leaves orbax temp dirs
    # like step_4000.orbax-checkpoint-tmp-<ts> that must not break pruning
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit())
    for s in steps[:-keep]:
        if f"step_{s}" == pinned:
            continue
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                      ignore_errors=True)


def restore_checkpoint(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if os.path.islink(path):
        path = os.readlink(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=jax.device_get(target))
