"""PyTorch checkpoint -> flax params conversion.

Generic, rule-based converter for the reference's checkpoints
(reference load paths: models/segmentation_model.py:421-436,
models/backbones/mix_transformer.py:445-479, models/heads/uawarpc.py:282-305).

Key mapping:
* torch module path ``a.b.0.c`` -> flax path components; numeric list indices
  are fused into their parent name (``block1.0`` -> ``block1_0``,
  ``embed_layers.0`` -> ``embed_layers_0``) per NUMERIC_FUSE rules.
* leaf tensors: Linear ``weight`` (out,in) -> ``kernel`` (in,out);
  Conv ``weight`` (O,I/g,kh,kw) -> ``kernel`` (kh,kw,I/g,O); 1-D ``weight``
  -> ``scale`` (LayerNorm/BatchNorm); ``running_mean``/``running_var`` ->
  ``batch_stats`` collection ``mean``/``var``; ``num_batches_tracked`` dropped.
* torch ``Mlp.dwconv.dwconv`` (a DWConv wrapper holding one conv,
  mix_transformer.py:556-568) collapses to a single ``dwconv`` conv.

The output is a dict with "params" and "batch_stats" sub-trees ready for
``flax.core.freeze`` / module.apply.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _set_nested(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate key at {'/'.join(path)}")
    node[path[-1]] = value


def _fuse_numeric(parts):
    """Fuse numeric path components into the preceding name: a.0.b -> a_0.b."""
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


# Dense->1x1-conv layers: modules that are nn.Linear in the reference but
# 1x1 convs here (conv layout avoids relayout copies on TPU).  Their 2-D
# (out, in) weights reshape to (1, 1, in, out) kernels.
DENSE_AS_CONV1X1_SUFFIXES = (".mlp.fc1", ".mlp.fc2")


def convert_state_dict(state_dict: Mapping[str, Any],
                       strip_prefix: Optional[str] = None,
                       drop_prefixes: Tuple[str, ...] = (),
                       rename: Optional[Dict[str, str]] = None
                       ) -> Dict[str, Dict]:
    """Convert a torch state_dict (name -> numpy/torch tensor) to flax trees.

    Args:
      state_dict: mapping of dotted torch keys to tensors.
      strip_prefix: e.g. 'backbone.' — keys without it are skipped.
      drop_prefixes: keys starting with any of these are dropped.
      rename: literal substring renames applied to keys first.
    Returns:
      {"params": ..., "batch_stats": ...} nested dicts of numpy arrays.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    for key, tensor in state_dict.items():
        if strip_prefix is not None:
            if not key.startswith(strip_prefix):
                continue
            key = key[len(strip_prefix):]
        if any(key.startswith(p) for p in drop_prefixes):
            continue
        if rename:
            for old, new in rename.items():
                key = key.replace(old, new)
        if key.endswith("num_batches_tracked"):
            continue
        # DWConv wrapper: mlp.dwconv.dwconv.{weight,bias} -> mlp.dwconv.*
        key = key.replace(".dwconv.dwconv.", ".dwconv.")
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
            else tensor)
        parts = key.split(".")
        leaf = parts[-1]
        path = tuple(_fuse_numeric(parts[:-1]))
        if leaf == "weight":
            if arr.ndim == 4:
                _set_nested(params, path + ("kernel",),
                            arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                kern = arr.transpose(1, 0)
                if any(key.endswith(suf + ".weight")
                       for suf in DENSE_AS_CONV1X1_SUFFIXES):
                    kern = kern[None, None]  # (1, 1, in, out) conv kernel
                _set_nested(params, path + ("kernel",), kern)
            elif arr.ndim == 1:
                _set_nested(params, path + ("scale",), arr)
            else:
                raise ValueError(f"unexpected weight rank for {key}")
        elif leaf == "bias":
            _set_nested(params, path + ("bias",), arr)
        elif leaf == "running_mean":
            _set_nested(batch_stats, path + ("mean",), arr)
        elif leaf == "running_var":
            _set_nested(batch_stats, path + ("var",), arr)
        else:
            raise ValueError(f"unhandled torch leaf: {key}")
    return {"params": params, "batch_stats": batch_stats}


def subset_like(converted, target, path=""):
    """Keep only the keys of ``target`` in ``converted`` (recursively).

    Used when the torch checkpoint carries more layers than the flax module
    instantiates (e.g. torchvision VGG built only up to the deepest needed
    pyramid level, reference vgg.py:108-120).  Raises if ``target`` has a
    key the checkpoint lacks — loads stay strict in that direction.
    """
    if not isinstance(target, dict):
        return converted
    out = {}
    for k, t in target.items():
        if not isinstance(converted, dict) or k not in converted:
            raise KeyError(f"checkpoint missing key {path}/{k}")
        out[k] = subset_like(converted[k], t, f"{path}/{k}")
    return out


def check_tree_match(converted, target, path="") -> list:
    """Return list of mismatch descriptions between converted and target
    param trees (missing/extra/shape)."""
    errs = []
    ck = set(converted.keys()) if isinstance(converted, dict) else None
    tk = set(target.keys()) if isinstance(target, dict) else None
    if ck is None or tk is None:
        cs = getattr(converted, "shape", None)
        ts = getattr(target, "shape", None)
        if tuple(cs) != tuple(ts):
            errs.append(f"{path}: shape {cs} vs {ts}")
        return errs
    for k in sorted(tk - ck):
        errs.append(f"{path}/{k}: missing in converted")
    for k in sorted(ck - tk):
        errs.append(f"{path}/{k}: extra in converted")
    for k in sorted(ck & tk):
        errs.extend(check_tree_match(converted[k], target[k], f"{path}/{k}"))
    return errs
