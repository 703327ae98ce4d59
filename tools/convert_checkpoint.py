"""Convert PyTorch reference checkpoints to refign-tpu orbax/npz trees.

Covers the reference's bootstrap paths (SURVEY.md §3.5):
  * --kind backbone   SegFormer/mmseg backbone .pth ('backbone.' stripping)
  * --kind alignment  AlignmentModel .ckpt ('alignment_head.' extraction)
  * --kind full_uda   full DomainAdaptationSegmentationModel .ckpt
                      (student + EMA teacher + imnet + aligner sub-trees)

Usage:
  python tools/convert_checkpoint.py --kind backbone mit_b5.pth out.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refign_tpu.utils.checkpoint import (load_torch_alignment_head,
                                         load_torch_backbone,
                                         load_torch_full_uda)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True,
                        choices=["backbone", "alignment", "full_uda"])
    parser.add_argument("src")
    parser.add_argument("dst")
    args = parser.parse_args()
    loader = {"backbone": load_torch_backbone,
              "alignment": load_torch_alignment_head,
              "full_uda": load_torch_full_uda}[args.kind]
    tree = loader(args.src)
    flat = _flatten(tree)
    np.savez(args.dst, **flat)
    print(f"wrote {len(flat)} arrays to {args.dst}")


if __name__ == "__main__":
    main()
