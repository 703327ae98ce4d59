"""Cityscapes preparation: polygons -> labelTrainIds PNGs + the class
statistics JSONs consumed by Rare Class Sampling.

Equivalent of reference tools/convert_cityscapes.py:16-116 without the
cityscapesscripts dependency: converts gtFine *_polygons.json to
*_labelTrainIds.png and writes sample_class_stats.json /
samples_with_class.json (reference cityscapes.py:80-98 consumers).

Usage: python tools/convert_cityscapes.py <cityscapes_root> [--nproc N]
"""
import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image, ImageDraw

# label name -> trainId (Cityscapes 19-class protocol)
NAME_TO_TRAINID = {
    "road": 0, "sidewalk": 1, "building": 2, "wall": 3, "fence": 4,
    "pole": 5, "traffic light": 6, "traffic sign": 7, "vegetation": 8,
    "terrain": 9, "sky": 10, "person": 11, "rider": 12, "car": 13,
    "truck": 14, "bus": 15, "train": 16, "motorcycle": 17, "bicycle": 18,
}
IGNORE = 255


def convert_json_to_label(json_file: str) -> dict:
    """Rasterize one *_polygons.json to *_labelTrainIds.png; return
    per-class pixel counts (reference convert_cityscapes.py:16-53)."""
    with open(json_file) as f:
        ann = json.load(f)
    h, w = ann["imgHeight"], ann["imgWidth"]
    img = Image.new("L", (w, h), IGNORE)
    draw = ImageDraw.Draw(img)
    for obj in ann["objects"]:
        if obj.get("deleted"):
            continue
        label = obj["label"]
        # cityscapesscripts strips a 'group' suffix only when the label is
        # NOT itself in name2label; 'polegroup' IS a label (trainId 255),
        # so it must stay ignored rather than collapse to 'pole'
        # (cityscapesscripts/helpers/labels.py + json2labelImg semantics,
        # used by reference tools/convert_cityscapes.py:16-53).
        if label.endswith("group") and label != "polegroup":
            label = label[:-len("group")]
        tid = NAME_TO_TRAINID.get(label, IGNORE)
        polygon = [tuple(p) for p in obj["polygon"]]
        if len(polygon) >= 2:
            draw.polygon(polygon, fill=tid)
    out_file = json_file.replace("_polygons.json", "_labelTrainIds.png")
    img.save(out_file)

    arr = np.asarray(img)
    ids, counts = np.unique(arr, return_counts=True)
    stats = {int(i): int(c) for i, c in zip(ids, counts) if i != IGNORE}
    stats["file"] = out_file
    return stats


def save_class_stats(out_dir: str, stats_list) -> None:
    """sample_class_stats.json + samples_with_class.json
    (reference convert_cityscapes.py:56-84)."""
    with open(os.path.join(out_dir, "sample_class_stats.json"), "w") as f:
        json.dump(stats_list, f, indent=2)
    samples_with_class = {}
    for s in stats_list:
        fname = s["file"]
        for c, n in s.items():
            if c == "file":
                continue
            samples_with_class.setdefault(int(c), []).append((fname, n))
    with open(os.path.join(out_dir, "samples_with_class.json"), "w") as f:
        json.dump(samples_with_class, f, indent=2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root")
    parser.add_argument("--nproc", type=int, default=8)
    args = parser.parse_args()
    gt_dir = os.path.join(args.root, "gtFine", "train")
    json_files = []
    for city in sorted(os.listdir(gt_dir)):
        for fn in sorted(os.listdir(os.path.join(gt_dir, city))):
            if fn.endswith("_polygons.json"):
                json_files.append(os.path.join(gt_dir, city, fn))
    print(f"converting {len(json_files)} annotation files")
    with ThreadPoolExecutor(max_workers=args.nproc) as pool:
        stats = list(pool.map(convert_json_to_label, json_files))
    save_class_stats(args.root, stats)
    # also rasterize val split labels (no stats needed)
    val_dir = os.path.join(args.root, "gtFine", "val")
    val_files = []
    for city in sorted(os.listdir(val_dir)):
        for fn in sorted(os.listdir(os.path.join(val_dir, city))):
            if fn.endswith("_polygons.json"):
                val_files.append(os.path.join(val_dir, city, fn))
    with ThreadPoolExecutor(max_workers=args.nproc) as pool:
        list(pool.map(convert_json_to_label, val_files))
    print("done")


if __name__ == "__main__":
    main()
