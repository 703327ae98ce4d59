"""tools/convert_cityscapes.py label rasterization semantics.

Pins the cityscapesscripts name2label behavior the reference relies on
(reference tools/convert_cityscapes.py:16-53 via json2labelImg):
- plain 19-class names map to their trainIds;
- 'xxxgroup' names strip the suffix ONLY when not themselves labels
  ('cargroup' -> car), but 'polegroup' IS a label with trainId 255;
- unknown/void names rasterize as ignore (255).
"""
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from convert_cityscapes import convert_json_to_label  # noqa: E402


def _poly(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def test_group_label_semantics(tmp_path):
    ann = {
        "imgHeight": 32,
        "imgWidth": 64,
        "objects": [
            {"label": "road", "polygon": _poly(0, 0, 63, 31)},
            {"label": "cargroup", "polygon": _poly(0, 0, 15, 15)},
            {"label": "polegroup", "polygon": _poly(16, 0, 31, 15)},
            {"label": "out of roi", "polygon": _poly(32, 0, 47, 15)},
            {"label": "persongroup", "polygon": _poly(48, 0, 63, 15)},
            {"label": "sky", "polygon": _poly(0, 16, 15, 31),
             "deleted": 1},
        ],
    }
    jf = tmp_path / "x_gtFine_polygons.json"
    jf.write_text(json.dumps(ann))
    stats = convert_json_to_label(str(jf))

    out = np.asarray(Image.open(str(tmp_path / "x_gtFine_labelTrainIds.png")))
    assert out.shape == (32, 64)
    assert out[8, 8] == 13            # cargroup -> car
    assert out[8, 24] == 255          # polegroup stays ignored
    assert out[8, 40] == 255          # void name -> ignore
    assert out[8, 56] == 11           # persongroup -> person
    assert out[24, 8] == 0            # deleted object skipped -> road below
    assert stats["file"].endswith("labelTrainIds.png")
    assert 255 not in {k for k in stats if k != "file"}
