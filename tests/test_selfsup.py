"""Self-supervision patch-proposal mapper (UP-DETR-style pretraining).

Covers the reference's `SelfSupervisionDetrDatasetMapper`
(`groundingdino/datasets/detr_dataset_mapper.py:140-257`): train-time
selective-search `patch_boxes` on the augmented image, eval-time
annotation dropping.
"""

import numpy as np

from ziragroundingdino_tpu.config import DataConfig
from ziragroundingdino_tpu.data.selfsup import (
    SelfSupSample,
    _felzenszwalb,
    selective_patch_boxes,
    selfsup_map,
)
from ziragroundingdino_tpu.data.transforms import Sample


def _synthetic_image():
    img = np.full((240, 320, 3), 128, np.uint8)
    img[40:120, 60:140] = (200, 40, 40)
    img[140:200, 180:290] = (40, 40, 220)
    img = img + np.random.RandomState(0).randint(0, 8, img.shape).astype(np.uint8)
    return img


def _iou(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua


def test_felzenszwalb_segments_colored_regions():
    img = _synthetic_image().astype(np.float32)
    labels = _felzenszwalb(img, k=300.0, min_size=20)
    assert labels.shape == img.shape[:2]
    # the two rectangles and the background land in distinct segments
    l_bg = labels[10, 10]
    l_r1 = labels[80, 100]
    l_r2 = labels[170, 230]
    assert len({int(l_bg), int(l_r1), int(l_r2)}) == 3
    # each rectangle's interior is one segment
    assert (labels[50:110, 70:130] == l_r1).all()
    assert (labels[150:190, 190:280] == l_r2).all()


def test_selective_patch_boxes_recover_objects():
    img = _synthetic_image()
    boxes = selective_patch_boxes(img, np.random.RandomState(7), res_size=96)
    assert boxes.dtype == np.float32 and boxes.shape[1] == 4
    assert (boxes[:, 2] > boxes[:, 0]).all() and (boxes[:, 3] > boxes[:, 1]).all()
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= img.shape[1]).all()
    # proposals cover both ground-truth rectangles
    assert max(_iou(b, (60, 40, 140, 120)) for b in boxes) > 0.7
    assert max(_iou(b, (180, 140, 290, 200)) for b in boxes) > 0.7
    # deterministic under a fixed rng
    boxes2 = selective_patch_boxes(img, np.random.RandomState(7), res_size=96)
    np.testing.assert_array_equal(boxes, boxes2)


def test_selfsup_map_train_and_eval():
    img = _synthetic_image()
    sample = Sample(
        image=img,
        boxes=np.array([[60, 40, 140, 120]], np.float32),
        labels=np.array([0], np.int64),
        orig_size=img.shape[:2],
    )
    cfg = DataConfig(train_short_sides=(224,), test_short_side=224, max_size=384)
    out = selfsup_map(sample, cfg, np.random.RandomState(3), is_train=True,
                      res_size=64)
    assert isinstance(out, SelfSupSample)
    assert out.patch_boxes.shape[1] == 4 and len(out.patch_boxes) > 0
    h, w = out.sample.image.shape[:2]
    assert (out.patch_boxes[:, 2] <= w).all() and (out.patch_boxes[:, 3] <= h).all()

    ev = selfsup_map(sample, cfg, is_train=False)
    # eval drops annotations and produces no proposals (reference :236-239)
    assert len(ev.sample.boxes) == 0 and len(ev.patch_boxes) == 0
