"""Host-side image transforms (numpy/PIL).

Capability parity with the reference's two aug stacks:
  * detectron2-style train augs: RandomFlip + multi-scale ResizeShortestEdge
    (480..800 step 32, max 1333) with the 50% random-crop variant
    (`config/configs/common/data/odinw/aquarium.py:49-60`,
    `datasets/detr_dataset_mapper.py:40-70`);
  * demo/eval: resize shortest side to 800 / max 1333 + normalize
    (`datasets_org/transforms.py`, `util/inference.py:35-41`).

TPU-first: after resize, every image is padded to the smallest static
(H, W) bucket that fits (replacing `nested_tensor_from_tensor_list`'s
pad-to-max, `util/misc.py:474-500`) so jit sees a closed set of shapes.
Boxes ride along in absolute xyxy and are converted to normalized cxcywh
relative to the PADDED size at batch time — matching the reference, which
normalizes by the ImageList-padded size via prepare_targets
(`groundingdino_dual_zero_rep_branch.py:614-627`... actually by the
pre-padding image size; we keep the pre-padding size and carry it).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from ziragroundingdino_tpu.config import DataConfig


@dataclasses.dataclass
class Sample:
    """One decoded example (host)."""

    image: np.ndarray  # [H, W, 3] uint8 or float32
    boxes: np.ndarray  # [N, 4] absolute xyxy
    labels: np.ndarray  # [N] int
    # original size before any resize (for eval box rescale)
    orig_size: Tuple[int, int] = (0, 0)  # (H, W)
    image_id: int = 0
    # iscrowd regions (eval-time ignore matching only; empty in training)
    crowd_boxes: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 4), np.float32))
    crowd_labels: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,), np.int64))
    # the annotation "area" field (segmentation area in ORIGINAL-image
    # pixels): pycocotools uses it, not the box area, for the s/m/l gt
    # ranges. Empty = fall back to box area.
    gt_areas: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,), np.float32))


def _resize_u8(image: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """PIL-BILINEAR resize. PIL's SIMD implementation is the fast path
    (measured ~1.8x faster than our scalar C++ kernel); the native kernel
    (ziragroundingdino_tpu.native, parity-tested vs PIL) covers PIL-free
    deployments."""
    try:
        from PIL import Image

        return np.asarray(Image.fromarray(image).resize((nw, nh), Image.BILINEAR))
    except ImportError:
        from ziragroundingdino_tpu.native import resize_bilinear_u8

        out = resize_bilinear_u8(image, nh, nw)
        if out is None:
            raise RuntimeError("neither PIL nor the native resize is available")
        return out


def resize_shortest_edge(
    image: np.ndarray,
    boxes: np.ndarray,
    short: int,
    max_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """d2 ResizeShortestEdge semantics: scale so min side == short, cap the
    max side at max_size."""
    h, w = image.shape[:2]
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) != (h, w):
        image = _resize_u8(np.ascontiguousarray(image, np.uint8), nh, nw)
    if boxes.size:
        boxes = boxes * np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
    return image, boxes


def random_flip(image, boxes, rng: np.random.RandomState):
    if rng.rand() < 0.5:
        image = image[:, ::-1]
        if boxes.size:
            w = image.shape[1]
            boxes = boxes.copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    return image, boxes


def random_crop_absolute_range(
    image, boxes, labels, rng: np.random.RandomState,
    crop_range=(384, 600),
):
    """d2 RandomCrop("absolute_range", (384, 600)) as used by the 50% crop
    branch (`aquarium.py:52-56` via detr mapper)."""
    h, w = image.shape[:2]
    ch = min(h, rng.randint(crop_range[0], crop_range[1] + 1))
    cw = min(w, rng.randint(crop_range[0], crop_range[1] + 1))
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    image = image[y0 : y0 + ch, x0 : x0 + cw]
    if boxes.size:
        boxes = boxes - np.array([x0, y0, x0, y0], np.float32)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, labels = boxes[keep], labels[keep]
    return image, boxes, labels


def pick_bucket(
    h: int, w: int, buckets: Sequence[Tuple[int, int]]
) -> Tuple[int, int]:
    """Smallest bucket that fits (h, w); falls back to the largest."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if not fitting:
        return max(buckets, key=lambda b: b[0] * b[1])
    return min(fitting, key=lambda b: b[0] * b[1])


def pad_to_bucket(
    image: np.ndarray, bucket: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Bottom/right zero pad + validity mask (True = real pixel)."""
    h, w = image.shape[:2]
    bh, bw = bucket
    if h > bh or w > bw:  # bucket fallback smaller than image: resize down
        from PIL import Image

        scale = min(bh / h, bw / w)
        nh, nw = int(h * scale), int(w * scale)
        pil = Image.fromarray(image.astype(np.uint8))
        image = np.asarray(pil.resize((nw, nh), Image.BILINEAR))
        h, w = nh, nw
    out = np.zeros((bh, bw) + image.shape[2:], image.dtype)
    out[:h, :w] = image
    mask = np.zeros((bh, bw), bool)
    mask[:h, :w] = True
    return out, mask


def normalize(image: np.ndarray, cfg: DataConfig) -> np.ndarray:
    """(x - mean) / std, channels last (`groundingdino_dt.py:normalizer`)."""
    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)
    return (image.astype(np.float32) - mean) / std


def train_transform(
    sample: Sample, cfg: DataConfig, rng: np.random.RandomState
) -> Sample:
    image, boxes, labels = sample.image, sample.boxes, sample.labels
    if cfg.random_flip:
        image, boxes = random_flip(image, boxes, rng)
    if rng.rand() < 0.5:
        # crop pipeline: resize(400..500) -> crop -> resize multi-scale
        short = rng.choice([400, 500, 600])
        image, boxes = resize_shortest_edge(image, boxes, int(short), cfg.max_size * 4)
        image, boxes, labels = random_crop_absolute_range(image, boxes, labels, rng)
    short = int(rng.choice(cfg.train_short_sides))
    image, boxes = resize_shortest_edge(image, boxes, short, cfg.max_size)
    return dataclasses.replace(
        sample, image=image, boxes=boxes, labels=labels,
        orig_size=sample.orig_size,
    )


def eval_transform(sample: Sample, cfg: DataConfig) -> Sample:
    image, boxes = resize_shortest_edge(
        sample.image, sample.boxes, cfg.test_short_side, cfg.max_size
    )
    crowd = sample.crowd_boxes
    if crowd.size:
        # scale crowd ignore-regions exactly like the gt boxes
        h, w = sample.image.shape[:2]
        nh, nw = image.shape[:2]
        crowd = crowd * np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
    return dataclasses.replace(sample, image=image, boxes=boxes,
                               crowd_boxes=crowd)
