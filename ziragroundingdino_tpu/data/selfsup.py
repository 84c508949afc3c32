"""Self-supervised patch-proposal mapper (UP-DETR-style pretraining).

TPU-native counterpart of the reference's ``SelfSupervisionDetrDatasetMapper``
(`groundingdino/datasets/detr_dataset_mapper.py:140-257`): at train time the
mapper attaches class-agnostic ``patch_boxes`` proposals computed by
selective search on a ``res_size``-square resize of the augmented image,
scaled back to image coordinates as float xyxy — exactly the contract the
reference produces via OpenCV-contrib's ``SelectiveSearchSegmentation``
("fast" strategy, randomized base segmentation scale).

OpenCV's contrib module is not available here, so the two stages of that
algorithm are implemented directly in numpy:

  1. Felzenszwalb–Huttenlocher graph segmentation (IJCV 2004) on the
     downscaled image — the base over-segmentation selective search starts
     from. Edge weights are RGB distances over the 8-neighborhood; the
     classic union-find with adaptive threshold tau(C) = k/|C| plus a
     min-size cleanup pass.
  2. Greedy hierarchical region merging by color + size similarity,
     emitting every region's bounding box along the merge hierarchy —
     selective search's box generator for a single colorspace/strategy.

The reference randomizes the segmentation scale per image
(``switchToSelectiveSearchFast(50 + rand*100)``); `k` here is drawn from
the same range with the caller's RNG.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ziragroundingdino_tpu.config import DataConfig
from ziragroundingdino_tpu.data.transforms import (
    Sample,
    _resize_u8,
    eval_transform,
    train_transform,
)


def _felzenszwalb(img: np.ndarray, k: float, min_size: int) -> np.ndarray:
    """Graph-based segmentation; returns a label map [h, w] int32.

    `img` is float32 [h, w, 3]. Classic formulation: process edges by
    ascending weight, join components when the weight is below both
    components' internal difference + tau, then force-merge components
    smaller than `min_size`.
    """
    h, w = img.shape[:2]
    n = h * w
    idx = np.arange(n, dtype=np.int32).reshape(h, w)

    # pre-smooth (the paper uses a sigma=0.8 Gaussian): two passes of a
    # separable 3-tap [1,2,1]/4 kernel, reflect-padded
    for _ in range(2):
        p = np.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
        img = (p[:-2] + 2.0 * p[1:-1] + p[2:]) * 0.25
        p = np.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
        img = (p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]) * 0.25

    edges = []
    weights = []
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        y0a, y1a = 0, h - dy
        x0a = max(0, -dx)
        x1a = w - dx if dx > 0 else w
        a = idx[y0a:y1a, x0a:x1a]
        b = idx[y0a + dy:y1a + dy, x0a + dx:x1a + dx]
        wgt = np.sqrt(
            ((img[y0a:y1a, x0a:x1a] - img[y0a + dy:y1a + dy, x0a + dx:x1a + dx]) ** 2
             ).sum(-1))
        edges.append(np.stack([a.ravel(), b.ravel()], 1))
        weights.append(wgt.ravel())
    edges = np.concatenate(edges)
    weights = np.concatenate(weights)
    order = np.argsort(weights, kind="stable")
    edges = edges[order]
    weights = weights[order]

    parent = np.arange(n, dtype=np.int32)
    size = np.ones(n, np.int32)
    internal = np.zeros(n, np.float32)  # max MST edge inside the component

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for (a, b), wgt in zip(edges, weights):
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if wgt <= min(internal[ra] + k / size[ra], internal[rb] + k / size[rb]):
            parent[rb] = ra
            size[ra] += size[rb]
            internal[ra] = wgt
    # min-size cleanup: merge any too-small component across each edge
    for (a, b), wgt in zip(edges, weights):
        ra, rb = find(a), find(b)
        if ra != rb and (size[ra] < min_size or size[rb] < min_size):
            parent[rb] = ra
            size[ra] += size[rb]
    roots = np.fromiter((find(i) for i in range(n)), np.int32, n)
    _, labels = np.unique(roots, return_inverse=True)
    return labels.reshape(h, w).astype(np.int32)


def _region_boxes_and_hierarchy(
    labels: np.ndarray, img: np.ndarray, max_merges: int
) -> np.ndarray:
    """Initial region boxes + greedy merge-hierarchy boxes, xyxy in the
    downscaled pixel grid (selective search's proposal generator)."""
    h, w = labels.shape
    n_reg = int(labels.max()) + 1
    ys, xs = np.mgrid[0:h, 0:w]
    flat = labels.ravel()
    x0 = np.full(n_reg, w, np.float32)
    y0 = np.full(n_reg, h, np.float32)
    x1 = np.zeros(n_reg, np.float32)
    y1 = np.zeros(n_reg, np.float32)
    np.minimum.at(x0, flat, xs.ravel())
    np.minimum.at(y0, flat, ys.ravel())
    np.maximum.at(x1, flat, xs.ravel())
    np.maximum.at(y1, flat, ys.ravel())
    sizes = np.bincount(flat, minlength=n_reg).astype(np.float32)
    colors = np.zeros((n_reg, 3), np.float32)
    for c in range(3):
        colors[:, c] = np.bincount(flat, weights=img[..., c].ravel(),
                                   minlength=n_reg)
    colors /= sizes[:, None]

    # region adjacency from horizontal/vertical label changes
    pairs = set()
    lab = labels
    for a, b in ((lab[:, :-1], lab[:, 1:]), (lab[:-1], lab[1:])):
        diff = a != b
        for pa, pb in zip(a[diff].ravel(), b[diff].ravel()):
            pairs.add((min(pa, pb), max(pa, pb)))

    boxes = [np.stack([x0, y0, x1 + 1, y1 + 1], 1)]
    total = float(h * w)
    live = {i: (x0[i], y0[i], x1[i], y1[i], sizes[i], colors[i])
            for i in range(n_reg)}
    adj = {p for p in pairs}
    for _ in range(max_merges):
        if not adj:
            break
        # similarity = color closeness + small-region preference (the
        # size + fill terms of selective search, color-hist simplified
        # to mean-color distance)
        best, best_s = None, -1.0
        for (a, b) in adj:
            if a not in live or b not in live:
                continue
            xa0, ya0, xa1, ya1, sa, ca = live[a]
            xb0, yb0, xb1, yb1, sb, cb = live[b]
            s_color = 1.0 - np.linalg.norm(ca - cb) / 442.0  # max RGB dist
            s_size = 1.0 - (sa + sb) / total
            s = s_color + s_size
            if s > best_s:
                best_s, best = s, (a, b)
        if best is None:
            break
        a, b = best
        xa0, ya0, xa1, ya1, sa, ca = live.pop(a)
        xb0, yb0, xb1, yb1, sb, cb = live.pop(b)
        m = (min(xa0, xb0), min(ya0, yb0), max(xa1, xb1), max(ya1, yb1),
             sa + sb, (ca * sa + cb * sb) / (sa + sb))
        key = n_reg + len(boxes)
        live[key] = m
        boxes.append(np.array([[m[0], m[1], m[2] + 1, m[3] + 1]], np.float32))
        adj = {((key if p in (a, b) else p), (key if q in (a, b) else q))
               for p, q in adj if (p, q) != (min(a, b), max(a, b))}
        adj = {(min(p, q), max(p, q)) for p, q in adj if p != q}
    return np.concatenate(boxes, 0)


def selective_patch_boxes(
    image: np.ndarray,
    rng: np.random.RandomState,
    res_size: int = 128,
    max_boxes: int = 256,
) -> np.ndarray:
    """Class-agnostic proposals [N, 4] float32 xyxy in `image` coordinates
    (reference: ``selective_search`` at `detr_dataset_mapper.py:185-203`)."""
    h, w = image.shape[:2]
    small = _resize_u8(image.astype(np.uint8), res_size, res_size)
    smallf = small.astype(np.float32)
    # the reference randomizes the SS base scale in [50, 150)
    k = 50.0 + float(rng.rand()) * 100.0
    labels = _felzenszwalb(smallf, k=k * 3.0, min_size=20)
    boxes = _region_boxes_and_hierarchy(labels, smallf, max_merges=64)
    boxes = boxes / float(res_size)
    boxes = boxes * np.array([w, h, w, h], np.float32)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
    # drop degenerate + duplicate boxes, cap the count
    keep = (boxes[:, 2] - boxes[:, 0] > 1) & (boxes[:, 3] - boxes[:, 1] > 1)
    boxes = np.unique(np.round(boxes[keep], 1), axis=0)
    if len(boxes) > max_boxes:
        boxes = boxes[rng.permutation(len(boxes))[:max_boxes]]
    return boxes.astype(np.float32)


@dataclasses.dataclass
class SelfSupSample:
    """A `Sample` plus its self-supervision patch proposals."""

    sample: Sample
    patch_boxes: np.ndarray  # [N, 4] float32 xyxy; empty at eval time


def selfsup_map(
    sample: Sample,
    cfg: DataConfig,
    rng: Optional[np.random.RandomState] = None,
    is_train: bool = True,
    res_size: int = 128,
) -> SelfSupSample:
    """The mapper: augment like the detection pipeline, then (train only)
    attach selective-search proposals on the augmented image — mirroring
    `SelfSupervisionDetrDatasetMapper.__call__`
    (`detr_dataset_mapper.py:206-257`, incl. dropping annotations at eval)."""
    if is_train:
        assert rng is not None, "training map needs an RNG"
        out = train_transform(sample, cfg, rng)
        patch = selective_patch_boxes(out.image, rng, res_size=res_size)
        return SelfSupSample(sample=out, patch_boxes=patch)
    out = eval_transform(sample, cfg)
    out = dataclasses.replace(
        out,
        boxes=np.zeros((0, 4), np.float32),
        labels=np.zeros((0,), np.int64),
    )
    return SelfSupSample(sample=out, patch_boxes=np.zeros((0, 4), np.float32))
