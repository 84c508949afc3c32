"""Batch assembly: samples -> fixed-shape device batch dicts.

Replaces the reference's DataLoader-worker + mapper + ImageList chain
(`detr_dataset_mapper.py:85-137`, `groundingdino_dt.py:preprocess_image` +
`prepare_targets`): host threads decode/augment; the batcher pads images to
a shared static bucket, normalizes boxes to the padded size the same way the
reference normalizes to the (unpadded) image size and pads via ImageList —
we keep the per-image true size to normalize boxes, matching
`prepare_targets` (`groundingdino_dual_zero_rep_branch.py:614-627`).

NOTE on box normalization parity: the reference divides gt xyxy by the
*pre-padding* image size; predictions are likewise rescaled at eval by the
pre-padding size (`dt_inference`, `groundingdino_dt.py:701-742`). We do the
same: boxes normalized by the true (resized) image size, NOT the bucket.
The model's coordinate frame, however, spans the padded canvas (boxes are
predicted relative to padded H/W through the position embeddings' normalize
step)... The reference has the identical mismatch (ImageList pads, sine
embedding normalizes by cumsum over the valid mask), so parity holds.
"""

from __future__ import annotations

import threading
import queue as _queue
from dataclasses import dataclass
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ziragroundingdino_tpu.config import DataConfig
from ziragroundingdino_tpu.data.transforms import (
    Sample,
    eval_transform,
    normalize,
    pad_to_bucket,
    pick_bucket,
    train_transform,
)
from ziragroundingdino_tpu.text.tokenizer import TextBatch, WordPieceTokenizer, tokenize_captions


def boxes_to_normalized_cxcywh(boxes_xyxy: np.ndarray, h: int, w: int) -> np.ndarray:
    """xyxy absolute -> cxcywh normalized by (w, h)
    (`prepare_targets` + box_xyxy_to_cxcywh)."""
    if boxes_xyxy.size == 0:
        return boxes_xyxy.reshape(0, 4)
    b = boxes_xyxy.astype(np.float32) / np.array([w, h, w, h], np.float32)
    cx = (b[:, 0] + b[:, 2]) / 2
    cy = (b[:, 1] + b[:, 3]) / 2
    bw = b[:, 2] - b[:, 0]
    bh = b[:, 3] - b[:, 1]
    return np.stack([cx, cy, bw, bh], -1)


def collate(
    samples: Sequence[Sample],
    captions: Sequence[str],
    tokenizer: WordPieceTokenizer,
    cfg: DataConfig,
    max_text_len: int = 256,
    max_categories: int = 90,
    train: bool = True,
    transfer_uint8: bool = False,
    force_bucket: Optional[Tuple[int, int]] = None,
) -> Dict[str, np.ndarray]:
    """Build the fixed-shape batch dict consumed by train/eval steps.

    transfer_uint8=True ships raw uint8 pixels (4x less host->device traffic)
    and defers normalization to the device — the model/step normalizes when
    it sees uint8 input (padded region re-zeroed via the mask, matching the
    reference's normalize-then-pad order).

    force_bucket pins the pad target — required under multi-host sharding,
    where every process must produce identically-shaped local shards of the
    global batch without seeing the other hosts' samples."""
    if force_bucket is not None:
        bh, bw = force_bucket
    else:
        # shared bucket: the largest per-image bucket in the batch
        buckets = [pick_bucket(s.image.shape[0], s.image.shape[1], cfg.shape_buckets) for s in samples]
        bh = max(b[0] for b in buckets)
        bw = max(b[1] for b in buckets)

    b = len(samples)
    pixels = np.zeros((b, bh, bw, 3), np.uint8 if transfer_uint8 else np.float32)
    mask = np.zeros((b, bh, bw), bool)
    n_max = cfg.max_boxes
    gt_boxes = np.zeros((b, n_max, 4), np.float32)
    gt_labels = np.zeros((b, n_max), np.int32)
    gt_valid = np.zeros((b, n_max), bool)
    sizes = np.zeros((b, 2), np.int32)  # true (h, w) after resize
    orig_sizes = np.zeros((b, 2), np.int32)
    image_ids = np.zeros((b,), np.int64)
    if not train:
        # iscrowd ignore-regions for pycocotools-parity evaluation. These
        # never enter jit (host-side evaluator only), so size them by the
        # batch's true max crowd count — no truncation of ignore regions
        # even for images with > max_boxes crowds.
        nc_max = max([len(s.crowd_boxes) for s in samples] + [1])
        crowd_boxes = np.zeros((b, nc_max, 4), np.float32)
        crowd_labels = np.zeros((b, nc_max), np.int32)
        crowd_valid = np.zeros((b, nc_max), bool)
        # annotation "area" (original-image pixels; 0 = fall back to box)
        gt_areas = np.zeros((b, n_max), np.float32)

    for i, s in enumerate(samples):
        if transfer_uint8:
            img, m = pad_to_bucket(
                np.ascontiguousarray(s.image, np.uint8), (bh, bw)
            )
        else:
            img, m = pad_to_bucket(normalize(s.image, cfg), (bh, bw))
        pixels[i], mask[i] = img, m
        h, w = s.image.shape[:2]
        sizes[i] = (h, w)
        orig_sizes[i] = s.orig_size
        image_ids[i] = s.image_id
        n = min(len(s.boxes), n_max)
        if n:
            gt_boxes[i, :n] = boxes_to_normalized_cxcywh(s.boxes[:n], h, w)
            gt_labels[i, :n] = s.labels[:n]
            gt_valid[i, :n] = True
        if not train:
            nc = len(s.crowd_boxes)
            if nc:
                crowd_boxes[i, :nc] = boxes_to_normalized_cxcywh(
                    s.crowd_boxes[:nc], h, w)
                crowd_labels[i, :nc] = s.crowd_labels[:nc]
                crowd_valid[i, :nc] = True
            na = min(len(s.gt_areas), n_max)
            if na:
                gt_areas[i, :na] = s.gt_areas[:na]

    tb = tokenize_captions(
        tokenizer, list(captions), max_text_len=max_text_len,
        max_categories=max_categories,
    )
    return {
        "pixels": pixels,
        "mask": mask,
        "input_ids": tb.input_ids,
        "text_token_mask": tb.text_token_mask,
        "position_ids": tb.position_ids,
        "text_self_attention_masks": tb.text_self_attention_masks,
        "cate_to_token_mask": tb.cate_to_token_mask,
        "gt_labels": gt_labels,
        "gt_boxes": gt_boxes,
        "gt_valid": gt_valid,
        "sizes": sizes,
        "orig_sizes": orig_sizes,
        "image_ids": image_ids,
        **({"crowd_boxes": crowd_boxes, "crowd_labels": crowd_labels,
            "crowd_valid": crowd_valid, "gt_areas": gt_areas}
           if not train else {}),
    }


class DataLoader:
    """Infinite (train) or single-pass (eval) loader with a prefetch thread
    pool — the num_workers DataLoader equivalent (`aquarium.py:61-66`)."""

    def __init__(
        self,
        dataset,  # CocoDataset
        tokenizer: WordPieceTokenizer,
        cfg: DataConfig,
        batch_size: int = 2,
        train: bool = True,
        seed: int = 42,
        max_text_len: int = 256,
        max_categories: int = 90,
        num_workers: Optional[int] = None,
        caption: Optional[str] = None,
        transfer_uint8: bool = False,
        start_batch: int = 0,
        shard_rank: Optional[int] = None,
        shard_count: Optional[int] = None,
    ):
        # multi-host: batch_size is the GLOBAL batch; this loader yields this
        # process's contiguous sub-slice of every global batch (equal-shape
        # shards for jax.make_array_from_process_local_data). Defaults come
        # from the jax runtime so single-process runs are unaffected.
        if shard_rank is None or shard_count is None:
            import jax

            shard_rank = jax.process_index() if shard_rank is None else shard_rank
            shard_count = jax.process_count() if shard_count is None else shard_count
        if batch_size % shard_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by {shard_count} processes"
            )
        self.shard_rank, self.shard_count = shard_rank, shard_count
        self.ds = dataset
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        # self.rng drives the index stream ONLY (consumed serially from one
        # generator); augmentation uses a per-batch RandomState derived from
        # the batch counter so prefetch-worker scheduling can't affect it
        self.rng = np.random.RandomState(seed)
        self.max_text_len = max_text_len
        self.max_categories = max_categories
        self.num_workers = cfg.num_workers if num_workers is None else num_workers
        self.caption = caption if caption is not None else dataset.caption
        self.transfer_uint8 = transfer_uint8
        self.start_batch = start_batch

    def _make_sample(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Sample:
        s = self.ds.load_sample(idx)
        if self.train:
            return train_transform(s, self.cfg, rng if rng is not None else self.rng)
        return eval_transform(s, self.cfg)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.train:
            return self._train_iter()
        return self._eval_iter()

    def _index_stream(self):
        """Global-batch index stream; under multi-host sharding each process
        draws the SAME permutation (seeded rng) and takes its contiguous
        sub-slice of every global batch (torch DistributedSampler semantics,
        `util/misc.py:577-635` + per-rank DataLoader in the reference)."""
        n = len(self.ds)
        local = self.batch_size // self.shard_count
        lo, hi = self.shard_rank * local, (self.shard_rank + 1) * local
        while True:
            order = self.rng.permutation(n)
            # datasets smaller than a batch (1-shot regimes) resample with
            # replacement instead of starving the loop
            if n < self.batch_size:
                order = self.rng.randint(0, n, size=self.batch_size)
            for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
                yield order[start + lo : start + hi]

    def _train_iter(self):
        local = self.batch_size // self.shard_count
        base_pos = self.shard_rank * local

        def make_batch(job):
            bi, idxs = job
            # deterministic per-SAMPLE augmentation RNG keyed on (batch
            # counter, global batch position): identical under any worker
            # scheduling / num_workers, and under multi-host sharding the
            # k-th local sample reproduces exactly the single-process
            # sample at global position shard_rank*local+k (no correlated
            # augmentation across hosts).
            def rng_for(k):
                return np.random.RandomState(
                    (self.seed + 0x9E3779B1 * (bi + 1) + 0x85EBCA6B * (base_pos + k + 1))
                    % (2**32)
                )

            return collate(
                [self._make_sample(int(i), rng_for(k)) for k, i in enumerate(idxs)],
                [self.caption] * len(idxs), self.tokenizer,
                self.cfg, self.max_text_len, self.max_categories, train=True,
                transfer_uint8=self.transfer_uint8,
                # all hosts must produce identically-shaped local shards
                # without seeing each other's samples: pin the pad target
                force_bucket=(
                    self.cfg.shape_buckets[-1] if self.shard_count > 1 else None
                ),
            )

        jobs = enumerate(self._index_stream())
        # mid-task resume (`train_net.py:298-305` resumes at iter+1): skip the
        # first start_batch jobs cheaply — index draws only, no decode/augment
        # — so the resumed stream matches an uninterrupted run exactly (index
        # rng advances identically; per-batch aug rng is keyed on the counter)
        for _ in range(self.start_batch):
            next(jobs)
        if self.num_workers and self.num_workers > 0:
            yield from self._prefetched(make_batch, jobs)
            return
        for job in jobs:
            yield make_batch(job)

    def _prefetched(self, make_batch, jobs, depth: int = 4):
        """Background prefetch: worker threads build batches ahead of the
        training loop (the num_workers DataLoader equivalent,
        `aquarium.py:61-66`). PIL/numpy release the GIL for the heavy parts.
        Results are yielded in submission order and each batch carries its own
        RNG, so the output stream is deterministic for a fixed seed."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = [pool.submit(make_batch, next(jobs)) for _ in range(depth)]
            while True:
                fut = pending.pop(0)
                pending.append(pool.submit(make_batch, next(jobs)))
                yield fut.result()

    def _eval_iter(self):
        n = len(self.ds)
        for start in range(0, n, self.batch_size):
            idxs = range(start, min(start + self.batch_size, n))
            samples = [self._make_sample(int(i)) for i in idxs]
            # pad the final short batch by repeating the last sample; the
            # evaluator drops duplicates by image_id count
            real = len(samples)
            while len(samples) < self.batch_size:
                samples.append(samples[-1])
            batch = collate(
                samples, [self.caption] * len(samples), self.tokenizer,
                self.cfg, self.max_text_len, self.max_categories, train=False,
                transfer_uint8=self.transfer_uint8,
            )
            batch["real_count"] = np.asarray(real, np.int32)
            yield batch
