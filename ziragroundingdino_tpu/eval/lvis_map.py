"""LVIS federated evaluation.

Parity with `evaluation/lvis_evaluation.py` (which defers to the LVIS API):
the federated protocol differs from COCO in that
  * each image only has exhaustive annotations for a subset of categories:
    detections of a category on an image where that category is in
    `neg_category_ids` count as false positives, but on images where the
    category was simply *not verified* they are IGNORED;
  * images whose annotations for a category are flagged not-exhaustive keep
    their gts but ignore unmatched detections (possible unannotated TPs);
  * maxDets is 300 and there is no per-category score cap.

`LvisMeanAP` plugs the per-(image, category) federated rules into the
vectorized COCO matcher via the `_include_pair` / `_ignore_unmatched_dets`
hooks; AP bands by category frequency (rare/common/frequent) are reported
when category frequencies are provided.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Set

import numpy as np

from ziragroundingdino_tpu.eval.coco_map import CocoMeanAP


class LvisMeanAP(CocoMeanAP):
    def __init__(
        self,
        num_classes: int,
        max_dets: int = 300,
        category_frequency: Optional[Sequence[str]] = None,  # 'r'/'c'/'f' per class
    ):
        super().__init__(num_classes=num_classes, max_dets=max_dets)
        self.recall_max_dets = (max_dets,)
        self.category_frequency = category_frequency
        # per-image category knowledge: pos = has GT, neg = verified absent
        self._neg: Dict[int, Set[int]] = {}
        self._not_exhaustive: Dict[int, Set[int]] = {}

    def add_image_meta(self, image_id, neg_category_ids: Sequence[int],
                       not_exhaustive_category_ids: Sequence[int] = ()):
        self._neg[image_id] = set(neg_category_ids)
        self._not_exhaustive[image_id] = set(not_exhaustive_category_ids)
        self._cache = None

    # federated rule: a category unverified on an image (no gt and not a
    # verified negative) contributes nothing — its detections are ignored
    def _include_pair(self, img_id, c, has_gt: bool, has_dt: bool) -> bool:
        return has_gt or c in self._neg.get(img_id, set())

    # not-exhaustively-annotated: unmatched dets may be unannotated TPs
    def _ignore_unmatched_dets(self, img_id, c) -> bool:
        return c in self._not_exhaustive.get(img_id, set())

    def summarize(self) -> Dict[str, float]:
        res = super().summarize()
        if self.category_frequency is not None:
            ap_all, _ = self._accumulate("all")
            with np.errstate(invalid="ignore"):
                per_class = np.nanmean(ap_all, axis=0)
            for band, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
                idx = [i for i, f in enumerate(self.category_frequency) if f == band]
                vals = per_class[idx] if idx else np.asarray([np.nan])
                res[key] = float(np.nanmean(vals)) * 100.0 if np.isfinite(vals).any() else float("nan")
        return res
