"""LVIS federated evaluation.

Parity with `evaluation/lvis_evaluation.py` (which defers to the LVIS API):
the federated protocol differs from COCO in that
  * each image only has exhaustive annotations for a subset of categories:
    detections of a category on an image where that category is in
    `neg_category_ids` count as false positives, but on images where the
    category was simply *not verified* they are IGNORED;
  * maxDets is 300 and there is no per-category score cap.

`LvisMeanAP` wraps the COCO matcher with the per-(image, category)
ignore rule; AP bands by category frequency (rare/common/frequent) are
reported when category frequencies are provided.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ziragroundingdino_tpu.eval.coco_map import IOU_THRS, CocoMeanAP


class LvisMeanAP(CocoMeanAP):
    def __init__(
        self,
        num_classes: int,
        max_dets: int = 300,
        category_frequency: Optional[Sequence[str]] = None,  # 'r'/'c'/'f' per class
    ):
        super().__init__(num_classes=num_classes, max_dets=max_dets)
        self.category_frequency = category_frequency
        # per-image category knowledge: pos = has GT, neg = verified absent
        self._neg: Dict[int, Set[int]] = {}
        self._not_exhaustive: Dict[int, Set[int]] = {}

    def add_image_meta(self, image_id, neg_category_ids: Sequence[int],
                       not_exhaustive_category_ids: Sequence[int] = ()):
        self._neg[image_id] = set(neg_category_ids)
        self._not_exhaustive[image_id] = set(not_exhaustive_category_ids)

    def _accumulate(self, area_name: str):
        from ziragroundingdino_tpu.eval.coco_map import AREA_RNG

        area_rng = AREA_RNG[area_name]
        t = len(IOU_THRS)
        ap = np.full((t, self.num_classes), np.nan)
        ar = np.full((t, self.num_classes), np.nan)
        for c in range(self.num_classes):
            matched, scores, ignored = [], [], []
            npig = 0
            for img_id, db, ds, dl, gb, gl in self.entries:
                gm = gl == c
                dm = dl == c
                has_gt = bool(gm.any())
                verified_neg = c in self._neg.get(img_id, set())
                if not has_gt and not verified_neg:
                    # federated rule: category unverified on this image ->
                    # its detections are ignored entirely
                    continue
                if not dm.any() and not has_gt:
                    continue
                m, s, ig, ng = self._evaluate_img_cat(db[dm], ds[dm], gb[gm], area_rng)
                if c in self._not_exhaustive.get(img_id, set()):
                    # not-exhaustively-annotated: unmatched dets may be
                    # unannotated true positives -> ignore them
                    ig = ig | ~m
                matched.append(m)
                scores.append(s)
                ignored.append(ig)
                npig += ng
            if npig == 0:
                continue
            m = np.concatenate(matched, axis=1) if matched else np.zeros((t, 0), bool)
            s = np.concatenate(scores) if scores else np.zeros((0,))
            ig = np.concatenate(ignored, axis=1) if ignored else np.zeros((t, 0), bool)
            order = np.argsort(-s, kind="mergesort")
            m, ig = m[:, order], ig[:, order]
            tps = m & ~ig
            fps = ~m & ~ig
            tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
            from ziragroundingdino_tpu.eval.coco_map import REC_THRS

            for ti in range(t):
                tp, fp = tp_cum[ti], fp_cum[ti]
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                ar[ti, c] = rc[-1] if len(rc) else 0.0
                pr = pr.tolist()
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, REC_THRS, side="left")
                q = np.zeros(len(REC_THRS))
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                ap[ti, c] = q.mean()
        return ap, ar

    def summarize(self) -> Dict[str, float]:
        res = super().summarize()
        if self.category_frequency is not None:
            ap_all, _ = self._accumulate("all")
            per_class = np.nanmean(ap_all, axis=0)
            for band, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
                idx = [i for i, f in enumerate(self.category_frequency) if f == band]
                vals = per_class[idx] if idx else np.asarray([np.nan])
                res[key] = float(np.nanmean(vals)) * 100.0 if np.isfinite(vals).any() else float("nan")
        return res
