"""COCO-style bbox mAP in pure numpy (pycocotools is not in the image).

Implements the COCOeval bbox protocol the reference relies on
(`evaluation/coco_evaluation.py:100-205,305` -> pycocotools COCOeval):
IoU thresholds 0.50:0.95:0.05, 101 recall points, area ranges
all/small/medium/large, maxDets (1, 10, 100), greedy per-category matching
of score-sorted detections, crowd-free (the loaders drop iscrowd). Produces
the standard 12 metrics; `AP` is the headline number averaged by
`train_multidatasets.py:552-559`.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _iou_xyxy(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    """[D, G] IoU."""
    if d.size == 0 or g.size == 0:
        return np.zeros((len(d), len(g)), np.float32)
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    ad = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    ag = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    union = ad[:, None] + ag[None, :] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


class CocoMeanAP:
    """Accumulates detections + ground truth, then computes COCO metrics.

    add(image_id, det_boxes [D,4] xyxy, det_scores [D], det_labels [D],
        gt_boxes [G,4] xyxy, gt_labels [G])
    """

    def __init__(self, num_classes: int, max_dets: int = 100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self.entries: List[Tuple] = []

    def add(self, image_id, det_boxes, det_scores, det_labels, gt_boxes, gt_labels):
        self.entries.append((
            image_id,
            np.asarray(det_boxes, np.float32).reshape(-1, 4),
            np.asarray(det_scores, np.float32).reshape(-1),
            np.asarray(det_labels, np.int64).reshape(-1),
            np.asarray(gt_boxes, np.float32).reshape(-1, 4),
            np.asarray(gt_labels, np.int64).reshape(-1),
        ))

    # ------------------------------------------------------------------
    def _evaluate_img_cat(self, db, ds, gb, area_rng):
        """Returns (dt_matched_iou[T, D], dt_scores[D], dt_ignore[T, D],
        n_valid_gt) for one (image, category)."""
        t = len(IOU_THRS)
        order = np.argsort(-ds, kind="mergesort")[: self.max_dets]
        db, ds = db[order], ds[order]
        gt_area = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
        g_ignore = (gt_area < area_rng[0]) | (gt_area > area_rng[1])
        # sort gt: non-ignored first (pycocotools semantics)
        g_order = np.argsort(g_ignore, kind="mergesort")
        gb, g_ignore = gb[g_order], g_ignore[g_order]

        iou = _iou_xyxy(db, gb)
        d, g = len(db), len(gb)
        dt_match = np.zeros((t, d), np.int64) - 1
        gt_match = np.zeros((t, g), np.int64) - 1
        for ti, thr in enumerate(IOU_THRS):
            for di in range(d):
                best = thr - 1e-10
                best_gi = -1
                for gi in range(g):
                    if gt_match[ti, gi] >= 0:
                        continue
                    # stop at ignored gts once a real match found
                    if best_gi >= 0 and not g_ignore[best_gi] and g_ignore[gi]:
                        break
                    if iou[di, gi] < best:
                        continue
                    best = iou[di, gi]
                    best_gi = gi
                if best_gi >= 0:
                    dt_match[ti, di] = best_gi
                    gt_match[ti, best_gi] = di
        # detection ignore: matched to ignored gt, or unmatched & outside area
        dt_area = (db[:, 2] - db[:, 0]) * (db[:, 3] - db[:, 1])
        d_out = (dt_area < area_rng[0]) | (dt_area > area_rng[1])
        dt_ignore = np.zeros((t, d), bool)
        for ti in range(t):
            m = dt_match[ti]
            if g:
                dt_ignore[ti] = np.where(m >= 0, g_ignore[np.clip(m, 0, None)], d_out)
            else:
                dt_ignore[ti] = d_out
        return dt_match >= 0, ds, dt_ignore, int((~g_ignore).sum())

    def _accumulate(self, area_name: str):
        area_rng = AREA_RNG[area_name]
        t = len(IOU_THRS)
        ap_per_class = np.full((t, self.num_classes), np.nan)
        ar_per_class = np.full((t, self.num_classes), np.nan)
        for c in range(self.num_classes):
            matched, scores, ignored = [], [], []
            npig = 0
            seen_cat = False
            for _, db, ds, dl, gb, gl in self.entries:
                dm = dl == c
                gm = gl == c
                if not dm.any() and not gm.any():
                    continue
                seen_cat = seen_cat or gm.any()
                m, s, ig, ng = self._evaluate_img_cat(db[dm], ds[dm], gb[gm], area_rng)
                matched.append(m)
                scores.append(s)
                ignored.append(ig)
                npig += ng
            if npig == 0 or not seen_cat:
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
            for ti in range(t):
                tp, fp = tp_cum[ti], fp_cum[ti]
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                ar_per_class[ti, c] = rc[-1] if len(rc) else 0.0
                # precision envelope
                pr = pr.tolist()
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, REC_THRS, side="left")
                q = np.zeros(len(REC_THRS))
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                ap_per_class[ti, c] = q.mean()
        return ap_per_class, ar_per_class

    def summarize(self) -> Dict[str, float]:
        ap_all, ar_all = self._accumulate("all")

        def mean(x):
            return float(np.nanmean(x)) * 100.0 if np.isfinite(x).any() else float("nan")

        res = {
            "AP": mean(ap_all),
            "AP50": mean(ap_all[0]),
            "AP75": mean(ap_all[5]),
            "AR@100": mean(ar_all),
        }
        for name in ("small", "medium", "large"):
            ap, ar = self._accumulate(name)
            res[f"AP{name[0]}"] = mean(ap)
            res[f"AR{name[0]}"] = mean(ar)
        return res
