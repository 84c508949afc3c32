"""Pascal VOC detection AP (the reference's second evaluator,
`evaluation/pascal_voc_evaluation.py`): per-class AP at IoU 0.5 with the
VOC2007 11-point or the VOC2010+ all-points (area) interpolation."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ziragroundingdino_tpu.eval.coco_map import _iou_xyxy


class VocMeanAP:
    def __init__(self, num_classes: int, iou_thr: float = 0.5, use_07_metric: bool = False):
        self.num_classes = num_classes
        self.iou_thr = iou_thr
        self.use_07 = use_07_metric
        self.entries: List = []

    def add(self, image_id, det_boxes, det_scores, det_labels, gt_boxes,
            gt_labels, gt_difficult=None):
        """gt_difficult: VOC 'difficult' flags — excluded from npos, and a
        detection whose best overlap is a difficult gt is neither TP nor FP
        (`voc_eval`, reference `pascal_voc_evaluation.py:255-259`)."""
        gb = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
        self.entries.append((
            image_id,
            np.asarray(det_boxes, np.float32).reshape(-1, 4),
            np.asarray(det_scores, np.float32).reshape(-1),
            np.asarray(det_labels, np.int64).reshape(-1),
            gb,
            np.asarray(gt_labels, np.int64).reshape(-1),
            np.asarray(gt_difficult, bool).reshape(-1)
            if gt_difficult is not None else np.zeros((len(gb),), bool),
        ))

    def _ap(self, rec: np.ndarray, prec: np.ndarray) -> float:
        if self.use_07:
            ap = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                p = prec[rec >= t].max() if (rec >= t).any() else 0.0
                ap += p / 11.0
            return float(ap)
        mrec = np.concatenate(([0.0], rec, [1.0]))
        mpre = np.concatenate(([0.0], prec, [0.0]))
        for i in range(len(mpre) - 1, 0, -1):
            mpre[i - 1] = max(mpre[i - 1], mpre[i])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

    def summarize(self) -> Dict[str, float]:
        aps = []
        for c in range(self.num_classes):
            scores, matched, skipped = [], [], []
            npos = 0
            for _, db, ds, dl, gb, gl, gdiff in self.entries:
                gm = gl == c
                g = gb[gm]
                diff = gdiff[gm]
                npos += int((~diff).sum())
                d = dl == c
                db_c, ds_c = db[d], ds[d]
                order = np.argsort(-ds_c, kind="mergesort")
                db_c, ds_c = db_c[order], ds_c[order]
                iou = _iou_xyxy(db_c, g)
                taken = np.zeros(len(g), bool)
                for i in range(len(db_c)):
                    scores.append(ds_c[i])
                    if len(g) == 0:
                        matched.append(False)
                        skipped.append(False)
                        continue
                    j = int(np.argmax(iou[i]))
                    # strict > like the reference voc_eval's `ovmax > ovthresh`
                    # (a detection at exactly the threshold is an FP there)
                    if iou[i, j] > self.iou_thr and diff[j]:
                        # best overlap is difficult: neither TP nor FP
                        matched.append(False)
                        skipped.append(True)
                    elif iou[i, j] > self.iou_thr and not taken[j]:
                        taken[j] = True
                        matched.append(True)
                        skipped.append(False)
                    else:
                        matched.append(False)
                        skipped.append(False)
            if npos == 0:
                continue
            scores = np.asarray(scores)
            matched = np.asarray(matched, bool)
            skipped = np.asarray(skipped, bool)
            order = np.argsort(-scores, kind="mergesort")
            m_o, sk_o = matched[order], skipped[order]
            tp = np.cumsum(m_o)
            fp = np.cumsum(~m_o & ~sk_o)
            rec = tp / npos
            prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
            aps.append(self._ap(rec, prec))
        return {
            "mAP": float(np.mean(aps) * 100.0) if aps else float("nan"),
            "per_class_AP": [a * 100.0 for a in aps],
        }
