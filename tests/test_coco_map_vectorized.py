"""Vectorized COCO evaluator: parity with the sequential matcher + speed.

The sequential oracle below is the round-1 per-(img, cat, thr, det) python
loop implementation (itself validated against pycocotools semantics,
`evaluation/coco_evaluation.py:100-205`); the vectorized evaluator must
reproduce its metrics exactly on randomized workloads, and accumulate a
5k-image x 80-class synthetic eval in under 60 s (VERDICT round-1 item 5).
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from ziragroundingdino_tpu.eval.coco_map import (
    AREA_RNG,
    IOU_THRS,
    REC_THRS,
    CocoMeanAP,
    _iou_xyxy,
)


# ---------------------------------------------------------------------------
# round-1 sequential implementation, kept verbatim as the oracle
class _SequentialCocoMeanAP:
    def __init__(self, num_classes, max_dets=100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self.entries = []

    def add(self, image_id, det_boxes, det_scores, det_labels, gt_boxes,
            gt_labels, crowd_boxes=None, crowd_labels=None, gt_areas=None):
        gb = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
        self.entries.append((
            image_id,
            np.asarray(det_boxes, np.float32).reshape(-1, 4),
            np.asarray(det_scores, np.float32).reshape(-1),
            np.asarray(det_labels, np.int64).reshape(-1),
            gb,
            np.asarray(gt_labels, np.int64).reshape(-1),
            np.asarray(crowd_boxes, np.float32).reshape(-1, 4)
            if crowd_boxes is not None else np.zeros((0, 4), np.float32),
            np.asarray(crowd_labels, np.int64).reshape(-1)
            if crowd_labels is not None else np.zeros((0,), np.int64),
            np.asarray(gt_areas, np.float32).reshape(-1)
            if gt_areas is not None else np.zeros((len(gb),), np.float32),
        ))

    def _evaluate_img_cat(self, db, ds, gb, area_rng, crowd=None, areas=None):
        t = len(IOU_THRS)
        order = np.argsort(-ds, kind="mergesort")[: self.max_dets]
        db, ds = db[order], ds[order]
        if crowd is None:
            crowd = np.zeros((0, 4), np.float32)
        n_real = len(gb)
        gb = np.concatenate([gb, crowd], axis=0)
        g_crowd = np.arange(len(gb)) >= n_real
        gt_area = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
        if areas is not None and len(areas):
            ann = np.concatenate([areas, np.zeros(len(crowd), np.float32)])
            gt_area = np.where(ann > 0, ann, gt_area)
        g_ignore = (gt_area < area_rng[0]) | (gt_area > area_rng[1]) | g_crowd
        g_order = np.argsort(g_ignore, kind="mergesort")
        gb, g_ignore, g_crowd = gb[g_order], g_ignore[g_order], g_crowd[g_order]

        iou = _iou_xyxy(db, gb)
        # pycocotools iscrowd IoU: union = dt area
        if g_crowd.any() and len(db):
            ad = (db[:, 2] - db[:, 0]) * (db[:, 3] - db[:, 1])
            lt = np.maximum(db[:, None, :2], gb[None, :, :2])
            rb = np.minimum(db[:, None, 2:], gb[None, :, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[..., 0] * wh[..., 1]
            with np.errstate(invalid="ignore", divide="ignore"):
                crowd_iou = np.where(ad[:, None] > 0, inter / ad[:, None], 0.0)
            iou = np.where(g_crowd[None, :], crowd_iou.astype(np.float32), iou)
        d, g = len(db), len(gb)
        dt_match = np.zeros((t, d), np.int64) - 1
        gt_match = np.zeros((t, g), np.int64) - 1
        for ti, thr in enumerate(IOU_THRS):
            for di in range(d):
                best = thr - 1e-10
                best_gi = -1
                for gi in range(g):
                    # crowds stay matchable (pycocotools continue-on-crowd)
                    if gt_match[ti, gi] >= 0 and not g_crowd[gi]:
                        continue
                    if best_gi >= 0 and not g_ignore[best_gi] and g_ignore[gi]:
                        break
                    if iou[di, gi] < best:
                        continue
                    best = iou[di, gi]
                    best_gi = gi
                if best_gi >= 0:
                    dt_match[ti, di] = best_gi
                    gt_match[ti, best_gi] = di
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

    def _accumulate(self, area_name):
        area_rng = AREA_RNG[area_name]
        t = len(IOU_THRS)
        ap_per_class = np.full((t, self.num_classes), np.nan)
        ar_per_class = np.full((t, self.num_classes), np.nan)
        for c in range(self.num_classes):
            matched, scores, ignored = [], [], []
            npig = 0
            seen_cat = False
            for _, db, ds, dl, gb, gl, cb, cl, ga in self.entries:
                dm = dl == c
                gm = gl == c
                cm = cl == c
                if not dm.any() and not gm.any() and not cm.any():
                    continue
                seen_cat = seen_cat or gm.any()
                m, s, ig, ng = self._evaluate_img_cat(
                    db[dm], ds[dm], gb[gm], area_rng, crowd=cb[cm], areas=ga[gm])
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

    def summarize(self):
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


def _random_workload(rng, n_images, n_classes, max_dets=25, max_gts=10,
                     img_size=640.0):
    """Detections correlated with gts (jittered copies) plus noise boxes,
    including degenerate/tiny boxes and score ties to stress tie-breaking."""
    entries = []
    for i in range(n_images):
        n_gt = rng.randint(0, max_gts + 1)
        xy = rng.rand(n_gt, 2) * img_size * 0.8
        wh = rng.rand(n_gt, 2) * img_size * 0.3 + 2.0
        gt = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        gl = rng.randint(0, n_classes, size=n_gt)
        n_noise = rng.randint(0, max_dets // 2)
        jitter = gt + rng.randn(n_gt, 4) * rng.choice([1.0, 8.0], size=(n_gt, 1))
        noise_xy = rng.rand(n_noise, 2) * img_size * 0.8
        noise_wh = rng.rand(n_noise, 2) * img_size * 0.3 + 1.0
        noise = np.concatenate([noise_xy, noise_xy + noise_wh], 1)
        db = np.concatenate([jitter, noise], 0).astype(np.float32)
        dl = np.concatenate([
            np.where(rng.rand(n_gt) < 0.9, gl, rng.randint(0, n_classes, n_gt)),
            rng.randint(0, n_classes, size=n_noise),
        ])
        ds = np.round(rng.rand(len(db)), 2).astype(np.float32)  # forces ties
        entries.append((i, db, ds, dl, gt, gl))
    return entries


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_sequential(seed):
    rng = np.random.RandomState(seed)
    entries = _random_workload(rng, n_images=30, n_classes=5)
    fast = CocoMeanAP(num_classes=5)
    slow = _SequentialCocoMeanAP(num_classes=5)
    for e in entries:
        fast.add(*e)
        slow.add(*e)
    rf, rs = fast.summarize(), slow.summarize()
    for k, v in rs.items():
        assert rf[k] == pytest.approx(v, abs=1e-9), (k, rf[k], v)


def test_twelve_metrics_and_per_category():
    rng = np.random.RandomState(0)
    entries = _random_workload(rng, n_images=20, n_classes=4)
    ev = CocoMeanAP(num_classes=4)
    for e in entries:
        ev.add(*e)
    res = ev.summarize()
    assert set(res) == {"AP", "AP50", "AP75", "AR@1", "AR@10", "AR@100",
                        "APs", "APm", "APl", "ARs", "ARm", "ARl"}
    assert res["AR@1"] <= res["AR@10"] + 1e-9 <= res["AR@100"] + 2e-9
    percat = ev.per_category_ap()
    assert percat.shape == (4,)
    table = ev.per_category_table(["a", "b", "c", "d"])
    assert "category" in table and "a" in table
    # per-category mean consistent with headline AP
    assert np.nanmean(percat) == pytest.approx(res["AP"], abs=1e-9)


def test_5k_by_80_under_60s():
    rng = np.random.RandomState(0)
    ev = CocoMeanAP(num_classes=80)
    for i in range(5000):
        n_gt = rng.randint(1, 9)
        xy = rng.rand(n_gt, 2) * 500
        wh = rng.rand(n_gt, 2) * 150 + 4
        gt = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        gl = rng.randint(0, 80, size=n_gt)
        n_dt = 20
        reps = rng.randint(0, n_gt, size=n_dt)
        db = gt[reps] + rng.randn(n_dt, 4) * 5
        dl = np.where(rng.rand(n_dt) < 0.8, gl[reps], rng.randint(0, 80, n_dt))
        ds = rng.rand(n_dt).astype(np.float32)
        ev.add(i, db, ds, dl, gt, gl)
    t0 = time.perf_counter()
    res = ev.summarize()
    dt = time.perf_counter() - t0
    assert np.isfinite(res["AP"])
    assert dt < 60.0, f"5k x 80 accumulate took {dt:.1f}s"


def test_iscrowd_ignore_matching():
    """pycocotools crowd semantics: detections on crowd regions are ignored
    (dt-area IoU), crowds absorb multiple detections, and never count in
    recall (`cocoeval.evaluateImg` + maskUtils.iou(iscrowd=1))."""
    gt = np.array([[0, 0, 10, 10]], np.float32)          # one real cat
    crowd = np.array([[100, 100, 200, 200]], np.float32)  # a cat crowd
    # det B sits fully inside the crowd with a HIGHER score than the true
    # positive A: without crowd handling it's a rank-1 FP (AP=50); with
    # ignore-matching it vanishes (AP=100)
    det = np.array([
        [120, 120, 140, 140],   # B: inside crowd
        [0, 0, 10, 10],         # A: exact TP
        [300, 300, 310, 310],   # C: plain FP after max recall
        [150, 150, 170, 170],   # D: second det absorbed by the SAME crowd
    ], np.float32)
    scores = np.array([0.95, 0.9, 0.7, 0.6], np.float32)
    labels = np.zeros(4, np.int64)

    with_crowd = CocoMeanAP(num_classes=1)
    with_crowd.add(0, det, scores, labels, gt, np.zeros(1, np.int64),
                   crowd_boxes=crowd, crowd_labels=np.zeros(1, np.int64))
    res = with_crowd.summarize()
    assert res["AP"] == pytest.approx(100.0, abs=1e-6), res

    without = CocoMeanAP(num_classes=1)
    without.add(0, det, scores, labels, gt, np.zeros(1, np.int64))
    res2 = without.summarize()
    assert res2["AP"] == pytest.approx(50.0, abs=1e-6), res2

    # crowds alone contribute nothing (no real gt -> category absent)
    only_crowd = CocoMeanAP(num_classes=1)
    only_crowd.add(0, det[:1], scores[:1], labels[:1],
                   np.zeros((0, 4), np.float32), np.zeros(0, np.int64),
                   crowd_boxes=crowd, crowd_labels=np.zeros(1, np.int64))
    assert np.isnan(only_crowd.summarize()["AP"])


def test_crowd_flows_from_json_to_eval_batch(tmp_path):
    import json as _json

    from tests.common import tiny_tokenizer
    from PIL import Image
    from ziragroundingdino_tpu.config import DataConfig
    from ziragroundingdino_tpu.data.coco import CocoDataset
    from ziragroundingdino_tpu.data.loader import DataLoader

    d = tmp_path / "ds"
    d.mkdir()
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(d / "i.png")
    _json.dump({
        "images": [{"id": 1, "file_name": "i.png", "height": 40, "width": 60}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
             "area": 100, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [20, 20, 30, 15],
             "area": 450, "iscrowd": 1},
        ],
        "categories": [{"id": 1, "name": "cat"}],
    }, open(d / "ann.json", "w"))
    ds = CocoDataset.from_json(str(d / "ann.json"), str(d))
    s = ds.load_sample(0, read_image=False)
    assert len(s.boxes) == 1 and len(s.crowd_boxes) == 1
    np.testing.assert_allclose(s.crowd_boxes[0], [20, 20, 50, 35])

    cfg = DataConfig(num_workers=0, shape_buckets=((64, 96),), max_boxes=4,
                     test_short_side=40, max_size=96, train_short_sides=(40,))
    ev_loader = DataLoader(ds, tiny_tokenizer(), cfg, batch_size=1, train=False,
                           max_text_len=32, max_categories=8)
    batch = next(iter(ev_loader))
    # crowd arrays are host-only and sized by the batch's true crowd count
    # (no truncation at max_boxes; ADVICE r2)
    assert batch["crowd_valid"].shape == (1, 1)
    assert batch["crowd_valid"][0, 0]
    # training batches carry no crowd keys (crowds never train)
    tr_loader = DataLoader(ds, tiny_tokenizer(), cfg, batch_size=1, train=True,
                           max_text_len=32, max_categories=8)
    tbatch = next(iter(tr_loader))
    assert "crowd_boxes" not in tbatch


def test_annotation_area_drives_size_ranges():
    """pycocotools ranges gts by the annotation 'area' (segmentation area),
    not the box area: a sparse object with a big box but small mask counts
    as SMALL."""
    # box area 100x100 = 10000 (medium/large-ish) but ann area 500 (small)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    det = np.array([[0, 0, 100, 100]], np.float32)

    ev = CocoMeanAP(num_classes=1)
    ev.add(0, det, np.array([0.9]), np.zeros(1, np.int64),
           gt, np.zeros(1, np.int64), gt_areas=np.array([500.0]))
    res = ev.summarize()
    assert res["APs"] == pytest.approx(100.0, abs=1e-6), res
    # NOTE: in the large band the small-area gt is IGNORED, and the det
    # (box area 10000, inside the large range) matches it and is ignored
    # too -> no large-band precision points -> nan
    assert np.isnan(res["APl"]), res

    # without areas: box area 10000 > 96^2 -> large band
    ev2 = CocoMeanAP(num_classes=1)
    ev2.add(0, det, np.array([0.9]), np.zeros(1, np.int64),
            gt, np.zeros(1, np.int64))
    res2 = ev2.summarize()
    assert np.isnan(res2["APs"]), res2
    assert res2["APl"] == pytest.approx(100.0, abs=1e-6), res2


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_vectorized_matches_sequential_with_crowds_and_areas(seed):
    """Fuzz the crowd + annotation-area protocol against the sequential
    oracle (extended with the documented pycocotools crowd semantics)."""
    rng = np.random.RandomState(seed)
    fast = CocoMeanAP(num_classes=4)
    slow = _SequentialCocoMeanAP(num_classes=4)
    for i in range(25):
        img_size = 640.0
        n_gt = rng.randint(0, 7)
        xy = rng.rand(n_gt, 2) * img_size * 0.8
        wh = rng.rand(n_gt, 2) * img_size * 0.3 + 2.0
        gt = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        gl = rng.randint(0, 4, size=n_gt)
        # annotation areas: segmentation-like (40-100% of the box area)
        box_area = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
        ga = (box_area * (0.4 + 0.6 * rng.rand(n_gt))).astype(np.float32)
        n_cr = rng.randint(0, 3)
        cxy = rng.rand(n_cr, 2) * img_size * 0.6
        cwh = rng.rand(n_cr, 2) * img_size * 0.4 + 20.0
        crowd = np.concatenate([cxy, cxy + cwh], 1).astype(np.float32)
        cl = rng.randint(0, 4, size=n_cr)
        n_dt = rng.randint(0, 20)
        src = np.concatenate([gt, crowd], 0) if n_gt + n_cr else np.zeros((0, 4))
        if len(src) and n_dt:
            picks = rng.randint(0, len(src), size=n_dt)
            db = (src[picks] + rng.randn(n_dt, 4) *
                  rng.choice([1.0, 10.0], size=(n_dt, 1))).astype(np.float32)
        else:
            db = (rng.rand(n_dt, 4) * img_size).astype(np.float32)
            db[:, 2:] = db[:, :2] + np.abs(db[:, 2:] - db[:, :2]) + 1
        dl = rng.randint(0, 4, size=n_dt)
        ds = np.round(rng.rand(n_dt), 2).astype(np.float32)
        kw = dict(crowd_boxes=crowd, crowd_labels=cl, gt_areas=ga)
        fast.add(i, db, ds, dl, gt, gl, **kw)
        slow.add(i, db, ds, dl, gt, gl, **kw)
    rf, rs = fast.summarize(), slow.summarize()
    for k, v in rs.items():
        if np.isnan(v):
            assert np.isnan(rf[k]), (k, rf[k], v)
        else:
            assert rf[k] == pytest.approx(v, abs=1e-9), (k, rf[k], v)
