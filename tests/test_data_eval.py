"""Data pipeline + COCO mAP implementation tests (hand-computed oracles)."""

import json
import os

import numpy as np
import pytest

from ziragroundingdino_tpu.config import DataConfig
from ziragroundingdino_tpu.data.coco import CocoDataset
from ziragroundingdino_tpu.data.loader import DataLoader, collate
from ziragroundingdino_tpu.eval.coco_map import CocoMeanAP
from tests.common import tiny_tokenizer


# ---------------------------------------------------------------------------
# COCO mAP
# ---------------------------------------------------------------------------


def test_map_perfect_detections():
    ev = CocoMeanAP(num_classes=3)
    rng = np.random.RandomState(0)
    for img in range(4):
        g = rng.uniform(10, 200, size=(5, 2))
        gt = np.concatenate([g, g + rng.uniform(40, 80, size=(5, 2))], axis=1)
        labels = rng.randint(0, 3, size=5)
        ev.add(img, gt, np.linspace(0.9, 0.5, 5), labels, gt, labels)
    res = ev.summarize()
    assert res["AP"] == pytest.approx(100.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(100.0, abs=1e-6)


def test_map_half_recall():
    """1 TP + 1 FP on 2 GTs: AP = 51/101 (interpolated over 101 recall pts)."""
    ev = CocoMeanAP(num_classes=1)
    gt = np.array([[0, 0, 50, 50], [100, 100, 150, 150]], np.float32)
    det = np.array([[0, 0, 50, 50], [300, 300, 340, 340]], np.float32)
    ev.add(0, det, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0, 0]))
    res = ev.summarize()
    expect = 51.0 / 101.0 * 100.0
    assert res["AP"] == pytest.approx(expect, abs=1e-4)
    assert res["AP50"] == pytest.approx(expect, abs=1e-4)
    assert res["AR@100"] == pytest.approx(50.0, abs=1e-4)


def test_map_iou_threshold_sweep():
    """Detection with IoU 0.6 counts at thr .5/.55/.6 but not above."""
    ev = CocoMeanAP(num_classes=1)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    det = np.array([[0, 0, 100, 60]], np.float32)  # IoU = .6
    ev.add(0, det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    res = ev.summarize()
    # 3 of 10 thresholds pass -> AP = 3/10 * 100
    assert res["AP"] == pytest.approx(30.0, abs=1e-4)
    assert res["AP50"] == pytest.approx(100.0, abs=1e-4)
    assert res["AP75"] == pytest.approx(0.0, abs=1e-4)


def test_map_area_ranges():
    ev = CocoMeanAP(num_classes=1)
    small = np.array([[0, 0, 10, 10]], np.float32)  # area 100 < 32^2
    ev.add(0, small, np.array([0.9]), np.array([0]), small, np.array([0]))
    res = ev.summarize()
    assert res["APs"] == pytest.approx(100.0, abs=1e-4)
    assert np.isnan(res["APl"])  # no large GTs anywhere


# ---------------------------------------------------------------------------
# data pipeline
# ---------------------------------------------------------------------------


@pytest.fixture()
def coco_dir(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(4):
        h, w = 120 + 8 * i, 160 + 8 * i
        arr = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        for _ in range(3):
            x, y = rng.randint(0, w - 40), rng.randint(0, h - 40)
            bw, bh = rng.randint(10, 40), rng.randint(10, 40)
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.choice([1, 7])),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
            })
            aid += 1
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "cat"}, {"id": 7, "name": "dog"}],
    }
    jf = tmp_path / "instances.json"
    jf.write_text(json.dumps(js))
    return str(jf), str(img_dir)


def test_coco_dataset_and_loader(coco_dir):
    jf, root = coco_dir
    ds = CocoDataset.from_json(jf, root)
    assert ds.category_names == ["cat", "dog"]
    assert ds.caption == "cat.dog."
    assert len(ds) == 4

    cfg = DataConfig(
        train_short_sides=(64, 96), max_size=160, test_short_side=96,
        shape_buckets=((96, 128), (128, 160), (160, 224)), max_boxes=10,
        num_workers=0,
    )
    tok = tiny_tokenizer()
    loader = DataLoader(ds, tok, cfg, batch_size=2, train=True, max_text_len=32,
                        max_categories=8)
    batch = next(iter(loader))
    b, h, w, _ = batch["pixels"].shape
    assert b == 2 and (h, w) in cfg.shape_buckets
    assert batch["mask"].shape == (b, h, w)
    assert batch["gt_boxes"].shape == (2, 10, 4)
    valid_boxes = batch["gt_boxes"][batch["gt_valid"]]
    assert np.all(valid_boxes >= 0) and np.all(valid_boxes <= 1)
    assert batch["gt_labels"][batch["gt_valid"]].max() <= 1

    ev_loader = DataLoader(ds, tok, cfg, batch_size=3, train=False,
                           max_text_len=32, max_categories=8)
    batches = list(iter(ev_loader))
    assert len(batches) == 2
    assert int(batches[-1]["real_count"]) == 1
    ids = [int(i) for b_ in batches for i in b_["image_ids"][: int(b_["real_count"])]]
    assert sorted(ids) == [0, 1, 2, 3]


def test_evaluator_with_oracle_detector(coco_dir):
    """Feed GT boxes back as detections through the full evaluator loop ->
    AP must be 100."""
    import jax.numpy as jnp

    from ziragroundingdino_tpu.eval.evaluator import inference_on_dataset
    from ziragroundingdino_tpu.ops.box_ops import box_cxcywh_to_xyxy

    jf, root = coco_dir
    ds = CocoDataset.from_json(jf, root)
    cfg = DataConfig(
        train_short_sides=(64, 96), max_size=160, test_short_side=96,
        shape_buckets=((96, 128), (128, 160), (160, 224)), max_boxes=10,
        num_workers=0,
    )
    tok = tiny_tokenizer()
    loader = DataLoader(ds, tok, cfg, batch_size=2, train=False,
                        max_text_len=32, max_categories=8)

    def oracle_fn(params, batch):
        k = 10
        boxes_n = batch["gt_boxes"]  # normalized cxcywh (resized frame)
        xyxy = box_cxcywh_to_xyxy(boxes_n)
        oh = batch["orig_sizes"][:, 0:1].astype(jnp.float32)
        ow = batch["orig_sizes"][:, 1:2].astype(jnp.float32)
        scale = jnp.concatenate([ow, oh, ow, oh], -1)[:, None, :]
        return {
            "scores": jnp.where(batch["gt_valid"], 0.9, 0.0),
            "labels": batch["gt_labels"],
            "boxes": xyxy * scale,
        }

    res = inference_on_dataset(None, iter(loader), oracle_fn, num_classes=2,
                               num_warmup=0, score_floor=0.5)
    assert res["n_images"] == 4
    assert res["AP"] == pytest.approx(100.0, abs=1e-4)


@pytest.mark.oracle  # compile-heavy (VERDICT r3 item 9)
def test_uint8_device_normalize_matches_host(coco_dir):
    """uint8 transfer + on-device normalize == host-normalized fp32 path."""
    import jax
    import jax.numpy as jnp

    from tests.common import tiny_config, tiny_tokenizer
    from ziragroundingdino_tpu.models.groundingdino import GroundingDINO

    jf, root = coco_dir
    ds = CocoDataset.from_json(jf, root)
    cfg = DataConfig(
        train_short_sides=(64, 96), max_size=160, test_short_side=96,
        shape_buckets=((96, 128), (128, 160)), max_boxes=10, num_workers=0,
    )
    tok = tiny_tokenizer()
    samples = [ds.load_sample(i) for i in range(2)]
    from ziragroundingdino_tpu.data.transforms import eval_transform
    samples = [eval_transform(s, cfg) for s in samples]
    b_f32 = collate(samples, ["cat.dog."] * 2, tok, cfg, 32, 8, train=False)
    b_u8 = collate(samples, ["cat.dog."] * 2, tok, cfg, 32, 8, train=False,
                   transfer_uint8=True)
    assert b_u8["pixels"].dtype == np.uint8

    mcfg = tiny_config()
    model = GroundingDINO(cfg=mcfg)
    text = {k: jnp.asarray(b_f32[k]) for k in (
        "input_ids", "text_token_mask", "position_ids",
        "text_self_attention_masks")}
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(b_f32["pixels"]),
                                 jnp.asarray(b_f32["mask"]), text)
    jfwd = jax.jit(model.apply)
    out_f = jfwd(params, jnp.asarray(b_f32["pixels"]),
                 jnp.asarray(b_f32["mask"]), text)
    out_u = jfwd(params, jnp.asarray(b_u8["pixels"]),
                 jnp.asarray(b_u8["mask"]), text)
    np.testing.assert_allclose(
        np.asarray(out_f["pred_boxes"]), np.asarray(out_u["pred_boxes"]),
        atol=1e-5, rtol=1e-4)


def test_small_dataset_loader_and_prefetch(coco_dir):
    """Datasets smaller than batch_size resample instead of hanging; the
    num_workers prefetch path yields valid batches."""
    jf, root = coco_dir
    ds = CocoDataset.from_json(jf, root)
    ds.images = ds.images[:1]  # 1 image < batch_size 2
    cfg = DataConfig(
        train_short_sides=(64, 96), max_size=160, test_short_side=96,
        shape_buckets=((96, 128), (128, 160), (160, 224)), max_boxes=10,
        num_workers=0,
    )
    tok = tiny_tokenizer()
    it = iter(DataLoader(ds, tok, cfg, batch_size=2, train=True,
                         max_text_len=32, max_categories=8))
    b = next(it)
    assert b["pixels"].shape[0] == 2

    it2 = iter(DataLoader(CocoDataset.from_json(jf, root), tok, cfg,
                          batch_size=2, train=True, max_text_len=32,
                          max_categories=8, num_workers=2))
    seen = [next(it2) for _ in range(3)]
    assert all(s["pixels"].shape[0] == 2 for s in seen)


def test_loader_deterministic_and_fast_forward(coco_dir):
    """Augmentation is per-batch-seeded: the stream is identical across
    num_workers settings (ADVICE r1), and start_batch=k reproduces batch k
    of an uninterrupted run (mid-task resume)."""
    jf, root = coco_dir
    cfg = DataConfig(
        train_short_sides=(64, 96), max_size=160, test_short_side=96,
        shape_buckets=((96, 128), (128, 160), (160, 224)), max_boxes=10,
    )
    tok = tiny_tokenizer()

    def stream(num_workers, start_batch=0, n=4):
        ds = CocoDataset.from_json(jf, root)
        it = iter(DataLoader(ds, tok, cfg, batch_size=2, train=True,
                             max_text_len=32, max_categories=8, seed=7,
                             num_workers=num_workers, start_batch=start_batch))
        return [next(it) for _ in range(n)]

    serial = stream(num_workers=0)
    threaded = stream(num_workers=3)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["pixels"], b["pixels"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
        np.testing.assert_array_equal(a["image_ids"], b["image_ids"])

    resumed = stream(num_workers=0, start_batch=2, n=2)
    for a, b in zip(serial[2:], resumed):
        np.testing.assert_array_equal(a["pixels"], b["pixels"])
        np.testing.assert_array_equal(a["image_ids"], b["image_ids"])
