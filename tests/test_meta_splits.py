"""Few-shot meta splits (COCO/VOC/LVIS base-novel, LVIS frequency bands)."""

import numpy as np
import pytest

from ziragroundingdino_tpu.data.builtin_meta import COCO_CLASSES
from ziragroundingdino_tpu.data.coco import CocoDataset
from ziragroundingdino_tpu.data.meta_splits import (
    COCO_NOVEL_CLASSES,
    VOC_CLASSES,
    VOC_NOVEL_SPLITS,
    coco_meta_split,
    filter_dataset_to_classes,
    lvis_frequency_bands,
    lvis_meta_split,
    voc_meta_split,
)


def test_coco_base_novel_60_20():
    base, novel = coco_meta_split("base"), coco_meta_split("novel")
    assert len(base) == 60 and len(novel) == 20
    assert set(base) | set(novel) == set(COCO_CLASSES)
    assert not set(base) & set(novel)
    assert set(novel) == set(COCO_NOVEL_CLASSES)
    # the canonical TFA/FsDet novel set is the VOC-overlap
    assert "couch" in novel and "airplane" in novel and "zebra" in base


def test_voc_splits():
    assert len(VOC_CLASSES) == 20
    for sid in (1, 2, 3):
        novel = voc_meta_split(sid, "novel")
        base = voc_meta_split(sid, "base")
        assert len(novel) == 5 and len(base) == 15
        assert set(novel) | set(base) == set(VOC_CLASSES)
    assert VOC_NOVEL_SPLITS[1] == ("bird", "bus", "cow", "motorbike", "sofa")


def test_lvis_bands_from_image_count():
    cats = [
        {"id": 1, "name": "rare_thing", "image_count": 3},
        {"id": 2, "name": "common_thing", "image_count": 42},
        {"id": 3, "name": "freq_thing", "image_count": 4000},
    ]
    assert lvis_frequency_bands(cats) == ["r", "c", "f"]
    assert lvis_meta_split(cats, "novel") == ("rare_thing",)
    assert lvis_meta_split(cats, "base") == ("common_thing", "freq_thing")


def test_lvis_bands_recounted_from_annotations():
    cats = [{"id": 7, "name": "x"}, {"id": 8, "name": "y"}]
    anns = [{"category_id": 7, "image_id": i} for i in range(5)] + [
        {"category_id": 8, "image_id": i} for i in range(50)
    ]
    assert lvis_frequency_bands(cats, anns) == ["r", "c"]
    with pytest.raises(ValueError):
        lvis_frequency_bands(cats)  # no counts, no annotations


def test_filter_dataset_remaps_labels():
    ds = CocoDataset(
        image_root="/none",
        category_names=["a", "b", "c"],
        cat_id_to_contiguous={10: 0, 20: 1, 30: 2},
        images=[{"id": 1, "height": 8, "width": 8, "file_name": "x"},
                {"id": 2, "height": 8, "width": 8, "file_name": "y"}],
        anns_by_image={
            1: [{"category_id": 10, "bbox": [0, 0, 2, 2]},
                {"category_id": 30, "bbox": [1, 1, 2, 2]}],
            2: [{"category_id": 20, "bbox": [0, 0, 2, 2]}],
        },
    )
    sub = filter_dataset_to_classes(ds, ["c", "a"])
    assert sub.category_names == ["c", "a"]
    s = sub.load_sample(0, read_image=False)
    # image 1 keeps both anns: cat 10 -> 'a' -> new label 1; 30 -> 'c' -> 0
    assert sorted(s.labels.tolist()) == [0, 1]
    sub2 = filter_dataset_to_classes(ds, ["b"], filter_empty=True)
    assert len(sub2) == 1 and sub2.images[0]["id"] == 2
    s2 = sub2.load_sample(0, read_image=False)
    assert s2.labels.tolist() == [0]
