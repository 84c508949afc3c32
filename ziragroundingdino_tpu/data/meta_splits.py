"""Few-shot "meta" base/novel splits for COCO, PASCAL VOC, and LVIS.

Capability parity with the reference's meta-split registrations
(`datasets/builtin.py:297-299` + `datasets/meta_coco.py`, `meta_pascal_voc.py`,
`meta_lvis.py`, `builtin_meta.py`, `lvis_v0_5_categories.py`). Where the
reference hardcodes ~1.5k lines of category tables, this module *derives*
the same splits:

  * COCO: the canonical few-shot protocol (TFA/FsDet, which the reference's
    tables encode) uses the 20 PASCAL-VOC-overlapping categories as NOVEL
    and the remaining 60 as BASE — computable from the VOC list + the name
    mapping below.
  * VOC: the three standard novel splits are 5-name constants.
  * LVIS: base/novel is frequency-derived — RARE categories (1-10 training
    images) are novel, COMMON (11-100) and FREQUENT (>100) are base — so the
    split and the r/c/f bands are computed from the dataset json's
    `image_count` (or recounted from annotations when absent) instead of
    shipping the 1230-row table.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# PASCAL VOC
# ---------------------------------------------------------------------------

VOC_CLASSES: Tuple[str, ...] = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

# The three standard few-shot VOC novel splits (FsDet protocol, which the
# reference's meta_pascal_voc tables encode).
VOC_NOVEL_SPLITS: Dict[int, Tuple[str, ...]] = {
    1: ("bird", "bus", "cow", "motorbike", "sofa"),
    2: ("aeroplane", "bottle", "cow", "horse", "sofa"),
    3: ("boat", "cat", "motorbike", "sheep", "sofa"),
}


def voc_meta_split(split_id: int, subset: str = "novel") -> Tuple[str, ...]:
    """Class names for VOC few-shot split `split_id` in {1,2,3}."""
    novel = VOC_NOVEL_SPLITS[split_id]
    if subset == "novel":
        return novel
    base = tuple(c for c in VOC_CLASSES if c not in novel)
    if subset == "base":
        return base
    if subset == "all":
        return base + novel
    raise ValueError(subset)


# ---------------------------------------------------------------------------
# COCO
# ---------------------------------------------------------------------------

# VOC name -> COCO name where they differ
_VOC_TO_COCO = {
    "aeroplane": "airplane",
    "diningtable": "dining table",
    "motorbike": "motorcycle",
    "pottedplant": "potted plant",
    "sofa": "couch",
    "tvmonitor": "tv",
}

COCO_NOVEL_CLASSES: Tuple[str, ...] = tuple(
    _VOC_TO_COCO.get(c, c) for c in VOC_CLASSES
)


def coco_meta_split(subset: str = "base") -> Tuple[str, ...]:
    """The 60/20 base/novel COCO few-shot split (novel = VOC-overlapping),
    in contiguous COCO order."""
    from ziragroundingdino_tpu.data.builtin_meta import COCO_CLASSES

    novel = set(COCO_NOVEL_CLASSES)
    assert novel <= set(COCO_CLASSES), novel - set(COCO_CLASSES)
    if subset == "novel":
        return tuple(c for c in COCO_CLASSES if c in novel)
    if subset == "base":
        return tuple(c for c in COCO_CLASSES if c not in novel)
    if subset == "all":
        return tuple(COCO_CLASSES)
    raise ValueError(subset)


# ---------------------------------------------------------------------------
# LVIS
# ---------------------------------------------------------------------------

def lvis_frequency_bands(
    categories: Sequence[dict],
    annotations: Optional[Sequence[dict]] = None,
) -> List[str]:
    """'r'/'c'/'f' per category (LVIS v0.5/v1 protocol: rare = 1-10 training
    images, common = 11-100, frequent = >100). Uses the json's per-category
    `frequency` or `image_count` when present (LVIS jsons carry both);
    otherwise recounts distinct images per category from `annotations`."""
    bands = []
    counts = None
    if annotations is not None:
        counts = {}
        for a in annotations:
            counts.setdefault(a["category_id"], set()).add(a["image_id"])
    for c in categories:
        if "frequency" in c:
            bands.append(c["frequency"])
            continue
        n = c.get("image_count")
        if n is None:
            if counts is None:
                raise ValueError(
                    f"category {c.get('id')} has neither frequency nor "
                    "image_count, and no annotations were provided"
                )
            n = len(counts.get(c["id"], ()))
        bands.append("r" if n <= 10 else ("c" if n <= 100 else "f"))
    return bands


def lvis_meta_split(
    categories: Sequence[dict],
    subset: str = "base",
    annotations: Optional[Sequence[dict]] = None,
) -> Tuple[str, ...]:
    """LVIS few-shot meta split: novel = rare categories, base = common +
    frequent (the reference's meta_lvis tables encode exactly this)."""
    bands = lvis_frequency_bands(categories, annotations)
    if subset == "novel":
        keep = {"r"}
    elif subset == "base":
        keep = {"c", "f"}
    elif subset == "all":
        keep = {"r", "c", "f"}
    else:
        raise ValueError(subset)
    return tuple(
        c.get("name", str(c.get("id"))) for c, b in zip(categories, bands)
        if b in keep
    )


# ---------------------------------------------------------------------------
# dataset-level registration
# ---------------------------------------------------------------------------

def filter_dataset_to_classes(ds, class_names: Sequence[str],
                              filter_empty: bool = False):
    """Restrict a CocoDataset to `class_names` (drops other annotations and
    remaps labels to the new contiguous order) — the registration-side
    equivalent of the reference's meta-split dataset dicts
    (`meta_coco.py` / `meta_pascal_voc.py` filtered loaders)."""
    import dataclasses

    name_to_new = {n: i for i, n in enumerate(class_names)}
    missing = set(class_names) - set(ds.category_names)
    if missing:
        raise ValueError(f"classes not in dataset: {sorted(missing)}")
    # json cat id -> new contiguous id (only kept classes)
    kept_json_ids = {
        jid: name_to_new[ds.category_names[old]]
        for jid, old in ds.cat_id_to_contiguous.items()
        if ds.category_names[old] in name_to_new
    }
    anns_by_image = {
        img_id: [a for a in anns if a["category_id"] in kept_json_ids]
        for img_id, anns in ds.anns_by_image.items()
    }
    images = ds.images
    if filter_empty:
        images = [im for im in images if anns_by_image.get(im["id"])]
    return dataclasses.replace(
        ds,
        category_names=list(class_names),
        cat_id_to_contiguous=kept_json_ids,
        images=images,
        anns_by_image=anns_by_image,
    )
