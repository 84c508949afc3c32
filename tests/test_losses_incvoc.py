"""Loss library parity vs torch; class-incremental dataset filtering."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ziragroundingdino_tpu.data.coco import CocoDataset
from ziragroundingdino_tpu.data.incremental_voc import (
    VOC_CLASSES,
    filter_classes,
    incremental_splits,
)
from ziragroundingdino_tpu.train import losses as L


def test_focal_l1_ce_parity():
    rng = np.random.RandomState(0)
    pred = rng.randn(6, 5).astype(np.float32)
    tgt = (rng.rand(6, 5) > 0.7).astype(np.float32)

    ours = float(L.sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    p = torch.from_numpy(pred)
    t = torch.from_numpy(tgt)
    ce = F.binary_cross_entropy_with_logits(p, t, reduction="none")
    prob = p.sigmoid()
    p_t = prob * t + (1 - prob) * (1 - t)
    ref = ((0.25 * t + 0.75 * (1 - t)) * ce * (1 - p_t) ** 2).mean()
    assert ours == pytest.approx(float(ref), rel=1e-5)

    a = rng.randn(7, 4).astype(np.float32)
    b = rng.randn(7, 4).astype(np.float32)
    assert float(L.l1_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(F.l1_loss(torch.from_numpy(a), torch.from_numpy(b))), rel=1e-5)
    assert float(L.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b))), rel=1e-5)

    logits = rng.randn(5, 9).astype(np.float32)
    idx = rng.randint(0, 9, 5)
    assert float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(idx))) == pytest.approx(
        float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(idx))), rel=1e-5)


def test_incremental_splits_and_filter():
    base, inc = incremental_splits(VOC_CLASSES, "15+5")
    assert len(base) == 15 and len(inc) == 5 and base[0] == "aeroplane"

    ds = CocoDataset(
        image_root="/x",
        category_names=["cat", "dog", "fish"],
        cat_id_to_contiguous={1: 0, 5: 1, 9: 2},
        images=[{"id": 1, "file_name": "a.jpg", "height": 10, "width": 10},
                {"id": 2, "file_name": "b.jpg", "height": 10, "width": 10}],
        anns_by_image={
            1: [{"category_id": 1, "bbox": [0, 0, 5, 5]}],
            2: [{"category_id": 5, "bbox": [0, 0, 5, 5]},
                {"category_id": 9, "bbox": [1, 1, 4, 4]}],
        },
    )
    sub = filter_classes(ds, ["dog", "fish"])
    assert sub.category_names == ["dog", "fish"]
    assert [im["id"] for im in sub.images] == [2]
    s = sub.load_sample(0, read_image=False)
    assert sorted(s.labels.tolist()) == [0, 1]

    inv = filter_classes(ds, ["dog", "fish"], invert=True)
    assert inv.category_names == ["cat"]
    assert [im["id"] for im in inv.images] == [1]
