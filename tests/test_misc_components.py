"""ResNet backbone, phrase decoding, vl span maps, ODinW registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.common import tiny_tokenizer
from ziragroundingdino_tpu.data.odinw import ODINW13, ODINW35, get_odinw_task, odinw_suite
from ziragroundingdino_tpu.models.resnet import ResNet
from ziragroundingdino_tpu.text.vl_utils import (
    build_captions_and_token_span,
    create_positive_map_from_span,
)
from ziragroundingdino_tpu.utils.inference import get_phrases_from_posmap


def test_resnet_shapes():
    model = ResNet(depths=(1, 1, 1, 1), out_indices=(1, 2, 3))
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    m = jnp.ones((1, 64, 96), bool)
    outs, _ = model.init_with_output(jax.random.PRNGKey(0), x, m)
    assert [o[0].shape for o in outs] == [
        (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048)
    ]
    assert [o[1].shape for o in outs] == [(1, 8, 12), (1, 4, 6), (1, 2, 3)]


def test_phrase_decode():
    tok = tiny_tokenizer()
    ids = tok.encode("cat.dog.")
    posmap = np.zeros(len(ids), bool)
    # activate the 'dog' token
    dog_id = tok.vocab["dog"]
    posmap[ids.index(dog_id)] = True
    phrase = get_phrases_from_posmap(posmap, ids, tok, right_idx=len(ids) - 1)
    assert phrase == "dog"


def test_positive_map_spans():
    tok = tiny_tokenizer()
    caption, spans = build_captions_and_token_span(["cat", "dog"])
    assert caption == "cat . dog ."
    pm = create_positive_map_from_span(
        tok, caption, [spans["cat"], spans["dog"]], max_text_len=16
    )
    assert pm.shape == (2, 16)
    # each phrase's mass sums to 1 and the two maps don't overlap
    np.testing.assert_allclose(pm.sum(-1), [1.0, 1.0], atol=1e-5)
    assert float((pm[0] * pm[1]).sum()) == 0.0


def test_odinw_registry():
    assert len(ODINW13) == 13 and len(set(ODINW13)) == 13
    assert len(ODINW35) == len(set(ODINW35)) and set(ODINW13) <= set(ODINW35)
    t = get_odinw_task("Aquarium", "/data/odinw", shot="full")
    assert t.max_iter == 2000
    assert "Aquarium Combined.v2-raw-1024.coco/train" in t.train_root
    t1 = get_odinw_task("Aquarium", "/data/odinw", shot="1shot")
    assert t1.max_iter == 40
    assert "fewshot_train_shot1_seed3.json" in t1.train_json
    suite = odinw_suite("odinw13", "/data/odinw")
    assert [s.name for s in suite] == ODINW13


def test_fewshot_and_io(tmp_path):
    import json
    from ziragroundingdino_tpu.data.coco import CocoDataset
    from ziragroundingdino_tpu.data.fewshot import fewshot_subset, write_fewshot_json
    from ziragroundingdino_tpu.utils import io as zio

    images = [{"id": i, "file_name": f"{i}.jpg", "height": 10, "width": 10}
              for i in range(20)]
    anns = {i: [{"id": i + 1, "image_id": i, "category_id": (i % 2) + 1,
                 "bbox": [0, 0, 5, 5]}] for i in range(20)}
    ds = CocoDataset(image_root="/x", category_names=["a", "b"],
                     cat_id_to_contiguous={1: 0, 2: 1}, images=images,
                     anns_by_image=anns)
    sub = fewshot_subset(ds, shots=2, seed=3)
    labels = [ds.cat_id_to_contiguous[a["category_id"]]
              for anns_ in sub.anns_by_image.values() for a in anns_]
    assert labels.count(0) >= 2 and labels.count(1) >= 2
    assert len(sub.images) <= 6

    path = write_fewshot_json(ds, str(tmp_path), shots=1, seed=3)
    assert path.endswith("fewshot_train_shot1_seed3.json")
    reloaded = CocoDataset.from_json(path, "/x")
    assert reloaded.category_names == ["a", "b"]

    zio.dump({"x": 1}, str(tmp_path / "a.json"))
    assert zio.load(str(tmp_path / "a.json")) == {"x": 1}
    zio.dump([1, 2], str(tmp_path / "b.pkl"))
    assert zio.load(str(tmp_path / "b.pkl")) == [1, 2]


def test_learned_position_embedding():
    import jax
    import jax.numpy as jnp

    from tests.common import tiny_config, tiny_image_batch, tiny_text_batch
    from ziragroundingdino_tpu.models.groundingdino import GroundingDINO

    cfg = tiny_config(position_embedding="learned")
    model = GroundingDINO(cfg=cfg)
    pixels, mask = tiny_image_batch(b=1)
    tb = tiny_text_batch(captions=("cat.dog.",))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(pixels), jnp.asarray(mask), text)
    assert "pos_row_embed" in v["params"] and v["params"]["pos_row_embed"].shape == (50, 32)
    out = model.apply(v, jnp.asarray(pixels), jnp.asarray(mask), text)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
