"""Serving predictor: bucket routing, compile caching, padded batches."""

import numpy as np
import pytest

import jax

from tests.common import tiny_config, tiny_tokenizer
from ziragroundingdino_tpu.config import DataConfig
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.utils.predictor import Predictor


@pytest.mark.oracle  # compile-heavy (VERDICT r3 item 9)
def test_predictor_buckets_and_results():
    import jax.numpy as jnp
    from ziragroundingdino_tpu.text.tokenizer import tokenize_captions

    cfg = tiny_config()
    model = GroundingDINO(cfg=cfg)
    tok = tiny_tokenizer()
    dcfg = DataConfig(test_short_side=64, max_size=96,
                      shape_buckets=((64, 96), (96, 128)), num_workers=0)

    rng = np.random.RandomState(0)
    img0 = rng.randint(0, 255, (60, 90, 3), dtype=np.uint8)
    tb = tokenize_captions(tok, ["cat."], max_text_len=32, max_categories=2,
                           text_len_buckets=(16, 32))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 96, 3), jnp.float32), jnp.ones((1, 64, 96), bool), text)

    p = Predictor(model, params, tok, dcfg, select_k=10,
                  text_len_buckets=(16, 32), batch_buckets=(1, 2, 4),
                  category_buckets=(2, 8))

    out = p([img0], [["cat", "dog"]], score_threshold=0.0)
    assert len(out) == 1
    assert out[0]["boxes"].shape[1] == 4 and len(out[0]["boxes"]) == 10
    assert set(out[0]["label_names"]) <= {"cat", "dog"}
    assert len(p._compiled) == 1

    # same shapes -> cache hit; 3 images -> new bucket (batch 4)
    p([img0], [["cat"]])
    assert len(p._compiled) == 1
    out3 = p([img0, img0, img0], [["cat"], ["dog"], ["cat", "dog"]],
             score_threshold=0.0)
    assert len(out3) == 3 and len(p._compiled) == 2
    # boxes within the original frame
    for r in out3:
        assert np.all(r["boxes"] >= 0) and np.all(r["boxes"][:, 2] <= 90 + 1e-3)
