"""BERT encoder parity vs HuggingFace `BertModel` (the oracle the reference
wraps, `bertwarper.py:17-166`) — including the 3-D block-diagonal attention
mask + custom position ids path that GroundingDINO depends on."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.common import TINY_BERT, tiny_text_batch
from ziragroundingdino_tpu.config import BertConfig
from ziragroundingdino_tpu.models.bert import BertEncoder

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier


def hf_config(cfg: BertConfig):
    from transformers import BertConfig as HFBertConfig

    return HFBertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )


def torch_to_params(hf_model, cfg: BertConfig):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    def lin(prefix):
        return {
            "kernel": sd[prefix + ".weight"].T,
            "bias": sd[prefix + ".bias"],
        }

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "embeddings_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention_self": {
                "query": lin(p + ".attention.self.query"),
                "key": lin(p + ".attention.self.key"),
                "value": lin(p + ".attention.self.value"),
            },
            "attention_output_dense": lin(p + ".attention.output.dense"),
            "attention_output_norm": ln(p + ".attention.output.LayerNorm"),
            "intermediate_dense": lin(p + ".intermediate.dense"),
            "output_dense": lin(p + ".output.dense"),
            "output_norm": ln(p + ".output.LayerNorm"),
        }
    return jax.tree.map(jnp.asarray, params)


@pytest.fixture(scope="module")
def models():
    from transformers import BertModel

    torch.manual_seed(0)
    hf = BertModel(hf_config(TINY_BERT), add_pooling_layer=False).eval()
    ours = BertEncoder(TINY_BERT)
    params = torch_to_params(hf, TINY_BERT)
    return hf, ours, params


def test_parity_2d_mask(models):
    hf, ours, params = models
    rng = np.random.RandomState(0)
    ids = rng.randint(5, TINY_BERT.vocab_size, size=(2, 16)).astype(np.int64)
    mask = np.ones((2, 16), dtype=np.int64)
    mask[0, 12:] = 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    out = ours.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask.astype(bool))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_parity_3d_mask_and_position_ids(models):
    """The BertModelWarper path: block-diagonal [B,T,T] mask + per-span
    position ids (`bertwarper.py:106-111,224-273`)."""
    hf, ours, params = models
    tb = tiny_text_batch()
    ids = tb.input_ids.astype(np.int64) % TINY_BERT.vocab_size
    attn3d = tb.text_self_attention_masks.astype(np.int64)
    pos_ids = tb.position_ids.astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(attn3d),
            position_ids=torch.from_numpy(pos_ids),
        ).last_hidden_state.numpy()
    out = ours.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(attn3d.astype(bool)),
        position_ids=jnp.asarray(pos_ids, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
