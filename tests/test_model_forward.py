"""End-to-end model forward: shapes, determinism, ZiRa algebra.

Covers SURVEY §4 items (c) (rep-merge invariant) and shape sanity for the
full assembly (text path + Swin + enhancer + decoder + heads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.common import tiny_config, tiny_image_batch, tiny_text_batch
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.models.zira import rep_merge


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = GroundingDINO(cfg=cfg)
    pixels, mask = tiny_image_batch()
    tb = tiny_text_batch()
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pixels), jnp.asarray(mask), text
    )
    return cfg, model, params, pixels, mask, text, tb


def test_forward_shapes(setup):
    cfg, model, params, pixels, mask, text, tb = setup
    out = model.apply(params, jnp.asarray(pixels), jnp.asarray(mask), text)
    b, q = pixels.shape[0], cfg.num_queries
    assert out["pred_logits"].shape == (b, q, cfg.max_text_len)
    assert out["pred_boxes"].shape == (b, q, 4)
    assert len(out["aux_outputs"]) == cfg.dec_layers - 1
    assert out["interm_outputs"]["pred_boxes"].shape == (b, q, 4)
    boxes = np.asarray(out["pred_boxes"])
    assert np.all(boxes >= 0.0) and np.all(boxes <= 1.0)
    assert np.all(np.isfinite(boxes))
    logits = np.asarray(out["pred_logits"])
    # padded text region must be masked to the large negative
    t_valid = tb.input_ids.shape[1]
    assert np.all(logits[..., t_valid:] < -1e8)


def test_train_eval_rep_algebra(setup):
    """ZiRa invariant: eval(rep_merge(params)) == train(params) detections
    (`groundingdino_dual_zero_rep_branch.py:97-103`: merge makes the freeze
    branch reproduce freeze+s*branch exactly — linear algebra)."""
    cfg, model, params, pixels, mask, text, tb = setup
    # randomize the side branches so the test is non-trivial
    key = jax.random.PRNGKey(1)

    def jitter(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "branch_kernel" in name or "branch_bias" in name:
            k = jax.random.fold_in(key, hash(name) % (2**31))
            return leaf + 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
        return leaf

    params_j = jax.tree_util.tree_map_with_path(jitter, params)

    out_train = model.apply(
        params_j, jnp.asarray(pixels), jnp.asarray(mask), text, train=True
    )
    merged = {"params": rep_merge(params_j["params"])}
    out_eval = model.apply(
        merged, jnp.asarray(pixels), jnp.asarray(mask), text, train=False
    )
    np.testing.assert_allclose(
        np.asarray(out_train["pred_boxes"]), np.asarray(out_eval["pred_boxes"]),
        atol=2e-4, rtol=1e-3,
    )
    lt = np.asarray(out_train["pred_logits"])
    le = np.asarray(out_eval["pred_logits"])
    valid = lt > -1e8
    np.testing.assert_allclose(lt[valid], le[valid], atol=2e-3, rtol=1e-3)


def test_zero_interference_at_init(setup):
    """Fresh side branches (freeze=0, branch~1e-8) leave eval outputs equal
    to the no-adapter model (`:94-95`: eval uses the freeze branch only)."""
    cfg, model, params, pixels, mask, text, tb = setup
    out = model.apply(params, jnp.asarray(pixels), jnp.asarray(mask), text)

    cfg_plain = tiny_config(
        use_cet=False, use_project_adapter=False,
        use_zero_inter_loss=False, use_zero_inter_loss_for_conv=False,
    )
    model_plain = GroundingDINO(cfg=cfg_plain)
    # reuse the shared parameters: drop the adapter params
    plain_params = {
        "params": {
            k: v for k, v in params["params"].items()
            if "rep_linear_adapter" not in k and "conv_adapter" not in k
        }
    }
    out_plain = model_plain.apply(
        plain_params, jnp.asarray(pixels), jnp.asarray(mask), text
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), np.asarray(out_plain["pred_boxes"]), atol=1e-6
    )


def test_adapter_losses_finite(setup):
    cfg, model, params, pixels, mask, text, tb = setup
    out = model.apply(
        params, jnp.asarray(pixels), jnp.asarray(mask), text, train=True
    )
    for k, v in out["adapter_losses"].items():
        assert np.isfinite(np.asarray(v)), k


def test_resnet_backbone_full_assembly():
    """The cfg.backbone='resnet50' branch through the whole model
    (`backbone/backbone.py:119-159` Joiner alternative) — tiny transformer,
    real ResNet-50 trunk at a small image."""
    cfg = tiny_config(backbone="resnet50", swin_config=None)
    model = GroundingDINO(cfg=cfg)
    pixels, mask = tiny_image_batch(b=1)
    tb = tiny_text_batch(captions=("cat.dog.",))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pixels), jnp.asarray(mask), text
    )
    out = model.apply(params, jnp.asarray(pixels), jnp.asarray(mask), text)
    assert out["pred_logits"].shape == (1, cfg.num_queries, cfg.max_text_len)
    assert out["pred_boxes"].shape == (1, cfg.num_queries, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
