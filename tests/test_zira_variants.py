"""The other reparameterizable variants: multilayer (RepZeroConvGN +
rep_language_adapter), repconv (vision-only dual branch), repconvbn
(conv+BN branch with BN folding at merge)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.common import tiny_config, tiny_image_batch, tiny_text_batch
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.models.zira import (
    ZeroConvBN,
    rep_merge,
    rep_merge_convbn,
)


def build(modelname, **kw):
    cfg = tiny_config(modelname=modelname, **kw)
    model = GroundingDINO(cfg=cfg)
    pixels, mask = tiny_image_batch(b=1)
    tb = tiny_text_batch(captions=("cat.dog.",))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pixels), jnp.asarray(mask), text
    )
    return cfg, model, variables, (jnp.asarray(pixels), jnp.asarray(mask), text)


@pytest.mark.parametrize("modelname", [
    "dualzerorepmultilayerbranchgroundingdino",
    "repgroundingdino",
    "repconvbngroundingdino",
])
def test_variant_forward_and_merge(modelname):
    kw = {}
    if modelname in ("repgroundingdino", "repconvbngroundingdino"):
        kw = dict(use_cet=False, use_zero_inter_loss=False)
    cfg, model, variables, (pixels, mask, text) = build(modelname, **kw)

    p = variables["params"]
    if modelname == "dualzerorepmultilayerbranchgroundingdino":
        assert "rep_language_adapter" in p
        assert "freeze_gn_scale" in p["input_proj_conv_adapter_0"]
    if modelname == "repconvbngroundingdino":
        assert "bn_scale" in p["input_proj_conv_adapter_0"]
        assert "batch_stats" in variables

    out_eval = model.apply(variables, pixels, mask, text, train=False)
    assert np.isfinite(np.asarray(out_eval["pred_boxes"])).all()

    if modelname == "repconvbngroundingdino":
        out_train, mut = model.apply(
            variables, pixels, mask, text, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in mut
    else:
        out_train = model.apply(variables, pixels, mask, text, train=True)
    assert np.isfinite(np.asarray(out_train["pred_boxes"])).all()
    assert np.isfinite(float(out_train["adapter_losses"]["loss_conv_adapter"]))

    merged = rep_merge(p)
    out_m = model.apply({"params": merged, **{k: v for k, v in variables.items() if k != "params"}},
                        pixels, mask, text, train=False)
    assert np.isfinite(np.asarray(out_m["pred_boxes"])).all()


def test_convbn_merge_algebra():
    """eval(merged) == train-mode branch+freeze output with the BN folded
    (using the running stats as the fold source and matching batch stats)."""
    mod = ZeroConvBN(features=8, kernel_size=1)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 8), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    # randomize branch + bn so the fold is non-trivial
    rng = np.random.RandomState(1)
    p = dict(p)
    p["branch_kernel"] = rng.randn(1, 1, 8, 8).astype(np.float32) * 0.1
    p["branch_bias"] = rng.randn(8).astype(np.float32) * 0.1
    p["bn_scale"] = rng.rand(8).astype(np.float32) + 0.5
    p["bn_bias"] = rng.randn(8).astype(np.float32) * 0.1
    stats = {
        "bn_mean": rng.randn(8).astype(np.float32) * 0.1,
        "bn_var": rng.rand(8).astype(np.float32) + 0.5,
    }

    merged_p, merged_s = rep_merge_convbn(p, stats)
    out_merged, _ = mod.apply(
        {"params": merged_p, "batch_stats": merged_s}, x, train=False
    )

    # manual: freeze(x) + BN_runningstats(branch(x))
    def conv(k, b):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)

    y = conv(p["branch_kernel"], p["branch_bias"])
    y = (y - stats["bn_mean"]) / np.sqrt(stats["bn_var"] + 1e-5) * p["bn_scale"] + p["bn_bias"]
    expect = y + conv(p["freeze_kernel"], p["freeze_bias"])
    np.testing.assert_allclose(np.asarray(out_merged), np.asarray(expect), atol=1e-5)

    # branch re-zeroed
    assert np.allclose(np.asarray(merged_p["branch_kernel"]), 1e-8)


def test_lora_algebra_and_model_wiring():
    """RepZeroLoRA (`adapter.py:227-259`): train fwd = freeze(x) +
    s*up(down(x)); merge folds s*(down@up) into freeze, re-zeroes the
    factors, resets scaling; eval(merged) == train fwd pre-merge."""
    from ziragroundingdino_tpu.models.zira import RepZeroLoRA

    mod = RepZeroLoRA(features=8, down_dim=3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.RandomState(1)
    p = {
        "freeze_kernel": rng.randn(8, 8).astype(np.float32) * 0.1,
        "down_kernel": rng.randn(8, 3).astype(np.float32) * 0.1,
        "up_kernel": rng.randn(3, 8).astype(np.float32) * 0.1,
        "scaling": np.asarray([0.7], np.float32),
    }
    out_train, zil = mod.apply({"params": p}, x, train=True)
    expect = x @ p["freeze_kernel"] + 0.7 * ((x @ p["down_kernel"]) @ p["up_kernel"])
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(expect), atol=1e-5)
    assert float(zil) > 0.0

    merged = rep_merge(p)
    out_merged, zil0 = mod.apply({"params": merged}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_merged), np.asarray(expect), atol=1e-5)
    assert float(zil0) == 0.0
    assert np.allclose(np.asarray(merged["down_kernel"]), 1e-8)
    assert np.allclose(np.asarray(merged["up_kernel"]), 1e-8)
    assert float(merged["scaling"][0]) == pytest.approx(0.1)

    # preset knob wires it as the language adapter
    cfg, model, variables, (pixels, mask, text) = build(
        "dualzerorepbranchgroundingdino", zira_lan_adapter="lora",
        zira_lora_down_dim=4,
    )
    pa = variables["params"]["rep_linear_adapter"]
    assert "down_kernel" in pa and "up_kernel" in pa
    out = model.apply(variables, pixels, mask, text, train=True)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert np.isfinite(float(out["adapter_losses"]["loss_linear_adapter"]))


def test_rep_merge_scale_resets_by_module():
    """Scaling resets to the module's own init: 0.1 for dual adapters, 1.0
    for the multilayer language adapter and GN conv modules."""
    import jax.numpy as jnp

    tree = {
        "rep_linear_adapter": {
            "freeze_kernel": jnp.zeros((2, 2)), "freeze_bias": jnp.zeros(2),
            "branch_kernel": jnp.ones((2, 2)), "branch_bias": jnp.ones(2),
            "scaling": jnp.asarray([0.5]),
        },
        "rep_language_adapter": {
            "freeze_kernel": jnp.zeros((2, 2)), "freeze_bias": jnp.zeros(2),
            "branch_kernel": jnp.ones((2, 2)), "branch_bias": jnp.ones(2),
            "scaling": jnp.asarray([2.0]),
        },
    }
    merged = rep_merge(tree)
    assert float(merged["rep_linear_adapter"]["scaling"][0]) == pytest.approx(0.1)
    assert float(merged["rep_language_adapter"]["scaling"][0]) == pytest.approx(1.0)
    np.testing.assert_allclose(
        np.asarray(merged["rep_language_adapter"]["freeze_kernel"]), 2.0)


@pytest.mark.parametrize("preset", [
    "dtgroundingdino", "finetune", "linearprobe", "prompttune",
    "berttune", "projecttune",
])
def test_pet_preset_forward_smoke(preset):
    """Every PET-baseline preset of the reference's ablation matrix
    (`GroundingDINO_SwinT_OGC_dt_*.py`) must assemble and run: linearprobe
    exercises ContrastiveEmbed-with-linear heads, prompttune the prompt
    paths, berttune/projecttune/finetune are trainable-mask matters but
    must still build."""
    from tests.common import TINY_BERT, TINY_SWIN, tiny_image_batch, tiny_text_batch
    from ziragroundingdino_tpu.config import get_model_config

    cfg = get_model_config(
        preset, hidden_dim=64, nheads=4, dim_feedforward=128,
        enc_layers=1, dec_layers=1, num_queries=8, max_text_len=32,
        max_categories=8, compute_dtype="float32", swin_config=TINY_SWIN,
        bert_config=TINY_BERT, fusion_droppath=0.0, cet_middle_dim=16,
    )
    model = GroundingDINO(cfg=cfg)
    pixels, mask = tiny_image_batch(b=1)
    tb = tiny_text_batch(captions=("cat.dog.",))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pixels), jnp.asarray(mask), text
    )
    out = model.apply(variables, jnp.asarray(pixels), jnp.asarray(mask), text,
                      train=False)
    assert out["pred_logits"].shape == (1, cfg.num_queries, cfg.max_text_len)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    if preset == "linearprobe":
        assert cfg.use_cls_linear


@pytest.mark.oracle  # compile-heavy (VERDICT r3 item 9)
def test_moe_multi_expert_forward_and_grads():
    """The multi-expert MoE path (VERDICT r2 item 7): the dense-dispatch
    redesign of `moe.py:18-117` with num_experts=4, topk=2 under noisy
    gating — gating/balancing loss finite, and gradients reach EVERY
    expert's weights (dense dispatch must not silently drop experts)."""
    from ziragroundingdino_tpu.models.adapters import MoeAdapter

    mod = MoeAdapter(embed_dim=16, down_dim=8, num_experts=4, topk=2,
                     use_self_kd=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 16), jnp.float32)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "gating": jax.random.PRNGKey(1)},
        x, False,
    )
    # zero-init fc2 blocks expert-path grads at init; randomize
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    rng = np.random.RandomState(1)
    moe = p["adapter_moe"]
    for k in ("fc2_kernel", "w_gate", "w_noise"):
        moe[k] = rng.randn(*moe[k].shape).astype(np.float32) * 0.1

    def loss_fn(params, key):
        y, aux = mod.apply({"params": params}, x, False,
                           rngs={"gating": key})
        return jnp.sum(y * y) + aux, aux

    (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        jax.tree_util.tree_map(jnp.asarray, p), jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(aux))
    g = grads["adapter_moe"]
    # per-expert grad energy on the expert MLPs: every expert must train
    for name in ("fc1_kernel", "fc2_kernel"):
        per_expert = np.asarray(jnp.sum(g[name] ** 2, axis=(1, 2)))
        assert (per_expert > 0).all(), (name, per_expert)
    for name in ("w_gate", "w_noise"):
        assert float(jnp.sum(g[name] ** 2)) > 0, name


@pytest.mark.oracle  # compile-heavy (VERDICT r3 item 9)
def test_cat_preset_multi_expert_prompt():
    """CAT preset with cfg.num_experts=4/topk=2 plumbed through the prompt
    MoeAdapter (`groundingdino_dt.py:1095` wires args.num_experts; ours now
    honors cfg instead of hardcoding 1): train forward returns finite
    adapter losses and grads flow into the prompt adapter."""
    from tests.common import TINY_BERT, TINY_SWIN
    from ziragroundingdino_tpu.config import get_model_config

    cfg = get_model_config(
        "catgroundingdino", hidden_dim=64, nheads=4, dim_feedforward=128,
        enc_layers=1, dec_layers=1, num_queries=8, max_text_len=32,
        max_categories=8, compute_dtype="float32", swin_config=TINY_SWIN,
        bert_config=TINY_BERT, fusion_droppath=0.0,
        num_experts=4, num_topk_experts=2, use_prompt=True,
    )
    model = GroundingDINO(cfg=cfg)
    pixels, mask = tiny_image_batch(b=2)
    tb = tiny_text_batch()
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pixels), jnp.asarray(mask), text
    )
    # 4 experts actually materialized
    fc1 = variables["params"]["prompt_adapter"]["adapter_moe"]["fc1_kernel"]
    assert fc1.shape[0] == 4, fc1.shape

    def loss_fn(params):
        out = model.apply(
            {"params": params}, jnp.asarray(pixels), jnp.asarray(mask), text,
            train=True, deterministic=False,
            rngs={"gating": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
        )
        al = out["adapter_losses"]
        return (jnp.sum(out["pred_logits"].astype(jnp.float32) ** 2) * 1e-6
                + sum(jnp.asarray(v, jnp.float32) for v in al.values()))

    grads = jax.grad(loss_fn)(variables["params"])
    gp = grads["prompt_adapter"]["adapter_moe"]
    assert float(jnp.sum(gp["w_gate"] ** 2)) > 0
    assert float(sum(jnp.sum(v ** 2) for v in jax.tree_util.tree_leaves(gp))) > 0
