"""Full-model parity oracle against the PYTORCH REFERENCE in /root/reference.

Builds the reference's own `build_groundingdino` (vanilla,
`groundingdino.py:400-439`) and `build_dual_zero_rep_branch_groundingdino`
(ZiRa, `groundingdino_dual_zero_rep_branch.py:749-830`) at tiny scale on CPU
(tests/oracle_stubs.py), converts the randomly-initialized torch state_dict
through `utils/torch_convert.py`, and asserts our flax model reproduces the
reference's end-to-end logits and boxes. This is the whole-model version of
the per-layer golden tests — the same converter + model path a real
`groundingdino_swint_ogc.pth` load takes.

Why batch=1: the reference's text-enhancer layer expands its 3-D attention
mask with `src_mask.repeat(self.nhead, 1, 1)` (`transformer_vanilla.py:
108-110`). torch's MultiheadAttention interprets dim 0 of a 3-D mask as
(batch, heads) *batch-major*, so `repeat` (head-major tiling) scrambles
masks ACROSS batch items whenever batch>1 and nhead>1 — e.g. batch item 0 /
head 1 attends under batch item 1's caption mask. `repeat_interleave` is the
intended semantics, and it is what this repo implements (the per-sample mask
broadcast over heads, models/layers.py MultiHeadAttention). At batch=1 the
two agree exactly, so parity is asserted there; the quirk itself is pinned
by test_reference_text_mask_quirk below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import os

if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)

from tests.common import tiny_config
from tests.oracle_stubs import get_tiny_reference_model
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.text.tokenizer import (
    WordPieceTokenizer,
    make_synthetic_vocab,
    tokenize_captions,
)
from ziragroundingdino_tpu.train.step import class_logits_from_tokens
from ziragroundingdino_tpu.utils.torch_convert import convert_state_dict, merge_into

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier


@pytest.fixture(scope="module")
def wp():
    return WordPieceTokenizer(
        make_synthetic_vocab(["cat", "dog", "zebra", "person", "fish", "car"])
    )


def _image(seed=0, h=64, w=96, valid_h=51, valid_w=76):
    rng = np.random.RandomState(seed)
    pixels = rng.randn(h, w, 3).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[:valid_h, :valid_w] = True
    return pixels, mask


def _our_text(wp_tok, caption, max_text_len=32):
    tb = tokenize_captions(wp_tok, [caption], max_text_len=max_text_len,
                           max_categories=8, text_len_buckets=(max_text_len,))
    return tb, {k: jnp.asarray(v) for k, v in tb.asdict().items()}


def _convert_into(model, ref, jp, jm, text, with_stats=False):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jp, jm, text)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tree, stats, _, unmatched = convert_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    problems = merge_into(params, tree)
    assert unmatched == [], f"converter missed reference keys: {unmatched[:10]}"
    assert problems == [], f"merge problems: {problems[:10]}"
    if with_stats:
        bstats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
        sproblems = merge_into(bstats, stats)
        assert sproblems == [], f"stats merge problems: {sproblems[:10]}"
        return params, bstats
    return params


def test_vanilla_full_model_oracle(wp):
    """Vanilla GroundingDINO (`demo/inference_on_a_image.py` config path):
    random torch init -> convert -> identical logits/boxes, fp32."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="vanilla")
    from groundingdino.util.misc import NestedTensor

    cfg = tiny_config(modelname="groundingdino", use_cet=False,
                      use_project_adapter=False, use_zero_inter_loss=False,
                      use_zero_inter_loss_for_conv=False)
    model = GroundingDINO(cfg=cfg)

    for seed, caption, vh, vw in [(0, "cat.dog.", 51, 76),
                                  (1, "zebra.person.fish.", 64, 96)]:
        pixels, mask = _image(seed, valid_h=vh, valid_w=vw)
        with torch.no_grad():
            t_out = ref(
                NestedTensor(
                    torch.from_numpy(pixels.transpose(2, 0, 1))[None],
                    torch.from_numpy(~mask)[None],
                ),
                captions=[caption],
            )
        tb, text = _our_text(wp, caption)
        jp, jm = jnp.asarray(pixels[None]), jnp.asarray(mask[None])
        params = _convert_into(model, ref, jp, jm, text)
        out = model.apply({"params": params}, jp, jm, text, train=False)

        jl = np.asarray(out["pred_logits"], np.float32)
        jb = np.asarray(out["pred_boxes"], np.float32)
        tl = t_out["pred_logits"].numpy()[..., :32]
        tbx = t_out["pred_boxes"].numpy()
        valid = np.asarray(tb.text_token_mask)[:, None, :]
        logit_diff = np.max(np.where(valid, np.abs(jl - tl), 0.0))
        box_diff = np.max(np.abs(jb - tbx))
        assert logit_diff < 2e-3, f"caption={caption}: logits diverge {logit_diff}"
        assert box_diff < 2e-4, f"caption={caption}: boxes diverge {box_diff}"


def test_zira_full_model_oracle(wp):
    """ZiRa dual-zero-rep-branch model end-to-end: the reference's eval
    forward (dt_inference inputs captured at
    `groundingdino_dual_zero_rep_branch.py:588-591`) vs ours, with the rep
    FREEZE branches randomized so their conversion is load-bearing."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="zira")

    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        ref.rep_linear_adapter.freeze_linear.weight.normal_(0, 0.05, generator=g)
        ref.rep_linear_adapter.freeze_linear.bias.normal_(0, 0.05, generator=g)
        for m in ref.input_proj_conv_adapter:
            m.freeze_conv.weight.normal_(0, 0.05, generator=g)
            m.freeze_conv.bias.normal_(0, 0.05, generator=g)

    captured = {}

    class _Stop(Exception):
        pass

    def fake_dt(box_cls, box_pred, image_sizes):
        captured["logits"] = box_cls.numpy()
        captured["boxes"] = box_pred.numpy()
        raise _Stop

    ref.dt_inference = fake_dt
    rng = np.random.RandomState(0)
    h, w = 64, 96
    raw = rng.randint(0, 255, size=(3, h, w)).astype(np.float32)
    with torch.no_grad(), pytest.raises(_Stop):
        ref([{"image": torch.from_numpy(raw), "captions": "cat.dog.",
              "height": h, "width": w}])

    cfg = tiny_config(modelname="dualzerorepbranchgroundingdino", cet_middle_dim=16)
    model = GroundingDINO(cfg=cfg)
    tb, text = _our_text(wp, "cat.dog.")
    pm = np.array(ref.pixel_mean, np.float32)
    ps = np.array(ref.pixel_std, np.float32)
    jp = jnp.asarray(((raw.transpose(1, 2, 0) - pm) / ps)[None])
    jm = jnp.ones((1, h, w), bool)
    params = _convert_into(model, ref, jp, jm, text)
    out = model.apply({"params": params}, jp, jm, text, train=False)

    # the reference hands dt_inference per-CLASS logits
    # (recover_to_cls_logits at `:547-552`); ours emits token logits
    j_cls = np.asarray(class_logits_from_tokens(
        out["pred_logits"], jnp.asarray(np.asarray(tb.cate_to_token_mask))),
        np.float32)
    n_cls = 2
    cls_diff = np.max(np.abs(j_cls[..., :n_cls] - captured["logits"][..., :n_cls]))
    box_diff = np.max(np.abs(np.asarray(out["pred_boxes"], np.float32)
                             - captured["boxes"]))
    assert cls_diff < 2e-3, f"per-class logits diverge: {cls_diff}"
    assert box_diff < 2e-4, f"boxes diverge: {box_diff}"


def test_repzero_modules_torch_oracle():
    """Torch-oracle for the ZiRa module math in TRAIN mode (the full-model
    test covers eval): forward output, both ZIL terms, and __rep__ merge of
    RepZeroLinear (`groundingdino_dual_zero_rep_branch.py:105-135`) vs ours."""
    from tests.oracle_stubs import install_reference_stubs

    install_reference_stubs()
    from groundingdino.models.GroundingDINO.groundingdino_dual_zero_rep_branch import (
        RepZeroLinear as TorchRepZeroLinear,
    )

    from ziragroundingdino_tpu.models.zira import RepZeroLinear, rep_merge

    torch.manual_seed(3)
    t_mod = TorchRepZeroLinear(in_features=16, out_features=8)
    with torch.no_grad():
        t_mod.weight.normal_(0, 0.1)
        t_mod.bias.normal_(0, 0.1)
        t_mod.freeze_linear.weight.normal_(0, 0.1)
        t_mod.freeze_linear.bias.normal_(0, 0.1)
        t_mod.scaling.fill_(0.3)

    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    t_mod.train()
    t_out, t_zil = t_mod(torch.from_numpy(x))

    # .copy(): .detach().numpy() aliases torch storage, and __rep__ below
    # re-initializes the branch in place (`:133-135`)
    p = {
        "branch_kernel": t_mod.weight.detach().numpy().T.copy(),
        "branch_bias": t_mod.bias.detach().numpy().copy(),
        "freeze_kernel": t_mod.freeze_linear.weight.detach().numpy().T.copy(),
        "freeze_bias": t_mod.freeze_linear.bias.detach().numpy().copy(),
        "scaling": t_mod.scaling.detach().numpy().copy(),
    }
    mod = RepZeroLinear(features=8)
    j_out, j_zil = mod.apply({"params": p}, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(float(j_zil), float(t_zil), rtol=1e-5)

    # __rep__ merge parity (`:129-135`)
    with torch.no_grad():
        t_mod.__rep__()
    merged = rep_merge(p)
    np.testing.assert_allclose(
        np.asarray(merged["freeze_kernel"]),
        t_mod.freeze_linear.weight.detach().numpy().T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(merged["freeze_bias"]),
        t_mod.freeze_linear.bias.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged["branch_kernel"]),
                               t_mod.weight.detach().numpy().T, atol=1e-9)

    # eval forward: freeze branch only (`:94-95`)
    t_mod.eval()
    t_eval, _ = t_mod(torch.from_numpy(x))
    j_eval, j_zero = mod.apply({"params": merged}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_eval), t_eval.detach().numpy(),
                               atol=1e-5)
    assert float(j_zero) == 0.0


def test_reference_text_mask_quirk(wp):
    """Pins the divergence justifying batch=1 above: torch MHA with the
    reference's `repeat`-expanded mask differs at batch>1, while
    `repeat_interleave` (our semantics) matches us exactly
    (`transformer_vanilla.py:108-110`)."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="vanilla")
    tl = ref.transformer.encoder.text_layers[0]

    from ziragroundingdino_tpu.models.layers import MultiHeadAttention

    rng = np.random.RandomState(0)
    b, t, e = 2, 7, 64
    x = rng.randn(b, t, e).astype(np.float32)
    m = np.zeros((b, t, t), bool)
    m[0, :4, :4] = True
    m[1] = np.eye(t, dtype=bool)
    m[1, 4:, 4:] = True
    np.fill_diagonal(m[0], True)

    with torch.no_grad():
        tq = torch.from_numpy(x).transpose(0, 1)
        out_repeat = tl.self_attn(
            tq, tq, tq, attn_mask=torch.from_numpy(~m).repeat(tl.nhead, 1, 1)
        )[0].transpose(0, 1).numpy()
        out_interleave = tl.self_attn(
            tq, tq, tq,
            attn_mask=torch.from_numpy(~m).repeat_interleave(tl.nhead, dim=0),
        )[0].transpose(0, 1).numpy()

    mha = MultiHeadAttention(num_heads=tl.nhead)
    p = {
        "in_proj_kernel": tl.self_attn.in_proj_weight.detach().numpy().T,
        "in_proj_bias": tl.self_attn.in_proj_bias.detach().numpy(),
        "out_proj": {
            "kernel": tl.self_attn.out_proj.weight.detach().numpy().T,
            "bias": tl.self_attn.out_proj.bias.detach().numpy(),
        },
    }
    ours = np.asarray(mha.apply({"params": p}, jnp.asarray(x), jnp.asarray(x),
                                jnp.asarray(x), attn_mask=jnp.asarray(m)),
                      np.float32)
    np.testing.assert_allclose(ours, out_interleave, atol=1e-5)
    assert np.max(np.abs(out_repeat - out_interleave)) > 1e-3, (
        "expected the reference repeat() quirk to matter at batch>1")


def test_repconvbn_full_model_oracle(wp):
    """repconvbn variant (`groundingdino_repconvbn.py`): the single-branch
    conv+BN rep adapter's FREEZE convs randomized so their conversion is
    load-bearing; eval forward (freeze branch only, `:96-104`) must match."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="repconvbn")

    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for m in ref.input_proj_conv_adapter:
            m.freeze_conv.weight.normal_(0, 0.05, generator=g)
            m.freeze_conv.bias.normal_(0, 0.05, generator=g)

    captured = {}

    class _Stop(Exception):
        pass

    def fake_dt(box_cls, box_pred, image_sizes):
        captured["logits"] = box_cls.numpy()
        captured["boxes"] = box_pred.numpy()
        raise _Stop

    ref.dt_inference = fake_dt
    rng = np.random.RandomState(0)
    h, w = 64, 96
    raw = rng.randint(0, 255, size=(3, h, w)).astype(np.float32)
    with torch.no_grad(), pytest.raises(_Stop):
        ref([{"image": torch.from_numpy(raw), "captions": "cat.dog.",
              "height": h, "width": w}])

    # the reference model here is built from the OGC_rep SLConfig, which has
    # use_cet=True (the preset shim maps repconvbn to use_cet=False because
    # no dedicated SLConfig exists for it — the oracle mirrors the build)
    cfg = tiny_config(modelname="repconvbngroundingdino", use_cet=True,
                      cet_middle_dim=16)
    model = GroundingDINO(cfg=cfg)
    tb, text = _our_text(wp, "cat.dog.")
    pm = np.array(ref.pixel_mean, np.float32)
    ps = np.array(ref.pixel_std, np.float32)
    jp = jnp.asarray(((raw.transpose(1, 2, 0) - pm) / ps)[None])
    jm = jnp.ones((1, h, w), bool)
    params, bstats = _convert_into(model, ref, jp, jm, text, with_stats=True)
    out = model.apply({"params": params, "batch_stats": bstats},
                      jp, jm, text, train=False)

    j_cls = np.asarray(class_logits_from_tokens(
        out["pred_logits"], jnp.asarray(np.asarray(tb.cate_to_token_mask))),
        np.float32)
    n_cls = 2
    cls_diff = np.max(np.abs(j_cls[..., :n_cls] - captured["logits"][..., :n_cls]))
    box_diff = np.max(np.abs(np.asarray(out["pred_boxes"], np.float32)
                             - captured["boxes"]))
    assert cls_diff < 2e-3, f"per-class logits diverge: {cls_diff}"
    assert box_diff < 2e-4, f"boxes diverge: {box_diff}"


def test_cat_full_model_oracle(wp):
    """CAT variant (`groundingdino_conditional_adapter_tuning.py` +
    `transformer_for_adapter.py:850,969` in-layer adapters, use_adapter=True):
    adapter up-projections randomized (zero-init otherwise) so the gated
    bottleneck path and its conversion are load-bearing at eval."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="cat")

    g = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if ".adapter.adapter_up." in name:
                p.normal_(0, 0.05, generator=g)

    captured = {}

    class _Stop(Exception):
        pass

    def fake_inf(box_cls, box_pred, image_sizes):
        captured["logits"] = box_cls.numpy()
        captured["boxes"] = box_pred.numpy()
        raise _Stop

    ref.inference = fake_inf
    rng = np.random.RandomState(0)
    h, w = 64, 96
    raw = rng.randint(0, 255, size=(3, h, w)).astype(np.float32)
    with torch.no_grad(), pytest.raises(_Stop):
        ref([{"image": torch.from_numpy(raw), "captions": "cat.dog.",
              "height": h, "width": w}])

    cfg = tiny_config(modelname="catgroundingdino", use_adapter=True,
                      use_cet=False, use_prompt=True)
    model = GroundingDINO(cfg=cfg)
    tb, text = _our_text(wp, "cat.dog.")
    pm = np.array(ref.pixel_mean, np.float32)
    ps = np.array(ref.pixel_std, np.float32)
    jp = jnp.asarray(((raw.transpose(1, 2, 0) - pm) / ps)[None])
    jm = jnp.ones((1, h, w), bool)
    params = _convert_into(model, ref, jp, jm, text)
    out = model.apply({"params": params}, jp, jm, text, train=False)

    # the reference emits per-class logits padded to max_text_len with -100
    # fill (recover_to_cls_logits); compare the real class columns
    n_cls = 2
    ours = np.asarray(class_logits_from_tokens(
        out["pred_logits"], jnp.asarray(np.asarray(tb.cate_to_token_mask))),
        np.float32)[..., :n_cls]
    cls_diff = np.max(np.abs(ours - captured["logits"][..., :n_cls]))
    box_diff = np.max(np.abs(np.asarray(out["pred_boxes"], np.float32)
                             - captured["boxes"]))
    assert cls_diff < 2e-3, f"logits diverge: {cls_diff}"
    assert box_diff < 2e-4, f"boxes diverge: {box_diff}"


def test_multilayer_full_model_oracle(wp):
    """Multilayer-branch variant (`groundingdino_dual_zero_rep_multilayer_
    branch.py`): RepZeroLinear language adapter + RepZeroConv2dGN vision
    adapters (post-projection placement, `:575-576`); freeze weights
    randomized so their conversion is load-bearing. Eval forward uses the
    freeze branches only (`:100,139`)."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="multilayer")

    g = torch.Generator().manual_seed(17)
    with torch.no_grad():
        ref.rep_language_adapter.freeze_linear.weight.normal_(0, 0.05, generator=g)
        ref.rep_language_adapter.freeze_linear.bias.normal_(0, 0.05, generator=g)
        for m in ref.input_proj_conv_adapter:
            m.freeze_conv.weight.normal_(0, 0.05, generator=g)
            m.freeze_conv.bias.normal_(0, 0.05, generator=g)

    captured = {}

    class _Stop(Exception):
        pass

    def fake_dt(box_cls, box_pred, image_sizes):
        captured["logits"] = box_cls.numpy()
        captured["boxes"] = box_pred.numpy()
        raise _Stop

    ref.dt_inference = fake_dt
    rng = np.random.RandomState(0)
    h, w = 64, 96
    raw = rng.randint(0, 255, size=(3, h, w)).astype(np.float32)
    with torch.no_grad(), pytest.raises(_Stop):
        ref([{"image": torch.from_numpy(raw), "captions": "cat.dog.",
              "height": h, "width": w}])

    cfg = tiny_config(modelname="dualzerorepmultilayerbranchgroundingdino",
                      cet_middle_dim=16)
    model = GroundingDINO(cfg=cfg)
    tb, text = _our_text(wp, "cat.dog.")
    pm = np.array(ref.pixel_mean, np.float32)
    ps = np.array(ref.pixel_std, np.float32)
    jp = jnp.asarray(((raw.transpose(1, 2, 0) - pm) / ps)[None])
    jm = jnp.ones((1, h, w), bool)
    params = _convert_into(model, ref, jp, jm, text)
    out = model.apply({"params": params}, jp, jm, text, train=False)

    n_cls = 2
    j_cls = np.asarray(class_logits_from_tokens(
        out["pred_logits"], jnp.asarray(np.asarray(tb.cate_to_token_mask))),
        np.float32)
    cls_diff = np.max(np.abs(j_cls[..., :n_cls] - captured["logits"][..., :n_cls]))
    box_diff = np.max(np.abs(np.asarray(out["pred_boxes"], np.float32)
                             - captured["boxes"]))
    assert cls_diff < 2e-3, f"per-class logits diverge: {cls_diff}"
    assert box_diff < 2e-4, f"boxes diverge: {box_diff}"


def test_fullsize_converter_key_coverage(wp):
    """FULL-dimension converter key coverage in the DEFAULT suite (VERDICT
    r2 item 5): build the reference vanilla model at real scale (Swin-T,
    6+6 layers, d=256, BERT-base geometry, 900 queries), run its complete
    state_dict through the converter, and merge into our full-size param
    tree obtained via jax.eval_shape (no forward, no weights needed). The
    property under test is zero-unmatched-keys / zero merge problems —
    exactly what a real `groundingdino_swint_ogc.pth` load exercises
    (docs/RUNBOOK_checkpoint_parity.md)."""
    from tests.oracle_stubs import get_fullsize_reference_model
    from ziragroundingdino_tpu.config import get_model_config

    ref = get_fullsize_reference_model(wp, max_text_len=256, seed=0)
    cfg = get_model_config(
        "groundingdino", compute_dtype="float32", use_cet=False,
        use_project_adapter=False, use_zero_inter_loss=False,
        use_zero_inter_loss_for_conv=False,
    )
    model = GroundingDINO(cfg=cfg)
    tb = tokenize_captions(wp, ["cat.dog."], max_text_len=256,
                           max_categories=8, text_len_buckets=(256,))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    jp = jnp.zeros((1, 320, 480, 3), jnp.float32)
    jm = jnp.ones((1, 320, 480), bool)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jp, jm, text)
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), shapes["params"]
    )
    tree, _, _, unmatched = convert_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    assert unmatched == [], f"converter missed reference keys: {unmatched[:10]}"
    problems = merge_into(params, tree)
    assert problems == [], f"merge problems: {problems[:10]}"
    # non-vacuous: the state dict covers the overwhelming majority of our
    # full-size leaves (flax-only leaves like fixed embeddings aside)
    n_torch = len([k for k in ref.state_dict()])
    assert n_torch > 500, n_torch


@pytest.mark.slow  # VERDICT r3 item 7: in the slow tier (once per round);
# ZGDINO_FULL_ORACLE=1 still force-runs it in the default tier
@pytest.mark.skipif(
    not os.environ.get("ZGDINO_FULL_ORACLE", "1"),
    reason="disabled via ZGDINO_FULL_ORACLE=''",
)
def test_fullsize_vanilla_oracle(wp):
    """End-to-end parity at FULL model dimensions (Swin-T, 6+6 layers,
    d=256, BERT-base geometry, 900 queries, max_text_len=256) with random
    init at a small image — closes the tiny-scale-only caveat of the other
    oracles (exercises the 256-dim positional hardcodes, real head counts,
    top-900 selection, the full converter surface)."""
    from tests.oracle_stubs import get_fullsize_reference_model
    from ziragroundingdino_tpu.config import get_model_config

    ref = get_fullsize_reference_model(wp, max_text_len=256, seed=0)
    from groundingdino.util.misc import NestedTensor  # needs stubs installed

    pixels, mask = _image(0, h=320, w=480, valid_h=320, valid_w=480)
    caption = "cat.dog."
    with torch.no_grad():
        t_out = ref(
            NestedTensor(
                torch.from_numpy(pixels.transpose(2, 0, 1))[None],
                torch.from_numpy(~mask)[None],
            ),
            captions=[caption],
        )

    cfg = get_model_config(
        "groundingdino", compute_dtype="float32", use_cet=False,
        use_project_adapter=False, use_zero_inter_loss=False,
        use_zero_inter_loss_for_conv=False,
    )
    model = GroundingDINO(cfg=cfg)
    tb = tokenize_captions(wp, [caption], max_text_len=256,
                           max_categories=8, text_len_buckets=(256,))
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    jp, jm = jnp.asarray(pixels[None]), jnp.asarray(mask[None])
    params = _convert_into(model, ref, jp, jm, text)
    out = jax.jit(lambda p: model.apply(p, jp, jm, text, train=False))(
        {"params": params})

    jl = np.asarray(out["pred_logits"], np.float32)[0]
    jb = np.asarray(out["pred_boxes"], np.float32)[0]
    tl = t_out["pred_logits"].numpy()[0]
    tbx = t_out["pred_boxes"].numpy()[0]
    # At random init the top-900 query selection is DISCONTINUOUS: fp32
    # summation-order noise between torch CPU and XLA CPU reorders near-tied
    # proposal logits, permuting the decoder slots (BASELINE.md documents
    # this). The parity claim is therefore ORDER-INVARIANT: almost every
    # predicted box must have an exact counterpart, with matching token
    # logits at the matched slots.
    # Box matching alone is NON-INJECTIVE at random init: many anchors
    # produce near-coincident boxes, so nearest-box can pair a jax slot
    # with the wrong (equal-box, different-logits) torch slot. The order-
    # invariant claim is therefore: every jax (box, logits) pair must have
    # SOME torch slot matching in both box AND logits.
    from scipy.spatial import cKDTree

    # A handful of slots (~0.7% measured) are SELECTION-divergent — their
    # proposal was a near-tie that torch and XLA ranked differently, so no
    # torch slot carries their logits even when a random box coincides.
    # The claim is coverage: >=97% of slots must have a torch counterpart
    # matching in box AND logits (measured 99.3%, median logit gap 2.6e-3).
    valid = np.asarray(tb.text_token_mask)[0]
    cand = cKDTree(tbx).query_ball_point(jb, r=1e-3)
    n_full = sum(
        1 for i, cs in enumerate(cand)
        if cs and min(
            float(np.abs(jl[i][valid] - tl[c][valid]).max()) for c in cs
        ) < 5e-3
    )
    frac_exact = n_full / len(jb)
    assert frac_exact >= 0.97, (
        f"only {frac_exact:.3f} of slots have a box+logit counterpart")
