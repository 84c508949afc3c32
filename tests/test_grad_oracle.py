"""FULL-MODEL GRADIENT parity against the PyTorch reference (VERDICT r2 #1a).

The forward oracles (tests/test_full_model_oracle.py) run under
`torch.no_grad`; this file closes the training-correctness hole: it runs the
reference's actual training path — `GroundingDINO.forward(batched_inputs)`
in train mode returning the weighted loss_dict, `losses.backward()` exactly
as `train_net.py:181-198` / SimpleTrainer sums it — and compares torch
autograd's gradient on EVERY trainable leaf (side branches, scalings, cet
adapter; the `before_train` "adapter" selection at
`groundingdino_dual_zero_rep_branch.py:722-737`) against `jax.grad` through
our model + criterion, leaf for leaf via the same key-mapping converter the
checkpoint path uses.

A silent sign error in a loss weight, a stop-gradient misplacement, or a
detached-box-refinement mistake (`transformer_for_adapter.py:700-806`) fails
this test; no forward oracle can catch it.

Matcher pinning: at random init the Hungarian cost matrices have near-ties
(train-mode forward parity is ~1e-5, but a 1e-5 logit difference can flip
an assignment between two equal-cost optima, which redistributes loss mass
between heads — observed: last-layer and enc assignments flipped while aux0
agreed exactly). Matching is non-differentiable by construction
(`matcher/matcher.py:81` @torch.no_grad), and OUR matcher has its own torch
oracle + scipy cross-check (tests/test_matcher_criterion.py), so this test
pins the reference's matcher to OUR computed assignments — both criteria
then differentiate through identical matched pairs and the comparison is
exact, not tie-dependent.
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
from tests.test_full_model_oracle import _our_text, wp  # noqa: F401 (fixture)
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.train.matcher import match_batch
from ziragroundingdino_tpu.train.optim import trainable_mask
from ziragroundingdino_tpu.train.step import class_logits_from_tokens, compute_losses
from ziragroundingdino_tpu.utils.torch_convert import convert_state_dict, merge_into

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier


def _randomize_zira_branches(ref, seed=7, std=0.05):
    """Make every ZiRa branch/freeze/scaling leaf non-degenerate so the
    gradient exercises the full chain (zero-init branches would zero out
    several product terms in the VJP)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "adapter" in name:
                if name.endswith("scaling"):
                    p.fill_(0.3)
                else:
                    p.normal_(0, std, generator=g)


def _torch_train_loss_and_grads(ref, raw_chw, caption, boxes_xyxy, labels):
    """Run the reference's train-mode forward + backward; returns
    (total_loss, loss_dict floats, {param_name: grad ndarray})."""
    from detectron2.structures import Boxes, Instances

    ref.train()
    ref.before_train()  # freeze all, unfreeze "adapter" (`:722-737`)
    ref.zero_grad(set_to_none=True)

    h, w = raw_chw.shape[-2:]
    inst = Instances((h, w))
    inst.gt_classes = torch.as_tensor(labels, dtype=torch.long)
    inst.gt_boxes = Boxes(torch.as_tensor(boxes_xyxy, dtype=torch.float32))
    inst.to = lambda device: inst  # stub Instances has no .to

    loss_dict = ref([
        {"image": torch.from_numpy(raw_chw), "captions": caption,
         "instances": inst, "height": h, "width": w}
    ])
    # SimpleTrainer: losses = sum(loss_dict.values()) (weights already
    # applied inside forward, `groundingdino_dual_zero_rep_branch.py:579-587`)
    total = sum(loss_dict.values())
    total.backward()
    grads = {
        n: p.grad.detach().numpy().copy()
        for n, p in ref.named_parameters()
        if p.grad is not None
    }
    return float(total.detach()), {k: float(v.detach()) for k, v in loss_dict.items()}, grads


def test_zira_full_model_grad_oracle(wp):  # noqa: F811
    """ZiRa tiny model, one batch: every trainable leaf's gradient matches
    torch autograd through the reference model + TwoStageCriterion at
    <=1e-2 relative (VERDICT r2 next-round item 1a)."""
    ref = get_tiny_reference_model(wp, max_text_len=32, seed=0, kind="zira")
    _randomize_zira_branches(ref)

    rng = np.random.RandomState(3)
    h, w = 64, 96
    raw = rng.randint(0, 255, size=(3, h, w)).astype(np.float32)
    caption = "cat.dog."
    # two cats, one dog; xyxy absolute pixels
    boxes_xyxy = np.array(
        [[10.0, 8.0, 40.0, 30.0], [50.0, 20.0, 90.0, 60.0], [5.0, 35.0, 30.0, 62.0]],
        np.float32,
    )
    labels = np.array([0, 0, 1], np.int64)
    n_gt = len(labels)

    # ---- our side: identical weights via the checkpoint converter ----
    cfg = tiny_config(modelname="dualzerorepbranchgroundingdino", cet_middle_dim=16)
    model = GroundingDINO(cfg=cfg)
    tb, text = _our_text(wp, caption)

    pm = np.array(ref.pixel_mean, np.float32)
    ps = np.array(ref.pixel_std, np.float32)
    jp = jnp.asarray(((raw.transpose(1, 2, 0) - pm) / ps)[None])
    jm = jnp.ones((1, h, w), bool)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jp, jm, text)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tree, _, _, unmatched = convert_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    assert unmatched == []
    assert merge_into(params, tree) == []

    # the reference's prepare_targets: xyxy/size -> normalized cxcywh (`:614-627`)
    scale = np.array([w, h, w, h], np.float32)
    bn = boxes_xyxy / scale
    cxcywh = np.stack(
        [(bn[:, 0] + bn[:, 2]) / 2, (bn[:, 1] + bn[:, 3]) / 2,
         bn[:, 2] - bn[:, 0], bn[:, 3] - bn[:, 1]], axis=-1,
    )
    n_pad = 5
    gt_boxes = np.zeros((1, n_pad, 4), np.float32)
    gt_labels = np.zeros((1, n_pad), np.int32)
    gt_valid = np.zeros((1, n_pad), bool)
    gt_boxes[0, :n_gt] = cxcywh
    gt_labels[0, :n_gt] = labels
    gt_valid[0, :n_gt] = True

    batch = {
        "pixels": jp, "mask": jm,
        "input_ids": jnp.asarray(tb.input_ids),
        "text_token_mask": jnp.asarray(tb.text_token_mask),
        "position_ids": jnp.asarray(tb.position_ids),
        "text_self_attention_masks": jnp.asarray(tb.text_self_attention_masks),
        "cate_to_token_mask": jnp.asarray(tb.cate_to_token_mask),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
    }

    mask = trainable_mask(params, ("adapter",), freeze_all=True)

    def loss_fn(p):
        p = jax.tree_util.tree_map(
            lambda x, t: x if t else jax.lax.stop_gradient(x), p, mask
        )
        total, losses = compute_losses(model, {"params": p}, batch, train=True)
        return total, losses

    (j_total, j_losses), j_grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(
        jax.tree_util.tree_map(jnp.asarray, params)
    )

    # ---- our per-head assignments, in the reference criterion's matcher
    # call order (last, aux_0..aux_{n-2}, enc; two_stage_criterion.py:54-95)
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                      jp, jm, {k: batch[k] for k in (
                          "input_ids", "text_token_mask", "position_ids",
                          "text_self_attention_masks")},
                      train=True, deterministic=True)
    c2t = batch["cate_to_token_mask"]

    def assign(tl, tbx):
        cls = class_logits_from_tokens(tl, c2t)
        a = match_batch(cls, tbx, batch["gt_labels"], batch["gt_boxes"],
                        batch["gt_valid"], impl="jax")
        return np.asarray(a)[0, :n_gt]

    order = [assign(out["pred_logits"], out["pred_boxes"])]
    order += [assign(a["pred_logits"], a["pred_boxes"]) for a in out["aux_outputs"]]
    order += [assign(out["interm_outputs"]["pred_logits"],
                     out["interm_outputs"]["pred_boxes"])]

    # ---- torch side with the matcher PINNED to our assignments ----
    seq = iter(order)
    calls = []

    def pinned_matcher(outputs, targets, **k):
        a = next(seq)
        calls.append(a)
        return [(torch.as_tensor(a, dtype=torch.long),
                 torch.arange(n_gt, dtype=torch.long))]

    ref.criterion.matcher.forward = pinned_matcher
    t_total, t_losses, t_grads = _torch_train_loss_and_grads(
        ref, raw, caption, boxes_xyxy, labels
    )
    assert len(calls) == len(order), (len(calls), len(order))
    assert np.isfinite(t_total)
    # sanity: the trainable surface is exactly the adapter leaves
    assert t_grads and all("adapter" in n for n in t_grads), sorted(t_grads)[:5]

    # total loss parity first — if this diverges the grads are meaningless
    assert abs(float(j_total) - t_total) / max(abs(t_total), 1e-6) < 2e-3, (
        float(j_total), t_total, {k: (float(j_losses.get(k, np.nan)), v)
                                  for k, v in t_losses.items()},
    )

    # map torch grads through the SAME converter the checkpoint path uses
    g_tree, _, _, g_unmatched = convert_state_dict(t_grads)
    assert g_unmatched == []
    t_grad_tree = jax.tree_util.tree_map(np.zeros_like, params)
    assert merge_into(t_grad_tree, g_tree) == []

    flat_j = jax.tree_util.tree_leaves_with_path(j_grads)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(t_grad_tree))
    flat_m = dict(jax.tree_util.tree_leaves_with_path(mask))

    checked = nonzero = 0
    for path, jg in flat_j:
        if not flat_m[path]:
            continue
        tg = flat_t[path]
        jg = np.asarray(jg, np.float32)
        denom = max(np.max(np.abs(tg)), 1e-6)
        rel = np.max(np.abs(jg - tg)) / denom
        name = "/".join(str(p) for p in path)
        assert rel < 1e-2, (
            f"gradient diverges at {name}: rel={rel:.3e} "
            f"|torch|={np.max(np.abs(tg)):.3e} |jax|={np.max(np.abs(jg)):.3e}"
        )
        checked += 1
        if np.max(np.abs(tg)) > 1e-8:
            nonzero += 1
    # every trainable leaf was compared, and the comparison is non-vacuous
    assert checked == sum(bool(v) for v in flat_m.values())
    assert checked == len(t_grads), (checked, len(t_grads))
    assert nonzero >= checked - 2, f"too many zero grads: {nonzero}/{checked}"
