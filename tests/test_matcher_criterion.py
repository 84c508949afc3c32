"""Matcher optimality + criterion parity vs a torch oracle implementing the
reference math (`matcher/matcher.py:106-147`, `criterion/criterion.py:107-193`,
`two_stage_criterion.py:61-100`)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ziragroundingdino_tpu.train.matcher import (
    hungarian_scipy,
    lsap_jax,
    match_batch,
    pairwise_cost_matrix,
)
from ziragroundingdino_tpu.train.criterion import set_criterion, weighted_total


def torch_giou(a, b):  # pairwise [N, M]
    area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None] - inter
    iou = inter / union
    lt2 = torch.min(a[:, None, :2], b[None, :, :2])
    rb2 = torch.max(a[:, None, 2:], b[None, :, 2:])
    wh2 = (rb2 - lt2).clamp(min=0)
    hull = wh2[..., 0] * wh2[..., 1]
    return iou - (hull - union) / hull


def cxcywh_to_xyxy_t(b):
    cx, cy, w, h = b.unbind(-1)
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def torch_cost_matrix(logits, boxes, tgt_ids, tgt_boxes, alpha=0.25, gamma=2.0):
    prob = logits.sigmoid()
    neg = (1 - alpha) * prob**gamma * (-(1 - prob + 1e-8).log())
    pos = alpha * (1 - prob) ** gamma * (-(prob + 1e-8).log())
    cost_class = pos[:, tgt_ids] - neg[:, tgt_ids]
    cost_bbox = torch.cdist(boxes, tgt_boxes, p=1)
    cost_giou = -torch_giou(cxcywh_to_xyxy_t(boxes), cxcywh_to_xyxy_t(tgt_boxes))
    return 5.0 * cost_bbox + 2.0 * cost_class + 2.0 * cost_giou


def random_problem(rng, b=2, q=24, n_max=7, c=9):
    logits = rng.randn(b, q, c).astype(np.float32)
    boxes = (rng.uniform(0.2, 0.8, size=(b, q, 4)) * [1, 1, 0.3, 0.3]).astype(np.float32)
    n_valid = rng.randint(1, n_max + 1, size=b)
    tl = rng.randint(0, c, size=(b, n_max)).astype(np.int32)
    tb = (rng.uniform(0.2, 0.8, size=(b, n_max, 4)) * [1, 1, 0.3, 0.3]).astype(np.float32)
    valid = np.arange(n_max)[None, :] < n_valid[:, None]
    return logits, boxes, tl, tb, valid


def test_cost_matrix_parity():
    rng = np.random.RandomState(0)
    logits, boxes, tl, tb, valid = random_problem(rng)
    for i in range(logits.shape[0]):
        n = valid[i].sum()
        ours = np.asarray(
            pairwise_cost_matrix(
                jnp.asarray(logits[i]), jnp.asarray(boxes[i]),
                jnp.asarray(tl[i]), jnp.asarray(tb[i]), jnp.asarray(valid[i]),
            )
        )[:, :n]
        ref = torch_cost_matrix(
            torch.from_numpy(logits[i]), torch.from_numpy(boxes[i]),
            torch.from_numpy(tl[i, :n]).long(), torch.from_numpy(tb[i, :n]),
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_lsap_jax_matches_scipy_optimum():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(1)
    for trial in range(10):
        q, n = 30, rng.randint(1, 12)
        cost = rng.randn(q, n).astype(np.float32) * 3.0
        tq = np.asarray(lsap_jax(jnp.asarray(cost)))
        assert len(set(tq.tolist())) == n, "assignment must be injective"
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        got = cost[tq, np.arange(n)].sum()
        np.testing.assert_allclose(got, opt, atol=1e-4)


def test_criterion_parity_with_torch_oracle():
    """Our padded-criterion (scipy matching) == reference math on ragged
    targets, including aux and enc branches."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(2)
    logits, boxes, tl, tb, valid = random_problem(rng)
    aux_logits, aux_boxes, *_ = random_problem(np.random.RandomState(3))
    enc_logits, enc_boxes, *_ = random_problem(np.random.RandomState(4))

    outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "aux_outputs": [
            {"pred_logits": jnp.asarray(aux_logits), "pred_boxes": jnp.asarray(aux_boxes)}
        ],
        "interm_outputs": {
            "pred_logits": jnp.asarray(enc_logits), "pred_boxes": jnp.asarray(enc_boxes)
        },
    }
    ours = set_criterion(
        outputs, jnp.asarray(tl), jnp.asarray(tb), jnp.asarray(valid),
        matcher_impl="scipy",
    )

    # ---- torch oracle
    def torch_losses(lg, bx):
        lg = torch.from_numpy(lg)
        bx = torch.from_numpy(bx)
        num_boxes = max(valid.sum(), 1)
        b, q, c = lg.shape
        onehot = torch.zeros(b, q, c)
        l1 = 0.0
        giou_loss = 0.0
        for i in range(b):
            n = valid[i].sum()
            cost = torch_cost_matrix(
                lg[i], bx[i], torch.from_numpy(tl[i, :n]).long(),
                torch.from_numpy(tb[i, :n]),
            )
            rows, cols = linear_sum_assignment(cost.numpy())
            src = torch.as_tensor(rows)
            tgt = torch.as_tensor(cols)
            onehot[i, src, torch.from_numpy(tl[i, :n]).long()[tgt]] = 1.0
            sb = bx[i][src]
            gb = torch.from_numpy(tb[i, :n])[tgt]
            l1 = l1 + F.l1_loss(sb, gb, reduction="none").sum()
            giou_loss = giou_loss + (
                1 - torch.diag(torch_giou(cxcywh_to_xyxy_t(sb), cxcywh_to_xyxy_t(gb)))
            ).sum()
        prob = lg.sigmoid()
        ce = F.binary_cross_entropy_with_logits(lg, onehot, reduction="none")
        p_t = prob * onehot + (1 - prob) * (1 - onehot)
        focal = ce * (1 - p_t) ** 2
        focal = (0.25 * onehot + 0.75 * (1 - onehot)) * focal
        return {
            "loss_class": (focal.sum() / num_boxes).item(),
            "loss_bbox": (l1 / num_boxes).item(),
            "loss_giou": (giou_loss / num_boxes).item(),
        }

    ref = torch_losses(logits, boxes)
    for k, v in ref.items():
        np.testing.assert_allclose(float(ours[k]), v, rtol=2e-4, atol=2e-4)
    ref_aux = torch_losses(aux_logits, aux_boxes)
    for k, v in ref_aux.items():
        np.testing.assert_allclose(float(ours[k + "_0"]), v, rtol=2e-4, atol=2e-4)
    ref_enc = torch_losses(enc_logits, enc_boxes)
    for k, v in ref_enc.items():
        np.testing.assert_allclose(float(ours[k + "_enc"]), v, rtol=2e-4, atol=2e-4)

    total = weighted_total(ours)
    expect = sum(
        w * r[k]
        for r in (ref, ref_aux, ref_enc)
        for k, w in (("loss_class", 1.0), ("loss_bbox", 5.0), ("loss_giou", 2.0))
    )
    np.testing.assert_allclose(float(total), expect, rtol=3e-4)


def test_match_batch_jax_equals_scipy():
    rng = np.random.RandomState(5)
    logits, boxes, tl, tb, valid = random_problem(rng, b=3, q=40, n_max=9)
    a = np.asarray(
        match_batch(jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tl),
                    jnp.asarray(tb), jnp.asarray(valid), impl="jax")
    )
    s = np.asarray(
        match_batch(jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tl),
                    jnp.asarray(tb), jnp.asarray(valid), impl="scipy")
    )
    # same total cost (assignments may differ on ties)
    for i in range(logits.shape[0]):
        cost = np.asarray(
            pairwise_cost_matrix(
                jnp.asarray(logits[i]), jnp.asarray(boxes[i]), jnp.asarray(tl[i]),
                jnp.asarray(tb[i]), jnp.asarray(valid[i]),
            )
        )
        n = valid[i].sum()
        ca = cost[a[i, :n], np.arange(n)].sum()
        cs = cost[s[i, :n], np.arange(n)].sum()
        assert abs(ca - cs) <= 1e-3
