"""Hungarian matching, jit-native.

Capability parity with `matcher/matcher.py:37-151` (HungarianMatcher:
focal class cost + L1 + GIoU, weights cost_class=2, cost_bbox=5, cost_giou=2
from `matcher/__init__.py:20-21`).

TPU-first design: the reference syncs the cost matrix to CPU every step and
runs scipy `linear_sum_assignment` (`matcher.py:143-147`) — a device-host
round trip in the hot loop. Here:
  * targets are PADDED arrays ([B, N, ...] + validity mask) — static shapes;
  * `jax` (default): an exact Jonker-Volgenant/shortest-augmenting-path LSAP
    solver (the same algorithm scipy uses) written with lax loops — runs
    on-device inside jit, vmappable over the batch. Invalid target columns
    carry a large constant cost, so they soak up leftover queries without
    disturbing the optimum of the valid sub-problem;
  * `scipy`: `jax.pure_callback` into scipy for an independent cross-check
    (serializes like the reference).

Output convention: `assignment[b, n] = query index matched to target n`
(mask invalid entries with `target_valid` downstream).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.ops.box_ops import (
    box_cxcywh_to_xyxy,
    generalized_box_iou_matrix,
)

BIG = 1.0e7
INF = jnp.float32(jnp.inf)


def focal_class_cost(
    pred_logits: jnp.ndarray,  # [Q, C]
    tgt_labels: jnp.ndarray,  # [N] int32 (invalid entries may be 0)
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """[Q, N] focal cost (`matcher.py:125-131`)."""
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    # the reference's exact formulation: -log(1 - p + 1e-8) (`matcher.py:128`)
    neg = (1.0 - alpha) * (prob**gamma) * (-jnp.log(1.0 - prob + 1e-8))
    pos = alpha * ((1.0 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    cost = pos - neg  # [Q, C]
    return cost[:, tgt_labels]  # [Q, N]


def pairwise_cost_matrix(
    pred_logits: jnp.ndarray,  # [Q, C]
    pred_boxes: jnp.ndarray,  # [Q, 4] cxcywh
    tgt_labels: jnp.ndarray,  # [N]
    tgt_boxes: jnp.ndarray,  # [N, 4] cxcywh
    tgt_valid: jnp.ndarray,  # [N] bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """[Q, N] combined cost; invalid target columns get +BIG so they are
    matched last and can be masked out downstream."""
    c_class = focal_class_cost(pred_logits, tgt_labels, alpha, gamma)
    pb = pred_boxes.astype(jnp.float32)
    tb = tgt_boxes.astype(jnp.float32)
    c_bbox = jnp.sum(jnp.abs(pb[:, None] - tb[None, :]), axis=-1)  # cdist p=1
    c_giou = -generalized_box_iou_matrix(box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(tb))
    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
    return jnp.where(tgt_valid[None, :], cost, BIG)


# ---------------------------------------------------------------------------
# Exact LSAP via shortest augmenting paths (lax-native)
# ---------------------------------------------------------------------------


def lsap_jax(cost_qn: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular linear sum assignment. cost_qn: [Q, N] with N <= Q;
    every target (column) gets a distinct query (row); total cost minimal.
    Returns `tq[n] = q`.

    Jonker-Volgenant successive shortest augmenting paths with dual
    potentials — the algorithm behind `scipy.optimize.linear_sum_assignment`
    — expressed as lax loops (one augmentation per target; Dijkstra scan
    vectorized over queries)."""
    cost = cost_qn.astype(jnp.float32).T  # [N, Q]: rows = targets
    n, q = cost.shape

    def augment_row(cur_row, state):
        u, v, col4row, row4col = state

        # -------- Dijkstra from cur_row over columns (queries)
        def dij_cond(s):
            _, _, _, _, sink, _, _ = s
            return sink < 0

        def dij_body(s):
            shortest, pred, scanned, i, sink, min_val, _ = s
            r = min_val + cost[i] - u[i] - v  # [Q]
            upd = (~scanned) & (r < shortest)
            pred = jnp.where(upd, i, pred)
            shortest = jnp.where(upd, r, shortest)
            masked = jnp.where(scanned, INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            scanned = scanned.at[j].set(True)
            is_sink = row4col[j] < 0
            sink = jnp.where(is_sink, j, -1)
            i = jnp.where(is_sink, i, row4col[j])
            return shortest, pred, scanned, i, sink, min_val, j

        shortest0 = jnp.full((q,), INF, jnp.float32)
        pred0 = jnp.full((q,), cur_row, jnp.int32)
        scanned0 = jnp.zeros((q,), bool)
        shortest, pred, scanned, _, sink, min_val, _ = jax.lax.while_loop(
            dij_cond, dij_body,
            (shortest0, pred0, scanned0, cur_row, jnp.int32(-1),
             jnp.float32(0.0), jnp.int32(0)),
        )

        # -------- dual updates (scipy _lsap semantics)
        u = u.at[cur_row].add(min_val)
        # rows entered via their assigned scanned column
        col_of_row = jnp.where(col4row >= 0, col4row, 0)
        row_scanned = (col4row >= 0) & scanned[col_of_row]
        row_ids = jnp.arange(n)
        u = jnp.where(
            row_scanned & (row_ids != cur_row),
            u + min_val - shortest[col_of_row],
            u,
        )
        v = jnp.where(scanned, v + shortest - min_val, v)

        # -------- augment along pred chain from sink
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            col4row, row4col, j, _ = s
            i = pred[j]
            row4col = row4col.at[j].set(i)
            prev = col4row[i]
            col4row = col4row.at[i].set(j)
            return col4row, row4col, jnp.where(prev >= 0, prev, 0), i == cur_row

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, jnp.bool_(False))
        )
        return u, v, col4row, row4col

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((q,), jnp.float32)
    col4row0 = jnp.full((n,), -1, jnp.int32)
    row4col0 = jnp.full((q,), -1, jnp.int32)
    _, _, col4row, _ = jax.lax.fori_loop(
        0, n, augment_row, (u0, v0, col4row0, row4col0)
    )
    return col4row  # tq[n] = q


def _scipy_assignment_host(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    b, q, n = cost.shape
    out = np.zeros((b, n), np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_scipy(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact assignment via host callback ([B, Q, N] -> [B, N]); the
    reference's execution model (`matcher.py:143-147`), same host sync."""
    b, q, n = cost.shape
    return jax.pure_callback(
        _scipy_assignment_host,
        jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost,
        vmap_method="sequential",
    )


@functools.partial(jax.jit, static_argnames=("impl",))
def match_batch(
    pred_logits: jnp.ndarray,  # [B, Q, C]
    pred_boxes: jnp.ndarray,  # [B, Q, 4]
    tgt_labels: jnp.ndarray,  # [B, N]
    tgt_boxes: jnp.ndarray,  # [B, N, 4]
    tgt_valid: jnp.ndarray,  # [B, N]
    impl: str = "jax",
) -> jnp.ndarray:
    """Returns assignment [B, N]: query index per target. Matching is
    non-differentiable by construction (`matcher.py:81` @torch.no_grad)."""
    cost = jax.vmap(pairwise_cost_matrix)(
        jax.lax.stop_gradient(pred_logits), jax.lax.stop_gradient(pred_boxes),
        tgt_labels, tgt_boxes, tgt_valid,
    )
    return match_cost(jax.lax.stop_gradient(cost), impl=impl)


def match_cost(cost: jnp.ndarray, impl: str = "jax") -> jnp.ndarray:
    if impl == "scipy":
        return hungarian_scipy(cost)
    if impl == "jax":
        return jax.vmap(lsap_jax)(cost)
    raise ValueError(impl)
