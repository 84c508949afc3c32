"""Tensor-parallel + data-parallel EQUALITY vs single device (VERDICT r2
item 4 / weak #8).

The reference's bar is DDP-equivalence (`train_net.py:246` wraps the model
in DDP and the trajectory must match 1-GPU training); our mesh adds a
`model` axis (TP rules in parallel/mesh.py). "Loss is finite" is not a
correctness statement — these tests assert the sharded forward and a full
train step (forward, matcher, criterion, backward, optimizer update) are
numerically EQUAL to the unsharded single-device computation on the tiny
config over an 8-virtual-CPU-device mesh (data=4, model=2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.common import tiny_config
from tests.test_train_step import make_batch
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
)
from ziragroundingdino_tpu.train.optim import (
    ZIRA_TRAINABLE_PATTERNS,
    trainable_mask,
)
from ziragroundingdino_tpu.train.step import compute_losses

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_config(modelname="dualzerorepbranchgroundingdino", cet_middle_dim=16)
    model = GroundingDINO(cfg=cfg)
    batch = make_batch(b=8)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["pixels"], batch["mask"],
        {k: batch[k] for k in (
            "input_ids", "text_token_mask", "position_ids",
            "text_self_attention_masks")},
    )
    return cfg, model, variables["params"], batch


def _text(batch):
    return {k: batch[k] for k in (
        "input_ids", "text_token_mask", "position_ids",
        "text_self_attention_masks")}


def test_tp_forward_equality(setup):
    """mesh(data=4, model=2) eval forward == single-device forward."""
    _, model, params, batch = setup
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])

    fwd = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["pixels"], b["mask"], _text(b),
        train=False, deterministic=True))

    ref = fwd(params, batch)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    # sanity: TP rules actually shard something on the model axis
    shardings = jax.tree_util.tree_leaves(param_sharding(params, mesh))
    assert any("model" in str(s.spec) for s in shardings), \
        "no parameter was tensor-sharded; TP path is vacuous"
    out = fwd(p_sh, b_sh)

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"], np.float32),
        np.asarray(ref["pred_boxes"], np.float32), atol=2e-5,
    )
    l_sh = np.asarray(out["pred_logits"], np.float32)
    l_ref = np.asarray(ref["pred_logits"], np.float32)
    assert np.max(np.abs(l_sh - l_ref)) < 1e-3, np.max(np.abs(l_sh - l_ref))


def test_tp_train_step_equality(setup):
    """One full train step on mesh(data=4, model=2) == single device: same
    loss, same updated trainable params (tolerance: fp32 reduction-order
    noise only)."""
    _, model, params, batch = setup
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])

    tmask = trainable_mask(params, ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(1e-3))

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            p = jax.tree_util.tree_map(
                lambda x, t: x if t else jax.lax.stop_gradient(x), p, tmask
            )
            return compute_losses(Wrap, p, batch, train=True)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), total

    step = jax.jit(train_step)

    opt0 = jax.jit(tx.init)(params)
    p_ref, loss_ref = step(params, opt0, batch)

    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = jax.device_put(batch, batch_sharding(batch, mesh))
    opt_sh = jax.jit(tx.init)(p_sh)
    p_new, loss_sh = step(p_sh, opt_sh, b_sh)

    assert abs(float(loss_sh) - float(loss_ref)) / max(abs(float(loss_ref)), 1e-6) < 1e-4, (
        float(loss_sh), float(loss_ref))

    flat_ref = dict(jax.tree_util.tree_leaves_with_path(p_ref))
    flat_msk = dict(jax.tree_util.tree_leaves_with_path(tmask))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_new):
        a = np.asarray(leaf, np.float32)
        b = np.asarray(flat_ref[path], np.float32)
        tol = 1e-5 if flat_msk[path] else 0.0
        d = np.max(np.abs(a - b)) if a.size else 0.0
        name = "/".join(str(p) for p in path)
        assert d <= tol + 1e-12, f"{name}: sharded vs single diverges by {d}"
