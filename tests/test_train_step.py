"""Train step: gradients flow to the side branches only, frozen base stays
put (the reference's before_train freeze semantics,
`groundingdino_dual_zero_rep_branch.py:722-737`), and the whole step runs
sharded over an 8-device data-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.common import tiny_config, tiny_image_batch, tiny_text_batch
from ziragroundingdino_tpu.config import OptimizerConfig, ScheduleConfig
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
)
from ziragroundingdino_tpu.train.optim import (
    ZIRA_TRAINABLE_PATTERNS,
    build_optimizer,
    trainable_mask,
)
from ziragroundingdino_tpu.train.step import TrainState, compute_losses, make_train_step

pytestmark = pytest.mark.oracle  # compile-heavy tier (VERDICT r3 item 9)


def make_batch(b=2):
    pixels, mask = tiny_image_batch(b=b)
    tb = tiny_text_batch(
        captions=tuple(["cat.dog.", "zebra.person.fish."] * ((b + 1) // 2))[:b]
    )
    rng = np.random.RandomState(7)
    n = 5
    boxes = (rng.uniform(0.3, 0.7, size=(b, n, 4)) * [1, 1, 0.2, 0.2]).astype(np.float32)
    labels = rng.randint(0, 2, size=(b, n)).astype(np.int32)
    valid = np.zeros((b, n), bool)
    valid[0, :3] = True
    valid[1, :1] = True
    return {
        "pixels": jnp.asarray(pixels),
        "mask": jnp.asarray(mask),
        "input_ids": jnp.asarray(tb.input_ids),
        "text_token_mask": jnp.asarray(tb.text_token_mask),
        "position_ids": jnp.asarray(tb.position_ids),
        "text_self_attention_masks": jnp.asarray(tb.text_self_attention_masks),
        "cate_to_token_mask": jnp.asarray(tb.cate_to_token_mask),
        "gt_labels": jnp.asarray(labels),
        "gt_boxes": jnp.asarray(boxes),
        "gt_valid": jnp.asarray(valid),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = GroundingDINO(cfg=cfg)
    batch = make_batch()
    # jitted init: one cacheable XLA program instead of thousands of eager
    # dispatches (the persistent compilation cache makes warm suite runs
    # skip it entirely — tests/conftest.py)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["pixels"], batch["mask"],
        {k: batch[k] for k in (
            "input_ids", "text_token_mask", "position_ids",
            "text_self_attention_masks")},
    )
    return cfg, model, params, batch


def test_losses_and_grads(setup):
    cfg, model, params, batch = setup
    total, losses = jax.jit(
        lambda p, b: compute_losses(model, p, b, train=True))(params, batch)
    assert np.isfinite(float(total))
    for k in ("loss_class", "loss_bbox", "loss_giou", "loss_class_enc",
              "loss_linear_adapter", "loss_conv_adapter"):
        assert k in losses, sorted(losses)
        assert np.isfinite(float(losses[k])), k

    grads = jax.jit(jax.grad(
        lambda p: compute_losses(model, p, batch, train=True)[0]))(params)
    gsq = jax.tree_util.tree_map(lambda g: float(jnp.sum(g * g)), grads)
    flat = jax.tree_util.tree_leaves_with_path(gsq)
    adapter_g = [v for p, v in flat if "adapter" in "/".join(str(x) for x in p)]
    assert sum(adapter_g) > 0.0, "side branches must receive gradient"
    assert all(np.isfinite(v) for _, v in flat)


def test_train_step_updates_only_adapters(setup):
    cfg, model, params, batch = setup
    mask = trainable_mask(params["params"], ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = build_optimizer(
        OptimizerConfig(lr=1e-2), ScheduleConfig(max_iter=10),
        params["params"], trainable=mask,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params["params"],
        opt_state=tx.init(params["params"]),
    )

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    step = make_train_step(Wrap, tx, donate=False)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["total_loss"]))

    def diff(a, b):
        return jax.tree_util.tree_map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)

    d = diff(state.params, s2.params)
    for path, v in jax.tree_util.tree_leaves_with_path(d):
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        if "adapter" in p:
            continue  # trainable; may move
        assert v == 0.0, f"frozen param moved: {p} by {v}"
    moved = [
        v for path, v in jax.tree_util.tree_leaves_with_path(d)
        if "adapter" in "/".join(str(getattr(x, "key", x)) for x in path)
    ]
    assert max(moved) > 0.0


def test_ema_update_and_eval_weights(setup):
    """EMA tracking (`util/ema.py:36-90`) + the --eval-ema selection: EMA
    leaves lag the raw update on trainable params and stay put on frozen."""
    cfg, model, params, batch = setup
    mask = trainable_mask(params["params"], ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = build_optimizer(
        OptimizerConfig(lr=1e-2), ScheduleConfig(max_iter=10),
        params["params"], trainable=mask,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params["params"],
        opt_state=tx.init(params["params"]), ema_params=params["params"],
    )

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    step = make_train_step(Wrap, tx, ema_decay=0.5, donate=False)
    s1, _ = step(state, batch, jax.random.PRNGKey(3))

    flat_old = dict(jax.tree_util.tree_leaves_with_path(params["params"]))
    flat_new = dict(jax.tree_util.tree_leaves_with_path(s1.params))
    flat_ema = dict(jax.tree_util.tree_leaves_with_path(s1.ema_params))
    checked_lag = 0
    for path, old in flat_old.items():
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        new, ema = flat_new[path], flat_ema[path]
        if "adapter" in p and float(jnp.max(jnp.abs(new - old))) > 1e-8:
            # ema = 0.5*old + 0.5*new exactly after one step
            np.testing.assert_allclose(
                np.asarray(ema), 0.5 * np.asarray(old) + 0.5 * np.asarray(new),
                rtol=1e-5, atol=1e-7)
            checked_lag += 1
        elif "adapter" not in p:
            np.testing.assert_array_equal(np.asarray(ema), np.asarray(old))
    assert checked_lag > 0


def test_clip_norm_ignores_frozen_grads():
    """The global-norm clip must see TRAINABLE leaves only (reference clips
    requires_grad params, `train_net.py:144-150`): a huge gradient on a
    frozen leaf must not shrink the trainable update."""
    params = {"base_w": jnp.ones((4,)), "adapter_w": jnp.ones((4,))}
    mask = trainable_mask(params, ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = build_optimizer(
        OptimizerConfig(lr=1e-2, grad_clip=0.1), ScheduleConfig(max_iter=10),
        params, trainable=mask,
    )
    opt = tx.init(params)
    g_small = {"base_w": jnp.zeros((4,)), "adapter_w": jnp.full((4,), 0.5)}
    g_huge = {"base_w": jnp.full((4,), 1e6), "adapter_w": jnp.full((4,), 0.5)}
    u1, _ = tx.update(g_small, opt, params)
    u2, _ = tx.update(g_huge, opt, params)
    np.testing.assert_allclose(
        np.asarray(u1["adapter_w"]), np.asarray(u2["adapter_w"]), rtol=1e-6)
    assert float(jnp.max(jnp.abs(u2["base_w"]))) == 0.0


def test_train_step_on_8dev_mesh(setup):
    """DP over the virtual 8-device CPU mesh (SURVEY §2.5): batch sharded on
    'data', params replicated; XLA inserts the gradient all-reduce."""
    cfg, model, params, batch = setup
    mesh = make_mesh(data=8, model=1)
    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), make_batch(b=2)
    )
    ps = param_sharding(params["params"], mesh)
    bs = batch_sharding(batch8, mesh)
    params_sh = jax.device_put(params["params"], ps)
    batch_sh = jax.device_put(batch8, bs)

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def loss(p, b):
        return compute_losses(Wrap, p, b, train=True)[0]

    total, grads = jax.jit(jax.value_and_grad(loss))(params_sh, batch_sh)
    assert np.isfinite(float(total))
    gn = float(jax.jit(lambda g: sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(g)))(grads))
    assert np.isfinite(gn) and gn > 0.0


def test_sharded_inference_8dev(setup):
    """DP inference over the 8-device mesh through the sharded wrapper."""
    from ziragroundingdino_tpu.eval.evaluator import make_inference_fn
    from ziragroundingdino_tpu.parallel.mesh import make_mesh
    from ziragroundingdino_tpu.parallel.sharded_eval import (
        make_sharded_inference_fn, pad_batch_to,
    )

    cfg, model, params, batch = setup
    mesh = make_mesh(data=8, model=1)
    inf = make_inference_fn(model, select_k=5)
    fn = make_sharded_inference_fn(inf, mesh, params)

    batch8 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 4, axis=0), batch
    )
    batch8["orig_sizes"] = np.tile([[64, 96]], (8, 1)).astype(np.int32)
    batch8["cate_to_token_mask"] = np.asarray(batch["cate_to_token_mask"])
    batch8["cate_to_token_mask"] = np.concatenate(
        [batch8["cate_to_token_mask"]] * 4, axis=0)
    dets = fn(batch8)
    assert dets["scores"].shape == (8, 5)
    assert np.isfinite(np.asarray(dets["boxes"])).all()

    short = jax.tree_util.tree_map(lambda x: np.asarray(x)[:3], batch8)
    padded = pad_batch_to(short, 8)
    assert padded["pixels"].shape[0] == 8


def test_trainable_mask_step_matches_unmasked(setup):
    """`make_train_step(trainable=...)` stops gradients into frozen leaves at
    trace time (XLA never emits their weight-grad matmuls); the resulting
    updates must be bit-identical to the optimizer-side-only masking."""
    cfg, model, params, batch = setup
    mask = trainable_mask(params["params"], ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = build_optimizer(
        OptimizerConfig(lr=1e-2, grad_clip=0.1), ScheduleConfig(max_iter=10),
        params["params"], trainable=mask,
    )

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def run(trainable):
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params["params"],
            opt_state=tx.init(params["params"]),
        )
        step = make_train_step(Wrap, tx, donate=False, trainable=trainable)
        s1, m = step(state, batch, jax.random.PRNGKey(3))
        return s1.params, float(m["total_loss"]), float(m["grad_norm"])

    p_masked, loss_m, gn_m = run(mask)
    p_plain, loss_p, gn_p = run(None)
    assert loss_m == pytest.approx(loss_p, rel=1e-6)
    # grad_norm: plain computes over ALL leaves BEFORE the optimizer zeroes
    # frozen ones... both paths clip inside tx identically, so params match
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_masked, p_plain
    )
    worst = max(jax.tree_util.tree_leaves(diffs))
    # not bit-identical: removing the frozen-leaf backward ops changes fp32
    # summation order in the surviving grads; must agree to fp32 noise
    assert worst < 1e-4, f"masked vs unmasked updates diverge: {worst}"


def test_trainable_patterns_for_cfg():
    """PET-baseline unfreeze matrix (`groundingdino_dt.py:775-783`)."""
    from ziragroundingdino_tpu.config import MODEL_PRESETS
    from ziragroundingdino_tpu.train.optim import trainable_patterns_for_cfg

    assert trainable_patterns_for_cfg(MODEL_PRESETS["dualzerorepbranchgroundingdino"]) == ("adapter",)
    assert set(trainable_patterns_for_cfg(MODEL_PRESETS["berttune"])) >= {"adapter", "bert", "feat_map"}
    assert set(trainable_patterns_for_cfg(MODEL_PRESETS["linearprobe"])) >= {"class_embed", "bbox_embed"}
    pt = MODEL_PRESETS["projecttune"]
    # project TUNING trains the raw input projections — no ZeroConv branches
    assert pt.use_project_tuning and not pt.use_project_adapter
    assert "input_proj" in trainable_patterns_for_cfg(pt)
