"""ZiRa incremental lifecycle: prompt memory, replay distillation, task loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.common import tiny_config, tiny_image_batch, tiny_text_batch, tiny_tokenizer
from tests.test_train_step import make_batch
from ziragroundingdino_tpu.config import OptimizerConfig, ScheduleConfig, TrainConfig
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO, TextEncoderOnly
from ziragroundingdino_tpu.models.zira import rep_merge

pytestmark = pytest.mark.oracle  # compile-heavy tier (VERDICT r3 item 9)
from ziragroundingdino_tpu.train.incremental import (
    IncrementalState,
    TaskSpec,
    add_cls_prompt,
    augment_caption_with_learned_names,
    encode_class_tokens,
    replay_memory_loss,
    run_task,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(max_text_len=32)
    model = GroundingDINO(cfg=cfg)
    batch = make_batch()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["pixels"], batch["mask"],
        {k: batch[k] for k in (
            "input_ids", "text_token_mask", "position_ids",
            "text_self_attention_masks")},
    )["params"]
    return cfg, model, params, batch


def test_text_encoder_param_reuse(setup):
    cfg, model, params, batch = setup
    tok = tiny_tokenizer()
    encoded, c2t, tb = encode_class_tokens(cfg, params, tok, ["cat", "dog"], 32)
    assert encoded.shape[-1] == cfg.hidden_dim
    assert c2t.shape[0] == 2 and c2t[0].sum() > 0
    assert np.isfinite(encoded).all()


def test_prompt_memory_and_replay(setup):
    cfg, model, params, batch = setup
    tok = tiny_tokenizer()
    pm = add_cls_prompt({}, cfg, params, tok, ["cat", "dog"], 32)
    assert set(pm) == {"-cat-", "-dog-"}
    assert all(v.ndim == 2 and v.shape[1] == cfg.hidden_dim for v in pm.values())

    # captured from these params in eval mode; replay in train mode adds the
    # (tiny, 1e-8-init) branch -> loss near zero but nonzero-grad path exists
    losses = replay_memory_loss(cfg, params, tok, ["cat", "dog"], pm, 32)
    assert float(losses["loss_prompt_memory"]) < 1e-4

    def loss_fn(p):
        return replay_memory_loss(cfg, p, tok, ["cat", "dog"], pm, 32)[
            "loss_prompt_memory"
        ]

    g = jax.jit(jax.grad(loss_fn))(params)
    gn = sum(float(jnp.sum(x * x)) for x in jax.tree_util.tree_leaves(
        {k: v for k, v in g.items() if "rep_linear_adapter" in k}))
    assert np.isfinite(gn)

    # perturb the language side branch -> replay loss grows
    params2 = dict(params)
    rla = dict(params2["rep_linear_adapter"])
    rla["branch_kernel"] = rla["branch_kernel"] + 0.5
    params2["rep_linear_adapter"] = rla
    losses2 = replay_memory_loss(cfg, params2, tok, ["cat", "dog"], pm, 32)
    assert float(losses2["loss_prompt_memory"]) > float(losses["loss_prompt_memory"])


def test_caption_augmentation():
    out = augment_caption_with_learned_names(
        ["cat"], ["cat", "dog", "fish"], num_select=1,
        rng=np.random.RandomState(0),
    )
    assert out[0] == "cat" and len(out) == 2 and out[1] in ("dog", "fish")


def test_run_task_lifecycle(setup):
    """Two-task loop: trains side branches, merges, accumulates classes,
    and keeps the merged model's eval == post-train train-mode model."""
    cfg, model, params, batch = setup
    tok = tiny_tokenizer()

    from ziragroundingdino_tpu.train.optim import (
        ZIRA_TRAINABLE_PATTERNS, build_optimizer, trainable_mask,
    )
    from ziragroundingdino_tpu.train.step import TrainState, make_train_step
    from ziragroundingdino_tpu.train.trainer import Trainer

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def loader():
        while True:
            yield batch

    def make_trainer(task_params, task, tmpdir=[0]):
        mask = trainable_mask(task_params, ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
        tx = build_optimizer(
            OptimizerConfig(lr=1e-3, lr_factors=(("freeze", 0.2),)),
            ScheduleConfig(max_iter=task.max_iter), task_params, trainable=mask,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=task_params,
            opt_state=tx.init(task_params),
        )
        step = make_train_step(Wrap, tx, donate=False)
        tcfg = TrainConfig(
            output_dir=f"/tmp/zira_inc_test_{id(task)}", max_iter=task.max_iter,
            log_period=10, checkpoint_period=10**9,
        )
        tr = Trainer(step, state, loader(), tcfg)
        return tr, lambda s: jax.device_get(s.params)

    tasks = [
        TaskSpec(name="t0", train_loader_fn=None, eval_fn=None,
                 class_names=["cat", "dog"], max_iter=2),
        TaskSpec(name="t1", train_loader_fn=None, eval_fn=None,
                 class_names=["fish"], max_iter=2),
    ]
    state = IncrementalState(params=jax.device_get(params))
    for t in tasks:
        state = run_task(state, t, model, make_trainer, tok)
    assert state.learned_classes == ["cat", "dog", "fish"]
    assert set(state.prompt_memory) == {"-cat-", "-dog-", "-fish-"}

    # after merge, branches are re-zeroed: train fwd ~= eval fwd at new task
    p = state.params
    np.testing.assert_allclose(
        np.asarray(p["rep_linear_adapter"]["branch_kernel"]).max(), 1e-8, rtol=1e-3
    )
    # freeze branch must be nonzero (absorbed the learning)
    assert np.abs(np.asarray(p["rep_linear_adapter"]["freeze_kernel"])).max() > 0


def test_prompt_injection(setup):
    """Injected stored embeddings replace the live text features at the
    learned classes' token positions (`groundingdino_dt.py:521-531`)."""
    from ziragroundingdino_tpu.train.incremental import build_prompt_injection
    from tests.common import tiny_text_batch

    cfg, model, params, batch = setup
    tok = tiny_tokenizer()
    pm = add_cls_prompt({}, cfg, params, tok, ["cat"], 32)
    # distinctive values so the effect is observable
    pm["-cat-"] = pm["-cat-"] + 7.0

    tb = tiny_text_batch(captions=("cat.dog.",), max_text_len=32)
    values, mask = build_prompt_injection(
        pm, [["cat", "dog"]], tb.cate_to_token_mask, cfg.hidden_dim)
    assert mask.sum() > 0
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    px = batch["pixels"][:1]
    mk = batch["mask"][:1]
    out_plain = model.apply({"params": params}, px, mk, text)
    out_inj = model.apply({"params": params}, px, mk, text,
                          prompt_replace_values=jnp.asarray(values),
                          prompt_replace_mask=jnp.asarray(mask))
    enc_p = np.asarray(out_plain["encoded_text"][0])
    enc_i = np.asarray(out_inj["encoded_text"][0])
    # encoded_text output is post-encoder; injection happened pre-encoder, so
    # compare behavior: outputs must differ, and differ only because of the
    # injected rows (plain == injected when mask is empty)
    assert not np.allclose(enc_p, enc_i)
    out_noop = model.apply({"params": params}, px, mk, text,
                           prompt_replace_values=jnp.asarray(values),
                           prompt_replace_mask=jnp.zeros_like(jnp.asarray(mask)))
    np.testing.assert_allclose(
        np.asarray(out_noop["pred_boxes"]), np.asarray(out_plain["pred_boxes"]),
        atol=1e-6)


def test_replay_phase(setup):
    """run_replay_phase optimizes side branches against the replay loss and
    merges afterwards (branches re-zeroed)."""
    from ziragroundingdino_tpu.train.incremental import run_replay_phase

    cfg, model, params, batch = setup
    tok = tiny_tokenizer()
    pm = add_cls_prompt({}, cfg, params, tok, ["cat", "dog"], 32)
    st = IncrementalState(params=jax.device_get(params), prompt_memory=pm,
                          learned_classes=["cat", "dog"])
    # perturb the freeze branch so replay has something to correct (random:
    # a constant kernel shift is null through BERT's zero-mean LayerNorm)
    rla = dict(st.params["rep_linear_adapter"])
    rla["freeze_kernel"] = (np.asarray(rla["freeze_kernel"])
                            + 0.02 * np.random.RandomState(5).randn(
                                *np.asarray(rla["freeze_kernel"]).shape
                            ).astype(np.float32))
    st.params = dict(st.params, rep_linear_adapter=rla)
    def total(p):
        ls = replay_memory_loss(cfg, p, tok, ["cat", "dog"], pm, 32)
        return sum(float(v) for v in ls.values())

    before = total(st.params)
    st2 = run_replay_phase(st, cfg, tok, iters=20, lr=3e-4)
    after = total(st2.params)
    assert after < before, (after, before)
    np.testing.assert_allclose(
        np.asarray(st2.params["rep_linear_adapter"]["branch_kernel"]).max(),
        1e-8, rtol=1e-3)


def test_incremental_state_roundtrip(setup, tmp_path):
    from ziragroundingdino_tpu.train.incremental import (
        load_incremental_state, save_incremental_state,
    )

    cfg, model, params, batch = setup
    tok = tiny_tokenizer()
    pm = add_cls_prompt({}, cfg, params, tok, ["cat"], 32)
    st = IncrementalState(params=jax.device_get(params), prompt_memory=pm,
                          learned_classes=["cat"])
    path = save_incremental_state(str(tmp_path / "state"), st)
    st2 = load_incremental_state(path)
    assert st2.learned_classes == ["cat"]
    np.testing.assert_allclose(st2.prompt_memory["-cat-"], pm["-cat-"])
    np.testing.assert_allclose(
        np.asarray(st2.params["feat_map"]["kernel"]),
        np.asarray(st.params["feat_map"]["kernel"]))
