#!/usr/bin/env python
"""Sequential incremental training over the ODinW suite (the north-star run).

Parity with `train_multidatasets.py:473-580` driven by
`train_odinw13_zira.sh`: per-task ZiRa fine-tuning with soft-freeze, side-
branch merge between tasks, optional COCO replay phase, final per-task +
COCO-retention eval with the averaged-AP report.

Usage:
  python scripts/train_odinw.py --checkpoint groundingdino_swint_ogc.pth \
      --vocab vocab.txt --datasets-root datasets/odinw --suite odinw13 \
      --preset dualzerorepbranchgroundingdino --shot full \
      [--coco-json ... --coco-root ...] [--shuffle] [--fast-dev-run]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import argparse
import hashlib
import json
import logging
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--datasets-root", default="datasets/odinw")
    ap.add_argument("--suite", default="odinw13", choices=["odinw13", "odinw35"])
    ap.add_argument("--shot", default="full", choices=["full", "1shot", "5shot", "10shot"])
    ap.add_argument("--preset", default="dualzerorepbranchgroundingdino")
    ap.add_argument("--output-dir", default="./output/odinw")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--softfreeze-factor", type=float, default=0.2)
    ap.add_argument("--shuffle", action="store_true",
                    help="shuffle task order (train_multidatasets.py:482-484)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fast-dev-run", action="store_true")
    ap.add_argument("--coco-json", default=None, help="COCO val json for retention eval")
    ap.add_argument("--coco-root", default=None)
    ap.add_argument("--replay-iters", type=int, default=0,
                    help="optional text-replay phase length (MemoryReplayer)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="EMA decay for model weights (util/ema.py:36-90); "
                         "0 disables")
    ap.add_argument("--eval-ema", action="store_true",
                    help="chain/eval the EMA weights instead of the raw "
                         "params (util/ema.py:187-263, train_net.py:174-206)")
    ap.add_argument("--force-resume", action="store_true",
                    help="resume into an output dir stamped with different "
                         "run args (default: abort)")
    ap.add_argument("--mesh", default=None,
                    help="'data[,model[,seq]]' axis sizes for multi-chip runs, "
                         "e.g. '8' (DP over 8 chips), '4,2' (DP x TP), or "
                         "'2,2,2' (DP x TP x sequence parallel, parallel/"
                         "sp.py); default: single device")
    ap.add_argument("--tasks", default=None,
                    help="comma-separated subset of suite task names (the "
                         "reference's per-task for_train/*.py glob can be "
                         "trimmed the same way)")
    ap.add_argument("--config-overrides", default=None,
                    help="json file {'model': {...}, 'data': {...}} applied "
                         "on top of the preset — tiny-config dev runs/tests")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable encoder remat: ~14%% faster steps (284 vs "
                         "329 ms @ b=1; 575 ms @ b=2, same per-image — both "
                         "fit v5e HBM at 800x1216, bench_train.py)")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    # run-args stamp: a resumed run silently reusing chained state from a run
    # with different args would corrupt the chain — validate before touching
    # anything (ADVICE r1; reference has no equivalent guard)
    stamp = {k: getattr(args, k) for k in (
        "suite", "shot", "preset", "seed", "lr", "batch_size",
        "softfreeze_factor", "shuffle", "ema_decay",
        # chain-affecting too: task subset drives per-task seeds/skip logic,
        # replay/eval-ema change what gets chained, and config overrides
        # change the model itself (stamped by CONTENT, not path)
        "tasks", "replay_iters", "eval_ema")}
    if args.config_overrides:
        with open(args.config_overrides) as f:
            stamp["config_overrides_sha"] = hashlib.sha256(
                f.read().encode()).hexdigest()[:16]
    os.makedirs(args.output_dir, exist_ok=True)
    stamp_path = os.path.join(args.output_dir, "run_stamp.json")
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            prev = json.load(f)
        diff = {k: (prev.get(k), v) for k, v in stamp.items() if prev.get(k) != v}
        if diff and not args.force_resume:
            raise SystemExit(
                f"output dir {args.output_dir} was stamped with different run "
                f"args: {diff}. Use a fresh --output-dir or --force-resume.")
    else:
        with open(stamp_path, "w") as f:
            json.dump(stamp, f, indent=2)

    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    # explicit platform override (tests / CPU dev runs): the environment may
    # pre-import jax pointed at an accelerator, but the backend is not
    # initialized until first use, so config.update still wins here
    if os.environ.get("ZGDINO_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ZGDINO_PLATFORM"])

    from ziragroundingdino_tpu.config import (
        DataConfig, OptimizerConfig, ScheduleConfig, TrainConfig,
    )
    from ziragroundingdino_tpu.data.loader import DataLoader
    from ziragroundingdino_tpu.data.odinw import odinw_suite
    from ziragroundingdino_tpu.eval.evaluator import inference_on_dataset, make_inference_fn
    from ziragroundingdino_tpu.train.incremental import (
        IncrementalState, TaskSpec, augment_caption_with_learned_names,
        replay_memory_loss, run_task, final_report,
    )
    from ziragroundingdino_tpu.train.optim import (
        build_optimizer, trainable_mask, trainable_patterns_for_cfg,
    )
    from ziragroundingdino_tpu.train.step import TrainState, make_train_step
    from ziragroundingdino_tpu.train.trainer import Trainer
    from ziragroundingdino_tpu.utils.inference import load_model

    mesh = None
    if args.mesh:
        from ziragroundingdino_tpu.parallel.mesh import (
            batch_sharding, make_mesh, param_sharding,
        )

        sizes = [int(x) for x in args.mesh.split(",")]
        mesh = make_mesh(data=sizes[0], model=sizes[1] if len(sizes) > 1 else 1,
                         seq=sizes[2] if len(sizes) > 2 else 1)
        logging.info("mesh: %s over %d devices", dict(mesh.shape), mesh.size)
        if mesh.shape["seq"] > 1:
            import contextlib

            from ziragroundingdino_tpu.parallel import sp

            ctx = contextlib.ExitStack()
            ctx.enter_context(sp.sequence_parallel(mesh))
            import atexit

            atexit.register(ctx.close)
        assert args.batch_size % mesh.shape["data"] == 0, (
            f"--batch-size {args.batch_size} must be divisible by the data "
            f"axis {mesh.shape['data']}")

    model_ov, data_ov = {}, {}
    if args.config_overrides:
        from ziragroundingdino_tpu.config import load_config_overrides

        model_ov, data_ov = load_config_overrides(args.config_overrides)

    # remat the encoder in training (default): recompute activations in the
    # backward. With the MSDA custom VJP the gathered tensors are never saved
    # either way, so --no-remat fits at b=1 and is faster; remat stays the
    # default for batch>=2 safety.
    remat = not args.no_remat
    lm = load_model(args.checkpoint, args.vocab, preset=args.preset,
                    use_checkpoint=remat, use_transformer_ckpt=remat, **model_ov)
    model, tokenizer, cfg = lm.model, lm.tokenizer, lm.cfg
    dcfg = DataConfig(**data_ov)
    rng = np.random.RandomState(args.seed)

    tasks_meta = odinw_suite(args.suite, args.datasets_root, args.shot)
    if args.tasks:
        keep = {t.strip() for t in args.tasks.split(",") if t.strip()}
        unknown = keep - {t.name for t in tasks_meta}
        if unknown:
            raise SystemExit(f"--tasks not in suite {args.suite}: {sorted(unknown)}")
        tasks_meta = [t for t in tasks_meta if t.name in keep]
    if args.shuffle:
        rng.shuffle(tasks_meta)

    inference_fn = make_inference_fn(model, select_k=cfg.select_box_nums_for_evaluation)

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def make_eval_fn(task_meta):
        def eval_fn(params):
            ds = task_meta.load_test()
            loader = DataLoader(ds, tokenizer, dcfg, batch_size=args.batch_size,
                                train=False, max_text_len=cfg.max_text_len,
                                max_categories=cfg.max_categories)
            return inference_on_dataset(
                {"params": params}, iter(loader), inference_fn,
                num_classes=len(ds.category_names),
                class_names=ds.category_names,
            )
        return eval_fn

    def make_trainer(task_params, task):
        from ziragroundingdino_tpu.train.trainer import latest_checkpoint

        mask = trainable_mask(task_params, trainable_patterns_for_cfg(cfg),
                              freeze_all=cfg.freeze_all)
        tx = build_optimizer(
            OptimizerConfig(lr=args.lr, grad_clip=0.1,
                            lr_factors=(("freeze", args.softfreeze_factor),)),
            ScheduleConfig(max_iter=task.max_iter, milestones_frac=(0.4,), gamma=0.1),
            task_params, trainable=mask,
        )
        if mesh is not None:
            task_params = jax.device_put(task_params, param_sharding(task_params, mesh))
        ema_decay = args.ema_decay if args.ema_decay > 0 else None
        state = TrainState(step=jnp.zeros((), jnp.int32), params=task_params,
                           opt_state=tx.init(task_params),
                           ema_params=task_params if ema_decay else None)
        base_step = make_train_step(Wrap, tx, ema_decay=ema_decay, trainable=mask)
        if mesh is None:
            step = base_step
        else:
            from ziragroundingdino_tpu.parallel.multihost import (
                global_batch_from_local,
            )

            def step(st, batch, rng):
                # per-host shard -> global data-sharded array; on one process
                # this is a device-to-device reshard. The loader yields this
                # process's contiguous sub-slice of every global batch
                # (data/loader.py::_index_stream).
                batch = global_batch_from_local(batch, mesh)
                return base_step(st, batch, rng)
        task_dir = os.path.join(args.output_dir, task.name)
        # mid-task resume (`train_net.py:298-305`): fast-forward the data
        # stream to the checkpointed iteration so the resumed run sees the
        # same batches as an uninterrupted one
        marker = latest_checkpoint(os.path.join(task_dir, "ckpt"))
        start = int(os.path.basename(marker).split("_")[-1]) if marker else 0
        if start:
            logging.info("task %s: mid-task checkpoint at iter %d", task.name, start)
        tcfg = TrainConfig(
            output_dir=task_dir,
            max_iter=task.max_iter, log_period=20,
            checkpoint_period=max(task.max_iter // 4, 1),
            fast_dev_run=args.fast_dev_run,
        )
        tr = Trainer(step, state, task.train_loader_fn(start_batch=start), tcfg)

        def extract(s):
            p = s.ema_params if (args.eval_ema and s.ema_params is not None) else s.params
            return jax.device_get(p)

        return tr, extract

    state = IncrementalState(params=lm.params["params"],
                             prompt_memory=dict(lm.prompt_memory))
    tasks = []
    for ti, tm in enumerate(tasks_meta):
        ds_train = tm.load_train(filter_empty=False)

        def loader_fn(start_batch=0, ds=ds_train, ti=ti):
            # per-task RNG keyed on the task index: a resumed run that skips
            # completed tasks draws the same caption augmentation as an
            # uninterrupted one (ADVICE r1)
            task_rng = np.random.RandomState((args.seed * 1000003 + ti) % 2**32)
            names = ds.category_names
            if cfg.use_add_names and cfg.use_learned_names:
                names = augment_caption_with_learned_names(
                    names, state.learned_classes, cfg.num_select_prompt, task_rng)
            return iter(DataLoader(
                ds, tokenizer, dcfg, batch_size=args.batch_size, train=True,
                max_text_len=cfg.max_text_len, max_categories=cfg.max_categories,
                caption=".".join(names) + ".", seed=args.seed + ti,
                start_batch=start_batch,
            ))

        task = TaskSpec(
            name=tm.name, train_loader_fn=loader_fn, eval_fn=make_eval_fn(tm),
            class_names=ds_train.category_names,
            max_iter=20 if args.fast_dev_run else tm.max_iter,
        )
        tasks.append(task)
        chain_path = os.path.join(args.output_dir, task.name, "state_final")
        if os.path.exists(chain_path):  # resume: skip completed tasks
            from ziragroundingdino_tpu.train.incremental import load_incremental_state

            logging.info("=== task %s already done; restoring ===", tm.name)
            state = load_incremental_state(chain_path)
            continue
        logging.info("=== task %s (%d classes) ===", tm.name, len(task.class_names))
        state = run_task(state, task, model, make_trainer, tokenizer)
        from ziragroundingdino_tpu.train.incremental import save_incremental_state

        save_incremental_state(chain_path, state)

    if args.replay_iters > 0:
        from ziragroundingdino_tpu.train.incremental import run_replay_phase

        logging.info("=== replay phase (%d iters) ===", args.replay_iters)
        state = run_replay_phase(state, cfg, tokenizer, iters=args.replay_iters)

    coco_eval_fn = None
    if args.coco_json:
        from ziragroundingdino_tpu.data.coco import CocoDataset

        def coco_eval_fn(params):
            ds = CocoDataset.from_json(args.coco_json, args.coco_root)
            loader = DataLoader(ds, tokenizer, dcfg, batch_size=args.batch_size,
                                train=False, max_text_len=cfg.max_text_len,
                                max_categories=cfg.max_categories)
            return inference_on_dataset(
                {"params": params}, iter(loader), inference_fn,
                num_classes=len(ds.category_names),
                class_names=ds.category_names,
            )

    report = final_report(state, tasks, coco_eval_fn)
    out = os.path.join(args.output_dir, "result.json")
    os.makedirs(args.output_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
