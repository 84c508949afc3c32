"""Workload-level integration test: a miniature ODinW-style sequential
incremental run — synthetic COCO datasets on disk, real loaders, real train
steps on ZiRa side branches, merges between tasks, final per-task eval +
avg-AP report (the `train_multidatasets.py` pipeline end to end)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.common import tiny_config, tiny_tokenizer
from ziragroundingdino_tpu.config import (
    DataConfig, OptimizerConfig, ScheduleConfig, TrainConfig,
)
from ziragroundingdino_tpu.data.coco import CocoDataset
from ziragroundingdino_tpu.data.loader import DataLoader
from ziragroundingdino_tpu.eval.evaluator import inference_on_dataset, make_inference_fn
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.train.incremental import (
    IncrementalState, TaskSpec, final_report, run_task,
)
from ziragroundingdino_tpu.train.optim import (
    ZIRA_TRAINABLE_PATTERNS, build_optimizer, trainable_mask,
)
from ziragroundingdino_tpu.train.step import TrainState, make_train_step
from ziragroundingdino_tpu.train.trainer import Trainer


def synth_coco(tmp_path, name, classes, n_images=4, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    root = tmp_path / name
    os.makedirs(root / "img", exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        h, w = 96, 128
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            root / "img" / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        for c in range(len(classes)):
            x, y = rng.randint(0, w - 30), rng.randint(0, h - 30)
            anns.append({"id": aid, "image_id": i, "category_id": c + 1,
                         "bbox": [float(x), float(y), 25.0, 20.0],
                         "area": 500.0, "iscrowd": 0})
            aid += 1
    js = {"images": images, "annotations": anns,
          "categories": [{"id": i + 1, "name": n} for i, n in enumerate(classes)]}
    jf = root / "inst.json"
    jf.write_text(json.dumps(js))
    return CocoDataset.from_json(str(jf), str(root / "img"))


@pytest.mark.slow
def test_mini_odinw_sequence(tmp_path):
    cfg = tiny_config()
    model = GroundingDINO(cfg=cfg)
    tok = tiny_tokenizer()
    dcfg = DataConfig(
        train_short_sides=(64, 96), max_size=160, test_short_side=96,
        shape_buckets=((96, 128), (128, 160)), max_boxes=10, num_workers=0,
    )

    datasets = {
        "taskA": synth_coco(tmp_path, "taskA", ["cat", "dog"], seed=0),
        "taskB": synth_coco(tmp_path, "taskB", ["fish"], seed=1),
    }

    inference_fn = make_inference_fn(model, select_k=10)

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    def make_eval_fn(ds):
        def eval_fn(params):
            loader = DataLoader(ds, tok, dcfg, batch_size=2, train=False,
                                max_text_len=32, max_categories=8)
            return inference_on_dataset(
                {"params": params}, iter(loader), inference_fn,
                num_classes=len(ds.category_names), num_warmup=0,
            )
        return eval_fn

    def make_trainer(task_params, task):
        mask = trainable_mask(task_params, ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
        tx = build_optimizer(
            OptimizerConfig(lr=1e-3, lr_factors=(("freeze", 0.2),)),
            ScheduleConfig(max_iter=task.max_iter), task_params, trainable=mask,
        )
        state = TrainState(step=jnp.zeros((), jnp.int32), params=task_params,
                           opt_state=tx.init(task_params))
        step = make_train_step(Wrap, tx, donate=False)
        loader = DataLoader(datasets[task.name], tok, dcfg, batch_size=2,
                            train=True, max_text_len=32, max_categories=8)
        tcfg = TrainConfig(output_dir=str(tmp_path / f"out_{task.name}"),
                           max_iter=task.max_iter, log_period=2,
                           checkpoint_period=10**9)
        return Trainer(step, state, iter(loader), tcfg), (
            lambda s: jax.device_get(s.params))

    # build initial params from a sample batch
    loader0 = DataLoader(datasets["taskA"], tok, dcfg, batch_size=2, train=False,
                         max_text_len=32, max_categories=8)
    b0 = next(iter(loader0))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(b0["pixels"]), jnp.asarray(b0["mask"]),
        {k: jnp.asarray(b0[k]) for k in (
            "input_ids", "text_token_mask", "position_ids",
            "text_self_attention_masks")},
    )["params"]

    state = IncrementalState(params=jax.device_get(params))
    tasks = []
    for name, ds in datasets.items():
        task = TaskSpec(name=name, train_loader_fn=None,
                        eval_fn=make_eval_fn(ds),
                        class_names=ds.category_names, max_iter=2)
        tasks.append(task)
        state = run_task(state, task, model, make_trainer, tok)

    assert state.learned_classes == ["cat", "dog", "fish"]
    report = final_report(state, tasks)
    assert set(report) == {"AP/taskA", "AP/taskB", "avg_AP"}
    assert np.isfinite(report["avg_AP"]) or np.isnan(report["avg_AP"]) is False
