"""CLI mainline tests: the two most user-visible surfaces run as real
subprocesses (VERDICT round-1 item 6).

  * scripts/train_odinw.py --fast-dev-run over 2 synthetic ODinW tasks —
    arg parsing, chained state, task checkpoints, result.json
    (reference mainline: train_multidatasets.py:473-561)
  * demo/inference_on_a_image.py on a synthetic checkpoint — annotated
    image + predictions json (reference: demo/inference_on_a_image.py:122-172)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
from PIL import Image

from tests.common import TINY_BERT, TINY_SWIN, tiny_tokenizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL_OVERRIDES = {
    "hidden_dim": 64, "nheads": 4, "dim_feedforward": 128,
    "enc_layers": 1, "dec_layers": 1, "num_queries": 8,
    "max_text_len": 32, "max_categories": 8, "compute_dtype": "float32",
    "fusion_droppath": 0.0,
    "swin_config": {
        "embed_dim": 8, "depths": [1, 1, 1, 1], "num_heads": [1, 2, 4, 8],
        "window_size": 4, "drop_path_rate": 0.0, "out_indices": [1, 2, 3],
    },
    "bert_config": {
        "vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 64, "hidden_dropout": 0.0,
        "attention_dropout": 0.0,
    },
}
TINY_DATA_OVERRIDES = {
    "shape_buckets": [[64, 96]], "max_boxes": 8, "num_workers": 0,
    "test_short_side": 64, "max_size": 96, "train_short_sides": [64],
}


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    tok = tiny_tokenizer()
    inv = sorted(tok.vocab.items(), key=lambda kv: kv[1])
    vocab = tmp / "vocab.txt"
    vocab.write_text("\n".join(k for k, _ in inv) + "\n")
    sd = {
        "module.feat_map.weight": torch.full((64, 32), 0.01),
        "module.feat_map.bias": torch.zeros(64),
    }
    ckpt = tmp / "mini.pth"
    torch.save({"model": sd}, str(ckpt))
    cfg_json = tmp / "tiny.json"
    cfg_json.write_text(json.dumps(
        {"model": TINY_MODEL_OVERRIDES, "data": TINY_DATA_OVERRIDES}))
    return tmp, str(ckpt), str(vocab), str(cfg_json)


def _write_coco_task(root, class_names, n_train=6, n_test=3, seed=0):
    """A tiny ODinW-layout task: <root>/{train,test}/
    annotations_without_background.json + png images."""
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        images, annotations = [], []
        aid = 1
        for i in range(n):
            fn = f"img{i}.png"
            arr = rng.randint(0, 255, (48, 72, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, fn))
            images.append({"id": i + 1, "file_name": fn, "height": 48, "width": 72})
            for _ in range(rng.randint(1, 3)):
                x, y = rng.randint(0, 40), rng.randint(0, 24)
                w, h = rng.randint(8, 24), rng.randint(8, 16)
                annotations.append({
                    "id": aid, "image_id": i + 1,
                    "category_id": int(rng.randint(1, len(class_names) + 1)),
                    "bbox": [int(x), int(y), int(w), int(h)],
                    "area": int(w * h), "iscrowd": 0,
                })
                aid += 1
        coco = {
            "images": images, "annotations": annotations,
            "categories": [
                {"id": ci + 1, "name": cn} for ci, cn in enumerate(class_names)
            ],
        }
        with open(os.path.join(d, "annotations_without_background.json"), "w") as f:
            json.dump(coco, f)


def _run(args, cwd=REPO, timeout=2400):
    # ZGDINO_PLATFORM: the image's sitecustomize pre-imports jax pointed at
    # the TPU tunnel and may clobber JAX_PLATFORMS; the driver honors this
    # explicit override instead
    env = dict(os.environ, JAX_PLATFORMS="cpu", ZGDINO_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert p.returncode == 0, f"exit {p.returncode}\n--- stdout\n{p.stdout}\n--- stderr\n{p.stderr[-4000:]}"
    return p


def test_train_odinw_fast_dev_run(artifacts, tmp_path):
    tmp, ckpt, vocab, cfg_json = artifacts
    droot = tmp_path / "odinw"
    # two tasks from the ODinW13 suite, synthetic data in their real layout
    _write_coco_task(str(droot / "CottontailRabbits"), ["cat", "dog"], seed=1)
    _write_coco_task(str(droot / "pothole"), ["person", "car"], seed=2)
    out = tmp_path / "out"
    _run([
        "scripts/train_odinw.py",
        "--checkpoint", ckpt, "--vocab", vocab,
        "--datasets-root", str(droot),
        "--suite", "odinw13", "--tasks", "CottontailRabbits,pothole",
        "--output-dir", str(out), "--batch-size", "2",
        "--fast-dev-run", "--config-overrides", cfg_json,
    ])
    # chained per-task state + final report
    for task in ("CottontailRabbits", "pothole"):
        assert (out / task / "state_final").exists(), task
        assert (out / task / "ckpt").exists(), task
    report = json.loads((out / "result.json").read_text())
    assert "avg_AP" in report, report
    assert "AP/CottontailRabbits" in report and "AP/pothole" in report, report
    assert (out / "run_stamp.json").exists()


def test_demo_inference(artifacts, tmp_path):
    tmp, ckpt, vocab, cfg_json = artifacts
    img = tmp_path / "scene.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (60, 90, 3), dtype=np.uint8)
    ).save(img)
    out = tmp_path / "demo_out"
    _run([
        "demo/inference_on_a_image.py",
        "-c", "dualzerorepbranchgroundingdino",
        "-p", ckpt, "--vocab", vocab,
        "-i", str(img), "-t", "cat. dog.",
        "-o", str(out), "--cpu-only",
        "--box-threshold", "0.0", "--text-threshold", "0.0",
        "--config-overrides", cfg_json,
    ])
    files = os.listdir(out)
    assert any(f.endswith((".jpg", ".png")) for f in files), files
    js = [f for f in files if f.endswith(".json")]
    assert js, files
    pred = json.loads((out / js[0]).read_text())
    assert "boxes" in pred or "predictions" in pred or isinstance(pred, list), pred


def test_train_odinw_mesh_data_parallel(artifacts, tmp_path):
    """The driver's --mesh path: sharded params + the multi-host batch
    assembly (single-process degenerate) over a 2-device CPU mesh."""
    tmp, ckpt, vocab, cfg_json = artifacts
    droot = tmp_path / "odinw"
    # ODINW_PATHS maps Raccoon to a nested export directory
    _write_coco_task(
        str(droot / "Raccoon" / "Raccoon.v38-416x416-resize.coco"),
        ["bird", "boat"], seed=3)
    out = tmp_path / "out_mesh"
    env = dict(os.environ, JAX_PLATFORMS="cpu", ZGDINO_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    p = subprocess.run(
        [sys.executable, "scripts/train_odinw.py",
         "--checkpoint", ckpt, "--vocab", vocab,
         "--datasets-root", str(droot),
         "--suite", "odinw13", "--tasks", "Raccoon",
         "--output-dir", str(out), "--batch-size", "2",
         "--mesh", "2",
         "--fast-dev-run", "--config-overrides", cfg_json],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert p.returncode == 0, f"exit {p.returncode}\n{p.stdout}\n{p.stderr[-4000:]}"
    report = json.loads((out / "result.json").read_text())
    assert "AP/Raccoon" in report, report


def test_eval_coco_cli(artifacts, tmp_path):
    """Standalone evaluator CLI (`train_net.py --eval-only` equivalent)."""
    tmp, ckpt, vocab, cfg_json = artifacts
    droot = tmp_path / "ds"
    # 8 eval images: the timed-throughput keys require batches beyond
    # the 2-batch warmup
    _write_coco_task(str(droot), ["cat", "dog"], n_train=1, n_test=8, seed=5)
    out = tmp_path / "metrics.json"
    p = _run([
        "scripts/eval_coco.py",
        "--checkpoint", ckpt, "--vocab", vocab,
        "--json", str(droot / "test" / "annotations_without_background.json"),
        "--image-root", str(droot / "test"),
        "--preset", "dualzerorepbranchgroundingdino",
        "--batch-size", "2", "--output", str(out),
        "--config-overrides", cfg_json,
    ])
    res = json.loads(out.read_text())
    for k in ("AP", "AP50", "AR@1", "AR@10", "AR@100", "images_per_sec",
              "per_category_AP"):
        assert k in res, (k, sorted(res))
    assert set(res["per_category_AP"]) == {"cat", "dog"}


def test_train_odinw_1shot_regime(artifacts, tmp_path):
    """The few-shot regime path end-to-end: fewshot json generation (the
    reference's expected `fewshot_train_shotK_seedS.json` filename,
    `odinw_1shot/aquarium.py:21`) consumed by the driver with --shot 1shot
    (4 iters/epoch schedule facts)."""
    tmp, ckpt, vocab, cfg_json = artifacts
    droot = tmp_path / "odinw"
    task_dir = droot / "CottontailRabbits"
    _write_coco_task(str(task_dir), ["cat", "dog"], n_train=8, n_test=3, seed=7)
    # generate the 1-shot split exactly where get_odinw_task expects it
    from ziragroundingdino_tpu.data.coco import CocoDataset
    from ziragroundingdino_tpu.data.fewshot import write_fewshot_json

    ds = CocoDataset.from_json(
        str(task_dir / "train" / "annotations_without_background.json"),
        str(task_dir / "train"))
    write_fewshot_json(ds, str(task_dir / "train"), shots=1, seed=3)

    out = tmp_path / "out_1shot"
    _run([
        "scripts/train_odinw.py",
        "--checkpoint", ckpt, "--vocab", vocab,
        "--datasets-root", str(droot),
        "--suite", "odinw13", "--tasks", "CottontailRabbits",
        "--shot", "1shot",
        "--output-dir", str(out), "--batch-size", "2",
        "--fast-dev-run", "--config-overrides", cfg_json,
    ])
    report = json.loads((out / "result.json").read_text())
    assert "AP/CottontailRabbits" in report, report


def test_eval_coco_cli_mesh(artifacts, tmp_path):
    """eval_coco --mesh: data-parallel sharded inference over an 8-device
    CPU mesh with an UNEVEN last batch (11 images, global batch 8 -> last
    batch of 3 must be padded/sliced correctly; VERDICT r2 item 4)."""
    tmp, ckpt, vocab, cfg_json = artifacts
    droot = tmp_path / "ds"
    _write_coco_task(str(droot), ["cat", "dog"], n_train=1, n_test=11, seed=6)
    out = tmp_path / "metrics_mesh.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu", ZGDINO_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    p = subprocess.run(
        [sys.executable, "scripts/eval_coco.py",
         "--checkpoint", ckpt, "--vocab", vocab,
         "--json", str(droot / "test" / "annotations_without_background.json"),
         "--image-root", str(droot / "test"),
         "--preset", "dualzerorepbranchgroundingdino",
         "--batch-size", "8", "--mesh", "8", "--output", str(out),
         "--config-overrides", cfg_json],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert p.returncode == 0, f"exit {p.returncode}\n{p.stdout}\n{p.stderr[-4000:]}"
    res = json.loads(out.read_text())
    assert "AP" in res and "per_category_AP" in res
    # every one of the 11 images must have been evaluated exactly once
    assert res["n_images"] == 11, res


def test_train_odinw13_full_suite(artifacts, tmp_path):
    """The NORTH-STAR suite shape (VERDICT r2 item 6): all 13 ODinW13 tasks
    (synthetic data at their real nested paths), chained incrementally in
    one process with replay + COCO retention eval — exercising 13 rep
    merges, prompt-pool growth over 13 task vocabularies, per-task caption
    RNG chaining, and resume-mid-suite (reference mainline:
    `train_multidatasets.py:473-561`)."""
    from ziragroundingdino_tpu.data.odinw import ODINW13, ODINW_PATHS

    tmp, ckpt, vocab, cfg_json = artifacts
    droot = tmp_path / "odinw"
    names_pool = ["cat", "dog", "person", "car", "fish", "zebra"]
    for ti, tname in enumerate(ODINW13):
        sub = ODINW_PATHS[tname][0]
        cls = [names_pool[ti % 4], names_pool[(ti + 1) % 6]]
        _write_coco_task(str(droot / sub), cls, n_train=4, n_test=2, seed=ti)
        # PascalVOC uses a "valid" test split name
        if ODINW_PATHS[tname][2] != "test":
            os.rename(str(droot / sub / "test"),
                      str(droot / sub / ODINW_PATHS[tname][2]))
    coco_dir = tmp_path / "coco"
    _write_coco_task(str(coco_dir), ["cat", "dog"], n_train=1, n_test=2, seed=99)
    coco_json = str(coco_dir / "test" / "annotations_without_background.json")

    out = tmp_path / "out13"
    base = [
        "scripts/train_odinw.py",
        "--checkpoint", ckpt, "--vocab", vocab,
        "--datasets-root", str(droot),
        "--suite", "odinw13",
        "--output-dir", str(out), "--batch-size", "2",
        "--coco-json", coco_json, "--coco-root", str(coco_dir / "test"),
        "--replay-iters", "3",
        "--fast-dev-run", "--config-overrides", cfg_json,
    ]
    # leg 1: first 4 tasks only — an "interrupted" suite
    _run(base + ["--tasks", ",".join(ODINW13[:4])])
    for t in ODINW13[:4]:
        assert (out / t / "state_final").exists(), t
    # leg 2: the full suite resumes — completed tasks are restored from
    # their chained state, the remaining 9 train fresh
    p = _run(base + ["--force-resume"])
    assert "already done; restoring" in (p.stdout + p.stderr)

    report = json.loads((out / "result.json").read_text())
    for t in ODINW13:
        assert f"AP/{t}" in report, (t, sorted(report))
        assert np.isfinite(report[f"AP/{t}"]), t
    assert "avg_AP" in report and "coco_zero_shot_AP" in report
    assert np.isfinite(report["avg_AP"])
    assert np.isfinite(report["coco_zero_shot_AP"])
    # 13 per-task APs + coco retention = the reference's 14-entry final log
    ap_keys = [k for k in report if k.startswith("AP/")]
    assert len(ap_keys) == 13, ap_keys
    # the prompt pool grew across all 13 task vocabularies
    assert (out / ODINW13[-1] / "state_final").exists()
    from ziragroundingdino_tpu.train.incremental import load_incremental_state

    st = load_incremental_state(str(out / ODINW13[-1] / "state_final"))
    assert len(st.learned_classes) >= 6, st.learned_classes
    assert len(st.prompt_memory) >= 6, sorted(st.prompt_memory)


def test_train_odinw35_full_suite(artifacts, tmp_path):
    """The ODinW35 suite shape (VERDICT r3 item 8): all 19 task configs the
    reference ships (`/root/reference/test_odinw35/for_train/` — 19 of the
    35 datasets), synthetic data at their real nested paths, chained in one
    process at fast_dev_run scale with a LARGER vocabulary (12 class words
    vs the 13-suite's 6) so prompt-pool growth and rep merges are exercised
    at the bigger-suite scale. Asserts the 19-entry avg-AP report."""
    from ziragroundingdino_tpu.data.odinw import ODINW35, ODINW_PATHS
    from ziragroundingdino_tpu.text.tokenizer import (
        WordPieceTokenizer, make_synthetic_vocab)

    tmp, ckpt, _, cfg_json = artifacts
    words = ["cat", "dog", "person", "car", "fish", "zebra", "bird", "boat",
             "truck", "horse", "sheep", "plane"]
    vocab_d = make_synthetic_vocab(words)
    inv = sorted(vocab_d.items(), key=lambda kv: kv[1])
    vocab = tmp_path / "vocab35.txt"
    vocab.write_text("\n".join(k for k, _ in inv) + "\n")
    assert max(vocab_d.values()) < 128  # fits TINY bert vocab_size

    droot = tmp_path / "odinw"
    for ti, tname in enumerate(ODINW35):
        sub = ODINW_PATHS[tname][0]
        cls = [words[ti % len(words)], words[(ti + 5) % len(words)]]
        _write_coco_task(str(droot / sub), cls, n_train=4, n_test=2, seed=ti)
        if ODINW_PATHS[tname][2] != "test":
            os.rename(str(droot / sub / "test"),
                      str(droot / sub / ODINW_PATHS[tname][2]))

    out = tmp_path / "out35"
    _run([
        "scripts/train_odinw.py",
        "--checkpoint", ckpt, "--vocab", str(vocab),
        "--datasets-root", str(droot),
        "--suite", "odinw35",
        "--output-dir", str(out), "--batch-size", "2",
        "--fast-dev-run", "--config-overrides", cfg_json,
    ])
    report = json.loads((out / "result.json").read_text())
    ap_keys = [k for k in report if k.startswith("AP/")]
    assert len(ap_keys) == 19, sorted(ap_keys)
    for t in ODINW35:
        assert f"AP/{t}" in report and np.isfinite(report[f"AP/{t}"]), t
    assert "avg_AP" in report
    # prompt pool spans the larger vocabulary
    from ziragroundingdino_tpu.train.incremental import load_incremental_state

    st = load_incremental_state(str(out / ODINW35[-1] / "state_final"))
    assert len(st.prompt_memory) >= 10, sorted(st.prompt_memory)


def test_checkpoint_runbook_dryrun(tmp_path):
    """docs/RUNBOOK_checkpoint_parity.md dry run with a RANDOM full-size
    torch checkpoint (VERDICT r2 item 5): the day the real
    groundingdino_swint_ogc.pth appears, the AP check is exactly these two
    commands — converter CLI reporting zero unmatched keys / zero merge
    problems, then eval_coco consuming the torch .pth directly at full
    model dimensions."""
    oracle_stubs = pytest.importorskip("tests.oracle_stubs")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    from tests.common import tiny_tokenizer
    from tests.oracle_stubs import get_fullsize_reference_model

    tok = tiny_tokenizer()
    ref = get_fullsize_reference_model(tok, max_text_len=256, seed=0)
    ckpt = tmp_path / "fake_ogc.pth"
    torch.save({"model": ref.state_dict()}, str(ckpt))
    del ref

    inv = sorted(tok.vocab.items(), key=lambda kv: kv[1])
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(k for k, _ in inv) + "\n")

    # step 1: converter CLI (runbook §2)
    p = _run([
        "scripts/convert_checkpoint.py",
        "--torch", str(ckpt), "--out", str(tmp_path / "ckpt_jax"),
        "--preset", "groundingdino",
    ], timeout=3600)
    assert "unmatched torch keys: 0" in p.stdout, p.stdout[-2000:]
    assert "merge problems: 0" in p.stdout, p.stdout[-2000:]
    assert (tmp_path / "ckpt_jax").exists()

    # step 2: eval_coco straight off the torch checkpoint (runbook §4) at
    # FULL model dimensions on 2 synthetic images (256px bucket: smallest
    # size with >= 900 multi-scale tokens for top-900 query selection)
    droot = tmp_path / "ds"
    _write_coco_task(str(droot), ["cat", "dog"], n_train=1, n_test=2, seed=11)
    out = tmp_path / "metrics.json"
    data_ov = tmp_path / "full_data.json"
    data_ov.write_text(json.dumps({"model": {}, "data": {
        "shape_buckets": [[256, 256]], "test_short_side": 256,
        "max_size": 256, "num_workers": 0}}))
    p = _run([
        "scripts/eval_coco.py",
        "--checkpoint", str(ckpt), "--vocab", str(vocab),
        "--json", str(droot / "test" / "annotations_without_background.json"),
        "--image-root", str(droot / "test"),
        "--preset", "groundingdino",
        "--batch-size", "1", "--output", str(out),
        "--config-overrides", str(data_ov),
    ], timeout=3600)
    res = json.loads(out.read_text())
    assert "AP" in res and np.isfinite(res["AP"]), res
