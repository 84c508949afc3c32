"""Aux subsystems: VOC AP, SLConfig shim, writers, metric logger."""

import logging
import os

import numpy as np
import pytest

from ziragroundingdino_tpu.eval.voc_map import VocMeanAP
from ziragroundingdino_tpu.utils.events import CommonMetricPrinter, print_csv_format
from ziragroundingdino_tpu.utils.profiling import MetricLogger, SmoothedValue
from ziragroundingdino_tpu.utils.slconfig import config_from_slconfig


def test_voc_map_known_values():
    ev = VocMeanAP(num_classes=1)
    gt = np.array([[0, 0, 50, 50], [100, 100, 150, 150]], np.float32)
    det = np.array([[0, 0, 50, 50], [300, 300, 340, 340]], np.float32)
    ev.add(0, det, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0, 0]))
    res = ev.summarize()
    # area interpolation: precision 1.0 up to recall .5 -> AP = 0.5
    assert res["mAP"] == pytest.approx(50.0, abs=1e-4)

    ev07 = VocMeanAP(num_classes=1, use_07_metric=True)
    ev07.add(0, det, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0, 0]))
    # 11-point: t in {0,.1,..,.5} get p=1 -> 6/11
    assert ev07.summarize()["mAP"] == pytest.approx(6 / 11 * 100, abs=1e-3)


def test_slconfig_shim(tmp_path):
    f = tmp_path / "model_cfg.py"
    f.write_text(
        "modelname = 'dualzerorepbranchgroundingdino'\n"
        "hidden_dim = 256\n"
        "enc_layers = 6\n"
        "pe_temperatureH = 20\n"
        "use_dn = False\n"
        "return_interm_indices = [1, 2, 3]\n"
        "unknown_knob = 42\n"
    )
    cfg, ignored = config_from_slconfig(str(f))
    assert cfg.modelname == "dualzerorepbranchgroundingdino"
    assert cfg.hidden_dim == 256 and cfg.enc_layers == 6
    assert cfg.pe_temperature_h == 20
    assert cfg.return_interm_indices == (1, 2, 3)
    assert "use_dn" in ignored and "unknown_knob" in ignored


def test_writers_and_meters(caplog):
    with caplog.at_level(logging.INFO, logger="ziragroundingdino_tpu"):
        p = CommonMetricPrinter(max_iter=100)
        p.write(10, {"total_loss": 1.5})
        p.write(20, {"total_loss": 1.2})
        print_csv_format({"coco": {"AP": 12.3456, "AP50": 20.0}})
    text = caplog.text
    assert "total_loss" in text and "copypaste" in text and "12.3456" in text

    m = MetricLogger()
    for i in range(5):
        m.update(loss=float(i))
    assert "loss" in str(m)
    sv = SmoothedValue(window=2)
    for v in (1.0, 2.0, 3.0):
        sv.update(v)
    assert sv.avg == 2.5 and sv.global_avg == 2.0


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_slconfig_shim_loads_every_reference_config():
    """Every shipped reference SLConfig file must load through the shim with
    the right model dispatch and no silently-dropped MODEL knobs (the known
    engine-level/DN keys are the allowed ignore set)."""
    import glob

    from ziragroundingdino_tpu.utils.slconfig import _KEY_MAP

    allowed_ignored = {k for k, v in _KEY_MAP.items() if v is None}
    files = sorted(glob.glob("/root/reference/groundingdino/config/GroundingDINO_*.py"))
    assert len(files) >= 11, files
    for f in files:
        cfg, ignored = config_from_slconfig(f)
        assert cfg.modelname in (
            "groundingdino", "dtgroundingdino", "catgroundingdino",
            "dualzerorepbranchgroundingdino",
            "dualzerorepmultilayerbranchgroundingdino",
            "repgroundingdino", "repconvbngroundingdino",
        ), (f, cfg.modelname)
        unknown = set(ignored) - allowed_ignored
        assert not unknown, (os.path.basename(f), sorted(unknown))
    # a couple of spot facts through real files
    cfg, _ = config_from_slconfig(
        "/root/reference/groundingdino/config/GroundingDINO_SwinT_OGC_cat.py")
    assert cfg.modelname == "catgroundingdino" and cfg.use_prompt is True
    cfg, _ = config_from_slconfig(
        "/root/reference/groundingdino/config/GroundingDINO_SwinT_OGC_rep.py")
    assert cfg.use_cet and cfg.use_project_adapter


def test_voc_difficult_gts():
    """VOC 'difficult' semantics (`voc_eval` via pascal_voc_evaluation.py:
    255-259): excluded from npos; a det on a difficult gt is neither TP
    nor FP."""
    gt = np.array([[0, 0, 50, 50], [100, 100, 150, 150]], np.float32)
    difficult = np.array([False, True])
    det = np.array([
        [100, 100, 150, 150],  # on the difficult gt, HIGHEST score
        [0, 0, 50, 50],        # TP on the easy gt
    ], np.float32)
    scores = np.array([0.95, 0.9], np.float32)
    labels = np.zeros(2, np.int64)

    ev = VocMeanAP(num_classes=1)
    ev.add(0, det, scores, labels, gt, labels, gt_difficult=difficult)
    # npos = 1 (easy only); the difficult-matched det vanishes -> AP 100
    assert ev.summarize()["mAP"] == pytest.approx(100.0, abs=1e-4)

    ev2 = VocMeanAP(num_classes=1)
    ev2.add(0, det, scores, labels, gt, labels)
    # without flags: both gts count, both dets TP -> still 100
    assert ev2.summarize()["mAP"] == pytest.approx(100.0, abs=1e-4)

    # a high-scoring det on a difficult gt must NOT become an FP
    ev3 = VocMeanAP(num_classes=1)
    ev3.add(0, det[:1], scores[:1], labels[:1], gt, labels,
            gt_difficult=np.array([True, True]))
    assert np.isnan(ev3.summarize()["mAP"])  # npos == 0
