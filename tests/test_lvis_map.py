"""LVIS federated AP: unverified-image detections ignored, verified-negative
count as FPs, not-exhaustive images don't punish extra detections."""

import numpy as np
import pytest

from ziragroundingdino_tpu.eval.lvis_map import LvisMeanAP


def boxes(*xyxy):
    return np.asarray(xyxy, np.float32).reshape(-1, 4)


def test_federated_ignore_and_negatives():
    gt = boxes([0, 0, 50, 50])
    fp = boxes([200, 200, 240, 240])

    # image 0: category 0 annotated (TP there)
    # image 1: category 0 UNVERIFIED -> its FP must be ignored
    # image 2: category 0 verified-negative -> its FP counts
    ev = LvisMeanAP(num_classes=1)
    ev.add(0, gt, np.array([0.9]), np.array([0]), gt, np.array([0]))
    ev.add(1, fp, np.array([0.8]), np.array([0]), np.zeros((0, 4)), np.array([]))
    ev.add(2, fp, np.array([0.7]), np.array([0]), np.zeros((0, 4)), np.array([]))
    ev.add_image_meta(0, [], [])
    ev.add_image_meta(1, [], [])        # not verified for cat 0
    ev.add_image_meta(2, [0], [])       # verified negative
    res = ev.summarize()
    # rank order: TP(0.9) -> [ignored 0.8] -> FP(0.7)
    # precision at full recall = 1.0 => AP = 100
    assert res["AP"] == pytest.approx(100.0, abs=1e-4)

    # same but the negative FP outranks the TP -> precision envelope drops
    ev2 = LvisMeanAP(num_classes=1)
    ev2.add(0, gt, np.array([0.6]), np.array([0]), gt, np.array([0]))
    ev2.add(2, fp, np.array([0.7]), np.array([0]), np.zeros((0, 4)), np.array([]))
    ev2.add_image_meta(0, [], [])
    ev2.add_image_meta(2, [0], [])
    assert ev2.summarize()["AP"] == pytest.approx(50.0, abs=1e-4)


def test_not_exhaustive_extra_dets_ignored():
    gt = boxes([0, 0, 50, 50])
    extra = boxes([200, 200, 240, 240])
    ev = LvisMeanAP(num_classes=1)
    ev.add(0, np.concatenate([gt, extra]), np.array([0.9, 0.8]),
           np.array([0, 0]), gt, np.array([0]))
    ev.add_image_meta(0, [], [0])  # cat 0 not exhaustively annotated here
    assert ev.summarize()["AP"] == pytest.approx(100.0, abs=1e-4)

    # without the flag the extra det is a FP but ranks below the TP ->
    # still AP 100 at full recall; flip scores to see the difference
    ev2 = LvisMeanAP(num_classes=1)
    ev2.add(0, np.concatenate([gt, extra]), np.array([0.8, 0.9]),
            np.array([0, 0]), gt, np.array([0]))
    ev2.add_image_meta(0, [], [])
    assert ev2.summarize()["AP"] == pytest.approx(50.0, abs=1e-4)
    ev3 = LvisMeanAP(num_classes=1)
    ev3.add(0, np.concatenate([gt, extra]), np.array([0.8, 0.9]),
            np.array([0, 0]), gt, np.array([0]))
    ev3.add_image_meta(0, [], [0])
    assert ev3.summarize()["AP"] == pytest.approx(100.0, abs=1e-4)


def test_frequency_bands():
    gt = boxes([0, 0, 50, 50])
    ev = LvisMeanAP(num_classes=2, category_frequency=["r", "f"])
    ev.add(0, gt, np.array([0.9]), np.array([0]), gt, np.array([0]))
    ev.add(1, gt, np.array([0.2]), np.array([1]),
           np.concatenate([gt, boxes([100, 100, 150, 150])]), np.array([1, 1]))
    ev.add_image_meta(0, [], [])
    ev.add_image_meta(1, [], [])
    res = ev.summarize()
    assert res["APr"] == pytest.approx(100.0, abs=1e-4)
    assert res["APf"] == pytest.approx(50.0, abs=1.0)
