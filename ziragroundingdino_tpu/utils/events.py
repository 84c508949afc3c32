"""Metric event writers.

Parity with the reference's writer stack (`train_net.py:271-278`,
`util/events.py:22-66`): a common printer, a JSON writer (metrics.jsonl,
already built into the Trainer), an optional TensorBoard writer and an
optional W&B writer — both soft dependencies, mirroring how the reference
gates `WandbWriter` behind `train.wandb.enabled`.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

logger = logging.getLogger("ziragroundingdino_tpu")


class CommonMetricPrinter:
    """`detectron2.utils.events.CommonMetricPrinter` equivalent."""

    def __init__(self, max_iter: int):
        self.max_iter = max_iter
        self._last = None

    def write(self, step: int, metrics: Dict[str, float]):
        now = time.time()
        rate = ""
        if self._last is not None:
            dt = (now - self._last[0]) / max(step - self._last[1], 1)
            eta = dt * (self.max_iter - step)
            rate = f" iter_time: {dt:.3f}s eta: {eta/60:.1f}min"
        self._last = (now, step)
        parts = " ".join(
            f"{k}: {v:.4g}" for k, v in sorted(metrics.items()) if isinstance(v, float)
        )
        logger.info("iter %d/%d %s%s", step, self.max_iter, parts, rate)


class TensorboardWriter:
    """Soft-dep TensorBoard writer (tensorboardX or tf disabled -> no-op)."""

    def __init__(self, log_dir: str):
        self._w = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._w = SummaryWriter(log_dir)
        except ImportError:
            logger.info("tensorboardX unavailable; TensorboardWriter is a no-op")

    def write(self, step: int, metrics: Dict[str, float]):
        if self._w is None:
            return
        for k, v in metrics.items():
            self._w.add_scalar(k, v, step)

    def close(self):
        if self._w is not None:
            self._w.close()


class WandbWriter:
    """`util/events.py:22-66` equivalent; no-ops if wandb isn't installed."""

    def __init__(self, project: str = "ziragroundingdino_tpu", **kw):
        self._run = None
        try:
            import wandb  # type: ignore

            self._run = wandb.init(project=project, **kw)
        except Exception:
            logger.info("wandb unavailable; WandbWriter is a no-op")

    def write(self, step: int, metrics: Dict[str, float]):
        if self._run is None:
            return
        self._run.log(dict(metrics), step=step)

    def close(self):
        if self._run is not None:
            self._run.finish()


def print_csv_format(results: Dict[str, Dict[str, float]]):
    """`evaluation/testing.py:8-23`: copy-pasteable result lines."""
    for task, metrics in results.items():
        logger.info("copypaste: Task: %s", task)
        keys = list(metrics.keys())
        logger.info("copypaste: %s", ",".join(keys))
        logger.info(
            "copypaste: %s",
            ",".join(f"{metrics[k]:.4f}" if isinstance(metrics[k], float) else str(metrics[k]) for k in keys),
        )
