"""Serialization + logging helpers.

Parity with `util/slio.py` (json/pkl/yaml load/dump by extension) and
`setup_logger` (`train_multidatasets.py:55-65`, per-rank files).
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import sys
from typing import Any


def load(path: str) -> Any:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path) as f:
            return json.load(f)
    if ext in (".pkl", ".pickle"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if ext in (".yaml", ".yml"):
        import yaml  # soft dep

        with open(path) as f:
            return yaml.safe_load(f)
    raise ValueError(f"unsupported extension {ext!r}")


def dump(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path, "w") as f:
            json.dump(obj, f, indent=2, default=str)
    elif ext in (".pkl", ".pickle"):
        with open(path, "wb") as f:
            pickle.dump(obj, f)
    elif ext in (".yaml", ".yml"):
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(obj, f)
    else:
        raise ValueError(f"unsupported extension {ext!r}")


def setup_logger(
    output_dir: str | None = None,
    name: str = "ziragroundingdino_tpu",
    rank: int = 0,
    level: int = logging.INFO,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "[%(asctime)s %(name)s %(levelname)s] %(message)s", "%m/%d %H:%M:%S"
    )
    if rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        suffix = f".rank{rank}" if rank else ""
        fh = logging.FileHandler(os.path.join(output_dir, f"log{suffix}.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
