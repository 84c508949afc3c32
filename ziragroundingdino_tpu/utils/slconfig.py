"""SLConfig migration shim.

The reference configures models by exec-ing flat python files
(`util/slconfig.py:76-135`, e.g. `GroundingDINO_SwinT_OGC_rep.py`) whose
variables (`modelname`, `hidden_dim`, ...) feed the registry builder. Our
native config is the typed dataclass tree (config.py); this shim lets users
keep their existing SLConfig files: it execs the file and maps every
recognized knob onto `GroundingDINOConfig` fields, reporting unknowns.
"""

from __future__ import annotations

import logging
import types
from typing import Any, Dict, Tuple

from ziragroundingdino_tpu.config import GroundingDINOConfig, MODEL_PRESETS

logger = logging.getLogger("ziragroundingdino_tpu")

# reference knob -> our field (identity unless renamed)
_KEY_MAP = {
    "pe_temperatureH": "pe_temperature_h",
    "pe_temperatureW": "pe_temperature_w",
    "dn_box_noise_scale": None,  # DN knobs exist in configs but DN is unused
    "dn_label_noise_ratio": None,
    "dn_label_coef": None,
    "dn_bbox_coef": None,
    "use_dn": None,
    "dn_number": None,
    "embed_init_tgt": "embed_init_tgt",
    "use_ema": None,  # engine-level in ours (TrainConfig.ema_enabled)
    "batch_size": None,
    "use_coco_eval": None,
    "device": None,
    "max_labels": None,
    "lr_backbone": None,
    # always None in shipped configs; freezing is optimizer-side here
    # (`train/optim.py::trainable_mask`)
    "backbone_freeze_keywords": None,
    # DN machinery is unused by every shipped driver (PARITY.md)
    "dn_labelbook_size": None,
    # always False (post-norm); the transformer implements exactly that
    "pre_norm": None,
}


def load_slconfig(path: str) -> Dict[str, Any]:
    """Exec a reference model-config python file into a dict
    (`util/slconfig.py:76-135` without the addict wrapper)."""
    ns: Dict[str, Any] = {}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), ns)
    return {k: v for k, v in ns.items() if not k.startswith("__")
            and not isinstance(v, types.ModuleType)}


def config_from_slconfig(path: str) -> Tuple[GroundingDINOConfig, Dict[str, Any]]:
    """Returns (config, ignored_keys_dict)."""
    raw = load_slconfig(path)
    modelname = raw.get("modelname", "groundingdino")
    base = MODEL_PRESETS.get(modelname, MODEL_PRESETS["groundingdino"])
    fields = set(GroundingDINOConfig.__dataclass_fields__)
    overrides: Dict[str, Any] = {}
    ignored: Dict[str, Any] = {}
    for k, v in raw.items():
        mapped = _KEY_MAP.get(k, k)
        if mapped is None:
            ignored[k] = v
            continue
        if mapped in fields:
            if isinstance(v, list):
                v = tuple(v)
            overrides[mapped] = v
        else:
            ignored[k] = v
    if ignored:
        logger.info("slconfig: ignored keys %s", sorted(ignored))
    return base.replace(**overrides), ignored
