"""Model registry.

Replaces the reference's `MODULE_BUILD_FUNCS` registry + `build_model`
(`models/registry.py:18-66`, `models/__init__.py:11-18`): every variant is
the same flax module configured differently, so "building" is config lookup.
"""

from ziragroundingdino_tpu.config import MODEL_PRESETS, get_model_config
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO


def build_model(name: str, **overrides) -> GroundingDINO:
    """`build_model(args)` equivalent: name is a preset key (see
    `config.MODEL_PRESETS`) or a modelname; overrides are config fields."""
    return GroundingDINO(cfg=get_model_config(name, **overrides))


__all__ = ["GroundingDINO", "build_model", "MODEL_PRESETS", "get_model_config"]
