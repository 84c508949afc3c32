from ziragroundingdino_tpu.ops import box_ops  # noqa: F401
from ziragroundingdino_tpu.ops.msda import multi_scale_deformable_attention  # noqa: F401
