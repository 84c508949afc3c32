"""ZiRaGroundingDINO-TPU: a TPU-native (JAX/XLA/Pallas/pjit) open-vocabulary
detection + incremental vision-language fine-tuning framework.

Re-implements, TPU-first, the capabilities of the PyTorch reference
JarintotionDin/ZiRaGroundingDINO (GroundingDINO open-set detector + ZiRa
reparameterizable incremental adaptation over ODinW task sequences).

Design stance (see SURVEY.md section 7):
  * one functional model definition (flax.linen) — no module mutation;
  * ZiRa side branches live in a separate parameter subtree; the reference's
    ``__rep__()`` module surgery becomes a pure pytree merge;
  * all hot compute under ``jit`` with static shape buckets;
  * multi-scale deformable attention is a Pallas kernel with an XLA-composed
    fallback (numerics-identical to the reference's grid_sample path);
  * scale-out is a ``jax.sharding.Mesh`` (data [+ model] axes), not NCCL.
"""

__version__ = "0.1.0"

from ziragroundingdino_tpu.config import GroundingDINOConfig  # noqa: F401
