"""vlsa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for vision-language
survival analysis on gigapixel whole-slide images.

Re-designed from scratch for TPU with the capability surface of liupei101/VLSA
(ICLR 2025): ordinal survival prompt learning on a frozen pathology VLM text
tower, language-guided MIL aggregation over patch-feature bags, ordinal
incidence-function heads with IFMLE/EMD losses, a SurvivalEVAL-compatible
metric stack, and exact Shapley interpretation over language priors.

Architecture differences from the reference (torch, single-GPU, batch=1):
  * every model is a pure-functional Flax module over *padded, masked* bags
    so whole mini-batches compile to one XLA program (MXU-friendly),
  * the hot cross-attention pooling op has a fused Pallas TPU kernel,
  * training steps are jitted end-to-end and shard over a `jax.sharding.Mesh`
    (data parallel over bags, sequence parallel over the patch axis),
  * evaluation metrics are vectorised numpy on host.
"""

__version__ = "0.1.0"
