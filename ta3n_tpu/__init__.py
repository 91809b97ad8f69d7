"""TA3N-TPU: a TPU-native (JAX/XLA/Pallas) video domain-adaptation framework.

Re-designed from scratch with the capabilities of the TA3N reference
(`/root/reference`, "Temporal Attentive Adversarial Adaptation Network",
ICCV 2019): frame-feature video DA training/eval with adversarial domain
discriminators at frame / temporal-relation / video granularity, temporal
aggregation (avgpool / RNN / temporal-conv / TRN), discrepancy losses
(DAN/JAN/CORAL), adaptive BN (AdaBN/AutoDIAL), MCD ensembling, domain
attention and attentive-entropy regularization.

TPU-first architecture:
  * the compute path is pure-functional JAX compiled by XLA (single jitted
    dual-stream train step; no per-layer Python in the hot loop),
  * parallelism is a `jax.sharding.Mesh` data axis with XLA collectives
    (vs. the reference's torch DataParallel scatter/gather),
  * hot aggregation ops have fused Pallas kernels (`ta3n_tpu.ops`),
  * the data plane is a packed, statically-shaped feature store with
    masking instead of the reference's per-frame `.t7` file loads and
    dummy-row padding.
"""

from ta3n_tpu.version import __version__

__all__ = ["__version__"]
