"""paif_tpu — a TPU-native (JAX/XLA/Pallas) perception-aware infrared-visible
image fusion + robust semantic segmentation framework.

Re-designed from scratch for TPU hardware with the capabilities of the PAIF
reference (LiuZhu-CV/PAIF, ACM MM 2023): a NAS-searched decomposition fusion
network coupled to a SegFormer segmentation branch, evaluated clean and under
PGD-family adversarial attacks.

Design principles (vs. the PyTorch reference):
  * NHWC layout everywhere (TPU-preferred); conv kernels HWIO.
  * Pure-functional flax.linen modules; everything jit-compiles end to end,
    including the PGD attack inner loop (lax.fori_loop over jax.grad).
  * Batched inference with per-image normalization semantics (the reference
    runs batch 1; we preserve its numbers while batching).
  * Data parallelism over a jax.sharding.Mesh; metrics (confusion matrices)
    are computed on device and psum-reduced across chips.
"""

__version__ = "0.1.0"
