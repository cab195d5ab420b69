"""Pallas TPU kernels for the hot ops."""

from paif_tpu.ops.pallas.sr_attention import sr_attention, pallas_attention_enabled

__all__ = ["sr_attention", "pallas_attention_enabled"]
