"""Host-side data layer: datasets, augmentation, batched prefetch pipeline,
and synthetic fixtures."""

from paif_tpu.data.datasets import FusionDataset, FusionMetaDataset, MFDataset
from paif_tpu.data.pipeline import batch_iterator, PrefetchLoader, pad_to_batch
from paif_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "FusionDataset",
    "FusionMetaDataset",
    "MFDataset",
    "batch_iterator",
    "PrefetchLoader",
    "pad_to_batch",
    "make_synthetic_dataset",
]
