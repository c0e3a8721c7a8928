"""Dataset containers and on-disk batch storage."""

from .batched_dataset import ArrayDataset, BatchWriter, TorchDataset, load_batches

__all__ = ["ArrayDataset", "TorchDataset", "BatchWriter", "load_batches"]
