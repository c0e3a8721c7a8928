"""Array-backed dataset containers and batched on-disk writers.

TPU-native replacements for the reference's torch shared-memory dataset
and .pt batch writer (rfi_toolbox/datasets/batched_dataset.py:10-184):

- ``ArrayDataset`` holds the whole dataset as two contiguous numpy
  arrays — images float32 (N, H, W, 3), labels uint8 (N, H, W) — which
  is exactly the layout ``jax.device_put`` wants for sharded host->device
  transfer; there is no per-worker process model to share memory with.
- ``BatchWriter`` streams accumulated samples to ``batch_NNN.npz`` files
  of ``samples_per_batch`` plus a ``metadata.json`` (same contract as the
  reference, but recording the *actual* image/mask shapes instead of the
  reference's hardcoded [1024,1024,3], batched_dataset.py:172-173).
- ``load_batches`` iterates batch files (npz, plus .pt via torch when
  present for compatibility with reference-produced datasets).

``TorchDataset`` is kept as an alias of ``ArrayDataset`` for drop-in
compatibility with reference call sites.
"""

import json
from pathlib import Path

import numpy as np

__all__ = ["ArrayDataset", "TorchDataset", "BatchWriter", "load_batches"]


class ArrayDataset:
    """In-memory dataset of (image, label) pairs as numpy arrays.

    Args:
        images: float32 array (N, H, W, 3) — or (N, H, W) for raw-patch
            datasets (complex64/float32), mirroring RawPatchDataset
            (synthetic_generator.py:17-35).
        labels: uint8 array (N, H, W)
        metadata: optional dict
    """

    def __init__(self, images, labels, metadata=None):
        # jax arrays stay device-resident (no forced host transfer);
        # anything else is materialized as numpy.
        if not hasattr(images, "ndim"):
            images = np.asarray(images)
        if not hasattr(labels, "ndim"):
            labels = np.asarray(labels)
        if len(images) != len(labels):
            raise ValueError("Images and labels must have same length")
        self.images = images
        self.labels = labels
        self.metadata = metadata or {}

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return {"image": self.images[idx], "label": self.labels[idx]}

    def save_to_disk(self, path):
        """Save to a single .npz file."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            images=self.images,
            labels=self.labels,
            metadata=json.dumps(self.metadata, default=str),
        )
        size_gb = (self.images.nbytes + self.labels.nbytes) / 1e9
        print(f"Saved ArrayDataset to {path}")
        print(f"  {len(self)} samples, {size_gb:.2f} GB")

    @classmethod
    def load_from_disk(cls, path):
        """Load from .npz (native) or .pt (reference-format, needs torch)."""
        path = Path(path)
        if path.suffix == ".pt":
            import torch

            data = torch.load(path, map_location="cpu", weights_only=False)
            return cls(
                data["images"].numpy(), data["labels"].numpy(), data.get("metadata")
            )
        with np.load(path, allow_pickle=False) as data:
            metadata = json.loads(str(data["metadata"])) if "metadata" in data else {}
            return cls(data["images"], data["labels"], metadata)

    def __repr__(self):
        size_gb = (self.images.nbytes + self.labels.nbytes) / 1e9
        return (
            f"ArrayDataset(samples={len(self)}, "
            f"image_shape={tuple(self.images.shape[1:])}, "
            f"size={size_gb:.2f}GB)"
        )


# Drop-in alias for reference call sites.
TorchDataset = ArrayDataset


class BatchWriter:
    """Accumulates samples and writes fixed-size batch files to disk.

    Usage (same as reference batched_dataset.py:79-184):
        writer = BatchWriter(output_dir, samples_per_batch=100)
        for ds in generate_batches():
            writer.add_batch(ds)
        writer.finalize()
    """

    def __init__(self, output_dir, samples_per_batch=100, format="npz"):
        """
        Args:
            output_dir: directory for batch files.
            samples_per_batch: samples per batch file.
            format: 'npz' (single container per batch) or 'npy'
                (separate batch_NNN.images.npy / .labels.npy pair —
                the layout the native fastio prefetching reader
                consumes without container parsing).
        """
        if format not in ("npz", "npy"):
            raise ValueError(f"format must be 'npz' or 'npy', got {format!r}")
        self.format = format
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.samples_per_batch = samples_per_batch
        self.accumulated_images = []
        self.accumulated_labels = []
        self.batch_file_idx = 0
        self.total_samples = 0
        self._last_shapes = (None, None)
        self._last_dtype = None

    def add_batch(self, dataset):
        """Add all samples from a dataset with .images/.labels."""
        self.accumulated_images.append(np.asarray(dataset.images))
        self.accumulated_labels.append(np.asarray(dataset.labels))
        current = sum(len(a) for a in self.accumulated_images)
        if current >= self.samples_per_batch:
            self._flush()

    def _flush(self, final=False):
        """Write accumulated data in samples_per_batch chunks.

        Unlike the reference (which emits a partial chunk whenever a
        mid-stream flush happens, batched_dataset.py:126-157), the
        remainder is held back until ``finalize`` so every batch file
        except possibly the last holds exactly samples_per_batch.
        """
        if not self.accumulated_images:
            return
        images = np.concatenate(self.accumulated_images)
        labels = np.concatenate(self.accumulated_labels)
        self.accumulated_images = []
        self.accumulated_labels = []
        self._last_shapes = (list(images.shape[1:]), list(labels.shape[1:]))
        self._last_dtype = str(images.dtype)

        n = len(images)
        cut = n if final else (n // self.samples_per_batch) * self.samples_per_batch
        for start in range(0, cut, self.samples_per_batch):
            end = min(start + self.samples_per_batch, cut)
            stem = self.output_dir / f"batch_{self.batch_file_idx:03d}"
            if self.format == "npy":
                np.save(f"{stem}.images.npy", images[start:end])
                np.save(f"{stem}.labels.npy", labels[start:end])
            else:
                np.savez(f"{stem}.npz", images=images[start:end],
                         labels=labels[start:end])
            self.total_samples += end - start
            self.batch_file_idx += 1
        if cut < n:
            self.accumulated_images = [images[cut:]]
            self.accumulated_labels = [labels[cut:]]

    def finalize(self):
        """Flush remaining samples and write metadata.json."""
        self._flush(final=True)
        metadata = {
            "num_samples": self.total_samples,
            "samples_per_batch": self.samples_per_batch,
            "num_batches": self.batch_file_idx,
            "image_shape": self._last_shapes[0],
            "mask_shape": self._last_shapes[1],
            "dtype": self._last_dtype,
            "format_version": 1,
            "file_format": self.format,
        }
        with open(self.output_dir / "metadata.json", "w") as f:
            json.dump(metadata, f, indent=2)
        return metadata


def load_batches(directory, prefetch=True):
    """Yield ArrayDataset per batch file in a BatchWriter directory.

    Supports batch_NNN.npz, raw batch_NNN.{images,labels}.npy pairs
    (read through the native threaded prefetcher when available), and
    reference-format batch_NNN.pt.
    """
    directory = Path(directory)
    npy_imgs = sorted(directory.glob("batch_*.images.npy"))
    if npy_imgs:
        labels_files = [
            p.with_name(p.name.replace(".images.npy", ".labels.npy"))
            for p in npy_imgs
        ]
        if prefetch:
            from ..native.fastio import iter_npy_prefetched

            paths = [p for pair in zip(npy_imgs, labels_files) for p in pair]
            it = iter_npy_prefetched(paths)
            for _ in npy_imgs:
                yield ArrayDataset(next(it), next(it))
        else:
            for pi, pl in zip(npy_imgs, labels_files):
                yield ArrayDataset(np.load(pi), np.load(pl))
        return

    files = sorted(directory.glob("batch_*.npz")) + sorted(directory.glob("batch_*.pt"))
    for f in files:
        if f.suffix == ".pt":
            import torch

            data = torch.load(f, map_location="cpu", weights_only=False)
            yield ArrayDataset(data["images"].numpy(), data["labels"].numpy())
        else:
            with np.load(f) as data:
                yield ArrayDataset(data["images"], data["labels"])
