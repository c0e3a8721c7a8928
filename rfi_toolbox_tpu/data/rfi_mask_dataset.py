"""RFIMaskDataset: sample-directory dataset for the 8-channel pipeline.

Rebuild of the reference (datasets/rfi_mask_dataset.py:26-257): each
sample directory holds ``input.npy`` (8, F, T) — 4 pols x (real, imag) —
and ``rfi_mask.npy``. Two modes: scan a directory of sample dirs, or
extract samples from a Measurement Set (``use_ms=True``) writing one
``ant{i}_ant{j}/`` directory per baseline.

Differences from the reference, deliberate:
- framework-free: returns numpy float32 arrays (training code feeds
  them to jax; a torch adapter is unnecessary);
- the MS path accepts a FakeMS or a casatools path via
  :class:`~rfi_toolbox_tpu.io.ms_loader.MSLoader` instead of raw table
  calls;
- the reference's dummy MS mask had a TRANSPOSED shape (time, chan)
  (rfi_mask_dataset.py:252, SURVEY.md §2.9) — fixed here to (chan, time)
  to match ``input.npy``'s (8, chan, time);
- normalization parameters are computed in one streaming pass instead
  of concatenating every sample in memory
  (rfi_mask_dataset.py:99-120 loads the whole dataset at once).
"""

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["RFIMaskDataset"]


class RFIMaskDataset:
    """Dataset over sample directories of (input.npy, rfi_mask.npy).

    Args:
        data_dir: directory containing (or to contain) sample dirs.
        transform: optional callable (input, mask) -> (input, mask).
        normalization: 'global_min_max' | 'standardize' | 'robust_scale'
            | None.
        use_ms: extract samples from a measurement set first.
        ms_name: MS path or FakeMS (required when use_ms).
        field_selection: int or list of FIELD_IDs to include.
    """

    def __init__(
        self,
        data_dir,
        transform=None,
        normalization="global_min_max",
        use_ms=False,
        ms_name=None,
        field_selection=None,
    ):
        self.data_dir = data_dir
        self.transform = transform
        self.normalization = normalization
        self.use_ms = use_ms
        self.ms_name = ms_name
        self.field_selection = field_selection
        self.global_min = np.inf
        self.global_max = -np.inf
        self.mean = None
        self.std = None
        self.robust_median = None
        self.robust_iqr = None
        self.sample_dirs = []
        self.antenna_baseline_map = []

        if use_ms:
            if ms_name is None:
                raise ValueError("ms_name must be provided when use_ms is True")
            self.sample_dirs = self._generate_ms_samples()
        else:
            self.sample_dirs = sorted(
                os.path.join(data_dir, d)
                for d in os.listdir(data_dir)
                if os.path.isdir(os.path.join(data_dir, d))
            )

        self._calculate_normalization_params()

    # -- normalization ----------------------------------------------------
    def _calculate_normalization_params(self):
        """Streaming global min/max/mean/std; percentile-based robust
        params on a bounded sample (avoids the reference's
        whole-dataset concatenation)."""
        count = 0
        total = 0.0
        total_sq = 0.0
        robust_sample = []
        for sample_dir in self.sample_dirs:
            x = np.load(os.path.join(sample_dir, "input.npy"))
            self.global_min = min(self.global_min, float(np.min(x)))
            self.global_max = max(self.global_max, float(np.max(x)))
            total += float(np.sum(x, dtype=np.float64))
            total_sq += float(np.sum(np.square(x, dtype=np.float64)))
            count += x.size
            if self.normalization == "robust_scale":
                flat = x.ravel()
                step = max(1, flat.size // 4096)
                robust_sample.append(flat[::step])
        if count:
            self.mean = total / count
            self.std = float(np.sqrt(max(total_sq / count - self.mean**2, 0.0)))
            self.std += 1e-8
        if robust_sample:
            allv = np.concatenate(robust_sample)
            self.robust_median = float(np.median(allv))
            q25, q75 = np.percentile(allv, [25, 75])
            self.robust_iqr = float(q75 - q25) + 1e-8

    def _normalize_input(self, x):
        if self.normalization == "global_min_max":
            if self.global_max > self.global_min:
                return (x - self.global_min) / (self.global_max - self.global_min)
            return np.zeros_like(x)
        if self.normalization == "standardize":
            return (x - self.mean) / self.std
        if self.normalization == "robust_scale":
            return (x - self.robust_median) / self.robust_iqr
        return x

    # -- python dataset protocol -----------------------------------------
    def __len__(self):
        return len(self.sample_dirs)

    def __getitem__(self, idx):
        sample_dir = self.sample_dirs[idx]
        x = np.load(os.path.join(sample_dir, "input.npy")).astype(np.float32)
        mask = np.load(os.path.join(sample_dir, "rfi_mask.npy"))
        x = self._normalize_input(x).astype(np.float32)
        mask = mask.astype(np.float32)[None]  # (1, F, T)
        if self.transform:
            x, mask = self.transform(x, mask)
        return x, mask

    # -- MS extraction ----------------------------------------------------
    def _generate_ms_samples(self):
        """Walk the MS per baseline writing ant{i}_ant{j}/input.npy as
        8 channels (4 pols x re/im) + a zero mask
        (rfi_mask_dataset.py:158-257, with the mask shape fixed)."""
        from ..io.ms_loader import MSLoader

        loader = MSLoader(self.ms_name)
        field_ids = None
        if self.field_selection is not None:
            field_ids = (
                [self.field_selection]
                if isinstance(self.field_selection, int)
                else list(self.field_selection)
            )

        sample_dirs = []
        for field in field_ids if field_ids is not None else [None]:
            data = loader.load(field_id=field)
            for (i, j), baseline in zip(loader.antenna_baseline_map, data):
                sample_dir = os.path.join(self.data_dir, f"ant{i}_ant{j}")
                os.makedirs(sample_dir, exist_ok=True)
                self.antenna_baseline_map.append((i, j))
                input_data = np.stack(
                    [
                        baseline[0].real, baseline[0].imag,
                        baseline[1].real, baseline[1].imag,
                        baseline[2].real, baseline[2].imag,
                        baseline[3].real, baseline[3].imag,
                    ],
                    axis=0,
                ).astype(np.float32)  # (8, chan, time)
                np.save(os.path.join(sample_dir, "input.npy"), input_data)
                # zero mask matching (chan, time) — the reference wrote a
                # transposed (time, chan) dummy (rfi_mask_dataset.py:252)
                mask = np.zeros(baseline.shape[1:], dtype=np.float32)
                np.save(os.path.join(sample_dir, "rfi_mask.npy"), mask)
                sample_dirs.append(sample_dir)
        loader.close()
        return sample_dirs
