"""Preprocessor: waterfall data -> training-ready patch datasets.

Same public API and pipeline-order semantics as the reference
``Preprocessor`` / ``GPUPreprocessor``
(rfi_toolbox/preprocessing/preprocessor.py:139-980), rebuilt as a thin
host-side orchestrator over the batched device pipeline in
:mod:`rfi_toolbox_tpu.preprocess.pipeline`:

- rotations, patchify, MAD flags, channel extraction and ImageNet
  normalization all run as a handful of jitted XLA programs over the
  whole batch (the reference loops per-patch in python with a
  multiprocessing.Pool; on TPU the batch *is* the parallelism);
- the data-dependent steps (blank-patch removal, shuffling,
  ``num_patches`` truncation) are host-side index selection followed by
  a device gather, so every device shape stays static;
- ``num_workers`` is accepted for API compatibility and ignored.

Pipeline order (create_dataset, preprocessor.py:198-411):
  1. rotation augmentation (or flatten baselines x pols)
  2. patchify (skipped when the waterfall fits in one patch)
  3-5. normalize/stretch/normalize — real input only, skipped wholesale
       for complex input
  6. flags: inference -> zeros; custom -> rotated+patchified; else MAD
  7. blank-patch removal (skipped in inference mode)
  8. shuffle (skipped in inference mode), then truncation,
     3-channel extraction, ImageNet normalization.
"""

import logging
import os

import jax.numpy as jnp
import numpy as np

from ..data.batched_dataset import ArrayDataset
from . import pipeline as P

logger = logging.getLogger(__name__)

__all__ = ["Preprocessor", "DevicePreprocessor", "GPUPreprocessor", "patchify"]

# Re-export for API parity with `from rfi_toolbox.preprocessing import patchify`.
patchify = P.patchify


def _flatten_waterfalls(data):
    """(B, P, H, W) or (P, H, W) -> (B*P, H, W) jnp array.

    Complex numpy input is staged as real/imag planes (complex
    host->device transfer is unimplemented on some TPU runtimes)."""
    from ..utils.transfer import to_device

    data = to_device(data)
    if data.ndim == 3:
        data = data[jnp.newaxis]
    if data.ndim != 4:
        raise ValueError(f"Data must be 3D or 4D, got shape {data.shape}")
    b, p, h, w = data.shape
    return data.reshape(b * p, h, w)


def _augment_and_patchify(flat, patch_size, num_rotations, do_patch):
    """Rotation augmentation + patchify for a (M, H, W) batch.

    Returns (patches, patches_per_waterfall_variant) with the reference's
    per-waterfall variant ordering [orig, flip, T, flipT]
    (preprocessor.py:429-446). Handles non-square waterfalls by
    patchifying the transposed group separately and interleaving, since
    both groups yield the same patch count per waterfall.
    """
    group_a, group_b = P.apply_rotations(flat, num_rotations)
    m, r_a = group_a.shape[0], group_a.shape[1]

    if not do_patch:
        # Full waterfalls as patches (preprocessor.py:259-269). With 4
        # rotations this requires square input to stack; reference
        # produces a ragged list otherwise, which we reject explicitly.
        if group_b is not None and group_a.shape[-2:] != group_b.shape[-2:]:
            raise ValueError(
                "4-way rotation without patchification requires square "
                f"waterfalls; got {group_a.shape[-2:]}"
            )
        groups = [group_a] if group_b is None else [group_a, group_b]
        patches = jnp.concatenate(groups, axis=1)  # (M, R, H, W)
        r = patches.shape[1]
        return patches.reshape(m * r, *patches.shape[2:]), 1

    pa = P.patchify_batch(group_a.reshape(m * r_a, *group_a.shape[2:]), patch_size)
    k = pa.shape[0] // (m * r_a)
    pa = pa.reshape(m, r_a, k, patch_size, patch_size)
    if group_b is None:
        patches = pa
    else:
        pb = P.patchify_batch(group_b.reshape(m * 2, *group_b.shape[2:]), patch_size)
        pb = pb.reshape(m, 2, k, patch_size, patch_size)
        patches = jnp.concatenate([pa, pb], axis=1)  # (M, 4, k, p, p)
    r = patches.shape[1]
    return patches.reshape(m * r * k, patch_size, patch_size), k


class Preprocessor:
    """Preprocess waterfall data into training patches (device-resident).

    Usage (same contract as reference preprocessor.py:154-172):
        >>> pre = Preprocessor(data, flags=exact_masks)
        >>> dataset = pre.create_dataset(patch_size=128, use_custom_flags=True)
        >>> dataset.images.shape   # (N, 128, 128, 3) float32
        >>> dataset.labels.shape   # (N, 128, 128) uint8
    """

    def __init__(self, data, flags=None):
        """
        Args:
            data: waterfalls, shape (baselines, pols, channels, times) or
                (pols, channels, times); complex or real.
            flags: optional flag array, same shape as data.
        """
        # Keep jax arrays device-resident (no host round-trip; complex
        # transfers are also unimplemented on some TPU backends).
        if not hasattr(data, "ndim"):
            data = np.asarray(data)
        if data.ndim == 3:
            data = data[None]
        elif data.ndim != 4:
            raise ValueError(f"Data must be 3D or 4D, got shape {data.shape}")
        self.data = data
        self.flags = flags
        self._patches = None
        self._patches_thunk = None
        self.patch_flags = None
        self.dataset = None
        self.original_shapes = None

    @property
    def patches(self):
        """Selected raw (complex) patches, (N, p, p), device-resident.

        The fused static path skips gathering these inside the training
        program (only images/labels feed training — the raw-patch gather
        is the largest intermediate); first access materializes them
        with a separate device call."""
        if self._patches is None and self._patches_thunk is not None:
            self._patches = self._patches_thunk()
            self._patches_thunk = None
        return self._patches

    @patches.setter
    def patches(self, value):
        self._patches = value
        self._patches_thunk = None

    def create_dataset(
        self,
        patch_size=128,
        stretch=None,
        flag_sigma=5,
        use_custom_flags=True,
        num_patches=None,
        normalize_before_stretch=True,
        normalize_after_stretch=False,
        num_workers=4,
        enable_augmentation=True,
        augmentation_rotations=4,
        inference_mode=False,
        seed=None,
        use_pallas="auto",
        pad_to_multiple=None,
        static_num_patches=None,
    ):
        """Create an ArrayDataset of 3-channel patches + label masks.

        Args mirror the reference (preprocessor.py:198-230).
        ``num_workers`` is ignored (device-batched execution). ``seed``
        controls the shuffle permutation (the reference uses the global
        numpy RNG; here an explicit seed gives reproducibility).
        ``use_pallas``: True/False/'auto' — use the fused Pallas TPU
        kernels for MAD flags and channel extraction ('auto' = on any
        non-CPU backend; parity with the jnp path is tested).
        ``pad_to_multiple``: round the kept-patch count UP to a multiple
        by repeating kept patches. Blank-patch removal makes the output
        length data-dependent, which forces an XLA recompile per
        distinct count in steady-state pipelines; bucketing keeps
        shapes static across iterations (the duplicates are shuffled
        training samples). None = exact count (default).
        ``static_num_patches``: return EXACTLY this many patches with
        the selection done entirely ON DEVICE
        (:func:`pipeline.static_select_flagged`): flagged patches
        first, cyclic repeats on deficit, truncation on surplus. This
        removes the blank-removal host readback — the one blocking
        round trip in the steady-state train pipeline on a remote
        accelerator — so ``create_dataset`` becomes pure async
        dispatch. Mutually exclusive with ``num_patches`` /
        ``pad_to_multiple``; ignored in inference mode (which keeps
        every patch in order).
        """
        del num_workers  # API compatibility; parallelism is the batch.
        if use_pallas == "auto":
            import jax

            use_pallas = jax.default_backend() != "cpu"

        data = self.data
        is_complex = np.iscomplexobj(data)
        # Device dtypes: complex64 / float32 (host may carry complex128
        # for MS round-trip fidelity; compute is single precision).
        dev_dtype = jnp.complex64 if is_complex else jnp.float32
        flat = _flatten_waterfalls(data).astype(dev_dtype)

        rotations = augmentation_rotations if enable_augmentation else 1
        if rotations <= 1:
            rotations = 1

        h, w = flat.shape[-2:]
        do_patch = not (h <= patch_size and w <= patch_size)
        self.original_shapes = [(h, w)] * (
            flat.shape[0] * (rotations if do_patch else 1)
        )

        # Fused virtual-augmentation fast path: one jitted program,
        # patchify once, flags on base patches, selection by index
        # remap, flip/T applied to only the K gathered patches (exact
        # output parity with the materialized path —
        # preprocess/static_prep.py). Requires an exact patch grid
        # (padding does not commute with flips).
        if (
            static_num_patches
            and not inference_mode
            and do_patch
            and h % patch_size == 0
            and w % patch_size == 0
        ):
            if num_patches or pad_to_multiple:
                raise ValueError(
                    "static_num_patches is mutually exclusive with "
                    "num_patches / pad_to_multiple"
                )
            import jax

            from .static_prep import make_static_prep_fn

            have_custom = use_custom_flags and self.flags is not None
            prep_kwargs = dict(
                rotations=rotations,
                flags_mode="custom" if have_custom else "mad",
                flag_sigma=float(flag_sigma),
                use_pallas=bool(use_pallas),
                stretch=stretch,
                normalize_before_stretch=normalize_before_stretch,
                normalize_after_stretch=normalize_after_stretch,
                # extraction routing override (measurement/bench): the
                # round-5 'planes' mode (Pallas plane-gather-transform
                # epilogue) measured 30% faster than the gather-fused
                # default at half scale; bench.py preflights it in a
                # subprocess and sets this env on success
                extract=os.environ.get("RFI_STATIC_EXTRACT", "auto"),
            )
            fn = make_static_prep_fn(
                patch_size, int(static_num_patches),
                return_patches=False, **prep_kwargs,
            )
            flag_flat = (
                _flatten_waterfalls(self.flags) if have_custom else flat
            )
            prep_key = jax.random.key(seed if seed is not None else 0)
            images, labels, _, self.patch_flags = fn(flat, flag_flat,
                                                     prep_key)
            # raw patches on demand (see the `patches` property)
            self._patches = None
            self._patches_thunk = lambda: make_static_prep_fn(
                patch_size, int(static_num_patches),
                return_patches=True, **prep_kwargs,
            )(flat, flag_flat, prep_key)[2]
            metadata = {
                "patch_size": patch_size,
                "stretch": stretch,
                "flag_sigma": flag_sigma,
                "normalize_before_stretch": normalize_before_stretch,
                "normalize_after_stretch": normalize_after_stretch,
                "augmentation_rotations": rotations,
                "original_shapes": self.original_shapes,
            }
            self.dataset = ArrayDataset(
                images.astype(jnp.float32), labels, metadata
            )
            return self.dataset

        patches, _ = _augment_and_patchify(flat, patch_size, rotations, do_patch)

        have_custom = use_custom_flags and self.flags is not None
        if have_custom:
            # nonzero test, not astype: truncation would silently
            # unflag fractional float flag values (e.g. 0.5); bool is
            # still 1-byte lanes so the traffic win is identical
            flag_flat = _flatten_waterfalls(self.flags) != 0
            flag_patches, _ = _augment_and_patchify(
                flag_flat, patch_size, rotations, do_patch
            )
            flag_patches = flag_patches > 0

        # Steps 3-5: real data only (preprocessor.py:284-313).
        if not is_complex:
            if normalize_before_stretch:
                patches = P.normalize_by_median(patches)
            if stretch:
                patches = P.apply_stretch(patches, stretch)
            if normalize_after_stretch:
                patches = P.normalize_by_median(patches)

        # Step 6: flags (preprocessor.py:315-336).
        if inference_mode:
            flag_patches = jnp.zeros(patches.shape, dtype=bool)
        elif have_custom:
            pass  # already rotated/patchified above
        else:
            if use_pallas:
                from ..ops import mad_flag_patches_pallas

                flag_patches = mad_flag_patches_pallas(
                    patches, float(flag_sigma)
                )
            else:
                flag_patches = P.mad_flag_patches(patches, float(flag_sigma))

        # Steps 7-8 + truncation: host-side index selection, device gather
        # (or the fully-device static path when static_num_patches is set).
        n = patches.shape[0]
        if static_num_patches and not inference_mode:
            if num_patches or pad_to_multiple:
                raise ValueError(
                    "static_num_patches is mutually exclusive with "
                    "num_patches / pad_to_multiple"
                )
            import jax

            keep_dev = P.static_select_flagged(
                flag_patches, int(static_num_patches),
                jax.random.key(seed if seed is not None else 0),
            )
        elif not inference_mode:
            has_flags = np.asarray(jnp.any(flag_patches, axis=(1, 2)))
            if has_flags.any():
                keep = np.nonzero(has_flags)[0]
            else:
                logger.warning("No flagged patches found - keeping all patches")
                keep = np.arange(n)
            rng = np.random.default_rng(seed) if seed is not None else np.random
            keep = rng.permutation(keep)
        else:
            keep = np.arange(n)

        if not (static_num_patches and not inference_mode):
            if num_patches and num_patches < len(keep):
                keep = keep[:num_patches]

            if (pad_to_multiple and not inference_mode
                    and len(keep) % pad_to_multiple):
                deficit = pad_to_multiple - len(keep) % pad_to_multiple
                reps = -(-deficit // max(len(keep), 1))
                keep = np.concatenate([keep, np.tile(keep, reps)[:deficit]])

            keep_dev = jnp.asarray(keep)
        patches = jnp.take(patches, keep_dev, axis=0)
        flag_patches = jnp.take(flag_patches, keep_dev, axis=0)

        # Channel extraction + ImageNet normalization (one device pass;
        # the Pallas kernel fuses the whole chain per patch block). The
        # kernel implements the COMPLEX channel semantics only — real
        # input takes the jnp path for the reference's real fallback
        # (min-max log amp + zero phase, preprocessor.py:608-644).
        if use_pallas and jnp.iscomplexobj(patches):
            from ..ops import fused_extract_channels

            images = fused_extract_channels(patches)
        else:
            images = P.imagenet_normalize(P.extract_channels(patches))

        # Device-resident (transfer complex patches only on demand).
        self.patches = patches
        self.patch_flags = flag_patches

        metadata = {
            "patch_size": patch_size,
            "stretch": stretch,
            "flag_sigma": flag_sigma,
            "normalize_before_stretch": normalize_before_stretch,
            "normalize_after_stretch": normalize_after_stretch,
            "augmentation_rotations": rotations,
            "original_shapes": self.original_shapes,
        }
        # Keep the dataset device-resident; training consumes it on
        # device, and disk writers pull to host only when needed.
        self.dataset = ArrayDataset(
            images.astype(jnp.float32),
            flag_patches.astype(jnp.uint8),
            metadata,
        )
        return self.dataset


class DevicePreprocessor:
    """Minimal-host-work preprocessor returning RAW complex patches.

    TPU-native equivalent of the reference ``GPUPreprocessor``
    (preprocessor.py:786-980): no channel extraction, no ImageNet
    normalization, no pre-generated augmentation — downstream training
    applies transforms on device per step. Stores complex patches
    (half the bytes of 3-channel float32) and skips the 4x augmentation
    copies.
    """

    def __init__(self, data, flags=None):
        if not hasattr(data, "ndim"):
            data = np.asarray(data)
        if data.ndim == 3:
            data = data[None]
        elif data.ndim != 4:
            raise ValueError(f"Data must be 3D or 4D, got shape {data.shape}")
        if not np.iscomplexobj(data):
            raise ValueError(
                "DevicePreprocessor requires complex data. "
                "Use standard Preprocessor for real-valued data."
            )
        self.data = data
        self.flags = flags
        self.raw_patches = None
        self.raw_masks = None
        self.original_shapes = None

    def create_raw_patches(
        self,
        patch_size=256,
        remove_blank=True,
        num_patches=None,
        num_workers=4,
        seed=None,
    ):
        """Patchify + blank-removal + shuffle only; returns
        (complex_patches (N,H,W) complex64, masks (N,H,W) bool) as numpy
        arrays (the reference returns python lists,
        preprocessor.py:846-940)."""
        del num_workers

        flat = _flatten_waterfalls(self.data).astype(jnp.complex64)
        if self.flags is not None:
            flag_flat = _flatten_waterfalls(self.flags) != 0
        else:
            flag_flat = jnp.abs(flat) > 0  # preprocessor.py:884

        h, w = flat.shape[-2:]
        self.original_shapes = [(h, w)] * flat.shape[0]
        if h <= patch_size and w <= patch_size:
            patches, masks = flat, flag_flat
        else:
            patches = P.patchify_batch(flat, patch_size)
            masks = P.patchify_batch(flag_flat.astype(jnp.uint8), patch_size) > 0

        n = patches.shape[0]
        rng = np.random.default_rng(seed) if seed is not None else np.random
        if remove_blank:
            has_rfi = np.asarray(jnp.any(masks, axis=(1, 2)))
            keep = np.nonzero(has_rfi)[0]
        else:
            keep = np.arange(n)
        if num_patches and num_patches < len(keep):
            keep = rng.choice(len(keep), num_patches, replace=False)
            keep = np.sort(keep)
        keep = rng.permutation(keep)

        keep_dev = jnp.asarray(keep)
        self.raw_patches = np.asarray(jnp.take(patches, keep_dev, axis=0))
        self.raw_masks = np.asarray(jnp.take(masks, keep_dev, axis=0))
        return self.raw_patches, self.raw_masks


    def estimate_storage_mb(self):
        """Raw-patch storage footprint in MB (reference
        preprocessor.py:974-980); complex64 patches are ~6x smaller
        than the 4x-augmented 3-channel float32 pipeline."""
        if self.raw_patches is None or len(self.raw_patches) == 0:
            return 0.0
        return float(np.asarray(self.raw_patches).nbytes) / (1024 * 1024)

    # reference-private name kept for drop-in compatibility
    _estimate_storage_mb = estimate_storage_mb


# Alias for drop-in compatibility with reference call sites.
GPUPreprocessor = DevicePreprocessor
