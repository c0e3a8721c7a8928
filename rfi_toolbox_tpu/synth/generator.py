"""SyntheticDataGenerator: config-driven dataset generation to disk.

Same workflow and on-disk contract as the reference
(synthetic_generator.py:110-518): batched generation streaming through
``BatchWriter`` into ``output/exact_masks`` (plus optional
``mad_masks``), ``generation_metadata.json`` and ``rfi_parameters.json``
sidecars, ``save_raw`` mode, and the full Preprocessor pass otherwise.

TPU-native differences:
- one vmapped device program generates a whole batch of samples
  (replacing the reference's worker Pool, synthetic_generator.py:283-328);
  ``generation_workers`` in configs is accepted and ignored;
- RNG is a single `jax.random` key tree — pass ``seed`` for exact
  reproducibility (the reference uses the unseeded global numpy RNG);
- preprocessing runs as the batched device pipeline on the *whole*
  generation batch at once.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ..data.batched_dataset import ArrayDataset, BatchWriter
from ..preprocess.preprocessor import Preprocessor
from ..preprocess import pipeline as P
from .sample import make_sample_generator, params_to_event_list

__all__ = ["SyntheticDataGenerator", "RawPatchDataset"]


class RawPatchDataset(ArrayDataset):
    """Container for raw patches (no preprocessing) — BatchWriter
    compatible via .images/.labels (synthetic_generator.py:17-35)."""


def _cfg_get(cfg, key, default=None):
    """Config access working for DataConfig, SimpleNamespace and dict."""
    if cfg is None:
        return default
    if hasattr(cfg, "get"):
        try:
            return cfg.get(key, default)
        except TypeError:
            pass
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


class SyntheticDataGenerator:
    """Generate segmentation training datasets from synthetic RFI.

    Args:
        config: configuration object with ``synthetic`` and
            ``processing`` sections (see configs/data_generation/*.yaml;
            same schema as the reference).
        seed: integer RNG seed (default 0).
    """

    def __init__(self, config, seed=0):
        self.config = config
        self.seed = seed

    # -- config parsing ---------------------------------------------------
    def _parse_rfi_config(self, config):
        """Merge rfi_type_counts with the rfi_types enable-list
        (synthetic_generator.py:817-840)."""
        rfi_types = _cfg_get(
            config,
            "rfi_types",
            ["narrowband_persistent", "broadband_persistent", "frequency_sweep"],
        )
        default_counts = _cfg_get(config, "rfi_type_counts", {}) or {}
        get = (
            default_counts.get
            if isinstance(default_counts, dict)
            else lambda k, d: _cfg_get(default_counts, k, d)
        )
        rfi_config = {
            "narrowband_persistent": {"count": get("narrowband_persistent", 1)},
            "broadband_persistent": {"count": get("broadband_persistent", 1)},
            "narrowband_intermittent": {"count": get("narrowband_intermittent", 0)},
            "narrowband_bursty": {"count": get("narrowband_bursty", 1)},
            "broadband_bursty": {"count": get("broadband_bursty", 0)},
            "frequency_sweep": {"count": get("frequency_sweep", 1)},
        }
        if rfi_types:
            known = (
                default_counts
                if isinstance(default_counts, dict)
                else getattr(default_counts, "__dict__", {})
            )
            for rfi_type in rfi_config:
                if rfi_type not in rfi_types and rfi_type not in known:
                    rfi_config[rfi_type]["count"] = 0
        return rfi_config

    def _build_batch_generator(self):
        """Compile the vmapped per-batch sampler from config."""
        synth = _cfg_get(self.config, "synthetic")
        rfi_config = self._parse_rfi_config(synth)
        sample_fn = make_sample_generator(
            num_channels=_cfg_get(synth, "num_channels", 2048),
            num_times=_cfg_get(synth, "num_times", 512),
            noise_level=_cfg_get(synth, "noise_mjy", 1.0),
            rfi_power_min=_cfg_get(synth, "rfi_power_min", 1000.0),
            rfi_power_max=_cfg_get(synth, "rfi_power_max", 10000.0),
            rfi_config=rfi_config,
            enable_bandpass=_cfg_get(synth, "enable_bandpass_rolloff", False),
            bandpass_order=_cfg_get(synth, "bandpass_polynomial_order", 8),
            num_polarizations=_cfg_get(synth, "num_polarizations", 1),
            pol_corr=_cfg_get(synth, "polarization_correlation", 0.8),
        )
        return jax.jit(jax.vmap(sample_fn)), rfi_config

    def generate_batch(self, key, batch_size):
        """Device-side batch: (waterfalls (B,P,C,T) complex64,
        masks (B,P,C,T) bool, params pytree). Public API for users who
        want arrays instead of on-disk datasets."""
        batch_fn, _ = self._build_batch_generator()
        keys = random.split(key, batch_size)
        return batch_fn(keys)

    # -- on-disk generation ----------------------------------------------
    def generate(self, output_path):
        """Generate the configured dataset under ``output_path``.

        Writes exact_masks/ (and optional mad_masks/) batch files,
        generation_metadata.json, rfi_parameters.json. Returns the
        output directory path as str (synthetic_generator.py:146-518).
        """
        synth = _cfg_get(self.config, "synthetic")
        proc = _cfg_get(self.config, "processing")

        num_samples = _cfg_get(synth, "num_samples", 100)
        num_channels = _cfg_get(synth, "num_channels", 2048)
        num_times = _cfg_get(synth, "num_times", 512)
        noise_level = _cfg_get(synth, "noise_mjy", 1.0)
        rfi_power_min = _cfg_get(synth, "rfi_power_min", 1000.0)
        rfi_power_max = _cfg_get(synth, "rfi_power_max", 10000.0)
        batch_size = _cfg_get(synth, "generation_batch_size", 50)
        generate_mad = _cfg_get(synth, "generate_mad_masks", False)
        enable_bandpass = _cfg_get(synth, "enable_bandpass_rolloff", False)
        pol_corr = _cfg_get(synth, "polarization_correlation", 0.8)

        save_raw = _cfg_get(proc, "save_raw", False)
        patch_size = _cfg_get(proc, "patch_size", 128)
        enable_aug = _cfg_get(proc, "enable_augmentation", True)
        rotations = _cfg_get(proc, "augmentation_rotations", 4)
        effective_rotations = rotations if enable_aug else 1

        batch_fn, rfi_config = self._build_batch_generator()

        output_dir = Path(output_path)
        output_dir.mkdir(parents=True, exist_ok=True)
        exact_writer = BatchWriter(output_dir / "exact_masks", samples_per_batch=100)
        mad_writer = (
            BatchWriter(output_dir / "mad_masks", samples_per_batch=100)
            if generate_mad
            else None
        )

        key = random.key(self.seed)
        all_rfi_parameters = []
        total_raw = 0
        total_patches = 0
        num_batches = (num_samples + batch_size - 1) // batch_size

        from ..utils.progress import progress

        for batch_idx in progress(range(num_batches), desc="Generate",
                                  total=num_batches):
            n = min(batch_size, num_samples - total_raw)
            key, sub = random.split(key)
            waterfalls, masks, params = batch_fn(random.split(sub, n))
            all_rfi_parameters.extend(params_to_event_list(params))

            if save_raw:
                # magnitude averaged over pols; masks max-combined
                # (synthetic_generator.py:69-89)
                mag = jnp.abs(waterfalls).mean(axis=1).astype(jnp.float32)
                m = masks.max(axis=1).astype(jnp.uint8)
                dataset = RawPatchDataset(np.asarray(mag), np.asarray(m))
            else:
                pre = Preprocessor(np.asarray(waterfalls), flags=np.asarray(masks))
                dataset = pre.create_dataset(
                    patch_size=patch_size,
                    stretch=_cfg_get(proc, "stretch", None),
                    flag_sigma=_cfg_get(proc, "flag_sigma", 5),
                    use_custom_flags=True,
                    num_patches=_cfg_get(proc, "num_patches", None),
                    normalize_before_stretch=_cfg_get(
                        proc, "normalize_before_stretch", True
                    ),
                    normalize_after_stretch=_cfg_get(
                        proc, "normalize_after_stretch", False
                    ),
                    enable_augmentation=enable_aug,
                    augmentation_rotations=rotations,
                    seed=self.seed + batch_idx + 1,
                )
            exact_writer.add_batch(dataset)
            if mad_writer is not None:
                mad_flags = P.mad_flag_patches(
                    jnp.abs(waterfalls).reshape(-1, num_channels, num_times),
                    float(_cfg_get(proc, "flag_sigma", 5)),
                )
                mad_writer.add_batch(
                    ArrayDataset(
                        np.asarray(
                            jnp.abs(waterfalls).reshape(-1, num_channels, num_times)
                        ),
                        np.asarray(mad_flags).astype(np.uint8),
                    )
                )
            total_patches += len(dataset)
            total_raw += n

        batch_meta = exact_writer.finalize()
        batch_meta["format"] = "raw" if save_raw else "preprocessed"
        with open(output_dir / "exact_masks" / "metadata.json", "w") as f:
            json.dump(batch_meta, f, indent=2)
        if mad_writer is not None:
            mad_writer.finalize()

        metadata = {
            "source": "synthetic",
            "physical_parameters": {
                "noise_mjy": noise_level,
                "rfi_power_min_jy": rfi_power_min,
                "rfi_power_max_jy": rfi_power_max,
            },
            "num_raw_samples": total_raw,
            "num_channels": num_channels,
            "num_times": num_times,
            "rfi_config": {
                k: v
                for k, v in rfi_config.items()
                if (v["count"][1] if isinstance(v["count"], (list, tuple)) else v["count"])
                > 0
            },
            "bandpass": {
                "enabled": bool(enable_bandpass),
                "polynomial_order": (
                    _cfg_get(synth, "bandpass_polynomial_order", 8)
                    if enable_bandpass
                    else None
                ),
            },
            "polarization_correlation": pol_corr,
            "augmentation": {
                "enabled": bool(enable_aug),
                "rotations": effective_rotations,
            },
            "num_patches": total_patches,
            "patch_size": patch_size,
            "stretch": _cfg_get(proc, "stretch", None),
            "ground_truth": "exact",
            "seed": self.seed,
            "batch_processing": {
                "generation_batch_size": batch_size,
                "num_batches": num_batches,
            },
        }
        with open(output_dir / "generation_metadata.json", "w") as f:
            json.dump(metadata, f, indent=2)
        with open(output_dir / "rfi_parameters.json", "w") as f:
            json.dump(all_rfi_parameters, f, indent=2)

        return str(output_dir)
