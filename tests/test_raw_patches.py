"""Tests for on-device raw-patch training."""

import jax
import pytest
import numpy as np
from jax import random

from rfi_toolbox_tpu.models import UNet
from rfi_toolbox_tpu.preprocess import DevicePreprocessor
from rfi_toolbox_tpu.train import RawPatchTrainer, augment_batch


def _raw_data(rng, n=8, size=64):
    base = rng.normal(1.0, 0.1, (n, size, size))
    masks = np.zeros((n, size, size), bool)
    for i in range(n):
        c = rng.integers(8, size - 8)
        base[i, c - 2 : c + 2, :] += 1e4
        masks[i, c - 2 : c + 2, :] = True
    patches = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    return patches, masks


def test_augment_batch_group_members(rng):
    patches, masks = _raw_data(rng, n=16)
    ap, am = augment_batch(random.key(0), patches, masks.astype(np.float32))
    ap, am = np.asarray(ap), np.asarray(am)
    variants = {0: 0, 1: 0, 2: 0, 3: 0}
    for i in range(16):
        x = patches[i]
        cands = [x, np.flip(x, 0), x.T, np.flip(x.T, 0)]
        for v, c in enumerate(cands):
            if np.array_equal(ap[i], c):
                variants[v] += 1
                break
        else:
            raise AssertionError(f"sample {i} is not a group member")
    assert sum(variants.values()) == 16
    assert len([v for v in variants.values() if v > 0]) >= 2  # randomized


def test_augment_mask_stays_aligned(rng):
    patches, masks = _raw_data(rng, n=8)
    ap, am = augment_batch(random.key(1), patches, masks.astype(np.float32))
    mag = np.abs(np.asarray(ap))
    am = np.asarray(am) > 0
    # the bright stripe must still coincide with the mask after aug
    assert mag[am].mean() > 100 * mag[~am].mean()


@pytest.mark.slow
def test_raw_patch_trainer_learns(rng):
    patches, masks = _raw_data(rng, n=16)
    trainer = RawPatchTrainer(UNet(init_features=4), learning_rate=3e-3,
                              seed=0)
    result = trainer.fit(patches, masks, num_epochs=5, batch_size=8)
    hist = result["history"]
    assert len(hist) == 5
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]


@pytest.mark.slow
def test_device_preprocessor_to_trainer_pipeline(rng):
    base = rng.normal(1.0, 0.1, (1, 1, 128, 128))
    mask = np.zeros((1, 1, 128, 128), bool)
    base[:, :, 30:34, :] += 1e4
    mask[:, :, 30:34, :] = True
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    raw, masks = DevicePreprocessor(vis, flags=mask).create_raw_patches(
        patch_size=64, seed=0
    )
    trainer = RawPatchTrainer(UNet(init_features=4), seed=0)
    result = trainer.fit(raw, masks, num_epochs=2, batch_size=4)
    assert np.isfinite(result["history"][-1]["train_loss"])
