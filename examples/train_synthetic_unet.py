"""End-to-end example: synthetic data -> preprocess -> UNet training.

Run: python examples/train_synthetic_unet.py [--device cpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None)
    parser.add_argument("--epochs", type=int, default=5)
    args = parser.parse_args()

    from rfi_toolbox_tpu.utils import configure_platform

    configure_platform(args.device)

    import jax
    from jax import random

    from rfi_toolbox_tpu.evaluation import evaluate_segmentation
    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.preprocess import Preprocessor
    from rfi_toolbox_tpu.synth import SyntheticDataGenerator
    from rfi_toolbox_tpu.train import Trainer

    class NS(dict):
        __getattr__ = dict.__getitem__

    cfg = NS(synthetic=NS(
        num_channels=512, num_times=512, noise_mjy=1.0,
        rfi_power_min=1000.0, rfi_power_max=10000.0,
        rfi_type_counts=NS(narrowband_persistent=8, broadband_persistent=2,
                           narrowband_bursty=8, frequency_sweep=1),
        num_polarizations=1, polarization_correlation=0.8,
    ), processing=NS())

    gen = SyntheticDataGenerator(cfg, seed=0)
    wf, mask, _ = gen.generate_batch(random.key(0), 8)
    train_ds = Preprocessor(wf, flags=mask).create_dataset(
        patch_size=128, seed=0)
    wf_v, mask_v, _ = gen.generate_batch(random.key(1), 2)
    val_ds = Preprocessor(wf_v, flags=mask_v).create_dataset(
        patch_size=128, enable_augmentation=False, seed=1)
    print(f"train: {len(train_ds)} patches, val: {len(val_ds)} patches")

    trainer = Trainer(UNet(init_features=16), learning_rate=1e-3,
                      checkpoint_dir="checkpoints_example", seed=0)
    result = trainer.fit(train_ds, val_ds, num_epochs=args.epochs,
                         batch_size=16)
    for rec in result["history"]:
        print({k: round(v, 4) if isinstance(v, float) else v
               for k, v in rec.items()})

    preds = trainer.predict(np.asarray(val_ds.images))
    print("final:", evaluate_segmentation(preds, np.asarray(val_ds.labels)))


if __name__ == "__main__":
    main()
