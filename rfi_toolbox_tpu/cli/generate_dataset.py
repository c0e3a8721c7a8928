"""CLI ``generate_rfi_dataset``: synthetic .npy dataset or MS extraction.

Rebuild of the reference (scripts/generate_dataset.py:46-207): the
synthetic path runs the coherent-phase RFISimulator and writes one
``NNNN/`` directory per sample with ``input.npy`` (8, T, F) — 4 pols x
(real, imag) — and ``rfi_mask.npy``; ``--use_ms`` extracts train/val
fields via RFIMaskDataset. (The reference's synthetic path crashes on a
missing tqdm import, SURVEY.md §2.8 — fixed by not needing it.)

TPU-native: samples are generated in device batches via the vmapped
simulator instead of one python loop iteration per sample.
"""

import argparse
import logging
import os

import numpy as np

__all__ = ["main", "save_example_pair_npy"]


def save_example_pair_npy(tf_plane, mask, index, out_dir, generate_mask=True):
    """Write input.npy (8, T, F) + rfi_mask.npy for one sample
    (generate_dataset.py:11-43)."""
    sample_dir = os.path.join(out_dir, f"{index:04d}")
    os.makedirs(sample_dir, exist_ok=True)
    input_data = np.stack(
        [
            tf_plane["RR"].real, tf_plane["RR"].imag,
            tf_plane["RL"].real, tf_plane["RL"].imag,
            tf_plane["LR"].real, tf_plane["LR"].imag,
            tf_plane["LL"].real, tf_plane["LL"].imag,
        ],
        axis=0,
    ).astype(np.float32)
    np.save(os.path.join(sample_dir, "input.npy"), input_data)
    if generate_mask:
        np.save(os.path.join(sample_dir, "rfi_mask.npy"), mask)


def _generate_split(simulator, n, out_dir, generate_mask, clean, batch=4):
    """Device-batched generation loop."""
    import jax
    from jax import random

    from rfi_toolbox_tpu.synth.simulator import _POLS

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    key = random.key(simulator._seed_counter) if hasattr(
        simulator, "_seed_counter"
    ) else random.key(0)
    while written < n:
        b = min(batch, n - written)
        if clean:
            for k in range(b):
                tf_plane, mask = simulator.generate_clean_data()
                save_example_pair_npy(
                    tf_plane, mask, written + k, out_dir, generate_mask
                )
        else:
            key, sub = random.split(key)
            keys = random.split(sub, b)
            tf, masks = jax.vmap(simulator.generate_rfi_device)(keys)
            from rfi_toolbox_tpu.utils.transfer import to_host

            tf, masks = to_host(tf), np.asarray(masks)
            for k in range(b):
                tf_plane = {pol: tf[k, i] for i, pol in enumerate(_POLS)}
                save_example_pair_npy(
                    tf_plane, masks[k], written + k, out_dir, generate_mask
                )
        written += b
        logging.info("  %d/%d samples written to %s", written, n, out_dir)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate or load RFI dataset as numpy files."
    )
    parser.add_argument("--samples_training", type=int, default=1000)
    parser.add_argument("--samples_validation", type=int, default=200)
    parser.add_argument("--output_dir", type=str, default="rfi_dataset")
    parser.add_argument("--only_clean", action="store_true",
                        help="Generate only clean data without RFI.")
    parser.add_argument("--time_bins", type=int, default=1024)
    parser.add_argument("--frequency_bins", type=int, default=1024)
    parser.add_argument("--generate_mask", action="store_true", default=True)
    parser.add_argument("--no_generate_mask", action="store_false",
                        dest="generate_mask")
    parser.add_argument("--use_ms", action="store_true", default=False)
    parser.add_argument("--ms_name", type=str, default=None)
    parser.add_argument("--train_field", type=int, default=None)
    parser.add_argument("--val_field", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch_size", type=int, default=4,
                        help="Samples per device generation batch.")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s"
    )

    from rfi_toolbox_tpu.utils.platform import configure_platform

    configure_platform()

    if args.use_ms:
        if not args.ms_name:
            logging.error("Error: --ms_name must be specified when --use_ms is used.")
            return
        if args.only_clean:
            logging.error("Error: --only_clean is incompatible with --use_ms.")
            return
        from rfi_toolbox_tpu.data import RFIMaskDataset

        ms_output_dir = os.path.join(args.output_dir, "ms_data")
        os.makedirs(ms_output_dir, exist_ok=True)
        train_dataset = RFIMaskDataset(
            data_dir=ms_output_dir, use_ms=True, ms_name=args.ms_name,
            field_selection=args.train_field,
        )
        val_dataset = RFIMaskDataset(
            data_dir=ms_output_dir, use_ms=True, ms_name=args.ms_name,
            field_selection=args.val_field,
        )
        logging.info("Training samples from MS: %d", len(train_dataset))
        logging.info("Validation samples from MS: %d", len(val_dataset))
        return

    from rfi_toolbox_tpu.synth import RFISimulator

    simulator = RFISimulator(
        time_bins=args.time_bins, freq_bins=args.frequency_bins, seed=args.seed
    )
    train_dir = os.path.join(args.output_dir, "train")
    if args.only_clean:
        logging.info("Generating only clean data without RFI.")
        _generate_split(simulator, args.samples_training, train_dir,
                        args.generate_mask, clean=True, batch=args.batch_size)
    else:
        _generate_split(simulator, args.samples_training, train_dir,
                        args.generate_mask, clean=False, batch=args.batch_size)
        val_dir = os.path.join(args.output_dir, "val")
        _generate_split(simulator, args.samples_validation, val_dir,
                        args.generate_mask, clean=False, batch=args.batch_size)
    logging.info("Dataset generation complete.")


if __name__ == "__main__":
    main()
