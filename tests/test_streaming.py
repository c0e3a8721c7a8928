"""Streaming (bounded-RAM) training from on-disk BatchWriter datasets.

The reference's flagship config trains 4000 x 1024^2 samples via a
torch DataLoader over .pt batch files (scripts/train_model.py:106-107);
this is the TPU-native equivalent: StreamingDataset + Trainer.fit from
a directory, with a prefetch thread and at most ~3 batch files resident.
"""

import numpy as np
import pytest

from rfi_toolbox_tpu.data import ArrayDataset, BatchWriter, StreamingDataset


def _write_batches(tmp_path, n=26, per_file=4, hw=16, fmt="npz"):
    images = np.zeros((n, hw, hw, 3), np.float32)
    images[:, 0, 0, 0] = np.arange(n)  # sample id in the corner pixel
    labels = (np.arange(n)[:, None, None] % 2 * np.ones((n, hw, hw))).astype(
        np.uint8
    )
    writer = BatchWriter(tmp_path, samples_per_batch=per_file, format=fmt)
    writer.add_batch(ArrayDataset(images, labels))
    writer.finalize()
    return images, labels


@pytest.mark.parametrize("fmt", ["npz", "npy"])
def test_streaming_dataset_covers_all_samples(tmp_path, fmt):
    _write_batches(tmp_path / "ds", fmt=fmt)
    sd = StreamingDataset(tmp_path / "ds")
    assert len(sd) == 26
    assert sd.image_shape == (16, 16, 3)
    assert len(sd.files) == 7  # 6 full files + remainder of 2

    rng = np.random.default_rng(0)
    seen = []
    for bi, bl in sd.iter_epoch(batch_size=4, rng=rng):
        assert bi.shape == (4, 16, 16, 3)  # static shapes, always
        assert bl.shape == (4, 16, 16)
        ids = bi[:, 0, 0, 0].astype(int)
        # labels stay paired with their images across shuffles/carries
        np.testing.assert_array_equal(bl[:, 0, 0], ids % 2)
        seen.extend(ids.tolist())
    # 26 samples -> 6 batches of 4; the final remainder of 2 is dropped
    assert len(seen) == 24 and len(set(seen)) == 24

    # memory is bounded: never more than 3 of the 7 files resident
    assert 1 <= sd.max_resident_files <= 3

    # drop_remainder=False surfaces the final partial batch
    total = sum(
        len(bi) for bi, _ in sd.iter_epoch(4, drop_remainder=False)
    )
    assert total == 26


def test_streaming_epochs_shuffle_differently(tmp_path):
    _write_batches(tmp_path / "ds")
    sd = StreamingDataset(tmp_path / "ds")
    rng = np.random.default_rng(7)
    e1 = [b[:, 0, 0, 0].astype(int).tolist() for b, _ in sd.iter_epoch(4, rng)]
    e2 = [b[:, 0, 0, 0].astype(int).tolist() for b, _ in sd.iter_epoch(4, rng)]
    assert e1 != e2
    # without rng, order is deterministic file order
    d1 = [b[:, 0, 0, 0].astype(int).tolist() for b, _ in sd.iter_epoch(4)]
    d2 = [b[:, 0, 0, 0].astype(int).tolist() for b, _ in sd.iter_epoch(4)]
    assert d1 == d2


def test_shuffle_pool_mixes_nonadjacent_files(tmp_path):
    """The k-file shuffle pool must put samples from >2 files into one
    minibatch (round-2 verdict #5: file-order + within-file shuffling
    alone draws every minibatch from <=2 adjacent files)."""
    # 8 files x 8 samples; corner pixel encodes the file index
    n, per_file = 64, 8
    images = np.zeros((n, 8, 8, 3), np.float32)
    images[:, 0, 0, 0] = np.arange(n) // per_file
    labels = np.zeros((n, 8, 8), np.uint8)
    w = BatchWriter(tmp_path / "ds", samples_per_batch=per_file)
    w.add_batch(ArrayDataset(images, labels))
    w.finalize()

    sd = StreamingDataset(tmp_path / "ds")
    rng = np.random.default_rng(3)
    seen = []
    mixed = 0
    for bi, _ in sd.iter_epoch(batch_size=8, rng=rng,
                               shuffle_buffer_files=4):
        fids = set(bi[:, 0, 0, 0].astype(int).tolist())
        mixed = max(mixed, len(fids))
        seen.extend(bi[:, 0, 0, 0].tolist())
    assert mixed >= 3  # impossible under 2-adjacent-file shuffling
    assert len(seen) == n  # still a full epoch, every sample once
    assert sd.pool_peak_files <= 5  # pool bound: ~(k+1) files
    assert sd.max_resident_files <= 3  # load pipeline bound unchanged

    # shuffle_buffer_files=1 preserves the legacy carry-over path
    batches = list(sd.iter_epoch(batch_size=8, rng=rng,
                                 shuffle_buffer_files=1))
    assert len(batches) == 8


@pytest.mark.parametrize("fmt", ["npz", "npy"])
def test_streaming_reader_engagement(tmp_path, fmt, monkeypatch):
    """.npy dirs stream through the C++ fastio reader when it builds;
    everything else (and a build failure) uses the Python thread."""
    from rfi_toolbox_tpu.native import fastio

    _write_batches(tmp_path / "ds", fmt=fmt)
    sd = StreamingDataset(tmp_path / "ds")
    list(sd.iter_epoch(batch_size=4))
    if fmt == "npy" and fastio.fastio_available():
        assert sd.last_reader == "native"
    else:
        assert sd.last_reader == "python"

    monkeypatch.setattr(fastio, "fastio_available", lambda: False)
    sd2 = StreamingDataset(tmp_path / "ds")
    got = [b[:, 0, 0, 0].astype(int).tolist()
           for b, _ in sd2.iter_epoch(batch_size=4)]
    assert sd2.last_reader == "python"
    flat = [i for b in got for i in b]
    assert flat == list(range(24))  # same deterministic order either way


@pytest.mark.slow
def test_trainer_fit_streaming_from_directory(tmp_path):
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import Trainer

    rng = np.random.default_rng(1)
    n, hw = 24, 16
    images = rng.normal(size=(n, hw, hw, 3)).astype(np.float32)
    labels = np.zeros((n, hw, hw), np.uint8)
    labels[:, 4:10, 4:10] = 1
    images[..., 0] += 3.0 * labels  # learnable signal

    for split, sl in (("train", slice(0, 16)), ("val", slice(16, 24))):
        w = BatchWriter(tmp_path / split, samples_per_batch=5)
        w.add_batch(ArrayDataset(images[sl], labels[sl]))
        w.finalize()

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    trainer = Trainer(model, learning_rate=1e-3)
    train_sd = StreamingDataset(tmp_path / "train")
    result = trainer.fit(
        train_sd, str(tmp_path / "val"), num_epochs=3, batch_size=4
    )
    assert result["epochs_run"] == 3
    losses = [r["train_loss"] for r in result["history"]]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it actually learns while streaming
    assert "val_loss" in result["history"][-1]
    assert train_sd.max_resident_files <= 3


@pytest.mark.slow
def test_trainer_fit_streaming_from_generator_output(tmp_path):
    """End-to-end: SyntheticDataGenerator.generate writes batch files;
    Trainer.fit streams them straight from disk (VERDICT round-1 #2)."""
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.synth import SyntheticDataGenerator
    from rfi_toolbox_tpu.train import Trainer

    class _NS(dict):
        __getattr__ = dict.__getitem__

    cfg = _NS(
        synthetic=_NS(
            num_samples=4, num_channels=64, num_times=64, noise_mjy=1.0,
            rfi_power_min=1000.0, rfi_power_max=10000.0,
            rfi_type_counts=_NS(narrowband_persistent=2, frequency_sweep=1),
            generation_batch_size=2, num_polarizations=1,
            polarization_correlation=0.8,
        ),
        processing=_NS(
            save_raw=False, patch_size=64, enable_augmentation=False,
            augmentation_rotations=1, stretch=None,
            normalize_before_stretch=False, normalize_after_stretch=False,
        ),
    )
    out = SyntheticDataGenerator(cfg, seed=0).generate(tmp_path / "ds")

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    trainer = Trainer(model, learning_rate=1e-3)
    result = trainer.fit(
        f"{out}/exact_masks", num_epochs=1, batch_size=2
    )
    assert result["epochs_run"] == 1
    assert np.isfinite(result["history"][0]["train_loss"])


@pytest.mark.slow
def test_train_cli_streaming_flag(tmp_path):
    from rfi_toolbox_tpu.cli.train_model import main as train_main

    rng = np.random.default_rng(2)
    images = rng.normal(size=(10, 16, 16, 8)).astype(np.float32)
    labels = (rng.random((10, 16, 16)) > 0.7).astype(np.uint8)
    w = BatchWriter(tmp_path / "batches", samples_per_batch=4)
    w.add_batch(ArrayDataset(images, labels))
    w.finalize()

    result = train_main([
        "--train_batches_dir", str(tmp_path / "batches"),
        "--batch_size", "2", "--num_epochs", "1",
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--init_features", "4", "--compute_dtype", "float32",
    ])
    assert result["epochs_run"] == 1


def test_streaming_early_abort_no_deadlock(tmp_path):
    """Breaking out of iter_epoch mid-stream must not leak a blocked
    producer thread or deadlock subsequent epochs."""
    import threading

    _write_batches(tmp_path / "ds")
    sd = StreamingDataset(tmp_path / "ds")
    before = threading.active_count()
    it = sd.iter_epoch(batch_size=4)
    next(it)
    it.close()  # triggers GeneratorExit inside the loop
    # a fresh full epoch still works after the abort
    n = sum(1 for _ in sd.iter_epoch(batch_size=4))
    assert n == 6
    # give the daemon producer a moment to drain, then check for leaks
    import time as _time

    for _ in range(50):
        if threading.active_count() <= before + 1:
            break
        _time.sleep(0.1)
    assert threading.active_count() <= before + 1


@pytest.mark.parametrize("fmt", ["npz", "npy"])
@pytest.mark.parametrize("pool", [1, 2])
def test_early_abort_residency_returns_to_zero(tmp_path, fmt, pool):
    """Closing iter_epoch mid-stream must release the in-hand file's
    residency count (both reader paths, pooled and unpooled), or
    max_resident_files over-reports on every later epoch. The close
    drain joins the producer thread, so residency is zero as soon as
    close() returns — a producer whose blocked q.put completes after
    an emptiness check must not strand a tracked file."""
    _write_batches(tmp_path / "ds", fmt=fmt)
    sd = StreamingDataset(tmp_path / "ds")
    it = sd.iter_epoch(batch_size=4, rng=np.random.default_rng(0),
                       shuffle_buffer_files=pool)
    next(it)
    it.close()
    assert sd._resident == 0
    peak_after_abort = sd.max_resident_files
    sum(1 for _ in sd.iter_epoch(batch_size=4))
    assert sd.max_resident_files <= max(peak_after_abort, 3)


@pytest.mark.slow
def test_trainer_fit_from_single_npz_file(tmp_path):
    """A path to ONE .npz dataset file (ArrayDataset.save_to_disk
    output) trains in-memory — path arguments cover both layouts."""
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import Trainer

    rng = np.random.default_rng(4)
    ds = ArrayDataset(
        rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
        (rng.random((8, 16, 16)) > 0.7).astype(np.uint8),
    )
    ds.save_to_disk(tmp_path / "train.npz")

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    result = Trainer(model).fit(
        str(tmp_path / "train.npz"), num_epochs=1, batch_size=4
    )
    assert result["epochs_run"] == 1
    assert np.isfinite(result["history"][0]["train_loss"])


@pytest.mark.slow
def test_streaming_smaller_than_batch_yields_partial(tmp_path):
    """A streamed dataset smaller than batch_size must behave like the
    in-memory iterator: one partial batch, not zero batches."""
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import Trainer

    _write_batches(tmp_path / "ds", n=3, per_file=2)
    sd = StreamingDataset(tmp_path / "ds")
    batches = list(sd.iter_epoch(batch_size=8))
    assert len(batches) == 1 and len(batches[0][0]) == 3

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    result = Trainer(model).fit(sd, num_epochs=1, batch_size=8)
    assert np.isfinite(result["history"][0]["train_loss"])


def test_streaming_natural_file_order(tmp_path):
    """batch_1000 must sort after batch_999 (plain lexicographic order
    breaks past 999 files)."""
    from rfi_toolbox_tpu.data.batched_dataset import _scan_batch_files

    d = tmp_path / "ds"
    d.mkdir()
    for idx in (999, 1000, 7):
        np.savez(d / f"batch_{idx:03d}.npz",
                 images=np.zeros((1, 4, 4, 3), np.float32),
                 labels=np.zeros((1, 4, 4), np.uint8))
    names = [p.name for p in _scan_batch_files(d)]
    assert names == ["batch_007.npz", "batch_999.npz", "batch_1000.npz"]


def test_streaming_counts_pt_dir_with_partial_chunks(tmp_path):
    """Reference-produced .pt dirs have no metadata.json and may hold
    partial chunks mid-stream; len() must count every file exactly."""
    torch = pytest.importorskip("torch")
    d = tmp_path / "ds"
    d.mkdir()
    for idx, n in enumerate((4, 2, 4)):  # partial chunk in the middle
        torch.save(
            {"images": torch.zeros((n, 4, 4, 3)),
             "labels": torch.zeros((n, 4, 4), dtype=torch.uint8)},
            d / f"batch_{idx:03d}.pt",
        )
    sd = StreamingDataset(d)
    assert len(sd) == 10
    total = sum(len(b) for b, _ in sd.iter_epoch(2))
    assert total == 10
