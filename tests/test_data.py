"""Tests for dataset containers and batch writers."""

import json

import numpy as np

from rfi_toolbox_tpu.data import ArrayDataset, BatchWriter, load_batches


def _ds(n, rng, h=16):
    imgs = rng.random((n, h, h, 3)).astype(np.float32)
    labels = (rng.random((n, h, h)) > 0.5).astype(np.uint8)
    return ArrayDataset(imgs, labels, {"patch_size": h})


def test_array_dataset_roundtrip(tmp_path, rng):
    ds = _ds(5, rng)
    assert len(ds) == 5
    item = ds[2]
    assert item["image"].shape == (16, 16, 3)
    assert item["label"].shape == (16, 16)
    path = tmp_path / "ds.npz"
    ds.save_to_disk(path)
    back = ArrayDataset.load_from_disk(path)
    np.testing.assert_array_equal(back.images, ds.images)
    np.testing.assert_array_equal(back.labels, ds.labels)
    assert back.metadata["patch_size"] == 16


def test_batch_writer_chunking_and_metadata(tmp_path, rng):
    writer = BatchWriter(tmp_path / "out", samples_per_batch=10)
    for _ in range(3):
        writer.add_batch(_ds(7, rng))  # 21 total -> batches of 10/10/1
    meta = writer.finalize()
    assert meta["num_samples"] == 21
    assert meta["num_batches"] == 3
    assert meta["image_shape"] == [16, 16, 3]  # actual shape, not hardcoded
    files = sorted((tmp_path / "out").glob("batch_*.npz"))
    assert len(files) == 3
    sizes = [len(b) for b in load_batches(tmp_path / "out")]
    assert sizes == [10, 10, 1]
    on_disk = json.loads((tmp_path / "out" / "metadata.json").read_text())
    assert on_disk["num_samples"] == 21


def test_batch_writer_content_order(tmp_path, rng):
    ds = _ds(12, rng)
    writer = BatchWriter(tmp_path / "o2", samples_per_batch=5)
    writer.add_batch(ds)
    writer.finalize()
    got = np.concatenate([b.images for b in load_batches(tmp_path / "o2")])
    np.testing.assert_array_equal(got, ds.images)
