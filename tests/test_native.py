"""Tests for the native fastio reader and the npy batch format."""

import numpy as np
import pytest

from rfi_toolbox_tpu.data import ArrayDataset, BatchWriter, load_batches
from rfi_toolbox_tpu.native import (
    FastNpyReader,
    fastio_available,
    iter_npy_prefetched,
)

needs_native = pytest.mark.skipif(
    not fastio_available(), reason="no C++ toolchain for fastio"
)


@needs_native
def test_fastio_reads_all_dtypes(tmp_path, rng):
    arrays = [
        rng.random((4, 8, 8, 3)).astype(np.float32),
        (rng.random((4, 8, 8)) > 0.5).astype(np.uint8),
        (rng.random((3, 5)) + 1j * rng.random((3, 5))).astype(np.complex64),
        rng.integers(0, 100, (7,)).astype(np.int64),
    ]
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f"a{i}.npy"
        np.save(p, a)
        paths.append(p)
    with FastNpyReader(paths, n_threads=2) as r:
        out = list(r)
    assert len(out) == len(arrays)
    for got, want in zip(out, arrays):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want)


@needs_native
def test_fastio_preserves_order(tmp_path):
    paths = []
    for i in range(20):
        p = tmp_path / f"f{i:02d}.npy"
        np.save(p, np.full((100, 100), i, np.float32))
        paths.append(p)
    vals = [int(a[0, 0]) for a in FastNpyReader(paths, n_threads=4)]
    assert vals == list(range(20))


@needs_native
def test_fastio_bad_file_raises(tmp_path):
    p = tmp_path / "bad.npy"
    p.write_bytes(b"not an npy file at all")
    with pytest.raises(IOError):
        list(FastNpyReader([p]))


def test_iter_npy_prefetched_fallback(tmp_path, rng):
    a = rng.random((3, 4)).astype(np.float32)
    p = tmp_path / "x.npy"
    np.save(p, a)
    out = list(iter_npy_prefetched([p]))
    np.testing.assert_array_equal(out[0], a)


def test_batch_writer_npy_format_roundtrip(tmp_path, rng):
    ds = ArrayDataset(
        rng.random((12, 8, 8, 3)).astype(np.float32),
        (rng.random((12, 8, 8)) > 0.5).astype(np.uint8),
    )
    w = BatchWriter(tmp_path / "o", samples_per_batch=5, format="npy")
    w.add_batch(ds)
    meta = w.finalize()
    assert meta["file_format"] == "npy"
    files = sorted((tmp_path / "o").glob("batch_*.images.npy"))
    assert len(files) == 3
    got = np.concatenate([b.images for b in load_batches(tmp_path / "o")])
    np.testing.assert_array_equal(got, ds.images)
    got_l = np.concatenate([b.labels for b in load_batches(tmp_path / "o",
                                                           prefetch=False)])
    np.testing.assert_array_equal(got_l, ds.labels)


def test_batch_writer_bad_format(tmp_path):
    with pytest.raises(ValueError, match="format"):
        BatchWriter(tmp_path, format="hdf5")
