"""Parity tests for flagging statistics (FFI, calcquality, MAD)."""

import numpy as np
import pytest

from rfi_toolbox_tpu.evaluation import (
    compute_calcquality,
    compute_ffi,
    compute_mad,
    compute_statistics,
)


# --- numpy oracles restating reference semantics (SURVEY.md §2.7) ---
def oracle_mad(data):
    med = np.median(data)
    return np.median(np.abs(data - med))


def oracle_statistics(data, flags=None):
    if np.iscomplexobj(data):
        data = np.abs(data)
    if flags is not None:
        clean = data[~flags]
        frac = np.sum(flags) / flags.size
    else:
        clean = data.ravel()
        frac = 0.0
    if len(clean) == 0:
        return dict(mean=np.nan, median=np.nan, std=np.nan, mad=np.nan, count=0,
                    flagged_fraction=1.0)
    return dict(
        mean=float(np.mean(clean)),
        median=float(np.median(clean)),
        std=float(np.std(clean)),
        mad=float(oracle_mad(clean)),
        count=len(clean),
        flagged_fraction=float(frac),
    )


def oracle_ffi(data, flags):
    before = oracle_statistics(data, None)
    after = oracle_statistics(data, flags)
    if np.isnan(after["mad"]) or np.isnan(after["std"]):
        return dict(ffi=0.0, mad_reduction=0.0, std_reduction=0.0, flagged_fraction=1.0)
    madr = 1.0 - after["mad"] / before["mad"]
    stdr = 1.0 - after["std"] / before["std"]
    ffi = (0.5 * madr + 0.5 * stdr) * (1.0 - 0.5 * after["flagged_fraction"])
    return dict(ffi=ffi, mad_reduction=madr, std_reduction=stdr,
                flagged_fraction=after["flagged_fraction"])


def test_mad_parity(rng):
    x = rng.normal(0, 1, (64, 64)).astype(np.float32)
    assert compute_mad(x) == pytest.approx(oracle_mad(x), abs=1e-4)


def test_statistics_parity_real(rng):
    x = rng.normal(5, 2, (128, 128)).astype(np.float32)
    flags = rng.random((128, 128)) > 0.8
    got = compute_statistics(x, flags)
    want = oracle_statistics(x, flags)
    for k in ("mean", "median", "std", "mad"):
        assert got[k] == pytest.approx(want[k], rel=1e-3), k
    assert got["count"] == want["count"]
    assert got["flagged_fraction"] == pytest.approx(want["flagged_fraction"], abs=1e-6)


def test_statistics_parity_complex(rng):
    x = (rng.normal(0, 1, (64, 64)) + 1j * rng.normal(0, 1, (64, 64))).astype(
        np.complex64
    )
    got = compute_statistics(x)
    want = oracle_statistics(x)
    for k in ("mean", "median", "std", "mad"):
        assert got[k] == pytest.approx(want[k], rel=1e-3), k


def test_statistics_all_flagged(rng):
    x = rng.normal(0, 1, (16, 16)).astype(np.float32)
    flags = np.ones((16, 16), bool)
    got = compute_statistics(x, flags)
    assert np.isnan(got["mean"]) and np.isnan(got["mad"])
    assert got["count"] == 0 and got["flagged_fraction"] == 1.0


def test_ffi_parity(rng):
    # RFI-like data: noise + a strong contaminated stripe, flags covering it
    x = rng.normal(1.0, 0.1, (256, 256)).astype(np.float32)
    x[100:120, :] += 50.0
    flags = np.zeros((256, 256), bool)
    flags[100:120, :] = True
    got = compute_ffi(x, flags)
    want = oracle_ffi(x, flags)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-3), k
    assert got["ffi"] > 0  # good flagging must score positive


def test_ffi_all_flagged(rng):
    x = rng.normal(0, 1, (16, 16)).astype(np.float32)
    got = compute_ffi(x, np.ones((16, 16), bool))
    assert got == {"ffi": 0.0, "mad_reduction": 0.0, "std_reduction": 0.0,
                   "flagged_fraction": 1.0}


def test_calcquality_basic(rng):
    x = rng.normal(1.0, 0.1, (128, 128)).astype(np.float32)
    x[50:60, :] += 30.0
    flags = np.zeros((128, 128), bool)
    flags[50:60, :] = True
    got = compute_calcquality(x, flags)
    # Recompute from oracle stats
    ref = oracle_statistics(x, None)
    fl = oracle_statistics(x, flags)
    rmax = float(np.max(x))
    maxdev = (rmax - ref["mean"]) / ref["std"]
    a = abs(abs(maxdev) - 3)
    b = abs(fl["mean"] - ref["mean"]) / ref["std"] - 1
    c = abs(fl["std"] - ref["std"]) / ref["std"]
    d = max(0, (fl["flagged_fraction"] * 100 - 70) / 10)
    want = np.sqrt(a**2 + b**2 + c**2 + d**2)
    assert got["calcquality"] == pytest.approx(want, rel=2e-3)


def test_calcquality_degenerate():
    x = np.ones((8, 8), np.float32)
    got = compute_calcquality(x, np.ones((8, 8), bool))
    assert got["calcquality"] == float("inf")
