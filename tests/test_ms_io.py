"""MS I/O tests against the in-memory FakeMS backend — full coverage of
the load -> preprocess -> flag -> save_flags round trip the reference
leaves untested (SURVEY.md §4)."""

import numpy as np
import pytest

from rfi_toolbox_tpu.io import FakeMS, MSLoader, inject_synthetic_data, make_fake_ms


def test_loader_metadata():
    ms = make_fake_ms(num_antennas=4, channels_per_spw=(8, 8), num_times=6)
    loader = MSLoader(ms)
    assert loader.num_antennas == 4
    assert loader.num_spw == 2
    assert loader.num_times == 6
    meta = loader.get_metadata()
    assert meta["num_baselines"] == 6
    assert meta["num_pols"] == 4
    assert meta["num_channels"] == 8
    assert meta["total_channels"] == 16
    assert meta["shape"] == (6, 4, 8, 6)


def test_load_shape_and_spw_concat():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8, 8), num_times=5)
    loader = MSLoader(ms)
    data = loader.load()
    # 3 baselines, 4 pols, 2 SPW x 8 chan, 5 times
    assert data.shape == (3, 4, 16, 5)
    assert data.dtype == np.complex128
    assert loader.antenna_baseline_map == [(0, 1), (0, 2), (1, 2)]
    # SPW 1 occupies channels 8:16 — compare against a direct row read
    sub = ms.table().query("DATA_DESC_ID==1 && ANTENNA1==0 && ANTENNA2==1")
    np.testing.assert_array_equal(data[0, :, 8:, :], sub.getcol("DATA"))


def test_unequal_spw_channels_filtered():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8, 4, 8), num_times=4)
    loader = MSLoader(ms)
    data = loader.load()
    # only SPWs with 8 channels (0 and 2) are loaded
    assert data.shape[2] == 16
    assert loader.spw_list == [0, 2]


def test_empty_baseline_skipped():
    ms = make_fake_ms(num_antennas=4, skip_baselines=[(1, 2)], num_times=4)
    loader = MSLoader(ms)
    data = loader.load()
    assert (1, 2) not in loader.antenna_baseline_map
    assert data.shape[0] == 5  # 6 pairs - 1 skipped


def test_num_antennas_limits_outer_loop_only():
    # "first N antennas" means ANTENNA1 < N against ALL antennas
    ms = make_fake_ms(num_antennas=4, num_times=3)
    loader = MSLoader(ms)
    loader.load(num_antennas=2)
    assert loader.antenna_baseline_map == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3)
    ]


def test_flags_roundtrip():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8, 8), num_times=5)
    loader = MSLoader(ms)
    loader.load()
    flags = loader.load_flags()
    assert flags.shape == (3, 4, 16, 5)
    assert not flags.any()

    new_flags = np.zeros_like(flags)
    new_flags[1, :, 3:12, 2] = True  # spans both SPWs
    loader.save_flags(new_flags)
    back = loader.load_flags()
    np.testing.assert_array_equal(back, new_flags)


def test_single_baseline_and_pol():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8,), num_times=5)
    loader = MSLoader(ms)
    d = loader.load_single_baseline(0, 2, pol_idx=1)
    assert d.shape == (8, 5)
    full = loader.load()
    np.testing.assert_array_equal(d, full[1, 1])  # baseline (0,2) idx 1


def test_load_baseline_self_contained():
    ms = make_fake_ms(num_antennas=3, num_times=4)
    loader = MSLoader(ms)
    d = loader.load_baseline(1, 2)
    assert d.shape == (4, 8, 4)


def test_save_baseline_flags():
    ms = make_fake_ms(num_antennas=3, num_times=4)
    loader = MSLoader(ms)
    flags = np.zeros((4, 8, 4), bool)
    flags[0, 2, :] = True
    loader.save_baseline_flags(0, 1, flags)
    loader.load()
    back = loader.load_flags()
    np.testing.assert_array_equal(back[0], flags)


def test_fields():
    ms = make_fake_ms(num_antennas=3, num_times=4, field_ids=(0, 2))
    loader = MSLoader(ms)
    assert loader.get_available_fields() == [0, 2]
    l0 = MSLoader(ms, field_id=0)
    d0 = l0.load()
    assert d0.shape[-1] == 4  # field filter applied in time count
    # field override through load()
    l0.load(field_id=2)
    assert l0.field_id == 2


def test_magnitude_property():
    ms = make_fake_ms(num_antennas=3, num_times=3)
    loader = MSLoader(ms)
    with pytest.raises(ValueError, match="load"):
        _ = loader.magnitude
    loader.load()
    np.testing.assert_allclose(loader.magnitude, np.abs(loader.data))


def test_inject_synthetic_data_roundtrip():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8, 8), num_times=5)
    rng = np.random.default_rng(0)
    synth = (
        rng.normal(size=(3, 4, 16, 5)) + 1j * rng.normal(size=(3, 4, 16, 5))
    ).astype(np.complex128)
    out = inject_synthetic_data(ms, synth)
    assert isinstance(out, FakeMS)
    assert out is not ms  # template untouched
    loaded = MSLoader(out).load()
    np.testing.assert_allclose(loaded, synth)
    # template DATA unchanged
    orig = MSLoader(ms).load()
    assert not np.allclose(orig, synth)


def test_inject_replicate_single_spw_to_all():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8, 8), num_times=5)
    synth = np.full((3, 4, 8, 5), 7 + 0j)
    out = inject_synthetic_data(ms, synth)
    loaded = MSLoader(out).load()
    np.testing.assert_allclose(loaded[:, :, :8, :], synth)
    np.testing.assert_allclose(loaded[:, :, 8:, :], synth)


def test_inject_channel_mismatch_raises():
    ms = make_fake_ms(num_antennas=3, channels_per_spw=(8,), num_times=5)
    with pytest.raises(ValueError, match="Channel mismatch"):
        inject_synthetic_data(ms, np.zeros((3, 4, 12, 5), complex))


def test_end_to_end_ms_inference_roundtrip():
    """Config-5 shape: load -> preprocess (inference) -> flags -> save."""
    from rfi_toolbox_tpu.preprocess import Preprocessor
    from rfi_toolbox_tpu.preprocess import pipeline as P
    import jax.numpy as jnp

    ms = make_fake_ms(num_antennas=3, channels_per_spw=(128,), num_times=128,
                      seed=1)
    loader = MSLoader(ms)
    data = loader.load()  # (3, 4, 128, 128)
    # inject an artificial RFI stripe into the host data copy
    data[:, :, 60:64, :] *= 1000.0

    flat = jnp.asarray(data.reshape(-1, 128, 128).astype(np.complex64))
    flags = np.asarray(P.mad_flag_patches(flat, 5.0)).reshape(data.shape)
    assert flags[:, :, 60:64, :].mean() > 0.9  # stripe detected

    loader.save_flags(flags)
    back = loader.load_flags()
    np.testing.assert_array_equal(back, flags)


def test_load_time_major_row_order():
    """Real MSes store rows time-major (all baselines per integration,
    interleaved) — FakeMS is baseline-major, which would hide a grouping
    bug in the bulk per-SPW loader. Reorder the rows time-major and
    check load()/load_flags()/save_flags() still produce exactly the
    per-baseline-query results."""
    ms = make_fake_ms(num_antennas=4, channels_per_spw=(8, 8), num_times=5,
                      seed=3, skip_baselines=[(1, 2)])
    # time-major: sort rows by (FIELD, SPW, TIME, A1, A2)
    ms.rows.sort(key=lambda r: (r["FIELD_ID"], r["DATA_DESC_ID"], r["TIME"],
                                r["ANTENNA1"], r["ANTENNA2"]))

    loader = MSLoader(ms)
    data = loader.load()
    assert loader.antenna_baseline_map == [
        (0, 1), (0, 2), (0, 3), (1, 3), (2, 3)
    ]
    # every baseline x SPW block equals the targeted query's columns
    for b, (a1, a2) in enumerate(loader.antenna_baseline_map):
        for spw_idx, spw in enumerate(loader.spw_list):
            sub = ms.table().query(
                f"DATA_DESC_ID=={spw} && ANTENNA1=={a1} && ANTENNA2=={a2}"
            )
            np.testing.assert_array_equal(
                data[b, :, spw_idx * 8 : (spw_idx + 1) * 8, :],
                sub.getcol("DATA"),
            )

    # flags round trip through the bulk read-modify-write path
    flags = np.zeros_like(data, dtype=bool)
    flags[2, 1, 3, :] = True
    loader.save_flags(flags)
    back = loader.load_flags()
    np.testing.assert_array_equal(back, flags)
