"""FakeMS <-> casacore contract tests (round-2 verdict missing #1).

Every MS test in this repo runs against FakeMS; the casatools branches
of the loader stack assume casacore's column layout — in particular the
bulk grouping code indexes the row axis LAST
(``vis[:, :, rows]``, io/ms_loader.py load()). If FakeMS ever drifted
from casacore's layout, all tests would stay green while real-MS loads
silently corrupted. These tests pin FakeMS to a recorded fixture of the
casacore contract (tests/golden/casacore_contract.json, provenance
inside: casacore Fortran-ordered columns, reference usage at
/root/reference/rfi_toolbox/io/ms_loader.py:223-228, 475-480, 516-527)
so any drift fails HERE, CASA-free.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from rfi_toolbox_tpu.io.fake_ms import FakeMS

CONTRACT = json.loads(
    (Path(__file__).parent / "golden" / "casacore_contract.json").read_text()
)


@pytest.fixture()
def tiny_ms():
    cfg = CONTRACT["config"]
    return FakeMS(
        num_antennas=cfg["num_antennas"],
        channels_per_spw=tuple(cfg["channels_per_spw"]),
        num_times=cfg["num_times"],
        num_pols=cfg["num_pols"],
        seed=0,
    )


def test_getcol_shapes_match_recorded_contract(tiny_ms):
    """getcol on array columns returns (npol, nchan, nrow) — cell axes
    first, row axis last — exactly as casacore does."""
    want = CONTRACT["main_table"]
    tb = tiny_ms.table()
    assert tb.nrows() == want["nrows"]
    data = tb.getcol("DATA")
    assert list(data.shape) == want["DATA_shape"]
    assert data.dtype.kind == "c"
    flags = tb.getcol("FLAG")
    assert list(flags.shape) == want["FLAG_shape"]
    assert flags.dtype.kind == want["FLAG_dtype_kind"]
    ant1 = tb.getcol("ANTENNA1")
    assert list(np.shape(ant1)) == want["ANTENNA1_shape"]


def test_row_axis_is_last_semantically(tiny_ms):
    """The axis ORDER claim, not just the shape: marking row k's cell
    must surface at getcol(...)[..., k]. This is the exact assumption
    the bulk loader's ``vis[:, :, rows]`` grouping makes."""
    tb = tiny_ms.table()
    row_axis = CONTRACT["main_table"]["row_axis"]
    for k in range(tb.nrows()):
        cell = np.full(tuple(CONTRACT["getdminfo_cell_shape"]),
                       k + 1, np.complex128)
        tb.putcell("DATA", k, cell)
    data = tb.getcol("DATA")
    for k in range(tb.nrows()):
        np.testing.assert_array_equal(
            np.take(data, k, axis=row_axis).real, k + 1
        )


def test_putcol_expects_row_axis_last(tiny_ms):
    """putcol consumes the same (npol, nchan, nrow) layout casacore
    does (the reference writes spw_flags of shape (4, nchan, ntimes),
    ms_loader.py:516-527); a row-axis-first array must be rejected,
    not silently transposed into corrupt flags."""
    tb = tiny_ms.table()
    npol, nchan = CONTRACT["getdminfo_cell_shape"]
    nrow = tb.nrows()
    flags = np.zeros((npol, nchan, nrow), bool)
    flags[..., 1] = True  # only row 1 flagged
    tb.putcol("FLAG", flags)
    back = tb.getcol("FLAG")
    np.testing.assert_array_equal(back, flags)
    assert tiny_ms.rows[1]["FLAG"].all()
    assert not tiny_ms.rows[0]["FLAG"].any()

    if nrow != npol:  # a row-major layout is shape-detectable here
        with pytest.raises(ValueError, match="row axis"):
            tb.putcol("FLAG", np.zeros((nrow, npol, nchan), bool))


def test_getdminfo_cell_shape(tiny_ms):
    """The hypercube CellShape is the per-row cell (npol, nchan) —
    get_metadata derives pol/channel counts from it, exactly as the
    reference does (ms_loader.py:103-122)."""
    info = tiny_ms.table().getdminfo()
    hyper = next(iter(info.values()))["SPEC"]["HYPERCUBES"]
    cell = next(iter(hyper.values()))["CellShape"]
    assert list(np.asarray(cell)) == CONTRACT["getdminfo_cell_shape"]


def test_subtable_scalar_columns(tiny_ms):
    want = CONTRACT["subtables"]
    spw = tiny_ms.table("SPECTRAL_WINDOW")
    assert list(np.shape(spw.getcol("NUM_CHAN"))) == \
        want["SPECTRAL_WINDOW"]["NUM_CHAN_shape"]
    ant = tiny_ms.table("ANTENNA")
    assert list(np.shape(ant.getcol("NAME"))) == \
        want["ANTENNA"]["NAME_shape"]


@pytest.mark.parametrize("layout", ["pol_chan", "chan_pol", "pol_chan_1"])
def test_cell_layout_variants_match_recorded_contract(layout):
    """Real MSes carry transposed and trailing-singleton DATA cells
    (the reason the reference shape-sniffs before injecting,
    ms_injection.py:184-253); FakeMS must reproduce each recorded
    variant: stored cell shape, getcol shape (row axis still LAST),
    and the getdminfo CellShape."""
    cfg = CONTRACT["config"]
    want = CONTRACT["cell_layouts"][layout]
    ms = FakeMS(
        num_antennas=cfg["num_antennas"],
        channels_per_spw=tuple(cfg["channels_per_spw"]),
        num_times=cfg["num_times"],
        num_pols=cfg["num_pols"],
        seed=0,
        cell_layout=layout,
    )
    assert list(ms.rows[0]["DATA"].shape) == want["cell_shape"]
    tb = ms.table()
    assert list(tb.getcol("DATA").shape) == want["getcol_shape"]
    hyper = next(iter(tb.getdminfo().values()))["SPEC"]["HYPERCUBES"]
    cell = next(iter(hyper.values()))["CellShape"]
    assert list(np.asarray(cell)) == want["cell_shape"]


@pytest.mark.parametrize("layout", ["pol_chan", "chan_pol", "pol_chan_1"])
def test_injection_handles_every_recorded_cell_layout(layout):
    """End-to-end: inject_synthetic_data's shape sniffer must place the
    synthetic (npol, nchan, ntimes) visibilities correctly whatever the
    target MS's stored cell orientation (reference sniffing logic at
    ms_injection.py:184-253; this repo fixes its square-cell row-axis
    ambiguity by searching from the end)."""
    from rfi_toolbox_tpu.io import inject_synthetic_data

    npol, nchan, ntimes = 4, 8, 3
    ms = FakeMS(num_antennas=2, channels_per_spw=(nchan,),
                num_times=ntimes, num_pols=npol, seed=0,
                cell_layout=layout)
    synth = (
        np.arange(1 * npol * nchan * ntimes)
        .reshape(1, npol, nchan, ntimes)
        .astype(np.complex128)
    )
    out = inject_synthetic_data(ms, synth)
    for t, row in enumerate(out.rows):
        cell = row["DATA"]
        if layout == "chan_pol":
            cell = cell.T
        elif layout == "pol_chan_1":
            cell = cell[..., 0]
        np.testing.assert_array_equal(cell, synth[0, :, :, t])


@pytest.mark.parametrize("layout", ["pol_chan", "chan_pol", "pol_chan_1"])
def test_loader_round_trip_per_cell_layout(layout):
    """Full MSLoader surface against every recorded cell layout: load,
    load_flags, save_flags (read-modify-write restores the stored
    orientation), per-baseline load/save, metadata labels. The
    reference loader assumes (npol, nchan) and silently swaps axes on a
    transposed MS (ms_loader.py:103-122); this repo normalizes via
    _canonicalize_cells, so the values must be IDENTICAL across
    layouts."""
    from rfi_toolbox_tpu.io import MSLoader

    npol, nchan = 4, 8
    ref = None
    for seed_layout in ("pol_chan", layout):
        ms = FakeMS(num_antennas=3, channels_per_spw=(nchan, nchan),
                    num_times=5, num_pols=npol, seed=7,
                    cell_layout=seed_layout)
        ld = MSLoader(ms)
        data = ld.load()
        if ref is None:
            ref = data
    assert data.shape == (3, npol, 2 * nchan, 5)
    np.testing.assert_array_equal(data, ref)

    meta = ld.get_metadata()
    assert (meta["num_pols"], meta["num_channels"]) == (npol, nchan)

    flags = ld.load_flags()
    assert not flags.any()
    new = np.zeros_like(flags)
    new[1, 2, 3:11, :3] = True
    ld.save_flags(new)
    np.testing.assert_array_equal(ld.load_flags(), new)
    # stored cells keep the MS's own orientation after the write
    want = CONTRACT["cell_layouts"][layout]["cell_shape"]
    assert list(ms.rows[0]["FLAG"].shape) == want

    bl = ld.load_baseline(0, 1)
    np.testing.assert_array_equal(bl, data[0])
    single = ld.load_single_baseline(0, 1, pol_idx=2)
    np.testing.assert_array_equal(single, data[0, 2])
    blf = np.ones((npol, 2 * nchan, 5), bool)
    ld.save_baseline_flags(0, 2, blf)
    np.testing.assert_array_equal(ld.load_baseline_flags(0, 2), blf)
    assert list(ms.rows[0]["FLAG"].shape) == want


def test_bulk_loader_row_grouping_end_to_end():
    """End-to-end guard on the (npol, nchan, nrow) assumption: encode
    (baseline, time) into each row's DATA and confirm the bulk loader
    reassembles every value at the right (baseline, :, :, time) slot."""
    from rfi_toolbox_tpu.io import MSLoader

    ms = FakeMS(num_antennas=3, channels_per_spw=(4,), num_times=5,
                seed=None)
    pair_code = {}
    for i, row in enumerate(ms.rows):
        code = 100 * (10 * row["ANTENNA1"] + row["ANTENNA2"])
        t = int(row["TIME"] - 5e9)
        row["DATA"] = np.full((4, 4), code + t, np.complex128)
        pair_code[(row["ANTENNA1"], row["ANTENNA2"])] = code

    loader = MSLoader(ms)
    data = loader.load()
    for b, pair in enumerate(loader.antenna_baseline_map):
        for t in range(5):
            np.testing.assert_array_equal(
                data[b, :, :, t].real, pair_code[pair] + t
            )
    loader.close()
