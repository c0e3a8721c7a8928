"""In-memory Measurement Set backend for tests and CASA-free operation.

The reference's MS behavior is effectively untested because its suite
skips everything when casatools is absent (tests/test_ms_loader_fields.py,
SURVEY.md §4). This FakeMS implements the *exact* casatools ``table``
API subset the loader stack uses — ``open/close/nrows/getcol/putcol/
putcell/query/getdminfo/row indexing`` with casacore's (npol, nchan,
nrows) column layout and TaQL queries of the form
``DATA_DESC_ID==s && ANTENNA1==i && ANTENNA2==j [&& FIELD_ID==f]`` —
so MSLoader / inject_synthetic_data / save_flags run unmodified against
it and CI covers the full round trip.
"""

import re

import numpy as np

__all__ = ["FakeMS", "FakeTable", "make_fake_ms"]

_CLAUSE_RE = re.compile(r"\s*(\w+)\s*==\s*(-?\d+)\s*")


class FakeTable:
    """casatools.table-compatible view over FakeMS rows."""

    def __init__(self, ms, row_indices=None, subtable=None):
        self._ms = ms
        self._sub = subtable
        if subtable is None:
            self._rows = (
                np.arange(len(ms.rows)) if row_indices is None else row_indices
            )
        else:
            self._rows = None

    # -- lifecycle (no-ops; state lives in the FakeMS) --------------------
    def open(self, *a, **k):
        return True

    def close(self):
        return True

    def nrows(self):
        if self._sub is not None:
            return len(self._ms.subtables[self._sub]["rows"])
        return len(self._rows)

    # -- columns ----------------------------------------------------------
    def getcol(self, col):
        if self._sub is not None:
            rows = self._ms.subtables[self._sub]["rows"]
            return np.asarray([r[col] for r in rows])
        vals = [self._ms.rows[i][col] for i in self._rows]
        if col in ("DATA", "CORRECTED_DATA", "FLAG"):
            # casacore layout: cell dims first, row axis LAST
            return np.stack(vals, axis=-1)
        return np.asarray(vals)

    def putcol(self, col, arr):
        if self._sub is not None:
            raise ValueError("putcol on subtables not supported")
        arr = np.asarray(arr)
        n = len(self._rows)
        if arr.shape[-1] != n:
            raise ValueError(
                f"putcol: row axis {arr.shape[-1]} != {n} rows"
            )
        for k, i in enumerate(self._rows):
            self._ms.rows[i][col] = np.array(arr[..., k])

    def putcell(self, col, row, val):
        self._ms.rows[self._rows[row]][col] = np.array(val)

    def __getitem__(self, row_num):
        return self._ms.rows[self._rows[row_num]]

    # -- queries ----------------------------------------------------------
    def query(self, taql):
        """Supports conjunctions of <COL>==<int> clauses (the only form
        the loader stack emits, ms_loader.py:211-213)."""
        conditions = {}
        for clause in taql.split("&&"):
            m = _CLAUSE_RE.fullmatch(clause)
            if not m:
                raise ValueError(f"FakeMS cannot parse TaQL clause: {clause!r}")
            conditions[m.group(1)] = int(m.group(2))
        base = self._rows if self._rows is not None else np.arange(
            len(self._ms.rows)
        )
        sel = [
            i
            for i in base
            if all(self._ms.rows[i][c] == v for c, v in conditions.items())
        ]
        return FakeTable(self._ms, np.asarray(sel, dtype=int))

    def getdminfo(self):
        # CellShape reports the STORED per-row cell shape, layout and
        # all — exactly what casacore's hypercube spec records
        # (reference derives npol/nchan from it, ms_loader.py:103-122).
        npol, nchan = self._ms.num_pols, int(self._ms.channels_per_spw[0])
        cell = self._ms._to_layout(np.empty((npol, nchan), np.int8))
        return {
            "*1": {
                "COLUMNS": ["DATA", "FLAG"],
                "SPEC": {
                    "HYPERCUBES": {
                        "*1": {"CellShape": np.array(cell.shape)}
                    }
                },
            }
        }


class FakeMS:
    """In-memory measurement set.

    Args:
        num_antennas: antennas in the ANTENNA subtable.
        channels_per_spw: list of channel counts, one per SPW.
        num_times: integrations per (baseline, spw, field).
        num_pols: polarization count (default 4).
        field_ids: list of FIELD_IDs present (default [0]).
        seed: if not None, fill DATA with seeded complex noise.
        skip_baselines: optional set of (ant1, ant2) pairs with no rows
            (exercises the loader's baseline-skipping path,
            ms_loader.py:230-235).
        cell_layout: per-row cell orientation of DATA/FLAG columns.
            Real MSes are not uniform here — the reference shape-sniffs
            exactly these three layouts before injecting
            (/root/reference/rfi_toolbox/io/ms_injection.py:184-253):
            ``"pol_chan"`` (casacore default, (npol, nchan)),
            ``"chan_pol"`` (transposed, (nchan, npol)),
            ``"pol_chan_1"`` ((npol, nchan, 1) trailing singleton).
    """

    def __init__(
        self,
        num_antennas=4,
        channels_per_spw=(8,),
        num_times=16,
        num_pols=4,
        field_ids=(0,),
        seed=0,
        skip_baselines=(),
        cell_layout="pol_chan",
    ):
        self.num_antennas = num_antennas
        self.channels_per_spw = np.asarray(channels_per_spw, dtype=int)
        self.num_times = num_times
        self.num_pols = num_pols
        self.field_ids = list(field_ids)
        if cell_layout not in ("pol_chan", "chan_pol", "pol_chan_1"):
            raise ValueError(f"unknown cell_layout {cell_layout!r}")
        self.cell_layout = cell_layout
        rng = np.random.default_rng(seed) if seed is not None else None
        skip = {tuple(sorted(b)) for b in skip_baselines}

        self.subtables = {
            "ANTENNA": {
                "rows": [{"NAME": f"ant{i}"} for i in range(num_antennas)]
            },
            "SPECTRAL_WINDOW": {
                "rows": [
                    {"NUM_CHAN": int(nc)} for nc in self.channels_per_spw
                ]
            },
        }

        self.rows = []
        t0 = 5e9
        for field in self.field_ids:
            for spw, nchan in enumerate(self.channels_per_spw):
                for a1 in range(num_antennas):
                    for a2 in range(a1 + 1, num_antennas):
                        if (a1, a2) in skip:
                            continue
                        for t in range(num_times):
                            if rng is not None:
                                data = (
                                    rng.normal(size=(num_pols, nchan))
                                    + 1j * rng.normal(size=(num_pols, nchan))
                                ).astype(np.complex128)
                            else:
                                data = np.zeros(
                                    (num_pols, nchan), np.complex128
                                )
                            data = self._to_layout(data)
                            self.rows.append(
                                {
                                    "DATA_DESC_ID": spw,
                                    "ANTENNA1": a1,
                                    "ANTENNA2": a2,
                                    "FIELD_ID": field,
                                    "TIME": t0 + t,
                                    "DATA": data,
                                    "CORRECTED_DATA": data.copy(),
                                    "FLAG": self._to_layout(
                                        np.zeros((num_pols, nchan), bool)
                                    ),
                                }
                            )

    def _to_layout(self, cell):
        """Reorient a canonical (npol, nchan) cell into this MS's
        stored cell layout."""
        if self.cell_layout == "chan_pol":
            return cell.T.copy()
        if self.cell_layout == "pol_chan_1":
            return cell[..., None].copy()
        return cell

    def table(self, subtable=None):
        """Open the main table or a subtable ('ANTENNA', 'SPECTRAL_WINDOW')."""
        return FakeTable(self, subtable=subtable)

    def copy(self):
        """Deep copy (used by inject_synthetic_data as 'copytree')."""
        import copy

        return copy.deepcopy(self)


def make_fake_ms(
    num_antennas=4,
    channels_per_spw=(8,),
    num_times=16,
    num_pols=4,
    field_ids=(0,),
    seed=0,
    skip_baselines=(),
    cell_layout="pol_chan",
):
    """Convenience constructor."""
    return FakeMS(
        num_antennas=num_antennas,
        channels_per_spw=channels_per_spw,
        num_times=num_times,
        num_pols=num_pols,
        field_ids=field_ids,
        seed=seed,
        skip_baselines=skip_baselines,
        cell_layout=cell_layout,
    )
