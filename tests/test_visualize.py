"""Tests for the interactive Bokeh viewer (visualization/visualize.py).

The reference's dashboard (visualize.py:18-88) is the component being
claimed; until round 2 only the matplotlib fallback was covered. Bokeh
is not installable in this environment, so the viewer is driven two
ways: against a faithful in-memory stub of the exact Bokeh API surface
it uses (always runs — catches wiring drift in OUR code), and against
real Bokeh when available (skipped otherwise).
"""

import sys
import types

import numpy as np
import pytest

from rfi_toolbox_tpu.cli.generate_dataset import main as generate_main


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("viz_ds")
    generate_main([
        "--samples_training", "3", "--samples_validation", "1",
        "--output_dir", str(out), "--time_bins", "32",
        "--frequency_bins", "32", "--seed", "3", "--batch_size", "2",
    ])
    return out


# --- minimal stand-in for the bokeh API surface the viewer touches ----


class _ColumnDataSource:
    def __init__(self, data=None):
        self.data = dict(data or {})


class _Slider:
    def __init__(self, start, end, value, step, title):
        self.start, self.end, self.value, self.step = start, end, value, step
        self.title = title
        self.callbacks = []

    def on_change(self, attr, cb):
        assert attr == "value"
        self.callbacks.append(cb)

    def set_value(self, new):
        old, self.value = self.value, new
        for cb in self.callbacks:
            cb("value", old, new)


class _Figure:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.images = []

    def image(self, image=None, source=None, **kwargs):
        assert image in source.data, f"glyph key {image!r} not in source"
        self.images.append((image, source, kwargs))


class _Container:
    def __init__(self, *children):
        self.children = list(children)


def _install_bokeh_stub(monkeypatch):
    bokeh = types.ModuleType("bokeh")
    layouts = types.ModuleType("bokeh.layouts")
    layouts.column = _Container
    layouts.row = _Container
    models = types.ModuleType("bokeh.models")
    models.ColumnDataSource = _ColumnDataSource
    models.Slider = _Slider
    palettes = types.ModuleType("bokeh.palettes")
    palettes.Gray256 = ["#000000", "#ffffff"]
    palettes.Viridis256 = ["#440154", "#fde725"]
    plotting = types.ModuleType("bokeh.plotting")
    plotting.figure = _Figure
    for name, mod in [("bokeh", bokeh), ("bokeh.layouts", layouts),
                      ("bokeh.models", models), ("bokeh.palettes", palettes),
                      ("bokeh.plotting", plotting)]:
        monkeypatch.setitem(sys.modules, name, mod)


def _find(node, cls):
    """Depth-first collect of instances of cls in a layout tree."""
    found = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, cls):
            found.append(n)
        stack.extend(getattr(n, "children", []))
    return found


@pytest.mark.slow
def test_viewer_builds_and_slider_updates(tiny_dataset, monkeypatch):
    _install_bokeh_stub(monkeypatch)
    from rfi_toolbox_tpu.visualization.visualize import (
        create_interactive_viewer,
    )

    layout = create_interactive_viewer(str(tiny_dataset / "train"),
                                       num_samples=3, seed=0)

    sliders = _find(layout, _Slider)
    figures = _find(layout, _Figure)
    assert len(sliders) == 1 and len(figures) == 6
    slider = sliders[0]
    assert (slider.start, slider.end) == (0, 2)

    # every figure's glyph binds to the one shared source
    sources = {id(src) for fig in figures for (_, src, _) in fig.images}
    assert len(sources) == 1
    source = figures[0].images[0][1]
    assert set(source.data) == (
        {f"input_ch{i}" for i in range(4)} | {"mask", "prediction"}
    )

    before = {k: np.array(v[0]) for k, v in source.data.items()}
    slider.set_value(1)
    after = {k: np.array(v[0]) for k, v in source.data.items()}
    assert any(
        not np.array_equal(before[k], after[k])
        for k in before if k.startswith("input")
    ), "slider change did not update the source"
    # no model given -> prediction stays all-zero
    assert not after["prediction"].any()
    for k, v in after.items():
        assert v.shape == (32, 32), k


def test_viewer_prediction_channel_with_model(tiny_dataset, tmp_path,
                                              monkeypatch):
    """With a model snapshot, the prediction plane is the thresholded
    sigmoid forward of the current sample (a binary mask)."""
    _install_bokeh_stub(monkeypatch)
    from rfi_toolbox_tpu.models import create_model
    from rfi_toolbox_tpu.train import Trainer, export_params
    from rfi_toolbox_tpu.visualization.visualize import (
        create_interactive_viewer,
    )

    model = create_model("unet", init_features=4)
    trainer = Trainer(model)
    trainer.state = trainer._init_state((32, 32, 8))
    snap = tmp_path / "tiny_unet.npz"
    export_params(trainer.state, snap)

    layout = create_interactive_viewer(
        str(tiny_dataset / "train"), model_path=str(snap),
        num_samples=2, seed=0, init_features=4,
    )
    source = _find(layout, _Figure)[0].images[0][1]
    pred = np.array(source.data["prediction"][0])
    assert pred.shape == (32, 32)
    assert set(np.unique(pred)) <= {0.0, 1.0}

    _find(layout, _Slider)[0].set_value(1)
    pred2 = np.array(source.data["prediction"][0])
    assert pred2.shape == (32, 32)


def test_static_grid_snapshot_metadata_defaults(tiny_dataset, tmp_path):
    """save_static_grid reconstructs the model from .npz snapshot
    metadata (init_features + norm) — the CLI default init_features=32
    would otherwise shape-mismatch this f=4 GroupNorm snapshot."""
    from rfi_toolbox_tpu.models import create_model
    from rfi_toolbox_tpu.train import Trainer, export_params
    from rfi_toolbox_tpu.visualization.visualize import save_static_grid

    model = create_model("unet", init_features=4, norm="group")
    trainer = Trainer(model)
    trainer.state = trainer._init_state((32, 32, 8))
    snap = tmp_path / "tiny_gn.npz"
    export_params(trainer.state, snap,
                  metadata={"init_features": 4, "norm": "group"})

    out = save_static_grid(
        str(tiny_dataset / "train"), str(tmp_path / "grid.png"),
        model_path=str(snap), num_samples=1,
    )
    assert (tmp_path / "grid.png").exists(), out


def test_viewer_real_bokeh(tiny_dataset):
    """When real Bokeh is installed, the document actually builds."""
    pytest.importorskip("bokeh")
    from bokeh.document import Document

    from rfi_toolbox_tpu.visualization.visualize import (
        create_interactive_viewer,
    )

    layout = create_interactive_viewer(str(tiny_dataset / "train"),
                                       num_samples=2, seed=0)
    doc = Document()
    doc.add_root(layout)
    assert doc.roots
