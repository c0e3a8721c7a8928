"""CoherentTrainer: the productized coherent-8ch training recipe.

Locks the conventions the shipped pretrained snapshots depend on:
channel order, per-sample robust scale, held-out key stream, EMA
weights, and checkpoint-continuation (resume == uninterrupted run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfi_toolbox_tpu.train import CoherentTrainer, coherent_batch, load_params

# every test here trains, gates pretrained snapshots, or spawns subprocesses
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_fit():
    tr = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2)
    out = tr.fit(num_steps=6, fused_steps=3, log_every=3)
    return tr, out["history"]


@pytest.fixture(scope="module")
def tiny_trainer(tiny_fit):
    return tiny_fit[0]


def test_fit_runs_and_logs(tiny_fit):
    tr, history = tiny_fit
    assert tr.step == 6
    assert history and all(np.isfinite(h["loss"]) for h in history)
    assert history[-1]["step"] == 6
    # EMA tree exists and has drifted from a pure copy of params
    deltas = [
        float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
        for e, p in zip(jax.tree.leaves(tr.ema_params),
                        jax.tree.leaves(tr.params))
    ]
    assert max(deltas) > 0  # params moved away from the slow EMA


def test_evaluate_threshold_sweep(tiny_trainer):
    rep = tiny_trainer.evaluate(num_batches=1, eval_batch=2,
                                thresholds=[0.3, 0.5])
    assert set(rep) == {"best_threshold", "best_iou", "ious"}
    assert rep["best_threshold"] in (0.3, 0.5)
    assert 0.0 <= rep["best_iou"] <= 1.0
    # TTA path runs and returns the same schema
    rep_tta = tiny_trainer.evaluate(num_batches=1, eval_batch=2,
                                    thresholds=[0.5], tta=True)
    assert 0.0 <= rep_tta["best_iou"] <= 1.0


def test_export_snapshot_contract(tiny_trainer, tmp_path):
    """The exported metadata carries every key the pretrained gates and
    the evaluate CLI read (tests/test_pretrained.py, serving.py)."""
    path = tiny_trainer.export(tmp_path / "m.npz", best_threshold=0.4)
    params, stats, meta = load_params(path)
    assert meta["in_channels"] == 8
    assert meta["normalization"] == "robust_scale"
    assert meta["normalization_scope"] == "per_sample"
    assert meta["train_size"] == [32, 32]
    assert meta["best_threshold"] == 0.4
    assert meta["init_features"] == 4
    # EMA weights shipped by default
    for e, p in zip(jax.tree.leaves(tiny_trainer.ema_params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    # directly applicable
    out = tiny_trainer.model.apply(
        {"params": params, "batch_stats": stats},
        np.zeros((1, 32, 32, 8), np.float32), train=False,
    )
    assert out.shape == (1, 32, 32, 1)


def test_groupnorm_trainer_roundtrip(tmp_path):
    """norm='group' trains (no batch_stats collection — BatchNorm's
    running-stats calibration is unstable on this heavy-tailed task,
    BASELINE.md round-3 notes), records norm in export metadata, and
    load() reconstructs the GroupNorm model from it."""
    tr = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2,
                         norm="group")
    tr.fit(num_steps=2, fused_steps=2)
    assert tr.batch_stats == {}
    path = tr.export(tmp_path / "gn.npz", best_threshold=0.5)
    _, stats, meta = load_params(path)
    assert meta["norm"] == "group"
    assert stats == {}
    loaded = CoherentTrainer.load(path)
    assert loaded.model.norm == "group"
    rep = loaded.evaluate(num_batches=1, eval_batch=1,
                          thresholds=[0.5])
    assert 0.0 <= rep["best_iou"] <= 1.0


def test_space_to_depth_trainer_roundtrip(tmp_path):
    """space_to_depth=True (the MXU-packed variant) trains, records the
    flag in export metadata, and load() + CompiledPredictor.from_snapshot
    reconstruct the packed architecture from it — the snapshot is
    self-describing like norm/init_features."""
    from rfi_toolbox_tpu.serving import CompiledPredictor

    tr = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2,
                         norm="group", space_to_depth=True)
    assert tr.model.space_to_depth
    tr.fit(num_steps=2, fused_steps=2)
    path = tr.export(tmp_path / "s2d.npz", best_threshold=0.5)
    _, _, meta = load_params(path)
    assert meta["space_to_depth"] is True
    assert meta["norm"] == "group"
    loaded = CoherentTrainer.load(path)
    assert loaded.model.space_to_depth
    rep = loaded.evaluate(num_batches=1, eval_batch=1, thresholds=[0.5])
    assert 0.0 <= rep["best_iou"] <= 1.0
    pred = CompiledPredictor.from_snapshot(path, batch_size=1,
                                           input_shape=(32, 32, 8))
    assert pred._model.space_to_depth
    flags = pred(np.zeros((1, 32, 32, 8), np.float32))
    assert np.asarray(flags).shape == (1, 32, 32)


def test_evaluate_cli_coherent_sweep(tmp_path, capsys):
    """evaluate_rfi_model --coherent runs the held-out simulator sweep
    from a snapshot (CLI parity for the pretrained-gate convention)."""
    from rfi_toolbox_tpu.cli.evaluate_model import main

    tr = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2,
                         norm="group")
    tr.fit(num_steps=2, fused_steps=2)
    path = tr.export(tmp_path / "tiny.npz", best_threshold=0.5)

    results = main(["--model_path", str(path), "--coherent",
                    "--num_images", "2", "--batch_size", "2",
                    "--device", "cpu"])
    assert 0.0 <= results["best_iou"] <= 1.0
    out = capsys.readouterr().out
    assert "Coherent held-out IoU sweep" in out
    assert "best:" in out

    # an explicit --threshold restricts the sweep to that one point
    single = main(["--model_path", str(path), "--coherent",
                   "--num_images", "2", "--batch_size", "2",
                   "--threshold", "0.4", "--device", "cpu"])
    assert list(single["ious"]) == [0.4]
    assert single["best_threshold"] == 0.4

    # snapshot metadata governs the model in --coherent mode
    with pytest.raises(SystemExit):
        main(["--model_path", str(path), "--coherent",
              "--init_features", "8", "--device", "cpu"])


def test_calibration_gap_zero_for_groupnorm():
    """calibration_gap (the BatchNorm health check that exposed the
    64k eval-mode collapse) is exactly 0 for GroupNorm models — train
    and eval modes are the same function."""
    tr = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2,
                         norm="group")
    tr.fit(num_steps=2, fused_steps=2)
    rep = tr.calibration_gap(num_batches=1, eval_batch=2,
                             thresholds=[0.4, 0.5])
    assert rep["gap"] == 0.0
    assert rep["eval_mode"]["ious"] == rep["train_mode"]["ious"]


def test_calibration_gap_reports_batchnorm_delta():
    """For a BatchNorm model the two modes are different functions —
    the report carries both sweeps (a barely-trained model's gap is
    just required to be finite and the structure complete)."""
    tr = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2)
    tr.fit(num_steps=2, fused_steps=2)
    rep = tr.calibration_gap(num_batches=1, eval_batch=2,
                             thresholds=[0.5])
    assert set(rep) == {"gap", "eval_mode", "train_mode"}
    assert np.isfinite(rep["gap"])


def test_checkpoint_resume_continues_identically(tmp_path):
    """restore_checkpoint + fit == uninterrupted fit: same optimizer
    state, same EMA, same sample key stream (fold_in by step index)."""
    a = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2)
    a.fit(num_steps=4, fused_steps=2)
    a.save_checkpoint(tmp_path / "ck")
    a.fit(num_steps=4, fused_steps=2)

    b = CoherentTrainer(init_features=4, size=32, batch_size=2, seed=2)
    b.restore_checkpoint(tmp_path / "ck", num_steps_hint=8)
    assert b.step == 4
    b.fit(num_steps=4, fused_steps=2)

    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree.leaves(a.ema_params),
                    jax.tree.leaves(b.ema_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_dp_mesh_matches_single_device(tmp_path):
    """CoherentTrainer(mesh=...) shards per-sample generation + fwd/bwd
    over 'data' with replicated state; the key stream is unchanged, so
    the dp run reproduces the single-device trajectory exactly."""
    from rfi_toolbox_tpu.parallel.mesh import make_mesh

    single = CoherentTrainer(init_features=4, size=32, batch_size=4, seed=3)
    single.fit(num_steps=4, fused_steps=2)

    mesh = make_mesh(shape=(2,), axis_names=("data",),
                     devices=jax.devices()[:2])
    dp = CoherentTrainer(init_features=4, size=32, batch_size=4, seed=3,
                         mesh=mesh)
    dp.fit(num_steps=4, fused_steps=2)

    for leaf in jax.tree.leaves(dp.params):
        assert len(leaf.sharding.device_set) == 2  # lives on the mesh
    for x, y in zip(jax.tree.leaves(single.params),
                    jax.tree.leaves(dp.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="divide"):
        CoherentTrainer(init_features=4, size=32, batch_size=3, mesh=mesh)


def test_coherent_batch_matches_gate_convention():
    """coherent_batch IS the pretrained-gate construction
    (tests/test_pretrained.py::_coherent8ch_batch): same key -> same
    normalized values, channel order 4 pols x (re, im), per-sample
    median/IQR scale over all channels jointly."""
    from rfi_toolbox_tpu.synth.simulator import RFISimulator

    key, n, size = jax.random.key(7), 2, 32
    x, gt = coherent_batch(key, n, size)
    assert x.shape == (n, size, size, 8) and x.dtype == jnp.float32
    assert gt.shape == (n, size, size) and gt.dtype == jnp.bool_

    sim = RFISimulator(time_bins=size, freq_bins=size, seed=0)
    tf, mask = jax.vmap(sim.generate_rfi_device)(jax.random.split(key, n))
    ref = jnp.stack(
        [tf[:, 0].real, tf[:, 0].imag, tf[:, 1].real, tf[:, 1].imag,
         tf[:, 2].real, tf[:, 2].imag, tf[:, 3].real, tf[:, 3].imag],
        axis=-1,
    )
    flat = ref.reshape(n, -1)
    med = jnp.median(flat, axis=1)
    iqr = (jnp.percentile(flat, 75, axis=1)
           - jnp.percentile(flat, 25, axis=1))
    ref = (ref - med[:, None, None, None]) / jnp.maximum(
        iqr[:, None, None, None], 1e-12
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(mask) > 0.5)
