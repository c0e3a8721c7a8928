"""AOT-compiled serving predictor tests."""

import numpy as np
import pytest

from rfi_toolbox_tpu.serving import CompiledPredictor


@pytest.fixture(scope="module")
def predictor():
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import create_train_state

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3))
    return CompiledPredictor(
        model, state.params, state.batch_stats,
        input_shape=(32, 32, 3), batch_size=4,
    ), model, state


def test_compiled_matches_eager(predictor, rng):
    import jax

    pred, model, state = predictor
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    got = pred(x)
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False,
    )
    want = np.asarray(jax.nn.sigmoid(logits[..., 0]) > 0.5)
    np.testing.assert_array_equal(got, want)


def test_partial_and_multi_chunk_batches(predictor, rng):
    pred, _, _ = predictor
    for n in (1, 3, 4, 7, 9):
        x = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
        out = pred(x)
        assert out.shape == (n, 32, 32) and out.dtype == bool
    assert pred(np.zeros((0, 32, 32, 3), np.float32)).shape == (0, 32, 32)


def test_tta_matches_flip_averaged_reference(predictor, rng):
    """tta=True compiles the flip-averaged forward: output equals the
    hand-rolled D2 average of the plain predictor's probabilities."""
    import jax

    _, model, state = predictor
    pred_tta = CompiledPredictor(
        model, state.params, state.batch_stats,
        input_shape=(32, 32, 3), batch_size=4, tta=True,
    )
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)

    def probs(a):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            a, train=False,
        )
        return np.asarray(jax.nn.sigmoid(logits[..., 0]))

    want_mean = (
        probs(x)
        + probs(x[:, ::-1])[:, ::-1]
        + probs(x[:, :, ::-1])[:, :, ::-1]
        + probs(x[:, ::-1, ::-1])[:, ::-1, ::-1]
    ) / 4
    np.testing.assert_array_equal(pred_tta(x), want_mean > 0.5)


def test_shape_mismatch_raises(predictor):
    pred, _, _ = predictor
    with pytest.raises(ValueError, match="expected"):
        pred(np.zeros((2, 16, 16, 3), np.float32))


def test_device_input_stays_on_device(predictor, rng):
    """A jax.Array request runs the device-resident path: the result is
    a device array, bit-identical to the host-numpy path, for full,
    partial, multi-chunk, and empty batches."""
    import jax
    import jax.numpy as jnp

    pred, _, _ = predictor
    for n in (1, 3, 4, 7, 9):
        x = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
        dev = pred(jnp.asarray(x))
        assert isinstance(dev, jax.Array) and dev.dtype == bool
        assert dev.shape == (n, 32, 32)
        np.testing.assert_array_equal(np.asarray(dev), pred(x))
    empty = pred(jnp.zeros((0, 32, 32, 3), jnp.float32))
    assert isinstance(empty, jax.Array) and empty.shape == (0, 32, 32)
    with pytest.raises(ValueError, match="expected"):
        pred(jnp.zeros((2, 16, 16, 3), jnp.float32))


def test_flag_waterfalls_coherent_device_predictor(rng):
    """flag_waterfalls_coherent + CompiledPredictor: the patches the
    flagger computes on device go straight into the compiled forward
    (no host numpy bounce), and the flags match the host-path result."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.io import flag_waterfalls_coherent
    from rfi_toolbox_tpu.io.flagging import _coherent_images
    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import create_train_state

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 8))
    pred = CompiledPredictor(
        model, state.params, state.batch_stats,
        input_shape=(32, 32, 8), batch_size=4,
    )
    vis = (rng.normal(1.0, 0.1, (2, 4, 32, 32))
           * np.exp(1j * rng.uniform(0, 6.28, (2, 4, 32, 32)))
           ).astype(np.complex64)
    flags = flag_waterfalls_coherent(vis, pred, patch_size=32)
    assert isinstance(flags, jax.Array) and flags.shape == (2, 32, 32)
    host = pred(np.asarray(_coherent_images(jnp.asarray(vis), 32)))
    np.testing.assert_array_equal(np.asarray(flags)[0], host[0])


def test_mesh_sharded_input_resharded_to_compiled_device(predictor, rng):
    """A NamedSharding-committed request (what flag_waterfalls hands
    over under mesh=...) must not crash the AOT executable: the
    predictor reshards to the compiled single-device placement and
    returns the same flags as host input (advisor round-3 high)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from rfi_toolbox_tpu.parallel import make_mesh

    pred, _, _ = predictor
    mesh = make_mesh(shape=(4,), axis_names=("data",),
                     devices=jax.devices()[:4])
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, PartitionSpec("data")))
    out = pred(sharded)
    assert isinstance(out, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), pred(x))


def test_flag_waterfalls_mesh_model_predictor(rng):
    """flag_waterfalls(method='model', mesh=...) end to end with a
    CompiledPredictor — the exact advertised combination the round-3
    jax.Array fast path broke."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.io import flag_waterfalls
    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.parallel import make_mesh
    from rfi_toolbox_tpu.train import create_train_state

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3))
    pred = CompiledPredictor(
        model, state.params, state.batch_stats,
        input_shape=(32, 32, 3), batch_size=4,
    )
    vis = (rng.normal(1.0, 0.1, (4, 64, 64))).astype(np.complex64)
    plain = np.asarray(flag_waterfalls(
        vis, method="model", predictor=pred, patch_size=32))
    mesh = make_mesh(shape=(4,), axis_names=("data",),
                     devices=jax.devices()[:4])
    meshed = np.asarray(flag_waterfalls(
        vis, method="model", predictor=pred, patch_size=32, mesh=mesh))
    np.testing.assert_array_equal(plain, meshed)


def test_plugs_into_flag_waterfalls(predictor, rng):
    from rfi_toolbox_tpu.io import flag_waterfalls

    pred, _, _ = predictor
    vis = (rng.normal(1.0, 0.1, (2, 32, 32))).astype(np.complex64)
    flags = np.asarray(
        flag_waterfalls(vis, method="model", predictor=pred, patch_size=32)
    )
    assert flags.shape == (2, 32, 32)


def test_from_snapshot(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import create_train_state, export_params

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 3))
    export_params(state, tmp_path / "m.npz", metadata={"init_features": 4})
    pred = CompiledPredictor.from_snapshot(
        tmp_path / "m.npz", input_shape=(32, 32, 3), batch_size=2,
    )
    out = pred(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    assert out.shape == (3, 32, 32)


def test_from_snapshot_defaults_from_metadata(tmp_path, rng):
    """Snapshot metadata drives the compiled input channels and the
    sigmoid threshold: loading an 8-channel snapshot (e.g.
    unet16_coherent8ch) must not require restating its training
    configuration."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import create_train_state, export_params

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, 128, 128, 8))
    export_params(state, tmp_path / "m8.npz",
                  metadata={"init_features": 4, "in_channels": 8,
                            "best_threshold": 0.3})
    pred = CompiledPredictor.from_snapshot(tmp_path / "m8.npz", batch_size=2)
    assert pred.input_shape == (128, 128, 8)
    assert pred.threshold == 0.3
    out = pred(rng.normal(size=(2, 128, 128, 8)).astype(np.float32))
    assert out.shape == (2, 128, 128)
    # explicit kwargs still win over metadata
    pred2 = CompiledPredictor.from_snapshot(
        tmp_path / "m8.npz", input_shape=(64, 64, 8), batch_size=1,
        threshold=0.7,
    )
    assert pred2.input_shape == (64, 64, 8) and pred2.threshold == 0.7
