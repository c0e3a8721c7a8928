"""Tests for the Flax UNet family."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfi_toolbox_tpu.models import (
    UNet,
    UNetBigger,
    UNetDifferentActivation,
    UNetOverfit,
    create_model,
)


def _init_and_apply(model, shape=(1, 32, 32, 3)):
    key = jax.random.key(0)
    x = jnp.ones(shape, jnp.float32)
    variables = model.init(key, x, train=False)
    out = model.apply(variables, x, train=False)
    return variables, out


def test_unet_output_shape():
    _, out = _init_and_apply(UNet(out_channels=1, init_features=8))
    assert out.shape == (1, 32, 32, 1)
    assert out.dtype == jnp.float32


def test_unet_bigger_depth5():
    model = UNetBigger(out_channels=1, init_features=4)
    variables, out = _init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 64, 64, 1)
    # 5 encoder stages + bottleneck + 5 decoders present
    names = " ".join(variables["params"].keys())
    assert names.count("Encoder") == 5 and names.count("Decoder") == 5


def test_unet_overfit_sigmoid_output():
    model = UNetOverfit(out_channels=1, init_features=4)
    _, out = _init_and_apply(model, (1, 64, 64, 3))
    out = np.asarray(out)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_unet_different_activation():
    model = UNetDifferentActivation(
        out_channels=1, init_features=4, activation=nn.leaky_relu
    )
    _, out = _init_and_apply(model)
    assert out.shape == (1, 32, 32, 1)


def test_unet_8_channel_input():
    # legacy .npy pipeline uses 8 channels (4 pols x re/im)
    _, out = _init_and_apply(UNet(init_features=4), (2, 32, 32, 8))
    assert out.shape == (2, 32, 32, 1)


def test_bfloat16_compute_keeps_f32_io():
    model = UNet(init_features=4, dtype=jnp.bfloat16)
    variables, out = _init_and_apply(model)
    assert out.dtype == jnp.float32
    kernel = variables["params"]["Encoder_0"]["DoubleConv_0"]["Conv_0"]["kernel"]
    assert kernel.dtype == jnp.float32  # params stay f32


def test_batch_stats_update_in_train_mode():
    model = UNet(init_features=4)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    variables = model.init(key, x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["Encoder_0"]["DoubleConv_0"]["BatchNorm_0"]["mean"]
    after = mutated["batch_stats"]["Encoder_0"]["DoubleConv_0"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_create_model_registry():
    assert isinstance(create_model("unet"), UNet)
    assert isinstance(create_model("unet_bigger"), UNetBigger)
    assert isinstance(create_model("unet_overfit"), UNetOverfit)
    assert isinstance(create_model("unet_activation"), UNetDifferentActivation)
    with pytest.raises(ValueError, match="Unknown model type"):
        create_model("nope")


@pytest.mark.slow
def test_norm_variants_forward_and_grad():
    """norm='group'/'none' carry no batch_stats collection and are
    trainable (beyond-reference TPU fast modes; 'batch' is the parity
    default)."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    for norm in ("group", "none"):
        model = create_model("unet", init_features=4, norm=norm)
        variables = model.init(key, x, train=False)
        assert set(variables) == {"params"}  # no running stats

        def loss(p):
            out = model.apply({"params": p}, x, train=True)
            return jnp.mean(out**2)

        g = jax.grad(loss)(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(v)))
                   for v in jax.tree.leaves(g))
    with pytest.raises(ValueError, match="unknown norm"):
        UNet(init_features=4, norm="layer").init(key, x)


def test_groupnorm_train_eval_consistent():
    """norm='group' computes identical outputs in train and eval mode —
    the property whose absence makes BatchNorm's running-stats
    calibration unstable on heavy-tailed RFI data (BASELINE.md round-3
    finding: 64k-step coherent run hit IoU 0.90 in train mode but
    oscillated 0.51-0.86 in eval mode)."""
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 32, 32, 3))
    model = create_model("unet", init_features=4, norm="group")
    variables = model.init(key, x, train=False)
    out_eval = model.apply(variables, x, train=False)
    out_train = model.apply(variables, x, train=True)
    np.testing.assert_array_equal(np.asarray(out_eval),
                                  np.asarray(out_train))


def test_convtranspose2x2_bit_matches_flax(rng):
    """The matmul + pixel-shuffle upsample is BIT-exact vs
    nn.ConvTranspose (2x2, stride 2) with identical params, and its
    init draws the same kernel (same scope path + initializer), so
    pre-existing checkpoints/snapshots are unaffected."""
    from rfi_toolbox_tpu.models.unet import ConvTranspose2x2

    x = jnp.asarray(rng.normal(size=(2, 5, 7, 3)).astype(np.float32))
    ref = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    vref = ref.init(jax.random.key(1), x)
    mine = ConvTranspose2x2(4)
    np.testing.assert_array_equal(
        np.asarray(ref.apply(vref, x)), np.asarray(mine.apply(vref, x))
    )
    vmine = mine.init(jax.random.key(1), x)
    np.testing.assert_array_equal(
        np.asarray(vref["params"]["kernel"]),
        np.asarray(vmine["params"]["kernel"]),
    )
    assert vref["params"]["bias"].shape == vmine["params"]["bias"].shape


def test_fold_batchnorm_parity(rng):
    """Folded norm='none' model reproduces the eval-mode BatchNorm
    forward to float rounding, with non-trivial running stats."""
    from rfi_toolbox_tpu.models import UNet, fold_batchnorm

    model = UNet(out_channels=1, init_features=4, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    # make the running stats non-trivial so folding is load-bearing
    stats = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.abs(rng.normal(0.5, 0.2, a.shape)).astype(a.dtype)),
        variables["batch_stats"],
    )
    want = model.apply(
        {"params": variables["params"], "batch_stats": stats},
        x, train=False,
    )
    fmodel, fparams = fold_batchnorm(model, variables["params"], stats)
    assert fmodel.norm == "none"
    got = fmodel.apply({"params": fparams}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_fold_batchnorm_rejects_groupnorm():
    from rfi_toolbox_tpu.models import UNet, fold_batchnorm

    model = UNet(init_features=4, norm="group")
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    with pytest.raises(ValueError, match="norm='batch'"):
        fold_batchnorm(model, variables["params"], {})


def test_space_to_depth_roundtrip(rng):
    from rfi_toolbox_tpu.models import depth_to_space, space_to_depth

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 3)).astype(np.float32))
    packed = space_to_depth(x)
    assert packed.shape == (2, 4, 3, 12)
    # 2x2 block (0:2, 0:2) of channel c lands in channels [c, c+3, c+6, c+9]?
    # Layout contract: block-row-major within the packed channel axis.
    np.testing.assert_array_equal(
        np.asarray(packed[0, 0, 0].reshape(2, 2, 3)),
        np.asarray(x[0, 0:2, 0:2, :]),
    )
    np.testing.assert_array_equal(np.asarray(depth_to_space(packed)),
                                  np.asarray(x))


@pytest.mark.slow
def test_unet_space_to_depth_variant(rng):
    """MXU-packed UNet (opt-in, beyond reference): full-resolution
    output, one fewer resolution level, outermost stage at 2f channels,
    gradients flow, and the packed model is strictly cheaper per step
    (fewer params at the outer stages, quarter the outer-stage spatial
    work)."""
    from rfi_toolbox_tpu.models import UNet

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    model = UNet(out_channels=1, init_features=8, norm="group",
                 space_to_depth=True)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 1)

    # 3 encoder stages (depth-1) + bottleneck + 3 decoders
    enc_names = [k for k in variables["params"] if k.startswith("Encoder")]
    dec_names = [k for k in variables["params"] if k.startswith("Decoder")]
    assert len(enc_names) == 3 and len(dec_names) == 3
    # outermost encoder runs at 2f channels on the packed grid
    first_kernel = variables["params"]["Encoder_0"]["DoubleConv_0"][
        "Conv_0"]["kernel"]
    assert first_kernel.shape == (3, 3, 12, 16)  # 4*3 in, 2*8 out

    def loss(p):
        return (model.apply({"params": p}, x, train=False) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
