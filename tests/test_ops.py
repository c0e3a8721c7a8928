"""Parity tests for the Pallas kernels (interpret mode on CPU) against
the jnp reference pipeline."""

import numpy as np
import pytest

from rfi_toolbox_tpu.ops import (
    fused_extract_channel_planes,
    fused_extract_channels,
    fused_gather_extract,
    mad_flag_patches_pallas,
)
from rfi_toolbox_tpu.preprocess import pipeline as P


def _complex_patches(rng, n=2, h=64, w=64, with_rfi=True):
    amp = rng.uniform(0.5, 2.0, (n, h, w))
    if with_rfi:
        amp[:, 10:12, :] = 2e6
    phase = rng.uniform(0, 2 * np.pi, (n, h, w))
    return (amp * np.exp(1j * phase)).astype(np.complex64)


def test_fused_channels_parity(rng):
    patches = _complex_patches(rng)
    got = np.asarray(fused_extract_channels(patches, interpret=True))
    want = np.asarray(P.imagenet_normalize(P.extract_channels(patches)))
    assert got.shape == want.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_channels_real_input(rng):
    patches = rng.uniform(0.1, 10.0, (2, 32, 32)).astype(np.float32)
    got = np.asarray(fused_extract_channels(patches, interpret=True))
    # real input treated as zero imaginary part: phase == 0 -> norm 0.5,
    # then ImageNet affine
    expected_phase = (0.5 - 0.406) / 0.225
    np.testing.assert_allclose(got[..., 2], expected_phase, atol=1e-5)


def test_fused_channel_planes_parity(rng):
    patches = _complex_patches(rng)
    g_got, l_got, p_got = fused_extract_channel_planes(
        patches, interpret=True)
    g_want, l_want, p_want = P.extract_channel_planes(patches)
    assert np.shape(g_got) == (3, 2, 64, 64)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(l_got), np.asarray(l_want),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_want),
                               atol=2e-5)


def test_fused_gather_extract_parity(rng):
    """The gather-fused kernel equals take-from-the-planes at every
    (base_idx, variant) combination — the planes are just never
    materialized. Tolerance covers per-program FMA contraction (the
    same ~1e-6 rounding class the static-prep parity tests carry)."""
    import jax.numpy as jnp

    patches = _complex_patches(rng, n=5, h=32, w=32)
    k = 17
    base_idx = rng.integers(0, 5, size=k).astype(np.int32)
    pidx = rng.integers(0, 3, size=k).astype(np.int32)
    g, lp, ph = fused_gather_extract(
        jnp.asarray(patches), jnp.asarray(base_idx), jnp.asarray(pidx),
        interpret=True)
    grad3, logp, phase = P.extract_channel_planes(jnp.asarray(patches))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(grad3)[pidx, base_idx], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(logp)[base_idx], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ph), np.asarray(phase)[base_idx], atol=2e-5)


def test_fused_plane_gather_transform_parity(rng):
    """The pure-DMA epilogue kernel (plane gather + in-VMEM variant
    transform) is BIT-exact vs plane-take followed by the jnp
    flip/transpose epilogue: it moves values, it computes nothing."""
    import jax.numpy as jnp

    from rfi_toolbox_tpu.ops import fused_plane_gather_transform
    from rfi_toolbox_tpu.preprocess.static_prep import (
        _VARIANT_GRAD_PLANE,
        _transform_by_variant,
    )

    patches = _complex_patches(rng, n=5, h=32, w=32)
    k = 19
    base_idx = rng.integers(0, 5, size=k).astype(np.int32)
    v = rng.integers(0, 4, size=k).astype(np.int32)
    planes = P.extract_channel_planes(jnp.asarray(patches))
    pidx = jnp.asarray(_VARIANT_GRAD_PLANE[v])
    g, lp, ph = fused_plane_gather_transform(
        planes, jnp.asarray(base_idx), pidx, jnp.asarray(v),
        interpret=True)
    grad3, logp, phase = planes
    vj = jnp.asarray(v)
    np.testing.assert_array_equal(
        np.asarray(g),
        np.asarray(_transform_by_variant(
            jnp.asarray(np.asarray(grad3)[np.asarray(pidx), base_idx]), vj)))
    np.testing.assert_array_equal(
        np.asarray(lp),
        np.asarray(_transform_by_variant(
            jnp.asarray(np.asarray(logp)[base_idx]), vj)))
    np.testing.assert_array_equal(
        np.asarray(ph),
        np.asarray(_transform_by_variant(
            jnp.asarray(np.asarray(phase)[base_idx]), vj)))


def test_static_prep_extract_planes_parity(rng):
    """extract='planes' (Pallas epilogue kernel) produces the same
    selection as extract='base'; on CPU the kernel path can't run
    (no interpret flag through the jitted program), so this pins the
    MODE VALIDATION + jnp fall-through for real input instead."""
    from rfi_toolbox_tpu.preprocess.static_prep import make_static_prep_fn

    with pytest.raises(ValueError, match="unknown extract mode"):
        make_static_prep_fn(16, 8, 4, extract="nope")
    # real (non-complex) input routes past the Pallas branch even with
    # use_pallas=True — identical to extract='base'
    wf = rng.normal(size=(1, 64, 64)).astype(np.float32)
    fl = (rng.random((1, 64, 64)) > 0.7).astype(np.float32)
    import jax

    key = jax.random.key(0)
    a = make_static_prep_fn(16, 8, 4, flags_mode="custom", use_pallas=True,
                            extract="planes")(wf, fl, key)
    b = make_static_prep_fn(16, 8, 4, flags_mode="custom", use_pallas=True,
                            extract="base")(wf, fl, key)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_channel_planes_match_transform_then_extract(rng):
    """The load-bearing identity of the extract-before-gather path: the
    gradient plane of each variant, flip/transposed AFTER extraction,
    equals extracting on the flip/transposed patch (the materialized
    order). Squared diffs erase the sign and min/max are order-exact,
    so the raw values are bit-equal; the only tolerance is jit-fusion
    rounding of the normalize/affine chain across the two separately
    jitted programs (~1e-6, the same class as the static-prep atan2
    note)."""
    import jax.numpy as jnp

    patches = jnp.asarray(_complex_patches(rng, n=3))
    grad3, logp, phase = P.extract_channel_planes(patches)

    variants = {
        0: (lambda x: x, 0),                      # id
        1: (lambda x: x[:, ::-1], 1),             # flipud
        2: (lambda x: jnp.swapaxes(x, 1, 2), 0),  # T
        3: (lambda x: jnp.swapaxes(x, 1, 2)[:, ::-1], 2),  # flipud.T
    }
    for v, (tf, plane) in variants.items():
        want = np.asarray(
            P.imagenet_normalize(P.extract_channels(tf(patches))))
        got = np.stack(
            [np.asarray(tf(grad3[plane])), np.asarray(tf(logp)),
             np.asarray(tf(phase))], axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_mad_flags_parity(rng):
    patches = rng.normal(1.0, 0.1, (3, 64, 64)).astype(np.float32)
    patches[0, 5:7, :] = 60.0
    patches[1, :, 9] = -40.0
    got = np.asarray(mad_flag_patches_pallas(patches, 5.0, interpret=True))
    want = np.asarray(P.mad_flag_patches(patches, 5.0))
    np.testing.assert_array_equal(got, want)


def test_mad_flags_complex_parity(rng):
    patches = _complex_patches(rng, n=2)
    got = np.asarray(mad_flag_patches_pallas(patches, 5.0, interpret=True))
    want = np.asarray(P.mad_flag_patches(patches, 5.0))
    np.testing.assert_array_equal(got, want)


def test_mad_flags_exact_median_selection(rng):
    """Radix-select must produce numpy's exact median (mean of middle
    two for even counts) — verify through the threshold boundary."""
    # craft a patch where median/MAD are known exactly
    base = np.full((1, 8, 8), 10.0, np.float32)
    base[0, 0, :4] = 20.0  # a few outliers
    got = np.asarray(mad_flag_patches_pallas(base, 5.0, interpret=True))
    want = np.asarray(P.mad_flag_patches(base, 5.0))
    np.testing.assert_array_equal(got, want)


def test_mad_flags_with_nans(rng):
    patches = rng.normal(1.0, 0.1, (1, 32, 32)).astype(np.float32)
    patches[0, 3, :] = 90.0
    patches[0, 10, 10] = np.nan
    got = np.asarray(mad_flag_patches_pallas(patches, 5.0, interpret=True))
    want = np.asarray(P.mad_flag_patches(patches, 5.0))
    np.testing.assert_array_equal(got, want)
    assert not got[0, 10, 10]  # NaN never flagged


def test_mad_flags_sigma_scalar_traced(rng):
    patches = rng.normal(1.0, 0.1, (1, 16, 16)).astype(np.float32)
    patches[0, 2, :] = 50.0
    f5 = np.asarray(mad_flag_patches_pallas(patches, 5.0, interpret=True))
    f500 = np.asarray(mad_flag_patches_pallas(patches, 500.0, interpret=True))
    assert f5.sum() >= f500.sum()


# ---- fused conv3x3 kernel ------------------------------------------------
def _xla_conv(x, w, b):
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.maximum(y + b, 0.0)


def test_conv3x3_forward_parity(rng):
    import jax.numpy as jnp
    from rfi_toolbox_tpu.ops import conv3x3_bias_relu

    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 8, 16)) * 0.1).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(conv3x3_bias_relu(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b), True))
    want = np.asarray(_xla_conv(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv3x3_gradients_parity(rng):
    import jax
    import jax.numpy as jnp
    from rfi_toolbox_tpu.ops import conv3x3_bias_relu

    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 4, 8)) * 0.1).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)

    def loss_pallas(x, w, b):
        return jnp.sum(conv3x3_bias_relu(x, w, b, True) ** 2)

    def loss_xla(x, w, b):
        return jnp.sum(_xla_conv(x, w, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    for a, bb, name in zip(gp, gx, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-3, err_msg=f"grad {name}")


def test_double_conv_gn_relu_parity(rng):
    """Fused DoubleConv forward (conv3x3 -> GroupNorm -> ReLU x 2)
    matches the flax.linen eval forward it fuses."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.ops.fused_doubleconv import double_conv_gn_relu

    # ci != co exercises the separate second pad scratch; ci == co the
    # scratch-reuse path (the VMEM-critical production case)
    for ci, co, g in ((8, 16, 8), (16, 16, 8)):

        class Ref(nn.Module):
            @nn.compact
            def __call__(self, x):
                for _ in range(2):
                    x = nn.Conv(co, (3, 3), padding="SAME",
                                use_bias=False)(x)
                    x = nn.GroupNorm(num_groups=g)(x)
                    x = nn.relu(x)
                return x

        x = jnp.asarray(rng.normal(size=(2, 16, 16, ci)).astype(np.float32))
        ref = Ref()
        v = ref.init(jax.random.key(0), x)
        # non-trivial GN affines so the fusion is load-bearing
        p = jax.tree.map(
            lambda a: a + jnp.asarray(rng.normal(0, 0.3, a.shape), a.dtype),
            v["params"],
        )
        want = ref.apply({"params": p}, x)
        got = double_conv_gn_relu(
            x,
            p["Conv_0"]["kernel"], p["GroupNorm_0"]["scale"],
            p["GroupNorm_0"]["bias"],
            p["Conv_1"]["kernel"], p["GroupNorm_1"]["scale"],
            p["GroupNorm_1"]["bias"],
            num_groups=g, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)
