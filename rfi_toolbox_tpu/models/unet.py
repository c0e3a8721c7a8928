"""Flax UNet family for RFI segmentation — TPU-native.

Rebuild of the reference PyTorch UNets (rfi_toolbox/models/unet.py:6-268)
as Flax linen modules:

- NHWC layout (TPU-native; the reference is NCHW)
- parameterized compute dtype: params live in float32, activations/convs
  can run in bfloat16 for MXU throughput (``dtype=jnp.bfloat16``)
- the reference's ``Encoder.forward`` bug — ``self.conv(x)`` called twice,
  doubling encoder compute (unet.py:27-28) — is fixed: the conv runs once
  and is reused as the skip connection
- BatchNorm carries a ``batch_stats`` collection; pass ``train=True`` and
  make it mutable during training.

Variants (matching the reference surface):
- ``UNet``: 4 stages, init_features 32, logits output (unet.py:41-77)
- ``UNetBigger``: 5 stages, 32x bottleneck (unet.py:79-118)
- ``UNetOverfit``: 5 stages, init_features 128, sigmoid output
  (unet.py:120-196)
- ``UNetDifferentActivation``: 4 stages, pluggable activation
  (unet.py:198-268)

Beyond the reference, every variant takes ``norm``: ``"batch"``
(default — the reference's BatchNorm2d semantics), ``"group"``
(GroupNorm: no running-stats collection, no cross-batch stats passes —
the train step fuses better on TPU; see BASELINE.md roofline notes), or
``"none"``.
"""

import math
from collections.abc import Callable

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "DoubleConv",
    "Encoder",
    "Decoder",
    "space_to_depth",
    "depth_to_space",
    "UNet",
    "UNetBigger",
    "UNetOverfit",
    "UNetDifferentActivation",
    "create_model",
]


class DoubleConv(nn.Module):
    """(Conv3x3 -> norm -> act) x 2."""

    features: int
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                        use_bias=self.norm == "none")(x)
            if self.norm == "batch":
                # momentum 0.9 == torch BatchNorm2d's default (the flax
                # default 0.99 leaves running stats uncalibrated in short
                # runs)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    dtype=self.dtype,
                )(x)
            elif self.norm == "group":
                x = nn.GroupNorm(
                    num_groups=math.gcd(self.features, 8), dtype=self.dtype
                )(x)
            elif self.norm != "none":
                raise ValueError(f"unknown norm: {self.norm!r}")
            x = self.activation(x)
        return x


class Encoder(nn.Module):
    """DoubleConv then 2x2 max-pool; returns (pooled, skip).

    The conv runs ONCE (the reference computes it twice, unet.py:27-28).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = DoubleConv(self.features, self.dtype, self.activation,
                          self.norm)(x, train)
        pooled = nn.max_pool(skip, (2, 2), strides=(2, 2))
        return pooled, skip


class ConvTranspose2x2(nn.Module):
    """2x2/stride-2 transposed conv in its exact matmul + pixel-shuffle
    form.

    With kernel size == stride there is no output overlap: every output
    pixel receives contributions from exactly ONE input pixel, so the op
    is literally ``out[n, 2i+di, 2j+dj, co] = x[n,i,j,:] @ W[di,dj,:,co]
    + b[co]`` — one (N*H*W, Cin) x (Cin, 4*Cout) matmul followed by a
    pixel-shuffle reshape. On the MXU this quadruples the matmul's N
    dimension (4*Cout instead of Cout), lifting the narrow decoder
    stages (dec1: Cout=32 -> N=128) to full systolic-array utilization
    (BASELINE.md roofline table). Parameter names/shapes match
    ``nn.ConvTranspose`` exactly (``kernel`` (2,2,Cin,Cout), ``bias``
    (Cout,)) so existing checkpoints and snapshots load unchanged; the
    Decoder instantiates it under the name ``ConvTranspose_0``.
    Bit-parity with ``nn.ConvTranspose`` is asserted in
    tests/test_models.py.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        # lax.conv_transpose applies the kernel spatially mirrored; the
        # [::-1, ::-1] makes this bit-exact vs nn.ConvTranspose (free at
        # trace time — XLA folds it into the reshape)
        w = kernel[::-1, ::-1].astype(self.dtype).transpose(
            2, 0, 1, 3
        ).reshape(cin, 4 * self.features)
        y = x @ w  # (N, H, W, 2*2*Cout)
        n, h, wd = y.shape[:3]
        y = y.reshape(n, h, wd, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, 2 * h, 2 * wd, self.features
        )
        return y + bias.astype(self.dtype)


class Decoder(nn.Module):
    """2x2 stride-2 transposed conv, concat skip, DoubleConv."""

    features: int
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        # matmul + pixel-shuffle form of nn.ConvTranspose (exact same
        # params under the same scope name — checkpoints unaffected)
        up = ConvTranspose2x2(
            self.features, dtype=self.dtype, name="ConvTranspose_0"
        )(x)
        x = jnp.concatenate([up, skip], axis=-1)
        return DoubleConv(self.features, self.dtype, self.activation,
                          self.norm)(x, train)


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), 2x2 blocks to channels."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, 2, 2, c // 4)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c // 4)


class _UNetBase(nn.Module):
    """Shared encoder-decoder skeleton with a configurable depth.

    ``space_to_depth=True`` is the MXU-packed variant (NOT reference
    parity — an opt-in beyond-reference architecture): the input is
    packed 2x2 into channels and the network runs entirely at half
    spatial resolution, so the outermost stage computes at ``2f``
    output channels instead of ``f`` (the reference's enc1/dec1 run the
    128x128 grid at 32 channels = 25% utilization of the 128-wide MXU
    systolic array — the dominant term in BASELINE.md's roofline
    table). Logits are restored to input resolution by a 4x-channel
    1x1 head + depth-to-space. Same nominal depth: the packing replaces
    the first resolution level, the bottleneck width is unchanged.
    """

    out_channels: int = 1
    init_features: int = 32
    depth: int = 4
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu
    final_sigmoid: bool = False
    norm: str = "batch"
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.init_features
        in_dtype = x.dtype
        x = x.astype(self.dtype)

        if self.space_to_depth:
            x = space_to_depth(x)
            stage_features = [f * 2 ** (i + 1) for i in range(self.depth - 1)]
        else:
            stage_features = [f * 2**i for i in range(self.depth)]

        skips = []
        for feats in stage_features:
            x, skip = Encoder(feats, self.dtype, self.activation,
                              self.norm)(x, train)
            skips.append(skip)

        x = DoubleConv(f * 2**self.depth, self.dtype, self.activation,
                       self.norm)(x, train)

        for feats, skip in zip(reversed(stage_features), reversed(skips)):
            x = Decoder(feats, self.dtype, self.activation,
                        self.norm)(x, skip, train)

        if self.space_to_depth:
            x = nn.Conv(4 * self.out_channels, (1, 1), dtype=self.dtype)(x)
            x = depth_to_space(x)
        else:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        x = x.astype(in_dtype if jnp.issubdtype(in_dtype, jnp.floating)
                     else jnp.float32)
        if self.final_sigmoid:
            x = nn.sigmoid(x)
        return x


class UNet(_UNetBase):
    """4-stage UNet, features 32 -> 512 bottleneck, logits output."""

    depth: int = 4
    init_features: int = 32


class UNetBigger(_UNetBase):
    """5-stage UNet (reference unet.py:79-118)."""

    depth: int = 5
    init_features: int = 32


class UNetOverfit(_UNetBase):
    """5-stage high-capacity UNet with sigmoid output
    (reference unet.py:155-196; init_features defaults to 128)."""

    depth: int = 5
    init_features: int = 128
    final_sigmoid: bool = True


class UNetDifferentActivation(_UNetBase):
    """4-stage UNet with pluggable activation (reference unet.py:233-268).

    >>> model = UNetDifferentActivation(activation=nn.leaky_relu)
    """

    depth: int = 4
    init_features: int = 32


_MODEL_REGISTRY = {
    "unet": UNet,
    "unet_bigger": UNetBigger,
    "unet_overfit": UNetOverfit,
    "unet_activation": UNetDifferentActivation,
}


def create_model(model_type="unet", out_channels=1, init_features=32,
                 dtype=jnp.float32, **kwargs):
    """Factory matching the CLI model names (train_model.py:110-119)."""
    if model_type not in _MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model type: {model_type}. "
            f"Choose from {sorted(_MODEL_REGISTRY)}"
        )
    cls = _MODEL_REGISTRY[model_type]
    return cls(out_channels=out_channels, init_features=init_features,
               dtype=dtype, **kwargs)
