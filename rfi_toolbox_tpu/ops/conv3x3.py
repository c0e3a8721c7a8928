"""Fused 3x3 conv + bias + ReLU — Pallas TPU kernel with custom VJP.

The UNet's hot block is (conv3x3 -> BN -> ReLU) x 2 (SURVEY.md §7.5).
This kernel implements the conv+bias+ReLU part as nine shifted MXU
matmuls per image — a direct convolution with every operand VMEM-
resident, no im2col materialization:

    y[h, w, :] = relu( sum_{ky,kx} x[h+ky-1, w+kx-1, :] @ W[ky, kx] + b )

The backward pass is two more kernels built from the same primitive:
dx is a conv with the 180-degree-rotated, channel-transposed weights,
and dW accumulates batched contractions across the grid (the dW output
block is revisited by every program — sequential on TPU — with a
first-iteration zero-init).

Status: parity-exact vs ``lax.conv_general_dilated`` (tests; maxerr
~1e-6 on TPU). Measured on v5e (2026-08-17, (16,64,64,32)->32): this
kernel 4.0 ms vs XLA conv 2.1 ms — XLA's conv emitter pipelines HBM<->
VMEM tiling that this whole-image-resident formulation cannot, so
``models.unet`` deliberately keeps XLA convs and this stays a
reference/opt-in kernel (the fused wins live where XLA fuses poorly:
ops/fused_channels.py, ops/mad_flags.py).

VMEM shape constraint: TPU tiles the trailing (sublane, lane) dims to
(8, 128), so a channel count below 128 is lane-padded 128/Ci-fold in
VMEM. With double-buffered in+out blocks the per-image budget is
roughly ``4 * H * W * max(Ci, 128) * 4B < 16 MB`` — e.g. 64x64 at any
width, or 128x128 from Ci >= 128. :func:`conv3x3_fits_vmem` checks
this; :func:`conv3x3_bias_relu_or_xla` falls back to XLA outside it.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv3x3_bias_relu",
    "conv3x3",
    "conv3x3_fits_vmem",
    "conv3x3_bias_relu_or_xla",
]

_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16 MB limit


def conv3x3_fits_vmem(shape, co):
    """True when one image's double-buffered in/out blocks (+ scratch)
    fit VMEM after (8, 128) tiling of the trailing dims."""
    _, h, w, ci = shape

    def padded(c):
        return h * w * max(c, 128) * 4

    # 2x double-buffered input + output, plus the padded scratch and
    # the accumulator.
    need = 2 * padded(ci) + 2 * padded(co) + padded(ci) + padded(co)
    return need < _VMEM_BUDGET


def conv3x3_bias_relu_or_xla(x, w, b):
    """Fused Pallas conv when the shape fits VMEM, XLA conv otherwise."""
    if conv3x3_fits_vmem(x.shape, w.shape[-1]):
        return conv3x3_bias_relu(x, w, b)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.maximum(y + b, 0.0)


def _conv_kernel(x_ref, w_ref, b_ref, y_ref, *, relu):
    # Stage x once into a zero-padded VMEM scratch; each tap is then a
    # slice read feeding straight into its matmul, keeping only one
    # shifted operand live at a time (an unrolled shift-and-add kept all
    # nine copies alive and blew the 16 MB VMEM budget).
    h, w_dim, ci = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]

    co = y_ref.shape[3]

    def body(xpad, acc):
        xpad[:] = jnp.zeros_like(xpad)
        xpad[1 : h + 1, 1 : w_dim + 1, :] = x_ref[0]
        acc[:] = jnp.broadcast_to(b_ref[:], (h, w_dim, co))
        # In-place accumulation through a scratch ref: a value-level
        # acc chain made Mosaic stack-allocate all nine matmul outputs
        # at once (32 MB > the 16 MB VMEM budget).
        for ky in range(3):
            for kx in range(3):
                xs = xpad[ky : ky + h, kx : kx + w_dim, :]
                acc[:] += jax.lax.dot_general(
                    xs, w_ref[ky, kx], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out = acc[:]
        y_ref[0] = jnp.maximum(out, 0.0) if relu else out

    pl.run_scoped(
        body,
        pltpu.VMEM((h + 2, w_dim + 2, ci), jnp.float32),
        pltpu.VMEM((h, w_dim, co), jnp.float32),
    )


def _conv_call(x, w, b, relu, interpret):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    img = pl.BlockSpec((1, h, wd, ci), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, h, wd, co), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_conv_kernel, relu=relu),
        grid=(n,),
        in_specs=[
            img,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), w.astype(jnp.float32), b.astype(jnp.float32))


def _dw_kernel(x_ref, g_ref, dw_ref):
    i = pl.program_id(0)
    h, w_dim, ci = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def body(xpad):
        xpad[:] = jnp.zeros_like(xpad)
        xpad[1 : h + 1, 1 : w_dim + 1, :] = x_ref[0]
        g = g_ref[0]
        for ky in range(3):
            for kx in range(3):
                xs = xpad[ky : ky + h, kx : kx + w_dim, :]
                # batch over H, contract W -> (H, Ci, Co), reduce H
                prod = jax.lax.dot_general(
                    xs, g, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                dw_ref[ky, kx] += jnp.sum(prod, axis=0)

    pl.run_scoped(
        body, pltpu.VMEM((h + 2, w_dim + 2, ci), jnp.float32)
    )


def _dw_call(x, g, interpret):
    n, h, wd, ci = x.shape
    co = g.shape[-1]
    img = pl.BlockSpec((1, h, wd, ci), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    gimg = pl.BlockSpec((1, h, wd, co), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    # dW block revisited by every grid step (sequential accumulation)
    dw_spec = pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dw_kernel,
        grid=(n,),
        in_specs=[img, gimg],
        out_specs=dw_spec,
        out_shape=jax.ShapeDtypeStruct((3, 3, ci, co), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), g.astype(jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_bias_relu(x, w, b, interpret=False):
    """relu(conv3x3_SAME(x, w) + b) for NHWC x and (3,3,Ci,Co) w."""
    return _conv_call(x, w, b, relu=True, interpret=interpret)


def _fwd(x, w, b, interpret):
    y = _conv_call(x, w, b, relu=True, interpret=interpret)
    return y, (x, w, y)


def _bwd(interpret, res, g):
    x, w, y = res
    g = g * (y > 0)  # ReLU gate (XLA fuses this elementwise)
    # dx: conv with 180-rotated, channel-transposed weights
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    zero_b = jnp.zeros((x.shape[-1],), jnp.float32)
    dx = _conv_call(g, w_t, zero_b, relu=False, interpret=interpret)
    dw = _dw_call(x, g, interpret)
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(g.dtype)


conv3x3_bias_relu.defvjp(_fwd, _bwd)


def conv3x3(x, w, b=None, interpret=False):
    """Plain fused conv3x3+bias (no activation), differentiable via the
    same custom-VJP machinery minus the ReLU gate."""
    if b is None:
        b = jnp.zeros((w.shape[-1],), jnp.float32)
    return _conv_call(x, w, b, relu=False, interpret=interpret)
