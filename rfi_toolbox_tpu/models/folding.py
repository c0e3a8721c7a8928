"""Fold eval-mode BatchNorm into the preceding conv (inference only).

In eval mode BatchNorm is an affine map with constants ``(mean, var,
scale, bias)``:

    y = (conv(x) - mean) / sqrt(var + eps) * scale + bias

which folds exactly into the conv's weights:

    kernel' = kernel * s          (s = scale / sqrt(var + eps), per C_out)
    bias'   = bias - mean * s

The folded model is the same UNet with ``norm='none'`` — 18 fewer
normalize passes per forward on the 4-stage UNet, zero extra HBM
traffic, and no ``batch_stats`` collection to carry. This is inference-
only: GroupNorm computes per-sample statistics and cannot be folded
(``fold_batchnorm`` raises for it), and training-mode BatchNorm uses
batch statistics.

The reference has no equivalent (inference runs the full BN graph,
rfi_toolbox/models/unet.py:10-24); this is the BN-residue item from the
BASELINE.md roofline analysis. Numerics: folding reassociates one
per-channel multiply, so logits match to float rounding (~1e-6), not
bit-for-bit; parity is asserted in tests/test_models.py.
"""

import jax.numpy as jnp

__all__ = ["fold_batchnorm"]

_EPS = 1e-5  # flax nn.BatchNorm default, matching models/unet.py


def _fold_tree(params, stats):
    """Recursively fold BatchNorm_i into its sibling Conv_i."""
    out = {}
    for key, sub in params.items():
        if key.startswith("BatchNorm_"):
            continue  # consumed by its Conv sibling below
        if key.startswith("Conv_") and not key.startswith("ConvTranspose"):
            bn_key = "BatchNorm_" + key.split("_")[1]
            if bn_key in params:
                bn, st = params[bn_key], stats[bn_key]
                s = bn["scale"] / jnp.sqrt(st["var"] + _EPS)
                folded = {"kernel": sub["kernel"] * s,
                          "bias": bn["bias"] - st["mean"] * s}
                if "bias" in sub:  # use_bias convs (norm='none' source)
                    folded["bias"] = folded["bias"] + sub["bias"] * s
                out[key] = folded
                continue
        if isinstance(sub, dict):
            out[key] = _fold_tree(sub, stats.get(key, {}))
        else:
            out[key] = sub
    return out


def fold_batchnorm(model, params, batch_stats):
    """Return ``(folded_model, folded_params)`` with every eval-mode
    BatchNorm folded into its preceding conv.

    Args:
        model: a UNet-family module with ``norm='batch'``.
        params / batch_stats: trained inference variables.

    The folded model is ``model.clone(norm='none')`` and takes no
    ``batch_stats``. Raises ``ValueError`` for non-BatchNorm models
    (GroupNorm statistics are data-dependent and cannot be folded).
    """
    norm = getattr(model, "norm", None)
    if norm != "batch":
        raise ValueError(
            f"fold_batchnorm requires norm='batch', got {norm!r}"
        )
    if not batch_stats:
        raise ValueError("fold_batchnorm needs trained batch_stats")
    return model.clone(norm="none"), _fold_tree(params, batch_stats)
