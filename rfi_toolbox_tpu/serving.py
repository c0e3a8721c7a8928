"""Production serving: ahead-of-time-compiled fixed-shape predictors.

The reference has no serving story (inference happens inside eval/viz
scripts). For production flagging the latency contract matters: XLA
compiles on first call (30-60 s on a remote TPU per shape), which is
unacceptable mid-stream. This module AOT-compiles the forward once at
startup via ``jax.jit(...).lower(...).compile()`` for a single static
batch shape; every request then pads to that shape and runs the cached
executable — no compile can ever happen on the request path.

>>> from rfi_toolbox_tpu.serving import CompiledPredictor
>>> pred = CompiledPredictor.from_snapshot("pretrained/unet16_synthetic.npz")
>>> masks = pred(images)                     # (N, 128, 128, 3) -> (N, 128, 128)
>>> flag_measurement_set(ms, method="model", predictor=pred)
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CompiledPredictor"]


class CompiledPredictor:
    """AOT-compiled segmentation forward with a fixed batch shape.

    Args:
        model: Flax module (UNet family).
        params / batch_stats: inference variables.
        input_shape: (H, W, C) of one image.
        batch_size: the ONE static batch size compiled; requests of any
            length are chunked/padded to it.
        threshold: sigmoid cut for the binary mask.
        tta: compile the flip-averaged test-time-augmentation forward
            (all four D2 orientations as a single 4x-batch program —
            see ``Trainer.predict(tta=True)``). 4x the FLOPs per
            request, still exactly one AOT executable.
        fold_norm: fold eval-mode BatchNorm into the convs before
            compiling (``models.fold_batchnorm``) — 18 fewer normalize
            passes per UNet forward, same logits to float rounding.
            Default True; silently skipped for models it doesn't apply
            to (GroupNorm / norm='none' / missing batch_stats). Set
            False for bit-parity with the unfolded eager forward.
    """

    def __init__(self, model, params, batch_stats=None, input_shape=(128, 128, 3),
                 batch_size=32, threshold=0.5, tta=False, fold_norm=True):
        self.batch_size = int(batch_size)
        self.input_shape = tuple(input_shape)
        self.threshold = float(threshold)
        self.tta = bool(tta)
        self.folded = False
        if fold_norm and getattr(model, "norm", None) == "batch" and batch_stats:
            from .models import fold_batchnorm

            model, params = fold_batchnorm(model, params, batch_stats)
            batch_stats = None
            self.folded = True
        self._model = model
        variables = {"params": params, "batch_stats": batch_stats or {}}
        thresh = self.threshold

        def _probs(variables, images):
            logits = model.apply(variables, images, train=False)
            logits = logits[..., 0] if logits.ndim == 4 else logits
            return jax.nn.sigmoid(logits)

        def fwd(variables, images):
            if not tta:
                return _probs(variables, images) > thresh
            variants = jnp.concatenate(
                [images, images[:, ::-1], images[:, :, ::-1],
                 images[:, ::-1, ::-1]]
            )
            p = _probs(variables, variants)
            b = images.shape[0]
            mean = (
                p[:b]
                + p[b : 2 * b][:, ::-1]
                + p[2 * b : 3 * b][:, :, ::-1]
                + p[3 * b :][:, ::-1, ::-1]
            ) / 4
            return mean > thresh

        spec = jax.ShapeDtypeStruct(
            (self.batch_size, *self.input_shape), jnp.float32
        )
        # dtype without jnp.asarray: reading .dtype must not device-
        # transfer the whole weight tree a second time
        var_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(
                np.shape(a), getattr(a, "dtype", None) or jnp.result_type(a)
            ),
            variables,
        )
        self._variables = jax.tree.map(jnp.asarray, variables)
        # lower+compile NOW: the request path can never trigger a compile
        self._compiled = jax.jit(fwd).lower(var_spec, spec).compile()

    @classmethod
    def from_snapshot(cls, path, model=None, **kwargs):
        """Build from an ``export_params`` .npz snapshot. ``model``
        defaults to a UNet with the snapshot's ``init_features``; the
        input channel count and sigmoid threshold likewise default from
        the snapshot metadata (``in_channels``, ``best_threshold``) so
        e.g. the 8-channel coherent snapshot compiles the right forward
        without the caller restating its training configuration."""
        from .train.trainer import load_params

        params, batch_stats, meta = load_params(path)
        if model is None:
            from .models import UNet

            model = UNet(init_features=int(meta.get("init_features", 32)),
                         norm=meta.get("norm", "batch"),
                         space_to_depth=bool(
                             meta.get("space_to_depth", False)))
        if "input_shape" not in kwargs and "in_channels" in meta:
            kwargs["input_shape"] = (128, 128, int(meta["in_channels"]))
        if "threshold" not in kwargs and "best_threshold" in meta:
            kwargs["threshold"] = float(meta["best_threshold"])
        return cls(model, params, batch_stats, **kwargs)

    @property
    def cost_analysis(self):
        """XLA cost analysis of the compiled executable (flops etc.)."""
        try:
            return self._compiled.cost_analysis()
        except Exception:  # backend may not implement it
            return None

    def __call__(self, images):
        """(N, H, W, C) float -> (N, H, W) bool; any N (chunked+padded
        to the compiled batch size).

        Accepts host (numpy) OR device (jax.Array) input. Device input
        stays device-resident end to end — no host round trip — and the
        result is a device array; this is the production flagging path
        (``flag_waterfalls_coherent`` computes patches on device, so
        bouncing them through host numpy would cost two full transfers
        per request over whatever link fronts the TPU). Host input keeps
        returning host numpy."""
        if isinstance(images, jax.Array):
            return self._call_device(images)
        images = np.asarray(images, dtype=np.float32)
        self._check_shape(images.shape)
        n = len(images)
        bs = self.batch_size
        out = []
        for start in range(0, n, bs):
            chunk = images[start : start + bs]
            valid = len(chunk)
            if valid < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - valid, *self.input_shape),
                                     np.float32)]
                )
            preds = self._compiled(self._variables, jnp.asarray(chunk))
            out.append(np.asarray(preds)[:valid])
        return np.concatenate(out) if out else np.zeros(
            (0, *self.input_shape[:2]), bool
        )

    def _check_shape(self, shape):
        if tuple(shape[1:]) != self.input_shape:
            raise ValueError(
                f"expected (N, {', '.join(map(str, self.input_shape))}), "
                f"got {tuple(shape)}"
            )

    def _call_device(self, images):
        """Device-resident request path: pad/chunk/forward/concat all on
        device; returns a (N, H, W) bool jax.Array."""
        self._check_shape(images.shape)
        images = jnp.asarray(images, jnp.float32)
        # The executable was AOT-compiled for the variables' (single-
        # device) sharding. Mesh-sharded callers (flag_waterfalls with
        # mesh=...) hand over NamedSharding-committed chunks, which the
        # compiled program rejects outright — resharding here keeps the
        # transfer device-to-device instead of bouncing through host.
        target = jax.tree.leaves(self._variables)[0].sharding
        if images.sharding != target:
            images = jax.device_put(images, target)
        n = images.shape[0]
        bs = self.batch_size
        if n == 0:
            return jnp.zeros((0, *self.input_shape[:2]), bool)
        pad = (-n) % bs
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *self.input_shape), jnp.float32)]
            )
        out = [
            self._compiled(self._variables, images[s : s + bs])
            for s in range(0, n + pad, bs)
        ]
        preds = out[0] if len(out) == 1 else jnp.concatenate(out)
        return preds[:n]
