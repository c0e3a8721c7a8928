"""Training loop for the SOLOLite instance segmentation model.

BASELINE config 4: "Mask-RCNN-class segmentation fwd+bwd on mixed
real+synthetic waterfall patches at batch 64". This trainer runs the
dense SOLO formulation at that scale: per-step synthetic instance
batches are generated ON DEVICE (no host data path at all), optionally
mixed with real patches, and the fwd+bwd step is one jitted SPMD
program with the state donated.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.instance import SOLOLite, solo_loss
from ..preprocess import pipeline as P
from ..synth.sample import make_instance_sample_generator

__all__ = ["InstanceTrainer", "make_instance_train_step",
           "make_instance_fused_steps"]


def make_instance_train_step(model, tx, use_pallas="auto",
                             mask_loss_stride=2, max_positive_cells=16):
    """Jitted (params, opt_state, batch) -> (params, opt_state, loss,
    parts) step for SOLOLite on complex patches + instance targets.

    ``max_positive_cells`` bounds the per-image positive-cell gather in
    :func:`rfi_toolbox_tpu.models.instance.solo_loss`; raise it for
    dense event mixes / finer grids (the loss reports
    ``dropped_mask_cells`` when the cap truncates)."""
    if use_pallas == "auto":
        use_pallas = jax.default_backend() != "cpu"

    def _one_step(params, opt_state, patches, inst_masks, inst_classes,
                  inst_valid):
        if use_pallas:
            from ..ops import fused_extract_channels

            images = fused_extract_channels(patches)
        else:
            images = P.imagenet_normalize(P.extract_channels(patches))

        def loss_fn(p):
            out = model.apply({"params": p}, images, train=False)
            return solo_loss(out, inst_masks, inst_classes, inst_valid,
                             mask_loss_stride=mask_loss_stride,
                             max_positive_cells=max_positive_cells)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    return partial(jax.jit, donate_argnums=(0, 1))(_one_step)


def make_instance_fused_steps(model, tx, sample_fn, batch_size,
                              use_pallas="auto", mask_loss_stride=2,
                              max_positive_cells=16, mesh=None):
    """K training steps — on-device batch GENERATION included — fused
    into one ``lax.scan`` program: (params, opt_state, keys(K,)) ->
    (params, opt_state, losses(K,), last_parts).

    One dispatch per K steps instead of two per step (generate + step);
    over a remote-TPU control channel the round trips dominate a ~60 ms
    step, and inside one program XLA overlaps sample generation with
    the previous step's optimizer epilogue. Numerics are identical to
    the sequential path given the same key sequence (asserted in
    tests/test_instance.py).

    With ``mesh`` (axis 'data'), the generated batch is
    sharding-constrained over the batch dim inside the scan body, so
    XLA partitions generation, forward and backward across the mesh
    and all-reduces the grads — SPMD data parallelism with zero host
    involvement (params/opt state replicated by the caller).
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() != "cpu"

    def _constrain(batch):
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape["data"]

        def put(a):
            if a.ndim and a.shape[0] % n == 0:
                spec = P(*(("data",) + (None,) * (a.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, spec))
            return a

        return jax.tree.map(put, batch)

    def _one_step(params, opt_state, patches, inst_masks, inst_classes,
                  inst_valid):
        if use_pallas:
            from ..ops import fused_extract_channels

            images = fused_extract_channels(patches)
        else:
            images = P.imagenet_normalize(P.extract_channels(patches))

        def loss_fn(p):
            out = model.apply({"params": p}, images, train=False)
            return solo_loss(out, inst_masks, inst_classes, inst_valid,
                             mask_loss_stride=mask_loss_stride,
                             max_positive_cells=max_positive_cells)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    @partial(jax.jit, donate_argnums=(0, 1))
    def steps(params, opt_state, keys):
        def body(carry, key):
            params, opt_state = carry
            batch = jax.vmap(sample_fn)(jax.random.split(key, batch_size))
            batch = _constrain(batch)
            params, opt_state, loss, parts = _one_step(
                params, opt_state, batch["waterfall"], batch["inst_masks"],
                batch["inst_classes"], batch["inst_valid"],
            )
            return (params, opt_state), (loss, parts)

        (params, opt_state), (losses, parts) = jax.lax.scan(
            body, (params, opt_state), keys
        )
        last_parts = jax.tree.map(lambda a: a[-1], parts)
        return params, opt_state, losses, last_parts

    return steps


class InstanceTrainer:
    """Train SOLOLite on device-generated synthetic instances.

    >>> trainer = InstanceTrainer(patch_size=128, batch_size=64)
    >>> result = trainer.fit(num_steps=100)

    ``mesh`` / ``mesh_shape`` (data-only, e.g. ``mesh_shape=(8,)``)
    enable SPMD data parallelism: params/opt state are replicated, the
    on-device-generated batch is sharded over the mesh 'data' axis
    (inside the scan body on the fused path), and XLA all-reduces the
    grads — same key stream and numerics as single-device
    (tests/test_instance.py).

    ``learning_rate`` accepts a float or any optax schedule. For long
    batch-64 runs pass a warmup schedule — e.g.
    ``optax.warmup_cosine_decay_schedule(1e-5, 8e-4, 500, total)`` —
    a cold 1e-3 start can collapse the mask head on dense multi-event
    configs (observed: dice pinned at ~0.99 with empty masks).
    """

    def __init__(
        self,
        model=None,
        patch_size=128,
        batch_size=64,
        rfi_config=None,
        learning_rate=1e-3,
        weight_decay=1e-5,
        seed=0,
        use_pallas="auto",
        mask_loss_stride=2,
        max_positive_cells=16,
        noise_level=1.0,
        rfi_power_min=1000.0,
        rfi_power_max=10000.0,
        mesh=None,
        mesh_shape=None,
    ):
        self.model = model if model is not None else SOLOLite(
            num_classes=6, grid_size=max(patch_size // 16, 4)
        )
        if mesh is not None and mesh_shape is not None:
            raise ValueError("pass either mesh or mesh_shape, not both")
        if mesh_shape is not None:
            import math

            shape = tuple(mesh_shape)
            if len(shape) > 1 and math.prod(shape[1:]) != 1:
                raise ValueError(
                    "InstanceTrainer parallelism is data-only; "
                    f"mesh_shape {shape} implies non-data axes"
                )
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(shape=(shape[0],), axis_names=("data",))
        self.mesh = mesh
        self.patch_size = patch_size
        self.batch_size = batch_size
        self.seed = seed
        if rfi_config is None:
            rfi_config = {
                "narrowband_persistent": {"count": [1, 3]},
                "broadband_persistent": {"count": [0, 2]},
                "narrowband_bursty": {"count": [0, 2]},
                "frequency_sweep": {"count": [0, 1]},
            }
        sample_fn = make_instance_sample_generator(
            patch_size, patch_size, rfi_config=rfi_config,
            noise_level=noise_level, rfi_power_min=rfi_power_min,
            rfi_power_max=rfi_power_max,
        )
        self._sample_fn = sample_fn
        self._batch_fn = jax.jit(
            lambda keys: jax.vmap(sample_fn)(keys)
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(learning_rate, weight_decay=weight_decay),
        )
        self._use_pallas = use_pallas
        self._mask_loss_stride = mask_loss_stride
        self._max_positive_cells = max_positive_cells
        self._step = make_instance_train_step(
            self.model, self.tx, use_pallas,
            mask_loss_stride=mask_loss_stride,
            max_positive_cells=max_positive_cells,
        )
        self._fused = None
        self.params = None
        self.opt_state = None
        # global step counter: the sample stream is keyed on it
        # (fold_in(base, step)), so chunked fit() calls CONTINUE the
        # stream instead of replaying it, and a restored checkpoint
        # resumes the exact trajectory
        self.step = 0

    def _init(self):
        key = jax.random.key(self.seed)
        x = jnp.zeros((1, self.patch_size, self.patch_size, 3), jnp.float32)
        self.params = self.model.init(key, x, train=False)["params"]
        self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            from ..parallel.mesh import replicated

            rep = replicated(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

    def generate_batch(self, key):
        """One synthetic instance batch (device-resident)."""
        batch = self._batch_fn(jax.random.split(key, self.batch_size))
        return batch

    def fit(self, num_steps=100, log_every=20, real_patches=None,
            real_fraction=0.0, fused_steps=1):
        """Train for ``num_steps``; optionally mix in real patches.

        Args:
            real_patches: optional (M, p, p) complex array of real
                waterfall patches used UNLABELED-negative style: mixed
                samples replace a fraction of each batch with real
                patches carrying no instances (teaches the category
                grid to stay silent on real noise structure).
            real_fraction: fraction of each batch drawn from
                real_patches.
            fused_steps: with K > 1 (and no real-patch mixing), runs K
                steps per dispatch as ONE lax.scan program including
                on-device generation — same key stream and numerics as
                the sequential path, far fewer control round trips.
                Log records then land at the first chunk boundary at or
                after each ``log_every`` multiple.

        Returns:
            {'history': [{'step', 'loss', 'cate_loss', 'mask_loss',
                          'steps_per_sec'}]}

        The synthetic sample stream is keyed per GLOBAL step
        (``fold_in(base, self.step)``): a second ``fit`` call — or a
        run resumed via :meth:`restore_checkpoint` — continues the
        stream with fresh samples rather than replaying it from the
        start (history 'step' stays relative to the call).
        """
        if self.params is None:
            self._init()
        base = jax.random.fold_in(jax.random.key(self.seed), 1)
        rng = np.random.default_rng(self.seed)
        history = []
        use_fused = fused_steps > 1 and (
            real_patches is None or real_fraction <= 0
        )
        if use_fused and self._fused is None:
            self._fused = make_instance_fused_steps(
                self.model, self.tx, self._sample_fn, self.batch_size,
                self._use_pallas, self._mask_loss_stride,
                self._max_positive_cells, mesh=self.mesh,
            )

        def log(step_i, loss, parts):
            # the float() readback IS the device fence: block_until_ready
            # is not reliable on the remote backend (CLAUDE.md), and
            # bench_instance64 records steps_per_sec from this dt
            loss = float(loss)
            dt = time.perf_counter() - t0
            rec = {
                "step": step_i,
                "loss": loss,
                "cate_loss": float(parts["cate_loss"]),
                "mask_loss": float(parts["mask_loss"]),
                "steps_per_sec": step_i / dt,
            }
            dropped = int(parts.get("dropped_mask_cells", 0))
            if dropped:
                rec["dropped_mask_cells"] = dropped
            history.append(rec)

        t0 = time.perf_counter()
        step_i = 0
        next_log = log_every
        while step_i < num_steps:
            if use_fused and num_steps - step_i >= fused_steps:
                ks = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                    jnp.arange(self.step, self.step + fused_steps)
                )
                self.params, self.opt_state, losses, parts = self._fused(
                    self.params, self.opt_state, ks
                )
                loss = losses[-1]
                step_i += fused_steps
                self.step += fused_steps
            else:
                k1 = jax.random.fold_in(base, self.step)
                batch = self.generate_batch(k1)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch

                    batch = shard_batch(batch, self.mesh)
                patches = batch["waterfall"]
                masks = batch["inst_masks"]
                classes = batch["inst_classes"]
                valid = batch["inst_valid"]
                if real_patches is not None and real_fraction > 0:
                    n_real = int(self.batch_size * real_fraction)
                    if n_real:
                        sel = rng.integers(0, len(real_patches), n_real)
                        from ..utils.transfer import to_device

                        patches = patches.at[:n_real].set(
                            to_device(np.ascontiguousarray(real_patches[sel]))
                        )
                        valid = valid.at[:n_real].set(False)
                self.params, self.opt_state, loss, parts = self._step(
                    self.params, self.opt_state, patches, masks, classes, valid
                )
                step_i += 1
                self.step += 1
            if step_i >= next_log or step_i >= num_steps:
                log(step_i, loss, parts)
                next_log = (step_i // log_every + 1) * log_every
        return {"history": history}

    def predict(self, images, score_thresh=0.3, full_resolution=True,
                mask_thresh=0.5, nms_sigma=2.0):
        """Decode instances for (N, p, p, 3) float images. Returns a
        list of per-image dicts (masks/scores/classes); masks are
        upsampled to the input resolution unless full_resolution=False
        (the mask head runs at input/4). ``mask_thresh`` is the sigmoid
        cut on mask logits (lower grows masks — useful for thin
        events). ``nms_sigma`` is the Matrix-NMS decay strength —
        larger kills near-duplicate detections harder (a precision
        knob; recall is threshold-bound, see BASELINE.md round-4
        calibration)."""
        from ..models.instance import solo_decode

        images = jnp.asarray(images)
        out_size = tuple(images.shape[1:3]) if full_resolution else None
        out = self.model.apply({"params": self.params}, images, train=False)
        return [
            jax.tree.map(
                np.asarray,
                solo_decode(jax.tree.map(lambda a: a[i], out),
                            score_thresh=score_thresh,
                            mask_thresh=mask_thresh, out_size=out_size,
                            nms_sigma=nms_sigma),
            )
            for i in range(len(images))
        ]

    def save_checkpoint(self, path, step=None):
        """Full training checkpoint (params + opt_state + step) via
        Orbax — crash-resumable long runs, unlike :meth:`save` which
        strips the optimizer for shipping. ``step`` defaults to the
        trainer's global step counter."""
        import orbax.checkpoint as ocp

        from pathlib import Path

        if self.params is None:
            raise ValueError("nothing to checkpoint; train or _init first")
        tree = {
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
            "step": int(self.step if step is None else step),
        }
        ocp.PyTreeCheckpointer().save(Path(path).absolute(), tree, force=True)
        return path

    def restore_checkpoint(self, path):
        """Restore params/opt_state saved by :meth:`save_checkpoint`;
        returns the stored step. The optimizer state pytree is rebuilt
        against a freshly-initialized structure (Orbax returns lists
        for tuples)."""
        import orbax.checkpoint as ocp

        from pathlib import Path

        tree = ocp.PyTreeCheckpointer().restore(Path(path).absolute())
        if self.params is None:
            self._init()
        _, treedef = jax.tree.flatten(self.opt_state)
        self.opt_state = jax.tree.unflatten(
            treedef, jax.tree.leaves(tree["opt_state"])
        )
        self.params = tree["params"]
        self.step = int(tree.get("step", 0))
        return self.step

    def save(self, path):
        """Export an inference snapshot (params + config metadata) via
        :func:`rfi_toolbox_tpu.train.export_params`."""
        from .trainer import export_params

        return export_params(
            self.params, path, batch_stats={},
            metadata={
                "model": "SOLOLite",
                "num_classes": self.model.num_classes,
                "grid_size": self.model.grid_size,
                "embed_dim": self.model.embed_dim,
                "features": self.model.features,
                "space_to_depth": bool(self.model.space_to_depth),
                "patch_size": self.patch_size,
            },
        )

    @classmethod
    def load(cls, path, **kwargs):
        """Rebuild an InstanceTrainer from a snapshot (fresh optimizer)."""
        from ..models.instance import SOLOLite
        from .trainer import load_params

        params, _, meta = load_params(path)
        model = SOLOLite(
            num_classes=meta["num_classes"], grid_size=meta["grid_size"],
            embed_dim=meta["embed_dim"], features=meta["features"],
            space_to_depth=bool(meta.get("space_to_depth", False)),
        )
        trainer = cls(model=model, patch_size=meta["patch_size"], **kwargs)
        trainer._init()
        trainer.params = params
        return trainer
