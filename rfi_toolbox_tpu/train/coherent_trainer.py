"""Trainer for the coherent 8-channel pipeline (the ``.npy`` convention).

The reference trains ``UNet(in_channels=8)`` on ``generate_dataset.py``
output — 8 channels = 4 polarizations x (real, imag) of the coherent
``RFISimulator`` physics (reference scripts/generate_dataset.py:24-36,
scripts/train_model.py:92,110-151) — with flip augmentation
(train_model.py:44-55) after offline ``normalize_rfi_data`` robust
scaling (scripts/normalize_rfi_data.py:8-60, one RobustScaler fit per
``input.npy`` file).

This module is the TPU-native productization of that stack, and the
exact recipe behind the shipped ``pretrained/unet{16,24}_coherent8ch.npz``
snapshots (pretrained/README.md):

- samples are generated ON DEVICE by the jitted coherent simulator
  (no host data path), normalized per-sample with median/IQR robust
  scale — numerically what the reference's per-file RobustScaler does;
- random time/freq flip augmentation (the reference's albumentations
  H/V flips);
- EMA weight averaging (decay 0.999) — the shipped params ARE the EMA;
- generation + optimization fused K steps per dispatch in one
  ``lax.scan`` program (one control round trip per K steps);
- crash-resumable Orbax checkpoints carrying params + EMA + optimizer
  state, so a long run can be CONTINUED rather than restarted (a
  fresh-optimizer restart of an EMA run measurably regresses —
  BASELINE.md round-3 rejected experiments).

Held-out evaluation follows the quality-gate convention
(tests/test_pretrained.py): fixed-seed key stream from
``jax.random.key(10_000)``, disjoint from the training stream.
"""

import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import random

from ..evaluation.metrics import evaluate_segmentation_batch
from .losses import bce_dice_loss

__all__ = ["CoherentTrainer", "coherent_batch"]


def _to_8ch(tf):
    """(4, T, F) complex -> (T, F, 8) = 4 pols x (re, im), the
    reference's channel order (scripts/generate_dataset.py:24-36)."""
    return jnp.stack(
        [tf[0].real, tf[0].imag, tf[1].real, tf[1].imag,
         tf[2].real, tf[2].imag, tf[3].real, tf[3].imag],
        axis=-1,
    )


def _robust_scale(x):
    """Per-sample robust scale over ALL channels jointly: (x - median) /
    IQR — what ``normalize_rfi_data --normalization robust_scale`` does
    per input.npy file (reference scripts/normalize_rfi_data.py:30-38,
    RobustScaler fit on the whole file)."""
    flat = x.reshape(-1)
    med = jnp.median(flat)
    iqr = jnp.percentile(flat, 75) - jnp.percentile(flat, 25)
    return (x - med) / jnp.maximum(iqr, 1e-12)


def coherent_batch(key, n, size, seed=0):
    """A normalized (n, size, size, 8) batch + bool masks from the
    coherent simulator — the held-out evaluation convention of the
    pretrained quality gates (tests/test_pretrained.py)."""
    from ..synth.simulator import RFISimulator

    sim = RFISimulator(time_bins=size, freq_bins=size, seed=seed)
    tf, mask = jax.vmap(sim.generate_rfi_device)(random.split(key, n))
    x = jax.vmap(lambda t: _robust_scale(_to_8ch(t)))(tf)
    return x.astype(jnp.float32), mask > 0.5


class CoherentTrainer:
    """Train an 8-channel UNet on device-generated coherent samples.

    >>> trainer = CoherentTrainer(init_features=24, size=256)
    >>> trainer.fit(num_steps=36_000, checkpoint_dir="ckpts")
    >>> report = trainer.evaluate()           # held-out IoU sweep
    >>> trainer.export("unet24.npz", best_threshold=report["best_threshold"])

    Args:
        init_features: UNet width (the shipped ladder: 16 -> 0.855,
            24 -> 0.8673, 32 -> 0.8602 held-out IoU; capacity saturates
            at 24 on this task).
        size: square sample size used for training (and recorded as
            ``train_size`` in exported metadata).
        learning_rate: float or optax schedule. None builds the recipe
            default at ``fit`` time: warmup-cosine 0 -> 1e-3 over the
            first 500 steps, decaying to 1e-5 at ``num_steps``.
        ema_decay: EMA coefficient for the shipped weights (0 disables).
        flips: random independent time/freq flips per sample.
        dtype: model compute dtype; "auto" = bfloat16 on TPU (MXU),
            float32 elsewhere.
        mesh: optional ``jax.sharding.Mesh`` with a ``'data'`` axis for
            SPMD data parallelism: params/EMA/optimizer state are
            replicated, per-sample generation + fwd/bwd shard over
            'data' (a sharding constraint on the per-sample key batch
            — XLA partitions the vmap and inserts the grad psum).
            ``batch_size`` must divide by the axis size. Numerics are
            identical to the single-device run (same key stream).
        norm: UNet normalization for the default-constructed model.
            "batch" is reference parity but its running-stats
            calibration is UNSTABLE on this heavy-tailed task (held-out
            eval-mode IoU oscillated 0.51-0.86 across a 64k-step
            checkpoint ladder while train-mode quality rose
            monotonically to 0.90 — BASELINE.md round-3 notes);
            "group" (GroupNorm) has no train/eval inconsistency and is
            the recommended setting for long runs.
        space_to_depth: build the MXU-packed UNet variant (see
            models/unet.py — the whole network runs at half spatial
            resolution; ~1.8x faster per step at the bench shapes).
            Recorded in exported snapshot metadata so ``load`` /
            serving / the eval CLIs reconstruct it.
    """

    def __init__(
        self,
        model=None,
        init_features=24,
        size=256,
        batch_size=16,
        learning_rate=None,
        weight_decay=1e-5,
        ema_decay=0.999,
        flips=True,
        seed=2,
        dtype="auto",
        mesh=None,
        norm="batch",
        space_to_depth=False,
    ):
        if dtype == "auto":
            dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else jnp.float32)
        if model is None:
            from ..models.unet import UNet

            model = UNet(init_features=init_features, dtype=dtype, norm=norm,
                         space_to_depth=space_to_depth)
        self.model = model
        self.init_features = model.init_features
        self.size = size
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.ema_decay = ema_decay
        self.flips = flips
        self.seed = seed
        if mesh is not None:
            ndata = mesh.shape.get("data", 1)
            if batch_size % ndata:
                raise ValueError(
                    f"batch_size={batch_size} must divide the mesh's "
                    f"'data' axis ({ndata})"
                )
        self.mesh = mesh
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self.ema_params = None
        self.tx = None
        self.step = 0
        self._fused = None
        self._sample = self._make_sample_fn()

    # -- data ---------------------------------------------------------------
    def _make_sample_fn(self):
        from ..synth.simulator import RFISimulator

        sim = RFISimulator(time_bins=self.size, freq_bins=self.size,
                           seed=self.seed)
        flips = self.flips

        def sample(key):
            k_gen, k_t, k_f = random.split(key, 3)
            tf, mask = sim.generate_rfi_device(k_gen)
            x = _robust_scale(_to_8ch(tf))
            y = (mask > 0.5).astype(jnp.float32)
            if flips:
                ft = random.bernoulli(k_t)
                x = jnp.where(ft, x[::-1], x)
                y = jnp.where(ft, y[::-1], y)
                ff = random.bernoulli(k_f)
                x = jnp.where(ff, x[:, ::-1], x)
                y = jnp.where(ff, y[:, ::-1], y)
            return x.astype(jnp.float32), y

        return sample

    # -- optimization -------------------------------------------------------
    def _build_tx(self, num_steps):
        lr = self.learning_rate
        if lr is None:
            lr = optax.warmup_cosine_decay_schedule(
                0.0, 1e-3, 500, max(num_steps, 501), end_value=1e-5
            )
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lr, weight_decay=self.weight_decay),
        )

    def _init(self):
        key = random.key(self.seed)
        x = jnp.zeros((1, self.size, self.size, 8), jnp.float32)
        variables = self.model.init(key, x, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        # a true copy — ema and params are donated separately, so they
        # must not alias the same device buffers
        self.ema_params = jax.tree.map(jnp.copy, self.params)
        if self.mesh is not None:
            from ..parallel.mesh import replicated

            rep = replicated(self.mesh)
            put = partial(jax.tree.map, lambda a: jax.device_put(a, rep))
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)
            self.ema_params = put(self.ema_params)

    def _make_fused(self):
        model, tx, sample = self.model, self.tx, self._sample
        batch_size, ema_decay = self.batch_size, self.ema_decay
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            key_sharding = NamedSharding(mesh, PartitionSpec("data"))

        def one_step(params, batch_stats, opt_state, ema, key):
            keys = random.split(key, batch_size)
            if mesh is not None:
                # shard the per-sample axis; generation, fwd and bwd
                # partition over 'data' and XLA psums the grads back
                # onto the replicated params
                keys = jax.lax.with_sharding_constraint(keys, key_sharding)
            x, y = jax.vmap(sample)(keys)

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x, train=True, mutable=["batch_stats"],
                )
                logits = out[..., 0]
                return bce_dice_loss(logits, y), mut["batch_stats"]

            (loss, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_decay:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    ema, params,
                )
            else:
                ema = params
            return params, batch_stats, opt_state, ema, loss

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def fused(params, batch_stats, opt_state, ema, keys):
            def body(carry, key):
                params, batch_stats, opt_state, ema = carry
                params, batch_stats, opt_state, ema, loss = one_step(
                    params, batch_stats, opt_state, ema, key
                )
                return (params, batch_stats, opt_state, ema), loss

            carry, losses = jax.lax.scan(
                body, (params, batch_stats, opt_state, ema), keys
            )
            return (*carry, losses)

        return fused

    # -- main loop ----------------------------------------------------------
    def fit(self, num_steps, fused_steps=20, log_every=1000,
            checkpoint_dir=None, checkpoint_every=4000, callback=None):
        """Train for ``num_steps`` more steps (resuming counts continue).

        One ``lax.scan`` program runs ``fused_steps`` generate+optimize
        pairs per dispatch. ``callback(step, mean_loss)`` fires at every
        log point. Returns {'history': [...]}.
        """
        if self.tx is None:
            self._build_tx(self.step + num_steps)
        if self.params is None:
            self._init()
        if self._fused is None:
            self._fused = self._make_fused()
        checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None

        # per-step keys are fold_in(base, step_index): O(1) to resume at
        # any step, and a resumed run continues the exact sample stream
        base = random.fold_in(random.key(self.seed), 1)

        history = []
        t0 = time.perf_counter()
        done = 0
        next_log = log_every
        next_ckpt = checkpoint_every
        losses_acc = []
        while done < num_steps:
            k = min(fused_steps, num_steps - done)
            ks = jax.vmap(lambda i: random.fold_in(base, i))(
                jnp.arange(self.step, self.step + k)
            )
            (self.params, self.batch_stats, self.opt_state,
             self.ema_params, losses) = self._fused(
                self.params, self.batch_stats, self.opt_state,
                self.ema_params, ks,
            )
            done += k
            self.step += k
            losses_acc.append(losses)
            if done >= next_log or done >= num_steps:
                mean_loss = float(jnp.mean(jnp.concatenate(losses_acc)))
                losses_acc = []
                dt = time.perf_counter() - t0
                rec = {"step": self.step, "loss": mean_loss,
                       "steps_per_sec": done / dt}
                history.append(rec)
                if callback is not None:
                    callback(self.step, mean_loss)
                next_log = (done // log_every + 1) * log_every
            if checkpoint_dir is not None and (
                done >= next_ckpt or done >= num_steps
            ):
                self.save_checkpoint(checkpoint_dir / f"step_{self.step}")
                next_ckpt = (done // checkpoint_every + 1) * checkpoint_every
        return {"history": history}

    # -- evaluation ---------------------------------------------------------
    def _eval_params(self, use_ema=True):
        p = self.ema_params if (use_ema and self.ema_params is not None) \
            else self.params
        return p, self.batch_stats

    def evaluate(self, num_batches=8, eval_batch=8, start_key=10_000,
                 thresholds=None, tta=False, use_ema=True):
        """Held-out IoU sweep on the fixed key stream disjoint from
        training (keys ``start_key + j`` — the pretrained-gate
        convention). Returns {'best_threshold', 'best_iou', 'ious'}."""
        if thresholds is None:
            thresholds = np.round(np.arange(0.2, 0.75, 0.05), 2)
        params, batch_stats = self._eval_params(use_ema)

        @jax.jit
        def probs_fn(x):
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False,
            )
            return jax.nn.sigmoid(out[..., 0])

        return self._sweep(probs_fn, num_batches, eval_batch, start_key,
                           thresholds, tta)

    def _sweep(self, probs_fn, num_batches, eval_batch, start_key,
               thresholds, tta):
        sums = {float(t): [] for t in thresholds}
        for j in range(num_batches):
            x, gt = coherent_batch(random.key(start_key + j), eval_batch,
                                   self.size, seed=0)
            p = probs_fn(x)
            if tta:
                p = (
                    p
                    + probs_fn(x[:, ::-1])[:, ::-1]
                    + probs_fn(x[:, :, ::-1])[:, :, ::-1]
                    + probs_fn(x[:, ::-1, ::-1])[:, ::-1, ::-1]
                ) / 4
            for t in thresholds:
                m = evaluate_segmentation_batch(p > float(t), gt)
                sums[float(t)].append(float(np.mean(np.asarray(m["iou"]))))
        ious = {t: float(np.mean(v)) for t, v in sums.items()}
        best_t = max(ious, key=ious.get)
        return {"best_threshold": best_t, "best_iou": ious[best_t],
                "ious": ious}

    def calibration_gap(self, num_batches=4, eval_batch=8,
                        start_key=10_000, thresholds=None, use_ema=True):
        """BatchNorm health check: held-out best-IoU in eval mode
        (running averages) MINUS train mode (batch statistics).

        A well-calibrated model has |gap| near 0; a large negative gap
        means the running averages track no typical batch and the
        snapshot's eval-mode quality is unreliable — the failure the
        64k BatchNorm coherent run exposed (train-mode 0.90 vs
        eval-mode 0.56; BASELINE.md round-3 finding). GroupNorm models
        return exactly 0.0 by construction. Returns {'gap',
        'eval_mode', 'train_mode'} (the *_mode values are evaluate()
        reports)."""
        if thresholds is None:
            thresholds = np.round(np.arange(0.2, 0.75, 0.05), 2)
        params, batch_stats = self._eval_params(use_ema)

        @jax.jit
        def probs_batchstats(x):
            out, _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return jax.nn.sigmoid(out[..., 0])

        eval_mode = self.evaluate(num_batches, eval_batch, start_key,
                                  thresholds, use_ema=use_ema)
        train_mode = self._sweep(probs_batchstats, num_batches,
                                 eval_batch, start_key, thresholds,
                                 tta=False)
        return {
            "gap": eval_mode["best_iou"] - train_mode["best_iou"],
            "eval_mode": eval_mode,
            "train_mode": train_mode,
        }

    # -- persistence --------------------------------------------------------
    def export(self, path, best_threshold=0.5, use_ema=True, extra_meta=None):
        """Ship an inference snapshot (EMA weights by default) in the
        ``pretrained/unet*_coherent8ch.npz`` format."""
        from .trainer import export_params

        params, batch_stats = self._eval_params(use_ema)
        meta = {
            "model": "UNet",
            "init_features": self.init_features,
            "norm": getattr(self.model, "norm", "batch"),
            "space_to_depth": bool(
                getattr(self.model, "space_to_depth", False)
            ),
            "in_channels": 8,
            "normalization": "robust_scale",
            "normalization_scope": "per_sample",
            "train_size": [self.size, self.size],
            "best_threshold": float(best_threshold),
            "steps": int(self.step),
            "ema_decay": self.ema_decay,
        }
        meta.update(extra_meta or {})
        return export_params(params, path, batch_stats=batch_stats,
                             metadata=meta)

    def save_checkpoint(self, path):
        """Full Orbax checkpoint: params + batch_stats + EMA + optimizer
        state + step — continuation-grade (a fresh-optimizer restart of
        an EMA run regresses; BASELINE.md round-3 rejected experiments)."""
        import orbax.checkpoint as ocp

        tree = {
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
            "opt_state": jax.device_get(self.opt_state),
            "ema_params": jax.device_get(self.ema_params),
            "step": int(self.step),
        }
        ocp.PyTreeCheckpointer().save(Path(path).absolute(), tree, force=True)
        return path

    def restore_checkpoint(self, path, num_steps_hint=None):
        """Restore a :meth:`save_checkpoint` tree; returns the stored
        step. ``num_steps_hint`` rebuilds the default schedule against
        the original total when resuming (pass the run's planned total)."""
        import orbax.checkpoint as ocp

        if self.tx is None:
            self._build_tx(num_steps_hint or 36_000)
        if self.params is None:
            self._init()
        tree = ocp.PyTreeCheckpointer().restore(Path(path).absolute())
        _, treedef = jax.tree.flatten(self.opt_state)
        self.opt_state = jax.tree.unflatten(
            treedef, jax.tree.leaves(tree["opt_state"])
        )
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        self.ema_params = tree["ema_params"]
        self.step = int(tree.get("step", 0))
        if self.mesh is not None:
            from ..parallel.mesh import replicated

            rep = replicated(self.mesh)
            put = partial(jax.tree.map, lambda a: jax.device_put(a, rep))
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)
            self.ema_params = put(self.ema_params)
        return self.step

    @classmethod
    def load(cls, path, **kwargs):
        """Rebuild a trainer around an exported inference snapshot
        (fresh optimizer — prefer :meth:`restore_checkpoint` to continue
        a run)."""
        from .trainer import load_params

        params, batch_stats, meta = load_params(path)
        size = int(meta.get("train_size", [256, 256])[0])
        kwargs.setdefault("norm", meta.get("norm", "batch"))
        kwargs.setdefault("space_to_depth",
                          bool(meta.get("space_to_depth", False)))
        trainer = cls(init_features=meta["init_features"], size=size,
                      **kwargs)
        trainer._build_tx(36_000)
        trainer._init()
        trainer.params = params
        trainer.ema_params = jax.tree.map(np.copy, params)
        trainer.batch_stats = batch_stats
        return trainer
