"""Training loop: optax + jitted steps + Orbax checkpointing.

Rebuild of the reference training script (scripts/train_model.py:82-197)
as a library:

- loss = BCEWithLogits + Dice(smooth=1), Adam(+weight decay), global
  grad-norm clip 1.0 — same recipe (train_model.py:120-151)
- the reference's AMP GradScaler is unnecessary on TPU: compute runs in
  bfloat16 via the model dtype (no loss scaling needed for bf16)
- NaN validation loss stops training (train_model.py:170-172)
- best-val checkpointing AND working resume via Orbax — the reference
  parses --checkpoint_path/--new_lr but never uses them
  (train_model.py:93-94); here ``Trainer.restore`` actually restores
  params/opt_state/epoch
- data parallelism: batches are sharded over the mesh 'data' axis and
  params replicated; the jitted step then runs SPMD over all chips with
  XLA inserting gradient all-reduces (replaces torch DataLoader workers
  + single-device training).
"""

import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..evaluation.metrics import evaluate_segmentation_batch
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .losses import bce_dice_loss

__all__ = ["TrainState", "Trainer", "create_train_state", "train_steps"]


class TrainState(train_state.TrainState):
    """TrainState carrying BatchNorm running statistics."""

    batch_stats: dict


def create_train_state(
    model,
    key,
    input_shape,
    learning_rate=1e-4,
    weight_decay=1e-5,
    clip_norm=1.0,
):
    """Initialize params/batch_stats and the optax chain
    (clip-by-global-norm 1.0 -> adamw, matching train_model.py:130, 149)."""
    variables = model.init(key, jnp.zeros(input_shape, jnp.float32), train=False)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _loss_fn(params, batch_stats, apply_fn, images, labels, train):
    outputs, mutated = apply_fn(
        {"params": params, "batch_stats": batch_stats},
        images,
        train=train,
        mutable=["batch_stats"] if train else [],
    )
    logits = outputs[..., 0] if outputs.ndim == 4 else outputs
    loss = bce_dice_loss(logits, labels)
    return loss, (mutated, logits)


@partial(jax.jit, donate_argnums=(0,))
def train_step(state, images, labels):
    """One SPMD optimization step. Inputs may carry any sharding; XLA
    partitions the step and all-reduces the grads. The incoming state is
    donated (its buffers are reused for the updated state)."""
    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
    (loss, (mutated, _)), grads = grad_fn(
        state.params, state.batch_stats, state.apply_fn, images, labels, True
    )
    state = state.apply_gradients(grads=grads)
    if mutated:
        state = state.replace(batch_stats=mutated["batch_stats"])
    return state, loss


@partial(jax.jit, donate_argnums=(0,))
def train_steps(state, images, labels):
    """Scan-fused multi-minibatch optimization: images/labels come
    pre-chunked as (S, B, ...) and all S steps run inside ONE compiled
    program via ``lax.scan``.

    Why this exists: a Python loop of ``train_step`` calls pays one
    dispatch per minibatch — over a remote-TPU control channel that
    round-trip dominates small steps, and even locally the donated
    state serializes the queue. One scan = one dispatch, and XLA
    overlaps the epilogue/prologue of adjacent steps. Numerics are
    IDENTICAL to S sequential train_step calls (asserted in
    tests/test_train.py).

    Returns (state, losses) with losses shape (S,).
    """

    def body(st, batch):
        imgs, lbls = batch
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, (mutated, _)), grads = grad_fn(
            st.params, st.batch_stats, st.apply_fn, imgs, lbls, True
        )
        st = st.apply_gradients(grads=grads)
        if mutated:
            st = st.replace(batch_stats=mutated["batch_stats"])
        return st, loss

    return jax.lax.scan(body, state, (images, labels))


@jax.jit
def eval_step(state, images, labels):
    loss, (_, logits) = _loss_fn(
        state.params, state.batch_stats, state.apply_fn, images, labels, False
    )
    preds = jax.nn.sigmoid(logits) > 0.5
    return loss, preds


@partial(jax.jit, static_argnames=("apply_fn", "threshold"))
def _predict_fwd(params, batch_stats, chunk, apply_fn, threshold):
    logits = apply_fn(
        {"params": params, "batch_stats": batch_stats}, chunk, train=False
    )
    logits = logits[..., 0] if logits.ndim == 4 else logits
    return jax.nn.sigmoid(logits) > threshold


@partial(jax.jit, static_argnames=("apply_fn", "threshold"))
def _predict_fwd_tta(params, batch_stats, chunk, apply_fn, threshold):
    """Flip-averaged test-time augmentation: ONE program runs all four
    D2 flip variants (identity, time, freq, both) as a single 4B-batch
    forward — XLA sees one big conv workload, not four dispatches —
    then un-flips and averages the probabilities before thresholding.
    RFI morphology is flip-covariant (the training augmentation relies
    on the same symmetry), so averaging cancels orientation-dependent
    errors."""
    variants = jnp.concatenate(
        [chunk, chunk[:, ::-1], chunk[:, :, ::-1], chunk[:, ::-1, ::-1]]
    )
    logits = apply_fn(
        {"params": params, "batch_stats": batch_stats}, variants, train=False
    )
    logits = logits[..., 0] if logits.ndim == 4 else logits
    probs = jax.nn.sigmoid(logits)
    b = chunk.shape[0]
    mean = (
        probs[:b]
        + probs[b : 2 * b][:, ::-1]
        + probs[2 * b : 3 * b][:, :, ::-1]
        + probs[3 * b :][:, ::-1, ::-1]
    ) / 4
    return mean > threshold


def _grouped(batches, k):
    """Group consecutive (images, labels) minibatches of identical
    shape into lists of up to k (a shape change — e.g. a final partial
    batch — flushes the current group so scan inputs stay rectangular)."""
    buf = []
    for b in batches:
        if buf and (len(buf) == k
                    or np.shape(b[0]) != np.shape(buf[0][0])):
            yield buf
            buf = []
        buf.append(b)
    if buf:
        yield buf


def _iter_batches(images, labels, batch_size, rng=None, drop_remainder=True):
    n = len(images)
    idx = rng.permutation(n) if rng is not None else np.arange(n)
    end = n - (n % batch_size) if drop_remainder and n >= batch_size else n
    for start in range(0, end, batch_size):
        sel = idx[start : start + batch_size]
        yield images[sel], labels[sel]


def _as_stream(dataset):
    """Normalize a dataset argument: a directory path or StreamingDataset
    returns a StreamingDataset (bounded-RAM file streaming); an
    ArrayDataset-like returns None (in-memory path)."""
    from ..data.batched_dataset import StreamingDataset

    if isinstance(dataset, StreamingDataset):
        return dataset
    if isinstance(dataset, (str, Path)):
        return StreamingDataset(dataset)
    return None


def _load_if_file(dataset):
    """A path to a single .npz/.pt dataset file loads in-memory; batch
    directories and in-memory datasets pass through untouched."""
    if isinstance(dataset, (str, Path)) and Path(dataset).is_file():
        from ..data.batched_dataset import ArrayDataset

        return ArrayDataset.load_from_disk(dataset)
    return dataset


class Trainer:
    """Segmentation model trainer with sharded data parallelism.

    >>> trainer = Trainer(model, checkpoint_dir="ckpts")
    >>> result = trainer.fit(train_ds, val_ds, num_epochs=10, batch_size=32)
    """

    def __init__(
        self,
        model,
        learning_rate=1e-4,
        weight_decay=1e-5,
        checkpoint_dir=None,
        mesh=None,
        mesh_shape=None,
        tp_min_features=256,
        seed=0,
    ):
        """Args:
            mesh: explicit jax.sharding.Mesh; axes named 'data' (+
                optionally 'model' for tensor parallelism).
            mesh_shape: (data, model) tuple — the TrainingConfig
                ``mesh_shape`` knob. Builds a ('data','model') mesh over
                jax.devices(); a model axis >1 turns on tensor-parallel
                sharding of wide conv kernels (parallel/mesh.py:85-108).
                Mutually exclusive with ``mesh``.
            tp_min_features: smallest conv output-feature dim that gets
                sharded over 'model' (smaller kernels stay replicated —
                all-reduce cost would beat the FLOP win).
        """
        self.model = model
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        if mesh is not None and mesh_shape is not None:
            raise ValueError("pass either mesh or mesh_shape, not both")
        if mesh_shape is not None:
            mesh = make_mesh(shape=tuple(mesh_shape),
                             axis_names=("data", "model"))
        self.mesh = mesh if mesh is not None else make_mesh(axis_names=("data",))
        self.tp_min_features = tp_min_features
        self.seed = seed
        self.state = None
        self.history = []

    @property
    def _tp_axis_size(self):
        return self.mesh.shape.get("model", 1)

    def _shard_stacked(self, imgs, lbls):
        """Place (S, B, ...) scan inputs with the batch dim (axis 1)
        sharded over 'data' (replicated when B doesn't divide the axis)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = self.mesh.shape["data"]
        if imgs.shape[1] % n == 0:
            sh = NamedSharding(self.mesh, P(None, "data"))
        else:
            sh = replicated(self.mesh)
        return jax.device_put(imgs, sh), jax.device_put(lbls, sh)

    # -- checkpointing ----------------------------------------------------
    def _checkpointer(self):
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer()

    def save_checkpoint(self, name, epoch, loss):
        if self.checkpoint_dir is None:
            return None
        path = (self.checkpoint_dir / name).absolute()
        tree = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "epoch": epoch,
            "loss": float(loss),
        }
        ckptr = self._checkpointer()
        ckptr.save(path, tree, force=True)
        return path

    def latest_checkpoint(self):
        """Newest checkpoint directory under checkpoint_dir, or None —
        enables crash-resumable training (fit(resume_from='auto'))."""
        if self.checkpoint_dir is None or not self.checkpoint_dir.exists():
            return None
        candidates = [p for p in self.checkpoint_dir.iterdir() if p.is_dir()]
        if not candidates:
            return None
        return max(candidates, key=lambda p: p.stat().st_mtime)

    def restore(self, path, input_shape):
        """Real resume: restore params/batch_stats/opt_state and return
        the stored epoch (the reference never implemented this)."""
        ckptr = self._checkpointer()
        tree = ckptr.restore(Path(path).absolute())
        self.state = self._init_state(input_shape)
        # Orbax restores tuples as lists; rebuild the optax state pytree
        # from the freshly-initialized state's structure.
        _, treedef = jax.tree.flatten(self.state.opt_state)
        opt_state = jax.tree.unflatten(treedef, jax.tree.leaves(tree["opt_state"]))

        def _like(template, restored):
            # place restored host arrays with the template's sharding so
            # tp/replication layouts survive a resume
            return jax.tree.map(
                lambda t, a: jax.device_put(a, t.sharding)
                if hasattr(t, "sharding") else a,
                template, restored,
            )

        self.state = self.state.replace(
            params=_like(self.state.params, tree["params"]),
            batch_stats=_like(self.state.batch_stats, tree["batch_stats"]),
            opt_state=_like(self.state.opt_state, opt_state),
        )
        return int(tree.get("epoch", 0))

    def _init_state(self, input_shape):
        key = jax.random.key(self.seed)
        state = create_train_state(
            self.model,
            key,
            (1, *input_shape),
            self.learning_rate,
            self.weight_decay,
        )
        # Replicate state over the mesh; batches arrive data-sharded.
        # With a model axis >1, wide conv kernels (and their optimizer
        # moments) are instead sharded over 'model' — XLA partitions the
        # matching convs and all-reduces the partial sums over ICI.
        rep = replicated(self.mesh)
        state = jax.tree.map(lambda a: jax.device_put(a, rep), state)
        if self._tp_axis_size > 1:
            from ..parallel.mesh import shard_params_tensor_parallel

            tp = partial(
                shard_params_tensor_parallel,
                mesh=self.mesh,
                min_features=self.tp_min_features,
                axis="model",
            )
            # adam mu/nu mirror the param tree; shard them the same way
            # so optimizer memory also scales down with tp (the rule
            # replicates anything below min_features, incl. scalars)
            state = state.replace(
                params=tp(state.params),
                opt_state=tp(state.opt_state),
            )
        return state

    # -- main loop --------------------------------------------------------
    def fit(
        self,
        train_dataset,
        val_dataset=None,
        num_epochs=10,
        batch_size=8,
        log_every=50,
        resume_from=None,
        fused_steps=8,
    ):
        """Train; returns {'best_val_loss', 'history', 'epochs_run'}.

        Datasets are either ArrayDataset-likes with .images (N,H,W,C)
        float32 and .labels (N,H,W) uint8 (fully in memory), or a
        BatchWriter output directory / :class:`StreamingDataset` —
        streamed file-by-file with a prefetch thread and bounded host
        RAM, which is how the reference's 4000 x 1024^2 flagship config
        (synthetic_train_4k.yaml) trains on a normal host.

        ``fused_steps``: groups of up to K consecutive minibatches run
        as ONE ``lax.scan`` program (:func:`train_steps`) — one dispatch
        per group instead of per minibatch, numerics identical to the
        sequential path. 1 disables fusion.
        """
        train_dataset = _load_if_file(train_dataset)
        val_dataset = _load_if_file(val_dataset) if val_dataset is not None \
            else None
        train_stream = _as_stream(train_dataset)
        if train_stream is not None:
            input_shape = tuple(train_stream.image_shape)
        else:
            images = np.asarray(train_dataset.images, dtype=np.float32)
            labels = np.asarray(train_dataset.labels, dtype=np.float32)
            input_shape = images.shape[1:]
        val_stream = _as_stream(val_dataset) if val_dataset is not None else None

        start_epoch = 0
        if resume_from == "auto":
            resume_from = self.latest_checkpoint()
        if resume_from is not None:
            start_epoch = self.restore(resume_from, input_shape)
        elif self.state is None:
            self.state = self._init_state(input_shape)

        if val_dataset is not None and val_stream is None:
            # convert once, not per epoch (the reference-scale val set is
            # 1000 x 1024^2 — per-epoch np.asarray churn is pure waste)
            val_images = np.asarray(val_dataset.images, dtype=np.float32)
            val_labels = np.asarray(val_dataset.labels, dtype=np.float32)
        best_val = float("inf")
        best_path = None
        # A resume that already reached num_epochs runs zero epochs;
        # the final save must still work.
        train_loss = float("nan")

        for epoch in range(start_epoch, num_epochs):
            t0 = time.perf_counter()
            train_losses = []
            # Shuffle keyed by (seed, epoch), not by a running RNG: a
            # resumed run replays the uninterrupted run's exact data
            # order, making resume == uninterrupted bit-for-bit
            # (asserted in tests/test_distributed.py under 2-process dp).
            rng = np.random.default_rng((self.seed, epoch))
            batches = (
                train_stream.iter_epoch(batch_size, rng)
                if train_stream is not None
                else _iter_batches(images, labels, batch_size, rng)
            )
            for group in _grouped(batches, max(1, int(fused_steps))):
                if len(group) > 1:
                    imgs = np.stack(
                        [np.asarray(b[0], np.float32) for b in group]
                    )
                    lbls = np.stack(
                        [np.asarray(b[1], np.float32) for b in group]
                    )
                    imgs, lbls = self._shard_stacked(imgs, lbls)
                    self.state, losses = train_steps(self.state, imgs, lbls)
                    train_losses.extend(losses)
                else:
                    bi, bl = group[0]
                    bi, bl = shard_batch(
                        (np.asarray(bi, np.float32),
                         np.asarray(bl, np.float32)),
                        self.mesh,
                    )
                    self.state, loss = train_step(self.state, bi, bl)
                    train_losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(train_losses)))

            record = {
                "epoch": epoch + 1,
                "train_loss": train_loss,
                "seconds": time.perf_counter() - t0,
            }

            if val_dataset is not None:
                val_losses = []
                metrics_acc = []
                val_batches = (
                    val_stream.iter_epoch(batch_size)
                    if val_stream is not None
                    else _iter_batches(val_images, val_labels, batch_size)
                )
                for bi, bl in val_batches:
                    bi, bl = shard_batch(
                        (np.asarray(bi, np.float32),
                         np.asarray(bl, np.float32)),
                        self.mesh,
                    )
                    loss, preds = eval_step(self.state, bi, bl)
                    val_losses.append(loss)
                    m = evaluate_segmentation_batch(preds, bl > 0.5)
                    metrics_acc.append({k: float(v.mean()) for k, v in m.items()})
                if not val_losses:
                    raise ValueError(
                        "validation dataset produced no batches"
                    )
                val_loss = float(jnp.mean(jnp.stack(val_losses)))
                record["val_loss"] = val_loss
                for k in metrics_acc[0]:
                    record[f"val_{k}"] = float(
                        np.mean([m[k] for m in metrics_acc])
                    )

                if np.isnan(val_loss):
                    # NaN early stop (train_model.py:170-172)
                    self.history.append(record)
                    break
                if val_loss < best_val:
                    best_val = val_loss
                    best_path = self.save_checkpoint(
                        f"unet_rfi_epoch_{epoch + 1}", epoch + 1, val_loss
                    )
            self.history.append(record)

        final_path = self.save_checkpoint("unet_rfi_final", num_epochs, train_loss)
        return {
            "best_val_loss": best_val,
            "best_checkpoint": str(best_path) if best_path else None,
            "final_checkpoint": str(final_path) if final_path else None,
            "history": self.history,
            "epochs_run": len(self.history),
        }

    # -- inference --------------------------------------------------------
    def predict(self, images, batch_size=32, threshold=0.5, tta=False):
        """Binary masks for (N,H,W,C) images. The forward is a
        module-level cached jit (a per-call closure would recompile on
        every predict), and EVERY partial chunk — including a whole
        request smaller than batch_size — pads up to batch_size so only
        one shape ever compiles (same contract as
        ``serving.CompiledPredictor``).

        ``tta=True`` averages sigmoid probabilities over the four flip
        orientations (4x forward cost, one fused program) before
        thresholding — worth ~+0.005-0.01 IoU on the 8-channel
        coherent pipeline (pretrained/README.md)."""
        fwd = _predict_fwd_tta if tta else _predict_fwd
        images = np.asarray(images, dtype=np.float32)
        n = len(images)
        out = []
        for start in range(0, n, batch_size):
            chunk = images[start : start + batch_size]
            valid = len(chunk)
            if valid < batch_size:
                pad = np.zeros((batch_size - valid, *chunk.shape[1:]),
                               chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            preds = fwd(self.state.params, self.state.batch_stats,
                        jnp.asarray(chunk), self.state.apply_fn,
                        float(threshold))
            out.append(np.asarray(preds)[:valid])
        if not out:
            return np.zeros((0, *images.shape[1:3]), bool)
        return np.concatenate(out)


def export_params(state_or_params, path, batch_stats=None, metadata=None):
    """Write a compact inference snapshot: flattened params (and batch
    stats) as one .npz — ~3x smaller than a full Orbax checkpoint (no
    optimizer state) and a single file, suitable for shipping
    pretrained weights.
    """
    import json as _json

    from flax.traverse_util import flatten_dict

    if hasattr(state_or_params, "params"):
        params = state_or_params.params
        batch_stats = state_or_params.batch_stats
    else:
        params = state_or_params
    arrays = {}
    for key, val in flatten_dict(jax.device_get(params)).items():
        arrays["params/" + "/".join(key)] = np.asarray(val)
    for key, val in flatten_dict(jax.device_get(batch_stats or {})).items():
        arrays["batch_stats/" + "/".join(key)] = np.asarray(val)
    arrays["__metadata__"] = np.bytes_(_json.dumps(metadata or {}).encode())
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_params(path):
    """Load an :func:`export_params` snapshot.

    Returns (params, batch_stats, metadata) as nested dicts ready for
    ``model.apply({"params": params, "batch_stats": batch_stats}, ...)``.
    """
    import json as _json

    from flax.traverse_util import unflatten_dict

    params_flat, stats_flat = {}, {}
    metadata = {}
    with np.load(path, allow_pickle=False) as z:
        for key in z.files:
            if key == "__metadata__":
                metadata = _json.loads(bytes(z[key]).decode())
            elif key.startswith("params/"):
                params_flat[tuple(key[len("params/"):].split("/"))] = z[key]
            elif key.startswith("batch_stats/"):
                stats_flat[tuple(key[len("batch_stats/"):].split("/"))] = z[key]
    return (
        unflatten_dict(params_flat),
        unflatten_dict(stats_flat),
        metadata,
    )
