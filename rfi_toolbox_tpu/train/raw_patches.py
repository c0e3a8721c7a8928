"""On-device training from RAW complex patches.

Completes the ``DevicePreprocessor`` path (the reference's
``GPUPreprocessor`` hands off to an *external* GPUTransformDataset it
doesn't ship, preprocessor.py:810-815): training consumes raw complex
patches directly, and every per-step transform — random rotation
augmentation (the {id, flipud, T, flipud.T} group), 3-channel
extraction, ImageNet normalization — runs inside the jitted train step
on device. Compared to pre-materialized 3-channel float32 datasets this
stores half the bytes, skips the 4x augmentation copies entirely, and
sees a *different* augmentation draw every epoch instead of a frozen 4x
expansion.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..preprocess import pipeline as P

__all__ = ["augment_batch", "make_raw_patch_step", "RawPatchTrainer"]


@jax.jit
def augment_batch(key, patches, masks):
    """Random per-sample dihedral-subgroup augmentation on device.

    Each sample independently draws one of {id, flipud, transpose,
    flipud(transpose)} — the same group the reference materializes as a
    4x dataset copy (preprocessor.py:413-446). Square patches only.
    """
    n = patches.shape[0]
    choice = jax.random.randint(key, (n,), 0, 4)

    def one(c, x, m):
        def t0(a):
            return a

        def t1(a):
            return jnp.flip(a, axis=0)

        def t2(a):
            return a.T

        def t3(a):
            return jnp.flip(a.T, axis=0)

        branches = [t0, t1, t2, t3]
        return (
            jax.lax.switch(c, branches, x),
            jax.lax.switch(c, branches, m),
        )

    return jax.vmap(one)(choice, patches, masks)


def make_raw_patch_step(train_step, use_pallas="auto"):
    """Wrap a (state, images, labels) train step into a raw-patch step
    (state, key, complex_patches, masks) with on-device transforms."""
    if use_pallas == "auto":
        use_pallas = jax.default_backend() != "cpu"

    @jax.jit
    def step(state, key, patches, masks):
        patches, masks = augment_batch(key, patches, masks)
        if use_pallas:
            from ..ops import fused_extract_channels

            images = fused_extract_channels(patches)
        else:
            images = P.imagenet_normalize(P.extract_channels(patches))
        return train_step(state, images, masks.astype(jnp.float32))

    return step


class RawPatchTrainer:
    """Trainer over raw complex patches (DevicePreprocessor output).

    >>> raw, masks = DevicePreprocessor(vis, flags).create_raw_patches()
    >>> trainer = RawPatchTrainer(model)
    >>> result = trainer.fit(raw, masks, num_epochs=10, batch_size=32)
    """

    def __init__(self, model, learning_rate=1e-4, weight_decay=1e-5,
                 seed=0, use_pallas="auto"):
        from .trainer import create_train_state, train_step

        self.model = model
        self.seed = seed
        self._create_state = partial(
            create_train_state,
            model,
            learning_rate=learning_rate,
            weight_decay=weight_decay,
        )
        self._step = make_raw_patch_step(train_step, use_pallas)
        self.state = None

    def fit(self, raw_patches, masks, num_epochs=10, batch_size=32):
        """Train; returns {'history': [...]} with per-epoch losses."""
        from ..utils.transfer import to_device

        patches = to_device(np.asarray(raw_patches)
                            if not hasattr(raw_patches, "dtype")
                            else raw_patches)
        masks_dev = jnp.asarray(np.asarray(masks)).astype(jnp.float32)
        n, h, w = patches.shape

        if self.state is None:
            self.state = self._create_state(
                jax.random.key(self.seed), (1, h, w, 3)
            )

        rng = np.random.default_rng(self.seed)
        key = jax.random.key(self.seed + 1)
        history = []
        steps = max(n // batch_size, 1)
        for epoch in range(num_epochs):
            perm = rng.permutation(n)
            losses = []
            for s in range(steps):
                idx = jnp.asarray(perm[s * batch_size : (s + 1) * batch_size])
                key, sub = jax.random.split(key)
                self.state, loss = self._step(
                    self.state,
                    sub,
                    jnp.take(patches, idx, axis=0),
                    jnp.take(masks_dev, idx, axis=0),
                )
                losses.append(loss)
            history.append(
                {"epoch": epoch + 1,
                 "train_loss": float(jnp.mean(jnp.stack(losses)))}
            )
        return {"history": history}
