"""Tests for the SOLOLite dense instance segmentation stack."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import random

from rfi_toolbox_tpu.models import (
    SOLOLite,
    assign_targets,
    matrix_nms,
    solo_decode,
    solo_loss,
)
from rfi_toolbox_tpu.models.instance import instance_masks_from_outputs
from rfi_toolbox_tpu.synth.sample import make_instance_sample_generator


def _model(grid=8, features=8, embed=16):
    return SOLOLite(num_classes=6, grid_size=grid, embed_dim=embed,
                    features=features)


def test_forward_shapes():
    model = _model()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["cate_logits"].shape == (2, 8, 8, 6)
    assert out["kernels"].shape == (2, 8, 8, 16)
    assert out["mask_feats"].shape == (2, 16, 16, 16)
    masks = instance_masks_from_outputs(out)
    assert masks.shape == (2, 64, 16, 16)


def test_forward_shapes_space_to_depth():
    """The packed stem changes NO output shape: the FPN consumes only
    c3/c4, so s2d replaces the full-res stage while the mask head stays
    at H/4 and the grid heads at S x S."""
    model = SOLOLite(num_classes=6, grid_size=8, embed_dim=16, features=8,
                     space_to_depth=True)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["cate_logits"].shape == (2, 8, 8, 6)
    assert out["kernels"].shape == (2, 8, 8, 16)
    assert out["mask_feats"].shape == (2, 16, 16, 16)
    # no full-resolution conv parameters exist in the packed stem
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert all("ConvBlock_0" not in jax.tree_util.keystr(k)
               or v.shape[-1] != 8 for k, v in flat if v.ndim == 4)


@pytest.mark.slow
def test_instance_trainer_space_to_depth_roundtrip(tmp_path):
    """A packed-stem trainer trains, exports, and reloads with the flag
    preserved through snapshot metadata (evaluate CLI path)."""
    from rfi_toolbox_tpu.train import InstanceTrainer

    model = SOLOLite(num_classes=6, grid_size=8, embed_dim=16, features=8,
                     space_to_depth=True)
    tr = InstanceTrainer(model=model, patch_size=64, batch_size=2, seed=0)
    out = tr.fit(num_steps=2, log_every=2)
    assert np.isfinite(out["history"][-1]["loss"])
    path = tr.save(tmp_path / "s2d.npz")
    tr2 = InstanceTrainer.load(path, batch_size=2)
    assert tr2.model.space_to_depth is True
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        jax.device_get(tr.params), jax.device_get(tr2.params),
    )


def test_assign_targets_center_region():
    # one instance: a block in the top-left quadrant
    inst = np.zeros((1, 2, 64, 64), np.float32)
    inst[0, 0, 8:24, 8:24] = 1.0
    classes = np.array([[3, 0]], np.int32)
    valid = np.array([[True, False]])
    cate_t, mask_idx = assign_targets(
        jnp.asarray(inst), jnp.asarray(classes), jnp.asarray(valid), 8, 6
    )
    cate_t, mask_idx = np.asarray(cate_t), np.asarray(mask_idx)
    # instance center (15.5, 15.5): nearest 8x8-grid cell over 64px is
    # (1, 1) (center 12); it must claim the instance
    assert cate_t[0, 1, 1] == 3
    assert mask_idx[0, 1, 1] == 0
    # far cells are background
    assert cate_t[0, 7, 7] == 6
    assert mask_idx[0, 7, 7] == -1
    # invalid instance never assigned
    assert (mask_idx != 1).all()


def test_assign_targets_smallest_wins():
    # two overlapping instances; the smaller claims the contested cell
    inst = np.zeros((1, 2, 64, 64), np.float32)
    inst[0, 0, :, :] = 1.0            # huge
    inst[0, 1, 28:36, 28:36] = 1.0    # small, centered
    classes = np.array([[0, 1]], np.int32)
    valid = np.array([[True, True]])
    _, mask_idx = assign_targets(
        jnp.asarray(inst), jnp.asarray(classes), jnp.asarray(valid), 8, 6
    )
    assert np.asarray(mask_idx)[0, 3, 3] == 1  # small instance wins center


def test_matrix_nms_suppresses_duplicates():
    masks = np.zeros((3, 16, 16), bool)
    masks[0, :8] = True
    masks[1, :8] = True           # duplicate of 0
    masks[2, 8:] = True           # distinct
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 0, 0])
    decayed = np.asarray(matrix_nms(jnp.asarray(masks), scores, classes))
    assert decayed[0] == pytest.approx(0.9, abs=1e-5)   # top kept
    assert decayed[1] < 0.2                              # duplicate decayed
    assert decayed[2] == pytest.approx(0.7, abs=1e-5)   # distinct kept


def test_matrix_nms_suppresses_duplicate_clusters():
    """The cluster case the round-4 FP diagnosis exposed: with 3+
    same-class detections stacked on one instance, the mid-ranked
    duplicate must decay too. The old compensation term (target's own
    IoU vs LOWER-scored masks) exactly cancelled its decay, so it
    survived at any sigma."""
    masks = np.zeros((4, 16, 16), bool)
    masks[0, :8] = True
    masks[1, :8] = True            # duplicate of 0
    masks[2, :8] = True            # second duplicate — the cluster case
    masks[3, 8:] = True            # distinct
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([0, 0, 0, 0])
    decayed = np.asarray(matrix_nms(jnp.asarray(masks), scores, classes))
    assert decayed[0] == pytest.approx(0.9, abs=1e-5)   # top kept
    assert decayed[1] < 0.2                              # duplicate decayed
    assert decayed[2] < 0.2                              # mid-cluster decayed
    assert decayed[3] == pytest.approx(0.6, abs=1e-5)   # distinct kept


@pytest.mark.slow
def test_instance_generator_and_loss_decreases(rng):
    gen = make_instance_sample_generator(
        64, 64,
        rfi_config={"narrowband_persistent": {"count": 2},
                    "broadband_persistent": {"count": 1}},
    )
    keys = random.split(random.key(0), 4)
    batch = jax.vmap(gen)(keys)
    wf = batch["waterfall"]
    assert wf.shape == (4, 64, 64)
    inst = batch["inst_masks"]
    assert inst.shape[0] == 4 and inst.shape[2:] == (64, 64)
    assert bool(batch["inst_valid"].all())

    # 3-channel images from the preprocessing pipeline
    from rfi_toolbox_tpu.preprocess import pipeline as P

    images = P.imagenet_normalize(P.extract_channels(wf))

    model = _model()
    variables = model.init(random.key(1), images, train=False)
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, images, train=False)
            total, parts = solo_loss(
                out, batch["inst_masks"], batch["inst_classes"],
                batch["inst_valid"],
            )
            return total, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9  # optimizes


def test_solo_decode_static_shapes():
    model = _model()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    single = jax.tree.map(lambda a: a[0], out)
    dec = solo_decode(single, score_thresh=0.0)
    assert dec["masks"].shape == (64, 16, 16)
    assert dec["scores"].shape == (64,)
    assert dec["classes"].shape == (64,)


@pytest.mark.slow
def test_instance_trainer_end_to_end(rng):
    from rfi_toolbox_tpu.train import InstanceTrainer

    trainer = InstanceTrainer(
        model=_model(grid=8, features=8, embed=16),
        patch_size=64, batch_size=4, learning_rate=1e-3, seed=0,
    )
    result = trainer.fit(num_steps=10, log_every=5)
    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"] * 1.5  # not diverging

    # mixed real+synthetic: real patches as unlabeled negatives
    real = (rng.normal(1.0, 0.1, (8, 64, 64))
            * np.exp(1j * rng.uniform(0, 6.28, (8, 64, 64)))).astype(np.complex64)
    r2 = trainer.fit(num_steps=4, log_every=4, real_patches=real,
                     real_fraction=0.25)
    assert np.isfinite(r2["history"][-1]["loss"])

    # decode API
    batch = trainer.generate_batch(jax.random.key(9))
    from rfi_toolbox_tpu.preprocess import pipeline as P
    images = P.imagenet_normalize(P.extract_channels(batch["waterfall"]))
    dec = trainer.predict(np.asarray(images[:2]))
    assert len(dec) == 2
    assert dec[0]["masks"].ndim == 3


@pytest.mark.slow
def test_instance_trainer_fused_steps_match_sequential():
    """fused_steps=K (generation + K optimization steps in one scan
    program) must reproduce the sequential per-step path: same key
    stream, same losses, same params up to float32 fusion-order noise
    (the scan body and the standalone step compile as different XLA
    programs, so bitwise equality is not guaranteed — observed worst
    case ~5e-4 relative on isolated weights after 6 steps)."""
    from rfi_toolbox_tpu.train import InstanceTrainer

    kw = dict(model=_model(grid=8, features=8, embed=16),
              patch_size=64, batch_size=2, seed=0, learning_rate=1e-3)
    t_seq = InstanceTrainer(**kw)
    r_seq = t_seq.fit(num_steps=6, log_every=6)

    t_fused = InstanceTrainer(**kw)
    r_fused = t_fused.fit(num_steps=6, log_every=6, fused_steps=3)

    np.testing.assert_allclose(
        r_fused["history"][-1]["loss"], r_seq["history"][-1]["loss"],
        rtol=1e-5,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        ),
        jax.device_get(t_seq.params), jax.device_get(t_fused.params),
    )
    # remainder chunks (num_steps not a multiple of K) still work
    r3 = t_fused.fit(num_steps=5, log_every=5, fused_steps=3)
    assert r3["history"][-1]["step"] == 5


@pytest.mark.slow
def test_instance_trainer_save_load(tmp_path, rng):
    from rfi_toolbox_tpu.train import InstanceTrainer

    t1 = InstanceTrainer(model=_model(grid=8, features=8, embed=16),
                         patch_size=64, batch_size=2, seed=0)
    t1.fit(num_steps=2, log_every=2)
    path = t1.save(tmp_path / "solo.npz")

    t2 = InstanceTrainer.load(path, batch_size=2, seed=1)
    assert t2.model.grid_size == 8
    # identical params -> identical predictions
    batch = t1.generate_batch(jax.random.key(3))
    from rfi_toolbox_tpu.preprocess import pipeline as P
    images = np.asarray(
        P.imagenet_normalize(P.extract_channels(batch["waterfall"][:1])))
    d1 = t1.predict(images)[0]
    d2 = t2.predict(images)[0]
    np.testing.assert_allclose(d1["scores"], d2["scores"], atol=1e-6)


@pytest.mark.slow
def test_instance_trainer_checkpoint_resume(tmp_path):
    """Full Orbax checkpoint: params AND optimizer state survive, so a
    resumed run continues the same trajectory (adam moments intact)."""
    import numpy as np

    from rfi_toolbox_tpu.train import InstanceTrainer

    kw = dict(patch_size=32, batch_size=2, seed=0, learning_rate=1e-3)
    t1 = InstanceTrainer(**kw)
    t1.fit(num_steps=6, log_every=6)
    step = t1.save_checkpoint(tmp_path / "ck", step=6)
    r_cont = t1.fit(num_steps=4, log_every=4)

    t2 = InstanceTrainer(**kw)
    restored = t2.restore_checkpoint(tmp_path / "ck")
    assert restored == 6
    r_resumed = t2.fit(num_steps=4, log_every=4)

    # identical data stream (same seed) + identical state -> identical loss
    np.testing.assert_allclose(
        r_resumed["history"][-1]["loss"], r_cont["history"][-1]["loss"],
        rtol=1e-5,
    )


@pytest.mark.slow
def test_instance_trainer_max_positive_cells_plumbs():
    """max_positive_cells reaches solo_loss in both the sequential and
    fused step paths: an uncapped trainer on a dense mix reports no
    dropped cells, a tightly-capped one reports drops."""
    from rfi_toolbox_tpu.train import InstanceTrainer

    dense = {
        "narrowband_persistent": {"count": 4},
        "broadband_persistent": {"count": 2},
        "narrowband_bursty": {"count": 2},
    }
    kw = dict(model=_model(grid=8, features=8, embed=16), patch_size=64,
              batch_size=2, seed=0, learning_rate=1e-3, rfi_config=dense)
    t_cap = InstanceTrainer(max_positive_cells=2, **kw)
    r_cap = t_cap.fit(num_steps=2, log_every=2)
    assert r_cap["history"][-1].get("dropped_mask_cells", 0) > 0

    t_full = InstanceTrainer(max_positive_cells=None, **kw)
    r_full = t_full.fit(num_steps=2, log_every=2)
    assert r_full["history"][-1].get("dropped_mask_cells", 0) == 0

    # fused path honors the cap too
    r_cap_fused = t_cap.fit(num_steps=2, log_every=2, fused_steps=2)
    assert r_cap_fused["history"][-1].get("dropped_mask_cells", 0) > 0


@pytest.mark.slow
def test_instance_trainer_data_parallel_mesh_matches_single():
    """InstanceTrainer(mesh_shape=(8,)): params/opt replicated, batches
    sharded over 'data', same key stream -> same losses/params as the
    unmeshed trainer (both sequential and fused paths)."""
    from rfi_toolbox_tpu.train import InstanceTrainer

    kw = dict(model=_model(grid=8, features=8, embed=16), patch_size=64,
              batch_size=8, seed=0, learning_rate=1e-3)
    t_single = InstanceTrainer(**kw)
    r_single = t_single.fit(num_steps=4, log_every=4)

    t_mesh = InstanceTrainer(mesh_shape=(jax.device_count(),), **kw)
    r_mesh = t_mesh.fit(num_steps=4, log_every=4)
    np.testing.assert_allclose(
        r_mesh["history"][-1]["loss"], r_single["history"][-1]["loss"],
        rtol=1e-4,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        ),
        jax.device_get(t_single.params), jax.device_get(t_mesh.params),
    )

    t_mesh_fused = InstanceTrainer(mesh_shape=(jax.device_count(),), **kw)
    r_fused = t_mesh_fused.fit(num_steps=4, log_every=4, fused_steps=2)
    np.testing.assert_allclose(
        r_fused["history"][-1]["loss"], r_single["history"][-1]["loss"],
        rtol=2e-3,
    )

    with pytest.raises(ValueError, match="data-only"):
        InstanceTrainer(mesh_shape=(4, 2), **kw)
