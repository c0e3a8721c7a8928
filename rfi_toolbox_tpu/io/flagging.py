"""End-to-end measurement-set flagging (BASELINE config 5).

``flag_measurement_set`` ties the whole stack together: MS load (host)
-> device-resident preprocessing -> MAD or model inference -> patch
reassembly -> FLAG write-back. The reference stops short of this — it
has no unpatchify and leaves reassembly to the caller (SURVEY.md §3.5).

Throughput design:
- visibilities stream per baseline block; host I/O for block i+1
  overlaps device compute for block i via a single prefetch thread
  (the per-baseline TaQL queries are the wall-clock floor, SURVEY.md §7);
- all device work is one jitted program per block shape: patchify ->
  3-channel extraction -> model forward (or fused MAD kernel) ->
  unpatchify, with complex transfers staged as real/imag planes.
"""

import logging
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..preprocess import pipeline as P
from ..utils.transfer import to_device
from .ms_loader import MSLoader

logger = logging.getLogger(__name__)

__all__ = ["flag_measurement_set", "flag_waterfalls",
           "flag_waterfalls_coherent"]


def _mad_flag_fn(sigma, use_pallas):
    def fn(flat):
        if use_pallas:
            from ..ops import mad_flag_patches_pallas

            return mad_flag_patches_pallas(flat, float(sigma))
        return P.mad_flag_patches(flat, float(sigma))

    return fn


def flag_waterfalls(
    waterfalls,
    method="mad",
    sigma=5.0,
    patch_size=128,
    predictor=None,
    threshold=0.5,
    use_pallas="auto",
    mesh=None,
):
    """Flag a batch of waterfalls on device.

    Args:
        waterfalls: (M, C, T) complex/real device or host array.
        method: 'mad' (per-patch MAD threshold) or 'model'.
        predictor: for method='model': callable (N, p, p, 3) float32 ->
            (N, p, p) bool (e.g. ``Trainer.predict``).
        use_pallas: kernel dispatch ('auto' = non-CPU backends).
        mesh: optional jax.sharding.Mesh with a 'data' axis — the
            waterfall batch is sharded over it and every stage runs
            SPMD across the chips (per-patch MAD needs no cross-shard
            communication; XLA keeps the whole chain sharded). This is
            how one large observation (baselines x pols planes) spreads
            over a slice. When the batch is SMALLER than the mesh axis
            (e.g. ONE huge waterfall on an 8-chip slice), the channel
            axis is split into patch-aligned slabs that become extra
            batch entries — every stage is per-patch, so the result is
            identical and the whole slice stays busy (SURVEY §5
            long-context equivalent).

    Returns:
        (M, C, T) bool flags (device array).
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() != "cpu"
    flat = to_device(waterfalls)
    if flat.ndim != 3:
        raise ValueError(f"Expected (M, C, T) waterfalls, got {flat.shape}")
    m0, c0, t0 = flat.shape
    split = 1
    if mesh is not None:
        n_ax = mesh.shape["data"]
        if m0 < n_ax and c0 > patch_size:
            # channel-shard: split C into patch-aligned slabs so the
            # batch covers the mesh axis; per-patch flags make this
            # exact (slab boundaries align with the patch grid, and
            # the padded tail reproduces patchify's own zero padding)
            rows = -(-c0 // patch_size)
            split = min(rows, -(-n_ax // m0))
            rows_p = -(-rows // split) * split
            pad_c = rows_p * patch_size - c0
            if pad_c:
                flat = jnp.pad(flat, ((0, 0), (0, pad_c), (0, 0)))
            flat = flat.reshape(
                m0 * split, rows_p // split * patch_size, t0
            )
        # shard_batch replicates when M does not divide the axis
        # (15 baselines on an 8-chip mesh must not crash)
        from ..parallel.mesh import shard_batch

        flat = shard_batch(flat, mesh)
    m, c, t = flat.shape

    if c <= patch_size and t <= patch_size and split == 1:
        patches = flat
        patched = False
    else:
        patches = P.patchify_batch(flat, patch_size)
        patched = True

    if method == "mad":
        flags = _mad_flag_fn(sigma, use_pallas)(patches)
    elif method == "model":
        if predictor is None:
            raise ValueError("method='model' requires a predictor")
        if use_pallas:
            from ..ops import fused_extract_channels

            images = fused_extract_channels(patches)
        else:
            images = P.imagenet_normalize(P.extract_channels(patches))
        preds = jnp.asarray(predictor(images))
        flags = preds if preds.dtype == bool else preds > threshold
    else:
        raise ValueError(f"Unknown method '{method}' (use 'mad' or 'model')")

    if patched:
        flags = P.unpatchify_batch(flags.astype(jnp.float32), m, c, t) > 0
    if split > 1:
        flags = flags.reshape(m0, split * c, t)[:, :c0]
    return flags


def flag_waterfalls_coherent(vis4, predictor, patch_size=128,
                             threshold=0.5):
    """Flag (B, 4, C, T) 4-pol complex waterfalls with an 8-channel
    coherent-pipeline model (pretrained/unet16_coherent8ch.npz class).

    Unlike :func:`flag_waterfalls` (which flags each pol plane
    independently through the 3-channel preprocessed convention), this
    consumes all four polarizations jointly — the model sees
    4 pols x (re, im) = 8 channels per patch, per-patch robust-scaled
    (scalar median/IQR, the reference's per-``input.npy`` RobustScaler
    semantics) — and returns ONE (B, C, T) bool mask per baseline,
    shared across pols (RFI occupancy is a property of the
    time-frequency cell, not of one polarization).

    Args:
        vis4: (B, 4, C, T) complex array (host or device).
        predictor: callable (N, p, p, 8) float32 -> (N, p, p) bool,
            e.g. ``serving.CompiledPredictor.from_snapshot(
            "pretrained/unet16_coherent8ch.npz")`` or a
            ``Trainer.predict`` closure; the predictor owns its
            threshold (shipped snapshots record ``best_threshold``).
        threshold: applied only when the predictor returns
            probabilities instead of bools (same guard as
            :func:`flag_waterfalls`).

    Returns:
        (B, C, T) bool flags.
    """
    if not isinstance(vis4, jax.Array):
        vis4 = np.asarray(vis4)
    vis4 = to_device(vis4, dtype=np.complex64)
    if vis4.ndim != 4 or vis4.shape[1] != 4:
        raise ValueError(f"Expected (B, 4, C, T) 4-pol waterfalls, "
                         f"got {vis4.shape}")
    b, _, c, t = vis4.shape
    images = _coherent_images(vis4, patch_size)
    # hand the predictor the device array directly: CompiledPredictor
    # runs its device-resident path (no host round trip); plain-numpy
    # predictors np.asarray() it themselves, so both kinds work
    preds = jnp.asarray(predictor(images))
    preds = preds if preds.dtype == bool else preds > threshold
    flags = P.unpatchify_batch(preds.astype(jnp.float32), b, c, t) > 0
    return flags


@partial(jax.jit, static_argnames=("patch_size",))
def _coherent_images(vis4, patch_size):
    b = vis4.shape[0]
    planes = vis4.reshape(b * 4, *vis4.shape[2:])
    patches = P.patchify_batch(planes, patch_size)  # (b*4*N, p, p)
    n = patches.shape[0] // (b * 4)
    patches = patches.reshape(b, 4, n, patch_size, patch_size)
    x = jnp.concatenate(
        [patches.real, patches.imag], axis=1
    )  # (b, 8, N, p, p) — pol-major then re/im blocks
    # reorder to the training convention: pol0.re, pol0.im, pol1.re, ...
    order = jnp.array([0, 4, 1, 5, 2, 6, 3, 7])
    x = x[:, order]
    x = x.transpose(0, 2, 3, 4, 1).reshape(b * n, patch_size,
                                           patch_size, 8)
    flat = x.reshape(x.shape[0], -1)
    c, t = vis4.shape[2], vis4.shape[3]
    if c % patch_size or t % patch_size:
        # edge patches contain patchify zero-padding; computing the
        # median/IQR over those zeros would mis-scale them (q25 pins to
        # 0 once padding exceeds 25% of a patch), so mask padding out
        # of the statistics (NaN-omit) — the training convention scales
        # over real samples only
        valid = P.patchify_batch(
            jnp.ones((1, c, t), jnp.float32), patch_size
        ) > 0                                   # (n, p, p) per plane
        vmask = jnp.tile(valid, (b, 1, 1))[..., None]   # (b*n, p, p, 1)
        mflat = jnp.broadcast_to(vmask, x.shape).reshape(x.shape[0], -1)
        nanx = jnp.where(mflat, flat, jnp.nan)
        med = jnp.nanmedian(nanx, axis=1)
        q75 = jnp.nanpercentile(nanx, 75, axis=1)
        q25 = jnp.nanpercentile(nanx, 25, axis=1)
    else:
        med = jnp.median(flat, axis=1)
        q75 = jnp.percentile(flat, 75, axis=1)
        q25 = jnp.percentile(flat, 25, axis=1)
    scale = jnp.maximum(q75 - q25, 1e-12)
    return ((x - med[:, None, None, None])
            / scale[:, None, None, None]).astype(jnp.float32)


def flag_measurement_set(
    ms,
    method="mad",
    sigma=5.0,
    patch_size=128,
    predictor=None,
    threshold=0.5,
    num_antennas=None,
    mode="DATA",
    field_id=None,
    merge_existing=False,
    use_pallas="auto",
    streaming=False,
    mesh=None,
):
    """Flag an entire measurement set and write the FLAG column back.

    The full config-5 round trip. Two modes:

    - bulk (default): ONE bulk load per SPW (MSLoader.load), ALL
      baselines x pols flagged in a single batched device call, ONE
      bulk FLAG write-back — the TPU-first shape: big batched kernels,
      minimal host<->table chatter.
    - ``streaming=True``: per-baseline load/flag/save with a prefetch
      thread (host I/O for baseline i+1 overlaps device compute for i)
      and per-baseline failure capture — for observations too large to
      hold in host RAM at once.

    Args:
        ms: MS path or FakeMS.
        method: 'mad' or 'model' (see :func:`flag_waterfalls`), or
            'model8' — the coherent 8-channel convention: all four
            polarizations consumed jointly per baseline
            (:func:`flag_waterfalls_coherent`), one mask per
            time-frequency cell written to all 4 pols. Use with an
            8-channel predictor, e.g.
            ``CompiledPredictor.from_snapshot("pretrained/unet16_coherent8ch.npz")``.
        num_antennas: limit the ANTENNA1 loop (reference semantics).
        merge_existing: OR new flags into the existing FLAG column.

    Returns:
        dict: {'baselines': int, 'flagged_fraction': float, 'failed': []}
    """
    if method == "model8" and mesh is not None:
        logger.warning(
            "mesh is ignored with method='model8': the 8-channel "
            "predictor owns its device placement (AOT-compiled "
            "single-device executable)"
        )
    loader = MSLoader(ms, field_id=field_id)
    if not streaming:
        try:
            data = loader.load(num_antennas=num_antennas, mode=mode)
        except ValueError as e:
            # ragged observation (e.g. an antenna offline for part of
            # the run -> a baseline with missing integrations): the
            # bulk layout can't hold it; degrade to the per-baseline
            # streaming path, which captures bad baselines in 'failed'
            logger.warning(
                "bulk load failed (%s); falling back to per-baseline "
                "streaming", e,
            )
            loader.close()
            return flag_measurement_set(
                ms, method=method, sigma=sigma, patch_size=patch_size,
                predictor=predictor, threshold=threshold,
                num_antennas=num_antennas, mode=mode, field_id=field_id,
                merge_existing=merge_existing, use_pallas=use_pallas,
                streaming=True, mesh=mesh,
            )
        if len(data) == 0:
            loader.close()
            return {"baselines": 0, "flagged_fraction": 0.0, "failed": []}
        b, p, c, t = data.shape
        if method == "model8":
            if predictor is None:
                raise ValueError("method='model8' requires a predictor")
            if p != 4:
                raise ValueError(
                    f"method='model8' needs 4 polarizations, MS has {p}"
                )
            coh = flag_waterfalls_coherent(
                data.astype(np.complex64), predictor, patch_size=patch_size
            )
            # one (C, T) mask per baseline, shared across the 4 pols
            flags_host = np.broadcast_to(
                np.asarray(coh)[:, None], (b, p, c, t)
            ).copy()
        else:
            flags = flag_waterfalls(
                data.reshape(b * p, c, t).astype(np.complex64),
                method=method,
                sigma=sigma,
                patch_size=patch_size,
                predictor=predictor,
                threshold=threshold,
                use_pallas=use_pallas,
                mesh=mesh,
            )
            flags_host = np.asarray(flags).reshape(b, p, c, t)
        if merge_existing:
            flags_host = flags_host | loader.load_flags()
        loader.save_flags(flags_host)
        loader.close()
        return {
            "baselines": b,
            "flagged_fraction": float(flags_host.mean()),
            "failed": [],
        }
    pairs = [
        (i, j)
        for i in range(num_antennas or loader.num_antennas)
        for j in range(i + 1, loader.num_antennas)
    ]

    # Prefetch thread: load baseline i+1 while the device flags i.
    loaded = {}
    lock = threading.Lock()

    def load_one(pair):
        try:
            data = loader.load_baseline(pair[0], pair[1], mode=mode,
                                        field_id=field_id)
        except Exception as e:  # surfaced per baseline in the result
            data = e
        with lock:
            loaded[pair] = data

    total_flagged = 0.0
    total_pixels = 0
    n_done = 0
    failed = []

    if not pairs:
        loader.close()
        return {"baselines": 0, "flagged_fraction": 0.0, "failed": []}

    from ..utils.progress import progress

    prefetch = threading.Thread(target=load_one, args=(pairs[0],))
    prefetch.start()
    for idx, pair in progress(
        list(enumerate(pairs)), desc="Baselines", total=len(pairs)
    ):
        prefetch.join()
        data = loaded.pop(pair)
        if idx + 1 < len(pairs):
            prefetch = threading.Thread(target=load_one, args=(pairs[idx + 1],))
            prefetch.start()
        if isinstance(data, Exception):
            logger.warning("baseline %s load failed: %s", pair, data)
            failed.append({"baseline": pair, "error": str(data)})
            continue
        if data is None or data.shape[-1] == 0:
            continue

        # (4, C, T) complex128 -> device complex64 pipeline; for the
        # mad/model methods the mesh shards the 4-pol batch exactly as
        # the bulk path does (the ragged-bulk fallback forwards mesh
        # into this loop); model8 ignores it (warned above)
        if method == "model8":
            if predictor is None:
                raise ValueError("method='model8' requires a predictor")
            coh = flag_waterfalls_coherent(
                data.astype(np.complex64)[None], predictor,
                patch_size=patch_size,
            )
            flags_host = np.broadcast_to(
                np.asarray(coh), data.shape
            ).copy()
        else:
            flags = flag_waterfalls(
                data.astype(np.complex64),
                method=method,
                sigma=sigma,
                patch_size=patch_size,
                predictor=predictor,
                threshold=threshold,
                use_pallas=use_pallas,
                mesh=mesh,
            )
            flags_host = np.asarray(flags)
        if merge_existing:
            existing = loader.load_baseline_flags(pair[0], pair[1],
                                                  field_id=field_id)
            flags_host = flags_host | existing
        loader.save_baseline_flags(pair[0], pair[1], flags_host,
                                   field_id=field_id)
        total_flagged += float(flags_host.sum())
        total_pixels += flags_host.size
        n_done += 1

    loader.close()
    return {
        "baselines": n_done,
        "flagged_fraction": total_flagged / max(total_pixels, 1),
        "failed": failed,
    }
