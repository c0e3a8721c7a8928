"""Sample-level synthetic waterfall generation (jit/vmap over keys).

TPU-native rebuild of ``SyntheticDataGenerator._generate_single_sample``
(synthetic_generator.py:520-656): the per-event python loop becomes a
separable-profile stack reduced with two MXU matmuls (see
:mod:`rfi_toolbox_tpu.synth.events`), noise/phase come from
``jax.random`` with explicit keys, and a whole generation batch is one
``vmap``-ed device program.

Config is closed over at trace time via :func:`make_sample_generator`;
event-count maxima are static (drawn counts mask invalid events), so a
given config compiles exactly once.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from . import events as E

__all__ = [
    "make_sample_generator",
    "make_instance_sample_generator",
    "generate_bandpass",
    "params_to_event_list",
]


def _as_range(value):
    """Scalar or [min, max] -> (min, max) floats (synthetic_generator.py:543-550)."""
    if isinstance(value, (list, tuple)):
        return float(value[0]), float(value[1])
    return float(value), float(value)


def _count_range(value):
    """Event count: int or [min, max] inclusive -> (lo, hi_inclusive)."""
    if isinstance(value, (list, tuple)):
        return int(value[0]), int(value[1])
    return int(value), int(value)


@partial(jax.jit, static_argnames=("num_channels", "order"))
def generate_bandpass(num_channels, order):
    """Polynomial edge rolloff over the outer 10% of channels on both
    ends (synthetic_generator.py:658-673)."""
    edge = int(num_channels * 0.1)
    idx = jnp.arange(num_channels)
    lo_t = idx.astype(jnp.float32) / edge
    hi_t = (num_channels - 1 - idx).astype(jnp.float32) / edge
    bp = jnp.ones((num_channels,), jnp.float32)
    bp = jnp.where(idx < edge, lo_t**order, bp)
    bp = jnp.where(idx >= num_channels - edge, hi_t**order, bp)
    return bp


def make_sample_generator(
    num_channels,
    num_times,
    noise_level=1.0,
    rfi_power_min=1000.0,
    rfi_power_max=10000.0,
    rfi_config=None,
    enable_bandpass=False,
    bandpass_order=8,
    num_polarizations=1,
    pol_corr=0.8,
):
    """Build a jitted ``sample_fn(key) -> (waterfall, mask, params)``.

    Args mirror the reference's gen_kwargs (synthetic_generator.py:265-277).
    ``rfi_config`` maps event type -> {"count": int | [min, max]}.

    Returns:
        sample_fn producing:
          waterfall: (num_polarizations, nc, nt) complex64
          mask:      (num_polarizations, nc, nt) bool
          params:    pytree of per-event parameter arrays (see
                     :func:`params_to_event_list` for host formatting)
    """
    nc, nt = int(num_channels), int(num_times)
    npol = int(num_polarizations)
    pol_corr = float(pol_corr)
    noise_rng = _as_range(noise_level)
    pmin_rng = _as_range(rfi_power_min)
    pmax_rng = _as_range(rfi_power_max)

    if rfi_config is None:
        rfi_config = {t: {"count": 1} for t in E.SEPARABLE_TYPES}
    sep_counts = {}
    for name in E.SEPARABLE_TYPES:
        lo, hi = _count_range(rfi_config.get(name, {}).get("count", 0))
        if hi > 0:
            sep_counts[name] = (lo, hi)
    sweep_lo, sweep_hi = _count_range(
        rfi_config.get("frequency_sweep", {}).get("count", 0)
    )

    bandpass = generate_bandpass(nc, int(bandpass_order)) if enable_bandpass else None

    def sample_fn(key):
        (k_noise, k_phase, k_scales, k_counts, k_amps, k_events, k_sweep,
         k_pol) = random.split(key, 8)

        # Per-sample scalar draws (synthetic_generator.py:543-550).
        ks = random.split(k_scales, 3)
        noise = random.uniform(ks[0], (), minval=noise_rng[0], maxval=noise_rng[1])
        pmin = random.uniform(ks[1], (), minval=pmin_rng[0], maxval=pmin_rng[1])
        pmax = random.uniform(ks[2], (), minval=pmax_rng[0], maxval=pmax_rng[1])

        baseline = noise + noise * 0.1 * random.normal(k_noise, (nc, nt))
        if bandpass is not None:
            baseline = baseline * bandpass[:, None]

        # --- separable event stack -> two matmuls --------------------
        f_rows, t_rows = [], []
        params = {}
        type_keys = random.split(k_events, max(len(sep_counts), 1))
        count_keys = random.split(k_counts, max(len(sep_counts), 1) + 1)
        total_max = sum(hi for _, hi in sep_counts.values())
        amp_keys = random.split(k_amps, 2)
        sep_amps = (
            random.uniform(amp_keys[0], (max(total_max, 1),), minval=pmin, maxval=pmax)
            * 1000.0  # Jy -> mJy (synthetic_generator.py:578)
        )

        offset = 0
        for i, (name, (lo, hi)) in enumerate(sep_counts.items()):
            fn = E.SEPARABLE_TYPES[name]
            count = (
                random.randint(count_keys[i], (), lo, hi + 1) if lo != hi else lo
            )
            ekeys = random.split(type_keys[i], hi)
            f, t, p = jax.vmap(lambda k: fn(k, nc, nt))(ekeys)
            valid = (jnp.arange(hi) < count).astype(jnp.float32)
            f_rows.append(f * valid[:, None])
            t_rows.append(t)
            amps = jax.lax.dynamic_slice(sep_amps, (offset,), (hi,))
            params[name] = {**p, "amplitude_mjy": amps, "_count": count}
            offset += hi

        if f_rows:
            F = jnp.concatenate(f_rows)  # (E, nc)
            T = jnp.concatenate(t_rows)  # (E, nt)
            amps_all = jnp.concatenate(
                [params[n]["amplitude_mjy"] for n in sep_counts]
            )
            # signal: amp-weighted outer-product sum == one MXU matmul
            rfi_signal = (F * amps_all[:, None]).T @ T
            rfi_mask = ((F > 0).astype(jnp.float32).T @ (T > 0).astype(jnp.float32)) > 0
        else:
            rfi_signal = jnp.zeros((nc, nt), jnp.float32)
            rfi_mask = jnp.zeros((nc, nt), bool)

        # --- frequency sweeps (non-separable) ------------------------
        if sweep_hi > 0:
            sweep_count = (
                random.randint(count_keys[-1], (), sweep_lo, sweep_hi + 1)
                if sweep_lo != sweep_hi
                else sweep_lo
            )
            sweep_amps = (
                random.uniform(amp_keys[1], (sweep_hi,), minval=pmin, maxval=pmax)
                * 1000.0
            )
            s_sig, s_mask, s_params = E.frequency_sweep_accumulate(
                k_sweep, nc, nt, sweep_hi, sweep_count, sweep_amps
            )
            rfi_signal = rfi_signal + s_sig
            rfi_mask = rfi_mask | s_mask
            params["frequency_sweep"] = {
                **s_params,
                "amplitude_mjy": sweep_amps,
                "_count": sweep_count,
            }

        combined = baseline + rfi_signal

        # --- polarizations (synthetic_generator.py:626-648) ----------
        pols, masks = [], []
        pol_keys = random.split(k_pol, max(npol, 1))
        for pol_idx in range(npol):
            if pol_idx == 0:
                pol_real = combined
                mask = rfi_mask
            elif pol_idx == 1:
                corr_noise = noise * 0.1 * random.normal(pol_keys[pol_idx], (nc, nt))
                pol_real = pol_corr * rfi_signal + (1 - pol_corr) * corr_noise + baseline
                mask = rfi_mask
            else:
                pol_real = noise + noise * 0.1 * random.normal(
                    pol_keys[pol_idx], (nc, nt)
                )
                mask = jnp.zeros((nc, nt), bool)
            pols.append(pol_real)
            masks.append(mask)

        real_stack = jnp.stack(pols)  # (npol, nc, nt)
        phase = random.uniform(
            k_phase, (npol, nc, nt), minval=0.0, maxval=2.0 * jnp.pi
        )
        waterfall = (real_stack * jnp.exp(1j * phase)).astype(jnp.complex64)
        mask_stack = jnp.stack(masks)
        return waterfall, mask_stack, params

    return jax.jit(sample_fn)


def params_to_event_list(params):
    """Host-side: convert a (possibly batched) params pytree into the
    reference's per-event dict list (synthetic_generator.py:613-617),
    keeping only valid events."""
    params = jax.tree.map(np.asarray, params)

    def one_sample(p):
        out = []
        for rfi_type, fields in p.items():
            count = int(fields["_count"])
            keys = [k for k in fields if not k.startswith("_")]
            for e in range(count):
                entry = {"type": rfi_type}
                for k in keys:
                    v = fields[k][e]
                    entry[k] = float(v) if np.issubdtype(
                        np.asarray(v).dtype, np.floating
                    ) else int(v)
                out.append(entry)
        return out

    sample0 = next(iter(params.values()))["_count"]
    if np.ndim(sample0) == 0:
        return one_sample(params)
    batch = np.shape(sample0)[0]
    return [
        one_sample(jax.tree.map(lambda a: a[i], params)) for i in range(batch)
    ]


def make_instance_sample_generator(
    num_channels,
    num_times,
    noise_level=1.0,
    rfi_power_min=1000.0,
    rfi_power_max=10000.0,
    rfi_config=None,
    max_instances=None,
):
    """Instance-segmentation variant: per-EVENT ground-truth masks.

    Every RFI event is one instance; the class id is the event type's
    index in :data:`rfi_toolbox_tpu.synth.events.EVENT_TYPES`. This is
    the exact-instance supervision the SOLOLite model trains on — no
    connected-components approximation needed (the generator *knows*
    each event's mask).

    Returns a jitted ``fn(key) -> dict`` with:
        waterfall: (nc, nt) complex64 (single polarization)
        inst_masks: (M, nc, nt) bool
        inst_classes: (M,) int32
        inst_valid: (M,) bool
    where M = total max event count (padded; invalid rows all-False).
    """
    nc, nt = int(num_channels), int(num_times)
    noise_rng = _as_range(noise_level)
    pmin_rng = _as_range(rfi_power_min)
    pmax_rng = _as_range(rfi_power_max)

    if rfi_config is None:
        rfi_config = {t: {"count": 1} for t in E.EVENT_TYPES}
    sep_counts = {}
    for name in E.SEPARABLE_TYPES:
        lo, hi = _count_range(rfi_config.get(name, {}).get("count", 0))
        if hi > 0:
            sep_counts[name] = (lo, hi)
    sweep_lo, sweep_hi = _count_range(
        rfi_config.get("frequency_sweep", {}).get("count", 0)
    )
    class_ids = {name: i for i, name in enumerate(E.EVENT_TYPES)}
    total_m = sum(hi for _, hi in sep_counts.values()) + sweep_hi
    if max_instances is not None and total_m > max_instances:
        raise ValueError(
            f"max event count {total_m} exceeds max_instances={max_instances}"
        )

    def sample_fn(key):
        (k_noise, k_phase, k_scales, k_counts, k_amps, k_events,
         k_sweep) = random.split(key, 7)
        ks = random.split(k_scales, 3)
        noise = random.uniform(ks[0], (), minval=noise_rng[0], maxval=noise_rng[1])
        pmin = random.uniform(ks[1], (), minval=pmin_rng[0], maxval=pmin_rng[1])
        pmax = random.uniform(ks[2], (), minval=pmax_rng[0], maxval=pmax_rng[1])

        baseline = noise + noise * 0.1 * random.normal(k_noise, (nc, nt))

        masks, classes, valids = [], [], []
        signal = jnp.zeros((nc, nt), jnp.float32)

        type_keys = random.split(k_events, max(len(sep_counts), 1))
        count_keys = random.split(k_counts, max(len(sep_counts), 1) + 1)
        amp_key = random.split(k_amps, 2)
        total_sep = sum(hi for _, hi in sep_counts.values())
        amps = random.uniform(
            amp_key[0], (max(total_sep, 1),), minval=pmin, maxval=pmax
        ) * 1000.0

        offset = 0
        for i, (name, (lo, hi)) in enumerate(sep_counts.items()):
            fn = E.SEPARABLE_TYPES[name]
            count = (
                random.randint(count_keys[i], (), lo, hi + 1) if lo != hi else lo
            )
            ekeys = random.split(type_keys[i], hi)
            f, t, _ = jax.vmap(lambda k: fn(k, nc, nt))(ekeys)
            valid = jnp.arange(hi) < count
            inst = (f[:, :, None] > 0) & (t[:, None, :] > 0)  # (hi, nc, nt)
            inst = inst & valid[:, None, None]
            a = jax.lax.dynamic_slice(amps, (offset,), (hi,))
            signal = signal + jnp.einsum(
                "m,mct->ct", a * valid, inst.astype(jnp.float32)
            )
            masks.append(inst)
            classes.append(jnp.full((hi,), class_ids[name], jnp.int32))
            valids.append(valid)
            offset += hi

        if sweep_hi > 0:
            count = (
                random.randint(count_keys[-1], (), sweep_lo, sweep_hi + 1)
                if sweep_lo != sweep_hi
                else sweep_lo
            )
            sweep_amps = random.uniform(
                amp_key[1], (sweep_hi,), minval=pmin, maxval=pmax
            ) * 1000.0
            skeys = random.split(k_sweep, sweep_hi)
            valid = jnp.arange(sweep_hi) < count

            def one_sweep(k, amp):
                sig, msk, _ = E._sweep_event(k, nc, nt, amp)
                return sig, msk

            sigs, msks = jax.vmap(one_sweep)(skeys, sweep_amps)
            msks = msks & valid[:, None, None]
            signal = signal + (sigs * valid[:, None, None]).sum(axis=0)
            masks.append(msks)
            classes.append(
                jnp.full((sweep_hi,), class_ids["frequency_sweep"], jnp.int32)
            )
            valids.append(valid)

        inst_masks = jnp.concatenate(masks) if masks else jnp.zeros(
            (0, nc, nt), bool
        )
        inst_classes = jnp.concatenate(classes) if classes else jnp.zeros(
            (0,), jnp.int32
        )
        inst_valid = jnp.concatenate(valids) if valids else jnp.zeros((0,), bool)
        # an instance fully occluded to zero pixels is invalid
        inst_valid = inst_valid & inst_masks.any(axis=(1, 2))

        combined = baseline + signal
        phase = random.uniform(k_phase, (nc, nt), minval=0.0,
                               maxval=2.0 * jnp.pi)
        waterfall = (combined * jnp.exp(1j * phase)).astype(jnp.complex64)
        return {
            "waterfall": waterfall,
            "inst_masks": inst_masks,
            "inst_classes": inst_classes,
            "inst_valid": inst_valid,
        }

    return jax.jit(sample_fn)
