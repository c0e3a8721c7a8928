"""Jittable RFI event samplers.

Each reference event injector (synthetic_generator.py:675-815) writes an
``amp``-valued rectangle/stripe into a (channels, times) grid via python
slicing. Here each event is expressed as a *separable profile pair* —
a frequency indicator (nc,) and a time indicator (nt,) — so that a whole
stack of E events reduces to two MXU matmuls:

    signal = (F * amp[:, None]).T @ T        # (nc, E) @ (E, nt)
    mask   = (F.T @ T) > 0                   # OR of outer products

Only the frequency sweep is non-separable (its channel window moves per
time step); sweeps are accumulated with a small ``lax.scan``.

Parameter distributions match the reference draws exactly (cited per
function); RNG is `jax.random` key-driven instead of the reference's
global numpy RNG, so generation is reproducible and vmappable.

All functions are shape-static: event counts are bounded by config-time
maxima and invalid events contribute zero rows.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, random

__all__ = [
    "narrowband_persistent",
    "broadband_persistent",
    "narrowband_intermittent",
    "narrowband_bursty",
    "broadband_bursty",
    "frequency_sweep_accumulate",
    "EVENT_TYPES",
    "SEPARABLE_TYPES",
    "MAX_SUBBURSTS",
]

# Upper bounds of the reference's randint draws (exclusive-high - 1).
MAX_SUBBURSTS = {"narrowband_bursty": 14, "broadband_bursty": 9}


def _freq_indicator(nc, lo, hi):
    idx = jnp.arange(nc)
    return ((idx >= lo) & (idx < hi)).astype(jnp.float32)


def _time_indicator(nt, lo, hi):
    idx = jnp.arange(nt)
    return ((idx >= lo) & (idx < hi)).astype(jnp.float32)


def narrowband_persistent(key, nc, nt):
    """Persistent narrowband (GPS, satellite): vertical strip.

    center ~ randint(0.1*nc, 0.9*nc), bw ~ randint(1, 10); channel slice
    [max(0, c-bw//2), min(nc, c+bw//2+1)) (synthetic_generator.py:675-692).
    """
    k1, k2 = random.split(key)
    cf = random.randint(k1, (), int(nc * 0.1), int(nc * 0.9))
    bw = random.randint(k2, (), 1, 10)
    f = _freq_indicator(nc, jnp.maximum(0, cf - bw // 2), cf + bw // 2 + 1)
    t = jnp.ones((nt,), jnp.float32)
    return f, t, {"center_freq": cf, "bandwidth": bw}


def broadband_persistent(key, nc, nt):
    """Persistent broadband (power lines): horizontal (time-range) strip.

    center_time ~ randint(0.1*nt, 0.9*nt), width ~ randint(5, 50); time
    slice [max(0, ct-w//2), min(nt, ct+w//2)) (synthetic_generator.py:694-709).
    """
    k1, k2 = random.split(key)
    ct = random.randint(k1, (), int(nt * 0.1), int(nt * 0.9))
    tw = random.randint(k2, (), 5, 50)
    f = jnp.ones((nc,), jnp.float32)
    t = _time_indicator(nt, jnp.maximum(0, ct - tw // 2), ct + tw // 2)
    return f, t, {"center_time": ct, "time_width": tw}


def narrowband_intermittent(key, nc, nt):
    """Periodic narrowband (rotating radar): duty-cycled strip.

    period ~ randint(20, 200), duty ~ U(0.1, 0.5); active when
    (t mod period) < int(period*duty), which equals the reference's
    stride loop since blocks start at multiples of the period
    (synthetic_generator.py:711-737).
    """
    k1, k2, k3, k4 = random.split(key, 4)
    cf = random.randint(k1, (), int(nc * 0.1), int(nc * 0.9))
    bw = random.randint(k2, (), 2, 15)
    period = random.randint(k3, (), 20, 200)
    duty = random.uniform(k4, (), minval=0.1, maxval=0.5)
    duration = (period.astype(jnp.float32) * duty).astype(jnp.int32)
    f = _freq_indicator(nc, jnp.maximum(0, cf - bw // 2), cf + bw // 2)
    tt = jnp.arange(nt)
    t = ((tt % period) < duration).astype(jnp.float32)
    return f, t, {
        "center_freq": cf,
        "bandwidth": bw,
        "period": period,
        "duty_cycle": duty,
    }


def _bursty_time_profile(key, nt, n_lo, n_hi, w_lo, w_hi):
    """Union of random burst windows: times drawn without replacement,
    widths ~ randint(w_lo, w_hi); window [max(0,t-w//2), min(nt,t+w//2))
    (synthetic_generator.py:752-758, 774-779)."""
    kn, kt, kw = random.split(key, 3)
    max_bursts = n_hi - 1
    num = random.randint(kn, (), n_lo, n_hi)
    times = random.permutation(kt, nt)[:max_bursts]
    widths = random.randint(kw, (max_bursts,), w_lo, w_hi)
    valid = jnp.arange(max_bursts) < num
    tt = jnp.arange(nt)[None, :]
    lo = jnp.maximum(0, times - widths // 2)[:, None]
    hi = (times + widths // 2)[:, None]
    windows = (tt >= lo) & (tt < hi) & valid[:, None]
    return jnp.any(windows, axis=0).astype(jnp.float32), num


def narrowband_bursty(key, nc, nt):
    """Random bursty narrowband (pulsed transmitters): 3-15 bursts of
    width 2-20 in a 2-20 channel band (synthetic_generator.py:739-765)."""
    k1, k2, k3 = random.split(key, 3)
    cf = random.randint(k1, (), int(nc * 0.1), int(nc * 0.9))
    bw = random.randint(k2, (), 2, 20)
    f = _freq_indicator(nc, jnp.maximum(0, cf - bw // 2), cf + bw // 2)
    t, num = _bursty_time_profile(k3, nt, 3, 15, 2, 20)
    return f, t, {"center_freq": cf, "bandwidth": bw, "num_bursts": num}


def broadband_bursty(key, nc, nt):
    """Random bursty broadband (lightning): 2-10 all-channel bursts of
    width 1-5 (synthetic_generator.py:767-783)."""
    f = jnp.ones((nc,), jnp.float32)
    t, num = _bursty_time_profile(key, nt, 2, 10, 1, 5)
    return f, t, {"num_bursts": num}


SEPARABLE_TYPES = {
    "narrowband_persistent": narrowband_persistent,
    "broadband_persistent": broadband_persistent,
    "narrowband_intermittent": narrowband_intermittent,
    "narrowband_bursty": narrowband_bursty,
    "broadband_bursty": broadband_bursty,
}

EVENT_TYPES = list(SEPARABLE_TYPES) + ["frequency_sweep"]


def _sweep_event(key, nc, nt, amp):
    """One frequency sweep: linear or quadratic chirp, vectorized over
    the time axis (the reference loops per time step,
    synthetic_generator.py:795-807)."""
    k1, k2, k3, k4 = random.split(key, 4)
    start = random.randint(k1, (), int(nc * 0.1), int(nc * 0.5))
    end = random.randint(k2, (), int(nc * 0.5), int(nc * 0.9))
    bw = random.randint(k3, (), 2, 10)
    order = random.randint(k4, (), 1, 3)  # 1 or 2

    t = jnp.arange(nt, dtype=jnp.float32) / nt
    progress = jnp.where(order == 1, t, t**2)
    center = (start.astype(jnp.float32) + (end - start) * progress).astype(jnp.int32)
    ch = jnp.arange(nc)[:, None]
    mask = (ch >= jnp.maximum(0, center - bw // 2)[None, :]) & (
        ch < (center + bw // 2)[None, :]
    )
    params = {"start_freq": start, "end_freq": end, "bandwidth": bw,
              "sweep_order": order}
    return amp * mask.astype(jnp.float32), mask, params


@partial(jax.jit, static_argnames=("nc", "nt", "max_events"))
def frequency_sweep_accumulate(key, nc, nt, max_events, count, amps):
    """Accumulate up to ``max_events`` sweeps (first ``count`` valid).

    Returns (signal (nc, nt) f32, mask (nc, nt) bool, params pytree of
    (max_events,) arrays).
    """
    keys = random.split(key, max_events)

    def body(carry, inp):
        sig, msk = carry
        k, amp, valid = inp
        s, m, p = _sweep_event(k, nc, nt, amp)
        sig = sig + jnp.where(valid, s, 0.0)
        msk = msk | (m & valid)
        return (sig, msk), p

    valid = jnp.arange(max_events) < count
    init = (jnp.zeros((nc, nt), jnp.float32), jnp.zeros((nc, nt), bool))
    (signal, mask), params = lax.scan(body, init, (keys, amps, valid))
    return signal, mask, params
