"""Coherent-phase time-frequency RFI simulator — TPU-native.

Rebuild of the reference ``RFISimulator``
(rfi_toolbox/core/simulator.py:5-237): each RFI event carries a coherent
geometric phase

    phi(t, n) = 2*pi * [ (s0 + sdot*t) * n + r0 * t ] + phi0

with baseline-length-scaled fringe rates, drift probability 0.3, and
full-injection ground truth (every injected pixel with amplitude above
``detect_floor`` is labelled RFI). Optional Gibbs/sinc channelizer
ringing (off by default, as in the reference).

TPU design notes:
- The reference's per-event python loops (including per-time-step sweep
  loops, simulator.py:207-230) become vectorized index arithmetic +
  scatter-adds; events of one family share a single scatter.
- Gibbs ringing is applied as ONE depthwise convolution over the summed
  RFI field per family/axis — valid because convolution is linear and
  the truth mask is computed from the pre-ringing field, exactly as the
  reference masks the un-spread core (simulator.py:174, 186, 197).
- Orientation is (time, freq) like the reference — note this is the
  transpose of SyntheticDataGenerator's (channels, times).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

__all__ = ["RFISimulator"]

_POLS = ("RR", "RL", "LR", "LL")


def _phase_grid(t_idx, n_idx, s0, sdot, r0, phi0):
    """phi(t, n) (simulator.py:91-94). Inputs broadcast."""
    return 2.0 * jnp.pi * ((s0 + sdot * t_idx) * n_idx + r0 * t_idx) + phi0


def _draw_event_phase(key, width, n_times, bl, drifting,
                      max_time_fringes, max_freq_fringes):
    """(s0, sdot, r0, phi0) scaled to event extent and baseline length
    (simulator.py:69-89). ``width``/``n_times`` may be traced; clamped
    to >= 1."""
    k = random.split(key, 7)
    w = jnp.maximum(width, 1).astype(jnp.float32)
    nt = jnp.maximum(n_times, 1).astype(jnp.float32)
    sign1 = jnp.where(random.bernoulli(k[0]), 1.0, -1.0)
    sign2 = jnp.where(random.bernoulli(k[1]), 1.0, -1.0)
    sign3 = jnp.where(random.bernoulli(k[2]), 1.0, -1.0)
    n_ft = random.uniform(k[3], (), minval=0.5, maxval=1.0 + bl * max_time_fringes)
    r0 = (n_ft / nt) * sign1
    n_ff = random.uniform(k[4], (), minval=0.5, maxval=1.0 + bl * max_freq_fringes)
    s0 = (n_ff / w) * sign2
    phi0 = random.uniform(k[5], (), minval=0.0, maxval=2.0 * jnp.pi)
    s_end = (
        random.uniform(k[6], (), minval=0.5, maxval=1.0 + bl * max_freq_fringes) / w
    ) * sign3
    sdot = jnp.where(drifting, (s_end - s0) / nt, 0.0)
    return s0, sdot, r0, phi0


class RFISimulator:
    """Time-frequency RFI simulator with physically-motivated coherent
    phase. API-compatible with the reference (simulator.py:43-237); all
    sampling is key-driven (pass ``seed`` or call with explicit keys).

    >>> sim = RFISimulator(time_bins=1024, freq_bins=1024, seed=0)
    >>> tf_plane, mask = sim.generate_rfi()
    >>> tf_plane["RR"].shape   # (1024, 1024) complex64
    """

    def __init__(self, time_bins=1024, freq_bins=1024, seed=0):
        self.time_bins = int(time_bins)
        self.freq_bins = int(freq_bins)
        self.power_range = np.logspace(-6, 4, num=100).astype(np.float32)
        self.detect_floor = 1.0
        self.drift_prob = 0.3
        self.max_time_fringes = 30.0
        self.max_freq_fringes = 8.0
        self.gibbs_ringing = False
        self._gibbs_kernel = self._make_gibbs_kernel(n_side=8, stretch=2.0)
        self.baseline_frac = 0.5
        self._key = random.key(seed)
        self.tf_plane = {
            pol: np.zeros((self.time_bins, self.freq_bins), dtype=np.complex64)
            for pol in _POLS
        }
        self.mask = np.zeros((self.time_bins, self.freq_bins), dtype=bool)

    @staticmethod
    def _make_gibbs_kernel(n_side=8, stretch=2.0):
        x = np.arange(-n_side, n_side + 1) / float(stretch)
        k = np.sinc(x)
        return (k / k.sum()).astype(np.float32)

    def _next_key(self):
        self._key, sub = random.split(self._key)
        return sub

    # ------------------------------------------------------------- clean
    def generate_clean_data(self, key=None):
        """RFI-free unit complex Gaussian planes (simulator.py:137-145)."""
        key = self._next_key() if key is None else key
        tf, mask = _clean_impl(key, self.time_bins, self.freq_bins)
        from ..utils.transfer import to_host

        self.tf_plane = {pol: to_host(tf[i]) for i, pol in enumerate(_POLS)}
        self.mask = np.asarray(mask)
        return self.tf_plane, self.mask

    # --------------------------------------------------------------- rfi
    def generate_rfi(self, baseline_frac=None, key=None):
        """Generate an RFI-contaminated plane and its full-truth mask.

        Args:
            baseline_frac: baseline length in [0, 1] controlling fringe
                rates; None draws one per call (simulator.py:154-156).
            key: optional explicit jax PRNG key.
        """
        key = self._next_key() if key is None else key
        k_bl, k_ev = random.split(key)
        if baseline_frac is None:
            bl = random.uniform(k_bl, ())
        else:
            bl = jnp.float32(baseline_frac)
        self.baseline_frac = float(bl)

        tf, mask = _rfi_impl(
            k_ev,
            bl,
            self.time_bins,
            self.freq_bins,
            jnp.asarray(self.power_range),
            self.detect_floor,
            self.drift_prob,
            self.max_time_fringes,
            self.max_freq_fringes,
            self.gibbs_ringing,
            jnp.asarray(self._gibbs_kernel),
        )
        from ..utils.transfer import to_host

        self.tf_plane = {pol: to_host(tf[i]) for i, pol in enumerate(_POLS)}
        self.mask = np.asarray(mask)
        return self.tf_plane, self.mask

    def generate_rfi_device(self, key, baseline_frac=None):
        """Device-resident variant for vmapped batch generation:
        returns (tf (4, T, F) complex64, mask (T, F) bool) without host
        transfer. Pol order matches ``_POLS`` = (RR, RL, LR, LL)."""
        k_bl, k_ev = random.split(key)
        bl = (
            random.uniform(k_bl, ())
            if baseline_frac is None
            else jnp.float32(baseline_frac)
        )
        return _rfi_impl(
            k_ev,
            bl,
            self.time_bins,
            self.freq_bins,
            jnp.asarray(self.power_range),
            self.detect_floor,
            self.drift_prob,
            self.max_time_fringes,
            self.max_freq_fringes,
            self.gibbs_ringing,
            jnp.asarray(self._gibbs_kernel),
        )


@partial(jax.jit, static_argnames=("T", "F"))
def _clean_impl(key, T, F):
    k = random.split(key, 8)
    tf = jnp.stack(
        [
            random.normal(k[2 * i], (T, F)) + 1j * random.normal(k[2 * i + 1], (T, F))
            for i in range(4)
        ]
    ).astype(jnp.complex64)
    return tf, jnp.zeros((T, F), bool)


def _conv_along(x, kernel, axis):
    """Depthwise 1-D convolution of a 2D (possibly complex) field along
    ``axis`` with 'same' padding (reference np.convolve mode='same',
    simulator.py:103-112)."""
    def conv_real(r):
        moved = jnp.moveaxis(r, axis, -1)[None, None]  # (1, 1, L, W)
        out = jax.lax.conv_general_dilated(
            moved,
            kernel[None, None, None, :],
            window_strides=(1, 1),
            padding=[(0, 0), (len(kernel) // 2, len(kernel) // 2)],
        )[0, 0]
        return jnp.moveaxis(out, -1, axis)

    return conv_real(x.real) + 1j * conv_real(x.imag)


@partial(
    jax.jit,
    static_argnames=("T", "F", "floor", "drift_prob", "max_tf", "max_ff", "gibbs"),
)
def _rfi_impl(key, bl, T, F, power_range, floor, drift_prob, max_tf, max_ff,
              gibbs, kernel):
    """Full generate_rfi pipeline as one device program
    (simulator.py:147-237)."""
    keys = random.split(key, 8)
    tf, _ = _clean_impl(keys[0], T, F)
    tf_rr, tf_rl, tf_lr, tf_ll = tf[0], tf[1], tf[2], tf[3]
    mask = jnp.zeros((T, F), bool)

    t_col = jnp.arange(T, dtype=jnp.float32)[:, None]
    f_row = jnp.arange(F, dtype=jnp.float32)[None, :]

    # ---- broadband chunks: 2-3 separated frequency blocks -------------
    MAXB = 3
    kb = random.split(keys[1], MAXB + 1)
    n_chunks = random.randint(kb[0], (), 2, 4)
    bb_field = jnp.zeros((T, F), jnp.complex64)

    def bb_event(carry, inp):
        field_acc, msk = carry
        k, valid = inp
        ks = random.split(k, 6)
        max_width = F - 1
        freq_start = random.randint(ks[0], (), 0, max(1, max_width - 100))
        freq_width = random.randint(
            ks[1], (), 50, jnp.minimum(150, max_width - freq_start)
        )
        drifting = random.uniform(ks[2], ()) < drift_prob
        s0, sdot, r0, phi0 = _draw_event_phase(
            ks[3], freq_width, T, bl, drifting, max_tf, max_ff
        )
        modulation = random.uniform(ks[4], (T, F), minval=0.5, maxval=2.0)
        power = power_range[random.randint(ks[5], (T, F), 0, len(power_range))]
        in_range = (f_row >= freq_start) & (f_row < freq_start + freq_width)
        field = (
            (modulation * power)
            * jnp.exp(1j * _phase_grid(t_col, f_row, s0, sdot, r0, phi0))
            * in_range
        )
        field = jnp.where(valid, field, 0.0)
        msk = msk | ((jnp.abs(field) > floor) & in_range & valid)
        return (field_acc + field, msk), None

    (bb_field, mask), _ = jax.lax.scan(
        bb_event,
        (bb_field, mask),
        (kb[1:], jnp.arange(MAXB) < n_chunks),
    )

    # ---- narrowband: single channels, ~5% of the band ------------------
    E_NB = int(F * 0.05)
    nb_field = jnp.zeros((T, F), jnp.complex64)
    if E_NB > 0:
        kn = random.split(keys[2], E_NB)

        def nb_event(k):
            ks = random.split(k, 5)
            freq_idx = random.randint(ks[0], (), 0, F)
            rfi_val = power_range[random.randint(ks[1], (), 0, len(power_range))]
            drifting = random.uniform(ks[2], ()) < drift_prob
            s0, sdot, r0, phi0 = _draw_event_phase(
                ks[3], 1, T, bl, drifting, max_tf, max_ff
            )
            modulation = random.uniform(ks[4], (T,), minval=0.5, maxval=2.0)
            t_lin = jnp.arange(T, dtype=jnp.float32)
            field = (modulation * rfi_val) * jnp.exp(
                1j * _phase_grid(t_lin, freq_idx.astype(jnp.float32), s0, sdot, r0, phi0)
            )
            return freq_idx, field

        nb_idx, nb_fields = jax.vmap(nb_event)(kn)  # (E,), (E, T)
        nb_field = nb_field.at[:, nb_idx].add(nb_fields.T)
        above = (jnp.abs(nb_fields) > floor).astype(jnp.int32)  # (E, T)
        hits = jnp.zeros((T, F), jnp.int32).at[:, nb_idx].add(above.T)
        mask = mask | (hits > 0)

    # ---- time bursts: single time rows, ~10% of the scan ---------------
    E_TB = int(T * 0.1)
    tb_field = jnp.zeros((T, F), jnp.complex64)
    if E_TB > 0:
        kt = random.split(keys[3], E_TB)

        def tb_event(k):
            ks = random.split(k, 4)
            time_idx = random.randint(ks[0], (), 0, T)
            rfi_val = power_range[random.randint(ks[1], (), 0, len(power_range))]
            s0, sdot, r0, phi0 = _draw_event_phase(
                ks[2], F, 1, bl, False, max_tf, max_ff
            )
            modulation = random.uniform(ks[3], (F,), minval=0.5, maxval=2.0)
            f_lin = jnp.arange(F, dtype=jnp.float32)
            field = (modulation * rfi_val) * jnp.exp(
                1j * _phase_grid(time_idx.astype(jnp.float32), f_lin, s0, sdot, r0, phi0)
            )
            return time_idx, field

        tb_idx, tb_fields = jax.vmap(tb_event)(kt)  # (E,), (E, F)
        tb_field = tb_field.at[tb_idx, :].add(tb_fields)
        above = (jnp.abs(tb_fields) > floor).astype(jnp.int32)
        hits = jnp.zeros((T, F), jnp.int32).at[tb_idx, :].add(above)
        mask = mask | (hits > 0)

    # ---- gibbs ringing: one linear conv per family/axis ---------------
    if gibbs:
        bb_field = _conv_along(bb_field, kernel, axis=1)
        nb_field = _conv_along(nb_field, kernel, axis=1)
        tb_field = _conv_along(tb_field, kernel, axis=0)

    spread = bb_field + nb_field + tb_field
    tf_rr = tf_rr + spread
    tf_ll = tf_ll + spread

    # ---- linear sweeps (5): point scatter ------------------------------
    kl = random.split(keys[4], 5)

    def lin_sweep(k):
        ks = random.split(k, 6)
        start_t = random.randint(ks[0], (), 0, T // 2)
        start_f = random.randint(ks[1], (), 0, F // 2)
        slope = random.uniform(ks[2], (), minval=-2.0, maxval=2.0)
        drifting = random.uniform(ks[3], ()) < drift_prob
        s0, sdot, r0, phi0 = _draw_event_phase(
            ks[4], 1, T // 2, bl, drifting, max_tf, max_ff
        )
        i = jnp.arange(T // 2, dtype=jnp.float32)
        # python int() truncates toward zero (simulator.py:208)
        f_idx = jnp.trunc(start_f + slope * i).astype(jnp.int32) % F
        t_idx = (start_t + jnp.arange(T // 2)) % T
        amp = power_range[random.randint(ks[5], (T // 2,), 0, len(power_range))]
        val = amp * jnp.exp(
            1j
            * _phase_grid(
                t_idx.astype(jnp.float32), f_idx.astype(jnp.float32), s0, sdot, r0, phi0
            )
        )
        return t_idx, f_idx, val, amp > floor

    lt, lf, lv, la = jax.vmap(lin_sweep)(kl)
    lt, lf, lv, la = lt.ravel(), lf.ravel(), lv.ravel(), la.ravel()
    tf_rr = tf_rr.at[lt, lf].add(lv)
    tf_ll = tf_ll.at[lt, lf].add(lv)
    hits = jnp.zeros((T, F), jnp.int32).at[lt, lf].add(la.astype(jnp.int32))
    mask = mask | (hits > 0)

    # ---- quadratic sweeps (5, RR only) ---------------------------------
    kq = random.split(keys[5], 5)

    def quad_sweep(k):
        ks = random.split(k, 5)
        start_t = random.randint(ks[0], (), 0, T // 4)
        start_f = random.randint(ks[1], (), 0, F // 4)
        direction = jnp.where(random.bernoulli(ks[2]), 1, -1)
        s0, sdot, r0, phi0 = _draw_event_phase(
            ks[3], 1, T // 4, bl, True, max_tf, max_ff
        )
        t = jnp.arange(T // 4)
        # floor division after sign multiply (simulator.py:224)
        f_idx = (start_f + jnp.floor_divide(direction * t**2, 100)) % F
        t_idx = (start_t + t) % T
        amp = power_range[random.randint(ks[4], (T // 4,), 0, len(power_range))]
        val = amp * jnp.exp(
            1j
            * _phase_grid(
                t_idx.astype(jnp.float32), f_idx.astype(jnp.float32), s0, sdot, r0, phi0
            )
        )
        return t_idx, f_idx, val, amp > floor

    qt, qf, qv, qa = jax.vmap(quad_sweep)(kq)
    qt, qf, qv, qa = qt.ravel(), qf.ravel(), qv.ravel(), qa.ravel()
    tf_rr = tf_rr.at[qt, qf].add(qv)
    hits = jnp.zeros((T, F), jnp.int32).at[qt, qf].add(qa.astype(jnp.int32))
    mask = mask | (hits > 0)

    # ---- cross-hands inherit coherent RR structure ---------------------
    k_rl, k_lr = random.split(keys[6])
    tf_rl = tf_rl + random.uniform(k_rl, (T, F)) * tf_rr
    tf_lr = tf_lr + random.uniform(k_lr, (T, F)) * tf_rr

    return jnp.stack([tf_rr, tf_rl, tf_lr, tf_ll]), mask
