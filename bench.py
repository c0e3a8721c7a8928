"""Benchmark: waterfall patches/sec/chip for preprocess + UNet fwd+bwd.

Workload (BASELINE.json metric): 1024x1024 synthetic complex waterfalls
-> full Preprocessor.create_dataset (4-way rotation augmentation, 128^2
patchify, custom exact flags, blank removal, 3-channel extraction,
ImageNet normalization) -> UNet train steps (BCE+Dice fwd+bwd) over all
resulting patches. Throughput = patches through the full pipeline per
wall-clock second on one chip.

Baseline denominator (BASELINE.md step 0): the reference CPU pipeline
measured on this machine — Preprocessor.create_dataset + torch UNet
(in_ch=3, init_features=32, batch 4) fwd+bwd, sequential path:
50.98 s/waterfall, 88 kept patches -> 1.73 patches/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

CPU_REFERENCE_PATCHES_PER_SEC = 1.73  # measured 2026-08-16, see module docstring
# TPU v5e (v5litepod) bf16 peak: 197 TFLOPS/chip (public spec). MFU is
# reported against this; on other backends (CPU tests) it is omitted.
V5E_BF16_PEAK_FLOPS = 197e12


def _sync(x):
    """HARD device sync via a tiny host readback of each leaf's first
    element. ``jax.block_until_ready`` is NOT a reliable fence on the
    remote (axon) backend — measured: 8 chained 112 ms train programs
    "blocked" in 17 ms total — so every timing boundary in this file
    reads a value back instead."""
    import jax

    for leaf in jax.tree.leaves(x):
        leaf = jax.numpy.asarray(leaf)
        if jax.numpy.iscomplexobj(leaf):
            # Complex host<->device transfers are UNIMPLEMENTED on the
            # axon backend; reading the real plane syncs just the same.
            leaf = leaf.real
        np.asarray(leaf[(0,) * leaf.ndim])


def _train_step_cost(compiled):
    """FLOPs (and bytes) from a compiled executable's XLA cost
    analysis; None when the backend doesn't implement it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def unet_train_flops_analytic(batch, hw=128, in_ch=3, f=32, depth=4,
                              out_ch=1):
    """Analytic FLOPs for one UNet train step (fwd+bwd) at batch size
    ``batch``: conv MACs x2 (mul+add) x3 (forward + input-gradient +
    weight-gradient convolutions). BN/activation/pool/optimizer flops
    are omitted (<2% of conv flops at these shapes).

    This is the MFU numerator of record: the remote TPU backend's
    ``cost_analysis`` reports flops ~19x below this closed-form count
    (2.7% "MFU" while sustaining ~4800 patches/s — physically
    impossible for these conv shapes), so the XLA number is recorded
    for reference only.
    """
    macs = 0
    h = hw
    c_in = in_ch
    for i in range(depth):                      # encoder DoubleConvs
        c = f * 2**i
        macs += h * h * 9 * (c_in * c + c * c)
        c_in = c
        h //= 2
    c = f * 2**depth                            # bottleneck
    macs += h * h * 9 * (c_in * c + c * c)
    c_in = c
    for i in reversed(range(depth)):            # decoder stages
        co = f * 2**i
        h *= 2
        macs += h * h * c_in * co               # 2x2 stride-2 up-conv
        macs += h * h * 9 * (2 * co * co + co * co)  # concat DoubleConv
        c_in = co
    macs += hw * hw * f * out_ch                # final 1x1
    return 6 * macs * batch


def unet_s2d_train_flops_analytic(batch, hw=128, in_ch=3, f=32, depth=4,
                                  out_ch=1):
    """Analytic FLOPs for the space-to-depth packed UNet variant
    (``UNet(space_to_depth=True)``): the whole network runs at hw/2,
    the packing replaces the first resolution level (depth-1 encoder
    stages at features 2f..), logits restored by a 4x-channel 1x1 head
    + depth-to-space. Same counting rules as
    :func:`unet_train_flops_analytic`."""
    macs = 0
    h = hw // 2
    c_in = 4 * in_ch
    for i in range(depth - 1):                  # packed encoder stages
        c = f * 2 ** (i + 1)
        macs += h * h * 9 * (c_in * c + c * c)
        c_in = c
        h //= 2
    c = f * 2**depth                            # bottleneck (unchanged)
    macs += h * h * 9 * (c_in * c + c * c)
    c_in = c
    for i in reversed(range(depth - 1)):        # packed decoder stages
        co = f * 2 ** (i + 1)
        h *= 2
        macs += h * h * c_in * co               # 2x2 stride-2 up-conv
        macs += h * h * 9 * (2 * co * co + co * co)
        c_in = co
    macs += h * h * c_in * 4 * out_ch           # packed 1x1 head
    return 6 * macs * batch


def _enable_cache():
    # persist XLA compiles across runs (remote-TPU compiles are 30-60 s
    # per shape); the measured numbers always exclude compile anyway
    from rfi_toolbox_tpu.utils import enable_compilation_cache

    enable_compilation_cache()


def main(s2d=False):
    """Headline pipeline. ``s2d=True`` (the ``pipeline_s2d`` config)
    swaps in the MXU-packed UNet variant — same pipeline, same data,
    same quality class on the coherent task (BASELINE.md round-4
    quality table) — to record what the full generate+preprocess+train
    loop does when the model is not the parity architecture. The
    default headline keeps the parity UNet so the number stays
    comparable to the reference baseline across rounds."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.preprocess import Preprocessor
    from rfi_toolbox_tpu.synth import make_sample_generator
    from rfi_toolbox_tpu.train import create_train_state, train_steps

    B = 8  # waterfalls per iteration
    C = T = 1024
    PATCH = 128
    TRAIN_BATCH = 128

    sample_fn = make_sample_generator(
        C, T,
        noise_level=1.0,
        rfi_power_min=1000.0,
        rfi_power_max=10000.0,
        rfi_config={
            "narrowband_persistent": {"count": 20},
            "broadband_persistent": {"count": 5},
            "narrowband_bursty": {"count": 20},
            "broadband_bursty": {"count": 5},
            "frequency_sweep": {"count": 1},
        },
        num_polarizations=1,
    )
    batch_gen = jax.jit(jax.vmap(sample_fn))

    model = UNet(out_channels=1, init_features=32, dtype=jnp.bfloat16,
                 space_to_depth=s2d)
    state = create_train_state(
        model, jax.random.key(1), (1, PATCH, PATCH, 3), learning_rate=1e-4
    )

    def preprocess(key):
        wf, mask, _ = batch_gen(jax.random.split(key, B))
        ds = Preprocessor(wf, flags=mask).create_dataset(
            patch_size=PATCH, use_custom_flags=True, seed=0,
            pad_to_multiple=TRAIN_BATCH,
        )
        return jnp.asarray(ds.images), jnp.asarray(ds.labels, jnp.float32)

    def preprocess_static(key, k):
        # fully-device selection (static_select_flagged): the steady-state
        # loop contains NO data-dependent host readback — every iteration
        # is pure async dispatch, so preprocessing rides the device queue
        # behind the previous train scan instead of serializing on a
        # blank-removal round trip (round-3 verdict #2)
        import os

        wf, mask, _ = batch_gen(jax.random.split(key, B))
        if os.environ.get("RFI_BENCH_SPLIT_PREP") == "1":
            # outage fallback (preflighted in __main__): the compile
            # service rejects K-class programs above a peak-buffer
            # cliff in stretches; two half-batch programs do the
            # IDENTICAL total work (recorded as prep_split in the
            # result JSON — selection runs per half instead of jointly)
            h = B // 2
            parts = []
            for sl in (slice(0, h), slice(h, B)):
                ds = Preprocessor(wf[sl], flags=mask[sl]).create_dataset(
                    patch_size=PATCH, use_custom_flags=True, seed=0,
                    static_num_patches=k // 2,
                )
                parts.append((jnp.asarray(ds.images),
                              jnp.asarray(ds.labels, jnp.float32)))
            return (jnp.concatenate([p[0] for p in parts]),
                    jnp.concatenate([p[1] for p in parts]))
        ds = Preprocessor(wf, flags=mask).create_dataset(
            patch_size=PATCH, use_custom_flags=True, seed=0,
            static_num_patches=k,
        )
        return jnp.asarray(ds.images), jnp.asarray(ds.labels, jnp.float32)

    def chunk(images, labels):
        n = (len(images) // TRAIN_BATCH) * TRAIN_BATCH
        s = n // TRAIN_BATCH
        return (
            images[:n].reshape(s, TRAIN_BATCH, *images.shape[1:]),
            labels[:n].reshape(s, TRAIN_BATCH, *labels.shape[1:]),
        )

    def train_all(state, images, labels):
        # ALL minibatches of the iteration run as ONE lax.scan program:
        # one dispatch instead of one per minibatch (the remote-TPU
        # control round trip used to serialize the donated-state queue)
        imgs, lbls = chunk(images, labels)
        state, losses = train_steps(state, imgs, lbls)
        return state, losses[-1]

    # Probe: ONE host-path preprocess picks the static patch budget K
    # (the kept-count of a representative iteration, rounded down to
    # whole train batches); every steady-state iteration then processes
    # exactly K patches via the device-side selection. RFI_BENCH_K
    # skips the probe (outage fallback — the probe program is itself
    # in the compile-rejection class; 1920 is the recorded headline K
    # of rounds 3-5).
    import os as _os

    if _os.environ.get("RFI_BENCH_K"):
        K = int(_os.environ["RFI_BENCH_K"])
    else:
        images, _ = preprocess(jax.random.key(0))
        K = max((len(images) // TRAIN_BATCH) * TRAIN_BATCH, TRAIN_BATCH)

    # Warmup: compile generation, static preprocessing and train step.
    images, labels = preprocess_static(jax.random.key(0), K)
    state, loss = train_all(state, images, labels)
    _sync(loss)

    # --- train-step FLOPs / MFU accounting (round-2 verdict #1) -------
    # Lower+compile the scan program for the warmup shape, read XLA's
    # cost analysis, then time it device-resident (no preprocess in the
    # way) to get pure train throughput and achieved TFLOPS vs the v5e
    # bf16 peak.
    imgs_c, lbls_c = chunk(images, labels)
    n_steps = imgs_c.shape[0]
    compiled = train_steps.lower(state, imgs_c, lbls_c).compile()
    xla_flops = _train_step_cost(compiled)
    state, losses = train_steps(state, imgs_c, lbls_c)  # warm this shape
    _sync(losses)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = train_steps(state, imgs_c, lbls_c)
    _sync(losses)
    dt_call = (time.perf_counter() - t0) / reps
    train_patches_per_s = n_steps * TRAIN_BATCH / dt_call
    flops_fn = unet_s2d_train_flops_analytic if s2d \
        else unet_train_flops_analytic
    flops_per_step = flops_fn(TRAIN_BATCH)
    tflops = flops_per_step * n_steps / dt_call / 1e12
    train_info = {
        "train_batch": TRAIN_BATCH,
        "steps_per_sec": round(n_steps / dt_call, 2),
        "train_only_patches_per_sec": round(train_patches_per_s, 1),
        "flops_per_step_analytic": round(flops_per_step),
        "achieved_tflops": round(tflops, 1),
        "mfu_pct_v5e_bf16": round(100 * tflops * 1e12
                                  / V5E_BF16_PEAK_FLOPS, 1),
    }
    if xla_flops:
        # recorded for reference; see unet_train_flops_analytic docstring
        train_info["xla_cost_analysis_flops_per_step"] = round(
            xla_flops / n_steps
        )

    # Pipelined steady state: the static-selection path makes every
    # iteration pure async dispatch (no blank-removal host readback —
    # the round-3 pipeline/train gap was that blocking round trip), so
    # generation + preprocessing of iteration i+1 queues behind train
    # step i and the device never waits on the host. FIVE timed
    # windows, median kept (recorded in the JSON): the remote-TPU
    # tunnel occasionally injects multi-hundred-ms stalls that are
    # transport noise, not device throughput.
    def timed_window(seed0, iters=4):
        nonlocal state
        total_patches = 0
        nxt = preprocess_static(jax.random.key(seed0), K)
        t0 = time.perf_counter()
        for i in range(iters):
            images, labels = nxt
            state, loss = train_all(state, images, labels)
            if i + 1 < iters:
                nxt = preprocess_static(jax.random.key(seed0 + i + 1), K)
            total_patches += len(images)
        _sync(loss)
        return total_patches / (time.perf_counter() - t0)

    window_seeds = (1, 10, 20, 30, 40)
    windows = [timed_window(s) for s in window_seeds]
    value = float(np.median(windows))
    print(
        json.dumps(
            {
                "metric": "waterfall_patches_per_sec_per_chip"
                          + ("_s2d" if s2d else ""),
                "value": round(value, 2),
                "unit": "patches/s (preprocess + UNet"
                        + ("-s2d" if s2d else "")
                        + " fwd+bwd, 1024^2 waterfalls)",
                "vs_baseline": round(value / CPU_REFERENCE_PATCHES_PER_SEC, 2),
                "windows": len(windows),
                "selection": "median",
                "window_values": [round(w, 1) for w in windows],
                "static_patches_per_iter": K,
                "prep_extract": _os.environ.get("RFI_STATIC_EXTRACT",
                                                "auto"),
                "prep_split": _os.environ.get("RFI_BENCH_SPLIT_PREP") == "1",
                "pipeline_vs_train_only": round(
                    value / train_patches_per_s, 3
                ),
                "train_step": train_info,
            }
        )
    )



def bench_fourpol(profile_dir=None):
    """4-polarization apples-to-apples headline: the reference's
    standard config (synthetic_train_4k.yaml: 1024^2, 4 pol, ~51 events,
    bandpass order 8, pol_corr 0.8) through the same preprocess+train
    pipeline as main(). Reports patches/s plus a per-stage breakdown
    (generation / preprocess / train) so the time sinks are on record.
    Pass a directory (or set RFI_TRACE_DIR) to also write a
    jax.profiler trace of one steady-state iteration."""
    import os

    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.preprocess import Preprocessor
    from rfi_toolbox_tpu.synth import make_sample_generator
    from rfi_toolbox_tpu.train import create_train_state, train_steps

    B = 2  # 4-pol waterfalls/iteration -> 8 planes, same volume as main()
    C = T = 1024
    PATCH = 128
    TRAIN_BATCH = 128

    sample_fn = make_sample_generator(
        C, T,
        noise_level=1.0,
        rfi_power_min=1000.0,
        rfi_power_max=10000.0,
        rfi_config={
            "narrowband_persistent": {"count": 20},
            "broadband_persistent": {"count": 5},
            "narrowband_bursty": {"count": 20},
            "broadband_bursty": {"count": 5},
            "frequency_sweep": {"count": 1},
        },
        enable_bandpass=True,
        bandpass_order=8,
        num_polarizations=4,
        pol_corr=0.8,
    )
    batch_gen = jax.jit(jax.vmap(sample_fn))

    model = UNet(out_channels=1, init_features=32, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(1), (1, PATCH, PATCH, 3), learning_rate=1e-4
    )

    def generate(key):
        wf, mask, _ = batch_gen(jax.random.split(key, B))
        return wf, mask  # (B, 4, C, T)

    def preprocess(wf, mask):
        ds = Preprocessor(wf, flags=mask).create_dataset(
            patch_size=PATCH, use_custom_flags=True, seed=0,
            pad_to_multiple=TRAIN_BATCH,
        )
        return jnp.asarray(ds.images), jnp.asarray(ds.labels, jnp.float32)

    def train_all(state, images, labels):
        n = (len(images) // TRAIN_BATCH) * TRAIN_BATCH
        s = n // TRAIN_BATCH
        state, losses = train_steps(
            state,
            images[:n].reshape(s, TRAIN_BATCH, *images.shape[1:]),
            labels[:n].reshape(s, TRAIN_BATCH, *labels.shape[1:]),
        )
        return state, losses[-1]

    # Warmup / compile
    wf, mask = generate(jax.random.key(0))
    images, labels = preprocess(wf, mask)
    state, loss = train_all(state, images, labels)
    _sync(loss)

    profile_dir = profile_dir or os.environ.get("RFI_TRACE_DIR")
    if profile_dir:
        from rfi_toolbox_tpu.utils.profiling import trace

        with trace(profile_dir):
            wf, mask = generate(jax.random.key(99))
            images, labels = preprocess(wf, mask)
            state, loss = train_all(state, images, labels)
            _sync(loss)

    # Per-stage breakdown (device-synced at each boundary)
    stages = {"generate": 0.0, "preprocess": 0.0, "train": 0.0}
    iters = 3
    total_patches = 0
    t_all0 = time.perf_counter()
    for i in range(iters):
        t0 = time.perf_counter()
        wf, mask = generate(jax.random.key(i + 1))
        _sync(wf)
        t1 = time.perf_counter()
        images, labels = preprocess(wf, mask)
        _sync(images)
        t2 = time.perf_counter()
        state, loss = train_all(state, images, labels)
        _sync(loss)
        t3 = time.perf_counter()
        stages["generate"] += t1 - t0
        stages["preprocess"] += t2 - t1
        stages["train"] += t3 - t2
        total_patches += len(images)
    elapsed = time.perf_counter() - t_all0

    value = total_patches / elapsed
    print(json.dumps({
        "metric": "fourpol_patches_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "patches/s (4-pol 1024^2 preprocess + UNet fwd+bwd)",
        "vs_baseline": round(value / CPU_REFERENCE_PATCHES_PER_SEC, 2),
        "stage_seconds": {k: round(v, 3) for k, v in stages.items()},
        "waterfalls_per_sec": round(B * iters / elapsed, 3),
    }))


def bench_generate_mad_ffi():
    """BASELINE config 1: SyntheticDataGenerator 1024^2 + MAD sigma-5
    flagging + compute_ffi, waterfalls/sec on one chip."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.io import flag_waterfalls
    from rfi_toolbox_tpu.synth import make_sample_generator

    B, C, T = 4, 1024, 1024
    sample_fn = make_sample_generator(
        C, T,
        rfi_config={
            "narrowband_persistent": {"count": 20},
            "broadband_persistent": {"count": 5},
            "narrowband_bursty": {"count": 20},
            "broadband_bursty": {"count": 5},
            "frequency_sweep": {"count": 1},
        },
        num_polarizations=1,
    )
    batch_gen = jax.jit(jax.vmap(sample_fn))

    @jax.jit
    def ffi_device(mag, flags):
        keep = ~flags
        n = jnp.sum(keep, axis=(1, 2)).astype(jnp.float32)
        mean_b = mag.mean(axis=(1, 2))
        std_b = mag.std(axis=(1, 2))
        masked = jnp.where(keep, mag, 0.0)
        mean_a = masked.sum(axis=(1, 2)) / n
        var_a = jnp.sum(jnp.where(keep, (mag - mean_a[:, None, None]) ** 2, 0.0),
                        axis=(1, 2)) / n
        std_red = 1.0 - jnp.sqrt(var_a) / std_b
        frac = flags.mean(axis=(1, 2))
        return std_red * (1.0 - 0.5 * frac)

    def iteration(key):
        wf, mask, _ = batch_gen(jax.random.split(key, B))
        mag = jnp.abs(wf[:, 0])
        # per-128^2-patch MAD flags, reassembled (product behavior)
        flags = flag_waterfalls(wf[:, 0], method="mad", sigma=5.0,
                                patch_size=128)
        return ffi_device(mag, flags)

    _sync(iteration(jax.random.key(0)))
    # ~1.7 ms of device work per iteration is dwarfed by single
    # round-trip tunnel jitter, so amortize: 20 iterations per window
    # with ONE final sync, five windows, median kept (round-2 verdict
    # #8 — the recorded number must be signal, not transport noise)
    iters, n_windows = 20, 5
    windows = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        for i in range(iters):
            out = iteration(jax.random.key(w * iters + i + 1))
        _sync(out)
        windows.append(B * iters / (time.perf_counter() - t0))
    value = float(np.median(windows))
    print(json.dumps({
        "metric": "gen_mad_ffi_waterfalls_per_sec",
        "value": round(value, 2),
        "unit": "1024^2 waterfalls/s (generate + MAD sigma-5 + FFI)",
        "windows": n_windows,
        "iters_per_window": iters,
        "selection": "median",
        "window_values": [round(w, 1) for w in windows],
    }))


def bench_instance64():
    """BASELINE config 4: SOLOLite fwd+bwd at batch 64 on 128^2 patches.

    Uses the scan-fused path (generation + K steps per dispatch); the
    sequential number is reported alongside for the dispatch-overhead
    delta."""
    from rfi_toolbox_tpu.train import InstanceTrainer

    K = 15
    trainer = InstanceTrainer(patch_size=128, batch_size=64, seed=0)
    trainer.fit(num_steps=3, log_every=3)  # warmup/compile (sequential)
    trainer.fit(num_steps=K, log_every=K, fused_steps=K)  # compile fused
    res_seq = trainer.fit(num_steps=K, log_every=K)
    res = trainer.fit(num_steps=3 * K, log_every=3 * K, fused_steps=K)
    sps = res["history"][-1]["steps_per_sec"]
    print(json.dumps({
        "metric": "sololite_batch64_steps_per_sec",
        "value": round(sps, 2),
        "unit": "fwd+bwd steps/s (batch 64, on-device generation included)",
        "fused_steps": K,
        "sequential_steps_per_sec": round(
            res_seq["history"][-1]["steps_per_sec"], 2
        ),
    }))


def bench_serving():
    """Serving path: AOT-compiled UNet predictor (pretrained snapshot),
    steady-state throughput + p50 request latency at batch 32."""
    from rfi_toolbox_tpu.serving import CompiledPredictor

    rng = np.random.default_rng(0)
    pred = CompiledPredictor.from_snapshot(
        "pretrained/unet16_synthetic.npz", batch_size=32,
    )
    x = rng.normal(size=(32, 128, 128, 3)).astype(np.float32)
    pred(x)  # warm transfer path (compile already happened in __init__)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        pred(x)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    print(json.dumps({
        "metric": "serving_patches_per_sec",
        "value": round(32 / p50, 1),
        "unit": "patches/s (AOT UNet16, batch 32, incl. host<->device)",
        "p50_batch_latency_ms": round(p50 * 1e3, 2),
    }))


def bench_flag_model8():
    """Coherent 8-channel model flagging throughput: (B, 4, 1024, 1024)
    complex visibilities -> patchify all 4 pols jointly -> per-patch
    robust scale -> UNet16-GN AOT forward -> unpatchify, Mvis/s — the
    production `flag_measurement_set(method='model8')` compute path
    minus table I/O. Device-resident end to end: the predictor consumes
    the patch array on device (CompiledPredictor's jax.Array path), so
    the only host traffic is the complex-visibility upload and the bool
    flag download. Uses the f=16 GroupNorm tier: held-out IoU 0.9332
    matches the f=24 flagship's 0.9339 at 2.25x cheaper forward
    (BASELINE.md GN ladder)."""
    import jax

    from rfi_toolbox_tpu.io import flag_waterfalls_coherent
    from rfi_toolbox_tpu.serving import CompiledPredictor

    B, C, T = 2, 1024, 1024
    rng = np.random.default_rng(0)
    pred = CompiledPredictor.from_snapshot(
        "pretrained/unet16gn_coherent8ch.npz", batch_size=64,
    )
    base = rng.normal(1.0, 0.1, (B, 4, C, T))
    base[:, :, 100:110, :] += 3e3
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    flag_waterfalls_coherent(vis, pred, patch_size=128)  # warm compiles
    # one request is ~2 ms of device work — single-call timing is
    # dominated by per-round-trip tunnel jitter (observed 1.0-4.3
    # Mvis/s spread), so amortize several requests per window
    windows, iters = [], 5
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            flags = flag_waterfalls_coherent(vis, pred, patch_size=128)
            _sync(flags)
        windows.append(
            iters * B * 4 * C * T / (time.perf_counter() - t0) / 1e6
        )
    value = float(np.median(windows))
    print(json.dumps({
        "metric": "flag_model8_megavis_per_sec",
        "value": round(value, 2),
        "unit": "Mvis/s (4-pol joint UNet16-GN flagging, 1024^2 waterfalls)",
        "windows": len(windows),
        "iters_per_window": iters,
        "selection": "median",
        "window_values": [round(w, 2) for w in windows],
    }))


def bench_flag_model8_device():
    """Device-only variant of ``flag_model8`` (round-3 verdict #10): the
    production number swings 1.8-4.0 Mvis/s with tunnel load because the
    complex-visibility upload rides the host path every request. Here
    the input is pre-staged on device ONCE before timing and the bool
    flags stay device-resident (each iteration syncs via a one-element
    readback, not a full download), so the JSON records pure compute
    capability; ``flag_model8`` keeps recording the transport-inclusive
    production number next to it."""
    from rfi_toolbox_tpu.io import flag_waterfalls_coherent
    from rfi_toolbox_tpu.serving import CompiledPredictor
    from rfi_toolbox_tpu.utils import to_device

    B, C, T = 2, 1024, 1024
    rng = np.random.default_rng(0)
    pred = CompiledPredictor.from_snapshot(
        "pretrained/unet16gn_coherent8ch.npz", batch_size=64,
    )
    base = rng.normal(1.0, 0.1, (B, 4, C, T))
    base[:, :, 100:110, :] += 3e3
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    vis_dev = to_device(vis, dtype=np.complex64)   # staged ONCE
    flag_waterfalls_coherent(vis_dev, pred, patch_size=128)  # warm
    windows, iters = [], 5
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            flags = flag_waterfalls_coherent(vis_dev, pred, patch_size=128)
            _sync(flags)            # one-element readback, flags stay on device
        windows.append(
            iters * B * 4 * C * T / (time.perf_counter() - t0) / 1e6
        )
    value = float(np.median(windows))
    print(json.dumps({
        "metric": "flag_model8_device_megavis_per_sec",
        "value": round(value, 2),
        "unit": "Mvis/s (device-resident: input pre-staged, flags on device)",
        "windows": len(windows),
        "iters_per_window": iters,
        "selection": "median",
        "window_values": [round(w, 2) for w in windows],
    }))


def bench_ms_roundtrip():
    """BASELINE config 5: MSLoader -> fused preprocess -> MAD inference
    -> save_flags, visibilities/sec through the full round trip (FakeMS
    backend; casatools I/O replaces it transparently on real data)."""
    import numpy as np

    from rfi_toolbox_tpu.io import flag_measurement_set, make_fake_ms

    ms = make_fake_ms(num_antennas=5, channels_per_spw=(256,), num_times=256,
                      seed=1)
    # warmup on a copy: compile the device kernels once (25-60 s on the
    # remote TPU) so the timed pass measures the round trip itself
    flag_measurement_set(ms.copy(), method="mad", sigma=5.0, patch_size=128)
    t0 = time.perf_counter()
    result = flag_measurement_set(ms, method="mad", sigma=5.0, patch_size=128)
    dt = time.perf_counter() - t0
    n_vis = result["baselines"] * 4 * 256 * 256
    print(json.dumps({
        "metric": "ms_roundtrip_megavis_per_sec",
        "value": round(n_vis / dt / 1e6, 2),
        "unit": "Mvis/s (load -> preprocess -> MAD -> save_flags)",
    }))


def bench_train_norms():
    """Device-resident UNet train throughput, BatchNorm (reference
    parity) vs GroupNorm (beyond-reference ``norm='group'``): the
    roofline analysis puts BN's stats+normalize passes among the
    non-MXU residue of the step, and GroupNorm carries no cross-batch
    running stats to update. Same headline shapes (batch 128, 128^2,
    3ch, f=32, bf16), same data; reports both and the ratio."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import create_train_state, train_steps

    TRAIN_BATCH, PATCH, STEPS = 128, 128, 8
    key = jax.random.key(0)
    imgs = jax.random.normal(key, (STEPS, TRAIN_BATCH, PATCH, PATCH, 3),
                             jnp.float32)
    lbls = (jax.random.uniform(key, (STEPS, TRAIN_BATCH, PATCH, PATCH))
            > 0.9).astype(jnp.float32)

    results = {}
    for norm in ("batch", "group"):
        model = UNet(out_channels=1, init_features=32, dtype=jnp.bfloat16,
                     norm=norm)
        state = create_train_state(model, jax.random.key(1),
                                   (1, PATCH, PATCH, 3))
        state, losses = train_steps(state, imgs, lbls)  # compile + warm
        _sync(losses)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            state, losses = train_steps(state, imgs, lbls)
        _sync(losses)
        dt = (time.perf_counter() - t0) / reps
        tflops = unet_train_flops_analytic(TRAIN_BATCH) * STEPS / dt / 1e12
        results[norm] = {
            "patches_per_sec": round(STEPS * TRAIN_BATCH / dt, 1),
            "achieved_tflops": round(tflops, 1),
            "mfu_pct_v5e_bf16": round(
                100 * tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 1),
        }

    speedup = (results["group"]["patches_per_sec"]
               / results["batch"]["patches_per_sec"])
    print(json.dumps({
        "metric": "train_norm_patches_per_sec",
        "value": results["group"]["patches_per_sec"],
        "unit": "patches/s (device-resident fwd+bwd, norm='group')",
        "vs_baseline": round(speedup, 3),
        "baseline": "norm='batch' (reference parity) same shapes",
        "batch_norm": results["batch"],
        "group_norm": results["group"],
    }))


def bench_cold_compile():
    """Compile time as a recorded metric (round-3 verdict #3): cold
    trace+compile seconds of the all-six instance program — the exact
    program `train_rfi_model --instance --event_config
    all_six_events.yaml` traces (K=10 scan of on-device generation +
    SOLOLite f=48 fwd+bwd at batch 64). The persistent compilation
    cache is disabled for this process so the number is a true cold
    compile. Breakdown per structural piece in runs/compile_time.py."""
    import jax

    jax.config.update("jax_enable_compilation_cache", False)

    import optax

    from rfi_toolbox_tpu.models.instance import SOLOLite
    from rfi_toolbox_tpu.synth.sample import make_instance_sample_generator
    from rfi_toolbox_tpu.train.instance_trainer import (
        make_instance_fused_steps,
    )

    all_six = {
        "narrowband_persistent": {"count": [1, 3]},
        "broadband_persistent": {"count": [0, 2]},
        "narrowband_intermittent": {"count": [0, 2]},
        "narrowband_bursty": {"count": [0, 2]},
        "broadband_bursty": {"count": [0, 2]},
        "frequency_sweep": {"count": [0, 1]},
    }
    sample_fn = make_instance_sample_generator(128, 128,
                                               rfi_config=all_six)
    model = SOLOLite(num_classes=6, grid_size=8, features=48, embed_dim=48)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(8e-4, weight_decay=1e-5))
    fused = make_instance_fused_steps(model, tx, sample_fn, batch_size=64)

    import jax.numpy as jnp

    key = jax.random.key(0)
    params = model.init(key, jnp.zeros((1, 128, 128, 3), jnp.float32),
                        train=False)["params"]
    opt_state = tx.init(params)
    keys = jax.random.split(key, 10)
    t0 = time.perf_counter()
    lowered = fused.lower(params, opt_state, keys)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cold_compile_all6_s",
        "value": round(t_lower + t_compile, 1),
        "unit": "s (cold trace+lower+compile, all-six K=10 fused program)",
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
    }))


def bench_train_s2d():
    """Round-3 verdict #1c: the space-to-depth packed UNet
    (``UNet(space_to_depth=True)``, opt-in, beyond reference parity) vs
    the reference-parity UNet, device-resident fwd+bwd at the headline
    shapes. The packed variant removes the 25%-MXU-utilization
    full-resolution stages entirely (BASELINE.md roofline table), so it
    should clear the architecture's 53% effective ceiling."""
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import create_train_state, train_steps

    TRAIN_BATCH, PATCH, STEPS = 128, 128, 8
    key = jax.random.key(0)
    imgs = jax.random.normal(key, (STEPS, TRAIN_BATCH, PATCH, PATCH, 3),
                             jnp.float32)
    lbls = (jax.random.uniform(key, (STEPS, TRAIN_BATCH, PATCH, PATCH))
            > 0.9).astype(jnp.float32)

    results = {}
    for name, s2d, flops_fn in (
        ("baseline", False, unet_train_flops_analytic),
        ("space_to_depth", True, unet_s2d_train_flops_analytic),
    ):
        model = UNet(out_channels=1, init_features=32, dtype=jnp.bfloat16,
                     norm="group", space_to_depth=s2d)
        state = create_train_state(model, jax.random.key(1),
                                   (1, PATCH, PATCH, 3))
        state, losses = train_steps(state, imgs, lbls)  # compile + warm
        _sync(losses)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            state, losses = train_steps(state, imgs, lbls)
        _sync(losses)
        dt = (time.perf_counter() - t0) / reps
        tflops = flops_fn(TRAIN_BATCH) * STEPS / dt / 1e12
        results[name] = {
            "patches_per_sec": round(STEPS * TRAIN_BATCH / dt, 1),
            "flops_per_patch_analytic": round(flops_fn(1)),
            "achieved_tflops": round(tflops, 1),
            "mfu_pct_v5e_bf16": round(
                100 * tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 1),
        }

    speedup = (results["space_to_depth"]["patches_per_sec"]
               / results["baseline"]["patches_per_sec"])
    print(json.dumps({
        "metric": "train_s2d_patches_per_sec",
        "value": results["space_to_depth"]["patches_per_sec"],
        "unit": "patches/s (device-resident fwd+bwd, space_to_depth=True)",
        "vs_baseline": round(speedup, 3),
        "baseline": "UNet32-GN reference-parity architecture, same shapes",
        **results,
    }))


if __name__ == "__main__":
    import sys

    configs = {
        "gen_mad_ffi": "bench_generate_mad_ffi",
        "instance64": "bench_instance64",
        "ms_roundtrip": "bench_ms_roundtrip",
        "fourpol": "bench_fourpol",
        "serving": "bench_serving",
        "flag_model8": "bench_flag_model8",
        "flag_model8_device": "bench_flag_model8_device",
        "train_norms": "bench_train_norms",
        "train_s2d": "bench_train_s2d",
        "cold_compile": "bench_cold_compile",
    }
    _enable_cache()

    def _try_static_compile(extract, b, k):
        """Compile one static-prep candidate in a throwaway SUBPROCESS
        (a failed big compile poisons a process — CLAUDE.md); on
        success the persistent cache serves it to the bench process."""
        import subprocess

        code = (
            "import numpy as np, jax, jax.numpy as jnp\n"
            "from rfi_toolbox_tpu.utils import enable_compilation_cache\n"
            "enable_compilation_cache()\n"
            "from rfi_toolbox_tpu.preprocess.static_prep import "
            "make_static_prep_fn\n"
            f"fn = make_static_prep_fn(128, {k}, 4, flags_mode='custom',"
            f" use_pallas=True, extract='{extract}',"
            " return_patches=False)\n"
            f"x = jnp.zeros(({b}, 1024, 1024), jnp.complex64)\n"
            f"f = jnp.zeros(({b}, 1024, 1024), jnp.bool_)\n"
            "img = fn(x, f, jax.random.key(5))[0]\n"
            "np.asarray(img.reshape(-1)[0])\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=900,
            )
            return proc.returncode == 0
        except Exception:  # noqa: BLE001
            return False

    def _preflight_planes_extract():
        """Pick a compilable headline prep routing, best first:
        1. full-scale 'planes' (fastest measured — runs/prep_ablation)
        2. full-scale default ('auto' -> gather-fused): nothing to set
        3. half-batch 'planes' x2 (outage fallback: K-class programs
           are rejected in stretches while half-batch compiles fine)
        4. half-batch default x2
        Cases 3/4 also skip the (same-class) K-probe via RFI_BENCH_K,
        and the result JSON records prep_extract/prep_split."""
        import os

        if _try_static_compile("planes", 8, 1920):
            os.environ["RFI_STATIC_EXTRACT"] = "planes"
            print("# preflight: full-scale planes program — headline "
                  "routes through the Pallas epilogue", file=sys.stderr)
            return
        if _try_static_compile("auto", 8, 1920):
            return  # default routing compiles
        print("# preflight: full-scale prep rejected by the compile "
              "service — trying the half-batch split fallback",
              file=sys.stderr)
        os.environ["RFI_BENCH_SPLIT_PREP"] = "1"
        os.environ.setdefault("RFI_BENCH_K", "1920")
        if _try_static_compile("planes", 4, 960):
            os.environ["RFI_STATIC_EXTRACT"] = "planes"
            return
        _try_static_compile("auto", 4, 960)  # populate cache if possible

    def _run_with_fresh_process_retries(thunk):
        """The remote compile service rejects big fresh compiles in
        stretches, and one failed big compile POISONS the process
        (CLAUDE.md) — so on a transient backend failure the bench
        re-execs ITSELF (fresh process, same single driver invocation)
        after a pause, up to 4 times."""
        import os
        import time as _t

        try:
            thunk()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = ("RESOURCE_EXHAUSTED" in msg or "500" in msg
                         or "UNAVAILABLE" in msg)
            tries = int(os.environ.get("RFI_BENCH_RETRIES", "0"))
            if not transient or tries >= 4:
                raise
            print(f"# bench transient backend failure "
                  f"({msg.splitlines()[0][:90]}); re-exec "
                  f"{tries + 1}/4 in 180 s", file=sys.stderr, flush=True)
            _t.sleep(180)
            os.environ["RFI_BENCH_RETRIES"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)

    if len(sys.argv) > 1 and sys.argv[1] == "pipeline_s2d":
        _preflight_planes_extract()
        _run_with_fresh_process_retries(lambda: main(s2d=True))
    elif len(sys.argv) > 1 and sys.argv[1] in configs:
        _run_with_fresh_process_retries(
            lambda: globals()[configs[sys.argv[1]]]())
    else:
        _preflight_planes_extract()
        _run_with_fresh_process_retries(main)
