"""Cross-generator transfer evaluation (round-3 VERDICT #5).

Every quality number so far is measured on held-out keys of the SAME
generator a model trained on. This run evaluates the shipped snapshots
on distributions their generators never produced:

  1. unet16_synthetic (3-channel flagship) on `RFISimulator` physics —
     coherent fringe-modulated events, drift, Gibbs ringing, cross-hand
     leakage — pushed through the standard 3-channel flagging path
     (`flag_waterfalls(method='model')`), vs a MAD sigma-5 baseline on
     the identical planes. The simulator is held-out physics: nothing
     in the flagship's training distribution (separable box events)
     produces these morphologies. Reference analog: core/simulator.py.
  2. unet16_synthetic on out-of-range event mixes from its OWN
     generator family: 10x weaker events (rfi_power 100-1000 vs the
     trained 1000-10000), 3x denser mixes, and a weaker+denser combo.
  3. sololite_synthetic (instance model) on out-of-range parameters:
     weaker amplitudes and denser event counts than every training
     batch it saw.

Run serialized with other TPU jobs:
    python runs/transfer_eval.py 2>&1 | tee runs/transfer_eval.log
Writes runs/transfer_eval.json (the BASELINE.md transfer table).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.evaluation import evaluate_segmentation
from rfi_toolbox_tpu.io import flag_waterfalls
from rfi_toolbox_tpu.serving import CompiledPredictor
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.synth.simulator import RFISimulator
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

HELD_OUT_KEY = 77_000   # disjoint from every training/eval stream in use


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def seg_metrics(flags, masks):
    m = evaluate_segmentation(np.asarray(flags), np.asarray(masks))
    return {k: round(v, 4) for k, v in m.items()}


def eval_simulator_transfer(pred, n_waterfalls=8):
    """Flagship + MAD on RFISimulator physics (1024^2, RR pol)."""
    sim = RFISimulator(time_bins=1024, freq_bins=1024, seed=0)
    gen = jax.jit(jax.vmap(sim.generate_rfi_device))
    keys = jax.random.split(jax.random.key(HELD_OUT_KEY), n_waterfalls)
    tf, masks = gen(keys)                       # (B, 4, T, F), (B, T, F)
    vis = tf[:, 0]                              # RR plane, model is 1-pol
    out = {}
    flags = flag_waterfalls(vis, method="model", predictor=pred,
                            patch_size=128)
    out["model"] = seg_metrics(flags, masks)
    flags_mad = flag_waterfalls(vis, method="mad", sigma=5.0,
                                patch_size=128)
    out["mad_sigma5"] = seg_metrics(flags_mad, masks)
    log(f"simulator transfer: model={out['model']} mad={out['mad_sigma5']}")
    return out


TRAINED_MIX = {
    "narrowband_persistent": {"count": 20},
    "broadband_persistent": {"count": 5},
    "narrowband_bursty": {"count": 20},
    "broadband_bursty": {"count": 5},
    "frequency_sweep": {"count": 1},
}
DENSE_MIX = {k: {"count": v["count"] * 3} for k, v in TRAINED_MIX.items()}


def eval_out_of_range(pred, n_waterfalls=8):
    """Flagship on its own generator family at parameters outside every
    training batch (trained: power 1000-10000, the TRAINED_MIX counts)."""
    configs = {
        "in_range_control": dict(rfi_power_min=1000.0,
                                 rfi_power_max=10000.0,
                                 rfi_config=TRAINED_MIX),
        "weak_10x": dict(rfi_power_min=100.0, rfi_power_max=1000.0,
                         rfi_config=TRAINED_MIX),
        "dense_3x": dict(rfi_power_min=1000.0, rfi_power_max=10000.0,
                         rfi_config=DENSE_MIX),
        "weak_and_dense": dict(rfi_power_min=100.0, rfi_power_max=1000.0,
                               rfi_config=DENSE_MIX),
    }
    out = {}
    for name, cfg in configs.items():
        sample_fn = make_sample_generator(
            1024, 1024, noise_level=1.0, num_polarizations=1, **cfg)
        gen = jax.jit(jax.vmap(sample_fn))
        wf, mask, _ = gen(jax.random.split(jax.random.key(HELD_OUT_KEY),
                                           n_waterfalls))
        vis, masks = wf[:, 0], mask[:, 0]
        flags = flag_waterfalls(vis, method="model", predictor=pred,
                                patch_size=128)
        out[name] = seg_metrics(flags, masks)
        log(f"out-of-range {name}: {out[name]}")
    return out


ALL6_WEAK_DENSE = {
    "narrowband_persistent": {"count": [2, 5]},
    "broadband_persistent": {"count": [1, 3]},
    "narrowband_intermittent": {"count": [1, 3]},
    "narrowband_bursty": {"count": [1, 3]},
    "broadband_bursty": {"count": [1, 2]},
    "frequency_sweep": {"count": [0, 2]},
}


def eval_instance_transfer():
    from rfi_toolbox_tpu.evaluation import evaluate_instance_model
    from rfi_toolbox_tpu.train import InstanceTrainer

    out = {}
    for name, kwargs in {
        "weak_10x": dict(rfi_power_min=100.0, rfi_power_max=1000.0,
                         rfi_config=None),
        "dense_all6": dict(rfi_config=ALL6_WEAK_DENSE),
        "weak_dense_all6": dict(rfi_power_min=100.0, rfi_power_max=1000.0,
                                rfi_config=ALL6_WEAK_DENSE),
    }.items():
        tr = InstanceTrainer.load("pretrained/sololite_synthetic.npz",
                                  batch_size=16, seed=0, **kwargs)
        q = evaluate_instance_model(tr, num_images=64, seed=HELD_OUT_KEY,
                                    iou_thresh=0.5, score_thresh=0.25)
        q.pop("best_iou", None)
        out[name] = {k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in q.items()}
        log(f"instance transfer {name}: recall={q['recall']:.3f} "
            f"precision={q['precision']:.3f} "
            f"per_class={q['per_class_recall']}")
    return out


def main():
    results = {"held_out_key": HELD_OUT_KEY}
    pred = CompiledPredictor.from_snapshot("pretrained/unet16_synthetic.npz",
                                           batch_size=128)
    results["simulator_physics"] = eval_simulator_transfer(pred)
    results["out_of_range_events"] = eval_out_of_range(pred)
    results["instance_out_of_range"] = eval_instance_transfer()
    out = Path(__file__).parent / "transfer_eval.json"
    out.write_text(json.dumps(results, indent=1))
    log(f"-> {out}")


if __name__ == "__main__":
    main()
