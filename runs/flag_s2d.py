"""Round-4: device-resident model8 flagging throughput with the shipped
space-to-depth snapshot vs the plain f=16 GroupNorm tier (the
`bench.py flag_model8_device` configuration, identical shapes/fences).

Writes runs/flag_s2d.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from rfi_toolbox_tpu.io import flag_waterfalls_coherent
from rfi_toolbox_tpu.serving import CompiledPredictor
from rfi_toolbox_tpu.utils import enable_compilation_cache, to_device

enable_compilation_cache()

B, C, T = 2, 1024, 1024
rng = np.random.default_rng(0)
base = rng.normal(1.0, 0.1, (B, 4, C, T))
base[:, :, 100:110, :] += 3e3
vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
    np.complex64
)
vis_dev = to_device(vis, dtype=np.complex64)


def _sync(x):
    return bool(jnp.asarray(x).reshape(-1)[0])


def measure(snap):
    pred = CompiledPredictor.from_snapshot(snap, batch_size=64)
    flag_waterfalls_coherent(vis_dev, pred, patch_size=128)  # warm
    windows, iters = [], 5
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            flags = flag_waterfalls_coherent(vis_dev, pred, patch_size=128)
            _sync(flags)
        windows.append(
            iters * B * 4 * C * T / (time.perf_counter() - t0) / 1e6
        )
    return {"megavis_per_sec": round(float(np.median(windows)), 2),
            "window_values": [round(w, 2) for w in windows]}


plain = measure("pretrained/unet16gn_coherent8ch.npz")
s2d = measure("pretrained/unet16gn_s2d_coherent8ch.npz")
out = {
    "config": "flag_model8_device shapes (2x4x1024^2, device-resident)",
    "unet16gn": plain,
    "unet16gn_s2d": s2d,
    "speedup": round(s2d["megavis_per_sec"] / plain["megavis_per_sec"], 3),
}
print(json.dumps(out, indent=1))
Path("runs/flag_s2d.json").write_text(json.dumps(out, indent=1))
