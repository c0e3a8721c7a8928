"""Round-4: A/B of BatchNorm folding on the AOT serving surface
(VERDICT #1b accounting — fold_batchnorm ships default-on in
CompiledPredictor; this records what it is worth).

Measures the BatchNorm 3-channel flagship (pretrained/unet16_synthetic)
through CompiledPredictor with fold_norm True vs False, device-resident
batches, forced one-element readback as the fence per call
(jax.block_until_ready is not a fence on this backend).

Writes runs/fold_ab.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.serving import CompiledPredictor
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

BATCH = 64
rng = np.random.default_rng(0)
imgs_host = rng.normal(size=(BATCH, 128, 128, 3)).astype(np.float32)
imgs = jnp.asarray(imgs_host)


def measure(fold):
    pred = CompiledPredictor.from_snapshot(
        "pretrained/unet16_synthetic.npz", batch_size=BATCH,
        fold_norm=fold,
    )
    out = pred(imgs)                      # warm (device-resident path)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            out = pred(imgs)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        windows.append((time.perf_counter() - t0) / 20 * 1e3)
    med = float(np.median(windows))
    return {"ms_per_batch": round(med, 3),
            "window_ms": [round(w, 3) for w in windows],
            "folded": pred.folded}


unfolded = measure(False)
folded = measure(True)
out = {
    "snapshot": "pretrained/unet16_synthetic.npz",
    "batch": BATCH,
    "unfolded": unfolded,
    "folded": folded,
    "speedup": round(unfolded["ms_per_batch"] / folded["ms_per_batch"], 3),
}
print(json.dumps(out, indent=1))
Path("runs/fold_ab.json").write_text(json.dumps(out, indent=1))
