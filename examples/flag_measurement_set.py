"""End-to-end example: flag a measurement set (config 5 round trip).

Uses an in-memory FakeMS with injected synthetic RFI; replace
`make_fake_ms()` with a path to a real MS when casatools is installed.

Run: python examples/flag_measurement_set.py [--device cpu]
     python examples/flag_measurement_set.py --method model8
       (coherent 8-channel flagging: all 4 polarizations jointly
        through the shipped UNet16-GN throughput tier via an
        AOT-compiled predictor)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None)
    parser.add_argument("--ms", default=None, help="real MS path (optional)")
    parser.add_argument("--method", default="mad",
                        choices=("mad", "model8"),
                        help="'mad' statistical flagging, or 'model8' — "
                        "the coherent 8-channel UNet24 consuming all "
                        "four polarizations jointly")
    args = parser.parse_args()

    from rfi_toolbox_tpu.utils import configure_platform

    configure_platform(args.device)

    from rfi_toolbox_tpu.evaluation import compute_ffi, evaluate_segmentation
    from rfi_toolbox_tpu.io import (
        MSLoader,
        flag_measurement_set,
        inject_synthetic_data,
        make_fake_ms,
    )

    if args.ms:
        ms = args.ms
        truth = None
    else:
        rng = np.random.default_rng(0)
        ms = make_fake_ms(num_antennas=4, channels_per_spw=(256,),
                          num_times=256, seed=None)
        base = rng.normal(1.0, 0.1, (6, 4, 256, 256))
        truth = np.zeros((6, 4, 256, 256), bool)
        base[:, :, 60:66, :] += 5e3
        truth[:, :, 60:66, :] = True
        vis = base * np.exp(1j * rng.uniform(0, 6.28, base.shape))
        ms = inject_synthetic_data(ms, vis.astype(np.complex128))

    if args.method == "model8":
        # AOT-compile the shipped coherent-8ch snapshot once; the
        # predictor owns its input shape + best threshold (snapshot
        # metadata), so no configuration needs restating here.
        from rfi_toolbox_tpu.serving import CompiledPredictor

        predictor = CompiledPredictor.from_snapshot(
            "pretrained/unet16gn_coherent8ch.npz", batch_size=32
        )
        result = flag_measurement_set(
            ms, method="model8", predictor=predictor, patch_size=128
        )
    else:
        result = flag_measurement_set(ms, method="mad", sigma=5.0,
                                      patch_size=128)
    print("flagging result:", result)

    loader = MSLoader(ms)
    data = loader.load()
    flags = loader.load_flags()
    print("FFI:", compute_ffi(np.abs(data), flags))
    if truth is not None:
        # NB: the toy injection (uniform +5e3 stripes) is far from the
        # simulator distribution the model8 snapshot trained on; its
        # score here demonstrates wiring, not model quality (see
        # pretrained/README.md for held-out numbers).
        print("vs truth:", evaluate_segmentation(flags, truth))


if __name__ == "__main__":
    main()
