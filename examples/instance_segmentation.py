"""End-to-end example: SOLOLite instance segmentation of RFI events.

Run: python examples/instance_segmentation.py [--device cpu] [--steps 100]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    from rfi_toolbox_tpu.utils import configure_platform

    configure_platform(args.device)

    import jax
    from jax import random

    from rfi_toolbox_tpu.preprocess import pipeline as P
    from rfi_toolbox_tpu.train import InstanceTrainer

    trainer = InstanceTrainer(patch_size=128, batch_size=args.batch_size,
                              learning_rate=3e-4, seed=0)
    result = trainer.fit(num_steps=args.steps, log_every=max(args.steps // 4, 1))
    for rec in result["history"]:
        print({k: round(v, 4) for k, v in rec.items()})

    batch = trainer.generate_batch(random.key(99))
    images = P.imagenet_normalize(P.extract_channels(batch["waterfall"]))
    detections = trainer.predict(np.asarray(images[:2]), score_thresh=0.25)
    for i, det in enumerate(detections):
        keep = det["scores"] > 0.25
        print(f"image {i}: {int(keep.sum())} instances, "
              f"classes {sorted(set(det['classes'][keep].tolist()))}")

    # held-out per-event quality (COCO-style matching @ IoU 0.5)
    from rfi_toolbox_tpu.evaluation import evaluate_instance_model

    quality = evaluate_instance_model(trainer, num_images=8, seed=10_000,
                                      iou_thresh=0.5, score_thresh=0.3)
    print({k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in quality.items()})


if __name__ == "__main__":
    main()
