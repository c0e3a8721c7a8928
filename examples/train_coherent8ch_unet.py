"""Reproduce the shipped coherent-8-channel UNet snapshots.

The exact recipe behind ``pretrained/unet24_coherent8ch.npz``
(pretrained/README.md): on-device coherent-simulator generation at
256^2, per-sample robust scale, random time/freq flips, EMA 0.999,
warmup-cosine schedule, batch 16. The run checkpoints every few
thousand steps with full optimizer + EMA state, so it can be continued
later with ``--resume`` (continuing a run beats restarting one —
BASELINE.md round-3 rejected experiments).

Ship: python examples/train_coherent8ch_unet.py --steps 36000 \
          --checkpoint_dir ckpts/unet24 --out unet24_coherent8ch.npz
Continue: ... --resume ckpts/unet24/step_36000 --steps 12000
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", type=int, default=24)
    parser.add_argument("--norm", default="batch",
                        choices=["batch", "group", "none"],
                        help="UNet normalization; 'group' avoids "
                        "BatchNorm's unstable running-stats calibration "
                        "on this heavy-tailed task (BASELINE.md)")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps", type=int, default=36_000)
    parser.add_argument("--peak_lr", type=float, default=1e-3)
    parser.add_argument("--warmup", type=int, default=500)
    parser.add_argument("--fused_steps", type=int, default=20)
    parser.add_argument("--seed", type=int, default=2)
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--checkpoint_every", type=int, default=4000)
    parser.add_argument("--resume", default=None,
                        help="checkpoint dir from a previous run")
    parser.add_argument("--out", default=None,
                        help="export an .npz inference snapshot here")
    parser.add_argument("--eval_batches", type=int, default=8)
    parser.add_argument("--device", default=None)
    args = parser.parse_args()

    from rfi_toolbox_tpu.utils import configure_platform, enable_compilation_cache

    configure_platform(args.device)
    enable_compilation_cache()

    import optax

    from rfi_toolbox_tpu.train import CoherentTrainer

    warmup = min(args.warmup, max(args.steps // 4, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.peak_lr, warmup, args.steps, end_value=1e-5
    )
    trainer = CoherentTrainer(
        init_features=args.features, size=args.size, batch_size=args.batch,
        learning_rate=schedule, seed=args.seed, norm=args.norm,
    )
    if args.resume:
        step = trainer.restore_checkpoint(args.resume,
                                          num_steps_hint=args.steps)
        print(f"resumed at step {step}")

    trainer.fit(
        num_steps=args.steps, fused_steps=args.fused_steps,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        callback=lambda s, l: print(f"step {s}: loss {l:.4f}", flush=True),
    )

    report = trainer.evaluate(num_batches=args.eval_batches)
    print("held-out IoU sweep:", json.dumps(report, indent=2))
    report_tta = trainer.evaluate(num_batches=args.eval_batches, tta=True)
    print("with TTA:", json.dumps(report_tta, indent=2))

    if args.out:
        path = trainer.export(args.out,
                              best_threshold=report["best_threshold"])
        print(f"exported {path}")


if __name__ == "__main__":
    main()
