"""End-to-end CLI tests: generate -> normalize -> train -> evaluate,
plus the MS-extraction and RFIMaskDataset paths."""

import numpy as np
import pytest

from rfi_toolbox_tpu.cli.evaluate_model import evaluate_model
from rfi_toolbox_tpu.cli.generate_dataset import main as generate_main
from rfi_toolbox_tpu.cli.normalize_data import main as normalize_main
from rfi_toolbox_tpu.cli.normalize_data import normalize_array
from rfi_toolbox_tpu.cli.train_model import main as train_main
from rfi_toolbox_tpu.data import RFIMaskDataset


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("rfi_ds")
    generate_main([
        "--samples_training", "3", "--samples_validation", "2",
        "--output_dir", str(out), "--time_bins", "64",
        "--frequency_bins", "64", "--seed", "1", "--batch_size", "2",
    ])
    return out


def test_generate_dataset_layout(tiny_dataset):
    train = tiny_dataset / "train"
    dirs = sorted(p.name for p in train.iterdir())
    assert dirs == ["0000", "0001", "0002"]
    x = np.load(train / "0000" / "input.npy")
    m = np.load(train / "0000" / "rfi_mask.npy")
    assert x.shape == (8, 64, 64) and x.dtype == np.float32
    assert m.shape == (64, 64)
    assert m.any()  # RFI present
    assert (tiny_dataset / "val" / "0001" / "input.npy").exists()


def test_generate_only_clean(tmp_path):
    generate_main([
        "--samples_training", "2", "--only_clean",
        "--output_dir", str(tmp_path), "--time_bins", "32",
        "--frequency_bins", "32",
    ])
    m = np.load(tmp_path / "train" / "0000" / "rfi_mask.npy")
    assert not m.any()


def test_rfi_mask_dataset_over_generated(tiny_dataset):
    ds = RFIMaskDataset(str(tiny_dataset / "train"))
    assert len(ds) == 3
    x, m = ds[0]
    assert x.shape == (8, 64, 64)
    assert m.shape == (1, 64, 64)
    assert 0.0 <= x.min() and x.max() <= 1.0  # global_min_max default


def test_rfi_mask_dataset_from_fake_ms(tmp_path):
    from rfi_toolbox_tpu.io import make_fake_ms

    ms = make_fake_ms(num_antennas=3, channels_per_spw=(16,), num_times=8)
    ds = RFIMaskDataset(str(tmp_path), use_ms=True, ms_name=ms)
    assert len(ds) == 3  # 3 baselines
    x, m = ds[0]
    assert x.shape == (8, 16, 8)
    assert m.shape == (1, 16, 8)  # mask matches (chan, time) — bug fixed
    assert ds.antenna_baseline_map == [(0, 1), (0, 2), (1, 2)]


def test_normalize_cli(tiny_dataset, tmp_path, capsys):
    out = tmp_path / "norm"
    normalize_main([
        "--input_dir", str(tiny_dataset / "train"),
        "--output_dir", str(out), "--normalization", "standardize",
    ])
    captured = capsys.readouterr().out
    assert "Processed 3/3" in captured
    x = np.load(out / "0000" / "input.npy")
    assert abs(float(x.mean())) < 1e-3  # standardized
    assert (out / "0000" / "rfi_mask.npy").exists()


def test_normalize_array_methods(rng):
    x = rng.normal(5, 2, (32, 32))
    z = normalize_array(x, "standardize")
    assert abs(z.mean()) < 1e-9 and abs(z.std() - 1) < 1e-9
    r = normalize_array(x, "robust_scale")
    assert abs(np.median(r)) < 1e-9
    g = normalize_array(x, "global_min_max")
    assert g.min() == 0.0 and g.max() == 1.0
    assert normalize_array(x, None) is x


@pytest.mark.slow
def test_train_and_evaluate_cli(tiny_dataset, tmp_path):
    result = train_main([
        "--train_dir", str(tiny_dataset / "train"),
        "--val_dir", str(tiny_dataset / "val"),
        "--batch_size", "2", "--num_epochs", "2", "--lr", "1e-3",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--init_features", "4", "--compute_dtype", "float32",
        "--augment",
    ])
    assert result["epochs_run"] == 2
    assert result["final_checkpoint"] is not None

    metrics = evaluate_model(
        result["final_checkpoint"], str(tiny_dataset / "val"),
        batch_size=2, init_features=4,
    )
    assert set(metrics) == {"iou", "precision", "recall", "f1", "dice"}
    assert all(0.0 <= v <= 1.0 for v in metrics.values())


@pytest.mark.slow
def test_train_cli_groupnorm_roundtrip(tiny_dataset, tmp_path):
    """--norm group trains a GroupNorm UNet (no batch_stats) and the
    evaluate path reconstructs it via norm='group' (beyond-reference
    TPU fast mode)."""
    result = train_main([
        "--train_dir", str(tiny_dataset / "train"),
        "--val_dir", str(tiny_dataset / "val"),
        "--batch_size", "2", "--num_epochs", "1", "--lr", "1e-3",
        "--checkpoint_dir", str(tmp_path / "ckpt_gn"),
        "--init_features", "4", "--compute_dtype", "float32",
        "--norm", "group",
    ])
    metrics = evaluate_model(
        result["final_checkpoint"], str(tiny_dataset / "val"),
        batch_size=2, init_features=4, norm="group",
    )
    assert all(0.0 <= v <= 1.0 for v in metrics.values())


@pytest.mark.slow
def test_evaluate_npz_metadata_defaults_and_tta(tiny_dataset, tmp_path):
    """evaluate_model on a .npz snapshot defaults init_features and
    threshold from the snapshot metadata (the shipped snapshots record
    best_threshold), and --tta runs the flip-averaged path."""
    import jax

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.train import Trainer, export_params

    model = UNet(out_channels=1, init_features=4)
    trainer = Trainer(model, seed=0)
    trainer.state = trainer._init_state((64, 64, 8))
    snap = tmp_path / "snap.npz"
    export_params(trainer.state, snap,
                  metadata={"init_features": 4, "best_threshold": 0.3})

    # init_features=32 default would fail param-shape checking if the
    # metadata were ignored
    m1 = evaluate_model(str(snap), str(tiny_dataset / "val"), batch_size=2)
    m2 = evaluate_model(str(snap), str(tiny_dataset / "val"), batch_size=2,
                        tta=True)
    for m in (m1, m2):
        assert set(m) == {"iou", "precision", "recall", "f1", "dice"}
        assert all(0.0 <= v <= 1.0 for v in m.values())

    # an EXPLICIT init_features beats snapshot metadata: metadata lies
    # (8), caller passes the true 4 -> must still evaluate cleanly
    snap_bad_meta = tmp_path / "snap_bad_meta.npz"
    export_params(trainer.state, snap_bad_meta,
                  metadata={"init_features": 8, "best_threshold": 0.3})
    m3 = evaluate_model(str(snap_bad_meta), str(tiny_dataset / "val"),
                        batch_size=2, init_features=4)
    assert set(m3) == {"iou", "precision", "recall", "f1", "dice"}


def test_evaluate_instance_rejects_semantic_flags(tmp_path):
    """--threshold/--tta are semantic-only; combining them with
    --instance must fail loudly instead of being silently ignored."""
    import pytest

    from rfi_toolbox_tpu.cli.evaluate_model import main as eval_main

    with pytest.raises(SystemExit):
        eval_main(["--model_path", str(tmp_path / "x.npz"),
                   "--instance", "--tta"])
    with pytest.raises(SystemExit):
        eval_main(["--model_path", str(tmp_path / "x.npz"),
                   "--instance", "--threshold", "0.3"])


def test_train_coherent_rejects_non_data_mesh(tmp_path):
    """--coherent is data-parallel only: any mesh_shape whose trailing
    dims multiply to >1 (not just shape[1]) must be rejected instead of
    silently dropping devices (advisor round-3 low)."""
    for bad in ("2,2", "2,1,4", "1,1,2"):
        with pytest.raises(SystemExit, match="data-only"):
            train_main(["--coherent", "--mesh_shape", bad,
                        "--checkpoint_dir", str(tmp_path / "ck"),
                        "--num_steps", "1"])


@pytest.mark.slow
def test_train_resume_cli(tiny_dataset, tmp_path):
    r1 = train_main([
        "--train_dir", str(tiny_dataset / "train"),
        "--val_dir", str(tiny_dataset / "val"),
        "--batch_size", "2", "--num_epochs", "1",
        "--checkpoint_dir", str(tmp_path / "c1"),
        "--init_features", "4", "--compute_dtype", "float32",
    ])
    r2 = train_main([
        "--train_dir", str(tiny_dataset / "train"),
        "--val_dir", str(tiny_dataset / "val"),
        "--batch_size", "2", "--num_epochs", "2",
        "--checkpoint_dir", str(tmp_path / "c2"),
        "--checkpoint_path", r1["final_checkpoint"],
        "--new_lr", "5e-4",
        "--init_features", "4", "--compute_dtype", "float32",
    ])
    assert r2["history"][0]["epoch"] == 2  # resumed past epoch 1


@pytest.mark.slow
def test_train_cli_coherent_export_and_resume(tmp_path):
    """--coherent trains on device-generated coherent samples end to
    end: checkpoints land in --checkpoint_dir, the closing sweep picks
    a threshold, --export writes a metadata-complete snapshot, and
    --auto_resume skips training when the checkpoint already covers
    --num_steps."""
    snap = tmp_path / "coh.npz"
    ck = tmp_path / "ck"
    flags = [
        "--coherent", "--num_steps", "6", "--fused_steps", "3",
        "--size", "64", "--batch_size", "2", "--init_features", "4",
        "--norm", "group", "--checkpoint_dir", str(ck),
        "--checkpoint_every", "6", "--log_every", "3",
        "--eval_batches", "1", "--seed", "0",
    ]
    res = train_main(flags + ["--export", str(snap)])
    assert res["steps"] == 6
    assert snap.exists()
    assert 0.0 <= res["eval"]["best_iou"] <= 1.0
    assert (ck / "step_6").is_dir()

    from rfi_toolbox_tpu.train import load_params

    _, _, meta = load_params(snap)
    assert meta["init_features"] == 4
    assert meta["norm"] == "group"
    assert meta["steps"] == 6
    assert meta["best_threshold"] == res["eval"]["best_threshold"]

    # checkpoint already satisfies --num_steps: evaluate-only pass
    res2 = train_main(flags + ["--auto_resume"])
    assert res2["steps"] == 6


@pytest.mark.slow
def test_train_cli_coherent_space_to_depth(tmp_path):
    """--coherent --space_to_depth trains the MXU-packed variant and the
    exported snapshot records the flag, so evaluate_rfi_model --coherent
    reconstructs the packed architecture from metadata alone."""
    snap = tmp_path / "s2d.npz"
    res = train_main([
        "--coherent", "--space_to_depth", "--num_steps", "4",
        "--fused_steps", "2", "--size", "32", "--batch_size", "2",
        "--init_features", "4", "--norm", "group",
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--eval_batches", "1", "--seed", "0", "--export", str(snap),
    ])
    assert res["steps"] == 4

    from rfi_toolbox_tpu.train import load_params

    _, _, meta = load_params(snap)
    assert meta["space_to_depth"] is True

    from rfi_toolbox_tpu.cli.evaluate_model import main as eval_main

    out = eval_main(["--model_path", str(snap), "--coherent",
                     "--num_images", "1", "--batch_size", "1",
                     "--threshold", "0.5"])
    assert 0.0 <= out["best_iou"] <= 1.0


@pytest.mark.slow
def test_train_cli_instance_export_and_resume(tmp_path):
    """--instance trains SOLOLite on device-generated events: custom
    event mix via --event_config, checkpoints per --checkpoint_every,
    closing held-out eval, .npz export, and --auto_resume continuing
    the global step counter."""
    import json

    snap = tmp_path / "solo.npz"
    ck = tmp_path / "ck"
    mix = tmp_path / "mix.json"
    mix.write_text(json.dumps({
        "narrowband_persistent": {"count": [1, 2]},
        "frequency_sweep": {"count": [0, 1]},
    }))
    flags = [
        "--instance", "--num_steps", "4", "--fused_steps", "2",
        "--patch_size", "32", "--batch_size", "2",
        "--init_features", "8", "--grid_size", "4",
        "--checkpoint_dir", str(ck), "--checkpoint_every", "2",
        "--log_every", "2", "--eval_images", "2",
        "--event_config", str(mix), "--seed", "0",
    ]
    res = train_main(flags + ["--export", str(snap)])
    assert res["steps"] == 4
    assert snap.exists()
    assert "recall" in res["eval"]
    assert (ck / "step_2").is_dir() and (ck / "step_4").is_dir()

    from rfi_toolbox_tpu.train import InstanceTrainer, load_params

    _, _, meta = load_params(snap)
    assert meta["features"] == 8 and meta["grid_size"] == 4
    t = InstanceTrainer.load(snap, batch_size=2)
    assert t.model.features == 8

    # auto-resume: checkpoint already covers --num_steps -> eval only
    res2 = train_main(flags + ["--auto_resume", "--eval_images", "0"])
    assert res2["steps"] == 4 and res2["history"] == []


def test_visualize_static_png(tiny_dataset, tmp_path):
    pytest.importorskip("matplotlib")
    from rfi_toolbox_tpu.visualization.visualize import save_static_grid

    out = save_static_grid(str(tiny_dataset / "train"),
                           str(tmp_path / "grid.png"), num_samples=2)
    assert (tmp_path / "grid.png").stat().st_size > 1000


@pytest.mark.slow
def test_train_cli_with_yaml_config(tiny_dataset, tmp_path):
    import yaml

    cfg = {
        "model": {"model_type": "unet", "init_features": 4},
        "training": {"num_epochs": 1, "batch_size": 2, "learning_rate": 1e-3,
                     "compute_dtype": "float32", "seed": 1},
    }
    p = tmp_path / "train.yaml"
    p.write_text(yaml.dump(cfg))
    result = train_main([
        "--train_dir", str(tiny_dataset / "train"),
        "--val_dir", str(tiny_dataset / "val"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--config", str(p),
    ])
    assert result["epochs_run"] == 1


@pytest.mark.slow
def test_train_cli_auto_resume(tiny_dataset, tmp_path):
    args = [
        "--train_dir", str(tiny_dataset / "train"),
        "--val_dir", str(tiny_dataset / "val"),
        "--batch_size", "2", "--init_features", "4",
        "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path / "cka"),
    ]
    train_main(args + ["--num_epochs", "1"])
    r2 = train_main(args + ["--num_epochs", "2", "--auto_resume"])
    assert r2["history"][0]["epoch"] == 2  # resumed past epoch 1
