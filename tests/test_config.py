"""Tests for the YAML config system and validators."""

import pytest
import yaml

from rfi_toolbox_tpu.config import (
    ConfigLoader,
    DataConfig,
    TrainingConfig,
    validate_all,
    validate_preprocessing_config,
    validate_training_config,
)
from rfi_toolbox_tpu.utils import ConfigValidationError


def test_data_config_nested_access():
    cfg = DataConfig({"synthetic": {"num_samples": 10, "nested": {"x": 1}},
                      "flat": 5})
    assert cfg.synthetic.num_samples == 10
    assert cfg.synthetic.nested.x == 1
    assert cfg.flat == 5
    assert cfg["flat"] == 5
    assert cfg.get("missing", "d") == "d"
    assert "synthetic" in cfg


def test_training_config_validation():
    TrainingConfig()  # defaults valid
    with pytest.raises(ValueError, match="model_checkpoint"):
        TrainingConfig(model_checkpoint="huge")
    with pytest.raises(ValueError, match="stretch"):
        TrainingConfig(stretch="CUBE")
    with pytest.raises(ValueError, match="device"):
        TrainingConfig(device="gpu")
    with pytest.raises(ValueError, match="batch_size"):
        TrainingConfig(batch_size=0)
    with pytest.raises(ValueError, match="norm"):
        TrainingConfig(norm="layer")
    TrainingConfig(norm="group")
    TrainingConfig(stretch=None, device="tpu")  # nulls allowed


def test_load_training_flattening(tmp_path):
    cfg = {
        "model": {"checkpoint": "small", "model_type": "unet_bigger",
                  "in_channels": 8},
        "training": {"num_epochs": 7, "batch_size": 16, "learning_rate": 1e-3,
                     "device": "cpu", "mesh_shape": [4, 2], "seed": 3},
        "dataset": {"stretch": "null", "patch_size": 256},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.dump(cfg))
    tc = ConfigLoader.load_training(p)
    assert tc.model_checkpoint == "small"
    assert tc.model_type == "unet_bigger"
    assert tc.in_channels == 8
    assert tc.num_epochs == 7
    assert tc.stretch is None
    assert tc.patch_size == 256
    assert tc.mesh_shape == (4, 2)
    assert tc.seed == 3


def test_save_load_roundtrip(tmp_path):
    tc = TrainingConfig(num_epochs=9, stretch="LOG10", patch_size=512,
                        num_antennas=5)
    path = tmp_path / "rt.yaml"
    ConfigLoader.save(tc, path)
    back = ConfigLoader.load_training(path)
    assert back.num_epochs == 9
    assert back.stretch == "LOG10"
    assert back.patch_size == 512
    assert back.num_antennas == 5


def test_create_default_config(tmp_path):
    p = tmp_path / "default.yaml"
    ConfigLoader.create_default_config(p)
    assert ConfigLoader.load_training(p).num_epochs == 5


def test_load_data_config(tmp_path):
    p = tmp_path / "gen.yaml"
    p.write_text(yaml.dump({"synthetic": {"num_samples": 3},
                            "processing": {"patch_size": 128}}))
    cfg = ConfigLoader.load_data(p)
    assert cfg.synthetic.num_samples == 3


def test_load_missing_file():
    with pytest.raises(FileNotFoundError):
        ConfigLoader.load_training("/nonexistent.yaml")


def test_repo_example_configs_load():
    cfg = ConfigLoader.load_data("configs/data_generation/synthetic_train_4k.yaml")
    assert cfg.synthetic.num_samples == 4000
    assert cfg.processing.patch_size == 1024
    validate_all(cfg)


def test_validators():
    validate_preprocessing_config({"patch_size": 256, "stretch": "SQRT"})
    with pytest.raises(ConfigValidationError, match="patch_size"):
        validate_preprocessing_config({"patch_size": 100})
    with pytest.raises(ConfigValidationError, match="augmentation_rotations"):
        validate_preprocessing_config({"augmentation_rotations": 3})
    validate_training_config({"batch_size": 8, "learning_rate": 1e-4})
    with pytest.raises(ConfigValidationError, match="batch_size"):
        validate_training_config({"batch_size": 500})
    with pytest.raises(ConfigValidationError, match="learning_rate"):
        validate_training_config({"learning_rate": 2.0})


def test_shipped_dp_tp_config_parses():
    from rfi_toolbox_tpu.config import ConfigLoader

    tc = ConfigLoader.load_training("configs/training/unet_dp_tp.yaml")
    assert tc.mesh_shape == (4, 2)
    assert tc.model_type == "unet_bigger"
    assert tc.batch_size == 64
