import math
from pathlib import Path

import pytest
import yaml

from vsn_tpu.config import (
    Config,
    load_config,
    normalize_seed,
    save_config,
    DEFAULT_CONFIG_PATH,
)

CONFIG_DIR = DEFAULT_CONFIG_PATH.parent


def test_defaults_load():
    cfg = load_config()
    assert cfg.ARCHITECTURE == "Swin"
    assert cfg.IMG_SIZE == [144, 168, 144]
    assert cfg.STEPS == 2500
    assert cfg.EFFECTIVE_BATCH_SIZE == 128
    assert cfg.num_classes == 5
    assert cfg.SEED == 42


def test_override_merge():
    cfg = load_config(CONFIG_DIR / "vit-3c-no_seed-baseline.yaml")
    assert cfg.ARCHITECTURE == "ViT"
    assert cfg.EMBED_DIM == 384
    assert cfg.DEPTH == 12
    assert cfg.SEED is None  # SEED: False normalizes to None
    assert cfg.DISEASES == ["CN", "AD", "FTD"]
    assert cfg.num_classes == 3
    # untouched defaults survive
    assert cfg.STEPS == 2500
    assert cfg.input_size == (144, 160, 144)  # RESHAPE_SIZE wins over IMG_SIZE


def test_cli_overrides_and_seed_normalization():
    cfg = load_config(fold=7, seed="none")
    assert cfg.FOLD == 7
    assert cfg.SEED is None
    cfg = load_config(seed="123")
    assert cfg.SEED == 123
    assert normalize_seed(False) is None
    assert normalize_seed("false") is None
    assert normalize_seed(0) == 0


def test_gradient_accumulation():
    cfg = load_config()
    # ceil(128 / (8 * 1)) = 16; ceil(128 / (8*4)) = 4
    assert cfg.gradient_accumulation_steps(1) == 16
    assert cfg.gradient_accumulation_steps(4) == 4
    with pytest.raises(ValueError):
        cfg.replace(EFFECTIVE_BATCH_SIZE=4).gradient_accumulation_steps(1)


def test_immutability_and_replace():
    cfg = load_config()
    with pytest.raises(AttributeError):
        cfg.STEPS = 1
    cfg2 = cfg.replace(STEPS=10)
    assert cfg2.STEPS == 10 and cfg.STEPS == 2500


def test_save_config_roundtrip(tmp_path):
    cfg = load_config()
    p = save_config(cfg, tmp_path)
    loaded = yaml.safe_load(open(p))
    assert loaded["STEPS"] == 2500
    assert Config(loaded).ARCHITECTURE == "Swin"


def test_all_variant_configs_parse():
    for p in sorted(CONFIG_DIR.glob("*-baseline.yaml")):
        cfg = load_config(p)
        assert cfg.ARCHITECTURE in ("Swin", "SwinDPL", "MedViT", "ViT", "ResNet")
        assert cfg.num_classes in (3, 5)
