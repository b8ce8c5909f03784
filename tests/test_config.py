"""Config surface: variant tables, CLI override parsing, dotted nested
overrides (the stand-in for the reference's wandb.config sweep read-back,
vae-gan-v2.py:857-867)."""

import pytest

from vae_gan_mark_tpu.cli import parse_overrides
from vae_gan_mark_tpu.config import VariantConfig, get_config


def test_parse_overrides_types():
    ov = parse_overrides(VariantConfig, [
        "lr_g=2e-4", "epochs=7", "enc_chans=8,16", "compute_dtype=float32"])
    assert ov == {"lr_g": 2e-4, "epochs": 7, "enc_chans": (8, 16),
                  "compute_dtype": "float32"}


def test_dotted_scheduler_override():
    ov = parse_overrides(VariantConfig,
                         ["scheduler.patience=5", "scheduler.factor=0.5"])
    cfg = get_config("v2", **ov)
    assert cfg.scheduler.patience == 5
    assert cfg.scheduler.factor == 0.5
    # Untouched nested fields keep the variant's values.
    assert cfg.scheduler.threshold == get_config("v2").scheduler.threshold


def test_dotted_override_rejects_unknown_and_none_parent():
    with pytest.raises(SystemExit):
        parse_overrides(VariantConfig, ["scheduler.nope=1"])
    with pytest.raises(SystemExit):
        parse_overrides(VariantConfig, ["nosuch.patience=1"])
    # vanilla has scheduler=None: dotted override must error loudly.
    with pytest.raises(ValueError):
        get_config("vanilla", **{"scheduler.patience": 3})


def test_variant_constants_match_reference():
    """Spot-check the per-variant constant table (SURVEY §2.10-2.11)."""
    assert get_config("v2").gan_weight == pytest.approx(0.15)
    assert get_config("oldv").gan_weight == pytest.approx(0.07)
    assert get_config("oldv").lr_d == pytest.approx(5e-5)
    assert get_config("lr_sh").scheduler is not None
    assert get_config("vanilla").scheduler is None
