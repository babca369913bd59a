import numpy as np
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.train.schedules import cosine_schedule_steps, lr_wd_schedules


def _reference_cosine(base, final, total, warmup):
    """Golden reimplementation of reference utils/helper.py:168-216."""
    warm = np.linspace(0.0, base, warmup) if warmup > 0 else np.array([])
    remaining = total - warmup
    if remaining > 0:
        steps = np.arange(remaining)
        decay = final + 0.5 * (base - final) * (1 + np.cos(np.pi * steps / remaining))
        return np.concatenate([warm, decay])
    return warm


@pytest.mark.parametrize(
    "base,final,total,warmup",
    [(3e-4, 1e-5, 2500, 50), (0.05, 1e-4, 2500, 50), (1.0, 0.0, 10, 0), (1.0, 0.5, 5, 5)],
)
def test_matches_reference_formula(base, final, total, warmup):
    ours = cosine_schedule_steps(base, final, total, warmup)
    golden = _reference_cosine(base, final, total, warmup)
    np.testing.assert_allclose(ours, golden, rtol=0, atol=0)


def test_schedule_shape_and_endpoints():
    s = cosine_schedule_steps(3e-4, 1e-5, 2500, 50)
    assert len(s) == 2500
    assert s[0] == 0.0  # warmup starts at 0
    assert np.isclose(s[49], 3e-4)  # warmup ends at base
    assert np.isclose(s[50], 3e-4)  # cosine starts at base
    assert s[-1] > 1e-5  # final value approached, not reached (cos(pi*(n-1)/n))
    assert np.all(np.diff(s[50:]) <= 0)  # monotone decay


def test_lr_wd_from_config():
    cfg = load_config()
    lr, wd = lr_wd_schedules(cfg)
    assert len(lr) == len(wd) == cfg.STEPS
    assert np.isclose(lr[49], cfg.LR_BASE)
    assert np.isclose(wd.max(), cfg.WD_BASE)


def test_validation_errors():
    with pytest.raises(ValueError):
        cosine_schedule_steps(1.0, 0.0, 10, 11)


def test_epoch_variant_equivalence():
    from vsn_tpu.train.schedules import cosine_schedule

    s = cosine_schedule(1e-3, 1e-5, epochs=10, niter_per_ep=7, warmup_epochs=2)
    assert len(s) == 70
    np.testing.assert_allclose(
        s, cosine_schedule_steps(1e-3, 1e-5, 70, warmup_steps=14)
    )
