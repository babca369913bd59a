import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.models.layers import (
    DynamicTanh,
    LayerScale,
    RMSNorm,
    drop_path,
    shakedrop,
    stochastic_depth_rates,
)
from vsn_tpu.ops.stable_init import (
    apply_stable_residual,
    compute_residual_gains,
    stable_embedding_std,
    stable_qk_std,
    stable_vproj_std,
)
from vsn_tpu.train.losses import label_smoothing_loss


def test_residual_gains():
    lam, beta = compute_residual_gains(N=24, k=2.0, alpha=1.0)
    assert np.isclose(lam**2 + beta**2, 1.0)
    assert np.isclose(beta**2, 2.0 / 24)
    # clamping: tiny N makes beta^2 > 1 -> beta = 1, lam = 0
    lam, beta = compute_residual_gains(N=1, k=2.0, alpha=1.0)
    assert beta == 1.0 and lam == 0.0


def test_stable_stds():
    assert np.isclose(stable_qk_std(64), 1 / 8)
    assert np.isclose(stable_embedding_std(4096, 0.0), np.sqrt(1 / 4096))
    # sigma_f^2 = (sqrt(1-p)/2)/d
    assert np.isclose(stable_vproj_std(384, 0.0) ** 2, 0.5 / 384)


def test_stable_residual_variance_preserving():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1000,)), jnp.float32)
    fx = jnp.asarray(rng.standard_normal((1000,)), jnp.float32)
    lam, beta = compute_residual_gains(N=12)
    out = apply_stable_residual(x, fx, lam, beta)
    assert abs(float(jnp.var(out)) - 1.0) < 0.15


def test_label_smoothing_matches_formula():
    logits = jnp.array([[2.0, -1.0, 0.5], [0.0, 0.0, 0.0]])
    targets = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.3, 0.7]])
    eps = 0.1
    smoothed = targets * (1 - eps) + eps / 3
    logp = jax.nn.log_softmax(logits)
    expected = float((-(smoothed * logp).sum(-1)).mean())
    got = float(label_smoothing_loss(logits, targets, eps))
    assert np.isclose(got, expected, rtol=1e-6)
    # no smoothing reduces to soft CE
    got0 = float(label_smoothing_loss(logits, targets, 0.0))
    expected0 = float((-(targets * logp).sum(-1)).mean())
    assert np.isclose(got0, expected0, rtol=1e-6)


def test_drop_path_train_and_eval():
    x = jnp.ones((64, 4))
    out = drop_path(x, 0.5, deterministic=True, rng=None)
    np.testing.assert_array_equal(out, x)
    out = drop_path(x, 0.5, deterministic=False, rng=jax.random.key(0))
    # kept rows are rescaled by 1/keep = 2, dropped rows are 0
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 2.0})
    # expectation preserved roughly
    assert abs(float(out.mean()) - 1.0) < 0.3


def test_shakedrop_eval_scaling():
    x = jnp.ones((4, 3))
    out = shakedrop(x, 0.25, (-1, 1), deterministic=True, rng=None)
    np.testing.assert_allclose(np.asarray(out), 0.75 * np.ones((4, 3)))


def test_shakedrop_train_fwd_bwd():
    # p_drop=1 -> always dropped: forward scales by alpha, backward by beta
    x = jnp.ones((8, 2))

    def f(x, rng):
        return shakedrop(x, 1.0, (0.3, 0.3), deterministic=False, rng=rng).sum()

    rng = jax.random.key(1)
    val = f(x, rng)
    assert np.isclose(float(val), 0.3 * 16, atol=1e-5)
    g = jax.grad(f)(x, rng)
    # beta in U(0,1), per-sample constant across features
    g = np.asarray(g)
    assert g.shape == (8, 2)
    assert np.all(g >= 0) and np.all(g <= 1)
    assert np.allclose(g[:, 0], g[:, 1])
    # p_drop=0 -> identity fwd and bwd
    def f0(x, rng):
        return shakedrop(x, 0.0, (-1, 1), deterministic=False, rng=rng).sum()

    g0 = jax.grad(f0)(x, rng)
    np.testing.assert_allclose(np.asarray(g0), np.ones((8, 2)))


def test_stochastic_depth_rates():
    rates = stochastic_depth_rates(0.15, [2, 2, 6, 2])
    assert len(rates) == 12
    assert rates[0] == 0.0 and np.isclose(rates[-1], 0.15)
    np.testing.assert_allclose(np.diff(rates), np.diff(rates)[0])


def test_norm_layers_shapes():
    x = jnp.ones((2, 5, 16))
    for mod in (RMSNorm(), DynamicTanh(), LayerScale(init_value=0.1)):
        params = mod.init(jax.random.key(0), x)
        y = mod.apply(params, x)
        assert y.shape == x.shape


def test_rmsnorm_math():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    mod = RMSNorm()
    params = mod.init(jax.random.key(0), x)
    y = np.asarray(mod.apply(params, x))
    expected = np.asarray(x) / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(y, expected, rtol=1e-5)
