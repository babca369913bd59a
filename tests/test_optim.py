import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vsn_tpu.train import optim
from vsn_tpu.train.ema import ema_init, ema_update


def _params():
    return {
        "dense": {"kernel": jnp.ones((3, 4)) * 0.5, "bias": jnp.zeros((4,))},
        "norm": {"scale": jnp.ones((4,))},
    }


def test_wd_mask():
    mask = optim.wd_mask(_params())
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False


def test_adamw_matches_optax_with_mask():
    params = _params()
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    lr, wd = 1e-3, 0.05

    state = optim.adamw_init(params)
    ours, _ = optim.adamw_update(grads, state, params, lr, wd)

    tx = optax.adamw(lr, weight_decay=wd, mask=optim.wd_mask(params))
    ostate = tx.init(params)
    updates, _ = tx.update(grads, ostate, params)
    theirs = optax.apply_updates(params, updates)

    for a, b in zip(jax.tree.leaves(ours), jax.tree.leaves(theirs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_adamw_multistep_bias_correction():
    params = {"w": jnp.array([1.0])}
    state = optim.adamw_init(params)
    tx = optax.adam(1e-2)
    ostate = tx.init(params)
    p_ref = params
    for i in range(5):
        g = {"w": jnp.array([0.3 + 0.1 * i])}
        params, state = optim.adamw_update(g, state, params, 1e-2, 0.0)
        updates, ostate = tx.update(g, ostate, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), np.asarray(p_ref["w"]), rtol=1e-5
    )


def test_clip_by_global_norm():
    grads = {"a": jnp.full((4,), 3.0)}  # norm 6
    clipped, norm = optim.clip_by_global_norm(grads, 1.0)
    assert np.isclose(float(norm), 6.0)
    assert np.isclose(float(optim.global_norm(clipped)), 1.0, rtol=1e-4)
    # below threshold -> untouched
    clipped2, _ = optim.clip_by_global_norm(grads, 100.0)
    np.testing.assert_allclose(np.asarray(clipped2["a"]), 3.0)


def test_sam_perturbation_norm():
    params = {"w": jnp.array([1.0, -2.0])}
    grads = {"w": jnp.array([3.0, 4.0])}  # norm 5
    e, gnorm = optim.sam_perturbation(params, grads, rho=0.05, adaptive=False)
    assert np.isclose(float(gnorm), 5.0)
    np.testing.assert_allclose(
        np.asarray(e["w"]), 0.05 * np.array([3.0, 4.0]) / 5.0, rtol=1e-5
    )
    # zero grads -> zero perturbation (reference sam.py:49-52)
    e0, _ = optim.sam_perturbation(params, {"w": jnp.zeros(2)}, 0.05, False)
    np.testing.assert_allclose(np.asarray(e0["w"]), 0.0)
    # NaN grads -> zero perturbation
    en, _ = optim.sam_perturbation(
        params, {"w": jnp.array([jnp.nan, 1.0])}, 0.05, False
    )
    assert np.all(np.isfinite(np.asarray(en["w"])))


def test_sam_adaptive():
    params = {"w": jnp.array([2.0])}
    grads = {"w": jnp.array([1.0])}
    e, gnorm = optim.sam_perturbation(params, grads, rho=0.1, adaptive=True)
    # norm tree = |w|*g = 2 -> scale = 0.1/2; e = w^2 * g * scale = 4*0.05 = 0.2
    assert np.isclose(float(gnorm), 2.0)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.2, rtol=1e-5)


def test_all_finite():
    assert bool(optim.all_finite({"a": jnp.ones(3)}))
    assert not bool(optim.all_finite({"a": jnp.array([1.0, jnp.nan])}))
    assert not bool(optim.all_finite({"a": jnp.array([jnp.inf])}))


# ---------------------------------------------------------------------------
# EMA: compare ring-buffer implementation against a literal deque reimpl of
# reference utils/ema.py:72-108.
# ---------------------------------------------------------------------------

def _reference_ema(snapshots, decay, n_models):
    from collections import deque

    q = deque(maxlen=n_models)
    q.append(snapshots[0])  # init state
    for s in snapshots[1:]:
        q.append(s)
    weights = [decay**i for i in range(len(q))][::-1]
    total = sum(weights)
    weights = [w / total for w in weights]
    return sum(w * s for w, s in zip(weights, q))


@pytest.mark.parametrize("n_updates", [0, 1, 2, 3, 7])
def test_ema_matches_reference_deque(n_updates):
    decay, n_models = 0.999, 3
    rng = np.random.default_rng(0)
    snaps = [rng.standard_normal(5).astype(np.float32) for _ in range(n_updates + 1)]

    state = ema_init({"w": jnp.asarray(snaps[0])}, n_models)
    for s in snaps[1:]:
        state = ema_update(state, {"w": jnp.asarray(s)}, decay, n_models)

    if n_updates == 0:
        expected = snaps[0]  # init ema == params
    else:
        expected = _reference_ema(snaps, decay, n_models)
    np.testing.assert_allclose(np.asarray(state.ema["w"]), expected, rtol=1e-5)


def test_ema_weights_favor_recent():
    state = ema_init({"w": jnp.zeros(1)}, 3)
    for v in (1.0, 2.0, 10.0):
        state = ema_update(state, {"w": jnp.full(1, v)}, 0.9, 3)
    ema = float(state.ema["w"][0])
    # queue = [1, 2, 10]; weights = [0.81, 0.9, 1]/2.71
    expected = (0.81 * 1 + 0.9 * 2 + 1 * 10) / 2.71
    assert np.isclose(ema, expected, rtol=1e-4)
