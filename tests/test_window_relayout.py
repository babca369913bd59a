"""Parity tests for the Pallas window relayout kernels (interpret mode).

Oracle: the jnp forms in models/swin3d.py (window_partition / roll3d /
window_reverse / window_glue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.models.swin3d import (
    roll3d,
    window_glue,
    window_partition,
    window_reverse,
)
from vsn_tpu.ops.window_relayout import (
    spatial_to_windows,
    windows_to_spatial,
    windows_to_windows,
)

DIMS = (12, 14, 12)
WIN = (6, 7, 6)
ROLLS = [
    (0, 0, 0),
    (3, 3, 3),          # in-window shift (the swin shift)
    (9, 11, 9),         # dim - shift (the unshift junction delta)
    (6, 7, 6),          # whole-window roll (s == 0 branch)
    (7, 10, 1),         # whole-window + remainder
]


def _x(c=16, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, *DIMS, c)), jnp.float32)


@pytest.mark.parametrize("roll", ROLLS)
def test_s2w_matches_partition_roll(roll, monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x()
    got = spatial_to_windows(x, WIN, roll)
    want = window_partition(roll3d(x, roll), WIN)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("roll", ROLLS)
def test_w2s_matches_reverse_roll(roll, monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(seed=1)
    wins = window_partition(x, WIN)
    got = windows_to_spatial(wins, WIN, DIMS, roll)
    want = roll3d(window_reverse(wins, WIN, DIMS), roll)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_roundtrip_and_glue(monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(seed=2)
    t = (3, 3, 3)
    wins = spatial_to_windows(x, WIN, (0, 0, 0))
    # junction: layout rolled by -0 -> rolled by -t
    got = spatial_to_windows(
        windows_to_spatial(wins, WIN, DIMS, (0, 0, 0)), WIN,
        tuple(-v for v in t),
    )
    want = window_glue(wins, WIN, DIMS, t)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the full inverse round trip
    back = windows_to_spatial(
        spatial_to_windows(x, WIN, t), WIN, DIMS, tuple(-v for v in t)
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("roll", [(0, 0, 0), (3, 3, 3), (9, 11, 9)])
def test_grads_match_jnp_chain(roll, monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(c=8, seed=3)

    def f_pallas(xx):
        w = spatial_to_windows(xx, WIN, roll)
        return jnp.sum(jnp.sin(w * 0.1))

    def f_ref(xx):
        w = window_partition(roll3d(xx, roll), WIN)
        return jnp.sum(jnp.sin(w * 0.1))

    g = jax.grad(f_pallas)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)


def test_w2s_grad_matches(monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(c=8, seed=4)
    wins = window_partition(x, WIN)
    roll = (3, 3, 3)

    def f(fn):
        return lambda w: jnp.sum(jnp.cos(fn(w) * 0.1))

    g = jax.grad(f(lambda w: windows_to_spatial(w, WIN, DIMS, roll)))(wins)
    gr = jax.grad(
        f(lambda w: roll3d(window_reverse(w, WIN, DIMS), roll))
    )(wins)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)


def test_basiclayer_winres_relayout_matches(monkeypatch):
    """Integration: the window-resident stage with the Pallas reverse+roll
    engaged (VSN_PALLAS_RELAYOUT=1, interpret mode) is bit-compatible with
    the XLA reverse->roll form — outputs and grads."""
    from tests.test_swin_block_kernels import _ForceTpu
    from vsn_tpu.models.swin3d import BasicLayer3D

    monkeypatch.setenv("VSN_WINDOW_RESIDENT", "1")
    dims, c = (4, 4, 4), 8
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    layer = BasicLayer3D(
        depth=2, num_heads=2, window=(2, 2, 2), drop_path_rates=[0.0, 0.0],
        downsample=False, mlp_ratio=2.0, use_pallas=True)
    outs, grads = {}, {}
    with _ForceTpu():
        variables = layer.init(jax.random.key(0), x, True)
        for flag in ("1", "0"):
            monkeypatch.setenv("VSN_PALLAS_RELAYOUT", flag)
            outs[flag] = layer.apply(variables, x, True)
            grads[flag] = jax.grad(
                lambda p: layer.apply({"params": p}, x, True).sum()
            )(variables["params"])
    np.testing.assert_array_equal(np.asarray(outs["1"]),
                                  np.asarray(outs["0"]))
    flat0 = dict(jax.tree_util.tree_leaves_with_path(grads["0"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads["1"]):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat0[path]),
            rtol=1e-6, atol=1e-6, err_msg=str(path))


@pytest.mark.parametrize("tshift", [
    (3, 3, 3),          # unshifted -> shifted junction
    (9, 11, 9),         # shifted -> unshifted junction (dim - s)
    (6, 7, 6),          # whole-window roll (s == 0 branch)
    (7, 10, 1),
])
def test_w2w_matches_glue_chain(tshift, monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(seed=6)
    wins = window_partition(x, WIN)
    got = windows_to_windows(wins, WIN, DIMS,
                             tuple(-t for t in tshift))
    want = window_glue(wins, WIN, DIMS, tshift)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_w2w_grad_and_roundtrip(monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(c=8, seed=7)
    wins = window_partition(x, WIN)
    roll = tuple(-t for t in (3, 3, 3))

    def f(fn):
        return lambda w: jnp.sum(jnp.sin(fn(w) * 0.1))

    g = jax.grad(f(lambda w: windows_to_windows(w, WIN, DIMS, roll)))(wins)
    gr = jax.grad(f(lambda w: window_glue(w, WIN, DIMS, (3, 3, 3))))(wins)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)
    back = windows_to_windows(
        windows_to_windows(wins, WIN, DIMS, roll), WIN, DIMS,
        tuple(-r for r in roll))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(wins))


def test_window_glue_kernel_dispatch(monkeypatch):
    """window_glue with VSN_PALLAS_GLUE=1 matches the chain form."""
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "1")
    x = _x(seed=8)
    wins = window_partition(x, WIN)
    for t in [(3, 3, 3), (9, 11, 9)]:
        monkeypatch.delenv("VSN_PALLAS_GLUE", raising=False)
        want = window_glue(wins, WIN, DIMS, t)
        monkeypatch.setenv("VSN_PALLAS_GLUE", "1")
        got = window_glue(wins, WIN, DIMS, t)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fallback_matches(monkeypatch):
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "0")
    x = _x(seed=5)
    got = spatial_to_windows(x, WIN, (3, 3, 3))
    want = window_partition(roll3d(x, (3, 3, 3)), WIN)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
