"""Fused window-attention kernel vs the XLA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsn_tpu.models.swin3d import shifted_window_region_ids
from vsn_tpu.ops.window_attention import (
    fused_window_attention,
    fused_window_attention_qkv,
    window_attention_reference,
)


def make_inputs(bw=4, h=2, n=16, d=8, w=2, seed=0, with_pad=2):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
    ids = rng.integers(0, 3, (w, n)).astype(np.int32)
    if with_pad:
        ids[:, n - with_pad:] = -1  # padded key positions
    return q, k, v, bias, jnp.asarray(ids)


def test_forward_matches_reference():
    q, k, v, bias, ids = make_inputs()
    scale = 1 / np.sqrt(q.shape[-1])
    out = fused_window_attention(q, k, v, bias, ids, scale)
    ref = window_attention_reference(q, k, v, bias, ids, scale)
    n_valid = q.shape[2] - 2
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :n_valid], np.asarray(ref)[:, :, :n_valid],
        rtol=2e-5, atol=2e-5,
    )


def test_forward_unshifted_single_id_row():
    q, k, v, bias, _ = make_inputs(with_pad=0)
    ids = jnp.zeros((1, q.shape[2]), jnp.int32)
    scale = 0.25
    out = fused_window_attention(q, k, v, bias, ids, scale)
    ref = window_attention_reference(q, k, v, bias, ids, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    q, k, v, bias, ids = make_inputs(with_pad=0)
    scale = 1 / np.sqrt(q.shape[-1])
    rng = np.random.default_rng(1)
    ct = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def f_fused(q, k, v, bias):
        return (fused_window_attention(q, k, v, bias, ids, scale) * ct).sum()

    def f_ref(q, k, v, bias):
        return (window_attention_reference(q, k, v, bias, ids, scale) * ct).sum()

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkv b", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad {name}",
        )


def test_mask_semantics_match_swin_ids():
    """Region ids from the real Swin mask builder, padded — masked pairs must
    get (near-)zero attention."""
    dims, window, shift = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    ids_np = shifted_window_region_ids(dims, window, shift, pad_to=16)
    w = ids_np.shape[0]
    n = 16
    rng = np.random.default_rng(0)
    bw, h, d = w, 1, 8  # one batch over all windows
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    bias = jnp.zeros((h, n, n), jnp.float32)
    ids = jnp.asarray(ids_np)
    out = fused_window_attention(q, k, v, bias, ids, 0.3)
    ref = window_attention_reference(q, k, v, bias, ids, 0.3)
    np.testing.assert_allclose(np.asarray(out)[:, :, :8], np.asarray(ref)[:, :, :8],
                               rtol=2e-5, atol=2e-5)


def test_fused_qkv_kernel_matches_reference():
    """v2 kernel (fused qkv in, merged heads out) vs the oracle, including
    the head-major channel layout and an odd (non-lane-multiple) N."""
    bw, h, n, d, w = 4, 2, 12, 8, 2  # N=12: not a multiple of 8 or 128
    c = h * d
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((bw, n, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.integers(0, 2, (w, n)).astype(np.int32))
    scale = 0.3

    out = fused_window_attention_qkv(qkv, bias, ids, scale, h)
    # oracle via the split-head reference
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda t: t.reshape(bw, n, h, d).transpose(0, 2, 1, 3)
    ref = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
    ref = ref.transpose(0, 2, 1, 3).reshape(bw, n, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients
    ct = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)

    def f_fused(qkv, bias):
        return (fused_window_attention_qkv(qkv, bias, ids, scale, h) * ct).sum()

    def f_ref(qkv, bias):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
        return (r.transpose(0, 2, 1, 3).reshape(bw, n, c) * ct).sum()

    gf = jax.grad(f_fused, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(f_ref, argnums=(0, 1))(qkv, bias)
    for name, a, b in zip(("qkv", "bias"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_swin_model_paths_agree():
    """Full Swin forward: pallas path (interpret) vs XLA path give the same
    logits."""
    from vsn_tpu.models.swin3d import SwinTransformer3D

    kw = dict(
        patch_size=(2, 2, 2), num_classes=3, embed_dim=16, depths=(1, 1),
        num_heads=(2, 4), window_size=(2, 2, 2), stochastic_depth_prob=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 8, 8, 8, 1)), jnp.float32
    )
    m_xla = SwinTransformer3D(**kw, use_pallas=False)
    variables = m_xla.init(jax.random.key(0), x, True)
    out_xla = m_xla.apply(variables, x, True)

    import vsn_tpu.ops.window_attention as wa
    m_pl = SwinTransformer3D(**kw, use_pallas=True)
    orig = wa._on_tpu
    try:
        # force the pallas path in interpret mode on CPU
        wa._on_tpu = lambda: False
        import vsn_tpu.models.swin3d as swin_mod
        orig_platform = jax.devices()[0].platform
        # monkeypatch the platform check inside the module call
        real_devices = jax.devices
        class FakeDev:
            platform = "tpu"
        jax.devices = lambda *a, **k: [FakeDev()] if not a and not k else real_devices(*a, **k)
        out_pl = m_pl.apply(variables, x, True)
    finally:
        wa._on_tpu = orig
        jax.devices = real_devices
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), rtol=1e-4, atol=1e-4
    )


def test_windowed_blockspec_kernel_matches_reference():
    """v3 kernel (unpartitioned [B,D,H,W,3C] in / [B,D,H,W,C] out) vs the
    partition+reference oracle, shifted region ids, incl. gradients."""
    from vsn_tpu.models.swin3d import window_partition, window_reverse
    from vsn_tpu.ops.window_attention import fused_window_attention_windows

    dims, window, shift = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    b, heads, hd = 2, 2, 4
    c = heads * hd
    n = 8
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((b, *dims, 3 * c)), jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    ids = jnp.asarray(shifted_window_region_ids(dims, window, shift))
    scale = 0.4

    def oracle(qkv, bias):
        wins = window_partition(qkv, window)  # [B*nW, N, 3C]
        bw = wins.shape[0]
        q, k, v = jnp.split(wins, 3, axis=-1)
        sh = lambda t: t.reshape(bw, n, heads, hd).transpose(0, 2, 1, 3)
        r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
        r = r.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return window_reverse(r, window, dims)

    out = fused_window_attention_windows(qkv, bias, ids, scale, heads, window)
    ref = oracle(qkv, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    ct = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

    def f_fused(qkv, bias):
        return (fused_window_attention_windows(
            qkv, bias, ids, scale, heads, window) * ct).sum()

    def f_ref(qkv, bias):
        return (oracle(qkv, bias) * ct).sum()

    gf = jax.grad(f_fused, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(f_ref, argnums=(0, 1))(qkv, bias)
    for name, a, b_ in zip(("qkv", "bias"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_windowed_blockspec_kernel_unshifted_rect():
    """v3 kernel on a rectangular grid (different nW per axis), no shift."""
    from vsn_tpu.models.swin3d import window_partition, window_reverse
    from vsn_tpu.ops.window_attention import fused_window_attention_windows

    dims, window = (4, 6, 2), (2, 3, 2)
    b, heads, hd = 1, 3, 2
    c = heads * hd
    n = 12
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((b, *dims, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    ids = jnp.zeros((1, n), jnp.int32)
    scale = 0.3

    out = fused_window_attention_windows(qkv, bias, ids, scale, heads, window)
    wins = window_partition(qkv, window)
    bw = wins.shape[0]
    q, k, v = jnp.split(wins, 3, axis=-1)
    sh = lambda t: t.reshape(bw, n, heads, hd).transpose(0, 2, 1, 3)
    r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
    ref = window_reverse(r.transpose(0, 2, 1, 3).reshape(bw, n, c), window, dims)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
