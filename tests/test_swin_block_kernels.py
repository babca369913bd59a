"""Fused Swin block-half kernels vs unfused oracles (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from vsn_tpu.models.swin3d import (
    SwinBlock3D,
    shifted_window_region_ids,
    window_partition,
    window_reverse,
)
from vsn_tpu.ops.swin_block_kernels import (
    fused_attn_half,
    fused_ln_mlp,
    mlp_tile_rows,
)
from vsn_tpu.ops.window_attention import window_attention_reference


def _ln(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g + b


def test_fused_attn_half_matches_oracle():
    dims, window, shift = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    b, heads, hd = 2, 2, 4
    c = heads * hd
    n = 8
    rng = np.random.default_rng(0)
    ids = jnp.asarray(shifted_window_region_ids(dims, window, shift))
    w = ids.shape[0]
    bw = b * w
    x = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)
    lng = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    scale = hd**-0.5

    def oracle(x, lng, lnb, wqkv, bqkv, bias, wproj, bproj):
        y = _ln(x, lng, lnb)
        qkv = y @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(bw, n, heads, hd).transpose(0, 2, 1, 3)
        r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
        r = r.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return r @ wproj + bproj

    args = (x, lng, lnb, wqkv, bqkv, bias, wproj, bproj)
    ones = jnp.ones((b,), jnp.float32)
    out = fused_attn_half(x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
                          ones, ones, scale, heads, 0.0)
    ref = oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    ct = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

    def f_fused(*a):
        return (fused_attn_half(a[0], a[1], a[2], a[3], a[4], a[5], ids,
                                a[6], a[7], ones, ones, scale, heads,
                                0.0) * ct).sum()

    def f_ref(*a):
        return (oracle(a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7])
                * ct).sum()

    argnums = tuple(range(8))
    fused_args = (x, lng, lnb, wqkv, bqkv, bias, wproj, bproj)
    gf = jax.grad(f_fused, argnums=argnums)(*fused_args)
    gr = jax.grad(f_ref, argnums=argnums)(*fused_args)
    names = ("x", "lng", "lnb", "wqkv", "bqkv", "bias", "wproj", "bproj")
    for name, a, b_ in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_fused_attn_grads_at_saturation(monkeypatch):
    """Regression for the round-4 convergence-run divergence: the original
    (u, r)-basis backward underflowed r^2 in f32 once a row's sum(exp)
    passed ~1e19 (max logit ~44), silently dropping the softmax projection
    term, and overflowed u*dp to inf past the clamp at 80 (NaN grads).

    With the safe-softmax default (VSN_ATTN_ROWMAX, round 4) the fused
    grads must match the max-subtracted oracle at EVERY logit scale,
    including far past the old clamp at 80. The legacy clamp form
    (VSN_ATTN_ROWMAX=0) must stay exact below the clamp and finite past
    it."""
    dims, window, shift = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    b, heads, hd = 2, 2, 4
    c = heads * hd
    n = 8
    rng = np.random.default_rng(7)
    ids = jnp.asarray(shifted_window_region_ids(dims, window, shift))
    w = ids.shape[0]
    bw = b * w
    x = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)
    lng = jnp.ones(c, jnp.float32)
    lnb = jnp.zeros(c, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.zeros(3 * c, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.zeros(c, jnp.float32)
    scale = hd**-0.5
    ones = jnp.ones((b,), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)

    def oracle(bias, *a):
        y = _ln(a[0], a[1], a[2])
        qkv = y @ a[3] + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(bw, n, heads, hd).transpose(0, 2, 1, 3)
        r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
        return r.transpose(0, 2, 1, 3).reshape(bw, n, c) @ a[4] + bproj

    def run(bias_shift, bias_sd):
        bias = jnp.asarray(
            rng.standard_normal((heads, n, n)) * bias_sd + bias_shift,
            jnp.float32,
        )

        def f_fused(*a):
            return (fused_attn_half(a[0], a[1], a[2], a[3], bqkv, bias, ids,
                                    a[4], bproj, ones, ones, scale, heads,
                                    0.0) * ct).sum()

        def f_ref(*a):
            return (oracle(bias, *a) * ct).sum()

        args = (x, lng, lnb, wqkv, wproj)
        gf = jax.grad(f_fused, argnums=(0, 3, 4))(*args)
        gr = jax.grad(f_ref, argnums=(0, 3, 4))(*args)
        return gf, gr

    # --- safe-softmax default (VSN_ATTN_ROWMAX on): exact at EVERY scale
    # deep regime (logit ~45: rows' sum(exp) >> 1e19 unshifted) and the
    # fully-saturated regime (logit ~200, far past the legacy clamp)
    for shift in (45.0, 200.0):
        gf, gr = run(shift, 8.0)
        for name, a, b_ in zip(("x", "wqkv", "wproj"), gf, gr):
            assert np.isfinite(np.asarray(a)).all(), f"{name} @ {shift}"
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3,
                err_msg=f"{name} @ {shift}")

    # --- legacy clamp form (VSN_ATTN_ROWMAX=0) ---------------------------
    monkeypatch.setenv("VSN_ATTN_ROWMAX", "0")
    # below the clamp the thinned math is exact softmax
    gf, gr = run(45.0, 8.0)
    for name, a, b_ in zip(("x", "wqkv", "wproj"), gf, gr):
        assert np.isfinite(np.asarray(a)).all(), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3, err_msg=name)
    # past the clamp the forward deliberately flattens (legacy DEVIATIONS
    # #3) so values differ from the oracle, but grads must stay finite
    gf, _ = run(200.0, 8.0)
    for name, a in zip(("x", "wqkv", "wproj"), gf):
        assert np.isfinite(np.asarray(a)).all(), f"{name} not finite"


def test_fused_ln_mlp_matches_oracle_multi_tile():
    # 4 samples x 256 rows, tile 128: two programs PER SAMPLE (exercises dW
    # accumulation) and tiles that must pick the right per-sample gain —
    # DISTINCT gains, so gf[program_id // tiles_per_sample] misindexing
    # (e.g. from a total-T tile like the old mlp_tile_rows(t)=512) fails
    # loudly instead of hiding behind all-ones.
    t, c, hid, nsamp, tile = 1024, 16, 64, 4, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((t, c)), jnp.float32)
    lng = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hid)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(hid) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    gains = jnp.asarray([0.25, 1.0, 1.75, 0.5], jnp.float32)

    def oracle(x, lng, lnb, w1, b1, w2, b2):
        y = _ln(x, lng, lnb)
        h = nn.gelu(y @ w1 + b1, approximate=False)
        branch = h @ w2 + b2
        per_row = jnp.repeat(gains, t // nsamp)[:, None]
        return per_row * branch

    out = fused_ln_mlp(x, lng, lnb, w1, b1, w2, b2, gains, gains, tile, 0.0)
    ref = oracle(x, lng, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    ct = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

    def f_fused(*a):
        return (fused_ln_mlp(*a, gains, gains, tile, 0.0) * ct).sum()

    def f_ref(*a):
        return (oracle(*a) * ct).sum()

    args = (x, lng, lnb, w1, b1, w2, b2)
    gf = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    for name, a, b_ in zip(("x", "lng", "lnb", "w1", "b1", "w2", "b2"),
                           gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4, err_msg=name)

    # contract violations fail loudly at trace time
    with pytest.raises(ValueError, match="per-sample"):
        fused_ln_mlp(x, lng, lnb, w1, b1, w2, b2, gains, gains, 512, 0.0)


def test_mlp_tile_rows():
    assert mlp_tile_rows(435456) > 0
    assert 435456 % mlp_tile_rows(435456) == 0
    assert mlp_tile_rows(435456) % 8 == 0
    assert mlp_tile_rows(7) == 0  # prime, no multiple-of-8 divisor


class _ForceTpu:
    """Patch jax.devices + interpret gate so the fused path runs on CPU."""

    def __enter__(self):
        import vsn_tpu.ops.window_attention as wa

        self._wa = wa
        self._orig_on_tpu = wa._on_tpu
        wa._on_tpu = lambda: False
        self._real_devices = jax.devices

        class FakeDev:
            platform = "tpu"

        real = self._real_devices
        jax.devices = (
            lambda *a, **k: [FakeDev()] if not a and not k else real(*a, **k)
        )
        return self

    def __exit__(self, *exc):
        self._wa._on_tpu = self._orig_on_tpu
        jax.devices = self._real_devices


def _block_kwargs(shifted):
    return dict(
        num_heads=2,
        window=(2, 2, 2),
        shift=(1, 1, 1) if shifted else (0, 0, 0),
        mlp_ratio=2.0,
        drop_path_rate=0.0,
        use_pallas=True,
    )


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_block_matches_unfused(shifted):
    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    ids = (
        jnp.asarray(shifted_window_region_ids(dims, (2, 2, 2), (1, 1, 1)))
        if shifted else None
    )

    blk_unfused = SwinBlock3D(**{**_block_kwargs(shifted), "use_pallas": False})
    variables = blk_unfused.init(jax.random.key(0), x, ids, True)
    out_ref = blk_unfused.apply(variables, x, ids, True)

    blk_fused = SwinBlock3D(**_block_kwargs(shifted))
    with _ForceTpu():
        # param trees must be interchangeable between paths
        v_fused = blk_fused.init(jax.random.key(0), x, ids, True)
        assert (
            jax.tree.structure(v_fused) == jax.tree.structure(variables)
        )
        out_fused = blk_fused.apply(variables, x, ids, True)

        # gradients agree through both halves
        def loss_fused(p):
            return blk_fused.apply({"params": p}, x, ids, True).sum()

        g_fused = jax.grad(loss_fused)(variables["params"])

    def loss_ref(p):
        return blk_unfused.apply({"params": p}, x, ids, True).sum()

    g_ref = jax.grad(loss_ref)(variables["params"])

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_f = jax.tree.leaves_with_path(g_fused)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path),
        )


@pytest.mark.parametrize("use_shakedrop", [False, True])
def test_fused_block_train_mode_gating_parity(use_shakedrop):
    """Train mode with DropPath/ShakeDrop active: the fused path draws its
    residual gains through same-named submodules, so gating decisions (and
    hence outputs) match the unfused path for identical rngs."""
    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, *dims, c)), jnp.float32)
    kwargs = dict(
        num_heads=2, window=(2, 2, 2), shift=(0, 0, 0), mlp_ratio=2.0,
        drop_path_rate=0.5, use_shakedrop=use_shakedrop, use_pallas=True,
    )
    stream = "shakedrop" if use_shakedrop else "dropout"
    rngs = {stream: jax.random.key(7)}

    blk_unfused = SwinBlock3D(**{**kwargs, "use_pallas": False})
    variables = blk_unfused.init(jax.random.key(0), x, None, True)
    out_ref = blk_unfused.apply(variables, x, None, False, rngs=rngs)

    blk_fused = SwinBlock3D(**kwargs)
    with _ForceTpu():
        out_fused = blk_fused.apply(variables, x, None, False, rngs=rngs)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_block_under_remat():
    """USE_CHECKPOINT wraps blocks in nn.remat; the fused custom-VJP
    kernels must survive rematerialization (grad through remat(block))."""
    from vsn_tpu.models.swin3d import BasicLayer3D

    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)

    def build(use_checkpoint, use_pallas):
        return BasicLayer3D(
            depth=2, num_heads=2, window=(2, 2, 2),
            drop_path_rates=[0.0, 0.0], downsample=False,
            use_checkpoint=use_checkpoint, use_pallas=use_pallas,
        )

    layer_ref = build(False, False)
    variables = layer_ref.init(jax.random.key(0), x, True)
    out_ref = layer_ref.apply(variables, x, True)

    with _ForceTpu():
        layer = build(True, True)
        out = layer.apply(variables, x, True)

        def loss(p):
            return layer.apply({"params": p}, x, True).sum()

        g = jax.grad(loss)(variables["params"])
        assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("wb,n_samples,n_windows", [(2, 4, 1), (4, 2, 8)])
def test_fused_attn_half_window_batched_gains(monkeypatch, wb, n_samples,
                                              n_windows):
    """Window-batched programs (incl. slots spanning samples when nW=1, the
    stage-4 layout) must apply each sample's own gain and match the per-
    window oracle."""
    monkeypatch.setenv("VSN_ATTN_WB", str(wb))
    heads, hd, n = 2, 4, 8
    c = heads * hd
    rng = np.random.default_rng(3)
    if n_windows > 1:
        ids = jnp.asarray(
            shifted_window_region_ids((4, 4, 4), (2, 2, 2), (1, 1, 1))
        )
    else:
        ids = jnp.zeros((1, n), jnp.int32)
    bw = n_samples * n_windows
    x = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)
    lng = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    gf = jnp.asarray(rng.uniform(0.5, 1.5, n_samples), jnp.float32)
    gb = jnp.asarray(rng.uniform(0.5, 1.5, n_samples), jnp.float32)
    scale = hd**-0.5

    def oracle(xx):
        y = _ln(xx, lng, lnb)
        qkv = y @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(bw, n, heads, hd).transpose(0, 2, 1, 3)
        r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
        r = r.transpose(0, 2, 1, 3).reshape(bw, n, c)
        branch = r @ wproj + bproj
        g = jnp.repeat(gf, n_windows)[:, None, None]
        return xx + g * branch

    out = fused_attn_half(x, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj,
                          gf, gb, scale, heads, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(x)),
                               rtol=2e-5, atol=2e-5)

    # backward: dx must route through per-sample gb, params through chain
    ct = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    gx = jax.grad(lambda xx: (fused_attn_half(
        xx, lng, lnb, wqkv, bqkv, bias, ids, wproj, bproj, gf, gb,
        scale, heads, 1.0) * ct).sum())(x)

    def oracle_gated(xx):
        """gb on the branch grad path: out = x + detach-gated branch."""
        y = _ln(xx, lng, lnb)
        qkv = y @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(bw, n, heads, hd).transpose(0, 2, 1, 3)
        r = window_attention_reference(sh(q), sh(k), sh(v), bias, ids, scale)
        r = r.transpose(0, 2, 1, 3).reshape(bw, n, c)
        branch = r @ wproj + bproj
        g = jnp.repeat(gb, n_windows)[:, None, None]
        return xx + g * branch

    gx_ref = jax.grad(lambda xx: (oracle_gated(xx) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-5, atol=2e-5)


def test_window_glue_matches_chain_composition(monkeypatch):
    from vsn_tpu.models.swin3d import roll3d, window_glue

    monkeypatch.setenv("VSN_GLUE", "corner")  # pin the non-default form
    rng = np.random.default_rng(7)
    dims, window = (4, 6, 4), (2, 3, 2)
    nwin = 2 * 2 * 2
    wins = jnp.asarray(
        rng.standard_normal((3 * nwin, 2 * 3 * 2, 5)), jnp.float32)
    # includes whole-window rolls and dim-s deltas (the shifted->unshifted
    # junction case: t = dim - shift exceeds the window size)
    for t in [(1, 1, 1), (1, 2, 1), (0, 1, 0), (1, 0, 1),
              (2, 3, 2), (3, 5, 3), (2, 4, 0), (3, 0, 1)]:
        want = window_partition(
            roll3d(window_reverse(wins, window, dims),
                   tuple(-v for v in t)), window)
        got = window_glue(wins, window, dims, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   err_msg=str(t))


@pytest.mark.parametrize("use_winres", [True, False])
@pytest.mark.parametrize("depth,glue", [(2, "chain"), (3, "chain"),
                                        (3, "corner"), (4, "chain")])
def test_basiclayer_window_resident_matches_unfused(
        monkeypatch, use_winres, depth, glue):
    """The window-resident stream (partition once, glue junctions, reverse
    once) is bit-compatible with the unfused stage: same params, same
    outputs, same grads. depth>=3 exercises the shifted->unshifted junction
    whose glue delta exceeds the window size (whole-window grid roll)."""
    from vsn_tpu.models.swin3d import BasicLayer3D

    monkeypatch.setenv("VSN_WINDOW_RESIDENT", "1" if use_winres else "0")
    monkeypatch.setenv("VSN_GLUE", glue)
    dims, c = (4, 4, 4), 8
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    kwargs = dict(depth=depth, num_heads=2, window=(2, 2, 2),
                  drop_path_rates=[0.0] * depth, downsample=False,
                  mlp_ratio=2.0)

    ref = BasicLayer3D(**kwargs, use_pallas=False)
    variables = ref.init(jax.random.key(0), x, True)
    out_ref = ref.apply(variables, x, True)
    g_ref = jax.grad(lambda p: ref.apply({"params": p}, x, True).sum())(
        variables["params"])

    fused = BasicLayer3D(**kwargs, use_pallas=True)
    with _ForceTpu():
        v2 = fused.init(jax.random.key(0), x, True)
        assert jax.tree.structure(v2) == jax.tree.structure(variables)
        out = fused.apply(variables, x, True)
        g = jax.grad(lambda p: fused.apply({"params": p}, x, True).sum())(
            variables["params"])

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in jax.tree.leaves_with_path(g):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path),
        )


def test_basiclayer_window_resident_train_gating_parity(monkeypatch):
    """Train mode with DropPath active: the window-resident stream draws
    residual-gain rngs through the same-named block submodules, so gating
    matches the non-resident fused path for identical rngs."""
    from vsn_tpu.models.swin3d import BasicLayer3D

    dims, c = (4, 4, 4), 8
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((4, *dims, c)), jnp.float32)
    kwargs = dict(depth=2, num_heads=2, window=(2, 2, 2),
                  drop_path_rates=[0.4, 0.4], downsample=False,
                  mlp_ratio=2.0, use_pallas=True)
    layer = BasicLayer3D(**kwargs)
    with _ForceTpu():
        variables = layer.init(jax.random.key(0), x, True)
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("VSN_WINDOW_RESIDENT", flag)
            outs[flag] = layer.apply(
                variables, x, False, rngs={"dropout": jax.random.key(7)})
    np.testing.assert_allclose(np.asarray(outs["1"]), np.asarray(outs["0"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_layerscale_matches_unfused():
    """LayerScale rides the fused kernels in-band: identical param tree
    (res*/LayerScale_0/gamma), outputs, and grads incl. dgamma."""
    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    ids = jnp.asarray(
        shifted_window_region_ids(dims, (2, 2, 2), (1, 1, 1)))
    kwargs = {**_block_kwargs(True), "layer_scale": True,
              "layer_scale_init_value": 0.1}

    blk_unfused = SwinBlock3D(**{**kwargs, "use_pallas": False})
    variables = blk_unfused.init(jax.random.key(0), x, ids, True)
    # non-trivial gamma so dgamma is exercised away from the constant init
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(
            v.shape) / v.size if v.ndim == 1 else v, variables)
    out_ref = blk_unfused.apply(variables, x, ids, True)

    blk_fused = SwinBlock3D(**kwargs)
    with _ForceTpu():
        v_fused = blk_fused.init(jax.random.key(0), x, ids, True)
        assert jax.tree.structure(v_fused) == jax.tree.structure(variables)
        out_fused = blk_fused.apply(variables, x, ids, True)
        g_fused = jax.grad(lambda p: blk_fused.apply(
            {"params": p}, x, ids, True).sum())(variables["params"])

    g_ref = jax.grad(lambda p: blk_unfused.apply(
        {"params": p}, x, ids, True).sum())(variables["params"])
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in jax.tree.leaves_with_path(g_fused):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path),
        )


@pytest.mark.parametrize("with_ls", [False, True])
def test_fused_block_post_norm_matches_unfused(with_ls):
    """Post-norm rides the fused kernels in-band: norm1/norm2 move onto the
    branch outputs (before LayerScale/gains), same params, outputs, grads."""
    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    ids = jnp.asarray(
        shifted_window_region_ids(dims, (2, 2, 2), (1, 1, 1)))
    kwargs = {**_block_kwargs(True), "post_norm": True,
              "layer_scale": with_ls, "layer_scale_init_value": 0.1}

    blk_unfused = SwinBlock3D(**{**kwargs, "use_pallas": False})
    variables = blk_unfused.init(jax.random.key(0), x, ids, True)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(
            v.shape) / v.size if v.ndim == 1 else v, variables)
    out_ref = blk_unfused.apply(variables, x, ids, True)

    blk_fused = SwinBlock3D(**kwargs)
    with _ForceTpu():
        v_fused = blk_fused.init(jax.random.key(0), x, ids, True)
        assert jax.tree.structure(v_fused) == jax.tree.structure(variables)
        out_fused = blk_fused.apply(variables, x, ids, True)
        g_fused = jax.grad(lambda p: blk_fused.apply(
            {"params": p}, x, ids, True).sum())(variables["params"])

    g_ref = jax.grad(lambda p: blk_unfused.apply(
        {"params": p}, x, ids, True).sum())(variables["params"])
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in jax.tree.leaves_with_path(g_fused):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path),
        )


def test_fused_block_post_norm_mlp_fallback_matches_unfused(monkeypatch):
    """The fused block's XLA MLP fallback (mlp_tiling returns (0, 0), e.g.
    VMEM-infeasible hidden dims) must honor post_norm: fc1 reads raw x and
    norm2 applies to the branch output — previously it silently pre-normed."""
    import vsn_tpu.ops.swin_block_kernels as sbk

    # swin3d imports mlp_tiling at call time from the kernels module
    monkeypatch.setattr(sbk, "mlp_tiling", lambda *a, **k: (0, 0))

    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    ids = jnp.asarray(
        shifted_window_region_ids(dims, (2, 2, 2), (1, 1, 1)))
    kwargs = {**_block_kwargs(True), "post_norm": True}

    blk_unfused = SwinBlock3D(**{**kwargs, "use_pallas": False})
    variables = blk_unfused.init(jax.random.key(0), x, ids, True)
    out_ref = blk_unfused.apply(variables, x, ids, True)

    blk_fused = SwinBlock3D(**kwargs)
    with _ForceTpu():
        out_fused = blk_fused.apply(variables, x, ids, True)
        g_fused = jax.grad(lambda p: blk_fused.apply(
            {"params": p}, x, ids, True).sum())(variables["params"])
    g_ref = jax.grad(lambda p: blk_unfused.apply(
        {"params": p}, x, ids, True).sum())(variables["params"])
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in jax.tree.leaves_with_path(g_fused):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path),
        )


def test_dropout_config_keeps_fused_path_at_eval():
    """dropout>0 statically excludes the fused kernels only for TRAINING
    forwards; at deterministic eval dropout is a no-op, so eval/TTA of
    dropout-trained models keeps the fast path and matches the unfused
    eval output exactly."""
    from vsn_tpu.models.swin3d import fused_block_gate

    dims = (4, 4, 4)
    c = 8
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)
    kwargs = {**_block_kwargs(False), "dropout": 0.1,
              "attention_dropout": 0.1}

    blk_unfused = SwinBlock3D(**{**kwargs, "use_pallas": False})
    variables = blk_unfused.init(jax.random.key(0), x, None, True)
    out_ref = blk_unfused.apply(variables, x, None, True)  # deterministic

    blk_fused = SwinBlock3D(**kwargs)
    with _ForceTpu():
        # train forward: dropout>0 -> gate closed
        assert not fused_block_gate(
            True, False, False, None, 0.1, 0.1, c, (2, 2, 2), 2,
            deterministic=False)
        # eval forward: gate open, fused == unfused
        assert fused_block_gate(
            True, False, False, None, 0.1, 0.1, c, (2, 2, 2), 2,
            deterministic=True)
        out_fused = blk_fused.apply(variables, x, None, True)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
