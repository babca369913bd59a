"""Parity tests for the halo-im2col stem kernel (interpret mode on CPU).

Oracle: jax.lax.conv_general_dilated at the same dtype. Geometries mirror
the production stems scaled down: ResNet conv1 7^3/(1,2,2)/pad3
(/root/reference/models/resnet_3d.py:129-137) and MedViT stem conv0
3^3/(2,2,2)/pad1 (/root/reference/models/medvit_3d.py:543-549), plus an
all-stride-1 case (nper=1 degenerate parity split) and an odd-extent case
(exercises the +1 parity pad).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.ops.stem_im2col import (
    _ref_conv,
    should_im2col,
    stem_conv_im2col,
)

GEOMS = [
    # (shape DHW, kernel, strides, name)
    ((12, 14, 12), (7, 7, 7), (1, 2, 2), "resnet-stem"),
    ((12, 14, 12), (3, 3, 3), (2, 2, 2), "medvit-stem0"),
    ((8, 10, 8), (3, 3, 3), (1, 1, 1), "stride1"),
    ((9, 11, 13), (3, 5, 3), (2, 2, 1), "odd-extent"),
]


def _setup(shape, kernel_shape, seed=0, c_out=16):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.standard_normal((2, *shape, 1)), jnp.float32
    )
    k = jnp.asarray(
        rng.standard_normal((*kernel_shape, 1, c_out)) * 0.1, jnp.float32
    )
    return x, k


@pytest.mark.parametrize("shape,ks,strides,name", GEOMS)
def test_forward_matches_lax_conv(shape, ks, strides, name):
    pad = tuple(k // 2 for k in ks)
    x, k = _setup(shape, ks)
    got = stem_conv_im2col(x, k, strides, pad)
    want = _ref_conv(x, k, strides, pad, jnp.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dw_impl", ["pallas", "xla"])
@pytest.mark.parametrize("shape,ks,strides,name", GEOMS[:2])
def test_grads_match_lax_conv(shape, ks, strides, name, dw_impl,
                              monkeypatch):
    monkeypatch.setenv("VSN_STEM_DW", dw_impl)
    pad = tuple(k // 2 for k in ks)
    x, k = _setup(shape, ks, seed=1)

    def loss(fn):
        def inner(xx, kk):
            y = fn(xx, kk, strides, pad)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))

        return inner

    dx, dk = jax.grad(loss(stem_conv_im2col), argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(
        loss(lambda xx, kk, s, p: _ref_conv(xx, kk, s, p, jnp.float32)),
        argnums=(0, 1),
    )(x, k)
    np.testing.assert_allclose(dk, dk_r, rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(dx, dx_r, rtol=5e-5, atol=5e-5)


def test_bf16_forward_close():
    ks, strides = (7, 7, 7), (1, 2, 2)
    pad = (3, 3, 3)
    x, k = _setup((12, 14, 12), ks, seed=2)
    got = stem_conv_im2col(x.astype(jnp.bfloat16), k, strides, pad,
                           dtype=jnp.bfloat16)
    want = _ref_conv(x, k, strides, pad, jnp.float32)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        got.astype(jnp.float32), want, rtol=0.05, atol=0.05
    )


def test_unfolded_conv_routes_to_im2col(monkeypatch):
    """UnfoldedConv's VSN_STEM_IM2COL=1 path matches its plain-conv path
    (and the legacy tap-unfold path) on the ResNet stem geometry."""
    from vsn_tpu.ops.conv_unfold import UnfoldedConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 10, 1)), jnp.float32)
    mod = UnfoldedConv(8, (7, 7, 7), strides=(1, 2, 2), padding=(3, 3, 3))
    params = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("VSN_STEM_IM2COL", "0")
    monkeypatch.setenv("VSN_UNFOLD_STEM", "0")
    base = mod.apply(params, x)
    monkeypatch.setenv("VSN_STEM_IM2COL", "1")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_resnet_stem_im2col_matches_conv_path(monkeypatch):
    """Whole-model forward agrees between the im2col and conv stems."""
    from vsn_tpu.models.resnet3d import ResNet3D

    model = ResNet3D(block="basic", layers=[1, 1, 1, 1], num_classes=3)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 16, 18, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)

    monkeypatch.setenv("VSN_STEM_IM2COL", "0")
    base = model.apply(variables, x, True)
    monkeypatch.setenv("VSN_STEM_IM2COL", "1")
    got = model.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_gate_rejects_unsupported():
    assert should_im2col((1, 2, 2), (7, 7, 7), (3, 3, 3), 1)  # ResNet stem
    assert not should_im2col((1, 2, 2), (7, 7, 7), (3, 3, 3), 2)  # c_in
    assert not should_im2col((1, 3, 2), (7, 7, 7), (3, 3, 3), 1)  # stride 3
    assert not should_im2col((1, 2, 2), (7, 7, 6), (3, 3, 3), 1)  # even k
    assert not should_im2col((1, 2, 2), (7, 7, 7), (3, 3, 2), 1)  # pad
    assert not should_im2col((2, 2, 2), (9, 9, 9), (4, 4, 4), 1)  # taps
    # too few taps to amortize the build (MedViT stem0 3^3: the plain
    # conv measured 2.2x FASTER than im2col — module docstring)
    assert not should_im2col((2, 2, 2), (3, 3, 3), (1, 1, 1), 1)
