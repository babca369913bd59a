"""Tap-unfolded conv (vsn_tpu/ops/conv_unfold.py) parity vs lax conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.ops.conv_unfold import (
    UnfoldedConv,
    should_unfold,
    tap_unfolded_conv,
)


def _ref_conv(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=tuple(strides),
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


CASES = [
    # (spatial, kernel, strides, padding, c_in, c_out)
    ((18, 22, 18), (7, 7, 7), (1, 2, 2), (3, 3, 3), 1, 8),   # ResNet stem
    ((18, 20, 18), (3, 3, 3), (2, 2, 2), (1, 1, 1), 1, 8),   # MedViT stem0
    ((17, 19, 17), (3, 3, 3), (2, 2, 2), (1, 1, 1), 1, 8),   # odd sizes
    ((12, 14, 12), (5, 3, 3), (2, 1, 2), (2, 1, 1), 2, 4),   # mixed axes
]


@pytest.mark.parametrize("spatial,kernel,strides,padding,cin,cout", CASES)
def test_tap_unfolded_matches_conv(spatial, kernel, strides, padding, cin,
                                   cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *spatial, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((*kernel, cin, cout)) * 0.1,
                    jnp.float32)
    want = _ref_conv(x, k, strides, padding)
    got = tap_unfolded_conv(x, k, strides, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tap_unfolded_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 10, 1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 7, 1, 4)) * 0.1, jnp.float32)
    strides, padding = (1, 2, 2), (3, 3, 3)

    def loss_ref(xx, kk):
        return jnp.sum(jnp.sin(_ref_conv(xx, kk, strides, padding)))

    def loss_unf(xx, kk):
        return jnp.sum(jnp.sin(tap_unfolded_conv(xx, kk, strides, padding)))

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_u, gk_u = jax.grad(loss_unf, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_u), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_u), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_should_unfold_gating():
    assert should_unfold((1, 2, 2), (7, 7, 7), 1)
    assert should_unfold((2, 2, 2), (3, 3, 3), 1)
    assert not should_unfold((1, 1, 1), (3, 3, 3), 1)    # nothing to unfold
    assert not should_unfold((1, 2, 2), (7, 7, 7), 64)   # C_in already fine
    assert not should_unfold((4, 4, 4), (4, 4, 4), 1)    # stride > 2


def test_unfolded_conv_module_param_tree_and_parity(monkeypatch):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 10, 1)), jnp.float32)
    mod = UnfoldedConv(8, (7, 7, 7), strides=(1, 2, 2), padding=(3, 3, 3))
    params = mod.init(jax.random.PRNGKey(0), x)
    assert params["params"]["kernel"].shape == (7, 7, 7, 1, 8)

    from flax import linen as nn

    ref = nn.Conv(8, (7, 7, 7), strides=(1, 2, 2), padding=3, use_bias=False)
    want = ref.apply(params, x)

    monkeypatch.setenv("VSN_UNFOLD_STEM", "1")
    got_unf = mod.apply(params, x)
    monkeypatch.setenv("VSN_UNFOLD_STEM", "0")
    got_conv = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got_unf), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_conv), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_resnet_stem_unfold_matches_conv_path(monkeypatch):
    """Whole-model forward agrees between the unfolded and conv stems."""
    from vsn_tpu.models.resnet3d import ResNet3D

    model = ResNet3D(block="basic", layers=[1, 1, 1, 1], num_classes=3)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 18, 16, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)

    monkeypatch.setenv("VSN_UNFOLD_STEM", "0")
    base = model.apply(variables, x, True)
    monkeypatch.setenv("VSN_UNFOLD_STEM", "1")
    unf = model.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(unf), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_depthwise_shift_matches_grouped_conv():
    from vsn_tpu.ops.conv_unfold import depthwise_conv3d_shift

    rng = np.random.default_rng(4)
    c = 12
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 8, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 1, c)) * 0.2, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=c)
    got = depthwise_conv3d_shift(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_s(xx, kk):
        return jnp.sum(jnp.sin(depthwise_conv3d_shift(xx, kk)))

    def loss_r(xx, kk):
        return jnp.sum(jnp.sin(jax.lax.conv_general_dilated(
            xx, kk, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c)))

    gx_s, gk_s = jax.grad(loss_s, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_depthwise_module_param_tree_and_parity(monkeypatch):
    from flax import linen as nn

    from vsn_tpu.ops.conv_unfold import DepthwiseConv

    rng = np.random.default_rng(5)
    c = 8
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 6, c)), jnp.float32)
    mod = DepthwiseConv((3, 3, 3))
    params = mod.init(jax.random.PRNGKey(0), x)
    assert params["params"]["kernel"].shape == (3, 3, 3, 1, c)

    ref = nn.Conv(c, (3, 3, 3), padding=1, feature_group_count=c,
                  use_bias=False)
    want = ref.apply(params, x)
    monkeypatch.setenv("VSN_DW_SHIFT", "1")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_medvit_dwconv_shift_matches_conv_path(monkeypatch):
    from vsn_tpu.models.medvit3d import LocalityFeedForward

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 6, 16)), jnp.float32)
    mod = LocalityFeedForward(expand_ratio=2.0)
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    monkeypatch.setenv("VSN_DW_SHIFT", "0")
    base = mod.apply(variables, x, True)
    monkeypatch.setenv("VSN_DW_SHIFT", "1")
    got = mod.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
