"""Parity: the z-taps-in-channels patch embed (VSN_PATCH_EMBED=zconv)
matches nn.Conv bit-for-bit with a shared param tree."""

import jax
import jax.numpy as jnp
import numpy as np

from vsn_tpu.models.swin3d import SwinTransformer3D


def _model():
    return SwinTransformer3D(
        patch_size=(4, 4, 4), num_classes=3, embed_dim=12,
        depths=(1,), num_heads=(2,), window_size=(2, 2, 2),
    )


def test_zconv_matches_conv(monkeypatch):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 1)), jnp.float32)
    model = _model()
    monkeypatch.setenv("VSN_PATCH_EMBED", "conv")
    variables = model.init(jax.random.key(0), x, True)
    out_conv = model.apply(variables, x, True)
    g_conv = jax.grad(
        lambda p: model.apply({"params": p}, x, True).sum()
    )(variables["params"])

    monkeypatch.setenv("VSN_PATCH_EMBED", "zconv")
    v2 = model.init(jax.random.key(0), x, True)
    assert jax.tree_util.tree_structure(v2) == (
        jax.tree_util.tree_structure(variables))
    out_z = model.apply(variables, x, True)
    g_z = jax.grad(
        lambda p: model.apply({"params": p}, x, True).sum()
    )(variables["params"])

    np.testing.assert_allclose(np.asarray(out_z), np.asarray(out_conv),
                               rtol=1e-5, atol=1e-5)
    flat_c = dict(jax.tree_util.tree_leaves_with_path(g_conv))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_z):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_c[path]),
            rtol=1e-4, atol=1e-5, err_msg=str(path))


def test_zconv_falls_back_on_multichannel(monkeypatch):
    # C_in != 1 silently uses nn.Conv under the same name/params
    monkeypatch.setenv("VSN_PATCH_EMBED", "zconv")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)), jnp.float32)
    model = SwinTransformer3D(
        patch_size=(4, 4, 4), num_classes=3, embed_dim=12,
        depths=(1,), num_heads=(2,), window_size=(2, 2, 2), in_channels=2,
    )
    variables = model.init(jax.random.key(0), x, True)
    out = model.apply(variables, x, True)
    assert out.shape == (1, 3)
    assert np.isfinite(np.asarray(out)).all()
