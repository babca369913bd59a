import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.models.vit3d import VIT_CONFIGS, ViT3D, vit_from_config


def tiny_vit(**kw):
    base = dict(
        img_size=(16, 16, 16),
        patch_size=(8, 8, 8),
        num_classes=3,
        embed_dim=32,
        depth=2,
        num_heads=2,
        mlp_dim=64,
        dim_head=16,
    )
    base.update(kw)
    return ViT3D(**base)


def test_forward_shape_and_grad():
    model = tiny_vit()
    x = jnp.ones((2, 16, 16, 16, 1))
    params = model.init(jax.random.key(0), x, True)
    logits = model.apply(params, x, True)
    assert logits.shape == (2, 3)
    assert logits.dtype == jnp.float32

    def loss(p):
        return model.apply(p, x, True).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize("pool", ["cls", "mean"])
def test_pooling_variants(pool):
    model = tiny_vit(pool=pool)
    x = jnp.ones((1, 16, 16, 16, 1))
    params = model.init(jax.random.key(0), x, True)
    assert model.apply(params, x, True).shape == (1, 3)


def test_post_norm_and_layerscale_and_stable():
    model = tiny_vit(
        post_norm=True,
        layer_scale=True,
        layer_scale_init_value=0.1,
        enable_stable=True,
        stochastic_depth_prob=0.1,
    )
    x = jnp.ones((2, 16, 16, 16, 1))
    params = model.init(jax.random.key(0), x, True)
    out_det = model.apply(params, x, True)
    assert out_det.shape == (2, 3)
    out_train = model.apply(
        params, x, False, rngs={"dropout": jax.random.key(1)}
    )
    assert np.all(np.isfinite(np.asarray(out_train)))


def test_from_config_builds_vit_s():
    from vsn_tpu.config import DEFAULT_CONFIG_PATH

    cfg = load_config(DEFAULT_CONFIG_PATH.parent / "vit-3c-no_seed-baseline.yaml")
    model = vit_from_config(cfg)
    assert model.embed_dim == 384 and model.depth == 12 and model.num_heads == 6
    assert model.img_size == (144, 160, 144)
    assert model.num_classes == 3


def test_preset_table():
    assert VIT_CONFIGS["S"] == dict(depth=12, num_heads=6, embed_dim=384)
    assert VIT_CONFIGS["H"]["embed_dim"] == 1280


def test_param_count_vit_s_reasonable():
    """ViT-S 3D on 144x160x144/16^3 should be ~28-32M params like the torch one."""
    from vsn_tpu.config import DEFAULT_CONFIG_PATH

    cfg = load_config(DEFAULT_CONFIG_PATH.parent / "vit-3c-no_seed-baseline.yaml")
    model = vit_from_config(cfg)
    x = jnp.ones((1, 144, 160, 144, 1), jnp.bfloat16)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), x, True))
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    assert 20e6 < n < 40e6, n


def test_vit_fused_mlp_half_matches_unfused():
    """The fused LN+MLP kernel path (VERDICT round-1 item 4) must declare an
    identical param tree and match the unfused block, including the CLS
    token's non-multiple-of-8 row count (pad + slice)."""
    import numpy as np
    from tests.test_swin_block_kernels import _ForceTpu
    from vsn_tpu.models.vit3d import ViTBlock

    rng = np.random.default_rng(0)
    b, t, c = 2, 17, 16  # t=17: prime-ish, forces the pad path
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    kw = dict(heads=2, dim_head=8, mlp_dim=32, drop_path_rate=0.0)
    blk_ref = ViTBlock(**kw, use_pallas=False)
    variables = blk_ref.init(jax.random.key(0), x, True)
    out_ref = blk_ref.apply(variables, x, True)

    blk_fused = ViTBlock(**kw, use_pallas=True)
    with _ForceTpu():
        v_fused = blk_fused.init(jax.random.key(0), x, True)
        assert jax.tree.structure(v_fused) == jax.tree.structure(variables)
        out_fused = blk_fused.apply(variables, x, True)

        def loss_fused(p):
            return blk_fused.apply({"params": p}, x, True).sum()

        g_fused = jax.grad(loss_fused)(variables["params"])

    def loss_ref(p):
        return blk_ref.apply({"params": p}, x, True).sum()

    g_ref = jax.grad(loss_ref)(variables["params"])
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_f = jax.tree.leaves_with_path(g_fused)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=5e-4, atol=5e-4, err_msg=str(path),
        )


def test_vit_fused_attn_droppath_rng_parity():
    """With DropPath active in train mode, the fused attention+MLP block
    must reproduce the unfused block's per-sample gating bit-for-bit (the
    fused path draws its rng through dummy submodules named res1/res2 so
    the flax fold paths match)."""
    import numpy as np
    from tests.test_swin_block_kernels import _ForceTpu
    from vsn_tpu.models.vit3d import ViTBlock

    rng = np.random.default_rng(1)
    b, t, c = 4, 12, 16
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    kw = dict(heads=2, dim_head=8, mlp_dim=32, drop_path_rate=0.6)
    blk_ref = ViTBlock(**kw, use_pallas=False)
    variables = blk_ref.init(jax.random.key(0), x, True)
    rngs = {"dropout": jax.random.key(7)}
    out_ref = blk_ref.apply(variables, x, False, rngs=rngs)

    blk_fused = ViTBlock(**kw, use_pallas=True)
    with _ForceTpu():
        out_fused = blk_fused.apply(variables, x, False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    # gating must actually vary across samples at this rate
    diff = np.abs(np.asarray(out_ref) - np.asarray(x)).sum(axis=(1, 2))
    assert (diff < 1e-6).any() or (diff > 1e-3).any()


@pytest.mark.parametrize("with_ls", [False, True])
def test_vit_fused_post_norm_matches_unfused(with_ls):
    """ViT post-norm (attn_norm/ff_norm on the branch outputs) rides the
    fused kernels: identical param tree, outputs, grads."""
    import numpy as np
    from tests.test_swin_block_kernels import _ForceTpu
    from vsn_tpu.models.vit3d import ViTBlock

    rng = np.random.default_rng(23)
    b, t, c = 2, 17, 16
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    kw = dict(heads=2, dim_head=8, mlp_dim=32, drop_path_rate=0.0,
              post_norm=True, layer_scale=with_ls,
              layer_scale_init_value=0.1)
    blk_ref = ViTBlock(**kw, use_pallas=False)
    variables = blk_ref.init(jax.random.key(0), x, True)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(
            v.shape) / v.size if v.ndim == 1 else v, variables)
    out_ref = blk_ref.apply(variables, x, True)

    blk_fused = ViTBlock(**kw, use_pallas=True)
    with _ForceTpu():
        v_fused = blk_fused.init(jax.random.key(0), x, True)
        assert jax.tree.structure(v_fused) == jax.tree.structure(variables)
        out_fused = blk_fused.apply(variables, x, True)
        g_fused = jax.grad(lambda p: blk_fused.apply(
            {"params": p}, x, True).sum())(variables["params"])

    g_ref = jax.grad(lambda p: blk_ref.apply(
        {"params": p}, x, True).sum())(variables["params"])
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in jax.tree.leaves_with_path(g_fused):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path),
        )
