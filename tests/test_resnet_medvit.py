import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.models.medvit3d import (
    MEDVIT_CONFIGS,
    MedViT3D,
    avg_pool_ceil,
    h_sigmoid,
    h_swish,
    make_divisible,
    medvit_from_config,
)
from vsn_tpu.models.resnet3d import RESNET_LAYERS, ResNet3D, resnet_from_config
from vsn_tpu.train.schedules import lr_wd_schedules
from vsn_tpu.train.step import (
    eval_variables,
    init_train_state,
    make_eval_step,
    make_train_step,
)


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

def test_resnet18_forward_with_bn():
    model = ResNet3D(block="basic", layers=[1, 1, 1, 1], num_classes=5)
    x = jnp.ones((2, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, True)
    assert "batch_stats" in variables
    logits = model.apply(variables, x, True)
    assert logits.shape == (2, 5)
    # train mode mutates batch_stats
    logits2, updated = model.apply(
        variables, x, False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(variables["batch_stats"]),
            jax.tree.leaves(updated["batch_stats"]),
        )
    )
    assert changed


def test_resnet_shortcut_type_a():
    model = ResNet3D(block="basic", layers=[1, 1, 1, 1], num_classes=3,
                     shortcut_type="A")
    x = jnp.ones((1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, True)
    assert model.apply(variables, x, True).shape == (1, 3)


def test_resnet_bottleneck():
    model = ResNet3D(block="bottleneck", layers=[1, 1, 1, 1], num_classes=3)
    x = jnp.ones((1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, True)
    assert model.apply(variables, x, True).shape == (1, 3)


def test_resnet18_param_count():
    cfg = load_config(extra_overrides={"ARCHITECTURE": "ResNet", "DROPOUT": 0.1})
    model = resnet_from_config(cfg)
    x = jnp.ones((1, 32, 32, 32, 1))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x, True))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"]))
    # 3D ResNet-18, 1 input channel: ~33M params
    assert 25e6 < n < 45e6, n
    assert RESNET_LAYERS["resnet18"] == ("basic", [2, 2, 2, 2])


def test_bn_model_through_train_step():
    """BN running stats must update through the jitted train step, and the
    NaN guard must leave them untouched on skipped steps."""
    cfg = load_config(extra_overrides=dict(
        STEPS=10, LR_WARMUP=2, WD_WARMUP=2, USE_EMA=True, EMA_N_MODELS=2,
        FP16=False,
    ))
    model = ResNet3D(block="basic", layers=[1, 1, 1, 1], num_classes=5)
    x0 = jnp.ones((1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x0, True)
    state = init_train_state(cfg, variables)
    assert "batch_stats" in state.model_state
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(make_train_step(model, cfg, lr, wd))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 2, 16, 16, 16, 1)),
                             jnp.float32),
        "label": jnp.asarray(np.eye(5, dtype=np.float32)[
            rng.integers(0, 5, (2, 2))
        ]),
    }
    before = jax.tree.map(np.asarray, state.model_state)
    state, m = step(state, batch, jax.random.key(1))
    after = jax.tree.map(np.asarray, state.model_state)
    assert int(m["skipped"]) == 0
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    # eval variables include EMA'd batch_stats
    ev = eval_variables(state, use_ema=True)
    assert "batch_stats" in ev and "params" in ev
    eval_fn = jax.jit(make_eval_step(model))
    probs = eval_fn(ev, jnp.ones((3, 16, 16, 16, 1)))
    assert probs.shape == (3, 5)

    # NaN batch: stats unchanged
    bad = dict(batch)
    bad["image"] = batch["image"].at[0, 0, 0, 0, 0, 0].set(jnp.nan)
    pre = jax.tree.map(np.asarray, state.model_state)
    state, m = step(state, bad, jax.random.key(1))
    post = jax.tree.map(np.asarray, state.model_state)
    assert int(m["skipped"]) == 1
    for a, b in zip(jax.tree.leaves(pre), jax.tree.leaves(post)):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# MedViT
# ---------------------------------------------------------------------------

def test_make_divisible():
    assert make_divisible(288, 32) == 288
    assert make_divisible(100, 32) == 96
    assert make_divisible(30, 32) == 32
    # never drops below 90%
    assert make_divisible(47, 32) == 64


def test_h_activations():
    x = jnp.array([-4.0, -3.0, 0.0, 3.0, 10.0])
    np.testing.assert_allclose(h_sigmoid(x), [0, 0, 0.5, 1, 1], atol=1e-6)
    np.testing.assert_allclose(h_swish(x), x * h_sigmoid(x), atol=1e-6)


def test_avg_pool_ceil():
    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 5, 1, 2, 1)
    # pool depth 5 by stride 2 -> ceil 3 outputs; last window has 1 element
    y = avg_pool_ceil(x, (2, 1, 2))
    assert y.shape == (1, 3, 1, 1, 1)
    vals = np.asarray(x).reshape(5, 2)
    expected0 = vals[0:2].mean()
    expected2 = vals[4:5].mean()  # count_include_pad=False
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0, 0], expected0)
    np.testing.assert_allclose(np.asarray(y)[0, 2, 0, 0, 0], expected2)


def tiny_medvit(**kw):
    # LTB out-channels (dims[2], dims[4], dims[5]) must leave a nonzero MHCA
    # branch after make_divisible(c*0.75, 32) — 128 -> 96+32 works.
    base = dict(
        num_classes=3,
        stem_chs=[16, 8, 16],
        depths=(1, 2, 5, 1),
        dims=[32, 32, 128, 64, 128, 128],
        head_dim=8,
        stochastic_depth_prob=0.0,
    )
    base.update(kw)
    return MedViT3D(**base)


def test_medvit_forward():
    model = tiny_medvit()
    x = jnp.ones((1, 32, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, True)
    assert "batch_stats" in variables
    logits = model.apply(variables, x, True)
    assert logits.shape == (1, 3)
    # train mode with all regularizers
    model2 = tiny_medvit(use_shakedrop=True, layer_scale=True,
                         enable_stable=True, stochastic_depth_prob=0.1)
    v2 = model2.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "shakedrop": jax.random.key(2)},
        x, False,
    )
    out, _ = model2.apply(
        v2, x, False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1), "shakedrop": jax.random.key(2)},
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_medvit_from_config_structure():
    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="MedViT", DEPTH=[3, 4, 10, 3], HEADS=32, MLP_RATIO=3,
    ))
    model = medvit_from_config(cfg)
    assert model.depths == (3, 4, 10, 3)
    assert model.head_dim == 32
    assert MEDVIT_CONFIGS["S"]["depths"] == [3, 4, 10, 3]


def test_medvit_param_count():
    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="MedViT", DEPTH=[3, 4, 10, 3], HEADS=32, MLP_RATIO=3,
    ))
    model = medvit_from_config(cfg)
    x = jnp.ones((1, 32, 32, 32, 1))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x, True))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"]))
    # MedViT-S (2D) is ~23M; the 3D variant inflates convs: accept 15-60M
    assert 15e6 < n < 60e6, n
