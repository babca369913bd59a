import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vsn_tpu.config import load_config
from vsn_tpu.train.step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from vsn_tpu.train.schedules import lr_wd_schedules


class TinyModel(nn.Module):
    """Stand-in classifier with the model.apply(params, x, deterministic, rngs)
    signature the step builder expects."""

    num_classes: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(16)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes)(x)


def make_batch(rng, a=2, b=4, feat=8, k=3):
    images = rng.standard_normal((a, b, feat)).astype(np.float32)
    labels = np.eye(k, dtype=np.float32)[rng.integers(0, k, (a, b))]
    # make it learnable: class leaks into the first feature
    images[..., 0] = labels.argmax(-1) * 2.0
    return {"image": jnp.asarray(images), "label": jnp.asarray(labels)}


def build(cfg_overrides=None, steps=50):
    cfg = load_config().replace(
        STEPS=steps, LR_WARMUP=5, WD_WARMUP=5, LR_BASE=0.01, LR_FINAL=0.001,
        **(cfg_overrides or {}),
    )
    model = TinyModel()
    params = model.init(jax.random.key(0), jnp.ones((1, 8)), True)
    state = init_train_state(cfg, params)
    lr, wd = lr_wd_schedules(cfg)
    step_fn = jax.jit(make_train_step(model, cfg, lr, wd))
    return cfg, model, state, step_fn


def test_loss_decreases():
    cfg, model, state, step_fn = build()
    rng = np.random.default_rng(0)
    base_rng = jax.random.key(1)
    losses = []
    for _ in range(40):
        state, m = step_fn(state, make_batch(rng), base_rng)
        losses.append(float(m["loss"]))
    assert int(state.step) == 40
    assert int(state.skipped) == 0
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8


def test_lr_schedule_indexed_by_step():
    cfg, model, state, step_fn = build()
    rng = np.random.default_rng(0)
    lr_table, _ = lr_wd_schedules(cfg)
    base_rng = jax.random.key(1)
    state, m0 = step_fn(state, make_batch(rng), base_rng)
    assert np.isclose(float(m0["lr"]), lr_table[0])
    state, m1 = step_fn(state, make_batch(rng), base_rng)
    assert np.isclose(float(m1["lr"]), lr_table[1])


def test_nan_guard_skips_update():
    cfg, model, state, step_fn = build()
    rng = np.random.default_rng(0)
    base_rng = jax.random.key(1)
    bad = make_batch(rng)
    bad["image"] = bad["image"].at[0, 0, 0].set(jnp.nan)
    before = jax.tree.map(np.asarray, state.params)
    state, m = step_fn(state, bad, base_rng)
    assert int(m["skipped"]) == 1
    assert int(state.skipped) == 1
    assert int(state.step) == 1  # step still advances (LR array consumption)
    after = jax.tree.map(np.asarray, state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # recovery: a good batch still trains
    state, m2 = step_fn(state, make_batch(rng), base_rng)
    assert int(m2["skipped"]) == 0


def test_sam_differs_from_plain_and_trains():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    base_rng = jax.random.key(1)

    _, _, state_a, step_a = build()
    _, _, state_b, step_b = build({"USE_SAM": True, "SAM_RHO": 0.5})
    # Adam's first step is sign descent (m_hat/sqrt(v_hat) = sign(g)), so a
    # single step can coincide; after a few steps magnitudes matter.
    sa, sb = state_a, state_b
    for _ in range(5):
        sa, _ = step_a(sa, batch, base_rng)
        sb, _ = step_b(sb, batch, base_rng)
    diffs = [
        np.abs(np.asarray(x) - np.asarray(y)).max()
        for x, y in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params))
    ]
    assert max(diffs) > 1e-7

    # and SAM (with a sane rho) still learns
    _, _, state_c, step_c = build({"USE_SAM": True, "SAM_RHO": 0.05})
    losses = []
    state = state_c
    rng = np.random.default_rng(0)  # fresh stream, same as test_loss_decreases
    for _ in range(40):
        state, m = step_c(state, make_batch(rng), base_rng)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8


def test_ema_state_updates():
    cfg, model, state, step_fn = build({"USE_EMA": True, "EMA_N_MODELS": 3})
    rng = np.random.default_rng(0)
    base_rng = jax.random.key(1)
    assert state.ema is not None
    state, _ = step_fn(state, make_batch(rng), base_rng)
    assert int(state.ema.count) == 2  # init + 1 update
    # EMA is a convex combination -> finite, close to params early on
    for e, p in zip(jax.tree.leaves(state.ema.ema), jax.tree.leaves(state.params)):
        assert np.all(np.isfinite(np.asarray(e)))


def test_gradient_clip():
    cfg, model, state, step_fn = build({"GRADIENT_CLIP": 0.001})
    rng = np.random.default_rng(0)
    base_rng = jax.random.key(1)
    state, m = step_fn(state, make_batch(rng), base_rng)
    assert float(m["grad_norm"]) > 0  # reported pre-clip norm


def test_eval_step_probs():
    cfg, model, state, step_fn = build()
    eval_fn = jax.jit(make_eval_step(model))
    probs = eval_fn({"params": state.params}, jnp.ones((5, 8)))
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_watch_gradients_metric_keys():
    """WATCH_GRADIENTS adds per-top-level-module gradient norms
    (reference's W&B gradient watching, train_transformer.py:2112-2120)."""
    import numpy as np
    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model
    from vsn_tpu.train.schedules import lr_wd_schedules
    from vsn_tpu.train.step import (
        init_train_state, make_batch_transform, make_train_step,
    )

    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="ViT", IMG_SIZE=[8, 8, 8], RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4], EMBED_DIM=16, DEPTH=1, HEADS=2,
        DISEASES=["CN", "AD"], BATCH_SIZE=1, EFFECTIVE_BATCH_SIZE=2,
        STEPS=2, LR_WARMUP=1, WD_WARMUP=1, SEED=0, FP16=False,
        WATCH_GRADIENTS=True, STOCHASTIC_DEPTH_PROB=0.0,
    ))
    model = build_model(cfg)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 8, 8, 8, 1)), True)
    state = init_train_state(cfg, params)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(make_train_step(model, cfg, lr, wd,
                                   make_batch_transform(cfg)))
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((1, 2, 8, 8, 8, 1)).astype(np.float16),
        "label": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (1, 2))],
    }
    _, m = step(state, batch, jax.random.key(1))
    watched = [k for k in m if k.startswith("grad_norm/")]
    assert watched, list(m)
    for k in watched:
        assert np.isfinite(float(m[k]))


def test_watch_gradients_attn_logit_max_probe():
    """With a probe_model (unfused twin), WATCH_GRADIENTS also surfaces the
    max attention logit — the observability guard for the fused kernels'
    softmax clamp at 80 (swin_block_kernels.py max-free softmax)."""
    import numpy as np
    from vsn_tpu.config import load_config
    from vsn_tpu.models import build_model
    from vsn_tpu.train.schedules import lr_wd_schedules
    from vsn_tpu.train.step import (
        init_train_state, make_batch_transform, make_train_step,
    )

    cfg = load_config(extra_overrides=dict(
        ARCHITECTURE="Swin", IMG_SIZE=[8, 8, 8], RESHAPE_SIZE=False,
        PATCH_SHAPE=[2, 2, 2], EMBED_DIM=16, DEPTH=[2], HEADS=[2],
        WINDOW_SIZE=[2, 2, 2], DISEASES=["CN", "AD"], BATCH_SIZE=1,
        EFFECTIVE_BATCH_SIZE=2, STEPS=2, LR_WARMUP=1, WD_WARMUP=1,
        SEED=0, FP16=False, WATCH_GRADIENTS=True,
        STOCHASTIC_DEPTH_PROB=0.0,
        # probe forwards only run on logged steps (lax.cond); log every step
        VALIDATION_FREQUENCY=1,
    ))
    model = build_model(cfg)
    probe = build_model(cfg.replace(USE_PALLAS_ATTENTION=False))
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)), True)
    state = init_train_state(cfg, params)
    lr, wd = lr_wd_schedules(cfg)
    step = jax.jit(make_train_step(model, cfg, lr, wd,
                                   make_batch_transform(cfg),
                                   probe_model=probe))
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((1, 2, 8, 8, 8, 1)).astype(np.float16),
        "label": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (1, 2))],
    }
    _, m = step(state, batch, jax.random.key(1))
    assert "attn_logit_max" in m, list(m)
    v = float(m["attn_logit_max"])
    assert np.isfinite(v) and v < 80.0, v
