"""Device-resident dataset mode (PRELOAD_DEVICE): HBM-resident volume cache
with on-device batch assembly from sampler indices (vsn_tpu/data/resident.py).

Covers: int8 quantization error bound, gather fidelity, index-mode pipeline
equivalence with the host pipeline, train-step equivalence (float16 resident
must be bit-faithful to shipping the same f16 volumes), and an end-to-end
train_fold on the 8-device CPU mesh.
"""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from vsn_tpu.config import load_config
from vsn_tpu.data.pipeline import InMemoryDataset, TrainPipeline
from vsn_tpu.data.resident import (
    ResidentVolumes,
    build_resident,
    gather_volumes,
    quantize_volumes_int8,
)
from vsn_tpu.data.synthetic import generate_synthetic_dataset
from vsn_tpu.models import build_model
from vsn_tpu.parallel import mesh as meshlib
from vsn_tpu.train.schedules import lr_wd_schedules
from vsn_tpu.train.step import (
    init_train_state,
    make_batch_transform,
    make_train_step,
)
from vsn_tpu.train.trainer import train_fold


def _volumes(n=6, shape=(8, 10, 8)):
    rng = np.random.default_rng(0)
    return (rng.standard_normal((n, *shape, 1)) * 50 + 100).astype(np.float16)


def test_int8_quantization_error_bound():
    x = _volumes()
    q, scale, offset = quantize_volumes_int8(x)
    assert q.dtype == np.uint8
    recon = q.astype(np.float32) * scale.reshape(-1, 1, 1, 1, 1) + offset.reshape(
        -1, 1, 1, 1, 1
    )
    err = np.abs(recon - x.astype(np.float32))
    # max error <= half a quantization step per volume (tiny slack for f32
    # rounding at exact .5 boundaries)
    assert (err <= scale.reshape(-1, 1, 1, 1, 1) * 0.5 * (1 + 1e-3)).all()


def test_gather_volumes_float16_bit_faithful():
    x = _volumes()
    res = build_resident(x, "float16")
    idx = jnp.asarray([3, 0, 5], jnp.int32)
    got = np.asarray(gather_volumes(res, idx))
    assert got.dtype == np.float16
    np.testing.assert_array_equal(got, x[[3, 0, 5]])


def test_gather_volumes_int8_close():
    x = _volumes()
    res = build_resident(x, "int8")
    idx = jnp.asarray([1, 4], jnp.int32)
    got = np.asarray(gather_volumes(res, idx))
    span = (x.astype(np.float32).max() - x.astype(np.float32).min())
    assert np.abs(got - x[[1, 4]].astype(np.float32)).max() <= span / 255.0


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("resident")
    raw, csvs = generate_synthetic_dataset(
        root, n_subjects=32, shape=(16, 20, 16), diseases=("CN", "AD", "FTD"),
        kfold=10, seed=3,
    )
    return root, csvs


def _cfg(**kw):
    base = dict(
        ARCHITECTURE="ViT",
        IMG_SIZE=[16, 20, 16],
        RESHAPE_SIZE=False,
        PATCH_SHAPE=[4, 4, 4],
        EMBED_DIM=32,
        DEPTH=1,
        HEADS=2,
        DISEASES=["CN", "AD", "FTD"],
        BATCH_SIZE=1,
        EFFECTIVE_BATCH_SIZE=16,
        STEPS=6,
        LR_WARMUP=2,
        WD_WARMUP=2,
        VALIDATION_FREQUENCY=3,
        EARLY_STOPPING_PATIENCE=False,
        SEED=7,
        FP16=False,
        STOCHASTIC_DEPTH_PROB=0.0,
        USE_MIXUP=True,
        MIXUP_PROB=0.5,
    )
    base.update(kw)
    return load_config(extra_overrides=base)


def _dataset(synth, cfg):
    root, csvs = synth
    meta = pd.read_csv(csvs / "fold_0.csv")
    meta = meta[meta.Diagnosis.isin(cfg.DISEASES)].reset_index(drop=True)
    from vsn_tpu.data.preprocessing import DataPrepa

    cache = root / "cache"
    DataPrepa(meta, cache).preprocess_data(crop=tuple(cfg.IMG_SIZE))
    return InMemoryDataset(cache, meta, cfg.DISEASES)


def test_index_pipeline_matches_host_pipeline(synth):
    cfg = _cfg()
    ds = _dataset(synth, cfg)
    host = TrainPipeline(ds, cfg, grad_accum=2, micro_batch=4, seed=5)
    index = TrainPipeline(ds, cfg, grad_accum=2, micro_batch=4, seed=5,
                          index_mode=True)
    bh = next(iter(host))
    bi = next(iter(index))
    assert "image_idx" in bi and "image" not in bi
    assert "partner_idx" in bi and "image2" not in bi
    np.testing.assert_array_equal(
        ds.gather(bi["image_idx"].reshape(-1)).reshape(bh["image"].shape),
        bh["image"],
    )
    np.testing.assert_array_equal(
        ds.gather(bi["partner_idx"].reshape(-1)).reshape(bh["image2"].shape),
        bh["image2"],
    )
    np.testing.assert_array_equal(bi["label"], bh["label"])
    np.testing.assert_array_equal(bi["mix_lam"], bh["mix_lam"])


def test_train_step_resident_equals_host(synth):
    """float16 resident mode must produce the identical step (same volumes,
    same RNG stream) as shipping the gathered f16 volumes."""
    cfg = _cfg()
    ds = _dataset(synth, cfg)
    mesh = meshlib.make_mesh()
    host_pipe = TrainPipeline(ds, cfg, grad_accum=2, micro_batch=8, seed=5)
    idx_pipe = TrainPipeline(ds, cfg, grad_accum=2, micro_batch=8, seed=5,
                             index_mode=True)

    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)
    lr, wd = lr_wd_schedules(cfg)
    # no donation: s_host and s_res share the initial param buffers
    step = jax.jit(make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)))
    res = build_resident(ds.all_volumes(), "float16", mesh)
    key = jax.random.key(1)

    s_host = init_train_state(cfg, variables)
    s_res = init_train_state(cfg, variables)
    for bh, bi in zip(host_pipe, idx_pipe):
        sh = meshlib.shard_train_batch(bh, mesh)
        si = meshlib.shard_train_batch(bi, mesh)
        s_host, m_host = step(s_host, sh, key)
        s_res, m_res = step(s_res, si, key, res)
        np.testing.assert_array_equal(
            np.asarray(m_host["loss"]), np.asarray(m_res["loss"])
        )
        if int(s_host.step) >= 3:
            break
    for a, b in zip(jax.tree.leaves(s_host.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_fold_with_preload_device(synth, tmp_path):
    root, csvs = synth
    cfg = _cfg(PRELOAD_DEVICE="int8", USE_EMA=True, EMA_N_MODELS=2)
    summary = train_fold(
        cfg, csv_dir=str(csvs), save_dir=str(tmp_path / "runs"),
        cache_dir=str(root / "cache_e2e"),
    )
    assert summary["steps"] == 6
    assert np.isfinite(summary["history"]["train_loss"]).all()


# ---------------------------------------------------------------------------
# Pre-transformed stores (PRELOAD_PRETRANSFORM)
# ---------------------------------------------------------------------------

def test_resident_pretransform_gate():
    """Train store eligibility: minimal pipeline with no mixing only; eval
    store always eligible; PRELOAD_PRETRANSFORM=False disables both."""
    from vsn_tpu.data.resident import resident_pretransform

    minimal = _cfg(USE_MIXUP=False, MIXUP_PROB=0.0)
    assert resident_pretransform(minimal, train=True) is not None
    assert resident_pretransform(minimal, train=False) is not None

    mixup = _cfg()  # _cfg defaults USE_MIXUP=True
    assert resident_pretransform(mixup, train=True) is None
    assert resident_pretransform(mixup, train=False) is not None

    dung = _cfg(USE_MIXUP=False, IS_DUNG_TRANSFORMS=True)
    assert resident_pretransform(dung, train=True) is None

    off = _cfg(USE_MIXUP=False, PRELOAD_PRETRANSFORM=False)
    assert resident_pretransform(off, train=True) is None
    assert resident_pretransform(off, train=False) is None


def test_pretransform_store_matches_on_the_fly():
    """Gathering from a pre-transformed store must match applying the
    transform to the raw gather, within store-dtype rounding."""
    from vsn_tpu.data.augment import build_eval_transform
    from vsn_tpu.data.resident import resident_pretransform

    cfg = _cfg(USE_MIXUP=False)
    x = _volumes(n=6, shape=tuple(cfg.IMG_SIZE))
    tfm = build_eval_transform(cfg)
    idx = jnp.asarray([4, 1, 3], jnp.int32)
    want = np.asarray(tfm(jnp.asarray(x[[4, 1, 3]], jnp.float32)))

    res16 = build_resident(x, "float16", pretransform=tfm, chunk=4)
    got16 = np.asarray(gather_volumes(res16, idx), np.float32)
    assert res16.data.dtype == jnp.float16
    assert res16.data.shape[1:4] == tuple(cfg.input_size)
    # z-scored values are O(1); f16 rounding is ~1e-3 relative
    np.testing.assert_allclose(got16, want, atol=2e-3)

    res8 = build_resident(x, "int8", pretransform=tfm, chunk=4)
    got8 = np.asarray(gather_volumes(res8, idx), np.float32)
    # one uint8 step over the z-score range (~8 sigma / 255)
    np.testing.assert_allclose(got8, want, atol=0.04)


def test_train_step_pretransformed_close_to_host(synth):
    """Minimal-pipeline train step through a pre-transformed f16 store
    (passthrough batch transform) stays close to the host path that
    transforms per step in f32."""
    cfg = _cfg(USE_MIXUP=False, MIXUP_PROB=0.0)
    ds = _dataset(synth, cfg)
    mesh = meshlib.make_mesh()
    host_pipe = TrainPipeline(ds, cfg, grad_accum=2, micro_batch=8, seed=5)
    idx_pipe = TrainPipeline(ds, cfg, grad_accum=2, micro_batch=8, seed=5,
                             index_mode=True)

    from vsn_tpu.data.resident import resident_pretransform

    tfm = resident_pretransform(cfg, train=True)
    assert tfm is not None

    model = build_model(cfg)
    x0 = jnp.zeros((1, *cfg.input_size, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)
    lr, wd = lr_wd_schedules(cfg)
    step_host = jax.jit(
        make_train_step(model, cfg, lr, wd, make_batch_transform(cfg)))
    step_pre = jax.jit(make_train_step(model, cfg, lr, wd, None))
    res = build_resident(ds.all_volumes(), "float16", mesh, pretransform=tfm)
    key = jax.random.key(1)

    s_host = init_train_state(cfg, variables)
    s_pre = init_train_state(cfg, variables)
    for bh, bi in zip(host_pipe, idx_pipe):
        sh = meshlib.shard_train_batch(bh, mesh)
        si = meshlib.shard_train_batch(bi, mesh)
        s_host, m_host = step_host(s_host, sh, key)
        s_pre, m_pre = step_pre(s_pre, si, key, res)
        np.testing.assert_allclose(
            float(m_host["loss"]), float(m_pre["loss"]), rtol=2e-3)
        if int(s_host.step) >= 2:
            break


def test_train_fold_pretransformed_e2e(synth, tmp_path):
    """End-to-end minimal-pipeline fold with pre-transformed train+val
    stores (the Validator's skip-transform index path included)."""
    root, csvs = synth
    cfg = _cfg(PRELOAD_DEVICE="float16", USE_MIXUP=False, MIXUP_PROB=0.0)
    summary = train_fold(
        cfg, csv_dir=str(csvs), save_dir=str(tmp_path / "runs"),
        cache_dir=str(root / "cache_e2e_pre"),
    )
    assert summary["steps"] == 6
    assert np.isfinite(summary["history"]["train_loss"]).all()
    assert np.isfinite(summary["history"]["val_loss"]).all()
