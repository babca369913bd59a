import numpy as np
import pandas as pd
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.data.folds import get_train_val_test
from vsn_tpu.data.pipeline import EvalPipeline, InMemoryDataset, TrainPipeline, prefetch
from vsn_tpu.data.preprocessing import DataPrepa, center_crop
from vsn_tpu.data.sampler import (
    compute_class_weights,
    compute_sample_weights,
    weighted_epoch_indices,
)
from vsn_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    raw_dir, csv_dir = generate_synthetic_dataset(
        root, n_subjects=30, shape=(20, 24, 20), diseases=("CN", "AD", "FTD"),
        kfold=10, seed=0,
    )
    return root, raw_dir, csv_dir


def test_synthetic_layout(synth):
    root, raw_dir, csv_dir = synth
    assert len(list(raw_dir.glob("*_T1.nii.gz"))) == 30
    assert len(list(csv_dir.glob("fold_*.csv"))) == 10
    tr, va, te, al = get_train_val_test(str(csv_dir), fold=0, kfold=10)
    assert len(al) == 30
    assert {"Subject", "Diagnosis", "T1_path", "Mask_path"} <= set(al.columns)


def test_center_crop():
    vol = np.arange(4 * 6 * 8).reshape(4, 6, 8)
    out = center_crop(vol, (2, 2, 2))
    assert out.shape == (2, 2, 2)
    np.testing.assert_array_equal(out, vol[1:3, 2:4, 3:5])
    # axis smaller than roi is untouched
    assert center_crop(vol, (10, 2, 2)).shape == (4, 2, 2)


def test_preprocessing_cache_incremental(synth, tmp_path):
    root, raw_dir, csv_dir = synth
    meta = pd.concat([pd.read_csv(p) for p in csv_dir.glob("fold_*.csv")])
    cache = tmp_path / "cache"
    prep = DataPrepa(meta, cache)
    n = prep.preprocess_data(crop=(16, 20, 16), n_jobs=2)
    assert n == 30
    files = list(cache.glob("*.npy"))
    assert len(files) == 30
    arr = np.load(files[0])
    assert arr.shape == (16, 20, 16, 1) and arr.dtype == np.float16
    # idempotent second run
    assert prep.preprocess_data(crop=(16, 20, 16)) == 0
    # stray GC + incremental add
    np.save(cache / "ghost.npy", arr)
    sub = meta.iloc[:10]
    prep2 = DataPrepa(sub, cache)
    assert prep2.preprocess_data(crop=(16, 20, 16)) == 0
    assert not (cache / "ghost.npy").exists()
    assert len(list(cache.glob("*.npy"))) == 10


def test_preprocessing_masks_applied(synth, tmp_path):
    root, raw_dir, csv_dir = synth
    meta = pd.read_csv(csv_dir / "fold_0.csv").iloc[:1]
    cache = tmp_path / "c2"
    DataPrepa(meta, cache).preprocess_data(crop=(20, 24, 20))
    arr = np.load(cache / f"{meta.Subject.iloc[0]}.npy")
    # corners are outside the ellipsoid mask -> exactly zero
    assert arr[0, 0, 0, 0] == 0.0
    assert np.abs(arr).max() > 0


def test_class_weights_and_sampler():
    labels = ["CN"] * 60 + ["AD"] * 30 + ["FTD"] * 10
    w = compute_class_weights(labels, ["CN", "AD", "FTD"])
    assert w["CN"] == 1.0 and np.isclose(w["AD"], 2.0) and np.isclose(w["FTD"], 6.0)
    sw = compute_sample_weights(labels, ["CN", "AD", "FTD"])
    assert sw.shape == (100,)
    rng = np.random.default_rng(0)
    idx = weighted_epoch_indices(sw, 100_000, rng)
    drawn = np.asarray(labels)[idx]
    frac = {c: float((drawn == c).mean()) for c in ("CN", "AD", "FTD")}
    # balanced draw -> roughly uniform class frequencies
    for c, f in frac.items():
        assert abs(f - 1 / 3) < 0.02, (c, frac)
    with pytest.raises(ValueError):
        compute_class_weights(["CN"], ["CN", "AD"])


@pytest.fixture(scope="module")
def cached_ds(synth, tmp_path_factory):
    root, raw_dir, csv_dir = synth
    cache = tmp_path_factory.mktemp("cache")
    meta = pd.concat(
        [pd.read_csv(p) for p in sorted(csv_dir.glob("fold_*.csv"))]
    ).reset_index(drop=True)
    DataPrepa(meta, cache).preprocess_data(crop=(16, 20, 16))
    return InMemoryDataset(cache, meta, ["CN", "AD", "FTD"], preload=True)


def test_in_memory_dataset(cached_ds):
    ds = cached_ds
    assert len(ds) == 30
    assert ds.spatial_shape == (16, 20, 16)
    assert ds.labels.shape == (30, 3)
    np.testing.assert_allclose(ds.labels.sum(1), 1.0)
    g = ds.gather(np.array([0, 5, 7]))
    assert g.shape == (3, 16, 20, 16, 1) and g.dtype == np.float16


def test_train_pipeline_batches(cached_ds):
    cfg = load_config().replace(DISEASES=["CN", "AD", "FTD"])
    pipe = TrainPipeline(cached_ds, cfg, grad_accum=2, micro_batch=4, seed=11)
    b = next(pipe)
    assert b["image"].shape == (2, 4, 16, 20, 16, 1)
    assert b["label"].shape == (2, 4, 3)
    assert "image2" not in b
    # epoch rollover works and reshuffles (f64 sum: f16 overflows)
    seen = [next(pipe)["image"].sum(dtype=np.float64) for _ in range(10)]
    assert len(set(float(s) for s in seen)) > 1


def test_train_pipeline_deterministic_with_seed(cached_ds):
    cfg = load_config().replace(DISEASES=["CN", "AD", "FTD"], USE_MIXUP=True)
    p1 = TrainPipeline(cached_ds, cfg, 2, 4, seed=7)
    p2 = TrainPipeline(cached_ds, cfg, 2, 4, seed=7)
    b1, b2 = next(p1), next(p2)
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])


def test_train_pipeline_mixup_fields(cached_ds):
    cfg = load_config().replace(
        DISEASES=["CN", "AD", "FTD"], USE_MIXUP=True, MIXUP_PROB=1.0,
        MIXUP_ALPHA=0.3,
    )
    pipe = TrainPipeline(cached_ds, cfg, 2, 4, seed=3)
    b = next(pipe)
    assert b["image2"].shape == b["image"].shape
    assert b["mix_apply"].all()
    # partner always from a different class
    assert not np.any(
        (b["label"].argmax(-1) == b["label2"].argmax(-1)) & b["mix_apply"]
    )
    assert np.all((b["mix_lam"] >= 0) & (b["mix_lam"] <= 1))


def test_train_pipeline_cutmix_fields(cached_ds):
    cfg = load_config().replace(
        DISEASES=["CN", "AD", "FTD"], USE_CUTMIX=True, CUTMIX_PROB=1.0,
    )
    pipe = TrainPipeline(cached_ds, cfg, 1, 4, seed=3)
    b = next(pipe)
    bounds = b["mix_bounds"].reshape(-1, 6)
    assert np.all(bounds[:, :3] <= bounds[:, 3:])
    assert np.all(bounds[:, 3] <= 16) and np.all(bounds[:, 4] <= 20)
    # actual lam equals 1 - cuboid/total volume
    vol = np.prod(np.maximum(bounds[:, 3:] - bounds[:, :3], 0), axis=1)
    expected = 1 - vol / (16 * 20 * 16)
    np.testing.assert_allclose(b["mix_lam"].reshape(-1), expected, rtol=1e-5)


def test_eval_pipeline_padding(cached_ds):
    pipe = EvalPipeline(cached_ds, batch_size=8)
    batches = list(pipe)
    assert len(batches) == 4  # 30 samples / 8
    imgs, labels, valid = batches[-1]
    assert imgs.shape[0] == 8
    assert valid.sum() == 30 - 24
    total_valid = sum(v.sum() for _, _, v in batches)
    assert total_valid == 30


def test_prefetch_order_and_errors():
    out = list(prefetch(iter(range(10)), size=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("boom")

    g = prefetch(boom(), size=2)
    assert next(g) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(g)
