import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsn_tpu.config import load_config
from vsn_tpu.data import augment as A
from vsn_tpu.data.mixers import apply_cutmix, apply_mixup, build_mix_fn


def vol_batch(b=2, d=8, h=10, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, d, h, w, 1)) * 50 + 100, jnp.float32)


def test_zscore():
    x = vol_batch()
    z = A.zscore(x)
    flat = np.asarray(z).reshape(2, -1)
    np.testing.assert_allclose(flat.mean(1), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.std(1), 1.0, atol=1e-4)


def test_resize_batch():
    x = vol_batch()
    y = A.resize_batch(x, (4, 5, 4))
    assert y.shape == (2, 4, 5, 4, 1)
    # identity when shapes match
    assert A.resize_batch(x, (8, 10, 8)) is x


def test_random_flip():
    x = vol_batch()
    y = A.random_flip(x, jax.random.key(0), prob=1.0, axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[:, ::-1])
    y0 = A.random_flip(x, jax.random.key(0), prob=0.0, axis=1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x))


def test_random_affine_identity_when_zero_ranges():
    x = vol_batch()
    y = A.random_affine(x, jax.random.key(0), prob=1.0, rotate_range=0.0,
                        scale_range=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-3)


def test_random_affine_changes_volume():
    x = vol_batch()
    y = A.random_affine(x, jax.random.key(0), prob=1.0, rotate_range=0.3,
                        scale_range=0.2)
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1.0
    assert np.all(np.isfinite(np.asarray(y)))


def test_noise_transforms_finite_and_gated():
    x = vol_batch()
    key = jax.random.key(0)
    for fn in (
        lambda: A.gaussian_noise(x, key, prob=1.0),
        lambda: A.rician_noise(x, key, prob=1.0),
        lambda: A.random_bias_field(x, key, prob=1.0),
        lambda: A.random_adjust_contrast(x, key, prob=1.0),
        lambda: A.random_scale_intensity(x, key, prob=1.0),
        lambda: A.random_histogram_shift(x, key, prob=1.0),
        lambda: A.gibbs_noise(x, key, prob=1.0),
        lambda: A.kspace_spike_noise(x, key, prob=1.0),
        lambda: A.random_elastic(x, key, prob=1.0),
    ):
        y = np.asarray(fn())
        assert y.shape == x.shape
        assert np.all(np.isfinite(y))
        assert np.abs(y - np.asarray(x)).max() > 1e-4
    # prob=0 -> identity for a gated transform
    y0 = np.asarray(A.gaussian_noise(x, key, prob=0.0))
    np.testing.assert_allclose(y0, np.asarray(x))


def test_displacement_warp_zero_is_identity():
    x = vol_batch().astype(np.float32).squeeze(-1)
    disp = jnp.zeros(x.shape + (3,), jnp.float32)
    y = np.asarray(A.displacement_warp(jnp.asarray(x), disp, max_disp=3))
    np.testing.assert_allclose(y, np.asarray(x), rtol=1e-5, atol=1e-5)


def test_displacement_warp_integer_shift_matches_slice():
    """A constant +2 source offset along one axis equals an edge-clamped
    shift of the volume."""
    x = np.asarray(vol_batch().astype(np.float32).squeeze(-1))
    disp = np.zeros(x.shape + (3,), np.float32)
    disp[..., 1] = 2.0  # sample from y+2
    y = np.asarray(A.displacement_warp(jnp.asarray(x), jnp.asarray(disp), 4))
    expect = np.concatenate(
        [x[:, :, 2:, :], np.repeat(x[:, :, -1:, :], 2, axis=2)], axis=2
    )
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)


def test_displacement_warp_single_axis_matches_map_coordinates():
    """For displacement along a single axis the separable warp equals direct
    linear resampling (the reference MONAI/scipy semantics)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 10, 8)).astype(np.float32)
    disp = np.zeros((1, 8, 10, 8, 3), np.float32)
    disp[..., 2] = rng.uniform(-2.5, 2.5, (1, 8, 10, 8)).astype(np.float32)
    y = np.asarray(A.displacement_warp(jnp.asarray(x), jnp.asarray(disp), 3))

    gz, gy, gx = np.meshgrid(
        np.arange(8.0), np.arange(10.0), np.arange(8.0), indexing="ij"
    )
    coords = [gz, gy, gx + disp[0, ..., 2]]
    from scipy.ndimage import map_coordinates

    expect = map_coordinates(x[0], coords, order=1, mode="nearest")
    np.testing.assert_allclose(y[0], expect, rtol=1e-4, atol=1e-4)


def test_random_crop_resize_shapes():
    x = vol_batch()
    y = A.random_crop_resize(x, jax.random.key(0), prob=1.0, roi=(6, 8, 6),
                             out_size=(8, 10, 8))
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_build_stacks_run_under_jit():
    cfg3 = load_config().replace(
        IMG_SIZE=[8, 10, 8], RESHAPE_SIZE=False, DISEASES=["CN", "AD", "FTD"]
    )
    x = vol_batch()
    for cfg in (
        cfg3,
        cfg3.replace(USE_EXTENDED_DATA_AUGMENTATION=True),
        cfg3.replace(IS_DUNG_TRANSFORMS=True),
    ):
        fn = jax.jit(A.build_train_augment(cfg))
        y = fn(x, jax.random.key(0))
        assert y.shape[0] == 2 and y.shape[-1] == 1
        assert np.all(np.isfinite(np.asarray(y)))
    ev = jax.jit(A.build_eval_transform(cfg3))
    y = ev(x)
    assert y.shape == x.shape


# ---------------------------------------------------------------------------
# mixers
# ---------------------------------------------------------------------------

def test_apply_mixup_math():
    x1, x2 = vol_batch(seed=1), vol_batch(seed=2)
    y1 = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    y2 = jnp.array([[0, 0, 1.0], [1.0, 0, 0]])
    lam = jnp.array([0.25, 0.6])
    apply = jnp.array([True, False])
    x, y = apply_mixup(x1, x2, y1, y2, lam, apply)
    np.testing.assert_allclose(
        np.asarray(x[0]), 0.25 * np.asarray(x1[0]) + 0.75 * np.asarray(x2[0]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(x1[1]))
    np.testing.assert_allclose(np.asarray(y[0]), [0.25, 0, 0.75])
    np.testing.assert_allclose(np.asarray(y[1]), [0, 1, 0])


def test_apply_cutmix_math():
    x1 = jnp.zeros((1, 4, 4, 4, 1))
    x2 = jnp.ones((1, 4, 4, 4, 1))
    y1 = jnp.array([[1.0, 0]])
    y2 = jnp.array([[0.0, 1]])
    bounds = jnp.array([[1, 1, 1, 3, 3, 3]], jnp.int32)  # 8 of 64 voxels
    actual_lam = jnp.array([1 - 8 / 64])
    x, y = apply_cutmix(x1, x2, y1, y2, bounds, actual_lam, jnp.array([True]))
    assert float(x.sum()) == 8.0
    assert float(x[0, 2, 2, 2, 0]) == 1.0 and float(x[0, 0, 0, 0, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(y[0]), [1 - 8 / 64, 8 / 64], rtol=1e-6)


def test_build_mix_fn_exclusive():
    cfg = load_config().replace(USE_MIXUP=True, USE_CUTMIX=True)
    with pytest.raises(ValueError):
        build_mix_fn(cfg)
    assert build_mix_fn(load_config()) is None


def test_affine_warp_matmul_matches_map_coordinates():
    """The gather-free (LU shear-pass matmul) warp must agree with the
    map_coordinates oracle in the interior; identity and integer translation
    are exact."""
    import functools

    from vsn_tpu.data.augment import affine_warp, affine_warp_matmul

    B, D, H, W = 2, 20, 24, 20
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, D), np.linspace(-1, 1, H), np.linspace(-1, 1, W),
        indexing="ij",
    )
    vol = np.exp(-(zz**2 + yy**2 + xx**2) / 0.3) + 0.3 * np.sin(3 * zz)
    vols = jnp.asarray(np.stack([vol, vol * 0.7 + 0.1]), jnp.float32)

    rng = np.random.default_rng(0)
    angles = jnp.asarray(rng.uniform(-0.06, 0.06, (B, 3)), jnp.float32)
    scales = jnp.asarray(1 + rng.uniform(-0.05, 0.05, (B, 3)), jnp.float32)
    trans = jnp.asarray(rng.uniform(-3, 3, (B, 3)), jnp.float32)

    ref = jax.vmap(functools.partial(affine_warp, mode="zeros"))(
        vols, angles, scales, trans
    )
    got = affine_warp_matmul(vols, angles, scales, trans, mode="zeros")
    err = np.abs(np.asarray(got) - np.asarray(ref))[:, 3:-3, 3:-3, 3:-3]
    assert err.max() < 0.05, err.max()

    ident = affine_warp_matmul(
        vols, jnp.zeros((B, 3)), jnp.ones((B, 3)), jnp.zeros((B, 3))
    )
    np.testing.assert_allclose(np.asarray(ident), np.asarray(vols), atol=1e-5)

    tr = jnp.asarray([[2.0, -3.0, 1.0]] * B, jnp.float32)
    got_t = affine_warp_matmul(vols, jnp.zeros((B, 3)), jnp.ones((B, 3)), tr)
    ref_t = jax.vmap(functools.partial(affine_warp, mode="zeros"))(
        vols, jnp.zeros((B, 3)), jnp.ones((B, 3)), tr
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t), atol=1e-5)


def test_separable_warp_close_to_joint_trilinear():
    """Bound the documented deviation: the separable per-axis warp must stay
    close to joint trilinear resampling (scipy map_coordinates) on the
    smooth, small-amplitude fields random_elastic draws."""
    from scipy.ndimage import map_coordinates

    from vsn_tpu.data.augment import displacement_warp

    rng = np.random.default_rng(0)
    d, h, w = 24, 24, 24
    zz, yy, xx = np.meshgrid(
        np.linspace(0, 2 * np.pi, d), np.linspace(0, 2 * np.pi, h),
        np.linspace(0, 2 * np.pi, w), indexing="ij",
    )
    vol = (np.sin(zz) * np.cos(2 * yy) + np.cos(xx + yy)).astype(np.float32)

    # smooth random displacement, ~1.5 voxel amplitude (elastic regime)
    def smooth_field():
        f = rng.standard_normal((6, 6, 6))
        from scipy.ndimage import zoom

        return 1.5 * zoom(f, (d / 6, h / 6, w / 6), order=3).astype(
            np.float32
        ) / np.abs(f).max()

    disp = np.stack([smooth_field() for _ in range(3)], axis=-1)

    ours = np.asarray(
        displacement_warp(
            jnp.asarray(vol[None]), jnp.asarray(disp[None]), max_disp=3
        )
    )[0]

    grid = np.stack(
        np.meshgrid(np.arange(d), np.arange(h), np.arange(w), indexing="ij")
    ).astype(np.float32)
    coords = grid + np.moveaxis(disp, -1, 0)
    joint = map_coordinates(vol, coords, order=1, mode="nearest")

    err = np.abs(ours - joint)
    vol_range = vol.max() - vol.min()
    warp_delta = np.abs(joint - vol)
    # separable-vs-joint error is a small fraction of the warp's own effect
    assert err.mean() < 0.03 * vol_range
    assert err.mean() < 0.25 * warp_delta.mean()
    assert np.corrcoef(ours.ravel(), joint.ravel())[0, 1] > 0.995
