import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest
from scipy.special import softmax

from vsn_tpu.ops.box_coder import PatchCenterOffset, PointWHD, patch_anchors
from vsn_tpu.viz.compare import compare_architectures, load_architecture


def test_patch_anchors():
    a = patch_anchors((2, 2, 2))
    assert a.shape == (8, 3)
    np.testing.assert_allclose(a[0], [0.25, 0.25, 0.25])
    np.testing.assert_allclose(a[-1], [0.75, 0.75, 0.75])
    # row-major (d, h, w): second anchor advances the last axis
    np.testing.assert_allclose(a[1], [0.25, 0.25, 0.75])


def test_pointwhd_decode():
    coder = PointWHD((32, 32, 32), (4, 4, 4), weights=(2.0, 2.0, 2.0),
                     tanh=True)
    logits = jnp.zeros((2, 64, 3))
    centers = coder(logits)
    np.testing.assert_allclose(np.asarray(centers[0]),
                               patch_anchors((4, 4, 4)), rtol=1e-6)
    # large logits saturate at +- one patch pitch, clamped to [0, 1]
    big = jnp.full((1, 64, 3), 100.0)
    c = np.asarray(coder.decode(big))
    assert c.max() <= 1.0
    np.testing.assert_allclose(
        c[0, 0], patch_anchors((4, 4, 4))[0] + 0.25, rtol=1e-5
    )
    offs = coder.get_offsets(coder.decode(big))
    assert np.isclose(float(offs[0, 0, 0]), 0.25 * 32, rtol=1e-4)


def test_patch_center_offset_boxes_and_grid():
    coder = PatchCenterOffset((32, 32, 32), (4, 4, 4), pts=(2, 2, 2))
    logits = jnp.zeros((1, 64, 3))
    boxes = coder.decode(logits)
    assert boxes.shape == (1, 64, 6)
    widths = np.asarray(boxes[..., 3:] - boxes[..., :3])
    np.testing.assert_allclose(widths, 0.25, rtol=1e-6)
    grid = coder(logits)
    assert grid.shape == (1, 64, 2, 2, 2, 3)
    # corners of the first patch box
    np.testing.assert_allclose(np.asarray(grid[0, 0, 0, 0, 0]),
                               [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(grid[0, 0, 1, 1, 1]),
                               [0.25, 0.25, 0.25], atol=1e-6)
    scales = coder.get_scales(boxes)
    np.testing.assert_allclose(np.asarray(scales), 8.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# compare_architectures driver
# ---------------------------------------------------------------------------

def _write_preds(d, run, fold, seed, quality):
    rng = np.random.default_rng(seed)
    n, k = 30, 3
    classes = ["CN", "AD", "FTD"]
    gt = rng.integers(0, k, n)
    logits = rng.standard_normal((n, k)) + quality * np.eye(k)[gt]
    probs = softmax(logits, axis=1)
    df = pd.DataFrame({
        "Subject": [f"sub-{fold:02d}{i:03d}" for i in range(n)],
        "Diagnosis": [classes[g] for g in gt],
    })
    for i, c in enumerate(classes):
        df[f"pred_{c}"] = probs[:, i]
    df.to_csv(d / f"prediction_model_{run}_{fold}_best0_id.csv", index=False)


@pytest.fixture
def arch_dirs(tmp_path):
    dirs = {}
    for arch, quality in (("swin", 3.0), ("vit", 0.5)):
        d = tmp_path / arch
        d.mkdir()
        for fold in range(4):
            _write_preds(d, arch, fold, seed=fold, quality=quality)
        dirs[arch] = str(d)
    return dirs


def test_compare_architectures(arch_dirs):
    # NOTE: subjects differ across folds but match across architectures
    res = compare_architectures(arch_dirs, n_bootstrap=50)
    rank = res["ranking"]
    assert rank.iloc[0]["architecture"] == "swin"  # the strong model wins
    mc = res["mcnemar"].iloc[0]
    assert mc["winner"] in ("A", "B")
    winner_name = mc["A"] if mc["winner"] == "A" else mc["B"]
    assert winner_name == "swin"
    pfo = res["pfo"].iloc[0]
    a_is_swin = pfo["A"] == "swin"
    assert (pfo["pfo_A_over_B"] < 0.05) == a_is_swin or (
        pfo["pfo_B_over_A"] < 0.05
    ) != a_is_swin
    assert len(res["wilcoxon"]) == 1


def test_load_architecture(arch_dirs):
    a = load_architecture(arch_dirs["swin"])
    assert len(a["folds"]) == 4
    assert len(a["pooled"]) == 120
    assert a["probs"].shape == (120, 3)
