import numpy as np
import pandas as pd
import pytest

from vsn_tpu.data.folds import get_train_val_test, load_metadata


@pytest.fixture
def fold_dir(tmp_path):
    rng = np.random.default_rng(0)
    diseases = ["CN", "AD", "PNFA", "BV", "SD"]
    sid = 0
    for k in range(10):
        n = 5
        df = pd.DataFrame(
            {
                "Subject": [f"sub-{sid + i:04d}" for i in range(n)],
                "Diagnosis": rng.choice(diseases, n),
                "Dataset": ["ADNI"] * n,
            }
        )
        sid += n
        df.to_csv(tmp_path / f"fold_{k}.csv", index=False)
    return tmp_path


def test_rotating_split(fold_dir):
    tr, va, te, al = get_train_val_test(str(fold_dir), fold=0, kfold=10)
    assert len(tr) == 35 and len(va) == 10 and len(te) == 5 and len(al) == 50
    # fold=3 rotates: train folds 3..9, val 0..1, test 2
    tr3, va3, te3, _ = get_train_val_test(str(fold_dir), fold=3, kfold=10)
    f2 = pd.read_csv(fold_dir / "fold_2.csv")
    assert sorted(te3.Subject) == sorted(f2.Subject)


def test_no_overlap_and_coverage(fold_dir):
    for fold in range(10):
        tr, va, te, al = get_train_val_test(str(fold_dir), fold=fold, kfold=10)
        subj = set(tr.Subject) | set(va.Subject) | set(te.Subject)
        assert len(subj) == 50
        assert not (set(tr.Subject) & set(va.Subject))
        assert not (set(tr.Subject) & set(te.Subject))
        assert not (set(va.Subject) & set(te.Subject))


def test_invariants(fold_dir):
    with pytest.raises(ValueError):
        get_train_val_test(str(fold_dir), fold=0, kfold=10, split=(7, 2, 2))
    with pytest.raises(ValueError):
        get_train_val_test(str(fold_dir), fold=10, kfold=10)
    with pytest.raises(ValueError):
        get_train_val_test(str(fold_dir), fold=0, kfold=2, split=(1, 1, 0))


def test_load_metadata_filter(fold_dir):
    df = load_metadata(str(fold_dir / "fold_0.csv"), accept_datasets=["ADNI"])
    assert len(df) == 5
    df2 = load_metadata(str(fold_dir / "fold_0.csv"), accept_datasets=["NACC"])
    assert len(df2) == 0
    df3 = load_metadata([str(fold_dir / "fold_0.csv"), str(fold_dir / "fold_1.csv")])
    assert len(df3) == 10
