import numpy as np
import pytest

from vsn_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    BestNTracker,
    filter_compatible,
    load_checkpoint,
    save_checkpoint,
)


def test_roundtrip(tmp_path):
    payload = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "count": np.int32(7),
    }
    meta = {"step": 7, "fold": 2}
    p = save_checkpoint(tmp_path / "x.ckpt", payload, meta)
    restored, rmeta = load_checkpoint(p)
    np.testing.assert_array_equal(restored["params"]["w"], payload["params"]["w"])
    assert rmeta == meta


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.ckpt"
    p.write_bytes(b"nope" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not a vsn_tpu checkpoint"):
        load_checkpoint(p)


def test_filter_compatible():
    target = {"a": np.zeros((2, 3)), "b": np.zeros((4,)), "c": np.zeros((5,))}
    restored = {"a": np.ones((2, 3)), "b": np.ones((9,))}  # b mismatched, c absent
    out, kept, dropped = filter_compatible(restored, target)
    assert kept == 1
    np.testing.assert_array_equal(out["a"], 1.0)
    np.testing.assert_array_equal(out["b"], 0.0)
    np.testing.assert_array_equal(out["c"], 0.0)
    assert len(dropped) == 2


def test_async_saver(tmp_path):
    saver = AsyncCheckpointSaver(max_queue=2)
    for i in range(5):
        saver.submit(tmp_path / f"c{i}.ckpt", {"v": np.full(3, i)}, {"i": i})
    saver.close()
    for i in range(5):
        payload, meta = load_checkpoint(tmp_path / f"c{i}.ckpt")
        assert meta["i"] == i
        np.testing.assert_array_equal(payload["v"], i)


def test_best_n_rotation(tmp_path):
    saver = AsyncCheckpointSaver()
    tr = BestNTracker(tmp_path, "abcd1234", 0, n=3, metric_name="loss")
    # stream of losses; best-3 should end up [0.1, 0.2, 0.3]
    for step, loss in enumerate([0.5, 0.3, 0.7, 0.2, 0.9, 0.1]):
        idx = tr.consider(loss, step)
        if idx is not None:
            tr.insert(idx, loss, step, saver,
                      {"v": np.full(1, loss)}, {"loss": loss, "step": step})
    saver.close()
    assert [round(m, 4) for m, _ in tr.entries] == [0.1, 0.2, 0.3]
    for i, expect in enumerate([0.1, 0.2, 0.3]):
        payload, meta = load_checkpoint(
            tmp_path / f"model_abcd1234_0_best{i}.ckpt"
        )
        assert np.isclose(meta["loss"], expect)
        assert np.isclose(payload["v"][0], expect)
    # exactly 3 best files on disk
    assert len(list(tmp_path.glob("model_*_best*.ckpt"))) == 3


def test_best_n_higher_better(tmp_path):
    saver = AsyncCheckpointSaver()
    tr = BestNTracker(tmp_path, "run", 1, n=2, metric_name="bacc")
    for step, v in enumerate([0.5, 0.8, 0.6, 0.9]):
        idx = tr.consider(v, step)
        if idx is not None:
            tr.insert(idx, v, step, saver, {"v": np.full(1, v)}, {"m": v})
    saver.close()
    assert [m for m, _ in tr.entries] == [0.9, 0.8]
