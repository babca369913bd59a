import json

import numpy as np
import pandas as pd
import pytest

from vsn_tpu.eval.results_table import collect_rows, main as table_main
from vsn_tpu.utils.tracking import Tracker


def test_tracker_jsonl_and_summary(tmp_path):
    t = Tracker(tmp_path, "run1", config={"A": 1}, use_wandb=False)
    t.log({"loss": 1.5}, step=1)
    t.log({"loss": 1.2}, step=2)
    t.set_summary(best=1.2)
    t.finish()
    rows = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    metric_rows = [r for r in rows if r.get("kind") != "summary"]
    assert [r["loss"] for r in metric_rows] == [1.5, 1.2]
    assert metric_rows[0]["step"] == 1 and "_time" in metric_rows[0]
    # finish() mirrors the summary into the metric stream as a final row
    assert rows[-1] == {"kind": "summary", "best": 1.2}
    assert json.load(open(tmp_path / "summary.json"))["best"] == 1.2


def _metrics_json(path, checkpoint, fold, acc, splits=("val", "test_id")):
    data = {"checkpoint": f"/x/{checkpoint}.ckpt", "fold": fold,
            "use_tta": False, "model_index": 0}
    for s in splits:
        data[s] = {
            "accuracy": {"mean": acc, "lower": acc - 0.1, "upper": acc + 0.1},
            "ece": {"mean": 0.1, "lower": 0.05, "upper": 0.2},
        }
    path.write_text(json.dumps(data))


def test_results_table_dedup_and_sort(tmp_path):
    d = tmp_path / "preds"
    d.mkdir()
    _metrics_json(d / "metrics_model_a_0_best0.json", "model_a_0_best0", 0, 0.7)
    _metrics_json(d / "metrics_model_a_1_best0.json", "model_a_1_best0", 1, 0.8)
    df = collect_rows([d])
    assert len(df) == 4  # 2 checkpoints x 2 splits
    assert list(df.fold) == [0, 0, 1, 1]
    assert "accuracy_lower" in df.columns

    # newer file for same checkpoint wins
    import time

    time.sleep(0.01)
    _metrics_json(d / "metrics_model_a_0_best0.json", "model_a_0_best0", 0, 0.9)
    df2 = collect_rows([d])
    assert len(df2) == 4
    assert np.isclose(
        df2[(df2.fold == 0) & (df2.split == "val")].accuracy.iloc[0], 0.9
    )


def test_results_table_cli(tmp_path):
    d = tmp_path / "preds"
    d.mkdir()
    _metrics_json(d / "metrics_m_0_best0.json", "m_0_best0", 0, 0.7)
    out = tmp_path / "table.csv"
    table_main(["--metrics-dirs", str(d), "--output", str(out)])
    assert out.exists()
    assert len(pd.read_csv(out)) == 2
