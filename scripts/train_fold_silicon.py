"""One production-recipe fold end-to-end through ``train_fold`` on the TPU.

VERDICT r4 missing #3: the 56.1 vol/s headline comes from bench.py's
bespoke loop; ``train_fold`` (vsn_tpu/train/trainer.py — the equivalent of
reference train/train_transformer.py:937-1504 with
config-defaults.yaml:117-215's recipe) had only ever run at toy geometry on
the CPU mesh. This runs the REAL trainer at the flagship configuration:

  Swin-T 5c, 144x168x144, micro 32 / effective 128, SAM + EMA + MixUp +
  ShakeDrop + label smoothing + balanced sampler, 2,500 steps, validation
  every 5 with EMA applied, best-10 checkpoint rotation, early-stop
  patience 300 — on a synthetic 320-subject cohort at production geometry
  (written as NIfTI, preprocessed through the real cache, device-resident
  float16).

Tunnel-environment knobs (documented in trainer.py): the queue launches
this with VSN_CKPT_LAST_EVERY=100 and VSN_BESTN_EVAL_ONLY=1 — the
reference saves full state to LOCAL disk every validation; through this
host's ~4 MB/s device->host tunnel that alone would dominate the fold.
The first 'last' save is still a FULL state fetch, so the per-event cost
is measured and reported either way.

Output: artifacts/fold_silicon_summary.json (+ the run's metrics.jsonl
copied to artifacts/fold_silicon_metrics.jsonl) with the overhead
decomposition vs the bench.py ideal.

Usage (detached; ~2.5 h):
    setsid nohup env VSN_CKPT_LAST_EVERY=100 VSN_BESTN_EVAL_ONLY=1 \
        timeout 14400 python scripts/train_fold_silicon.py \
        > /tmp/fold_silicon.log 2>&1 &
"""

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORK = Path(os.environ.get("VSN_FOLD_WORK", "/tmp/fold_silicon"))
N_SUBJECTS = int(os.environ.get("VSN_FOLD_SUBJECTS", 320))
STEPS = int(os.environ.get("VSN_FOLD_STEPS", 2500))
REPO = Path(__file__).resolve().parent.parent


def main():
    from vsn_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    small = "--small" in sys.argv  # CPU smoke mode
    shape = (32, 32, 32) if small else (144, 168, 144)
    n_sub = 30 if small else N_SUBJECTS
    t0 = time.time()

    # ---- 1. synthetic cohort at production geometry (host, cached) -----
    from vsn_tpu.data.synthetic import generate_synthetic_dataset

    diseases = ["CN", "AD", "PNFA", "BV", "SD"]
    marker = WORK / f"cohort_{n_sub}_{shape[0]}.ok"
    if not marker.exists():
        if WORK.exists():
            shutil.rmtree(WORK)
        print(f"generating {n_sub}-subject cohort at {shape}...", flush=True)
        generate_synthetic_dataset(
            WORK / "id", n_subjects=n_sub, shape=shape,
            diseases=diseases, kfold=10, seed=11,
        )
        marker.touch()
    t_gen = time.time() - t0
    print(f"cohort ready ({t_gen:.0f}s)", flush=True)

    # ---- 2. config: the bench.py north-star recipe through the trainer -
    from vsn_tpu.config import load_config

    overrides = dict(
        USE_SAM=True, USE_EMA=True, USE_MIXUP=True, MIXUP_PROB=0.5,
        USE_SHAKEDROP=True, LABEL_SMOOTHING=0.1, SEED=0,
        USE_BALANCED_SAMPLER=True,
        BATCH_SIZE=32, EFFECTIVE_BATCH_SIZE=128, EVAL_BATCH_SIZE=64,
        STEPS=STEPS, DISEASES=diseases,
        PRELOAD_DATA=True, PRELOAD_DEVICE="float16",
    )
    if small:
        overrides.update(
            IMG_SIZE=list(shape), BATCH_SIZE=2, EFFECTIVE_BATCH_SIZE=16,
            EVAL_BATCH_SIZE=8, STEPS=12, VALIDATION_FREQUENCY=4,
            EMBED_DIM=24, DEPTH=[1, 1], HEADS=[2, 4],
            WINDOW_SIZE=[4, 4, 4], LR_WARMUP=2, WD_WARMUP=2,
            EARLY_STOPPING_PATIENCE=False,
        )
    # VSN_FOLD_STABLE=1: the DSLM arm (reference utils/stable_init.py)
    # through the SAME fold — pairs against the baseline run's
    # attn_logit_max trajectory at production trainer scale.
    from vsn_tpu.utils.flags import env_flag

    stable = env_flag("VSN_FOLD_STABLE") is True  # '0'/'off' really mean off
    run_id = "silicon_stable" if stable else "silicon"
    if stable:
        overrides.update(ENABLE_STABLE=True)
    cfg = load_config("vsn_tpu/configs/swin-5c-no_seed-baseline.yaml",
                      extra_overrides=overrides)

    # ---- 3. the real trainer ------------------------------------------
    from vsn_tpu.train.trainer import train_fold

    t1 = time.time()
    result = train_fold(
        cfg,
        csv_dir=str(WORK / "id" / "folds"),
        save_dir=str(WORK / "runs"),
        cache_dir=str(WORK / "cache"),
        run_id=run_id,
    )
    t_train = time.time() - t1

    # ---- 3b. best-N -> TTA-eval -> ensemble -> calibration chain -------
    # (VERDICT r4 #3 second half: the resulting checkpoints through the
    # real L6 pipeline on chip; reference eval_transformer.py +
    # calibrate_predictions.py protocol, as composed by train_eval.sh /
    # protocol_rehearsal.sh.)
    import subprocess

    t2 = time.time()
    eval_times = {}
    # [0-9] pins the fold segment: a bare '*' after run_id 'silicon' would
    # also match the stable arm's 'model_silicon_stable_0_best*.ckpt'.
    best_ckpts = [] if stable else sorted(
        str(p)
        for p in (WORK / "runs").glob(f"model_{run_id}_[0-9]*_best*.ckpt"))
    if best_ckpts:
        pred_dir = WORK / "runs" / "predictions"
        # PREPEND to PYTHONPATH — replacing it drops /root/.axon_site
        # (the sitecustomize that registers the axon TPU backend), which
        # kills the child with "Unable to initialize backend 'axon'".
        env = dict(os.environ, PYTHONPATH=":".join(
            p for p in (str(REPO), os.environ.get("PYTHONPATH", "")) if p))
        tta_flag = [] if small else ["--use-tta"]
        t = time.time()
        subprocess.run(
            [sys.executable, "-m", "vsn_tpu.eval.evaluate",
             "--checkpoints", *best_ckpts,
             "--training-csv-dir", str(WORK / "id" / "folds"),
             "--intermediate-dir", str(WORK / "cache"),
             "--output-dir", str(pred_dir), *tta_flag],
            check=True, env=env, cwd=str(REPO),
        )
        eval_times["tta_eval_s"] = round(time.time() - t, 1)
        for mod, args in (
            ("vsn_tpu.viz.ensemble",
             ["--run", f"swin={pred_dir}", "--output-dir",
              str(WORK / "viz"), "--num-bootstrap", "200"]),
            ("vsn_tpu.eval.calibrate_predictions",
             ["--model-dir", str(pred_dir), "--output-dir",
              str(WORK / "calibrated"), "--val-fold", "all",
              "--method", "temperature"]),
            ("vsn_tpu.eval.results_table",
             ["--metrics-dirs", str(pred_dir), "--output",
              str(WORK / "results_table.csv")]),
        ):
            t = time.time()
            subprocess.run([sys.executable, "-m", mod, *args],
                           check=True, env=env, cwd=str(REPO))
            eval_times[mod.rsplit(".", 1)[-1] + "_s"] = round(
                time.time() - t, 1)
    t_eval_chain = time.time() - t2

    # ---- 4. decomposition vs the bench ideal --------------------------
    hist = result["history"]
    steps_done = result["steps"]
    eff_batch = int(cfg.EFFECTIVE_BATCH_SIZE)
    vols = steps_done * eff_batch
    val_wall = float(np.sum(hist.get("val_wall_s", [])))
    ckpt_wall = float(np.sum(hist.get("ckpt_wall_s", [])))
    summary = {
        "steps": steps_done,
        "stopped_early": result["stopped_early"],
        "wall_total_s": round(time.time() - t0, 1),
        "wall_train_fold_s": round(t_train, 1),
        "wall_cohort_gen_s": round(t_gen, 1),
        "effective_vol_per_s": round(vols / t_train, 2),
        "val_events": len(hist.get("val_wall_s", [])),
        "val_wall_s_total": round(val_wall, 1),
        "ckpt_events": len(hist.get("ckpt_wall_s", [])),
        "ckpt_wall_s_total": round(ckpt_wall, 1),
        "ckpt_wall_s_each": [round(float(v), 1)
                             for v in hist.get("ckpt_wall_s", [])][:20],
        "best": result["best"],
        "val_bacc_last": hist.get("val_bacc", [None])[-1],
        "val_loss_last": hist.get("val_loss", [None])[-1],
        "eval_chain_wall_s": round(t_eval_chain, 1),
        "eval_chain_times": eval_times,
        "eval_chain_ckpts": len(best_ckpts),
        "n_params": result["n_params"],
        "knobs": {
            "VSN_CKPT_LAST_EVERY": os.environ.get("VSN_CKPT_LAST_EVERY"),
            "VSN_BESTN_EVAL_ONLY": os.environ.get("VSN_BESTN_EVAL_ONLY"),
        },
        "config": {k: overrides[k] for k in sorted(overrides)},
    }
    arm = "_stable" if stable else ""
    if small:
        arm += "_smoke"  # never clobber the committed silicon artifacts
    out = REPO / "artifacts" / f"fold_silicon{arm}_summary.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(summary, indent=1, default=str))
    metrics_src = Path(result["run_dir"]) / "metrics.jsonl"
    if metrics_src.exists() and not small:
        shutil.copy(metrics_src,
                    REPO / "artifacts" / f"fold_silicon{arm}_metrics.jsonl")
    print(json.dumps(summary, default=str), flush=True)
    print("FOLD SILICON OK", flush=True)


if __name__ == "__main__":
    main()
