"""Evaluation driver: checkpoints -> predictions CSVs + bootstrap metrics.

Functional parity with reference eval/eval_transformer.py: per checkpoint,
rebuild the model from its stored config, load weights, evaluate the fold's
validation and test (in-domain) splits plus an optional out-of-domain CSV,
with plain or TTA inference; compute bootstrap CIs; write
``prediction_{checkpoint_stem}_{id,od}.csv`` with per-class ``pred_{disease}``
columns (eval_transformer.py:457-467, 619-620, 731-773) and a metrics JSON;
skip work when prediction CSVs already exist (622-632).

Simplifications vs the reference: run configs are read from the checkpoint
meta (stored by the trainer) instead of recovered from W&B run dirs via
filename regexes; metrics go to JSON files instead of W&B artifact tables.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from vsn_tpu.config import Config
from vsn_tpu.data.augment import build_eval_transform
from vsn_tpu.data.folds import get_train_val_test, load_metadata
from vsn_tpu.data.pipeline import EvalPipeline, InMemoryDataset
from vsn_tpu.data.preprocessing import DataPrepa
from vsn_tpu.data.resident import build_resident, gather_volumes
from vsn_tpu.eval.bootstrap import compute_bootstrap_metrics
from vsn_tpu.eval.tta import make_tta_predictor
from vsn_tpu.models import build_model
from vsn_tpu.parallel import mesh as meshlib
from vsn_tpu.train import checkpoint as ckpt
from vsn_tpu.train.step import make_eval_step

log = logging.getLogger("vsn_tpu.eval")


def filter_synthetic(metadata: pd.DataFrame) -> pd.DataFrame:
    """Drop synthetic/augmented subjects (names containing 'factor') from
    eval cohorts unless USE_SYNTHETIC_DATA — reference
    eval_transformer.py:471-475, applied at 659-661."""
    if "Subject" not in metadata.columns:
        return metadata
    mask = ~metadata["Subject"].astype(str).str.lower().str.contains("factor")
    return metadata.loc[mask].reset_index(drop=True)


def remove_duplicates(metadata: pd.DataFrame) -> pd.DataFrame:
    """Dedup eval cohorts by Subject (reference eval_transformer.py:478-496)."""
    if metadata.empty or "Subject" not in metadata.columns:
        return metadata
    return metadata.drop_duplicates(subset=["Subject"]).reset_index(drop=True)


def load_model_from_checkpoint(path):
    """Returns (cfg, model, variables, meta)."""
    payload, meta = ckpt.load_checkpoint(path)
    if "config" not in meta:
        raise ValueError(f"{path}: checkpoint meta carries no config")
    cfg = Config(meta["config"])
    model = build_model(cfg)
    if "variables" in payload:
        variables = payload["variables"]
    else:  # 'last' checkpoints carry the raw train state
        st = payload["state"]
        variables = {"params": st["params"], **st["model_state"]}
    return cfg, model, variables, meta


class Evaluator:
    """Batched (optionally TTA) inference over a dataset."""

    def __init__(self, cfg, model, use_tta: bool = False, batch_size=None,
                 mesh=None, tta_kwargs=None, seed: int = 0,
                 resident_pretransformed: bool = False):
        self.cfg = cfg
        self.mesh = mesh or meshlib.make_mesh()
        self.batch_size = meshlib.pad_batch_to_multiple(
            int(batch_size or cfg.get("EVAL_BATCH_SIZE", 0)
                or cfg.BATCH_SIZE),
            self.mesh.size,
        )
        if use_tta and batch_size is None:
            # TTA expands each volume into 8 views, so the underlying
            # batch is NOT the eval knee: batch 8 already yields the 64
            # effective rows where plain eval saturates, throughput is
            # FLAT in batch (32.5/32.2/32.4 vol/s at 8/16/32 — BASELINE
            # round-5 sweep), and EVAL_BATCH_SIZE=64 fails to compile at
            # production geometry (512 full-size views, 21.9G > 15.75G
            # HBM). Cap unless --batch-size is explicit.
            self.batch_size = min(
                self.batch_size,
                meshlib.pad_batch_to_multiple(
                    int(os.environ.get("VSN_TTA_BATCH", "8") or 8),
                    self.mesh.size,
                ),
            )
        transform = build_eval_transform(cfg)
        self.use_tta = use_tta
        self.rng = jax.random.key(seed)
        # A pre-transformed store (resident_pretransform) already holds
        # resize+z-scored volumes. TTA is incompatible: views warp BEFORE
        # normalizing, so the TTA store must stay raw.
        if resident_pretransformed and use_tta:
            raise ValueError("TTA requires a raw resident store "
                             "(views warp before normalize)")
        if use_tta:
            predict, self.n_views = make_tta_predictor(
                model, eval_transform=transform, **(tta_kwargs or {})
            )
            self._run = jax.jit(predict)
            self._run_idx = jax.jit(
                lambda variables, idx, res, rng: predict(
                    variables, gather_volumes(res, idx), rng
                )
            )
        else:
            eval_step = make_eval_step(model)
            idx_tfm = ((lambda x: x) if resident_pretransformed
                       else transform)
            self._run = jax.jit(
                lambda variables, images: eval_step(variables, transform(images))
            )
            self._run_idx = jax.jit(
                lambda variables, idx, res: eval_step(
                    variables, idx_tfm(gather_volumes(res, idx))
                )
            )

    def predict_dataset(self, variables, dataset, resident=None):
        """Returns (probs [N, K], gt_onehot [N, K]).

        ``resident`` is an optional ResidentVolumes store for the dataset
        (PRELOAD_DEVICE): batches then ship int32 indices only, so repeated
        evaluation (best-N checkpoints, TTA views) never re-crosses the
        host->device boundary.
        """
        # Clamp to the cohort so small datasets don't pay for pad rows.
        bs = meshlib.pad_batch_to_multiple(
            max(1, min(self.batch_size, len(dataset))), self.mesh.size
        )
        pipeline = EvalPipeline(dataset, bs)
        probs_all, gt_all = [], []
        # One-batch-deep software pipeline (same as train.trainer.Validator):
        # dispatch batch i, then drain batch i-1's device->host transfer
        # while the device computes i.
        pending = None
        for i, (images, labels, valid, idx) in enumerate(
            pipeline.iter_with_indices(load_images=resident is None)
        ):
            step_rng = jax.random.fold_in(self.rng, i)
            if resident is not None:
                idx = meshlib.shard_eval_batch(
                    jnp.asarray(idx, jnp.int32), self.mesh
                )
                if self.use_tta:
                    dev = self._run_idx(variables, idx, resident, step_rng)
                else:
                    dev = self._run_idx(variables, idx, resident)
            else:
                images = meshlib.shard_eval_batch(
                    jnp.asarray(images), self.mesh
                )
                if self.use_tta:
                    dev = self._run(variables, images, step_rng)
                else:
                    dev = self._run(variables, images)
            if pending is not None:
                probs_all.append(np.asarray(pending[0])[pending[1]])
                gt_all.append(pending[2])
            pending = (dev, valid, labels[valid])
        if pending is not None:
            probs_all.append(np.asarray(pending[0])[pending[1]])
            gt_all.append(pending[2])
        return np.concatenate(probs_all), np.concatenate(gt_all)


def attach_predictions(metadata: pd.DataFrame, probs: np.ndarray, diseases):
    """metadata + pred_{disease} columns (reference 457-467)."""
    df = metadata.reset_index(drop=True).copy()
    for i, d in enumerate(diseases):
        df[f"pred_{d}"] = probs[:, i]
    return df


def _bootstrap_summary(probs, gt_onehot, n_bootstrap, seed=42):
    gt = gt_onehot.argmax(1)
    results = compute_bootstrap_metrics(
        gt, probs, n_bootstrap=n_bootstrap, random_state=seed, keep_samples=False
    )

    def strip(node):
        if isinstance(node, dict) and "mean" in node:
            return {k: v for k, v in node.items() if k != "samples"}
        if isinstance(node, dict):
            return {str(k): strip(v) for k, v in node.items()}
        return node

    return strip(results)


def _resident_for(ds, cfg, cache: dict | None, mesh=None, pretransform=None):
    """Dataset's HBM-resident store (PRELOAD_DEVICE), memoized across
    checkpoints via ``cache`` so the best-N eval matrix uploads each cohort
    once. The Evaluator's mesh is threaded through so the store is
    explicitly replicated once (matching trainer.train_fold) instead of
    being resharded per jitted call on multi-device meshes.

    ``pretransform`` bakes the deterministic resize+z-score into the store
    (non-TTA eval only; part of the memo key, so a process evaluating both
    plain and TTA checkpoints holds one raw and one transformed store —
    mind HBM on very large cohorts)."""
    mode = cfg.get("PRELOAD_DEVICE", False)
    if not mode:
        return None
    key = (str(ds.cache_dir), tuple(ds.subjects), str(mode),
           pretransform is not None)
    if cache is not None and key in cache:
        return cache[key]
    res = build_resident(ds.all_volumes(), str(mode), mesh,
                         pretransform=pretransform)
    if cache is not None:
        cache[key] = res
    return res


def evaluate_checkpoint(
    checkpoint_path,
    csv_dir: str,
    cache_dir: str,
    output_dir: str,
    eval_csv: str | None = None,
    use_tta: bool = False,
    batch_size: int | None = None,
    n_bootstrap: int = 10000,
    skip_if_exists: bool = True,
    model_index: int | None = None,
    seed: int = 42,
    resident_cache: dict | None = None,
) -> dict:
    checkpoint_path = Path(checkpoint_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    stem = checkpoint_path.stem
    out_id = output_dir / f"prediction_{stem}_id.csv"
    out_od = output_dir / f"prediction_{stem}_od.csv"
    out_metrics = output_dir / f"metrics_{stem}.json"

    # per-checkpoint file log handler (reference eval_transformer.py:159-188)
    handler = logging.FileHandler(output_dir / f"eval_{stem}.log")
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    log.addHandler(handler)
    try:
        return _evaluate_checkpoint_inner(
            checkpoint_path, csv_dir, cache_dir, output_dir, eval_csv,
            use_tta, batch_size, n_bootstrap, skip_if_exists, model_index,
            seed, resident_cache, stem, out_id, out_od, out_metrics,
        )
    finally:
        log.removeHandler(handler)
        handler.close()


def _evaluate_checkpoint_inner(
    checkpoint_path, csv_dir, cache_dir, output_dir, eval_csv, use_tta,
    batch_size, n_bootstrap, skip_if_exists, model_index, seed,
    resident_cache, stem, out_id, out_od, out_metrics,
):

    if skip_if_exists and out_id.exists() and (
        eval_csv is None or out_od.exists()
    ):
        log.info("skip %s: predictions exist", stem)
        return {"skipped": True, "id_csv": str(out_id)}

    cfg, model, variables, meta = load_model_from_checkpoint(checkpoint_path)
    diseases = list(cfg.DISEASES)
    fold = int(meta.get("fold", cfg.FOLD))

    _, meta_val, meta_test, meta_all = get_train_val_test(
        csv_dir, fold=fold, kfold=int(cfg.KFOLD), split=tuple(cfg.SPLIT)
    )
    DataPrepa(meta_all, cache_dir).preprocess_data(crop=tuple(cfg.IMG_SIZE))

    # Non-TTA eval can ride a pre-transformed store (resize+z-score baked
    # in at build time); TTA must gather raw volumes (views warp first).
    from vsn_tpu.data.resident import resident_pretransform

    eval_pre_tfm = (None if use_tta
                    else resident_pretransform(cfg, train=False))
    evaluator = Evaluator(cfg, model, use_tta=use_tta, batch_size=batch_size,
                          seed=seed,
                          resident_pretransformed=eval_pre_tfm is not None)
    results = {"checkpoint": str(checkpoint_path), "fold": fold,
               "use_tta": use_tta, "model_index": model_index}

    if not cfg.get("USE_SYNTHETIC_DATA", False):
        meta_val = filter_synthetic(meta_val)
        meta_test = filter_synthetic(meta_test)
    meta_val = remove_duplicates(
        meta_val[meta_val.Diagnosis.isin(diseases)].reset_index(drop=True)
    )
    meta_test = remove_duplicates(
        meta_test[meta_test.Diagnosis.isin(diseases)].reset_index(drop=True)
    )
    ds_val = InMemoryDataset(cache_dir, meta_val, diseases)
    ds_test = InMemoryDataset(cache_dir, meta_test, diseases)

    val_probs, val_gt = evaluator.predict_dataset(
        variables, ds_val, _resident_for(ds_val, cfg, resident_cache, evaluator.mesh, eval_pre_tfm)
    )
    results["val"] = _bootstrap_summary(val_probs, val_gt, n_bootstrap, seed)

    test_probs, test_gt = evaluator.predict_dataset(
        variables, ds_test, _resident_for(ds_test, cfg, resident_cache, evaluator.mesh, eval_pre_tfm)
    )
    results["test_id"] = _bootstrap_summary(test_probs, test_gt, n_bootstrap,
                                            seed)
    attach_predictions(meta_test, test_probs, diseases).to_csv(
        out_id, index=False
    )

    if eval_csv is not None:
        meta_od = load_metadata(eval_csv)
        DataPrepa(meta_od, cache_dir).preprocess_data(crop=tuple(cfg.IMG_SIZE))
        meta_od_known = meta_od[meta_od.Diagnosis.isin(diseases)].reset_index(
            drop=True
        )
        ds_od = InMemoryDataset(cache_dir, meta_od_known, diseases)
        od_probs, od_gt = evaluator.predict_dataset(
            variables, ds_od, _resident_for(ds_od, cfg, resident_cache, evaluator.mesh, eval_pre_tfm)
        )
        results["test_od"] = _bootstrap_summary(od_probs, od_gt, n_bootstrap,
                                                seed)
        attach_predictions(meta_od_known, od_probs, diseases).to_csv(
            out_od, index=False
        )

    with open(out_metrics, "w") as f:
        json.dump(results, f, indent=2, default=float)
    results["id_csv"] = str(out_id)
    return results


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from vsn_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="vsn_tpu evaluator")
    p.add_argument("--checkpoints", nargs="+", required=True)
    p.add_argument("--training-csv-dir", required=True)
    p.add_argument("--intermediate-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--eval-csv", default=None, help="out-of-domain cohort CSV")
    p.add_argument("--use-tta", action="store_true")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-bootstrap", type=int, default=10000)
    p.add_argument("--no-skip", action="store_true")
    args = p.parse_args(argv)

    out = []
    resident_cache: dict = {}  # cohorts upload once across all checkpoints
    for i, c in enumerate(args.checkpoints):
        out.append(
            evaluate_checkpoint(
                c,
                csv_dir=args.training_csv_dir,
                cache_dir=args.intermediate_dir,
                output_dir=args.output_dir,
                eval_csv=args.eval_csv,
                use_tta=args.use_tta,
                batch_size=args.batch_size,
                n_bootstrap=args.num_bootstrap,
                skip_if_exists=not args.no_skip,
                model_index=i,
                resident_cache=resident_cache,
            )
        )
    print(json.dumps([
        {k: v for k, v in r.items() if not isinstance(v, dict)} for r in out
    ], default=float))
    return out


if __name__ == "__main__":
    main()
