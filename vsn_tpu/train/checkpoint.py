"""Checkpointing: async background saves, best-N rotation, resume.

Reference semantics (train/train_transformer.py):
  * the checkpoint dict carries model weights (EMA weights when EMA is on,
    807-808), optimizer state, schedules' step, history, sampler epoch and
    best-metric bookkeeping (752-820);
  * ``AsyncCheckpointSaver`` (197-276): a background thread with a bounded
    queue (size 3), device->host copy before serialization, drain-on-shutdown;
  * best-N checkpoints are a rotation ``model_{runid}_{fold}_best{i}`` kept
    sorted by metric via file renames (823-934);
  * the loader accepts a full training checkpoint or a raw params tree and
    drops shape-mismatched keys for transfer learning (312-454).

Format: flax msgpack serialization of the numeric pytree + a JSON sidecar-free
header in the same file (length-prefixed), no torch/pickle dependency.
"""

from __future__ import annotations

import json
import queue
import struct
import threading
from pathlib import Path

import jax
import numpy as np
from flax import serialization

_MAGIC = b"VSNC"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, payload: dict, meta: dict | None = None):
    """Serialize {pytree payload} + {json meta} into one file.

    NamedTuple states (TrainState/AdamWState/EMAState) pass through flax's
    to_state_dict, becoming nested dicts keyed by field position.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(payload))
    )
    meta_bytes = json.dumps(meta or {}).encode()
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<q", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    tmp.replace(path)  # atomic publish
    return path


def load_checkpoint(path) -> tuple[dict, dict]:
    """Returns (payload pytree, meta dict)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a vsn_tpu checkpoint")
        (mlen,) = struct.unpack("<q", f.read(8))
        meta = json.loads(f.read(mlen).decode())
        payload = serialization.msgpack_restore(f.read())
    return payload, meta


def filter_compatible(restored, target):
    """Keep restored leaves whose path+shape match the target tree; everything
    else falls back to the target's value (shape-filtered partial load,
    reference train_transformer.py:379-414).

    ``restored`` may be a raw state-dict (from load_checkpoint) or a live
    pytree; ``target`` supplies the structure to rebuild.
    """
    target_sd = serialization.to_state_dict(_to_host(target))
    restored_sd = serialization.to_state_dict(_to_host(restored))
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_sd)[0])
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored_sd)[0])
    kept, dropped = 0, []
    out = {}
    for path, tval in flat_t.items():
        rval = flat_r.get(path)
        if rval is not None and np.shape(rval) == np.shape(tval):
            out[path] = np.asarray(rval, dtype=np.asarray(tval).dtype)
            kept += 1
        else:
            out[path] = np.asarray(tval)
            dropped.append(jax.tree_util.keystr(path))
    treedef = jax.tree_util.tree_structure(target_sd)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(target_sd)[0]]
    merged_sd = jax.tree_util.tree_unflatten(treedef, leaves)
    return serialization.from_state_dict(target, merged_sd), kept, dropped


class AsyncCheckpointSaver:
    """Background checkpoint writer with a bounded queue and drain-on-close."""

    def __init__(self, max_queue: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._errors: list[BaseException] = []
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                item()
            except BaseException as e:  # surfaced on close()
                self._errors.append(e)
            finally:
                self._q.task_done()

    def submit(self, path, payload: dict, meta: dict | None = None):
        """Device->host copy happens here (the caller's arrays may be donated
        or mutated afterwards), then the write is queued."""
        path = Path(path)
        payload = _to_host(payload)
        self._q.put(lambda: save_checkpoint(path, payload, meta))

    def submit_task(self, fn):
        """Queue an arbitrary filesystem task, ordered with pending writes
        (best-N renames must not overtake queued saves)."""
        self._q.put(fn)

    def close(self):
        self._q.join()
        self._q.put(None)
        self._thread.join()
        if self._errors:
            raise self._errors[0]


class BestNTracker:
    """Best-N checkpoint rotation by metric.

    Maintains files ``model_{runid}_{fold}_best{i}`` with best0 = best metric,
    using renames exactly like reference save_best_n_models (823-934).
    """

    def __init__(
        self,
        save_dir,
        run_id: str,
        fold: int,
        n: int,
        metric_name: str = "loss",
    ):
        self.dir = Path(save_dir)
        self.run_id = run_id
        self.fold = fold
        self.n = max(1, int(n))
        self.metric_name = metric_name
        self.lower_better = metric_name == "loss"
        self.entries: list[tuple[float, int]] = []  # (metric, step), sorted best-first

    def _path(self, i: int) -> Path:
        return self.dir / f"model_{self.run_id}_{self.fold}_best{i}.ckpt"

    def consider(self, metric: float, step: int):
        """Returns insertion index if this metric makes the top-N else None."""
        key = metric if self.lower_better else -metric
        keys = [m if self.lower_better else -m for m, _ in self.entries]
        idx = int(np.searchsorted(keys, key))
        if idx >= self.n:
            return None
        return idx

    def insert(self, idx: int, metric: float, step: int, saver, payload, meta):
        """Shift best{idx..} up by one (dropping the worst) and write best{idx}.

        The unlink/renames are queued on the saver thread so they stay ordered
        with in-flight writes to the same filenames.
        """
        n_entries = len(self.entries)
        if n_entries >= self.n:
            self.entries = self.entries[: self.n - 1]
            n_entries = self.n - 1

        def rotate(n_entries=n_entries, idx=idx):
            worst = self._path(self.n - 1)
            if worst.exists():
                worst.unlink()
            for i in range(n_entries - 1, idx - 1, -1):
                src = self._path(i)
                if src.exists():
                    src.rename(self._path(i + 1))

        saver.submit_task(rotate)
        self.entries.insert(idx, (metric, step))
        saver.submit(self._path(idx), payload, meta)

    @property
    def best(self):
        return self.entries[0] if self.entries else None
