"""Host input pipeline: in-memory cache -> epoch sampling -> step batches ->
prefetched device transfer.

Replaces the reference's torch DataLoader stack (NormalDataset + samplers +
worker processes, train/train_transformer.py:1859-1966) with a thin host-side
assembler: the float16 cache is preloaded into one contiguous numpy array
(PRELOAD_DATA, dataset/dataset.py:81-101), per-epoch index orders come from
the shuffled or class-balanced sampler, MixUp/CutMix partners are planned per
epoch (dataset.py:184-495 semantics), and a background thread keeps
PREFETCH_FACTOR step-batches in flight to the device. All voxel math
(mixing, augmentation, normalization) happens on device — the host only
gathers and ships raw cache bytes.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path

import numpy as np

from vsn_tpu.data.mixers import MixPlanner
from vsn_tpu.data.sampler import (
    compute_sample_weights,
    shuffled_epoch_indices,
    weighted_epoch_indices,
)
from vsn_tpu.utils.rng import epoch_rng


class InMemoryDataset:
    """Preloaded float16 cache + one-hot labels.

    One-hot rule matches reference dataset.py:64-70: diagnoses outside
    ``diseases`` get an all-zero label (they are normally filtered upstream).
    """

    def __init__(self, cache_dir, metadata, diseases, preload: bool = True):
        self.cache_dir = Path(cache_dir)
        self.metadata = metadata.reset_index(drop=True)
        self.diseases = list(diseases)
        self.subjects = self.metadata.Subject.tolist()
        self.labels_str = self.metadata.Diagnosis.to_numpy()

        k = len(self.diseases)
        idx = {d: i for i, d in enumerate(self.diseases)}
        self.labels = np.zeros((len(self.metadata), k), np.float32)
        for i, diag in enumerate(self.labels_str):
            if diag in idx:
                self.labels[i, idx[diag]] = 1.0

        self.images = None
        if preload:
            first = self._load_file(0)
            buf = np.empty((len(self.subjects),) + first.shape, np.float16)
            buf[0] = first
            for i in range(1, len(self.subjects)):
                buf[i] = self._load_file(i)
            self.images = buf

    def _load_file(self, i: int) -> np.ndarray:
        return np.load(self.cache_dir / f"{self.subjects[i]}.npy")

    def __len__(self):
        return len(self.subjects)

    @property
    def spatial_shape(self):
        if self.images is not None:
            return self.images.shape[1:4]
        return self._load_file(0).shape[:3]

    def gather(self, indices: np.ndarray) -> np.ndarray:
        """[n, D, H, W, 1] float16 for the given sample indices."""
        if self.images is not None:
            return self.images[indices]
        return np.stack([self._load_file(i) for i in indices])

    def all_volumes(self) -> np.ndarray:
        """The full [N, D, H, W, 1] float16 cache (for device preload)."""
        if self.images is not None:
            return self.images
        return self.gather(np.arange(len(self.subjects)))


class TrainPipeline:
    """Infinite step-batch iterator.

    Yields dicts with image [A, B, D, H, W, 1] f16, label [A, B, K] f32 and,
    when mixing is enabled, image2/label2/mix_lam/mix_apply/mix_bounds.
    A = gradient accumulation factor, B = global micro-batch.

    Epoch bookkeeping mirrors the reference: a new epoch re-draws the sampler
    order and regenerates mix decisions (train_transformer.py:1077-1099 +
    set_epoch on samplers/mixers).
    """

    def __init__(
        self,
        dataset: InMemoryDataset,
        cfg,
        grad_accum: int,
        micro_batch: int,
        seed: int | None = None,
        drop_last: bool = True,
        index_mode: bool = False,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.ds = dataset
        self.cfg = cfg
        self.index_mode = bool(index_mode)
        self.grad_accum = int(grad_accum)
        self.micro_batch = int(micro_batch)  # GLOBAL micro-batch rows
        self.per_step = self.grad_accum * self.micro_batch
        self.seed = seed
        # Multi-host: every host draws the identical global epoch stream and
        # mix plan (seed must be shared — dist.broadcast_seed), then emits
        # only its contiguous block of each micro-batch, matching the rows
        # its devices own under the axis-1 'data' sharding (reference
        # analogue: per-rank DistributedWeightedSampler partitions,
        # utils/balanced_sampler.py:126-364).
        self.rank = int(rank)
        self.world_size = int(world_size)
        if self.micro_batch % self.world_size:
            raise ValueError(
                f"global micro-batch {self.micro_batch} not divisible by "
                f"world size {self.world_size}"
            )
        self.local_rows = self.micro_batch // self.world_size
        self.balanced = bool(cfg.get("USE_BALANCED_SAMPLER", False))
        self.planner = MixPlanner(
            dataset.labels_str, dataset.diseases, cfg, dataset.spatial_shape,
            seed=seed,
        )
        if self.balanced:
            self.sample_weights = compute_sample_weights(
                dataset.labels_str, dataset.diseases
            )
        self.epoch = 0
        self._epoch_indices = None
        self._epoch_plan = None
        self._pos = 0

    def _start_epoch(self):
        rng = epoch_rng(self.seed, "sampler", self.epoch)
        if self.balanced:
            indices = weighted_epoch_indices(self.sample_weights, None, rng)
        else:
            indices = shuffled_epoch_indices(len(self.ds), rng)
        if len(indices) < self.per_step:
            # tiny datasets: tile the epoch so one step is always possible
            reps = int(np.ceil(self.per_step / len(indices)))
            indices = np.tile(indices, reps)
        mix_rng = epoch_rng(self.seed, "mixup", self.epoch)
        self._epoch_plan = self.planner.plan(indices, self.epoch, mix_rng)
        self._epoch_indices = indices
        self._pos = 0

    def steps_per_epoch(self) -> int:
        return max(1, len(self.ds) // self.per_step)

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        if self._epoch_indices is None or self._pos + self.per_step > len(
            self._epoch_indices
        ):
            if self._epoch_indices is not None:
                self.epoch += 1
            self._start_epoch()
        sl = slice(self._pos, self._pos + self.per_step)
        self._pos += self.per_step

        a, b = self.grad_accum, self.micro_batch
        # local block of each global micro-batch: rows
        # [rank*local : (rank+1)*local] of every accumulation slice
        lo, hi = self.rank * self.local_rows, (self.rank + 1) * self.local_rows
        bl = self.local_rows

        def local(v):
            return v.reshape(a, b, *v.shape[1:])[:, lo:hi]

        idx = local(self._epoch_indices[sl]).reshape(-1)
        batch = {"label": self.ds.labels[idx].reshape(a, bl, -1)}
        if self.index_mode:
            # device-resident mode: ship int32 indices; the train step
            # gathers volumes from the HBM-resident cache (data/resident.py)
            batch["image_idx"] = idx.astype(np.int32).reshape(a, bl)
        else:
            batch["image"] = self.ds.gather(idx).reshape(
                a, bl, *self.ds.spatial_shape, 1
            )
        if self.planner.mode is not None:

            def local_flat(v):
                lv = local(v[sl])
                return lv.reshape(a * bl, *lv.shape[2:])

            plan = {k: local_flat(v) for k, v in self._epoch_plan.items()}
            if self.index_mode:
                batch["partner_idx"] = plan["partner"].astype(np.int32).reshape(a, bl)
            else:
                batch["image2"] = self.ds.gather(plan["partner"]).reshape(
                    a, bl, *self.ds.spatial_shape, 1
                )
            batch["label2"] = self.ds.labels[plan["partner"]].reshape(a, bl, -1)
            batch["mix_lam"] = plan["mix_lam"].reshape(a, bl)
            batch["mix_apply"] = plan["mix_apply"].reshape(a, bl)
            batch["mix_bounds"] = plan["mix_bounds"].reshape(a, bl, 6)
        return batch


class EvalPipeline:
    """Fixed-order eval batches, zero-padded to a full final batch.

    Yields (batch_images [B, ...], batch_labels [B, K], valid_mask [B]) —
    padding keeps shapes static under jit; the mask drops pad rows host-side
    (the distributed analogue of the reference's variable-length all_gather
    pad/trim, train_transformer.py:550-568).
    """

    def __init__(self, dataset: InMemoryDataset, batch_size: int,
                 rank: int = 0, world_size: int = 1):
        self.ds = dataset
        self.batch_size = int(batch_size)  # GLOBAL batch rows
        self.rank = int(rank)
        self.world_size = int(world_size)
        if self.batch_size % self.world_size:
            raise ValueError("eval batch size must divide by world size")

    def iter_with_indices(self, load_images: bool = True):
        """Yields (local_images|None, labels, valid, padded_indices).

        ``labels``/``valid``/``padded_indices`` are always GLOBAL (they are
        tiny); images (or the resident-gather indices derived from
        ``padded_indices``) are materialized only for this host's block of
        each batch — multi-host eval feeds through
        jax.make_array_from_process_local_data (mesh.shard_eval_batch) and
        reads predictions back via dist.fetch_global.
        """
        n = len(self.ds)
        b = self.batch_size
        bl = b // self.world_size
        lo, hi = self.rank * bl, (self.rank + 1) * bl
        for start in range(0, n, b):
            idx = np.arange(start, min(start + b, n))
            valid = np.zeros(b, bool)
            valid[: len(idx)] = True
            pad = np.concatenate([idx, np.zeros(b - len(idx), np.int64)])
            images = self.ds.gather(pad[lo:hi]) if load_images else None
            labels = self.ds.labels[pad]
            yield images, labels, valid, pad

    def local_slice(self, pad: np.ndarray) -> np.ndarray:
        """This host's block of a global padded index batch."""
        bl = self.batch_size // self.world_size
        return pad[self.rank * bl:(self.rank + 1) * bl]

    def __iter__(self):
        for images, labels, valid, _ in self.iter_with_indices():
            yield images, labels, valid


def prefetch(iterator, size: int, device_put=None):
    """Background-thread prefetcher; optionally device_puts each item.

    The queue bounds host memory like the reference's bounded saver queue
    (train_transformer.py:197-276) and overlaps host gather + H2D transfer
    with device compute.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, size))
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                if device_put is not None:
                    item = device_put(item)
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
