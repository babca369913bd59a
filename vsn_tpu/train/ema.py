"""EMA over the N most recent weight snapshots.

The reference's EMA is non-standard (utils/ema.py:10-178): a deque of the last
``n_models`` full state dicts; after every optimizer step the EMA weights are
the *renormalized* decay-weighted average of the queue, most-recent heaviest:

    weights = [decay^i for i in range(len(queue))][::-1];  w /= sum(w)
    ema     = sum_i w_i * queue_i          (queue[-1] = newest)

TPU-first: the queue is a stacked pytree (leading axis = slot) living in
device memory — at these model sizes (<= ~30 M params) three extra f32 copies
are ~350 MB, well within a v5e's HBM, and the weighted reduction is a single
fused einsum-like pass instead of host-side tensor shuffling. The queue is a
ring buffer; slot order is recovered from (count, position).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    queue: object      # pytree with leading axis n_models (ring buffer)
    count: jax.Array   # total snapshots ever pushed (>=1 after init)
    ema: object        # current weighted average (same structure as params)


def ema_init(params, n_models: int) -> EMAState:
    """Queue initialized with the current params in slot 0 (ema.py:39-48)."""

    def stack(p):
        buf = jnp.zeros((n_models,) + p.shape, p.dtype)
        return buf.at[0].set(p)

    return EMAState(
        queue=jax.tree.map(stack, params),
        count=jnp.ones((), jnp.int32),
        # explicit copy: the EMA leaves must NOT alias the live params —
        # the train step donates its input state, and aliased buffers would
        # be donated twice.
        ema=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
    )


def ema_update(state: EMAState, params, decay: float, n_models: int) -> EMAState:
    """Push ``params`` and recompute the weighted average (ema.py:72-108)."""
    pos = state.count % n_models  # ring slot for the new snapshot
    queue = jax.tree.map(lambda q, p: q.at[pos].set(p), state.queue, params)
    count = state.count + 1
    size = jnp.minimum(count, n_models)  # live entries

    # Age of each slot: 0 = newest. Newest sits at ring position (count-1)%n.
    newest = (count - 1) % n_models
    slots = jnp.arange(n_models)
    age = (newest - slots) % n_models
    live = age < size
    w = jnp.where(live, jnp.asarray(decay, jnp.float32) ** age.astype(jnp.float32), 0.0)
    w = w / w.sum()

    def avg(q):
        wr = w.reshape((n_models,) + (1,) * (q.ndim - 1)).astype(jnp.float32)
        return jnp.sum(q.astype(jnp.float32) * wr, axis=0).astype(q.dtype)

    ema = jax.tree.map(avg, queue)
    return EMAState(queue=queue, count=count, ema=ema)
