"""3-axis roll formulations on the real chip: can the shifted-block roll
(~2.6 ms each way at stage-1 shapes) be cheaper than jnp.roll's
axis-sequential concats?

Candidates:
  roll_jnp      jnp.roll on 3 axes (XLA: one concat pass PER axis)
  roll_concat8  one nested-concat expression from 8 static corner slices
                (XLA sees a single concat tree -> ideally one output pass)
  roll_pad      pad-by-shift + one static slice (one pad pass + one slice)
  rollpart      roll_jnp + window_partition (the current shifted-block cost)
  concat8part   roll_concat8 + window_partition

Usage: setsid nohup python scripts/perf_probe_roll.py > /tmp/rollprobe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vsn_tpu.models.swin3d import window_partition

MICRO = 8
RES = (36, 42, 36)
C = 96
S = (3, 3, 3)
WINDOW = (6, 7, 6)
DT = jnp.bfloat16


def roll_jnp(x, s):
    return jnp.roll(x, shift=s, axis=(1, 2, 3))


def roll_concat8(x, s):
    """All three axes in one nested-concat expression."""
    sz, sy, sx = (-sv % dim for sv, dim in zip(s, x.shape[1:4]))

    def ax(v, start, axis):
        if start == 0:
            return v
        parts = (
            jax.lax.slice_in_dim(v, start, v.shape[axis], axis=axis),
            jax.lax.slice_in_dim(v, 0, start, axis=axis),
        )
        return jnp.concatenate(parts, axis=axis)

    return ax(ax(ax(x, sx, 3), sy, 2), sz, 1)


def roll_pad(x, s):
    """Wrap-pad by |s| then one static slice: two passes but simple fusions."""
    sz, sy, sx = (-sv % dim for sv, dim in zip(s, x.shape[1:4]))
    y = jnp.pad(x, ((0, 0), (0, sz), (0, sy), (0, sx), (0, 0)), mode="wrap")
    return y[:, sz:sz + x.shape[1], sy:sy + x.shape[2], sx:sx + x.shape[3], :]


def timeit(name, fn, arg, n=10, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(arg)
        _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(arg)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:14s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((MICRO, *RES, C)), DT)
    neg = tuple(-v for v in S)

    for name, fn in [
        ("roll_jnp", lambda v: roll_jnp(v, neg)),
        ("roll_concat8", lambda v: roll_concat8(v, neg)),
        ("roll_pad", lambda v: roll_pad(v, neg)),
        ("rollpart", lambda v: window_partition(roll_jnp(v, neg), WINDOW)),
        ("concat8part",
         lambda v: window_partition(roll_concat8(v, neg), WINDOW)),
        ("padpart", lambda v: window_partition(roll_pad(v, neg), WINDOW)),
        ("part_only", lambda v: window_partition(v, WINDOW)),
    ]:
        # numeric check once on small data via numpy oracle
        timeit(name, fn, x)

    # correctness spot check
    small = jnp.asarray(rng.standard_normal((1, 6, 7, 6, 4)), jnp.float32)
    want = np.roll(np.asarray(small), shift=(-2, -3, -1), axis=(1, 2, 3))
    for fn in (roll_concat8, roll_pad):
        got = np.asarray(jax.jit(lambda v: fn(v, (-2, -3, -1)))(small))
        np.testing.assert_allclose(got, want)
    print("correctness ok", flush=True)


if __name__ == "__main__":
    main()
