"""Measure host->device transfer bandwidth through the axon tunnel.

Ships a ViT-sized accumulation batch (6 x 24 x 144x160x144 f16 ~ 955 MB)
and times device_put + materialization.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    shapes = {
        "micro (24 vols, 159MB)": (24, 144, 160, 144, 1),
        "accum batch (144 vols, 955MB)": (6, 24, 144, 160, 144, 1),
    }
    for name, shape in shapes.items():
        x = rng.standard_normal(shape).astype(np.float16)
        nbytes = x.nbytes
        # warm
        d = jax.device_put(x)
        _ = float(jnp.asarray(d).astype(jnp.float32).sum())
        del d
        t0 = time.perf_counter()
        d = jax.device_put(x)
        _ = float(jnp.asarray(d).astype(jnp.float32).sum())
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.2f}s  {nbytes / dt / 1e6:.0f} MB/s", flush=True)
        del d


if __name__ == "__main__":
    main()
