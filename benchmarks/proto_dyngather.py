"""
tpu.dynamic_gather throughput probe (Mosaic same-shape batched gather):

mode[0] (sublane): out[a, b] = x[idx[a, b], b] with x, idx, out all
(A, B).  With x = a position component broadcast across B=128 lanes
and idx[a, k] = neighbor index, ONE op fetches the k-th neighbor
coordinate for every (atom, slot) -- the entire MD neighbor-position
gather in 3 ops if the hardware sublane-gather is fast.

mode[1] (lane): out[a, b] = x[a, idx[a, b]] -- intra-row crossbar.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=100, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = 9832  # 9826 padded to tile multiple
    k = 128   # lanes = neighbor slots (72 used, padded)
    rng = np.random.RandomState(0)
    posx = jnp.asarray(rng.rand(n).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, size=(n, k)).astype(np.int32))

    def kernel(x_ref, idx_ref, out_ref):
        x = jnp.broadcast_to(x_ref[:], (k, n)).T  # hmm avoid transpose
        out_ref[:] = jnp.take_along_axis(x, idx_ref[:], axis=0)

    def kernel2(xb_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(xb_ref[:], idx_ref[:],
                                         axis=0)

    xb = jnp.broadcast_to(posx[:, None], (n, k)).copy()

    @jax.jit
    def sublane_gather(xb, idx):
        return pl.pallas_call(
            kernel2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        )(xb, idx)

    try:
        t = timeit(sublane_gather, xb, idx)
        rows = n * k
        print(f"dyn sublane gather (N,{k}): {t:7.3f} ms "
              f"({t * 1e6 / rows:6.3f} ns/elem)")
    except Exception as e:
        print(f"sublane gather FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")

    # lane-dim gather (crossbar)
    idx_lane = jnp.asarray(rng.randint(0, k, size=(n, k))
                           .astype(np.int32))
    xr = jnp.asarray(rng.rand(n, k).astype(np.float32))

    def kernel_lane(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:],
                                         axis=1)

    @jax.jit
    def lane_gather(x, idx):
        return pl.pallas_call(
            kernel_lane,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        )(x, idx_lane)

    try:
        t = timeit(lane_gather, xr, idx_lane)
        print(f"dyn lane gather    (N,{k}): {t:7.3f} ms "
              f"({t * 1e6 / (n * k):6.3f} ns/elem)")
    except Exception as e:
        print(f"lane gather FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")


if __name__ == "__main__":
    main()
