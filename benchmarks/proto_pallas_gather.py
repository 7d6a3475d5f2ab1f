"""
Pallas gather probe: can a VMEM-resident table + in-kernel dynamic
gather beat XLA's ~2.2 ns/row HBM gather?  Tries jnp.take inside a
Pallas TPU kernel (Mosaic dynamic-gather lowering) at MD-relevant
shapes: (9826, 8) table, 707k gathered rows.
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
    n, k, width = 9826, 72, 8
    blk = 512
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n, size=(n, k)).astype(np.int32)
    table = jnp.asarray(rng.rand(n, width), dtype=jnp.float32)
    idxj = jnp.asarray(idx)
    n_pad = ((n + blk - 1) // blk) * blk
    idx_pad = jnp.pad(idxj, ((0, n_pad - n), (0, 0)))

    def kernel(table_ref, idx_ref, out_ref):
        rows = idx_ref[:].reshape(-1)             # (blk * k,)
        gathered = jnp.take_along_axis(
            table_ref[:], jnp.broadcast_to(rows[:, None],
                                           (blk * k, width)), axis=0)
        out_ref[:] = gathered.reshape(blk, k * width)

    @jax.jit
    def pallas_gather(table, idx_pad):
        return pl.pallas_call(
            kernel,
            grid=(n_pad // blk,),
            in_specs=[
                pl.BlockSpec((n, width), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, k * width),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, k * width),
                                           jnp.float32),
        )(table, idx_pad)

    try:
        t = timeit(pallas_gather, table, idx_pad)
        rows = n * k
        print(f"pallas take (VMEM table): {t:7.3f} ms "
              f"({t * 1e6 / rows:5.2f} ns/row)")
    except Exception as e:
        print(f"pallas take FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}")

    # XLA reference
    from uf3_tpu.ops import pallas_trio as pt
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    flats = pt.blockify_columns(idxj.T)

    @jax.jit
    def xla_gather(table):
        return pt.gather_rows_blocks(table, flats, n)

    t = timeit(xla_gather, table)
    print(f"xla gather reference:     {t:7.3f} ms "
          f"({t * 1e6 / (n * k):5.2f} ns/row)")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
