"""
Gather microbenchmark: cost model of XLA TPU row gathers vs table
width, index locality (same-tile reuse), and row packing.  Decides the
round-2 redesign of the MD force-step data movement.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from uf3_tpu.ops import pallas_trio as pt  # noqa: E402


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
    n = 9826
    k = 72
    rng = np.random.RandomState(0)
    idx_rand = rng.randint(0, n, size=(n, k)).astype(np.int32)
    # tile-local: indices within +-4 of the row id (same (8,128) tile)
    idx_tile = np.clip(np.arange(n)[:, None]
                       + rng.randint(-4, 4, size=(n, k)), 0,
                       n - 1).astype(np.int32)
    print(f"platform = {jax.devices()[0].platform}; "
          f"{n * k / 1e3:.0f}k rows")

    for width in (3, 8, 32, 128):
        table = jnp.asarray(rng.rand(n, width), dtype=jnp.float32)
        for name, idx in (("rand", idx_rand), ("tile", idx_tile)):
            flats = pt.blockify_columns(jnp.asarray(idx.T))

            @jax.jit
            def g(t, flats=flats):
                return pt.gather_rows_blocks(t, flats, n)

            t_ms = timeit(g, table)
            rows = n * k
            print(f"width {width:3d} {name}: {t_ms:7.3f} ms  "
                  f"({t_ms * 1e6 / rows:5.2f} ns/row)")

    # packed: 8 consecutive atoms per table row; gather group rows
    # then select the target sublane by one-hot (VPU)
    table3 = jnp.asarray(rng.rand(n, 3), dtype=jnp.float32)
    pad = (-n) % 8
    packed = jnp.pad(table3, ((0, pad), (0, 0))).reshape(-1, 24)
    g_idx = idx_rand // 8          # (N, k) group row
    sub = idx_rand % 8             # (N, k) sublane within group
    flats = pt.blockify_columns(jnp.asarray(g_idx.T))
    subj = jnp.asarray(sub)

    @jax.jit
    def g_packed(t):
        rows = pt.gather_rows_blocks(t, flats, n)   # (N, k, 24)
        rows = rows.reshape(n, k, 8, 3)
        onehot = (subj[..., None]
                  == jax.lax.broadcasted_iota(jnp.int32,
                                              (n, k, 8), 2))
        return jnp.sum(rows * onehot[..., None].astype(rows.dtype),
                       axis=2)

    print(f"packed8+onehot rand:  {timeit(g_packed, packed):7.3f} ms")

    # one big flat take for reference (single call, no blocking)
    idxj = jnp.asarray(idx_rand)

    @jax.jit
    def g_take(t):
        return jnp.take(t, idxj.reshape(-1), axis=0,
                        unique_indices=False, indices_are_sorted=False)

    print(f"single take width 3:  {timeit(g_take, table3):7.3f} ms")

    # dynamic_slice-in-loop alternative via one-hot matmul (MXU)
    # onehot (N*k, n) is too big; skip.


if __name__ == "__main__":
    main()
