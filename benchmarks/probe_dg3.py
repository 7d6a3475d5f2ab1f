"""
Probe: map the Mosaic envelope for axis-0 (sublane) dynamic gathers.

probe_dynamic_gather.py's axis-0 kernel fails the remote compile
helper reproducibly at (9856, 16); this probe bisects the failure:
shape sweep, broadcast vs materialized source, index dtype, and a
block-grid variant (gather within a VMEM-resident window).  Each case
compiles in its own try block so one crash doesn't mask the rest.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        REPO, ".jax_cache")
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SCAN_LEN = 30


def chain_ms(fn, x0, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=SCAN_LEN)
        return out

    jax.block_until_ready(loop(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_LEN * 1e3


def try_case(results, name, build, check):
    try:
        out = build()
        jax.block_until_ready(out)
        ok = check(np.asarray(out))
        results[name] = {"compiles": True, "correct": bool(ok)}
    except Exception as e:  # noqa: BLE001 - feature probe
        results[name] = {"error": repr(e)[:200]}


def main():
    rng = np.random.RandomState(0)
    results = {}

    # ---- axis-0 take_along_axis sweep over N (broadcast source) ----
    for n in (8, 64, 256, 1024, 4096, 9856):
        k = 16
        idx_np = rng.randint(0, n, size=(n, k)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        x_np = rng.randn(n, 1).astype(np.float32)
        x0 = jnp.asarray(x_np)

        def kernel(x_ref, idx_ref, o_ref, n=n, k=k):
            xb = jnp.broadcast_to(x_ref[:], (n, k))
            o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=0)

        def build(kernel=kernel, x0=x0, idx=idx, n=n, k=k):
            g = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return jax.jit(lambda x: g(x, idx))(x0)

        try_case(results, f"bcast_axis0_n{n}", build,
                 lambda out, x_np=x_np, idx_np=idx_np:
                 np.allclose(out, x_np[:, 0][idx_np]))

    # ---- axis-0 from a materialized (N, K) table ----
    for n in (256, 9856):
        k = 16
        idx_np = rng.randint(0, n, size=(n, k)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        t_np = rng.randn(n, k).astype(np.float32)
        t0 = jnp.asarray(t_np)

        def kernel(t_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=0)

        def build(kernel=kernel, t0=t0, idx=idx, n=n, k=k):
            g = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return jax.jit(lambda t: g(t, idx))(t0)

        try_case(results, f"table_axis0_n{n}", build,
                 lambda out, t_np=t_np, idx_np=idx_np:
                 np.allclose(out, np.take_along_axis(t_np, idx_np,
                                                     axis=0)))

    # ---- axis-0 with lane width 128 ----
    n, k = 1024, 128
    idx_np = rng.randint(0, n, size=(n, k)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    x_np = rng.randn(n, 1).astype(np.float32)
    x0 = jnp.asarray(x_np)

    def kernel_w(x_ref, idx_ref, o_ref):
        xb = jnp.broadcast_to(x_ref[:], (n, k))
        o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=0)

    def build_w():
        g = pl.pallas_call(
            kernel_w,
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda x: g(x, idx))(x0)

    try_case(results, "bcast_axis0_n1024_k128", build_w,
             lambda out: np.allclose(out, x_np[:, 0][idx_np]))

    # ---- grid variant: block rows, gather from the FULL column ----
    n, k, ba = 9856, 16, 256
    idx_np = rng.randint(0, n, size=(n, k)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    x_np = rng.randn(n, 1).astype(np.float32)
    x0 = jnp.asarray(x_np)

    def kernel_g(x_ref, idx_ref, o_ref):
        xb = jnp.broadcast_to(x_ref[:], (n, k))
        o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=0)

    def build_g():
        g = pl.pallas_call(
            kernel_g,
            grid=(n // ba,),
            in_specs=[
                pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ba, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ba, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        )
        return jax.jit(lambda x: g(x, idx))(x0)

    try_case(results, "grid_axis0_full_column", build_g,
             lambda out: np.allclose(out, x_np[:, 0][idx_np]))

    # timings for whichever large case compiled
    if results.get("bcast_axis0_n9856", {}).get("compiles"):
        k = 16
        n = 9856
        idx_np = rng.randint(0, n, size=(n, k)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        x0 = jnp.asarray(rng.randn(n, 1).astype(np.float32))
        eps = jnp.float32(1e-30)

        def kernel(x_ref, idx_ref, o_ref):
            xb = jnp.broadcast_to(x_ref[:], (n, k))
            o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=0)

        g = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        results["null_ms"] = round(
            chain_ms(lambda x: x * (1.0 + eps), x0), 4)
        results["bcast_axis0_n9856_ms"] = round(chain_ms(
            lambda x: x + eps * jnp.sum(g(x, idx), axis=1,
                                        keepdims=True), x0), 4)

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_dg3.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
