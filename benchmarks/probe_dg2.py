"""
Probe 2: transposed-layout Mosaic dynamic_gather forms.

The winning layout, if supported: atoms on the LANE axis, slots on
sublanes.  Then the neighbor position gather is take_along_axis along
axis=1 of a (K, N) broadcast table -- the form probe 1 measured as
free at (N, 16).  Questions here: does lane-gather survive N ~ 1e4
lanes (77 lane tiles)?  And where does the sublane (axis 0) form stop
compiling?  Also: the two-stage rev-gather (lane dg + K-wide one-hot
sublane select) against its XLA row-gather equivalent.
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


def vmem(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def main():
    n = 9856
    k = 16
    rng = np.random.RandomState(0)
    results = {"n": n, "k": k}
    x1 = jnp.asarray(rng.randn(n, 1).astype(np.float32))
    eps = jnp.float32(1e-30)
    results["scan_null_ms"] = chain_ms(lambda x: x * (1 + eps), x1)
    null = results["scan_null_ms"]

    # --- A: lane gather, atoms on lanes: x (K, N), idx (K, N) --------
    idxT_np = rng.randint(0, n, size=(k, n)).astype(np.int32)
    idxT = jnp.asarray(idxT_np)

    def kernel_a(x_ref, idx_ref, o_ref):
        xb = jnp.broadcast_to(x_ref[:].reshape(1, n), (k, n))
        o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=1)

    try:
        ga = pl.pallas_call(
            kernel_a,
            out_shape=vmem((k, n)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda x: ga(x.reshape(n, 1), idxT))(x1)
        ref = np.asarray(x1)[:, 0][idxT_np]
        ok = np.allclose(np.asarray(out), ref)
        ms = chain_ms(lambda x: x + eps * jnp.sum(
            ga(x, idxT), axis=0)[:, None], x1)
        results["lane_dg_atoms_on_lanes"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - null) * 1e6 / (n * k), 3)}
    except Exception as e:  # noqa: BLE001
        results["lane_dg_atoms_on_lanes"] = {"error": repr(e)[:1500]}

    # --- B: full transposed position gather, 3 components ------------
    p1 = jnp.asarray(rng.randn(n, 3).astype(np.float32))

    def kernel_b(p_ref, idx_ref, o_ref):
        for c in range(3):
            xb = jnp.broadcast_to(p_ref[:, c].reshape(1, n), (k, n))
            o_ref[c * k:(c + 1) * k, :] = jnp.take_along_axis(
                xb, idx_ref[:], axis=1)

    try:
        gb = pl.pallas_call(
            kernel_b,
            out_shape=vmem((3 * k, n)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda p: gb(p, idxT))(p1)
        ref = np.concatenate(
            [np.asarray(p1)[:, c][idxT_np] for c in range(3)], axis=0)
        ok = np.allclose(np.asarray(out), ref)
        ms = chain_ms(lambda p: p + eps * jnp.sum(
            gb(p, idxT), axis=0)[:, None], p1)
        results["pos_gather_transposed_3c"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - null) * 1e6 / (n * k * 3), 3)}
    except Exception as e:  # noqa: BLE001
        results["pos_gather_transposed_3c"] = {"error": repr(e)[:600]}

    # --- C: two-stage rev gather: out[s,a] = P[idx[s,a]; rev[s,a]] ---
    # stage 1: per source slot m, lane-gather row m of P at idx[s,:]
    # is shared across s -- instead gather ALL K rows at idx[s] and
    # one-hot select sublane rev[s].  Loop over s (16 iterations).
    P_np = rng.randn(k, n).astype(np.float32)   # P[m, j] slot-major
    rev_np = rng.randint(0, k, size=(k, n)).astype(np.int32)
    P = jnp.asarray(P_np)
    rev = jnp.asarray(rev_np)

    def kernel_c(p_ref, idx_ref, rev_ref, o_ref):
        pt = p_ref[:]
        for s in range(k):
            row_idx = jnp.broadcast_to(
                idx_ref[s].reshape(1, n), (k, n))
            g = jnp.take_along_axis(pt, row_idx, axis=1)  # (K, N)
            acc = jnp.zeros((1, n), dtype=pt.dtype)
            rv = rev_ref[s].reshape(1, n)
            for m in range(k):
                acc = acc + jnp.where(rv == m, g[m].reshape(1, n),
                                      0.0)
            o_ref[s:s + 1, :] = acc

    try:
        gc = pl.pallas_call(
            kernel_c,
            out_shape=vmem((k, n)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda p: gc(p, idxT, rev))(P)
        ref = P_np[rev_np, idxT_np]
        ok = np.allclose(np.asarray(out), ref)
        ms = chain_ms(lambda p: p * (1 + eps) + eps * gc(p, idxT, rev),
                      P)
        results["rev_gather_two_stage"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - null) * 1e6 / (n * k), 3)}
    except Exception as e:  # noqa: BLE001
        results["rev_gather_two_stage"] = {"error": repr(e)[:600]}

    # --- D: sublane (axis 0) dg crash boundary ------------------------
    results["sublane_dg_max"] = {}
    for nb in (256, 1024, 4096, 9856):
        idx_b = jnp.asarray(
            rng.randint(0, nb, size=(nb, k)).astype(np.int32))
        xb0 = jnp.asarray(rng.randn(nb, 1).astype(np.float32))

        def kernel_d(x_ref, idx_ref, o_ref, nb=nb):
            xb = jnp.broadcast_to(x_ref[:], (nb, k))
            o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=0)

        try:
            gd = pl.pallas_call(
                kernel_d,
                out_shape=vmem((nb, k)),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = jax.jit(lambda x, i=idx_b, g=gd: g(x, i))(xb0)
            ok = np.allclose(np.asarray(out),
                             np.asarray(xb0)[:, 0][np.asarray(idx_b)])
            results["sublane_dg_max"][nb] = {"correct": bool(ok)}
        except Exception as e:  # noqa: BLE001
            results["sublane_dg_max"][nb] = {"error": repr(e)[:300]}

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_dg2.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
