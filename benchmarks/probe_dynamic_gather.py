"""
Probe: Mosaic `tpu.dynamic_gather` as a VMEM-resident neighbor gather.

The XLA row-gather wall is ~2 ns/row regardless of width (the HBM
gather engine); the MD inner step pays it twice (positions out,
packed partials back).  Mosaic lowers `jnp.take_along_axis` on 2D
operands to `tpu.dynamic_gather` -- a vectorized in-register/VMEM
gather along sublanes (axis 0, per-lane indices) or lanes (axis 1,
per-sublane indices).  If gathering positions broadcast to (N, K)
with the (N, K) neighbor index matrix is fast, the whole force step
can go VMEM-resident in one Pallas kernel.

Measures ns/row vs the XLA gather on identical index sets.
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


def main():
    n_pad = 9856  # 9826 atoms padded to a sublane multiple
    k = 16
    rng = np.random.RandomState(0)
    idx_np = rng.randint(0, n_pad, size=(n_pad, k)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    x0 = jnp.asarray(rng.randn(n_pad, 1).astype(np.float32))
    eps = jnp.float32(1e-30)
    results = {"n": n_pad, "k": k}

    # --- null scan baseline (dispatch round-trip) --------------------
    results["scan_null_ms"] = chain_ms(lambda x: x * (1.0 + eps), x0)

    # --- in-kernel dynamic_gather along axis 0 -----------------------
    def kernel0(x_ref, idx_ref, o_ref):
        xb = jnp.broadcast_to(x_ref[:], (n_pad, k))
        o_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=0)

    try:
        g0 = pl.pallas_call(
            kernel0,
            out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda x: g0(x, idx))(x0)
        ok = np.allclose(np.asarray(out),
                         np.asarray(x0)[:, 0][idx_np])
        ms = chain_ms(lambda x: x + eps * jnp.sum(g0(x, idx), axis=1, keepdims=True),
                      x0)
        results["pallas_dg_axis0"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - results["scan_null_ms"])
                                * 1e6 / (n_pad * k), 3)}
    except Exception as e:  # noqa: BLE001 - feature probe
        results["pallas_dg_axis0"] = {"error": repr(e)[:400]}

    # --- same gather OUTSIDE pallas (XLA take_along_axis) ------------
    try:
        @jax.jit
        def xla_taa(x):
            xb = jnp.broadcast_to(x, (n_pad, k))
            return jnp.take_along_axis(xb, idx, axis=0)

        out = xla_taa(x0)
        ok = np.allclose(np.asarray(out),
                         np.asarray(x0)[:, 0][idx_np])
        ms = chain_ms(
            lambda x: x + eps * jnp.sum(xla_taa(x), axis=1, keepdims=True), x0)
        results["xla_take_along_axis0"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - results["scan_null_ms"])
                                * 1e6 / (n_pad * k), 3)}
    except Exception as e:  # noqa: BLE001
        results["xla_take_along_axis0"] = {"error": repr(e)[:400]}

    # --- XLA row-gather reference on the same indices ----------------
    def xla_gather(x):
        cols = [x[:, 0].at[idx[:, c]].get(mode="promise_in_bounds")
                for c in range(k)]
        return jnp.stack(cols, axis=1)

    ms = chain_ms(lambda x: x + eps * jnp.sum(xla_gather(x), axis=1, keepdims=True),
                  x0)
    results["xla_row_gather"] = {
        "ms": round(ms, 4),
        "ns_per_row": round((ms - results["scan_null_ms"])
                            * 1e6 / (n_pad * k), 3)}

    # --- axis-1 (lane) dynamic_gather: (N, K) table, per-row lane ----
    t0_np = rng.randn(n_pad, k).astype(np.float32)
    lane_idx_np = rng.randint(0, k, size=(n_pad, k)).astype(np.int32)
    t0 = jnp.asarray(t0_np)
    lane_idx = jnp.asarray(lane_idx_np)

    def kernel1(t_ref, li_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], li_ref[:], axis=1)

    try:
        g1 = pl.pallas_call(
            kernel1,
            out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda t: g1(t, lane_idx))(t0)
        ref = np.take_along_axis(t0_np, lane_idx_np, axis=1)
        ok = np.allclose(np.asarray(out), ref)
        ms = chain_ms(
            lambda t: t * (1 + eps) + eps * g1(t, lane_idx), t0)
        results["pallas_dg_axis1"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - results["scan_null_ms"])
                                * 1e6 / (n_pad * k), 3)}
    except Exception as e:  # noqa: BLE001
        results["pallas_dg_axis1"] = {"error": repr(e)[:400]}

    # --- fused probe: 3-component position gather in ONE kernel ------
    p0_np = rng.randn(n_pad, 3).astype(np.float32)
    p0 = jnp.asarray(p0_np)

    def kernel3(p_ref, idx_ref, o_ref):
        for c in range(3):
            xb = jnp.broadcast_to(p_ref[:, c:c + 1], (n_pad, k))
            o_ref[:, c * k:(c + 1) * k] = jnp.take_along_axis(
                xb, idx_ref[:], axis=0)

    try:
        g3 = pl.pallas_call(
            kernel3,
            out_shape=jax.ShapeDtypeStruct((n_pad, 3 * k),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda p: g3(p, idx))(p0)
        ref = np.concatenate([p0_np[idx_np, c] for c in range(3)],
                             axis=1)
        ok = np.allclose(np.asarray(out), ref)
        ms = chain_ms(
            lambda p: p + eps * jnp.sum(
                g3(p, idx), axis=1, keepdims=True), p0)
        results["pallas_pos_gather_3c"] = {
            "correct": bool(ok), "ms": round(ms, 4),
            "ns_per_row": round((ms - results["scan_null_ms"])
                                * 1e6 / (n_pad * k * 3), 3)}
    except Exception as e:  # noqa: BLE001
        results["pallas_pos_gather_3c"] = {"error": repr(e)[:400]}

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_dynamic_gather.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
