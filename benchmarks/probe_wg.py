"""
Probe: Mosaic primitives for the windowed VMEM gather scheme.

The general (N, K) neighbor gather out[i,k] = x[idx[i,k]] cannot be a
single Mosaic dynamic_gather (sublane gathers crash beyond 8 rows,
probe_dg3).  The decomposition under test: reshape a value window to
(8, L) so an atom index inside the window splits into (sublane s,
lane c); then for each of the 8 sublane rows, sublane-broadcast the
row and lane-gather it at c, accumulating through a one-hot on s:

  out[i,k] = sum_t (s[i,k] == t) * row_t[c[i,k]]

Cases probed (each independent, guarded):
  P1  lane gather, table width 128/256/512/1280, idx width 16
  P2  take_along_axis axis-0 with an 8-row table and 256-row idx
  P3  dynamic sublane row read + broadcast (traced row t)
  P4  full composite: windowed gather of 9856 values, checked vs
      numpy, timed vs the XLA row gather
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


def try_case(results, name, build, check=None):
    try:
        out = build()
        jax.block_until_ready(out)
        entry = {"compiles": True}
        if check is not None:
            entry["correct"] = bool(check(np.asarray(out)))
        results[name] = entry
    except Exception as e:  # noqa: BLE001 - feature probe
        results[name] = {"error": repr(e)[:200]}


def main():
    rng = np.random.RandomState(0)
    results = {}
    ba, k = 256, 16

    # ---- P1: lane gather from wide tables --------------------------
    for width in (128, 256, 512, 1280):
        t_np = rng.randn(ba, width).astype(np.float32)
        li_np = rng.randint(0, width, size=(ba, k)).astype(np.int32)
        t0, li = jnp.asarray(t_np), jnp.asarray(li_np)

        def kernel(t_ref, li_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], li_ref[:], axis=1)

        def build(kernel=kernel, t0=t0, li=li, width=width):
            g = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ba, k), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return jax.jit(lambda t: g(t, li))(t0)

        try_case(results, f"lane_gather_w{width}", build,
                 lambda out, t_np=t_np, li_np=li_np:
                 np.allclose(out, np.take_along_axis(t_np, li_np,
                                                     axis=1)))

    # ---- P2: 8-row sublane gather, 256-row index array -------------
    t_np = rng.randn(8, 128).astype(np.float32)
    si_np = rng.randint(0, 8, size=(ba, 128)).astype(np.int32)
    t0, si = jnp.asarray(t_np), jnp.asarray(si_np)

    def kernel_p2(t_ref, si_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], si_ref[:], axis=0)

    def build_p2():
        g = pl.pallas_call(
            kernel_p2,
            out_shape=jax.ShapeDtypeStruct((ba, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda t: g(t, si))(t0)

    try_case(results, "sublane_gather_8row_256idx", build_p2,
             lambda out: np.allclose(
                 out, np.take_along_axis(t_np, si_np, axis=0)))

    # ---- P3: traced sublane row read + broadcast --------------------
    w_np = rng.randn(8, 128).astype(np.float32)
    w0 = jnp.asarray(w_np)

    def kernel_p3(w_ref, t_ref, o_ref):
        t = t_ref[0]
        row = w_ref[pl.ds(t, 1), :]               # (1, 128) dynamic
        o_ref[:] = jnp.broadcast_to(row, (ba, 128))

    def build_p3():
        g = pl.pallas_call(
            kernel_p3,
            out_shape=jax.ShapeDtypeStruct((ba, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda w: g(w, jnp.array([5],
                                                dtype=jnp.int32)))(w0)

    try_case(results, "dyn_sublane_broadcast", build_p3,
             lambda out: np.allclose(out, np.broadcast_to(
                 w_np[5:6], (ba, 128))))

    # ---- P4: composite windowed gather over the full table ----------
    # values laid out (8, L); idx full-range; 8-iteration one-hot over
    # sublane rows with a lane gather per row.
    n = 9856
    L = n // 8  # 1232
    x_np = rng.randn(n).astype(np.float32)
    idx_np = rng.randint(0, n, size=(n, k)).astype(np.int32)
    # (8, L) layout: j = s * L + c
    xf_np = x_np.reshape(8, L)
    s_np = (idx_np // L).astype(np.int32)
    c_np = (idx_np % L).astype(np.int32)
    xf = jnp.asarray(xf_np)
    s_i = jnp.asarray(s_np)
    c_i = jnp.asarray(c_np)
    eps = jnp.float32(1e-30)

    def kernel_p4(xf_ref, s_ref, c_ref, o_ref):
        i = pl.program_id(0)
        sb = s_ref[:]
        cb = c_ref[:]
        acc = jnp.zeros((ba, k), jnp.float32)
        for t in range(8):
            row = xf_ref[pl.ds(t, 1), :]           # (1, L)
            bc = jnp.broadcast_to(row, (ba, L))
            g = jnp.take_along_axis(bc, cb, axis=1)
            acc = acc + jnp.where(sb == t, g, 0.0)
        o_ref[:] = acc

    def build_p4():
        g = pl.pallas_call(
            kernel_p4,
            grid=(n // ba,),
            in_specs=[
                pl.BlockSpec((8, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ba, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ba, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ba, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        )
        return jax.jit(lambda x: g(x, s_i, c_i))(xf)

    try_case(results, "composite_full_onehot8", build_p4,
             lambda out: np.allclose(out, x_np[idx_np]))

    if results["composite_full_onehot8"].get("correct"):
        g = pl.pallas_call(
            kernel_p4,
            grid=(n // ba,),
            in_specs=[
                pl.BlockSpec((8, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ba, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ba, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ba, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        )
        x0 = jnp.asarray(xf_np)
        results["null_ms"] = round(
            chain_ms(lambda x: x * (1.0 + eps), x0), 4)
        results["composite_ms"] = round(chain_ms(
            lambda x: x + eps * jnp.sum(
                g(x, s_i, c_i)).reshape(1, 1), x0), 4)

        # XLA row-gather reference on the same indices
        xr = jnp.asarray(x_np[:, None])
        idx = jnp.asarray(idx_np)

        def xla_gather(x):
            cols = [x[:, 0].at[idx[:, c]].get(mode="promise_in_bounds")
                    for c in range(k)]
            return jnp.stack(cols, axis=1)

        results["xla_row_gather_ms"] = round(chain_ms(
            lambda x: x + eps * jnp.sum(
                xla_gather(x)).reshape(1, 1), xr), 4)

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_wg.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
