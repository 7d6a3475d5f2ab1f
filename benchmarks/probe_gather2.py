"""
Probe: building blocks for a fused VMEM-resident MD inner-force kernel.

Round-3/4 findings so far: Mosaic's lane dynamic_gather
(take_along_axis axis=1) compiles and is ~free for (N, 16) tables,
while the cross-sublane axis-0 gather crashes the compile helper.  The
fused-kernel design therefore decomposes the global neighbor gather
as: position table tiled to (T, 128) lane-rows; per tile, broadcast
the row and lane-gather with the low 7 index bits, masked by the high
bits.  This probe maps the exact Mosaic envelope that kernel needs:

  P1  lane taa, table (128, 128) broadcast-from-row, idx (128, 128)
  P4  lane taa with mismatched minor: table (N, 128), idx (N, 16)
  P2  in-kernel reshape (128, 128) -> (1024, 16)
  P3  in-kernel transpose (16, 128) -> (128, 16)
  P5  pltpu.repeat lanes 16 -> 256 and tile 16 -> 256
  P6  axis-0 taa within one (8, 128) tile
  P7  TIMING: full T-tile broadcast gather (1232, 128) vs XLA gather
  P8  TIMING: assembly alternatives (flat take variants, scatter-add)
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
results = {"platform": jax.devices()[0].platform}


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


def probe(name, fn):
    try:
        out = fn()
        results[name] = {"compiles": True}
        if out is not None:
            results[name].update(out)
    except Exception as e:  # noqa: BLE001 - feature probe
        results[name] = {"compiles": False, "error": repr(e)[:300]}
    print(name, "->", json.dumps(results[name])[:200], flush=True)


rng = np.random.RandomState(0)


# --- P1: lane taa on (128, 128) broadcast-from-row tables -------------
def p1():
    tab_np = rng.randn(128).astype(np.float32)
    idx_np = rng.randint(0, 128, size=(128, 128)).astype(np.int32)

    def kernel(row_ref, idx_ref, o_ref):
        tab = jnp.broadcast_to(row_ref[0:1, :], (128, 128))
        o_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(jnp.asarray(tab_np)[None, :], jnp.asarray(idx_np))
    ok = np.allclose(np.asarray(out), tab_np[idx_np])
    return {"correct": bool(ok)}


# --- P4: lane taa with mismatched minor (table 128, idx 16) -----------
def p4():
    n = 1024
    tab_np = rng.randn(n, 128).astype(np.float32)
    idx_np = rng.randint(0, 128, size=(n, 16)).astype(np.int32)

    def kernel(t_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=1)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(jnp.asarray(tab_np), jnp.asarray(idx_np))
    ok = np.allclose(np.asarray(out),
                     np.take_along_axis(tab_np, idx_np, axis=1))
    return {"correct": bool(ok)}


# --- P2: in-kernel reshape (128,128) -> (1024,16) ---------------------
def p2():
    x_np = rng.randn(128, 128).astype(np.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1024, 16)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(jnp.asarray(x_np))
    return {"correct": bool(np.allclose(np.asarray(out),
                                        x_np.reshape(1024, 16)))}


# --- P3: in-kernel transpose (16,128) -> (128,16) ---------------------
def p3():
    x_np = rng.randn(16, 128).astype(np.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(jnp.asarray(x_np))
    return {"correct": bool(np.allclose(np.asarray(out), x_np.T))}


# --- P5: lane repeat/tile 16 -> 256 in kernel -------------------------
def p5():
    x_np = rng.randn(256, 16).astype(np.float32)

    def kernel(x_ref, o_rep_ref, o_tile_ref):
        x = x_ref[:]
        o_rep_ref[:] = pltpu.repeat(x, 16, axis=1)
        o_tile_ref[:] = jnp.tile(x, (1, 16))

    f = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((256, 256), jnp.float32),
                   jax.ShapeDtypeStruct((256, 256), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )
    rep, til = jax.jit(f)(jnp.asarray(x_np))
    ok_t = np.allclose(np.asarray(til), np.tile(x_np, (1, 16)))
    # pltpu.repeat tiles whole arrays, np.repeat repeats elements --
    # record which semantics we got
    rep = np.asarray(rep)
    sem = ("elementwise" if np.allclose(rep, np.repeat(x_np, 16, axis=1))
           else "tiled" if np.allclose(rep, np.tile(x_np, (1, 16)))
           else "other")
    return {"tile_correct": bool(ok_t), "repeat_semantics": sem}


# --- P5b: jnp.repeat (elementwise) 16 -> 256 in kernel ----------------
def p5b():
    x_np = rng.randn(256, 16).astype(np.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.repeat(x_ref[:], 16, axis=1)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(jnp.asarray(x_np))
    return {"correct": bool(np.allclose(np.asarray(out),
                                        np.repeat(x_np, 16, axis=1)))}


# --- P6: axis-0 taa within one (8,128) tile ---------------------------
def p6():
    tab_np = rng.randn(8, 128).astype(np.float32)
    idx_np = rng.randint(0, 8, size=(8, 128)).astype(np.int32)

    def kernel(t_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=0)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(f)(jnp.asarray(tab_np), jnp.asarray(idx_np))
    ok = np.allclose(np.asarray(out),
                     np.take_along_axis(tab_np, idx_np, axis=0))
    return {"correct": bool(ok)}


# --- P7: TIMING of the T-tile broadcast gather ------------------------
def p7():
    n_pad = 9856
    n_tiles = n_pad // 128          # 77
    k = 16
    rows = n_pad * k // 128         # 1232
    x_np = rng.randn(n_pad).astype(np.float32)
    idx_np = rng.randint(0, n_pad, size=(rows, 128)).astype(np.int32)
    tiles = jnp.asarray(x_np.reshape(n_tiles, 128))
    hi = jnp.asarray((idx_np >> 7).astype(np.int32))
    lo = jnp.asarray((idx_np & 127).astype(np.int32))

    def kernel(tiles_ref, hi_ref, lo_ref, o_ref):
        lo_v = lo_ref[:]
        hi_v = hi_ref[:]

        def body(t, acc):
            tab = jnp.broadcast_to(
                tiles_ref[pl.ds(t, 1), :], (rows, 128))
            g = jnp.take_along_axis(tab, lo_v, axis=1)
            return acc + jnp.where(hi_v == t, g, 0.0)

        o_ref[:] = jax.lax.fori_loop(
            0, n_tiles, body, jnp.zeros((rows, 128), jnp.float32))

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(lambda t: f(t, hi, lo))(tiles)
    ok = np.allclose(np.asarray(out).reshape(-1),
                     x_np[idx_np.reshape(-1)])
    eps = jnp.float32(1e-30)
    x0 = jnp.asarray(x_np.reshape(n_tiles, 128))
    ms = chain_ms(lambda t: t + eps * f(t, hi, lo)[:n_tiles], x0)
    return {"correct": bool(ok), "ms": round(ms, 4)}


# --- P7b: same via unrolled python loop (static tile rows) ------------
def p7b():
    n_pad = 9856
    n_tiles = n_pad // 128
    k = 16
    rows = n_pad * k // 128
    x_np = rng.randn(n_pad).astype(np.float32)
    idx_np = rng.randint(0, n_pad, size=(rows, 128)).astype(np.int32)
    hi = jnp.asarray((idx_np >> 7).astype(np.int32))
    lo = jnp.asarray((idx_np & 127).astype(np.int32))

    def kernel(tiles_ref, hi_ref, lo_ref, o_ref):
        lo_v = lo_ref[:]
        hi_v = hi_ref[:]
        acc = jnp.zeros((rows, 128), jnp.float32)
        for t in range(n_tiles):
            tab = jnp.broadcast_to(tiles_ref[t:t + 1, :], (rows, 128))
            g = jnp.take_along_axis(tab, lo_v, axis=1)
            acc = acc + jnp.where(hi_v == t, g, 0.0)
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    tiles = jnp.asarray(x_np.reshape(n_tiles, 128))
    out = jax.jit(lambda t: f(t, hi, lo))(tiles)
    ok = np.allclose(np.asarray(out).reshape(-1),
                     x_np[idx_np.reshape(-1)])
    eps = jnp.float32(1e-30)
    ms = chain_ms(lambda t: t + eps * f(t, hi, lo)[:n_tiles], tiles)
    return {"correct": bool(ok), "ms": round(ms, 4)}


# --- P8: assembly alternatives ----------------------------------------
def p8():
    n, k = 9856, 16
    rowsxk = n * k
    tbl = jnp.asarray(rng.randn(rowsxk, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, rowsxk, size=(rowsxk,))
                      .astype(np.int32))
    out = {}
    eps = jnp.float32(1e-30)

    def one_take(t):
        g = tbl.at[idx].get(mode="promise_in_bounds")
        return t + eps * jnp.sum(g, axis=0, keepdims=True)[:1, :1]

    out["flat_take_1x_ms"] = round(chain_ms(
        one_take, jnp.zeros((1, 1), jnp.float32)), 4)

    def four_take(t):
        acc = t
        step = rowsxk // 4
        for b in range(4):
            g = tbl.at[idx[b * step:(b + 1) * step]].get(
                mode="promise_in_bounds")
            acc = acc + eps * jnp.sum(g, axis=0, keepdims=True)[:1, :1]
        return acc

    out["flat_take_4x_ms"] = round(chain_ms(
        four_take, jnp.zeros((1, 1), jnp.float32)), 4)

    # scatter-add of (NK, 3) rows into (N, 3)
    contrib = jnp.asarray(rng.randn(rowsxk, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randint(0, n, size=(rowsxk,))
                      .astype(np.int32))

    def scat(t):
        f = jnp.zeros((n, 3), jnp.float32).at[tgt].add(contrib)
        return t + eps * f[:1, :1]

    out["scatter_add_ms"] = round(chain_ms(
        scat, jnp.zeros((1, 1), jnp.float32)), 4)

    # null baseline
    out["null_ms"] = round(chain_ms(
        lambda t: t * (1.0 + eps), jnp.zeros((1, 1), jnp.float32)), 4)
    return out


def main():
    for name, fn in [("p1_lane_taa_128w", p1),
                     ("p4_lane_taa_mismatch", p4),
                     ("p2_reshape_128x128_to_1024x16", p2),
                     ("p3_transpose_16x128", p3),
                     ("p5_repeat_tile_lanes", p5),
                     ("p5b_jnp_repeat", p5b),
                     ("p6_tile_axis0_taa", p6),
                     ("p7_tilegather_fori", p7),
                     ("p7b_tilegather_unrolled", p7b),
                     ("p8_assembly_alts", p8)]:
        probe(name, fn)
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_gather2.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
