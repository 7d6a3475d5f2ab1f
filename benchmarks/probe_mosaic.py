"""
Probe: which constructs of the trio block compute Mosaic can compile.

Round-3 probes established that the FULL `_trio_block_compute` inside
one pallas_call crashes the remote Mosaic compiler (HTTP 500 from
tpu_compile_helper), while a bare lane dynamic-gather kernel compiles
and runs.  This probe bisects: each candidate construct is compiled as
its own minimal kernel on production-like shapes, recording
compile-ok / correct / error, so the fused kernel can be designed
around the crashers instead of guessing.

Writes benchmarks_data/artifacts/probe_mosaic.json.
"""

import json
import os
import sys

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

sys.path.insert(0, REPO)

BA, K = 512, 16
LANES = K * K


def try_kernel(name, kernel, inputs, out_shape, ref_fn=None,
               results=None):
    """Compile + run one single-block kernel; record ok/correct."""
    try:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(call)(*inputs)
        jax.block_until_ready(out)
        entry = {"compiles": True}
        if ref_fn is not None:
            ref = ref_fn(*inputs)
            entry["correct"] = bool(np.allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5))
        results[name] = entry
    except Exception as e:  # noqa: BLE001 - feature probe
        results[name] = {"compiles": False, "error": repr(e)[:200]}
    print(f"{name}: {results[name]}", flush=True)


def main():
    rng = np.random.RandomState(0)
    a16 = jnp.asarray(rng.randn(BA, K).astype(np.float32))
    a256 = jnp.asarray(rng.randn(BA, LANES).astype(np.float32))
    results = {"platform": jax.devices()[0].platform}

    # 1. lane tile (BA, K) -> (BA, K*K)
    try_kernel(
        "tile_lanes",
        lambda x_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.tile(x_ref[:], (1, K))),
        [a16], ((BA, LANES), jnp.float32),
        lambda x: jnp.tile(x, (1, K)), results)

    # 2. lane repeat (BA, K) -> (BA, K*K)
    try_kernel(
        "repeat_lanes",
        lambda x_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.repeat(x_ref[:], K, axis=-1)),
        [a16], ((BA, LANES), jnp.float32),
        lambda x: jnp.repeat(x, K, axis=-1), results)

    # 3. pltpu.repeat variant
    try_kernel(
        "pltpu_repeat",
        lambda x_ref, o_ref: o_ref.__setitem__(
            slice(None), pltpu.repeat(x_ref[:], K, axis=1)),
        [a16], ((BA, LANES), jnp.float32),
        None, results)

    # 4. 3D broadcasted_iota + compare one-hot (the transposed
    #    dense-basis scatter): (BA, 12, LANES)
    idx_lane = jnp.asarray(
        rng.randint(0, 9, size=(BA, LANES)).astype(np.int32))

    def k_onehot3d(i_ref, o_ref):
        ext = (jax.lax.broadcasted_iota(
            jnp.int32, (BA, 12, LANES), 1)
            == i_ref[:][:, None, :]).astype(jnp.float32)
        o_ref[:] = jnp.sum(ext, axis=1)

    try_kernel("onehot_3d_middle", k_onehot3d, [idx_lane],
               ((BA, LANES), jnp.float32),
               lambda i: jnp.ones((BA, LANES), jnp.float32), results)

    # 5. 2D one-hot + 4-tap shifted-slice FMA (dense basis, per-basis
    #    2D variant: one (BA, LANES) compare per window position)
    def k_onehot2d(i_ref, x_ref, o_ref):
        acc = jnp.zeros((BA, LANES), jnp.float32)
        for w in range(9):
            oh = (i_ref[:] == w).astype(jnp.float32)
            acc = acc + oh * x_ref[:] * float(w + 1)
        o_ref[:] = acc

    try_kernel("onehot_2d_unrolled", k_onehot2d, [idx_lane, a256],
               ((BA, LANES), jnp.float32),
               lambda i, x: sum(
                   (i == w).astype(jnp.float32) * x * float(w + 1)
                   for w in range(9)), results)

    # 6. small matmul (BA*K, 3) @ (3, 27)
    m_small = jnp.asarray(rng.randn(3, 27).astype(np.float32))
    a3 = jnp.asarray(rng.randn(BA * K, 3).astype(np.float32))
    try_kernel(
        "matmul_tiny_k3",
        lambda x_ref, w_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.dot(x_ref[:], w_ref[:],
                                 preferred_element_type=jnp.float32)),
        [a3, m_small], ((BA * K, 27), jnp.float32),
        lambda x, w: x @ w, results)

    # 7. 4D reshape + static middle index (the h tensor pattern)
    h_flat = jnp.asarray(rng.randn(BA * K, 27).astype(np.float32))

    def k_reshape4d(h_ref, o_ref):
        h4 = h_ref[:].reshape(BA, K, 3, 9)
        o_ref[:] = jnp.tile(h4[:, :, 1, :].reshape(BA, K * 9),
                            (1, 2))[:, :LANES]

    try_kernel("reshape_4d_index", k_reshape4d, [h_flat],
               ((BA, LANES), jnp.float32), None, results)

    # 8. (BA, LANES) -> (BA, K, K) reshape + sum axis 2 (t1 reduce)
    def k_reduce_kk(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:].reshape(BA, K, K), axis=2)

    try_kernel("reshape_kk_reduce", k_reduce_kk, [a256],
               ((BA, K), jnp.float32),
               lambda x: jnp.sum(x.reshape(BA, K, K), axis=2),
               results)

    # 9. sum axis 1 of the same reshape (reduce over sublane-ish axis)
    def k_reduce_kk1(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:].reshape(BA, K, K), axis=1)

    try_kernel("reshape_kk_reduce_ax1", k_reduce_kk1, [a256],
               ((BA, K), jnp.float32),
               lambda x: jnp.sum(x.reshape(BA, K, K), axis=1),
               results)

    # 10. cardinal-spline interval math: floor/clip/int cast on lanes
    def k_cardinal(x_ref, o_ref):
        t = x_ref[:] * 2.5 + 4.0
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, 8)
        u = t - i.astype(jnp.float32)
        o_ref[:] = u * u * (3.0 - 2.0 * u) + i.astype(jnp.float32)

    try_kernel("cardinal_interval", k_cardinal, [a256],
               ((BA, LANES), jnp.float32), None, results)

    # 11. lane take_along_axis within K columns (known-good control)
    li = jnp.asarray(rng.randint(0, K, size=(BA, K)).astype(np.int32))
    try_kernel(
        "lane_taa_k16",
        lambda x_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(x_ref[:], i_ref[:],
                                             axis=1)),
        [a16, li], ((BA, K), jnp.float32),
        lambda x, i: jnp.take_along_axis(x, i, axis=1), results)

    # 12. lane take_along_axis from 256 lanes with (BA, 256) indices
    li256 = jnp.asarray(
        rng.randint(0, LANES, size=(BA, LANES)).astype(np.int32))
    try_kernel(
        "lane_taa_256",
        lambda x_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(x_ref[:], i_ref[:],
                                             axis=1)),
        [a256, li256], ((BA, LANES), jnp.float32),
        lambda x, i: jnp.take_along_axis(x, i, axis=1), results)

    # 13. multiple outputs from one kernel
    try:
        def k_multi(x_ref, o1_ref, o2_ref):
            o1_ref[:] = x_ref[:] * 2.0
            o2_ref[:] = x_ref[:] + 1.0

        call = pl.pallas_call(
            k_multi,
            out_shape=(jax.ShapeDtypeStruct((BA, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((BA, LANES), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)))
        o1, o2 = jax.jit(call)(a256)
        jax.block_until_ready(o1)
        results["multi_output"] = {"compiles": True}
    except Exception as e:  # noqa: BLE001
        results["multi_output"] = {"compiles": False,
                                   "error": repr(e)[:200]}
    print(f"multi_output: {results['multi_output']}", flush=True)

    # 14. grid + 3D coefficient input indexed statically
    grid3 = jnp.asarray(rng.randn(9, 9, 15).astype(np.float32))

    def k_grid3(g_ref, x_ref, o_ref):
        acc = jnp.zeros((BA, LANES), jnp.float32)
        for b in range(3):
            for c in range(3):
                acc = acc + g_ref[b, b, c] * x_ref[:]
        o_ref[:] = acc

    try_kernel("grid3_scalar_index", k_grid3, [grid3, a256],
               ((BA, LANES), jnp.float32), None, results)

    # 15. full-window sqrt/where/rsqrt chain (r_mn pattern)
    def k_rchain(x_ref, o_ref):
        r2 = x_ref[:] * x_ref[:]
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        o_ref[:] = x_ref[:] / r

    try_kernel("sqrt_where_div", k_rchain, [a256],
               ((BA, LANES), jnp.float32), None, results)

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_mosaic.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
