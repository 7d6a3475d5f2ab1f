import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from uf3_tpu.ops.pallas_trio import LegSpec
from uf3_tpu.ops import pallas_trio_t as ptt

spec_l = LegSpec(0, 1.5, 1/3, 6, 1.5, 3.5, 9)
spec_n = LegSpec(0, 1.5, 0.4583333333, 12, 1.5, 7.0, 15)
K, BA, L, NC = 16, 128, 9, 15
kernel = ptt.make_trio_kernel_t(spec_l, spec_n, BA, K, L, NC)
blk = lambda *lead: pl.BlockSpec(lead + (BA,), lambda i: (0,)*len(lead) + (i,), memory_space=pltpu.VMEM)
gspec = pl.BlockSpec((L, L*NC), lambda i: (0, 0), memory_space=pltpu.VMEM)
d = jnp.ones((K, 3, 2*BA), jnp.float32)
valid = jnp.ones((K, 2*BA), jnp.float32)
grid_in = jnp.ones((L, L*NC), jnp.float32)
outs = (jax.ShapeDtypeStruct((1, 2*BA), jnp.float32),
        jax.ShapeDtypeStruct((3, 2*BA), jnp.float32),
        jax.ShapeDtypeStruct((K, 2*BA), jnp.float32),
        jax.ShapeDtypeStruct((K, 2*BA), jnp.float32),
        jax.ShapeDtypeStruct((K, 3, 2*BA), jnp.float32))
f = lambda *a: pl.pallas_call(kernel, grid=(2,),
    in_specs=[blk(K,3), blk(K), gspec],
    out_specs=(blk(1), blk(3), blk(K), blk(K), blk(K,3)),
    out_shape=outs)(*a)
try:
    jax.jit(f).lower(d, valid, grid_in)
    print('FULL KERNEL LOWER OK')
except Exception as e:
    import traceback
    tb = traceback.format_exc()
    # find our source line in the traceback
    for line in tb.splitlines():
        if 'pallas_trio_t.py' in line or 'gather' in line.lower():
            print(line.strip()[:200])
