import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
import jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0
@jax.jit
def double(x):
    return pl.pallas_call(kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
t0=time.time()
y = double(jnp.ones((256, 128)))
print('pallas ok:', float(jnp.sum(y)), 'compile', round(time.time()-t0,1), flush=True)
