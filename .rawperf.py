import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
import jax, jax.numpy as jnp, time, numpy as np

def timeit(f, *a, n=5):
    f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(n):
        t0=time.time(); jax.block_until_ready(f(*a)); ts.append(time.time()-t0)
    return min(ts)

# matmul f32 and bf16
for dt, name in [(jnp.float32,'f32'), (jnp.bfloat16,'bf16')]:
    x = jnp.ones((4096,4096), dt); y = jnp.ones((4096,4096), dt)
    mm = jax.jit(lambda a,b: a@b)
    t = timeit(mm, x, y)
    print(name, 'matmul 4096^3:', round(t*1e3,2), 'ms ->', round(2*4096**3/t/1e12,1), 'TFLOP/s', flush=True)

# bandwidth: elementwise add of 512MB
x = jnp.ones((64*1024*1024,), jnp.float32)
add = jax.jit(lambda a: a*1.5 + 2.0)
t = timeit(add, x)
print('elementwise 256MB read+write:', round(t*1e3,2), 'ms ->', round(2*x.nbytes/t/1e9,1), 'GB/s', flush=True)

# batched tiny matmul like our trio einsum
c = jnp.ones((9826*16, 16, 16), jnp.float32)
h = jnp.ones((9826*16, 16, 16), jnp.float32)
bm = jax.jit(lambda a,b: jnp.einsum('nij,njk->nik', a, b))
t = timeit(bm, c, h)
print('batched tiny matmul (157k x 16x16x16):', round(t*1e3,2), 'ms', flush=True)
