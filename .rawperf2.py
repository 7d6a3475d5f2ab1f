import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
import jax, jax.numpy as jnp, time, numpy as np

def timeit_chain(f, x, n=20):
    # chain outputs so executions serialize, then force one readback
    y = f(x); _ = float(jnp.sum(y))  # warmup + sync
    t0 = time.time()
    y = x
    for _ in range(n):
        y = f(y)
    s = float(jnp.sum(y))  # forces full chain
    return (time.time()-t0)/n, s

x = jnp.ones((4096,4096), jnp.float32)
mm = jax.jit(lambda a: (a@a)*1e-3)
t, s = timeit_chain(mm, x)
print('f32 matmul 4096^3:', round(t*1e3,3), 'ms ->', round(2*4096**3/t/1e12,1), 'TFLOP/s', flush=True)

xb = jnp.ones((4096,4096), jnp.bfloat16)
mmb = jax.jit(lambda a: (a@a)*1e-3)
t, s = timeit_chain(mmb, xb)
print('bf16 matmul:', round(t*1e3,3), 'ms ->', round(2*4096**3/t/1e12,1), 'TFLOP/s', flush=True)

z = jnp.ones((128*1024*1024,), jnp.float32)  # 512MB
add = jax.jit(lambda a: a*1.000001 + 1e-9)
t, s = timeit_chain(add, z, n=10)
print('elementwise 512MB rw:', round(t*1e3,2), 'ms ->', round(2*z.nbytes/t/1e9,1), 'GB/s', flush=True)

c = jnp.ones((157216, 16, 16), jnp.float32)
bm = jax.jit(lambda a: jnp.einsum('nij,njk->nik', a, a)*1e-2)
t, s = timeit_chain(bm, c, n=10)
print('batched tiny matmul:', round(t*1e3,2), 'ms', flush=True)
