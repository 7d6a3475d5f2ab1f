import os, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from uf3_tpu.ops.pallas_trio import LegSpec
from uf3_tpu.ops import pallas_trio_t as ptt

spec_l = LegSpec(0, 1.5, 1/3, 6, 1.5, 3.5, 9)
spec_n = LegSpec(0, 1.5, 0.4583333333, 12, 1.5, 7.0, 15)
K, BA, L, NC = 16, 128, 9, 15

def try_lower(name, kernel, out_shapes, in_specs, out_specs, args):
    try:
        f = lambda *a: pl.pallas_call(kernel, grid=(2,), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shapes)(*a)
        jax.jit(f).lower(*args)
        print(name, 'LOWER OK')
    except Exception as e:
        print(name, 'FAIL:', str(e).splitlines()[0][:150])

blk = lambda *lead: pl.BlockSpec(lead + (BA,), lambda i: (0,)*len(lead) + (i,), memory_space=pltpu.VMEM)
d = jnp.ones((K, 3, 2*BA), jnp.float32)
valid = jnp.ones((K, 2*BA), jnp.float32)
grid_in = jnp.ones((L, L*NC), jnp.float32)
gspec = pl.BlockSpec((L, L*NC), lambda i: (0, 0), memory_space=pltpu.VMEM)

# stage 1: basis slices only
def k1(d_ref, v_ref, g_ref, o_ref):
    dd = d_ref[:]
    vf = v_ref[:]
    r2 = dd[:,0,:]**2 + dd[:,1,:]**2 + dd[:,2,:]**2
    r = jnp.sqrt(jnp.where(r2>0, r2, 1.0))
    a_vals, a_ders = ptt._basis_slices(r, vf, spec_l)
    o_ref[:] = sum(a_vals)
try_lower('basis_slices', k1, jax.ShapeDtypeStruct((K, 2*BA), jnp.float32),
          [blk(K,3), blk(K), gspec], blk(K), (d, valid, grid_in))

# stage 2: + pair distances + c slices
def k2(d_ref, v_ref, g_ref, o_ref):
    dd = d_ref[:]
    vf = v_ref[:]
    d_mn = dd[None,:,:,:] - dd[:,None,:,:]
    r_mn2 = d_mn[:,:,0,:]**2 + d_mn[:,:,1,:]**2 + d_mn[:,:,2,:]**2
    r_mn = jnp.sqrt(jnp.where(r_mn2>0, r_mn2, 1.0))
    pair_f = vf[None,:,:]*vf[:,None,:]
    c_vals, c_ders = ptt._basis_slices(r_mn, pair_f, spec_n)
    o_ref[:] = sum(c_vals).sum(axis=0)
try_lower('c_slices', k2, jax.ShapeDtypeStruct((K, 2*BA), jnp.float32),
          [blk(K,3), blk(K), gspec], blk(K), (d, valid, grid_in))

# stage 3: matmul H
def k3(d_ref, v_ref, g_ref, o_ref):
    dd = d_ref[:]
    vf = v_ref[:]
    r2 = dd[:,0,:]**2 + dd[:,1,:]**2 + dd[:,2,:]**2
    r = jnp.sqrt(jnp.where(r2>0, r2, 1.0))
    a_vals, _ = ptt._basis_slices(r, vf, spec_l)
    a_mat = jnp.concatenate([v[None] for v in a_vals], axis=0)
    a_flat = a_mat.reshape(L, K*BA)
    h = jnp.dot(g_ref[:].T, a_flat, preferred_element_type=jnp.float32)
    row = h[3].reshape(K, BA)
    o_ref[:] = row
try_lower('H matmul+rowslice', k3, jax.ShapeDtypeStruct((K, 2*BA), jnp.float32),
          [blk(K,3), blk(K), gspec], blk(K), (d, valid, grid_in))

# stage 4: v3 .at set
def k4(d_ref, v_ref, g_ref, o_ref):
    dd = d_ref[:]
    g3p = dd[:,0,:][:,None,:] * dd[None,:,1,:][0:1].transpose(1,0,2) if False else dd[:,0,:][:,None,:]*jnp.ones((1,K,1))
    v3 = jnp.zeros((K,3,BA), jnp.float32)
    for x in range(3):
        contrib = jnp.sum(g3p * dd[None,:,x,:], axis=1)
        v3 = v3.at[:,x,:].set(contrib)
    o_ref[:] = v3
try_lower('v3 at-set', k4, jax.ShapeDtypeStruct((K, 3, 2*BA), jnp.float32),
          [blk(K,3), blk(K), gspec], blk(K,3), (d, valid, grid_in))
