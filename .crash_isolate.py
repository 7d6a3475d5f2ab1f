import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
import jax, time
import numpy as np, jax.numpy as jnp
from uf3_tpu.data.atoms import bulk
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.ops import potential as pot, neighbors as nb, pallas_trio as pt

model = ls.WeightedLinearModel.from_json('benchmarks_data/model_2and3.json')
geom = bulk('W', 'bcc', a=3.1652) * 8   # 1024 atoms
n = len(geom); print('atoms', n, flush=True)
params, static = pot.build_potential(model, dtype=jnp.float32)
species = params.z_to_species[jnp.asarray(geom.numbers)]
pos = jnp.asarray(geom.positions, dtype=jnp.float32)
cell = jnp.asarray(geom.cell, dtype=jnp.float32)
nbr3 = nb.build_neighbor_list(pos, cell, geom.pbc, float(params.r_cut_3b)+0.9, 16)
b = pt.build_trio_pallas(model, dtype=jnp.float32)

print('--- test 1: unrolled tiny (N=1024, block 512)', flush=True)
t3 = jax.jit(lambda p: pt.trio_forces_unrolled(b.grid, p, cell, nbr3.idx, nbr3.shift,
     nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n, l_basis=b.l_basis,
     n_basis=b.n_basis, block_atoms=512)[1])
y = t3(pos); print('result', float(jnp.sum(y)), flush=True)
q = pos
for _ in range(10): q = pos + 1e-9*t3(q)
_=float(jnp.sum(q))
t0=time.time()
q = pos
for _ in range(20): q = pos + 1e-9*t3(q)
_=float(jnp.sum(q))
print('tiny unrolled ok:', round((time.time()-t0)/20*1e3,2), 'ms', flush=True)

print('--- test 2: factorized einsum tiny', flush=True)
f3 = jax.jit(lambda p: pot.trio_contributions_factorized(params, static, species, p, cell, nbr3)[1])
y = f3(pos); print('result', float(jnp.sum(y)), flush=True)
print('ok', flush=True)
