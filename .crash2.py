import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
import jax, time
import numpy as np, jax.numpy as jnp
from uf3_tpu.data.atoms import bulk
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.ops import potential as pot, neighbors as nb, pallas_trio as pt
from uf3_tpu.ops.pallas_trio import _trio_block_compute, _assemble_forces

model = ls.WeightedLinearModel.from_json('benchmarks_data/model_2and3.json')
b = pt.build_trio_pallas(model, dtype=jnp.float32)
params, static = pot.build_potential(model, dtype=jnp.float32)
dev = jax.devices()[0]
print('memory stats:', {k: v//2**20 for k, v in (dev.memory_stats() or {}).items() if 'bytes' in k}, flush=True)

def make(n_reps):
    geom = bulk('W', 'bcc', a=3.1652) * n_reps
    pos = jnp.asarray(geom.positions, dtype=jnp.float32)
    cell = jnp.asarray(geom.cell, dtype=jnp.float32)
    nbr3 = nb.build_neighbor_list(pos, cell, geom.pbc, float(params.r_cut_3b)+0.9, 16)
    return geom, pos, cell, nbr3

# map-only (no assembly) at 9826
geom, pos, cell, nbr3 = make((17,17,17))
print('n', len(geom), flush=True)

@jax.jit
def map_only(p):
    d = (p[nbr3.idx] + nbr3.shift @ cell - p[:, None, :])
    n_atoms = d.shape[0]
    padn = (-n_atoms) % 512
    d_b = jnp.pad(d, ((0,padn),(0,0),(0,0))).reshape(-1, 512, 16, 3)
    m_b = jnp.pad(nbr3.mask, ((0,padn),(0,0))).reshape(-1, 512, 16)
    e, fc, s1, s3, v3 = jax.lax.map(lambda ab: _trio_block_compute(ab[0], ab[1], b.grid, b.spec_l, b.spec_n, b.l_basis, b.n_basis), (d_b, m_b))
    return fc.reshape(-1,3)[:n_atoms]

print('--- map-only 9826', flush=True)
y = map_only(pos); print('map-only ok', float(jnp.sum(y)), flush=True)
print('memory stats:', {k: v//2**20 for k, v in (dev.memory_stats() or {}).items() if 'bytes' in k}, flush=True)

print('--- full unrolled 9826 block 512', flush=True)
t3 = jax.jit(lambda p: pt.trio_forces_unrolled(b.grid, p, cell, nbr3.idx, nbr3.shift,
     nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n, l_basis=b.l_basis,
     n_basis=b.n_basis, block_atoms=512)[1])
y = t3(pos); print('full ok', float(jnp.sum(y)), flush=True)
for _ in range(5): y = t3(pos + 1e-9*y)
_ = float(jnp.sum(y))
t0=time.time()
q=pos
for _ in range(20): q = pos + 1e-9*t3(q)
_=float(jnp.sum(q))
print('unrolled 9826:', round((time.time()-t0)/20*1e3,2), 'ms', flush=True)
