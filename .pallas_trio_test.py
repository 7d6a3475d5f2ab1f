import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
import jax, time
import numpy as np, jax.numpy as jnp
from uf3_tpu.data.atoms import bulk
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.ops import pallas_trio as pt

model = ls.WeightedLinearModel.from_json('benchmarks_data/model_2and3.json')
geom = bulk('W', 'bcc', a=3.1652) * (17, 17, 17)
n = len(geom); print('atoms', n, flush=True)
sys = MDSystem(model, geom, dtype=jnp.float32, rebuild_every=18, skin=0.9,
               capacity_2b=76, capacity_3b=16)
pos = jnp.asarray(geom.positions, dtype=jnp.float32)
nbr2, nbr3 = jax.jit(sys.build_lists)(pos)
b = sys.trio_bundle

def mk(ba):
    return jax.jit(lambda p: pt.trio_forces_pallas(b.grid, p, sys.cell, nbr3.idx, nbr3.shift,
        nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n, l_basis=b.l_basis,
        n_basis=b.n_basis, block_atoms=ba)[1])

ref = jax.jit(lambda p: pt.trio_forces_unrolled(b.grid, p, sys.cell, nbr3.idx, nbr3.shift,
     nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n, l_basis=b.l_basis,
     n_basis=b.n_basis, block_atoms=512)[1])
fr = ref(pos); _=float(jnp.sum(fr))
print('ref ok', flush=True)

for ba in (64, 256):
    try:
        t0=time.time()
        f = mk(ba)(pos); err = float(jnp.max(jnp.abs(f - fr)))
        print(f'pallas ba={ba}: compile {time.time()-t0:.0f}s, maxdiff vs unrolled {err:.2e}', flush=True)
        t3 = mk(ba)
        q=pos
        for _ in range(5): q = pos + 1e-9*t3(q)
        _=float(jnp.sum(q))
        t0=time.time()
        q=pos
        for _ in range(30): q = pos + 1e-9*t3(q)
        _=float(jnp.sum(q))
        print(f'pallas trio ba={ba}:', round((time.time()-t0)/30*1e3,2), 'ms', flush=True)
    except Exception as e:
        print(f'pallas ba={ba} FAILED: {type(e).__name__}: {str(e)[:500]}', flush=True)
