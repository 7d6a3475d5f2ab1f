import os
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
import jax, time
import numpy as np, jax.numpy as jnp
from uf3_tpu.data.atoms import bulk
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.ops import pallas_trio as pt
from uf3_tpu.ops import pallas_trio_t as ptt

model = ls.WeightedLinearModel.from_json('benchmarks_data/model_2and3.json')
geom = bulk('W', 'bcc', a=3.1652) * (17, 17, 17)
n = len(geom)
sys = MDSystem(model, geom, dtype=jnp.float32, rebuild_every=18, skin=0.9,
               capacity_2b=76, capacity_3b=16)
pos = jnp.asarray(geom.positions, dtype=jnp.float32)
nbr2, nbr3 = jax.jit(sys.build_lists)(pos)
b = sys.trio_bundle
ref = jax.jit(lambda p: pt.trio_forces_unrolled(b.grid, p, sys.cell, nbr3.idx, nbr3.shift,
     nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n, l_basis=b.l_basis,
     n_basis=b.n_basis, block_atoms=512)[1])
fr = ref(pos); _=float(jnp.sum(fr))
for ba in (128, 512):
    try:
        t3 = jax.jit(lambda p, ba=ba: ptt.trio_forces_pallas_t(b.grid, p, sys.cell, nbr3.idx,
            nbr3.shift, nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n,
            l_basis=b.l_basis, n_basis=b.n_basis, block_atoms=ba)[1])
        t0=time.time()
        f = t3(pos); err = float(jnp.max(jnp.abs(f - fr)))
        print(f'pallas-t ba={ba}: compile {time.time()-t0:.0f}s, maxdiff {err:.2e}', flush=True)
        q=pos
        for _ in range(5): q = pos + 1e-9*t3(q)
        _=float(jnp.sum(q))
        t0=time.time()
        q=pos
        for _ in range(30): q = pos + 1e-9*t3(q)
        _=float(jnp.sum(q))
        print(f'pallas-t ba={ba}:', round((time.time()-t0)/30*1e3,2), 'ms', flush=True)
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if 'tpu.' in l or 'Mosaic' in l][:3]
        print(f'pallas-t ba={ba} FAILED:', key if key else msg[:300], flush=True)
