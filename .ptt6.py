import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
import jax
import numpy as np, jax.numpy as jnp
from uf3_tpu.data.atoms import bulk
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.ops import pallas_trio as pt
from uf3_tpu.ops import pallas_trio_t as ptt
model = ls.WeightedLinearModel.from_json('benchmarks_data/model_2and3.json')
geom = bulk('W', 'bcc', a=3.1652) * (17, 17, 17)
sys = MDSystem(model, geom, dtype=jnp.float32, rebuild_every=18, skin=0.9,
               capacity_2b=76, capacity_3b=16)
pos = jnp.asarray(geom.positions, dtype=jnp.float32)
nbr2, nbr3 = jax.jit(sys.build_lists)(pos)
b = sys.trio_bundle
try:
    f = ptt.trio_forces_pallas_t(b.grid, pos, sys.cell, nbr3.idx,
        nbr3.shift, nbr3.mask, nbr3.rev, spec_l=b.spec_l, spec_n=b.spec_n,
        l_basis=b.l_basis, n_basis=b.n_basis, block_atoms=128)[1]
    print('ok')
except Exception as e:
    for line in str(e).splitlines():
        if 'tpu.' in line or 'gather' in line.lower() or 'vector<' in line:
            print(line[:250], flush=True)
