import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, time
from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from sapcu_tpu.generate.pipeline import normalize_pointcloud, _bucket
from sapcu_tpu.ops import seeds as seeds_mod

cloud = np.loadtxt('out/oof/quality/in_2048/box_union.xyz')[:, :3]
norm, loc, scale = normalize_pointcloud(cloud)
t0=time.time()
seed_pts, n = seeds_mod.generate_seeds_device(jnp.asarray(norm.astype(np.float32)), cell=0.004, chunk=8192)
print('box_union n_seeds =', n, 'cap =', seed_pts.shape[0], 'bucket =', _bucket(n), f'({time.time()-t0:.1f}s)')
# for comparison
cloud2 = np.loadtxt('out/oof/quality/in_2048/box_sharp.xyz')[:, :3]
norm2, _, _ = normalize_pointcloud(cloud2)
sp2, n2 = seeds_mod.generate_seeds_device(jnp.asarray(norm2.astype(np.float32)), cell=0.004, chunk=8192)
print('box_sharp n_seeds =', n2, 'cap =', sp2.shape[0], 'bucket =', _bucket(n2))
