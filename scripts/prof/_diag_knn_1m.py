import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, time
from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp
from sapcu_tpu import ops

mode = sys.argv[1]; nref = int(sys.argv[2]); nq = int(sys.argv[3]); ck = int(sys.argv[4])
rng = np.random.default_rng(0)
refs = jnp.asarray((rng.normal(size=(nref,3))*0.3).astype(np.float32))
qs = jnp.asarray((rng.normal(size=(nq,3))*0.3).astype(np.float32))
t0=time.time()
d, i = ops.knn_tiled(qs, refs, k=30, chunk=ck, approx=(mode=="approx"))
print(mode, nref, nq, 'sum', float(jnp.sum(d)), f'{time.time()-t0:.1f}s')
