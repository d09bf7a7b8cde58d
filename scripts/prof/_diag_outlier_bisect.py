import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, time
from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax.numpy as jnp
from sapcu_tpu.generate import pipeline as pl

which = sys.argv[1]
cap = int(sys.argv[2]); approx = sys.argv[3] == "approx"; ck = int(sys.argv[4])
n = int(cap * 0.63)
rng = np.random.default_rng(0)
pts = jnp.asarray((rng.normal(size=(cap,3))*0.3).astype(np.float32))
valid = jnp.arange(cap) < n
t0=time.time()
keep = pl._outlier_mask(pts, valid, 1.5, chunk=ck, approx=approx)
print(which, 'kept', int(jnp.sum(keep)), f'in {time.time()-t0:.1f}s')
