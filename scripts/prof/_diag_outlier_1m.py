import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, time
from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax.numpy as jnp
from sapcu_tpu.generate import pipeline as pl

cap, n = 1048576, 665561
rng = np.random.default_rng(0)
pts = jnp.asarray((rng.normal(size=(cap,3))*0.3).astype(np.float32))
valid = jnp.arange(cap) < n
ck = pl._outlier_chunk(cap)
print('chunk =', ck)
t0=time.time()
keep = pl._outlier_mask(pts, valid, 1.5, chunk=ck, approx=False)
print('kept', int(jnp.sum(keep)), f'in {time.time()-t0:.1f}s (incl compile)')
t0=time.time()
keep = pl._outlier_mask(pts*1.01, valid, 1.5, chunk=ck, approx=False)
print('warm rerun kept', int(jnp.sum(keep)), f'in {time.time()-t0:.1f}s')
