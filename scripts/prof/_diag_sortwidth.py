import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, time
from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp

w = int(sys.argv[1])
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(256, w)).astype(np.float32))
f = jax.jit(lambda a: jax.lax.top_k(-a, 30)[0])
t0=time.time()
print('width', w, 'sum', float(jnp.sum(f(x))), f'{time.time()-t0:.1f}s')
