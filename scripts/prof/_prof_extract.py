"""Micro-bench: mask -> compacted index extraction variants.

CPU:  JAX_PLATFORMS=cpu python _prof_extract.py check   (correctness)
TPU:  python _prof_extract.py                           (timing; mask made
      on device, sync via 4-byte pull -- never ship 15.6MB over the tunnel)
"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from sapcu_tpu.utils.config import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp, numpy as np

M = 250 * 250 * 250
CAP = 1 << 19


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:4]))


@jax.jit
def v_nonzero(flat):
    (idx,) = jnp.nonzero(flat, size=CAP, fill_value=0)
    return idx


@jax.jit
def v_searchsorted(flat):
    c = jnp.cumsum(flat.astype(jnp.int32))
    q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, q, side="left").astype(jnp.int32)
    count = c[-1]
    return jnp.where(q <= count, idx, 0)


@jax.jit
def v_hier(flat):
    B = 1024
    c = jnp.cumsum(flat.astype(jnp.int32))          # [M]
    # block-end cumsums, with c[-1] appended to cover the ragged tail block
    S = jnp.concatenate([c[B - 1::B], c[-1:]])
    q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
    b = jnp.searchsorted(S, q, side="left").astype(jnp.int32)   # block id
    b = jnp.minimum(b, S.shape[0] - 1)
    # local binary search within block b over c[b*B : (b+1)*B]
    lo = jnp.zeros_like(q)
    hi = jnp.full_like(q, B)
    for _ in range(11):  # log2(1025) rounded up: answer range is [0, B]
        mid = (lo + hi) // 2
        val = c[jnp.minimum(b * B + mid, M - 1)]
        go_right = val < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    idx = b * B + lo
    count = c[-1]
    return jnp.where(q <= count, jnp.minimum(idx, M - 1), 0)


@jax.jit
def v_hier32(flat):
    """Pack to uint32 words; binary-search the per-word cumsum (2MB table);
    rank-select the bit inside the word with population_count."""
    W = 32
    Mp = -(-M // W) * W
    bits = jnp.pad(flat, (0, Mp - M)).reshape(-1, W).astype(jnp.uint32)
    words = jnp.sum(bits << jnp.arange(W, dtype=jnp.uint32)[None, :],
                    axis=1, dtype=jnp.uint32)                    # [Mp/W]
    wc = jax.lax.population_count(words).astype(jnp.int32)
    c32 = jnp.cumsum(wc)                                         # [Mp/W]
    nw = c32.shape[0]
    q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
    # first word w with c32[w] >= q
    lo = jnp.zeros_like(q)
    hi = jnp.full_like(q, nw)
    for _ in range(20):  # log2(488k + 1)
        mid = (lo + hi) // 2
        val = c32[jnp.minimum(mid, nw - 1)]
        go_right = val < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    b = jnp.minimum(lo, nw - 1)
    w = words[b]
    prev = jnp.where(b > 0, c32[jnp.maximum(b - 1, 0)], 0)
    r = (q - 1 - prev).astype(jnp.uint32)                        # rank in word
    # branchless in-word select of the r-th set bit
    pos = jnp.zeros_like(r)
    for width in (16, 8, 4, 2, 1):
        seg = (w >> pos) & jnp.uint32((1 << width) - 1)
        cnt = jax.lax.population_count(seg)
        go = r >= cnt
        r = r - jnp.where(go, cnt, 0)
        pos = pos + jnp.where(go, jnp.uint32(width), 0)
    idx = b * W + pos.astype(jnp.int32)
    count = c32[-1]
    return jnp.where(q <= count, jnp.minimum(idx, M - 1), 0)


@jax.jit
def v_inv(flat):
    """Search-free: build the query->word map by scatter-min of the word
    cumsum into the query axis + reverse cummin (no binary search)."""
    W = 32
    Mp = -(-M // W) * W
    bits = jnp.pad(flat, (0, Mp - M)).reshape(-1, W).astype(jnp.uint32)
    words = jnp.sum(bits << jnp.arange(W, dtype=jnp.uint32)[None, :],
                    axis=1, dtype=jnp.uint32)                    # [nw]
    wc = jax.lax.population_count(words).astype(jnp.int32)
    c32 = jnp.cumsum(wc)                                         # [nw]
    nw = c32.shape[0]
    BIG = jnp.int32(nw)
    # tmp[v] = min{w : c32[w] == v}; v clipped into [0, CAP]
    tmp = jnp.full((CAP + 1,), BIG, jnp.int32).at[
        jnp.clip(c32, 0, CAP)].min(jnp.arange(nw, dtype=jnp.int32))
    # inv[v] = min{w : c32[w] >= v} = reverse cummin
    inv = jnp.flip(jax.lax.cummin(jnp.flip(tmp)))
    q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
    b = jnp.minimum(inv[1:], nw - 1)                             # [CAP]
    w = words[b]
    prev = jnp.where(b > 0, c32[jnp.maximum(b - 1, 0)], 0)
    r = (q - 1 - prev).astype(jnp.uint32)
    pos = jnp.zeros_like(r)
    for width in (16, 8, 4, 2, 1):
        seg = (w >> pos) & jnp.uint32((1 << width) - 1)
        cnt = jax.lax.population_count(seg)
        go = r >= cnt
        r = r - jnp.where(go, cnt, 0)
        pos = pos + jnp.where(go, jnp.uint32(width), 0)
    idx = b * W + pos.astype(jnp.int32)
    count = c32[-1]
    return jnp.where(q <= count, jnp.minimum(idx, M - 1), 0)


@jax.jit
def make_mask(key, dens):
    return jax.random.uniform(key, (M,)) < dens


variants = [("nonzero", v_nonzero), ("searchsorted", v_searchsorted),
            ("hier", v_hier), ("hier32", v_hier32), ("inv", v_inv)]

if len(sys.argv) > 1 and sys.argv[1] == "check":
    flat0 = make_mask(jax.random.PRNGKey(0), 0.018)
    ref_full = np.nonzero(np.asarray(flat0))[0]
    ref = np.zeros(CAP, np.int32)
    ref[: min(CAP, ref_full.shape[0])] = ref_full[:CAP]
    for name, fn in variants:
        out = np.asarray(fn(flat0))
        print(f"correct[{name}] = {np.array_equal(out, ref)}")
    sys.exit(0)

for rep in range(3):
    flat = make_mask(jax.random.PRNGKey(rep), 0.017 + 0.001 * rep)
    sync(flat)
    line = [f"rep{rep}:"]
    for name, fn in variants:
        t0 = time.time(); sync(fn(flat)); dt = (time.time() - t0) * 1e3
        line.append(f"{name}={dt:.0f}ms")
    print(" ".join(line))
