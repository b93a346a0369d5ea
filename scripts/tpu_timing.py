"""Reliable micro-timing through the axon TPU tunnel.

`jax.block_until_ready` does NOT wait on this backend (40 chained 4k matmuls
"block" in 0.0 ms), so naive timing reads absurdly fast.  The only reliable
method: end the measured region with a tiny HOST READBACK (np.asarray of a
jitted scalar probe of the output) and take the SLOPE between two iteration
counts, which cancels the constant readback/drain latency (~175 ms).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

_PROBE_CACHE = {}


def _probe(out):
    """Host-read a scalar derived from (the first array leaf of) out."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    x = leaves[0]
    key = (x.shape, str(x.dtype))
    if key not in _PROBE_CACHE:
        _PROBE_CACHE[key] = jax.jit(
            lambda a: jnp.sum(a.ravel()[:128].astype(jnp.float32)))
    return float(np.asarray(_PROBE_CACHE[key](x)))


def bench_fn(name, fn, *args, iters=(4, 20)):
    """Print slope-method ms/call for fn(*args); returns the last output."""
    out = fn(*args)          # compile + warm
    _probe(out)
    m_lo, m_hi = iters
    t = []
    for m in (m_lo, m_hi):
        t0 = time.perf_counter()
        for _ in range(m):
            out = fn(*args)
        _probe(out)          # forces the queue to drain
        t.append(time.perf_counter() - t0)
    ms = (t[1] - t[0]) / (m_hi - m_lo) * 1000
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return out
