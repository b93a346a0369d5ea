"""Find a fast formulation for the PCF window gather (2M px, 25 taps)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {ms:9.2f} ms", flush=True)
    return out


def main():
    from lsr_tpu.lighting.shadow_sample import pack_shadow_taps

    s = 2048
    n = 1920 * 1080
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((s, s), np.float32))
    idx = jnp.asarray(rng.integers(0, s * s, n, dtype=np.int32))
    z = jnp.asarray(rng.random(n, np.float32))

    taps = jax.block_until_ready(jax.jit(
        lambda d: pack_shadow_taps(d, 2))(depth))
    print("taps:", taps.shape, taps.dtype)
    try:
        print("  layout:", taps.format)
    except Exception as e:
        print("  layout query failed:", e)

    def pcf(t, i, zz):
        w = t[i]
        return jnp.sum((zz[:, None] <= w).astype(jnp.float32), -1)

    timeit("A gather from jit-packed table", jax.jit(pcf), taps, idx, z)

    # B: force row-major with an explicit device_put layout.
    try:
        from jax._src.layout import Layout  # noqa

        fmt = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        lay = None
        try:
            from jax.experimental.layout import DeviceLocalLayout, Layout as L
            lay = L(DeviceLocalLayout(major_to_minor=(0, 1)), fmt)
        except Exception as e:
            print("  layout API (experimental.layout) unavailable:", e)
        if lay is not None:
            taps_rm = jax.block_until_ready(jax.device_put(taps, lay))
            timeit("B gather, device_put row-major", jax.jit(pcf), taps_rm,
                   idx, z)
    except Exception as e:
        print("B failed:", type(e).__name__, e)

    # C: round-trip through host (numpy arrays land row-major).
    taps_h = jax.block_until_ready(jax.device_put(np.asarray(taps)))
    try:
        print("  host round-trip layout:", taps_h.format)
    except Exception:
        pass
    timeit("C gather, host round-trip table", jax.jit(pcf), taps_h, idx, z)

    # D: transposed table (25, S*S), per-tap plane gathers.
    taps_t = jax.block_until_ready(jax.jit(lambda t: t.T.copy())(taps))

    def pcf_t(tt, i, zz):
        acc = jnp.zeros_like(zz)
        for k in range(tt.shape[0]):
            acc = acc + (zz <= tt[k, i]).astype(jnp.float32)
        return acc

    timeit("D 25 plane gathers from (25, S*S)", jax.jit(pcf_t), taps_t, idx, z)

    # E: the flat map, 25 separate offset gathers (no packing at all).
    flat = depth.reshape(-1)

    def pcf_flat(fm, i, zz):
        acc = jnp.zeros_like(zz)
        for oy in range(-2, 3):
            for ox in range(-2, 3):
                acc = acc + (zz <= fm[jnp.clip(i + oy * s + ox, 0, s * s - 1)]
                             ).astype(jnp.float32)
        return acc

    timeit("E 25 offset gathers from flat map", jax.jit(pcf_flat), flat,
           idx, z)

    # F: pack 8 taps per row x 4 gathers (25 -> 32 lanes split).
    # (skip; D/E tell us the per-gather overhead story)

    # G: min/max prefilter early-out + full fallback only as mask stats.
    mn = jax.block_until_ready(jax.jit(
        lambda t: jnp.min(t, -1))(taps))
    mx = jax.block_until_ready(jax.jit(
        lambda t: jnp.max(t, -1))(taps))
    both = jax.block_until_ready(jax.jit(
        lambda a, b: jnp.stack([a, b], -1))(mn, mx))

    def pcf_minmax(bm, i, zz):
        w = bm[i]
        lit_all = zz <= w[:, 0]
        shadow_all = zz > w[:, 1]
        return jnp.where(lit_all, 1.0, jnp.where(shadow_all, 0.0, 0.5))

    timeit("G 2-lane min/max gather (bound est.)", jax.jit(pcf_minmax),
           both, idx, z)


if __name__ == "__main__":
    main()
