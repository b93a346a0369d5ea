"""High-poly raster scaling bench: ~500K-triangle instanced-monkey scene.

The direct kernel's VMEM-resident packed setup caps at 150K triangles
(passes/standard_passes.py routing); beyond that production falls back to
the binned kernel (raster/tiled.rasterize_tiled).  This bench measures that
path at the reference's stress intent (rasterizer.hpp scaling thresholds
:37-39): setup + raster Mtris/s at 1080p for the binned and chunk-worklist
kernels, recorded as a BASELINE.md row.

Usage: python scripts/bench_highpoly.py [--grid 33]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import bench_fn


def build_highpoly_scene(grid: int):
    from lsr_tpu.core import math3d as m3
    from lsr_tpu.io.fast_obj import load_obj_fast as load_obj
    from lsr_tpu.scene.scene import SceneBuilder

    monkey = load_obj(
        "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj")
    rng = np.random.default_rng(7)
    sb = SceneBuilder()
    for i in range(grid * grid):
        x = (i % grid - grid // 2) * 1.2
        z = (i // grid - grid // 2) * 1.2
        rot = float(rng.uniform(0, 2 * np.pi))
        sb.add(monkey, np.asarray(
            m3.translate([x, 0.0, z]) @ m3.rotate_y(rot)), material=i % 4)
    return sb.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=33)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1080)
    args = ap.parse_args()

    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import (
        rasterize_chunklist, rasterize_direct, rasterize_tiled)
    from lsr_tpu.scene.scene import make_camera

    geom, objects = build_highpoly_scene(args.grid)
    n_tri = geom.indices.shape[0]
    w, h = args.w, args.h
    # High, oblique view covering the whole grid.
    ext = args.grid * 1.2 * 0.72
    cam = make_camera(w, h, (ext, ext * 0.9, -ext), (0, 0, 0),
                      fov=np.pi / 3.0)

    f_setup = jax.jit(lambda vp: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        vp, w, h))
    setup = bench_fn(f"setup {n_tri / 1e3:.0f}K tris", f_setup, cam.viewproj)
    setup_ms = bench_fn.last_ms
    n_valid = int(np.asarray(jnp.sum(setup.valid)))
    print(f"  valid after clip/cull: {n_valid}")

    # Compact front-end (r5: cull+compact before the wide gathers).
    from lsr_tpu.raster.setup import scene_setup_compact

    def setupc_fn(vp):
        return scene_setup_compact(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vp, w, h)

    f_setupc = jax.jit(setupc_fn)
    setup_c, cstats = bench_fn(
        f"setup compact {n_tri / 1e3:.0f}K tris", f_setupc, cam.viewproj)
    setup_c_ms = bench_fn.last_ms
    print(f"  compact: n_direct {int(np.asarray(cstats.n_direct))} / cap "
          f"{cstats.cap_direct}, n_clip {int(np.asarray(cstats.n_clip))} / "
          f"cap {cstats.cap_clip}, overflow "
          f"{bool(np.asarray(cstats.overflow))}")

    results = {}
    # Size the per-tile list cap from the ACTUAL max bin count (a cap
    # overflow silently drops triangles and corrupts both the image and
    # the comparison).
    cap = 512
    _, _, max_bin = jax.jit(lambda s: rasterize_tiled(
        s, w, h, cam.zn, cam.zf, cap=512))(setup)
    max_bin = int(np.asarray(max_bin))
    if max_bin > cap:
        cap = -(-max_bin // 256) * 256
    print(f"  binned max_bin: {max_bin} -> cap {cap}")
    d_b = t_b = None
    note = None
    # Measured infeasibility bound: cap=18176 OOMs the 16M scoped-vmem
    # stack (17.88M, run 20260819T1114); cap=2048 (flagship) fits.  The
    # failed compile itself costs ~20 min through the tunnel, so skip
    # proactively rather than catch -- production routing
    # (standard_passes.py) already prefers chunklist past 150K tris.
    if cap > 8192:
        note = (f"binned infeasible at cap={cap}: per-tile bin block "
                "exceeds scoped VMEM (measured OOM at 18176); chunklist "
                "is the production path at this density")
        print(f"  rasterize_tiled (binned): SKIPPED -- {note}")
    else:
        try:
            f_binned = jax.jit(lambda s: rasterize_tiled(
                s, w, h, cam.zn, cam.zf, cap=cap)[:2])
            d_b, t_b = bench_fn("rasterize_tiled (binned)", f_binned, setup)
            results["binned"] = bench_fn.last_ms
        except Exception as e:  # VMEM stack OOM at untested cap sizes
            note = (f"binned infeasible at cap={cap}: per-tile bin block "
                    "exceeds scoped VMEM; chunklist is the production path "
                    "at this density")
            print(f"  rasterize_tiled (binned): SKIPPED -- {note}")
            print(f"    ({type(e).__name__}: {str(e)[:160]})")

    f_chunk = jax.jit(lambda s: rasterize_chunklist(
        s, w, h, cam.zn, cam.zf))
    d_c, t_c, max_cnt = bench_fn("rasterize_chunklist", f_chunk, setup)
    results["chunklist"] = bench_fn.last_ms
    print(f"  chunklist max_chunks_per_tile: {int(np.asarray(max_cnt))}")
    if t_b is not None:
        mism = int(np.asarray(jnp.sum(t_b != t_c)))
        dmax = float(np.abs(np.asarray(d_b) - np.asarray(d_c)).max())
        # Depth may differ at ULP level (different loop structure ->
        # different XLA fma contraction); winners (tids) must match exactly.
        print(f"  chunklist vs binned: tid mismatches {mism}, "
              f"max|depth diff| {dmax:.2e}")
    else:
        d_b, t_b = d_c, t_c  # cross-check direct against chunklist instead

    # The direct kernel keeps the packed setup in HBM (per-super DMA), so
    # its 150K routing cap may be stale — measure it at scale too.
    f_direct = jax.jit(lambda s: rasterize_direct(
        s, w, h, cam.zn, cam.zf))
    d_d, t_d, max_sup = bench_fn("rasterize_direct", f_direct, setup)
    results["direct"] = bench_fn.last_ms
    print(f"  direct max_supers_per_tile: {int(np.asarray(max_sup))}")
    mism_d = int(np.asarray(jnp.sum(t_b != t_d)))
    dmax_d = float(np.abs(np.asarray(d_b) - np.asarray(d_d)).max())
    print(f"  direct vs binned: tid mismatches {mism_d}, "
          f"max|depth diff| {dmax_d:.2e}")

    # End-to-end on the compact front-end (ONE jit: compact setup +
    # chunklist raster), validated bit-exact against the full-path image.
    f_e2e = jax.jit(lambda vp: rasterize_chunklist(
        setupc_fn(vp)[0], w, h, cam.zn, cam.zf)[:2])
    d_e, t_e = bench_fn("end-to-end compact setup + chunklist",
                        f_e2e, cam.viewproj)
    e2e_ms = bench_fn.last_ms
    mism_e = int(np.asarray(jnp.sum((t_e >= 0) != (t_c >= 0))))
    dmax_e = float(np.abs(np.asarray(d_e) - np.asarray(d_c)).max())
    print(f"  compact-e2e vs full chunklist: coverage mismatches {mism_e}, "
          f"max|depth diff| {dmax_e:.2e}")

    best = min(results.values())
    total = setup_ms + best
    mtris = n_valid / total * 1000.0 / 1e6
    import json
    print(json.dumps({
        "metric": f"highpoly_{n_tri}tris_{w}x{h}_setup+raster_ms",
        "value": round(min(total, e2e_ms), 2), "unit": "ms",
        "mtris_per_s": round(n_valid / min(total, e2e_ms) * 1000.0 / 1e6, 1),
        "mtris_per_s_full_setup": round(mtris, 1),
        "setup_ms": round(setup_ms, 2),
        "setup_compact_ms": round(setup_c_ms, 2),
        "e2e_compact_chunklist_ms": round(e2e_ms, 2),
        **{f"{k}_ms": round(v, 2) for k, v in results.items()},
        **({"note": note} if note else {}),
    }))


if __name__ == "__main__":
    main()
