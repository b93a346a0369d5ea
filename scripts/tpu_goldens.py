"""TPU-compiled golden hashes, one per Pallas kernel family.

The CI test suite runs Pallas in interpret mode (no TPU in CI), so Mosaic
compilation regressions would otherwise only surface in bench runs
(VERDICT r1 weak #6).  This script renders a tiny FIXED scene through each
kernel family ON the real TPU, quantizes to u8 (the Phase-I ldr_hash
pattern, hello_rendering_paths.cpp:1315), and compares against the
checked-in goldens.

Usage:
    python scripts/tpu_goldens.py           # verify against goldens
    python scripts/tpu_goldens.py --update  # re-record goldens

Exit code 0 = all match; 1 = any mismatch (or missing goldens).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "tpu_goldens.json")


def _hash_u8(arr) -> str:
    from lsr_tpu.utils.host import fetch

    a = np.ascontiguousarray(fetch(arr))
    h = hashlib.blake2b(a.tobytes(), digest_size=16)
    h.update(str(a.shape).encode())
    return h.hexdigest()


def build_cases():
    """{name: fn() -> u8 array} — one per Pallas kernel family."""
    import jax
    import jax.numpy as jnp

    from lsr_tpu.core import math3d as m3
    from lsr_tpu.core.color import quantize_u8
    from lsr_tpu.io.obj import load_obj, make_plane
    from lsr_tpu.lighting.fplus_kernel import accumulate_lights_pallas
    from lsr_tpu.lighting.light_types import LightSetBuilder
    from lsr_tpu.passes.forward_plus import shade_forward_plus
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import (
        rasterize_chunklist, rasterize_direct, rasterize_tiled)
    from lsr_tpu.scene.scene import SceneBuilder, make_camera
    from lsr_tpu.shading.common import make_materials
    from lsr_tpu.shading.models import make_shade_context

    w, h = 320, 180
    sb = SceneBuilder()
    sb.add(load_obj("/root/reference/cpp-folders/src/assets/obj/monkey/"
                    "monkey.rawobj"),
           np.asarray(m3.translate([0, 0.2, 0]) @ m3.rotate_y(0.5)))
    sb.add(make_plane(6.0, y=-1.0), material=1, casts_shadow=False)
    geom, objects = sb.build()
    cam = make_camera(w, h, (0.5, 1.5, -4.0), (0, 0, 0))
    mats = make_materials(base_color=[(0.8, 0.5, 0.3), (0.5, 0.55, 0.6)],
                          roughness=[0.4, 0.8], metallic=[0.1, 0.0])
    ctx = make_shade_context(mats, light_dir_ws=(0.35, -0.7, 0.5),
                             camera_pos=(0.5, 1.5, -4.0), light_intensity=2.0)
    lb = LightSetBuilder()
    rng = np.random.default_rng(7)
    for _ in range(24):
        lb.point(tuple(rng.uniform([-3, 0.2, -3], [3, 2, 3]).tolist()),
                 color=tuple(rng.uniform(0.3, 1.0, 3).tolist()),
                 intensity=1.5, range=2.5)
    lights = lb.build()

    def setup_fn():
        return scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            cam.viewproj, w, h)

    @jax.jit
    def case_raster_direct():
        setup = setup_fn()
        depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
        return quantize_u8(jnp.stack(
            [depth, (tid >= 0).astype(jnp.float32),
             (tid.astype(jnp.float32) % 255.0) / 255.0], -1))

    @jax.jit
    def case_raster_binned():
        setup = setup_fn()
        depth, tid, _ = rasterize_tiled(setup, w, h, cam.zn, cam.zf,
                                        cap=1024)
        return quantize_u8(jnp.stack(
            [depth, (tid >= 0).astype(jnp.float32),
             (tid.astype(jnp.float32) % 255.0) / 255.0], -1))

    @jax.jit
    def case_fplus_kernel():
        setup = setup_fn()
        depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
        gb = interpolate_gbuffer(setup, depth, tid)
        diff, spec, _ = accumulate_lights_pallas(
            gb.world_pos, gb.normal_ws, gb.covered,
            jnp.asarray([0.5, 1.5, -4.0], jnp.float32), lights,
            cam.view, cam.proj, w, h)
        return quantize_u8(jnp.clip(diff + spec, 0.0, 1.0))

    @jax.jit
    def case_shade_fused():
        setup = setup_fn()
        depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
        gb = interpolate_gbuffer(setup, depth, tid, materials=ctx.materials)
        hdr, _ = shade_forward_plus(
            gb, ctx, lights, cam.view, cam.proj, cam.zn, cam.zf, w, h,
            tile_size=16, cap=64, mode="tiled", use_kernel=True)
        return tonemap_pass(hdr)

    @jax.jit
    def case_raster_chunklist():
        setup = setup_fn()
        depth, tid, _ = rasterize_chunklist(setup, w, h, cam.zn, cam.zf)
        return quantize_u8(jnp.stack(
            [depth, (tid >= 0).astype(jnp.float32),
             (tid.astype(jnp.float32) % 255.0) / 255.0], -1))

    return {
        "raster_direct": case_raster_direct,
        "raster_binned": case_raster_binned,
        "raster_chunklist": case_raster_chunklist,
        "fplus_kernel": case_fplus_kernel,
        "shade_fused": case_shade_fused,
    }


def main():
    import jax

    update = "--update" in sys.argv
    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    if platform not in ("tpu", "axon"):
        print("WARNING: not on TPU — hashes cover the interpret path only")

    cases = build_cases()
    hashes = {}
    for name, fn in cases.items():
        out = jax.block_until_ready(fn())
        hashes[name] = _hash_u8(out)
        print(f"{name}: {hashes[name]}")

    if update:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump({"platform": platform, "hashes": hashes}, f, indent=1)
        print(f"wrote {GOLDEN_PATH}")
        return 0

    if not os.path.exists(GOLDEN_PATH):
        print(f"MISSING goldens ({GOLDEN_PATH}); run with --update")
        return 1
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    ok = True
    for name, hv in hashes.items():
        want = golden["hashes"].get(name)
        status = "OK" if hv == want else f"MISMATCH (want {want})"
        if hv != want:
            ok = False
        print(f"{name}: {status}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
