"""Flagship benchmark: Forward+ tiled, 256 lights, multi-monkey @1080p.

Mirrors the reference's flagship workload (hello_rendering_paths.cpp:89-99:
1280x720 default / our north-star 1920x1080, 16-px light tiles, <=128 lights
per tile) measured Phase-F style (warmup + sampled frames).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 60 FPS north-star target (BASELINE.md) since the
reference publishes no numbers.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json

import numpy as np


def build_scene():
    import jax.numpy as jnp

    from lsr_tpu.core import math3d as m3
    from lsr_tpu.io.fast_obj import load_obj_fast as load_obj
    from lsr_tpu.io.obj import make_plane
    from lsr_tpu.lighting.light_types import LightSetBuilder
    from lsr_tpu.scene.scene import SceneBuilder
    from lsr_tpu.shading.common import checkerboard_texture, make_materials
    from lsr_tpu.shading.models import make_shade_context

    monkey = load_obj(
        "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"
    )
    rng = np.random.default_rng(42)
    sb = SceneBuilder()
    grid = 5
    for i in range(grid * grid):
        x = (i % grid - grid // 2) * 2.4
        z = (i // grid - grid // 2) * 2.4
        rot = float(rng.uniform(0, 2 * np.pi))
        sb.add(monkey, np.asarray(
            m3.translate([x, 0.0, z]) @ m3.rotate_y(rot)), material=i % 4)
    sb.add(make_plane(10.0, y=-1.0), material=4, casts_shadow=False)
    geom, objects = sb.build()

    lb = LightSetBuilder()
    n_lights = int(os.environ.get("LSR_BENCH_LIGHTS", "256"))
    for i in range(n_lights):
        x = float(rng.uniform(-7, 7))
        z = float(rng.uniform(-7, 7))
        y = float(rng.uniform(0.2, 2.2))
        color = tuple(rng.uniform(0.2, 1.0, 3).tolist())
        if i % 4 == 0:
            lb.spot((x, y + 1.0, z), (0, -1, 0), color=color, intensity=2.0,
                    range=3.5, inner_angle=0.35, outer_angle=0.6)
        else:
            lb.point((x, y, z), color=color, intensity=1.5, range=2.5)
    lights = lb.build()

    eye = (6.0, 6.5, -10.0)
    mats = make_materials(
        base_color=[(0.85, 0.5, 0.3), (0.4, 0.65, 0.85), (0.6, 0.8, 0.45),
                    (0.9, 0.85, 0.5), (0.5, 0.5, 0.55)],
        metallic=[0.05, 0.4, 0.0, 0.8, 0.0],
        roughness=[0.4, 0.25, 0.7, 0.35, 0.9],
        tex_id=[-1, -1, -1, -1, 0],
    )
    ctx = make_shade_context(
        mats, light_dir_ws=(0.35, -0.75, 0.45), light_color=(1.0, 0.96, 0.9),
        light_intensity=2.0, camera_pos=eye,
        textures=jnp.asarray(checkerboard_texture(128))[None],
    )
    return geom, objects, lights, ctx, eye


def main():
    import jax
    import jax.numpy as jnp

    from lsr_tpu.passes.forward_plus import shade_forward_plus
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera

    width = int(os.environ.get("LSR_BENCH_W", "1920"))
    height = int(os.environ.get("LSR_BENCH_H", "1080"))
    frames = int(os.environ.get("LSR_BENCH_FRAMES", "60"))
    warmup = int(os.environ.get("LSR_BENCH_WARMUP", "10"))
    cap = int(os.environ.get("LSR_BENCH_CAP", "2048"))

    geom, objects, lights, ctx, eye = build_scene()
    cam = make_camera(width, height, eye, (0, 0, 0), fov=np.pi / 3.2)

    def frame(viewproj, t):
        # Animate the camera matrix cheaply (keeps each frame distinct).
        setup = scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            viewproj, width, height,
        )
        depth, tid, max_bin = rasterize_direct(
            setup, width, height, cam.zn, cam.zf
        )
        gb = interpolate_gbuffer(setup, depth, tid, materials=ctx.materials)
        hdr, stats = shade_forward_plus(
            gb, ctx, lights, cam.view, cam.proj, cam.zn, cam.zf,
            width, height, tile_size=16, cap=128, mode="tiled",
            sun_model="pbr_mr",
        )
        ldr = tonemap_pass(hdr)
        n_valid = jnp.sum(setup.valid)
        return ldr, n_valid, max_bin, stats["max_lights_per_bin"]

    frame_j = jax.jit(frame)

    ldr, n_valid, max_bin, max_lights = jax.block_until_ready(
        frame_j(cam.viewproj, jnp.float32(0.0))
    )
    tris = int(n_valid)
    print(
        f"# compile ok: {tris} tris, max_bin={int(max_bin)} (cap {cap}), "
        f"max_lights_per_tile={int(max_lights)}",
        file=sys.stderr,
    )

    for i in range(warmup):
        out = frame_j(cam.viewproj, jnp.float32(i))
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(frames):
        out = frame_j(cam.viewproj, jnp.float32(i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = frames / dt
    mtris = tris * fps / 1e6
    print(
        f"# {fps:.2f} fps ({dt / frames * 1000:.2f} ms/frame), "
        f"{mtris:.1f} Mtris/s at {width}x{height}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"forward_plus_{width}x{height}_{lights.count}lights_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
