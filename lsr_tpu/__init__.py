"""lsr_tpu — a TPU-native software-rendering framework (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of the SHS CPU software renderer
(reference: sharavsambuu/leisure-software-renderer) for TPU hardware:

- framebuffers are HBM-resident jax arrays threaded functionally through passes,
- the triangle rasterizer is a tiled Pallas kernel (screen-tile grid, per-tile
  triangle binning, edge-function coverage, perspective-correct varyings,
  z-buffer resolution inside the tile),
- shading models are fused, jitted fullscreen array transforms,
- the pass/pipeline layer is plain-Python value code (frame graph, contracts,
  recipes) producing static, jit-compiled frame programs,
- multi-chip scaling shards the framebuffer across a jax.sharding.Mesh.

Coordinate conventions match the reference (docs/spec/conventions.md):
left-handed, +Y up, +Z forward, NDC z in [-1, 1], canvas origin bottom-left,
1.0 world unit = 1 meter.
"""

__version__ = "0.1.0"
