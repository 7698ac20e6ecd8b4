"""royaltracer_dx_tpu — a TPU-native wavefront path tracer in JAX/Pallas.

A ground-up rebuild of the capabilities of the reference DX12/DXR renderer
RoyalTracer-DX (progressive ReSTIR DI+GI path tracing, GGX/Lambertian BSDFs
with multiscatter energy compensation, NEE over a triangle-CDF light list,
pairwise-MIS temporal+spatial reservoir reuse, per-frame BVH refit, temporal
accumulation with camera-motion reset) designed TPU-first:

- dense SoA ray/hit/reservoir state over (8,128)-tileable arrays
- on-device LBVH (Morton codes + sort) instead of driver BVH builds
- stackless while-loop traversal fused with Moller-Trumbore
- vmapped branchless BSDF sample/eval with counter-based RNG
- jitted progressive accumulation framebuffer
- `shard_map` pixel-tile data parallelism over a jax device Mesh

Reference layer map and parity notes: see SURVEY.md at the repo root.
"""

import jax as _jax

# Geometry math must be fp32: the TPU MXU's default bf16 matmul precision
# rounds e.g. a light plane at y=0.999 to 1.0, making shadow rays
# self-occlude.  Hot kernels opt back down explicitly where safe.
_jax.config.update("jax_default_matmul_precision", "highest")

from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.camera import Camera

__version__ = "0.1.0"

__all__ = ["RenderConfig", "Camera", "__version__"]
