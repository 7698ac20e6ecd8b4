"""Progressive accumulation framebuffer.

The analog of gPermanentData (RGBA32F: xyz = radiance sum, w = frame count,
Renderer.cpp:1167-1186) with the v6 accumulation rules
(RayGen_v6_pass3.hlsl:384-423): NaN/Inf samples are skipped, accumulation
caps at max_frames, and a camera change resets the buffer to the current
frame.  NaN pixels display magenta, Inf cyan (:429-432).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.utils import math3d as m3


@flax.struct.dataclass
class Framebuffer:
    accum: jax.Array   # [N, 3] radiance sum
    count: jax.Array   # [N] frames accumulated

    @staticmethod
    def create(num_pixels: int) -> "Framebuffer":
        return Framebuffer(
            accum=jnp.zeros((num_pixels, 3), jnp.float32),
            count=jnp.zeros((num_pixels,), jnp.float32),
        )


def accumulate(
    fb: Framebuffer,
    sample: jax.Array,
    camera_changed: jax.Array,
    max_frames: int = 2_000_000,
) -> Framebuffer:
    """One accumulation step (RayGen_v6_pass3.hlsl:384-423 semantics)."""
    finite = jnp.all(jnp.isfinite(sample), axis=-1)
    fresh = fb.count <= 0.0
    ok_init = fresh & finite
    ok_cont = (~fresh) & (fb.count < max_frames) & finite

    accum = jnp.where(
        ok_init[:, None], sample,
        jnp.where(ok_cont[:, None], fb.accum + sample, fb.accum),
    )
    count = jnp.where(ok_init, 1.0, jnp.where(ok_cont, fb.count + 1.0, fb.count))

    # camera motion reset: buffer restarts from this frame's sample.  The
    # reference resets unconditionally (pass3:418-422) which can latch a NaN
    # until the next reset; we keep the finite guard so such pixels restart
    # from the next valid sample instead.
    reset_ok = (camera_changed & finite)[:, None]
    accum = jnp.where(reset_ok, sample, jnp.where(camera_changed, 0.0, accum))
    count = jnp.where(camera_changed & finite, 1.0, jnp.where(camera_changed, 0.0, count))
    return Framebuffer(accum=accum, count=count)


def resolve(fb: Framebuffer, srgb: bool = True) -> jax.Array:
    """Averaged color with the NaN=magenta / Inf=cyan debug sentinels."""
    color = fb.accum / jnp.maximum(fb.count, 1.0)[:, None]
    nan = jnp.any(jnp.isnan(color), axis=-1, keepdims=True)
    inf = jnp.any(jnp.isinf(color), axis=-1, keepdims=True)
    color = jnp.where(nan, jnp.array([1.0, 0.0, 1.0]), color)
    color = jnp.where(inf & ~nan, jnp.array([0.0, 1.0, 1.0]), color)
    if srgb:
        color = m3.srgb_gamma(jnp.clip(color, 0.0, None))
    return jnp.clip(color, 0.0, 1.0)
