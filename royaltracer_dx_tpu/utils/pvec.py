"""Planar (structure-of-arrays) 3-vector helpers.

A planar vec is a plain tuple ``(x, y, z)`` of same-shape (or mutually
broadcastable) arrays.  On TPU the VPU tile is (8 sublanes, 128 lanes) over
the two minor dims, so an ``[N, 3]`` AoS vector wastes 125/128 lanes on
every elementwise op; planar component arrays keep the lanes full.  The
hot kernels (intersection, RIS candidate math, BSDF eval) use these; AoS
``[..., 3]`` stays at module boundaries (utils/math3d.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Vec = tuple  # (x, y, z)


def from_aos(a: jax.Array, axis: int = -1) -> Vec:
    """Split an [..., 3] array into component planes."""
    return (
        jnp.take(a, 0, axis=axis),
        jnp.take(a, 1, axis=axis),
        jnp.take(a, 2, axis=axis),
    )


def to_aos(v: Vec, axis: int = -1) -> jax.Array:
    return jnp.stack(jnp.broadcast_arrays(*v), axis=axis)


def splat(s) -> Vec:
    return (s, s, s)


def add(a: Vec, b: Vec) -> Vec:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a: Vec, b: Vec) -> Vec:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul(a: Vec, b: Vec) -> Vec:
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def scale(a: Vec, s) -> Vec:
    return (a[0] * s, a[1] * s, a[2] * s)


def neg(a: Vec) -> Vec:
    return (-a[0], -a[1], -a[2])


def dot(a: Vec, b: Vec) -> jax.Array:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a: Vec, b: Vec) -> Vec:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length(a: Vec) -> jax.Array:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: Vec, eps: float = 1e-20) -> Vec:
    inv = jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))
    return scale(a, inv)


def where(mask, a: Vec, b: Vec) -> Vec:
    return (
        jnp.where(mask, a[0], b[0]),
        jnp.where(mask, a[1], b[1]),
        jnp.where(mask, a[2], b[2]),
    )


def reflect(i: Vec, n: Vec) -> Vec:
    """HLSL reflect: i - 2*dot(n, i)*n."""
    return sub(i, scale(n, 2.0 * dot(n, i)))


def avg(a: Vec) -> jax.Array:
    """The reference's scalar "luminance": channel average."""
    return (a[0] + a[1] + a[2]) / 3.0


def coordinate_system(n: Vec) -> tuple[Vec, Vec]:
    """Planar orthonormal (T1, T2) for unit n (GGX_v6.hlsl:65-76)."""
    use_z = jnp.abs(n[2]) < 0.999
    zero = jnp.zeros_like(n[2])
    axis = (jnp.where(use_z, 0.0, 1.0), zero, jnp.where(use_z, 1.0, 0.0))
    t1 = normalize(cross(axis, n))
    t2 = cross(n, t1)
    return t1, t2
