"""Small-vector math helpers over batched [..., 3] arrays.

Everything is written branchless (jnp.where) so it vmaps/jits cleanly and
lowers to pure VPU work on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b, axis=-1)


def length(v: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jax.Array, eps: float = 1e-20) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), eps))[..., None]


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


def reflect(i: jax.Array, n: jax.Array) -> jax.Array:
    """HLSL reflect: i - 2*dot(n, i)*n."""
    return i - 2.0 * dot(n, i)[..., None] * n


def coordinate_system(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Orthonormal (T1, T2) for normal ``n`` (GGX_v6.hlsl:65-76 semantics).

    T1 = normalize(cross(z_or_x, N)); T2 = cross(N, T1).
    """
    use_z = jnp.abs(n[..., 2]) < 0.999
    axis = jnp.where(
        use_z[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    t1 = normalize(cross(axis, n))
    t2 = cross(n, t1)
    return t1, t2


def luminance_avg(c: jax.Array) -> jax.Array:
    """The reference's scalar "luminance": channel average."""
    return (c[..., 0] + c[..., 1] + c[..., 2]) / 3.0


def linearize(c: jax.Array) -> jax.Array:
    """p-hat scalarization = vector length (Sampler_v6.hlsl:1-5)."""
    return length(c)


def safe_multiply(s: jax.Array, v: jax.Array) -> jax.Array:
    """scalar*vec, zeroed when non-finite (Common_v6.hlsl:151-160)."""
    r = s[..., None] * v if s.ndim == v.ndim - 1 else s * v
    finite = jnp.all(jnp.isfinite(r), axis=-1, keepdims=True)
    return jnp.where(finite, r, 0.0)


def transform_points(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply 4x4 matrix (column-vector convention) to points [..., 3]."""
    return p @ m[:3, :3].T + m[:3, 3]


def transform_dirs(m: jax.Array, d: jax.Array) -> jax.Array:
    """Apply 4x4 matrix (column-vector convention) to directions [..., 3]."""
    return d @ m[:3, :3].T


def srgb_gamma(c: jax.Array) -> jax.Array:
    """Per-channel sRGB OETF (Common_v6.hlsl:353-376)."""
    lo = 12.92 * c
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def reinhard(c: jax.Array, exposure: float = 1.0) -> jax.Array:
    """Reinhard tonemap (Common.hlsl:123-134)."""
    c = c * exposure
    return c / (c + 1.0)
