"""Counter-based random number generation.

Two generators:

1. ``tea_random`` — an exact, vectorized port of the reference's 4-round TEA
   hash RNG (``/root/reference/Pathtracer/include/Common_v6.hlsl:119-138``),
   used where bit-parity with the reference's sample sequences matters.  The
   state is a uint32[..., 2] "seed" carried functionally: every draw hashes
   the state and returns (uniform, new_state).  Because the state update is
   itself the hash, this is a counter-mode generator — ideal for jit/vmap.

2. thin wrappers over ``jax.random`` (threefry) for places where parity is
   not needed (initialization, tests).

Pixel seeding mirrors RayGen_v6_pass1.hlsl:62-77 (prime multiplies xor'd with
a per-pass stream id and the frame time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Key-schedule constants from the TEA rounds (Common_v6.hlsl:124-131).
_DELTA = jnp.uint32(0x9E3779B9)
_K0 = jnp.uint32(0xA341316C)
_K1 = jnp.uint32(0xC8013EA4)
_K2 = jnp.uint32(0xAD90777D)
_K3 = jnp.uint32(0x7E95761E)

# Seeding primes (RayGen_v6_pass1.hlsl:63-69).
_PRIME1_X = jnp.uint32(73856093)
_PRIME2_X = jnp.uint32(19349663)
_PRIME3_X = jnp.uint32(83492791)
_PRIME1_Y = jnp.uint32(37623481)
_PRIME2_Y = jnp.uint32(51964263)
_PRIME3_Y = jnp.uint32(68250729)
_PRIME_TIME_X = jnp.uint32(293803)
_PRIME_TIME_Y = jnp.uint32(423977)


def tea_random(seed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One draw of the reference TEA RNG.

    Args:
      seed: uint32 array [..., 2] — the (v0, v1) state.

    Returns:
      (u, new_seed): u is float32 [...] in [0, 1]; new_seed is the advanced
      state.  Matches Common_v6.hlsl:119-138 bit-exactly (including the
      float(v0)/2^32 conversion, which can round to exactly 1.0).
    """
    v0 = seed[..., 0]
    v1 = seed[..., 1]
    s = jnp.uint32(0)
    for _ in range(4):
        s = s + _DELTA
        v0 = v0 + (((v1 << 4) + _K0) ^ (v1 + s) ^ ((v1 >> 5) + _K1))
        v1 = v1 + (((v0 << 4) + _K2) ^ (v0 + s) ^ ((v0 >> 5) + _K3))
    new_seed = jnp.stack([v0, v1], axis=-1)
    u = v0.astype(jnp.float32) / jnp.float32(4294967296.0)
    return u, new_seed


def tea_randoms(seed: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """Draw ``n`` sequential uniforms; returns (u[..., n], new_seed)."""
    us = []
    for _ in range(n):
        u, seed = tea_random(seed)
        us.append(u)
    return jnp.stack(us, axis=-1), seed


# Stream-derivation constants for the counter-based batch draw.
_CTR_X = jnp.uint32(0x9E3779B9)
_CTR_Y = jnp.uint32(0x85EBCA6B)


def tea_batch(seed: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """Draw ``n`` uniforms in ONE vectorized TEA evaluation.

    Counter mode: draw i hashes (v0 + i*c1, v1 ^ i*c2), so all n draws are
    independent PRF outputs of the carried state.  Unlike ``tea_randoms``
    this does NOT reproduce the reference's sequential draw order — it is
    the TPU-native replacement used in hot kernels (one 4-round TEA over an
    [..., n] batch is ~30x fewer HLO ops than n chained draws, which
    dominates XLA compile time).  The carried seed advances by a single
    hash.  Returns (u [..., n], new_seed).
    """
    i = jnp.arange(n, dtype=jnp.uint32)
    v0 = seed[..., 0:1] + i * _CTR_X
    v1 = seed[..., 1:2] ^ (i * _CTR_Y)
    s = jnp.uint32(0)
    for _ in range(4):
        s = s + _DELTA
        v0 = v0 + (((v1 << 4) + _K0) ^ (v1 + s) ^ ((v1 >> 5) + _K1))
        v1 = v1 + (((v0 << 4) + _K2) ^ (v0 + s) ^ ((v0 >> 5) + _K3))
    u = v0.astype(jnp.float32) / jnp.float32(4294967296.0)
    _, new_seed = tea_random(seed)
    return u, new_seed


def tea_batch_major(seed: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """``tea_batch`` with the draw index MAJOR: returns (u [n, ...], seed).

    For [N]-lane seeds this produces [n, N] — the TPU-friendly layout
    (lanes stay full; ``tea_batch``'s [N, n] puts n in the lane dim and
    wastes 128-n lanes on every downstream op).  Same PRF as ``tea_batch``
    (identical counters), so values match its output transposed.
    """
    shape = (n,) + (1,) * seed[..., 0].ndim
    i = jnp.arange(n, dtype=jnp.uint32).reshape(shape)
    v0 = seed[..., 0][None] + i * _CTR_X
    v1 = seed[..., 1][None] ^ (i * _CTR_Y)
    s = jnp.uint32(0)
    for _ in range(4):
        s = s + _DELTA
        v0 = v0 + (((v1 << 4) + _K0) ^ (v1 + s) ^ ((v1 >> 5) + _K1))
        v1 = v1 + (((v0 << 4) + _K2) ^ (v0 + s) ^ ((v0 >> 5) + _K3))
    u = v0.astype(jnp.float32) / jnp.float32(4294967296.0)
    _, new_seed = tea_random(seed)
    return u, new_seed


def tea_batch_at(seed: jax.Array, i: int) -> jax.Array:
    """Draw #``i`` of ``tea_batch(seed, n)`` as a standalone plane.

    Bit-identical to ``tea_batch_major(seed, n)[0][i]`` (same per-index
    counters), but emitted as an [N]-shaped op so unrolled consumers can
    keep every intermediate in flat [N] layout — [T, N] tensors with small
    T round T up to the 8-sublane tile and pay padded traffic on every
    downstream op (measured 10x on pass-3's tap pipeline, profile_r4s).
    Does NOT advance the seed; advance once per batch with ``tea_random``.
    """
    i = jnp.uint32(i)
    v0 = seed[..., 0] + i * _CTR_X
    v1 = seed[..., 1] ^ (i * _CTR_Y)
    s = jnp.uint32(0)
    for _ in range(4):
        s = s + _DELTA
        v0 = v0 + (((v1 << 4) + _K0) ^ (v1 + s) ^ ((v1 >> 5) + _K1))
        v1 = v1 + (((v0 << 4) + _K2) ^ (v0 + s) ^ ((v0 >> 5) + _K3))
    return v0.astype(jnp.float32) / jnp.float32(4294967296.0)


def pixel_seed(
    x: jax.Array, y: jax.Array, stream: int | jax.Array, time: jax.Array
) -> jax.Array:
    """Per-pixel seed (RayGen_v6_pass1.hlsl:76-77).

    ``stream`` is the per-pass id (1 = initial pass, 2 = temporal, 3 =
    spatial; the v5 kernel uses samples+1).  ``time`` is the frame counter
    (uint32).  Returns uint32 [..., 2].
    """
    x = x.astype(jnp.uint32)
    y = y.astype(jnp.uint32)
    stream = jnp.asarray(stream, jnp.uint32)
    time = jnp.asarray(time, jnp.uint32)
    sx = (y * _PRIME1_X) ^ (x * _PRIME2_X) ^ (stream * _PRIME3_X) ^ (time * _PRIME_TIME_X)
    sy = (x * _PRIME1_Y) ^ (y * _PRIME2_Y) ^ (stream * _PRIME3_Y) ^ (time * _PRIME_TIME_Y)
    return jnp.stack([jnp.broadcast_to(sx, jnp.broadcast_shapes(sx.shape, sy.shape)),
                      jnp.broadcast_to(sy, jnp.broadcast_shapes(sx.shape, sy.shape))],
                     axis=-1)
