"""ReSTIR reservoirs as SoA pytrees + streaming updates.

Ports Reservoir_v6.hlsl: SampleData (:2-11), Reservoir_DI (:15-20),
Reservoir_GI (:22-27) and the weighted streaming updates (:30-80).  The
reference packs these into 40/60-byte structs with half fields; here every
field is a dense fp32 array over pixels (bf16 quantization is a later,
measured optimization).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import tea_random


@flax.struct.dataclass
class ReservoirDI:
    """Direct-illumination reservoir: reconnection point x2/n2, its radiance
    L2, stream weight sum, contribution weight W, confidence M."""

    x2: jax.Array      # [N, 3]
    n2: jax.Array      # [N, 3]
    l2: jax.Array      # [N, 3]
    w_sum: jax.Array   # [N]
    w: jax.Array       # [N]
    m: jax.Array       # [N]

    @staticmethod
    def zeros_like_lanes(ref: jax.Array) -> "ReservoirDI":
        """Fresh reservoirs with sharding derived from ``ref`` [N, ...]."""
        z3 = ref[..., :1] * 0.0 + jnp.zeros((3,), jnp.float32)
        z = ref[..., 0] * 0.0
        return ReservoirDI(x2=z3, n2=z3, l2=z3, w_sum=z, w=z, m=z)


@flax.struct.dataclass
class ReservoirGI:
    """Global-illumination reservoir: reconnection vertex xn/nn and the
    radiance E3 arriving there from the rest of the path."""

    xn: jax.Array      # [N, 3]
    nn: jax.Array      # [N, 3]
    e3: jax.Array      # [N, 3]
    w_sum: jax.Array   # [N]
    w: jax.Array       # [N]
    m: jax.Array       # [N]

    @staticmethod
    def zeros_like_lanes(ref: jax.Array) -> "ReservoirGI":
        z3 = ref[..., :1] * 0.0 + jnp.zeros((3,), jnp.float32)
        z = ref[..., 0] * 0.0
        return ReservoirGI(xn=z3, nn=z3, e3=z3, w_sum=z, w=z, m=z)


@flax.struct.dataclass
class SampleData:
    """Per-pixel primary-hit record (Reservoir_v6.hlsl:2-11)."""

    x1: jax.Array      # [N, 3] primary hit position
    n1: jax.Array      # [N, 3] shading normal
    o: jax.Array       # [N, 3] outgoing (toward camera)
    l1: jax.Array      # [N, 3] direct emission if the primary hit a light
    mid: jax.Array     # [N] int32 material id (MISS_MATERIAL_ID on miss)
    obj: jax.Array     # [N] int32 instance id


def update_reservoir_di(
    r: ReservoirDI, accept_mask: jax.Array, wi: jax.Array, m_add: jax.Array,
    x2: jax.Array, n2: jax.Array, l2: jax.Array, seed: jax.Array,
) -> tuple[ReservoirDI, jax.Array, jax.Array]:
    """Vectorized UpdateReservoir (Reservoir_v6.hlsl:57-80).

    accept_mask gates the whole update per lane (the reference guards the
    call with `if (p_hat > 0)`).  Returns (reservoir, took, seed); the RNG
    advances on every lane to stay lock-step.
    """
    u, seed = tea_random(seed)
    w_sum = jnp.where(accept_mask, r.w_sum + wi, r.w_sum)
    m = jnp.where(accept_mask, r.m + m_add, r.m)
    take = accept_mask & (u < wi / jnp.where(w_sum == 0.0, 1.0, w_sum))
    t3 = take[:, None]
    return (
        r.replace(
            w_sum=w_sum,
            m=m,
            x2=jnp.where(t3, x2, r.x2),
            n2=jnp.where(t3, n2, r.n2),
            l2=jnp.where(t3, l2, r.l2),
        ),
        take,
        seed,
    )


def update_reservoir_gi(
    r: ReservoirGI, accept_mask: jax.Array, wi: jax.Array, m_add: jax.Array,
    xn: jax.Array, nn: jax.Array, e3: jax.Array, seed: jax.Array,
) -> tuple[ReservoirGI, jax.Array, jax.Array]:
    """Vectorized UpdateReservoir_GI (Reservoir_v6.hlsl:30-53)."""
    u, seed = tea_random(seed)
    w_sum = jnp.where(accept_mask, r.w_sum + wi, r.w_sum)
    m = jnp.where(accept_mask, r.m + m_add, r.m)
    take = accept_mask & (u < wi / jnp.where(w_sum == 0.0, 1.0, w_sum))
    t3 = take[:, None]
    return (
        r.replace(
            w_sum=w_sum,
            m=m,
            xn=jnp.where(t3, xn, r.xn),
            nn=jnp.where(t3, nn, r.nn),
            e3=jnp.where(t3, e3, r.e3),
        ),
        take,
        seed,
    )


def is_valid_di(r: ReservoirDI) -> jax.Array:
    """IsValidReservoir (Sampler_v6.hlsl:7-14)."""
    return (
        (m3.length(r.n2) > 0.0)
        & (m3.length(r.l2) > 0.0)
        & (r.w_sum > 0.0)
        & (r.m > 0.0)
    )


def is_valid_gi(r: ReservoirGI) -> jax.Array:
    """IsValidReservoir_GI (Sampler_v6.hlsl:17-22)."""
    return (r.w_sum > 0.0) & (r.m > 0.0)


def get_w(w_sum: jax.Array, p_hat: jax.Array, eps: float = 1e-6) -> jax.Array:
    """W = w_sum / p_hat, 0 when p_hat ~ 0 (Sampler_v6.hlsl:183-195)."""
    return jnp.where(p_hat > eps, w_sum / jnp.maximum(p_hat, eps), 0.0)


# ========================== planar (TPU) form ===========================
#
# Inside the pass kernels reservoirs live as dicts of component PLANES
# (vectors as (x, y, z) tuples, utils/pvec.py) so all math stays full-lane;
# the AoS structs above remain the persistent inter-frame / checkpoint form.


def di_to_planes(r: ReservoirDI) -> dict:
    return dict(x2=pv.from_aos(r.x2, 1), n2=pv.from_aos(r.n2, 1),
                l2=pv.from_aos(r.l2, 1), w_sum=r.w_sum, w=r.w, m=r.m)


def planes_to_di(d: dict) -> ReservoirDI:
    return ReservoirDI(x2=pv.to_aos(d["x2"], 1), n2=pv.to_aos(d["n2"], 1),
                       l2=pv.to_aos(d["l2"], 1), w_sum=d["w_sum"], w=d["w"],
                       m=d["m"])


def gi_to_planes(r: ReservoirGI) -> dict:
    return dict(xn=pv.from_aos(r.xn, 1), nn=pv.from_aos(r.nn, 1),
                e3=pv.from_aos(r.e3, 1), w_sum=r.w_sum, w=r.w, m=r.m)


def planes_to_gi(d: dict) -> ReservoirGI:
    return ReservoirGI(xn=pv.to_aos(d["xn"], 1), nn=pv.to_aos(d["nn"], 1),
                       e3=pv.to_aos(d["e3"], 1), w_sum=d["w_sum"], w=d["w"],
                       m=d["m"])


def sdata_to_planes(s: SampleData) -> dict:
    return dict(x1=pv.from_aos(s.x1, 1), n1=pv.from_aos(s.n1, 1),
                o=pv.from_aos(s.o, 1), l1=pv.from_aos(s.l1, 1),
                mid=s.mid, obj=s.obj)


def planes_to_sdata(d: dict) -> SampleData:
    return SampleData(x1=pv.to_aos(d["x1"], 1), n1=pv.to_aos(d["n1"], 1),
                      o=pv.to_aos(d["o"], 1), l1=pv.to_aos(d["l1"], 1),
                      mid=d["mid"], obj=d["obj"])


def update_reservoir_p(r: dict, keys: tuple, accept_mask, wi, m_add,
                       sample: tuple, seed):
    """Planar UpdateReservoir (Reservoir_v6.hlsl:30-80) for either flavor.

    r: planar reservoir dict; keys: the 3 vec field names (('x2','n2','l2')
    or ('xn','nn','e3')); sample: matching tuple of planar vecs.
    Returns (reservoir dict, took, seed)."""
    u, seed = tea_random(seed)
    w_sum = jnp.where(accept_mask, r["w_sum"] + wi, r["w_sum"])
    m = jnp.where(accept_mask, r["m"] + m_add, r["m"])
    take = accept_mask & (u < wi / jnp.where(w_sum == 0.0, 1.0, w_sum))
    out = dict(r, w_sum=w_sum, m=m)
    for key, vec in zip(keys, sample):
        out[key] = pv.where(take, vec, r[key])
    return out, take, seed


def is_valid_di_p(r: dict) -> jax.Array:
    return (
        (pv.length(r["n2"]) > 0.0)
        & (pv.length(r["l2"]) > 0.0)
        & (r["w_sum"] > 0.0)
        & (r["m"] > 0.0)
    )


def is_valid_gi_p(r: dict) -> jax.Array:
    return (r["w_sum"] > 0.0) & (r["m"] > 0.0)
