"""Pallas packet-traversal kernel: the TPU-native answer to TraceRay.

Why a kernel: XLA:TPU gathers cost ~7ns per row regardless of width, so any
per-lane gather-driven BVH walk caps at a few Mrays/s (measurements in
PLAN.md).  This kernel removes per-lane gathers entirely:

  * the WHOLE LBVH (fused node records + leaf triangle blocks) sits in
    VMEM for the kernel's duration (fits scenes up to ~250k triangles);
  * rays are pre-sorted (direction octant + origin Morton) and processed
    in PACKETS that share ONE node cursor — node fetches are scalar
    dynamic slices from VMEM, not gathers;
  * all per-lane math (slab tests, Möller–Trumbore against a leaf block)
    is dense [LANES]-wide VPU work.

A packet walks the union of its rays' node visits (skip-link DFS with
per-lane t_best culling), which ray sorting keeps small for coherent ray
sets.  Grid steps stream ray tiles through the core while the resident
BVH block stays put.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from royaltracer_dx_tpu.ops.bvh import LBVH, morton_codes
from royaltracer_dx_tpu.ops.intersect import Hit, INF

LANES = 512          # rays per packet (= per grid step)
_MAX_STEPS_FACTOR = 4


def _skip_scalar(node):
    """Analytic DFS skip for a heap-indexed complete tree (scalar).

    Mosaic has no scalar population_count; compute it on a (1, 1) vector
    and extract.
    """
    x = (node + 1).astype(jnp.uint32)
    low1 = (x & (~x + jnp.uint32(1))) - jnp.uint32(1)
    ctz = jax.lax.population_count(low1[None, None])[0, 0]
    anc = (node.astype(jnp.uint32) >> ctz).astype(jnp.int32)
    return jnp.where(anc <= 1, 0, anc + 1)


def _make_kernel(p: int, leaf_size: int, max_steps: int):
    def kernel(nodes_ref, leafs_ref, o_ref, d_ref, inv_ref, tmin_ref,
               t_out, tri_out, uv_out):
        o = o_ref[:]            # [LANES, 3]
        inv = inv_ref[:]
        t_min = tmin_ref[:, 0]

        def cond(carry):
            node, step, t_best, tri, u, v = carry
            return (node > 0) & (step < max_steps)

        def body(carry):
            node, step, t_best, tri, u, v = carry
            row = nodes_ref[pl.ds(node, 1), :]        # [1, 8]
            bmin = row[0, :3]
            bmax = row[0, 3:6]
            t0 = (bmin[None, :] - o) * inv
            t1 = (bmax[None, :] - o) * inv
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            t_enter = jnp.maximum(jnp.max(lo, axis=-1), t_min)
            t_exit = jnp.minimum(jnp.min(hi, axis=-1), t_best)
            hit_any = jnp.any(t_enter <= t_exit)
            is_leaf = node >= p

            def leaf_case(args):
                t_best, tri, u, v = args
                # leaf row layout: 9 component planes of ls floats each —
                # [v0x v0y v0z e1x e1y e1z e2x e2y e2z]; Mosaic handles the
                # resulting pure-2D broadcasts (no vector reshapes)
                blk = leafs_ref[pl.ds(node - p, 1), :]          # [1, 9*ls]
                ls = leaf_size
                c = [blk[0, i * ls:(i + 1) * ls][None, :] for i in range(9)]
                v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = c
                d = d_ref[:]
                dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]     # [LANES, 1]
                ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
                # pc = d x e2
                pcx = dy * e2z - dz * e2y
                pcy = dz * e2x - dx * e2z
                pcz = dx * e2y - dy * e2x
                det = e1x * pcx + e1y * pcy + e1z * pcz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                uu = (tx * pcx + ty * pcy + tz * pcz) * inv_det
                # q = tvec x e1
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > t_min[:, None]) & (tt < t_best[:, None])
                )
                tt = jnp.where(ok, tt, 1e30)  # python literal: pallas
                # kernels may not capture device-array constants
                best = jnp.argmin(tt, axis=-1)
                t_c = jnp.min(tt, axis=-1)
                better = t_c < t_best
                tri_id = (node - p) * leaf_size + best
                # per-lane select of the winning candidate without gathers
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (LANES, leaf_size), 1)
                    == best[:, None]
                )
                u_best = jnp.sum(jnp.where(sel, uu, 0.0), axis=-1)
                v_best = jnp.sum(jnp.where(sel, vv, 0.0), axis=-1)
                return (
                    jnp.where(better, t_c, t_best),
                    jnp.where(better, tri_id, tri),
                    jnp.where(better, u_best, u),
                    jnp.where(better, v_best, v),
                )

            do_leaf = hit_any & is_leaf
            t_best, tri, u, v = jax.lax.cond(
                do_leaf, leaf_case, lambda a: a, (t_best, tri, u, v)
            )
            descend = hit_any & ~is_leaf
            nxt = jnp.where(descend, 2 * node, _skip_scalar(node))
            return (nxt, step + 1, t_best, tri, u, v)

        node0 = jnp.int32(1)
        init = (
            node0,
            jnp.int32(0),
            tmin_ref[:, 1] * 1.0,                 # per-lane t_max
            jnp.full((LANES,), -1, jnp.int32),
            jnp.zeros((LANES,), jnp.float32),
            jnp.zeros((LANES,), jnp.float32),
        )
        _, _, t_best, tri, u, v = jax.lax.while_loop(cond, body, init)
        t_out[:, 0] = t_best
        tri_out[:, 0] = tri
        uv_out[:, 0] = u
        uv_out[:, 1] = v

    return kernel


def sort_rays(origins: jax.Array, dirs: jax.Array) -> jax.Array:
    """Coherence permutation: direction octant (3 bits) then origin Morton.

    Returns the permutation (apply with arr[perm]; invert with argsort)."""
    lo = jnp.min(origins, axis=0)
    hi = jnp.max(origins, axis=0)
    m = morton_codes(origins, lo, hi) >> 6          # 24 bits
    octant = (
        (dirs[:, 0] > 0).astype(jnp.uint32) * 4
        + (dirs[:, 1] > 0).astype(jnp.uint32) * 2
        + (dirs[:, 2] > 0).astype(jnp.uint32)
    )
    key = (octant << 27) | m
    return jnp.argsort(key).astype(jnp.int32)


@jax.jit
def _prep_nodes(bvh: LBVH):
    """Kernel-side layouts: padded node rows + component-planar leaf rows
    [v0x(ls) v0y v0z e1x e1y e1z e2x e2y e2z]."""
    nodes8 = jnp.pad(bvh.nodes, ((0, 0), (0, 2)))
    p = bvh.num_leaves
    ls = bvh.leaf_size
    tv = bvh.sorted_tris.reshape(p, ls, 3, 3)
    v0 = tv[:, :, 0, :]
    e1 = tv[:, :, 1, :] - v0
    e2 = tv[:, :, 2, :] - v0
    planes = [v0[..., 0], v0[..., 1], v0[..., 2],
              e1[..., 0], e1[..., 1], e1[..., 2],
              e2[..., 0], e2[..., 1], e2[..., 2]]
    leafs = jnp.concatenate(planes, axis=-1)          # [P, 9*ls]
    return nodes8, leafs


def closest_hit_packet(
    origins: jax.Array,
    dirs: jax.Array,
    bvh: LBVH,
    t_min: float = 1e-4,
    t_max: float = 1e4,
    presort: bool = True,
) -> Hit:
    """Closest hit via the packet kernel.  N must be a multiple of LANES
    (pad rays with degenerate entries if needed)."""
    n = origins.shape[0]
    assert n % LANES == 0, f"ray count {n} not a multiple of {LANES}"
    p = bvh.num_leaves
    ls = bvh.leaf_size
    nodes8, leafs = _prep_nodes(bvh)

    if presort:
        perm = sort_rays(origins, dirs)
        origins_s = origins[perm]
        dirs_s = dirs[perm]
    else:
        perm = None
        origins_s, dirs_s = origins, dirs

    big = jnp.where(dirs_s >= 0.0, 1e20, -1e20)
    inv = jnp.where(jnp.abs(dirs_s) > 1e-20, 1.0 / dirs_s, big)
    tmm = jnp.broadcast_to(
        jnp.asarray([t_min, t_max], jnp.float32), (n, 2)
    )

    grid = n // LANES
    max_steps = _MAX_STEPS_FACTOR * p + 64
    kernel = _make_kernel(p, ls, max_steps)

    ray_spec = lambda w: pl.BlockSpec((LANES, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    resident = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)

    t, tri, uv = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            resident(nodes8),
            resident(leafs),
            ray_spec(3),
            ray_spec(3),
            ray_spec(3),
            ray_spec(2),
        ],
        out_specs=(
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
        ),
    )(nodes8, leafs, origins_s, dirs_s, inv, tmm)

    t = t[:, 0]
    tri = tri[:, 0]
    u = uv[:, 0]
    v = uv[:, 1]
    if perm is not None:
        inv_perm = jnp.argsort(perm)
        t, tri, u, v = t[inv_perm], tri[inv_perm], u[inv_perm], v[inv_perm]

    found = tri >= 0
    orig = jnp.where(found, bvh.perm[jnp.maximum(tri, 0)], 0)
    return Hit(
        t=jnp.where(found, t, INF),
        tri=orig.astype(jnp.int32),
        u=u,
        v=v,
    )
