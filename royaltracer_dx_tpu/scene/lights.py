"""Emissive-triangle collection and CDF construction.

Re-implements Renderer::CollectEmissiveTriangles + ComputeTriangleWeight
(Renderer.cpp:2123-2233): for every instance, every triangle whose material
has Ke > 0 becomes a light with weight = area * avg(Ke), computed on the
OBJECT-space vertices (the reference maps the raw VB).  Lights are sorted by
descending weight, weights normalized to selection probabilities, and a
cumulative CDF is built with cdf[-1] forced to exactly 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu.scene.types import LightTriangles, MeshData


def collect_emissive_triangles(
    meshes: list[MeshData],
    instance_mesh: list[int],
    ke_table: np.ndarray,
    transforms: list[np.ndarray] | None = None,
) -> LightTriangles:
    """Build the light table.

    Args:
      meshes: model list.
      instance_mesh: mesh index per instance (Renderer.cpp:915-923 creates
        one instance per model).
      ke_table: [M, 3] global material emission table.
      transforms: optional per-instance object-to-world matrices.  The
        reference weighs lights by OBJECT-space area (it maps the raw VB,
        Renderer.cpp:2123-2213, and only ever instanced lights with
        identity transforms); we weigh by WORLD-space area so the CDF
        selection probabilities stay consistent with the world-space pdf
        the samplers compute (ops/light_sampling.py light_tables) for
        scaled/animated emissive instances.  Stored vertices remain
        object-space — samplers transform through the CURRENT frame's
        matrices (light_world_verts).
    """
    verts, inst, weight, emission = [], [], [], []
    for instance_index, mesh_index in enumerate(instance_mesh):
        mesh = meshes[mesh_index]
        tri = mesh.vertices[mesh.indices]  # [T, 3, 3]
        ke = ke_table[mesh.tri_material]  # [T, 3]
        lit = ke.sum(axis=-1) > 0.0
        if not lit.any():
            continue
        tv = tri[lit]
        tw = tv
        if transforms is not None:
            m = np.asarray(transforms[instance_index], np.float32)
            tw = tv @ m[:3, :3].T + m[:3, 3]
        e1 = tw[:, 1] - tw[:, 0]
        e2 = tw[:, 2] - tw[:, 0]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        avg_ke = ke[lit].mean(axis=-1)
        verts.append(tv)
        inst.append(np.full(len(tv), instance_index, np.int32))
        weight.append(area * avg_ke)
        emission.append(ke[lit])

    if not verts:
        # No lights: single degenerate entry so kernels stay shape-static.
        return LightTriangles(
            verts=jnp.zeros((1, 3, 3), jnp.float32),
            instance=jnp.zeros((1,), jnp.int32),
            weight=jnp.zeros((1,), jnp.float32),
            cdf=jnp.ones((1,), jnp.float32),
            emission=jnp.zeros((1, 3), jnp.float32),
            total_weight=jnp.asarray(0.0, jnp.float32),
        )

    verts = np.concatenate(verts)
    inst = np.concatenate(inst)
    weight = np.concatenate(weight).astype(np.float32)
    emission = np.concatenate(emission).astype(np.float32)

    order = np.argsort(-weight, kind="stable")
    verts, inst, weight, emission = verts[order], inst[order], weight[order], emission[order]

    total = float(weight.sum())
    prob = weight / total
    cdf = np.cumsum(prob).astype(np.float32)
    cdf[-1] = 1.0

    return LightTriangles(
        verts=jnp.asarray(verts, jnp.float32),
        instance=jnp.asarray(inst),
        weight=jnp.asarray(prob, jnp.float32),
        cdf=jnp.asarray(cdf),
        emission=jnp.asarray(emission),
        total_weight=jnp.asarray(total, jnp.float32),
    )
