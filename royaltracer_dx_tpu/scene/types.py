"""Scene data as SoA pytrees.

The reference's GPU-side resource ABI (Common_v6.hlsl:53-103: Material,
STriVertex {pos, normal.w=materialVertexOffset}, InstanceProperties,
LightTriangle) becomes dense structure-of-arrays pytrees here — TPU kernels
want contiguous per-field arrays, not interleaved structs.  The
materialID-per-face-vertex + normal.w offset indirection (Hit_v6.hlsl:17)
collapses to a per-triangle material id.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Materials:
    """Material table (Common_v6.hlsl:53-60 semantics).

    kd[..., 3] carries dissolve/alpha like the reference's Kd.w.
    lut is the 16-entry GGX multiscatter energy table per material
    (ObjLoader.h:351-387).
    """

    kd: jax.Array          # [M, 4]
    ks: jax.Array          # [M, 3]
    ni: jax.Array          # [M]
    ke: jax.Array          # [M, 3]
    pr_pm_ps_pc: jax.Array  # [M, 4]  roughness, metallic, sheen, clearcoat
    lut: jax.Array         # [M, 16]

    @property
    def count(self) -> int:
        return self.kd.shape[0]

    @staticmethod
    def from_numpy(
        kd, ks, ni, ke, pr_pm_ps_pc, lut=None
    ) -> "Materials":
        kd = jnp.asarray(kd, jnp.float32)
        m = kd.shape[0]
        if lut is None:
            lut = jnp.ones((m, 16), jnp.float32)
        return Materials(
            kd=kd,
            ks=jnp.asarray(ks, jnp.float32),
            ni=jnp.asarray(ni, jnp.float32),
            ke=jnp.asarray(ke, jnp.float32),
            pr_pm_ps_pc=jnp.asarray(pr_pm_ps_pc, jnp.float32),
            lut=jnp.asarray(lut, jnp.float32),
        )


class MeshData:
    """Host-side indexed mesh (numpy).  The analog of one model's VB/IB
    (Renderer.cpp CreateVB, ObjLoader.h:393-495)."""

    def __init__(
        self,
        vertices: np.ndarray,       # [V, 3] float32
        indices: np.ndarray,        # [T, 3] int32
        normals: np.ndarray | None = None,   # [V, 3] float32; zeros = flat
        tri_material: np.ndarray | None = None,  # [T] int32 (global ids)
    ):
        self.vertices = np.asarray(vertices, np.float32)
        self.indices = np.asarray(indices, np.int32).reshape(-1, 3)
        if normals is None:
            normals = np.zeros_like(self.vertices)
        self.normals = np.asarray(normals, np.float32)
        if tri_material is None:
            tri_material = np.zeros(len(self.indices), np.int32)
        self.tri_material = np.asarray(tri_material, np.int32)

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]


@flax.struct.dataclass
class LightTriangles:
    """Emissive-triangle table with sampling CDF.

    Mirrors LightTriangle (Common_v6.hlsl:86-97) + the collection pass
    (Renderer.cpp:2123-2213): object-space vertices, owning instance,
    normalized weight (= selection probability), cumulative cdf, emission,
    and the total unnormalized weight.
    """

    verts: jax.Array        # [L, 3, 3] object space
    instance: jax.Array     # [L] int32
    weight: jax.Array       # [L] normalized selection probability
    cdf: jax.Array          # [L]
    emission: jax.Array     # [L, 3]
    total_weight: jax.Array  # [] scalar, sum of area*avgKe

    @property
    def count(self) -> int:
        return self.verts.shape[0]


@flax.struct.dataclass
class SceneArrays:
    """Device-side flattened scene used by the render kernels.

    Triangles are pre-transformed to world space (the reference's TLAS holds
    world transforms; we bake them at 'refit' time, scene.flatten()).
    """

    tri_verts: jax.Array     # [T, 3, 3] world space
    tri_normals: jax.Array   # [T, 3, 3] world space unit vertex normals (0 = flat)
    tri_material: jax.Array  # [T] int32
    tri_instance: jax.Array  # [T] int32
    materials: Materials
    lights: LightTriangles
    object_to_world: jax.Array       # [I, 4, 4]
    prev_object_to_world: jax.Array  # [I, 4, 4]
    bvh: object = None               # LBVH when built (traversal="bvh")
    clusters: object = None          # Clusters when built (traversal="cluster")
    stream: object = None            # StreamAccel when built (traversal="stream")
    # packed per-triangle shading record: verts(9) normals(9) mid obj as
    # ONE wide [T, 20] row — XLA-TPU row-gather cost is per gather OP,
    # nearly independent of row width (honest fixed-consumption harness,
    # profile_r5f at 2.07M lanes: one 96 B gather 2.7 ns/r vs three
    # <= 32 B gathers 7.6; the old narrow-shard design rested on
    # DCE-polluted rows).  Ids ride as float VALUES (exact for
    # |id| < 2^24), NOT bitcasts: small ints bitcast to f32 are
    # denormals, which the TPU flushes to zero in transit.
    tri_table: jax.Array | None = None

    def with_tri_table(self) -> "SceneArrays":
        t = self.num_triangles
        v9 = self.tri_verts.reshape(t, 9)
        n9 = self.tri_normals.reshape(t, 9)
        ids = jnp.stack([self.tri_material.astype(jnp.float32),
                         self.tri_instance.astype(jnp.float32)], axis=1)
        table = jnp.concatenate([v9, n9, ids], axis=1)   # [T, 20]
        return self.replace(tri_table=table)

    @property
    def num_triangles(self) -> int:
        return self.tri_verts.shape[0]
