"""Scene: the mesh/material/instance API the reference never materialized.

The reference's Scene/SceneObject classes are empty stubs
(src/Scene/Scene.h:9-11, src/Objects/SceneObject.h:12-14); the actual scene
is a hardcoded model list inside Renderer::LoadAssets (Renderer.cpp:363)
with one identity-transform instance per model (Renderer.cpp:915-923).
This class supplies the missing abstraction while preserving the observable
behaviors: global material table with a per-model default material, emissive
collection into a sorted CDF, per-frame instance transforms with prev-frame
history (the TLAS-refit analog, Renderer.cpp:594,2091-2121).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu.scene import obj_loader
from royaltracer_dx_tpu.scene.lights import collect_emissive_triangles
from royaltracer_dx_tpu.scene.lut import compute_ess_lut
from royaltracer_dx_tpu.scene.types import (
    LightTriangles,
    Materials,
    MeshData,
    SceneArrays,
)


class Scene:
    def __init__(self):
        self.meshes: list[MeshData] = []
        self._materials: list[dict] = []
        self.instance_mesh: list[int] = []
        self.transforms: list[np.ndarray] = []
        self.prev_transforms: list[np.ndarray] = []

    # ---------------- building ----------------

    def add_material(self, **mat) -> int:
        """Add a material dict (kd[4], ks[3], ke[3], ni, pr_pm_ps_pc[4]).
        Returns its global id."""
        full = dict(obj_loader.DEFAULT_MATERIAL)
        full.update(mat)
        self._materials.append(full)
        return len(self._materials) - 1

    def add_mesh(
        self,
        vertices: np.ndarray,
        indices: np.ndarray,
        normals: np.ndarray | None = None,
        tri_material: np.ndarray | None = None,
    ) -> int:
        """Add a mesh whose tri_material already holds GLOBAL material ids."""
        self.meshes.append(MeshData(vertices, indices, normals, tri_material))
        self._static = None
        return len(self.meshes) - 1

    def add_obj(self, path: str) -> int:
        """Load an OBJ model; local material ids are offset into the global
        table exactly like ObjLoader.h:455-460 + materialOffset."""
        data = obj_loader.load_obj(path)
        offset = len(self._materials)
        self._materials.extend(data["materials"])
        mesh = MeshData(
            data["vertices"],
            data["indices"],
            data["normals"],
            data["tri_material"] + offset,
        )
        self.meshes.append(mesh)
        self._static = None
        return len(self.meshes) - 1

    def add_instance(self, mesh_id: int, transform: np.ndarray | None = None) -> int:
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        self.instance_mesh.append(mesh_id)
        self.transforms.append(np.asarray(transform, np.float32))
        self.prev_transforms.append(np.asarray(transform, np.float32))
        self._static = None
        return len(self.instance_mesh) - 1

    def set_transform(self, instance_id: int, transform: np.ndarray):
        """Per-frame animation hook (Renderer::OnUpdate, Renderer.cpp:439-449).
        Rolls current -> prev like UpdateInstancePropertiesBuffer."""
        self.prev_transforms[instance_id] = self.transforms[instance_id]
        self.transforms[instance_id] = np.asarray(transform, np.float32)

    # ---------------- finalize ----------------

    @property
    def num_triangles(self) -> int:
        return sum(self.meshes[m].num_triangles for m in self.instance_mesh)

    def material_table(self) -> dict[str, np.ndarray]:
        mats = self._materials or [dict(obj_loader.DEFAULT_MATERIAL)]
        return dict(
            kd=np.asarray([m["kd"] for m in mats], np.float32),
            ks=np.asarray([m["ks"] for m in mats], np.float32),
            ke=np.asarray([m["ke"] for m in mats], np.float32),
            ni=np.asarray([m["ni"] for m in mats], np.float32),
            pr_pm_ps_pc=np.asarray([m["pr_pm_ps_pc"] for m in mats], np.float32),
        )

    def build_materials(self, with_lut: bool = True) -> Materials:
        t = self.material_table()
        lut = None
        if with_lut:
            lut = compute_ess_lut(t["pr_pm_ps_pc"][:, 0])
        return Materials.from_numpy(
            t["kd"], t["ks"], t["ni"], t["ke"], t["pr_pm_ps_pc"], lut
        )

    def build_lights(self) -> LightTriangles:
        t = self.material_table()
        return collect_emissive_triangles(
            self.meshes, self.instance_mesh, t["ke"], self.transforms)

    def _object_static(self):
        """Concatenated OBJECT-space triangle arrays + instance map, cached
        on device.  This is the per-mesh BLAS-input analog: built once,
        independent of instance transforms."""
        if getattr(self, "_static", None) is not None:
            return self._static
        tv, tn, tm, ti = [], [], [], []
        for inst, mesh_id in enumerate(self.instance_mesh):
            mesh = self.meshes[mesh_id]
            tv.append(mesh.vertices[mesh.indices])
            tn.append(mesh.normals[mesh.indices])
            tm.append(mesh.tri_material)
            ti.append(np.full(mesh.num_triangles, inst, np.int32))
        self._static = (
            jnp.asarray(np.concatenate(tv), jnp.float32),
            jnp.asarray(np.concatenate(tn), jnp.float32),
            jnp.asarray(np.concatenate(tm)),
            jnp.asarray(np.concatenate(ti)),
        )
        return self._static

    def flatten(
        self,
        materials: Materials | None = None,
        build_bvh: bool = False,
        bvh_leaf_size: int = 4,
        prev: SceneArrays | None = None,
        build_clusters: bool = False,
        cluster_group: int = 128,
        build_stream: bool = False,
        stream_method: str = "median",
    ) -> SceneArrays:
        """Bake instances into a world-space triangle soup (device arrays).

        This is the per-frame 'refit' analog: call again after
        set_transform to get updated world geometry.  With ``prev`` (the
        previous frame's arrays) the ENTIRE update runs on device with no
        O(triangles) host work — the object-space arrays are cached and a
        jitted transform re-bakes world space, then every built structure
        REFITS with fixed topology (the reference's per-frame TLAS
        updateOnly path, TopLevelASGenerator.cpp:240 / Renderer.cpp:594).
        build_bvh / build_clusters / build_stream pick acceleration
        structures for RenderConfig.traversal "bvh"/"cluster"/"stream".
        """
        if not self.instance_mesh:
            raise ValueError("scene has no instances")
        if materials is None:
            materials = self.build_materials()
        obj_tv, obj_tn, tm, ti = self._object_static()
        xf = jnp.asarray(np.stack(self.transforms), jnp.float32)
        tri_verts, tri_normals = _world_bake(obj_tv, obj_tn, ti, xf)
        bvh = None
        if prev is not None and prev.bvh is not None:
            from royaltracer_dx_tpu.ops.bvh import refit_lbvh

            bvh = refit_lbvh(prev.bvh, tri_verts)
        elif build_bvh:
            from royaltracer_dx_tpu.ops.bvh import build_lbvh

            bvh = build_lbvh(tri_verts, leaf_size=bvh_leaf_size)
        clusters = None
        if build_clusters or (prev is not None and prev.clusters is not None):
            from royaltracer_dx_tpu.ops.cluster_traverse import build_clusters as _bc

            if prev is not None and prev.clusters is not None:
                cluster_group = prev.clusters.group
            clusters = _bc(tri_verts, group=cluster_group)
        stream = None
        if prev is not None and prev.stream is not None:
            from royaltracer_dx_tpu.ops.stream_trace import refit_stream_accel

            stream = refit_stream_accel(prev.stream, tri_verts)
        elif build_stream:
            from royaltracer_dx_tpu.ops.stream_trace import build_stream_accel

            stream = build_stream_accel(tri_verts, method=stream_method)
        return SceneArrays(
            tri_verts=tri_verts,
            tri_normals=tri_normals,
            tri_material=tm,
            tri_instance=ti,
            materials=materials,
            lights=self.build_lights(),
            object_to_world=xf,
            prev_object_to_world=jnp.asarray(np.stack(self.prev_transforms), jnp.float32),
            bvh=bvh,
            clusters=clusters,
            stream=stream,
        ).with_tri_table()


@jax.jit
def _world_bake(obj_tv, obj_tn, tri_instance, transforms):
    """Object→world triangle bake, fully on device (planar component math;
    einsum would route through the MXU and round in bf16 by default).

    obj_tv/obj_tn: [T, 3, 3]; transforms [I, 4, 4].  Normal matrices are
    inverse-transpose of the 3x3 blocks, computed with the explicit
    adjugate (batched jnp.linalg.inv gathers badly on TPU).
    """
    rot = transforms[:, :3, :3]                       # [I, 3, 3]
    trn = transforms[:, :3, 3]                        # [I, 3]
    # adjugate / det = inverse; normal matrix = inverse^T
    a = rot
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
    c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    c10 = a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2]
    c11 = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
    c12 = a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1]
    c20 = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
    c21 = a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]
    c22 = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    # normal matrix rows (inverse-transpose): cofactor matrix * inv_det
    nrm = jnp.stack(
        [jnp.stack([c00, c01, c02], axis=-1),
         jnp.stack([c10, c11, c12], axis=-1),
         jnp.stack([c20, c21, c22], axis=-1)], axis=1) * inv_det[:, None, None]

    rot_t = rot[tri_instance]                          # [T, 3, 3]
    trn_t = trn[tri_instance]                          # [T, 3]
    nrm_t = nrm[tri_instance]

    def xform(pts, m, add=None):
        out = []
        for c in range(3):
            acc = (pts[:, :, 0] * m[:, None, c, 0]
                   + pts[:, :, 1] * m[:, None, c, 1]
                   + pts[:, :, 2] * m[:, None, c, 2])
            if add is not None:
                acc = acc + add[:, None, c]
            out.append(acc)
        return jnp.stack(out, axis=-1)

    world_v = xform(obj_tv, rot_t, trn_t)
    n = xform(obj_tn, nrm_t)
    ln = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    world_n = jnp.where(ln > 1e-12, n / jnp.maximum(ln, 1e-12), 0.0)
    return world_v, world_n
