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

import numpy as np
import jax.numpy as jnp

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
        return len(self.meshes) - 1

    def add_instance(self, mesh_id: int, transform: np.ndarray | None = None) -> int:
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        self.instance_mesh.append(mesh_id)
        self.transforms.append(np.asarray(transform, np.float32))
        self.prev_transforms.append(np.asarray(transform, np.float32))
        return len(self.instance_mesh) - 1

    def set_transform(self, instance_id: int, transform: np.ndarray):
        """Per-frame animation hook (Renderer::OnUpdate, Renderer.cpp:439-449).
        Rolls current -> prev like UpdateInstancePropertiesBuffer."""
        self.prev_transforms[instance_id] = self.transforms[instance_id]
        self.transforms[instance_id] = np.asarray(transform, np.float32)

    # ---------------- finalize ----------------

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

    def flatten(
        self,
        materials: Materials | None = None,
        build_bvh: bool = False,
        bvh_leaf_size: int = 4,
        prev: SceneArrays | None = None,
        build_clusters: bool = False,
        cluster_group: int = 128,
    ) -> SceneArrays:
        """Bake instances into a world-space triangle soup (device arrays).

        This is the per-frame 'refit' analog: call again after
        set_transform to get updated world geometry.  With build_bvh, an
        LBVH is built over the soup; pass ``prev`` (the previous frame's
        arrays) to REFIT its tree instead of rebuilding (same topology,
        updated bounds — the reference's TLAS updateOnly path,
        Renderer.cpp:594).  With build_clusters, morton-ordered triangle
        clusters are built for the tile-clustered traversal (rebuilt, not
        refit, on animation — the build is a host-side sort).
        """
        if not self.instance_mesh:
            raise ValueError("scene has no instances")
        if materials is None:
            materials = self.build_materials()
        tv, tn, tm, ti = [], [], [], []
        for inst, mesh_id in enumerate(self.instance_mesh):
            mesh = self.meshes[mesh_id]
            m = self.transforms[inst]
            nrm_m = np.linalg.inv(m[:3, :3]).T
            v = mesh.vertices @ m[:3, :3].T + m[:3, 3]
            n = mesh.normals @ nrm_m.T
            ln = np.linalg.norm(n, axis=-1, keepdims=True)
            n = np.where(ln > 1e-12, n / np.maximum(ln, 1e-12), 0.0)
            tv.append(v[mesh.indices])
            tn.append(n[mesh.indices])
            tm.append(mesh.tri_material)
            ti.append(np.full(mesh.num_triangles, inst, np.int32))
        tri_verts = jnp.asarray(np.concatenate(tv), jnp.float32)
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
        return SceneArrays(
            tri_verts=tri_verts,
            tri_normals=jnp.asarray(np.concatenate(tn), jnp.float32),
            tri_material=jnp.asarray(np.concatenate(tm)),
            tri_instance=jnp.asarray(np.concatenate(ti)),
            materials=materials,
            lights=self.build_lights(),
            object_to_world=jnp.asarray(np.stack(self.transforms), jnp.float32),
            prev_object_to_world=jnp.asarray(np.stack(self.prev_transforms), jnp.float32),
            bvh=bvh,
            clusters=clusters,
        ).with_tri_table()
