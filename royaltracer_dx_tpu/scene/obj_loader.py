"""Wavefront OBJ/MTL loader → numpy SoA mesh + materials.

Python re-implementation of the reference's tinyobj-based loader
(ObjLoader.h:393-495):
  * one default material is prepended per model (ObjLoader.h:415-417);
    faces without a material map to it (material id -1 + offset)
  * MTL PBR extensions Pr/Pm/Ps/Pc → roughness/metallic/sheen/clearcoat
    (ObjLoader.h:430), Kd + dissolve → kd.xyzw, Ks, Ke, Ni
  * vertices deduped on (position, normal) — the reference hashes position
    only but compares positions for equality (Vertex.h:32-35), so position
    dedup is the observable behavior; we dedup on (pos, normal) to keep
    distinct normals correct, which only affects smooth-shading corner cases
  * polygon faces are fan-triangulated (tinyobj default triangulation)
"""

from __future__ import annotations

import os

import numpy as np

# Default material per model (Vertex.h:14-23 defaults with the ctor args
# from ObjLoader.h:415: Kd=(1,1,1,1), Pr_Pm_Ps_Pc=(1,0,0,0), Ks=(1,1,1),
# Ni=1, Ke=0).
DEFAULT_MATERIAL = dict(
    kd=(1.0, 1.0, 1.0, 1.0),
    ks=(1.0, 1.0, 1.0),
    ke=(0.0, 0.0, 0.0),
    ni=1.0,
    pr_pm_ps_pc=(1.0, 0.0, 0.0, 0.0),
)


def parse_mtl(path: str) -> tuple[list[str], list[dict]]:
    """Parse a .mtl file → (names, material dicts)."""
    names: list[str] = []
    mats: list[dict] = []
    cur: dict | None = None

    def f3(tok):
        return (float(tok[0]), float(tok[1]), float(tok[2]))

    with open(path, "r", errors="replace") as fh:
        for line in fh:
            tok = line.split()
            if not tok or tok[0].startswith("#"):
                continue
            key = tok[0]
            if key == "newmtl":
                cur = dict(
                    kd=[1.0, 1.0, 1.0, 1.0],
                    ks=[0.0, 0.0, 0.0],
                    ke=[0.0, 0.0, 0.0],
                    ni=1.0,
                    pr_pm_ps_pc=[0.0, 0.0, 0.0, 0.0],
                )
                names.append(tok[1] if len(tok) > 1 else f"mat{len(mats)}")
                mats.append(cur)
            elif cur is None:
                continue
            elif key == "Kd":
                cur["kd"][:3] = f3(tok[1:4])
            elif key == "Ks":
                cur["ks"] = list(f3(tok[1:4]))
            elif key == "Ke":
                cur["ke"] = list(f3(tok[1:4]))
            elif key == "Ni":
                cur["ni"] = float(tok[1])
            elif key == "d":
                cur["kd"][3] = float(tok[1])
            elif key == "Pr":
                cur["pr_pm_ps_pc"][0] = float(tok[1])
            elif key == "Pm":
                cur["pr_pm_ps_pc"][1] = float(tok[1])
            elif key == "Ps":
                cur["pr_pm_ps_pc"][2] = float(tok[1])
            elif key == "Pc":
                cur["pr_pm_ps_pc"][3] = float(tok[1])
    return names, mats


def _load_obj_native(path: str):
    """Native-parser path (royaltracer_dx_tpu.native, the tiny_obj_loader
    counterpart).  Geometry parses in C; mtllib/usemtl statements replay
    here so material-id assignment is byte-identical to the Python path.
    Returns the load_obj dict or None if the extension is unavailable."""
    from royaltracer_dx_tpu import native

    parsed = native.parse_obj_geometry(path)
    if parsed is None:
        return None
    verts6, indices, tri_slot, stmt_lines = parsed

    base = os.path.dirname(os.path.abspath(path))
    mtl_names: list[str] = []
    materials: list[dict] = [dict(DEFAULT_MATERIAL)]
    slot_to_mat = [0]  # slot 0 = before any usemtl
    for line in stmt_lines:
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "mtllib" and len(tok) > 1:
            mtl_path = os.path.join(base, tok[1])
            if os.path.exists(mtl_path):
                names, mats = parse_mtl(mtl_path)
                mtl_names.extend(names)
                materials.extend(mats)
        elif tok[0] == "usemtl":
            name = tok[1] if len(tok) > 1 else ""
            slot_to_mat.append(
                (mtl_names.index(name) + 1) if name in mtl_names else 0)
    tri_material = np.asarray(slot_to_mat, np.int32)[tri_slot]
    return dict(
        vertices=np.ascontiguousarray(verts6[:, :3]),
        normals=np.ascontiguousarray(verts6[:, 3:]),
        indices=indices,
        tri_material=tri_material,
        materials=materials,
    )


def load_obj(path: str, use_native: bool = True):
    """Load an OBJ file.

    Returns dict with:
      vertices [V,3], normals [V,3] (zeros where absent), indices [T,3],
      tri_material [T] (LOCAL ids: 0 = default material, 1..K = mtl order),
      materials: list of K+1 dicts (default first).

    use_native: try the C parser first (same results, ~40x faster on
    Sponza-class assets); the pure-Python path is the fallback/spec.
    """
    if use_native:
        out = _load_obj_native(path)
        if out is not None:
            return out
    positions: list[tuple] = []
    obj_normals: list[tuple] = []
    mtl_names: list[str] = []
    materials: list[dict] = [dict(DEFAULT_MATERIAL)]

    # dedup map over (pos_idx, normal_idx) resolved values
    unique: dict[tuple, int] = {}
    out_verts: list[tuple] = []
    out_norms: list[tuple] = []
    indices: list[int] = []
    tri_material: list[int] = []
    cur_mat = 0  # default

    base = os.path.dirname(os.path.abspath(path))

    def vertex_id(vi: int, ni: int) -> int:
        p = positions[vi]
        n = obj_normals[ni] if ni >= 0 else (0.0, 0.0, 0.0)
        key = (p, n)
        idx = unique.get(key)
        if idx is None:
            idx = len(out_verts)
            unique[key] = idx
            out_verts.append(p)
            out_norms.append(n)
        return idx

    with open(path, "r", errors="replace") as fh:
        for line in fh:
            tok = line.split()
            if not tok or tok[0].startswith("#"):
                continue
            key = tok[0]
            if key == "v":
                positions.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif key == "vn":
                obj_normals.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif key == "mtllib":
                mtl_path = os.path.join(base, tok[1])
                if os.path.exists(mtl_path):
                    names, mats = parse_mtl(mtl_path)
                    mtl_names.extend(names)
                    materials.extend(mats)
            elif key == "usemtl":
                name = tok[1] if len(tok) > 1 else ""
                cur_mat = (mtl_names.index(name) + 1) if name in mtl_names else 0
            elif key == "f":
                face = []
                for v in tok[1:]:
                    parts = v.split("/")
                    vi = int(parts[0])
                    vi = vi - 1 if vi > 0 else len(positions) + vi
                    ni = -1
                    if len(parts) >= 3 and parts[2]:
                        ni = int(parts[2])
                        ni = ni - 1 if ni > 0 else len(obj_normals) + ni
                    face.append(vertex_id(vi, ni))
                for k in range(1, len(face) - 1):
                    indices.extend((face[0], face[k], face[k + 1]))
                    tri_material.append(cur_mat)

    return dict(
        vertices=np.asarray(out_verts, np.float32).reshape(-1, 3),
        normals=np.asarray(out_norms, np.float32).reshape(-1, 3),
        indices=np.asarray(indices, np.int32).reshape(-1, 3),
        tri_material=np.asarray(tri_material, np.int32),
        materials=materials,
    )
