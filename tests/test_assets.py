"""Generated benchmark assets (scene/assets.py): OBJ round-trip, scale,
materials/lights, and a tiny end-to-end render of the atrium."""

import os

import numpy as np
import pytest

from royaltracer_dx_tpu.scene import assets
from royaltracer_dx_tpu.scene.obj_loader import load_obj
from royaltracer_dx_tpu.scene.scene import Scene


def test_atrium_obj_roundtrip(tmp_path):
    path = str(tmp_path / "atrium.obj")
    assets.generate_atrium(path, detail=0.3)
    d = load_obj(path)
    tris = d["indices"].shape[0]
    assert tris > 10_000
    names = [m for m in d["materials"]]
    assert len(names) >= 14
    ke = np.array([m["ke"] for m in d["materials"]])
    emissive = np.where(ke.sum(1) > 0)[0]
    assert len(emissive) == 1
    # all 48 lamps present (8 tris per octahedron core)
    lamp_tris = np.isin(d["tri_material"], emissive).sum()
    assert lamp_tris == 48 * 8
    # geometry is inside the hall bounds
    v = d["vertices"]
    assert v[:, 1].min() >= -0.5 and v[:, 1].max() <= 10.0


def test_bunny_smooth_normals(tmp_path):
    path = str(tmp_path / "bunny.obj")
    assets.generate_bunny(path, subdiv=3)
    d = load_obj(path)
    assert d["indices"].shape[0] == 20 * 4**3
    n = d["normals"]
    ln = np.linalg.norm(n, axis=1)
    assert (ln > 0.9).mean() > 0.99   # smooth normals everywhere


def test_dragon_scale_and_manifold(tmp_path):
    path = str(tmp_path / "dragon.obj")
    assets.generate_dragon(path, nu=60, nv=20)
    d = load_obj(path)
    assert d["indices"].shape[0] == 60 * 20 * 2
    # closed tube: every vertex is referenced
    used = np.zeros(d["vertices"].shape[0], bool)
    used[d["indices"].ravel()] = True
    assert used.all()


def test_ensure_asset_caches(tmp_path, monkeypatch):
    monkeypatch.setenv("ROYALTRACER_ASSET_DIR", str(tmp_path))
    p1 = assets.ensure_asset("bunny", subdiv=2)
    t1 = os.path.getmtime(p1)
    p2 = assets.ensure_asset("bunny")
    assert p1 == p2 and os.path.getmtime(p2) == t1
    with pytest.raises(KeyError):
        assets.ensure_asset("teapot")


def test_atrium_renders(tmp_path):
    """Low-detail atrium through Scene -> ReSTIR: finite, lit image and a
    populated many-light CDF (the Sponza workload shape)."""
    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer

    path = str(tmp_path / "atrium.obj")
    assets.generate_atrium(path, detail=0.15)
    s = Scene()
    s.add_instance(s.add_obj(path))
    cfg = RenderConfig(width=32, height=32, gi_bounces=1, traversal="brute")
    cam = Camera(eye=(-9.5, 2.2, 0.0), center=(6.0, 3.4, 0.0))
    r = RestirRenderer(s, cam, cfg)
    r.render()
    acc = np.asarray(r.fb.accum)
    assert np.isfinite(acc).all()
    assert acc.mean() > 1e-3          # the 48 lamps light the hall
    assert int(r.scene_arrays.lights.verts.shape[0]) == 48 * 8
