"""Scene building, OBJ loading (against the reference's shipped assets),
light CDF construction."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from royaltracer_dx_tpu.ops.light_sampling import select_light
from royaltracer_dx_tpu.scene.obj_loader import load_obj, parse_mtl
from royaltracer_dx_tpu.scene.procedural import cornell_box, menger_sponge, random_tris
from royaltracer_dx_tpu.scene.scene import Scene

REF_INCLUDE = "/root/reference/Pathtracer/include"


@pytest.mark.skipif(not os.path.exists(REF_INCLUDE), reason="reference assets absent")
def test_load_garage_obj():
    data = load_obj(os.path.join(REF_INCLUDE, "garage.obj"))
    # 1254 'f' lines, all triangles (SURVEY.md section 6)
    assert data["indices"].shape[0] == 1254
    # 3 MTL materials + 1 default
    assert len(data["materials"]) == 4
    kes = np.array([m["ke"] for m in data["materials"]])
    assert (kes[3] == 5.0).all()  # 'lights' material Ke=5 (garage.mtl)
    # emissive faces exist
    lit = kes[data["tri_material"]].sum(axis=-1) > 0
    assert lit.sum() > 0


@pytest.mark.skipif(not os.path.exists(REF_INCLUDE), reason="reference assets absent")
def test_load_monke_obj():
    data = load_obj(os.path.join(REF_INCLUDE, "monke.obj"))
    assert data["indices"].shape[0] == 967
    mats = data["materials"]
    assert len(mats) == 2
    assert np.isclose(mats[1]["pr_pm_ps_pc"][1], 1.0)  # metallic monke


@pytest.mark.skipif(not os.path.exists(REF_INCLUDE), reason="reference assets absent")
def test_parse_mtl_pbr_extensions():
    names, mats = parse_mtl(os.path.join(REF_INCLUDE, "garage.mtl"))
    assert names == ["black_walls", "floor", "lights"]
    floor = mats[1]
    assert np.isclose(floor["pr_pm_ps_pc"][0], 1.0)  # Pr
    assert np.isclose(floor["pr_pm_ps_pc"][1], 1.0)  # Pm
    assert np.isclose(floor["ni"], 1.45)
    assert floor["kd"][:3] == [0.9, 0.9, 0.0]


def test_cornell_box_lights():
    scene = cornell_box()
    arrays = scene.flatten(scene.build_materials(with_lut=False))
    lights = arrays.lights
    assert lights.count == 2
    cdf = np.asarray(lights.cdf)
    assert np.isclose(cdf[-1], 1.0)
    assert (np.diff(cdf) >= 0).all()
    assert np.isclose(np.asarray(lights.weight).sum(), 1.0, atol=1e-6)
    # total = sum area*avgKe: two tris of the 0.36^2 quad with Ke=15
    assert np.isclose(float(lights.total_weight), 0.36 * 0.36 * 15.0, rtol=1e-5)


def test_light_cdf_binary_search_equivalence():
    scene = cornell_box()
    lights = scene.build_lights()
    cdf = np.asarray(lights.cdf)
    us = np.linspace(0, 0.9999, 37, dtype=np.float32)
    got = np.asarray(select_light(lights, jnp.asarray(us)))
    for u, g in zip(us, got):
        # reference loop: first index with u < cdf[i]
        exp = next(i for i, c in enumerate(cdf) if u < c)
        assert g == exp


def test_instance_transform_flatten():
    scene = cornell_box()
    arrays0 = scene.flatten(scene.build_materials(with_lut=False))
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [1.0, 0.0, 0.0]
    scene.set_transform(0, t)
    arrays1 = scene.flatten(scene.build_materials(with_lut=False))
    delta = np.asarray(arrays1.tri_verts) - np.asarray(arrays0.tri_verts)
    assert np.allclose(delta[..., 0], 1.0, atol=1e-6)
    assert np.allclose(delta[..., 1:], 0.0, atol=1e-6)
    # prev transform rolled
    assert np.allclose(np.asarray(arrays1.prev_object_to_world[0]), np.eye(4))


def test_menger_sponge_counts():
    v, idx = menger_sponge(levels=1)
    assert idx.shape[0] == 20 * 12
    v2, idx2 = menger_sponge(levels=2)
    assert idx2.shape[0] == 400 * 12


def test_random_tris():
    v, idx = random_tris(1000)
    assert idx.shape == (1000, 3)
    assert v.shape == (3000, 3)


def test_scene_requires_instance():
    s = Scene()
    s.add_mesh(np.zeros((3, 3), np.float32), np.asarray([[0, 1, 2]], np.int32))
    try:
        s.flatten(s.build_materials(with_lut=False))
        assert False, "expected ValueError"
    except ValueError:
        pass
