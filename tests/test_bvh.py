"""LBVH build/refit/traversal: parity against the brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from royaltracer_dx_tpu.ops.bvh import LBVH, build_lbvh, dfs_links, morton_codes, refit_lbvh
from royaltracer_dx_tpu.ops.intersect import closest_hit_brute, any_hit_brute, INF
from royaltracer_dx_tpu.ops.traverse import any_hit_bvh, closest_hit_bvh
from royaltracer_dx_tpu.scene.procedural import cornell_box, random_tris


def _rays(n, seed=0, extent=1.2):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_morton_orders_spatially():
    pts = jnp.asarray([[0.0, 0, 0], [1, 1, 1], [0.01, 0, 0]])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    c = np.asarray(morton_codes(pts, lo, hi))
    assert c[0] < c[1]
    assert abs(int(c[0]) - int(c[2])) < abs(int(c[0]) - int(c[1]))


def test_dfs_links_small_tree():
    # P=4 leaves: preorder 1,2,4,5,3,6,7
    hit, skip = dfs_links(4, 4)
    assert hit[1] == 2 and skip[1] == 0
    assert hit[2] == 4 and skip[2] == 3
    assert hit[4] == skip[4] == 5   # leaf
    assert skip[5] == 3
    assert hit[3] == 6 and skip[3] == 0
    assert skip[6] == 7 and skip[7] == 0


def test_lbvh_root_bounds():
    verts, idx = random_tris(100, seed=1)
    tv = jnp.asarray(verts[idx])
    bvh = build_lbvh(tv, leaf_size=4)
    root_min = np.asarray(bvh.aabb_min[1])
    root_max = np.asarray(bvh.aabb_max[1])
    assert np.allclose(root_min, verts.min(axis=0), atol=1e-5)
    assert np.allclose(root_max, verts.max(axis=0), atol=1e-5)


@pytest.mark.parametrize("num_tris,leaf_size", [(37, 1), (100, 4), (513, 8)])
def test_traversal_parity_with_brute_force(num_tris, leaf_size):
    verts, idx = random_tris(num_tris, seed=2)
    tv = jnp.asarray(verts[idx])
    bvh = build_lbvh(tv, leaf_size=leaf_size)
    o, d = _rays(256, seed=3)
    hb = closest_hit_brute(o, d, tv)
    ht = closest_hit_bvh(o, d, bvh)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ht.t), rtol=1e-5, atol=1e-5)
    hit = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hb.tri)[hit], np.asarray(ht.tri)[hit])


def test_any_hit_parity():
    verts, idx = random_tris(200, seed=4)
    tv = jnp.asarray(verts[idx])
    bvh = build_lbvh(tv, leaf_size=4)
    o, d = _rays(256, seed=5)
    t_min = jnp.full((256,), 1e-4)
    t_max = jnp.full((256,), 2.0)
    ob = any_hit_brute(o, d, tv, t_min, t_max)
    ot = any_hit_bvh(o, d, bvh, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(ot))


def test_refit_after_motion():
    verts, idx = random_tris(64, seed=6)
    tv = np.asarray(verts[idx])
    bvh = build_lbvh(jnp.asarray(tv), leaf_size=4)
    moved = tv + np.array([0.5, 0.0, 0.0], np.float32)
    bvh2 = refit_lbvh(bvh, jnp.asarray(moved))
    o, d = _rays(128, seed=7)
    hb = closest_hit_brute(o, d, jnp.asarray(moved))
    ht = closest_hit_bvh(o, d, bvh2)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ht.t), rtol=1e-5, atol=1e-5)
    # root moved too
    assert np.allclose(np.asarray(bvh2.aabb_min[1]), moved.reshape(-1, 3).min(0), atol=1e-5)


def test_cornell_scene_traversal():
    scene = cornell_box()
    arrays = scene.flatten(scene.build_materials(with_lut=False))
    bvh = build_lbvh(arrays.tri_verts, leaf_size=4)
    o, d = _rays(256, seed=8, extent=0.9)
    o = o * 0.4 + 0.5  # inside the box
    hb = closest_hit_brute(o, d, arrays.tri_verts)
    ht = closest_hit_bvh(o, d, bvh)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ht.t), rtol=1e-5, atol=1e-5)
    assert np.asarray(hb.valid).mean() > 0.9  # almost everything hits walls
