"""Tile-clustered traversal (ops/cluster_traverse.py): parity vs brute force.

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu + virtual
devices); scenes are kept small so the dense [tiles, R, G] blocks stay
cheap off-TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from royaltracer_dx_tpu.ops.cluster_traverse import (
    any_hit_clustered,
    build_clusters,
    closest_hit_clustered,
)
from royaltracer_dx_tpu.ops.intersect import any_hit_brute, closest_hit_brute
from royaltracer_dx_tpu.scene.procedural import menger_sponge


@pytest.fixture(scope="module")
def sponge():
    v, idx = menger_sponge(2)  # 4.8k tris
    tv = jnp.asarray(np.asarray(v)[np.asarray(idx)])
    return tv, build_clusters(tv, group=128)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(7)
    # box-crossing rays: origins on a sphere around the sponge, directions
    # biased toward the center so a healthy fraction hits
    o = rng.normal(size=(512, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 2.5 + 0.5
    target = rng.uniform(0.1, 0.9, size=(512, 3)).astype(np.float32)
    d = target - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_shapes(sponge):
    tv, cl = sponge
    assert cl.tri_planes.shape[1] == 9
    assert cl.group == 128
    assert cl.num_clusters * cl.group >= tv.shape[0]
    # AABBs contain their triangles
    lo = np.asarray(cl.aabb_lo)
    hi = np.asarray(cl.aabb_hi)
    assert (lo <= hi + 1e-6).all()


def test_closest_parity(sponge, rays):
    tv, cl = sponge
    o, d = rays
    hb = closest_hit_brute(o, d, tv)
    hc = closest_hit_clustered(o, d, cl, tile=128)
    vb, vc = np.asarray(hb.valid), np.asarray(hc.valid)
    np.testing.assert_array_equal(vb, vc)
    tb = np.where(vb, np.asarray(hb.t), 0.0)
    tc = np.where(vc, np.asarray(hc.t), 0.0)
    np.testing.assert_allclose(tb, tc, rtol=0, atol=0)
    np.testing.assert_array_equal(
        np.where(vb, np.asarray(hb.tri), 0), np.where(vc, np.asarray(hc.tri), 0)
    )


def test_closest_parity_odd_ray_count(sponge, rays):
    """Ray counts that don't divide the tile size exercise the padding."""
    tv, cl = sponge
    o, d = rays
    o, d = o[:333], d[:333]
    hb = closest_hit_brute(o, d, tv)
    hc = closest_hit_clustered(o, d, cl, tile=128)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hc.valid))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hc.t)[m], rtol=0, atol=0
    )


def test_any_hit_parity(sponge, rays):
    tv, cl = sponge
    o, d = rays
    t_min = jnp.full((o.shape[0],), 1e-3)
    t_max = jnp.full((o.shape[0],), 4.0)
    ob = any_hit_brute(o, d, tv, t_min, t_max)
    oc = any_hit_clustered(o, d, cl, t_min, t_max, tile=128)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(oc))


def test_interval_mask_matches_exact(sponge, rays):
    """The interval-arithmetic phase A is conservative (superset mask), so
    hits must be identical to the exact per-ray mask."""
    tv, cl = sponge
    o, d = rays
    he = closest_hit_clustered(o, d, cl, tile=128, mask_mode="exact")
    hi = closest_hit_clustered(o, d, cl, tile=128, mask_mode="interval")
    np.testing.assert_array_equal(np.asarray(he.valid), np.asarray(hi.valid))
    m = np.asarray(he.valid)
    np.testing.assert_allclose(
        np.asarray(he.t)[m], np.asarray(hi.t)[m], rtol=0, atol=0
    )
    t_min = jnp.full((o.shape[0],), 1e-3)
    t_max = jnp.full((o.shape[0],), 4.0)
    oe = any_hit_clustered(o, d, cl, t_min, t_max, tile=128, mask_mode="exact")
    oi = any_hit_clustered(o, d, cl, t_min, t_max, tile=128, mask_mode="interval")
    np.testing.assert_array_equal(np.asarray(oe), np.asarray(oi))


def test_t_range_respected(sponge, rays):
    """Rays limited to a t_max short of their hit must miss."""
    tv, cl = sponge
    o, d = rays
    ref = closest_hit_brute(o, d, tv)
    valid = np.asarray(ref.valid)
    assert valid.any()
    t_ref = np.asarray(ref.t)
    # cut every ray off at half its true hit distance -> all must miss
    t_cut = jnp.asarray(np.where(valid, t_ref * 0.5, 1e-3).astype(np.float32))
    near = closest_hit_clustered(o, d, cl, t_min=1e-3, t_max=t_cut, tile=128)
    assert not bool(np.asarray(near.valid)[valid].any())
