"""Packet-traversal kernel parity (pallas interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from royaltracer_dx_tpu.ops.bvh import build_lbvh
from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
from royaltracer_dx_tpu.ops import traverse_pallas
from royaltracer_dx_tpu.scene.procedural import random_tris


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels interpreted (no TPU in CI)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_sort_rays_groups_octants():
    o = jnp.zeros((8, 3))
    d = jnp.asarray([
        [1, 1, 1], [-1, 1, 1], [1, 1, 1], [-1, -1, -1],
        [1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1],
    ], jnp.float32)
    perm = traverse_pallas.sort_rays(o, d)
    octs = np.asarray(
        (d[:, 0] > 0).astype(int) * 4
        + (d[:, 1] > 0).astype(int) * 2
        + (d[:, 2] > 0).astype(int)
    )[np.asarray(perm)]
    assert (np.diff(octs) >= 0).all()


def test_packet_parity_with_brute():
    verts, idx = random_tris(200, seed=5)
    tv = jnp.asarray(verts[idx])
    bvh = build_lbvh(tv, leaf_size=8)
    rng = np.random.default_rng(2)
    n = traverse_pallas.LANES  # one packet
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    hb = closest_hit_brute(o, d, tv)
    hp = traverse_pallas.closest_hit_packet(o, d, bvh)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hp.t),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hb.tri)[hit], np.asarray(hp.tri)[hit])
