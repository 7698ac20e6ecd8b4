"""Stream traversal (ops/stream_trace.py): parity vs brute force.

Covers the XLA trace path (default), both build methods, refit, masked
rays, and the swizzle order round trip.  The Pallas kernel path runs in
interpret mode on CPU and is covered by a smaller case (it is the
deployment design; see the module docstring for the environment note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from royaltracer_dx_tpu.ops.intersect import any_hit_brute, closest_hit_brute
from royaltracer_dx_tpu.ops import stream_trace as st

rng = np.random.default_rng(7)


def random_soup(t):
    c = rng.uniform(-1, 1, (t, 1, 3)).astype(np.float32)
    e = rng.uniform(-0.08, 0.08, (t, 3, 3)).astype(np.float32)
    return jnp.asarray(c + e)


def random_rays(n):
    o = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("t_count", [37, 700, 9000])
@pytest.mark.parametrize("method", ["median", "morton"])
def test_closest_parity(t_count, method):
    tris = random_soup(t_count)
    accel = st.build_stream_accel(tris, method=method)
    o, d = random_rays(257)
    hb = closest_hit_brute(o, d, tris)
    hs = st.closest_hit_stream_xla(o, d, accel)
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(hs.tri), np.asarray(hb.tri))


def test_many_block_coverage_tiny_wb():
    """wb smaller than the block count exercises the window plan's final
    catch-all window (coverage is structurally complete — no overflow
    path exists anymore): parity must hold even at wb=1."""
    tris = random_soup(3 * st.S * st.G + 11)    # 4 blocks
    accel = st.build_stream_accel(tris)
    assert accel.num_blocks >= 4
    o, d = random_rays(130)
    hb = closest_hit_brute(o, d, tris)
    hs = st.closest_hit_stream_xla(o, d, accel, wb=1)
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)
    t_min = jnp.full((130,), 1e-4)
    t_max = jnp.full((130,), 3.0)
    ob = any_hit_brute(o, d, tris, t_min, t_max)
    os_ = st.any_hit_stream_xla(o, d, accel, t_min, t_max, wb=1)
    assert np.array_equal(np.asarray(os_), np.asarray(ob))


def test_anyhit_parity_with_masked_rays():
    tris = random_soup(3000)
    accel = st.build_stream_accel(tris)
    o, d = random_rays(257)
    t_min = jnp.full((257,), 1e-4)
    # half the rays masked off (t_max < t_min) like dead shadow lanes
    t_max = jnp.where(jnp.arange(257) % 2 == 0, 2.0, -1.0)
    ob = any_hit_brute(o, d, tris, t_min, t_max)
    os_ = st.any_hit_stream_xla(o, d, accel, t_min, t_max)
    assert np.array_equal(np.asarray(os_), np.asarray(ob))


def test_anyhit_reversed_segment_parity():
    """reverse=True traces each segment from the far endpoint (the
    shadow-batch fast path); segment occlusion is symmetric, so results
    must match the forward trace exactly, including masked lanes."""
    tris = random_soup(3000)
    accel = st.build_stream_accel(tris)
    o, d = random_rays(257)
    t_min = jnp.full((257,), 1e-3)
    t_max = jnp.where(jnp.arange(257) % 2 == 0, 2.0, -1.0)
    ob = any_hit_brute(o, d, tris, t_min, t_max)
    for presort in (False, True):
        os_ = st.any_hit_stream_xla(o, d, accel, t_min, t_max,
                                    reverse=True, presort=presort)
        assert np.array_equal(np.asarray(os_), np.asarray(ob))


def test_packed_sort_matches_two_operand():
    """The single-operand packed candidate sort orders ids exactly like
    the two-operand (key, id) sort, and its down-rounded keys never
    exceed the true entries (the sweep's early-exit stays conservative)."""
    rng = np.random.default_rng(3)
    key = jnp.asarray(
        np.where(rng.random((16, 64)) < 0.3, np.inf,
                 rng.uniform(0.0, 50.0, (16, 64))).astype(np.float32))
    cid = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None, :],
                           key.shape)
    ks, ids = st._packed_sort(key, cid, 64)
    k2, id2 = jax.lax.sort((key, cid), dimension=1, num_keys=1)
    # same multiset of ids per row, nondecreasing packed keys, keys
    # rounded down but only within the masked mantissa bits
    assert np.array_equal(np.sort(np.asarray(ids)), np.sort(np.asarray(id2)))
    ka = np.asarray(ks)
    assert (np.diff(np.minimum(ka, 1e30), axis=1) >= 0).all()
    orig = np.asarray(key)[np.arange(16)[:, None], np.asarray(ids)]
    assert (ka <= orig).all()
    assert np.all(np.isinf(ka) == np.isinf(orig))


def test_refit_tracks_moved_geometry():
    tris = random_soup(1500)
    accel = st.build_stream_accel(tris)
    moved = tris + jnp.asarray([0.3, -0.1, 0.05])
    accel2 = st.refit_stream_accel(accel, moved)
    o, d = random_rays(129)
    hb = closest_hit_brute(o, d, moved)
    hs = st.closest_hit_stream_xla(o, d, accel2)
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)


def test_swizzle_roundtrip():
    order, inverse = st.swizzle_order(32, 16, tile_w=8, tile_h=8)
    a = np.arange(32 * 16)
    assert np.array_equal(a[order][inverse], a)
    # each 64-ray tile of the order is an 8x8 pixel rectangle
    ys, xs = order[:64] // 32, order[:64] % 32
    assert ys.max() - ys.min() == 7 and xs.max() - xs.min() == 7


def test_pallas_kernel_parity_interpret():
    tris = random_soup(900)
    accel = st.build_stream_accel(tris)
    o, d = random_rays(130)
    hb = closest_hit_brute(o, d, tris)
    hs = st.closest_hit_stream(o, d, accel)
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)
    t_min = jnp.full((130,), 1e-4)
    t_max = jnp.full((130,), 2.0)
    ob = any_hit_brute(o, d, tris, t_min, t_max)
    os_ = st.any_hit_stream(o, d, accel, t_min, t_max)
    assert np.array_equal(np.asarray(os_), np.asarray(ob))
    # masked lanes (t_max <= t_min) must never read occluded (ADVICE r2:
    # the kernel's t=0 "occluded" encoding matches their initial state)
    t_max_m = jnp.where(jnp.arange(130) % 2 == 0, 2.0, -1.0)
    ob_m = any_hit_brute(o, d, tris, t_min, t_max_m)
    os_m = st.any_hit_stream(o, d, accel, t_min, t_max_m)
    assert np.array_equal(np.asarray(os_m), np.asarray(ob_m))


def test_renderer_stream_matches_brute():
    """traversal='stream' renders the same image as 'brute' (the
    traversal is exact, RNG streams identical), including after an
    animated-instance device refit.  Tolerance note: shadow rays trace
    REVERSED under stream (ops/restir.py:_any_dispatch); reversal is
    mathematically the same segment, but the flipped arithmetic can
    resolve boundary-coincident hits differently — in this axis-aligned
    box a handful of NEE segments end exactly on a surface plane, so a
    few pixels (24/3072 observed) differ at the 1e-5 level."""
    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.renderer import Renderer
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    def run(traversal):
        scene = cornell_box(emission=18.0)
        cfg = RenderConfig(width=32, height=32, max_bounces=3,
                           traversal=traversal)
        r = Renderer(scene, Camera(eye=(0.5, 0.5, 1.72),
                                   center=(0.5, 0.5, 0.0)), cfg)
        r.render()
        r.render()
        # animate instance 0 and refit (device path for stream)
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.02, 0.0, 0.01]
        scene.set_transform(0, m)
        r.update()
        r.render()
        return np.asarray(r.radiance())

    a = run("brute")
    b = run("stream")
    np.testing.assert_allclose(b, a, rtol=0, atol=2e-4)
    # the overwhelming majority of pixels must still be bit-identical
    assert float((b == a).mean()) > 0.9


def test_compacted_tail_window_subset_path():
    """Enough tiles that the tail-window live set compacts to a K-tile
    prefix (K = tiles//16 >= 64): the gather/sweep/scatter subset path
    must reproduce brute exactly, closest and any-hit."""
    tris = random_soup(4 * st.S * st.G)          # 4+ blocks
    accel = st.build_stream_accel(tris)
    assert accel.num_blocks >= 4
    n = 128 * st.TILE                            # 128 tiles > K floor (64)
    o, d = random_rays(n)
    hb = closest_hit_brute(o, d, tris)
    hs = st.closest_hit_stream_xla(o, d, accel, wb=1)
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(hs.tri)[np.asarray(hb.t) < 1e29],
                          np.asarray(hb.tri)[np.asarray(hb.t) < 1e29])
    t_min = jnp.full((n,), 1e-4)
    t_max = jnp.full((n,), 3.0)
    ob = any_hit_brute(o, d, tris, t_min, t_max)
    os_ = st.any_hit_stream_xla(o, d, accel, t_min, t_max, wb=1)
    assert np.array_equal(np.asarray(os_), np.asarray(ob))


def test_cluster_plane_slabs_conservative():
    """Every real triangle vertex must satisfy |n.v - c| <= h for its
    cluster's thick-plane slab (and its block's), in BOTH the f32
    (blk_planes/top_planes) and bf16 (blk_boxes_bf16 tail groups)
    representations — the conservatism invariant the per-ray crossing
    cull relies on for exactness.  A heightfield exercises the
    near-planar case the slab exists for."""
    from royaltracer_dx_tpu.scene.procedural import heightfield

    v, idx = heightfield(48)
    tris = jnp.asarray(np.asarray(v)[np.asarray(idx)])
    for method in ("median", "morton"):
        accel = st.build_stream_accel(tris, method=method)
        b = accel.num_blocks
        perm = np.asarray(accel.perm)
        verts = np.zeros((b * st.S * st.G, 3, 3), np.float32)
        real = perm >= 0
        verts[real] = np.asarray(tris)[perm[real]]
        pl = np.asarray(accel.blk_planes)              # [b, 5, 128]
        # the f32 plane copy must hold EXACTLY bf16-representable n/c
        # (low 16 mantissa bits zero): XLA's excess-precision pass on
        # TPU elides convert(f32->bf16->f32) pairs, which once left
        # blk_planes unrounded while the bf16 rows stored rounded
        # values — h was then too small for the plane actually tested
        # and the cull turned non-conservative (order-dependent
        # occlusion, diagnosed by scripts/profile_r4y.py)
        assert (pl[:, :4].view(np.uint32) & 0xFFFF == 0).all()
        tpl = np.asarray(accel.top_planes)
        assert (tpl[:, :4].view(np.uint32) & 0xFFFF == 0).all()
        vb = verts.reshape(b, st.S, st.G, 3, 3)
        rb = real.reshape(b, st.S, st.G)
        for bi in range(b):
            for si in range(st.S):
                if not rb[bi, si].any():
                    assert pl[bi, 4, si] < 0.0
                    continue
                n = pl[bi, :3, si]
                c, h = pl[bi, 3, si], pl[bi, 4, si]
                d = vb[bi, si][rb[bi, si]].reshape(-1, 3) @ n - c
                assert np.abs(d).max() <= h + 1e-6, (bi, si)
        # bf16 groups: same invariant with the rounded-up h
        bf = np.asarray(accel.blk_boxes_bf16.astype(jnp.float32))
        bf = bf.reshape(b, 11, st.S)
        for bi in range(b):
            for si in range(st.S):
                if not rb[bi, si].any():
                    continue
                n = bf[bi, 6:9, si]
                c, h = bf[bi, 9, si], bf[bi, 10, si]
                d = vb[bi, si][rb[bi, si]].reshape(-1, 3) @ n - c
                assert np.abs(d).max() <= h + 1e-6, (bi, si)
        tp = np.asarray(accel.top_planes)
        blk_verts = verts.reshape(b, st.S * st.G * 3, 3)
        blk_real = np.repeat(rb.reshape(b, -1), 3, axis=1)
        for bi in range(b):
            if not rb[bi].any():
                continue
            n, c, h = tp[bi, :3], tp[bi, 3], tp[bi, 4]
            d = blk_verts[bi][blk_real[bi]] @ n - c
            assert np.abs(d).max() <= h + 1e-6, bi


def test_plane_slab_grazing_segments_exact():
    """Grazing shadow segments just above a heightfield — the case the
    slab cull retires — must stay bit-exact vs brute for occlusion and
    closest."""
    from royaltracer_dx_tpu.scene.procedural import heightfield

    v, idx = heightfield(48)
    tris = jnp.asarray(np.asarray(v)[np.asarray(idx)])
    accel = st.build_stream_accel(tris)
    n = 64 * st.TILE
    # origins slightly above the surface, directions mostly horizontal
    o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.05, 0.4, n).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] *= 0.15
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_min = jnp.full((n,), 1e-3)
    t_max = jnp.full((n,), 1.5)
    ob = any_hit_brute(o, d, tris, t_min, t_max)
    os_ = st.any_hit_stream_xla(o, d, accel, t_min, t_max)
    assert np.array_equal(np.asarray(os_), np.asarray(ob))
    hb = closest_hit_brute(o, d, tris)
    hs = st.closest_hit_stream_xla(o, d, accel)
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(hs.tri)[np.asarray(hb.t) < 1e29],
                          np.asarray(hb.tri)[np.asarray(hb.t) < 1e29])


def test_plane_slab_far_origin_cancellation():
    """Geometry far from the origin provokes catastrophic cancellation in
    the slab's n.o - c evaluation (|n.o| ~ |c| ~ 1e3 with h ~ 1e-3): the
    fp-error bound must scale with the TERM magnitudes, not the cancelled
    result, or near-plane hits get culled.  Also asserts ray-ORDER
    independence — with an exact per-ray cull, a ray's result must not
    depend on its tile-mates (the union sweep can only add candidates)."""
    from royaltracer_dx_tpu.scene.procedural import heightfield

    v, idx = heightfield(64)
    v = np.asarray(v) + np.asarray([[1000.0, 0.0, -750.0]], np.float32)
    tris = jnp.asarray(v[np.asarray(idx)])
    accel = st.build_stream_accel(tris)
    n = 96 * st.TILE
    lrng = np.random.default_rng(11)
    o = lrng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] = lrng.uniform(0.02, 0.35, n).astype(np.float32)
    o += np.asarray([[1000.0, 0.0, -750.0]], np.float32)
    lp = np.asarray([1000.0, 0.9, -750.0], np.float32)
    d = lp[None, :] - o
    dist = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / np.maximum(dist, 1e-6)
    tmax = jnp.asarray((dist[:, 0] - 1e-3).astype(np.float32))
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t_min = jnp.full((n,), 1e-3)
    ob = np.asarray(any_hit_brute(oj, dj, tris, t_min, tmax))
    oc = tuple(oj[:, c] for c in range(3))
    dc = tuple(dj[:, c] for c in range(3))
    occ1 = np.asarray(st.any_hit_stream_xla(oc, dc, accel, 1e-3, tmax))
    assert np.array_equal(occ1, ob)
    pm = lrng.permutation(n)
    occ2p = np.asarray(st.any_hit_stream_xla(
        tuple(c[pm] for c in oc), tuple(c[pm] for c in dc), accel, 1e-3,
        tmax[jnp.asarray(pm)]))
    occ2 = np.zeros(n, bool)
    occ2[pm] = occ2p
    assert np.array_equal(occ2, ob)
