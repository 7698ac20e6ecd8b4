"""ReSTIR pipeline tests: reservoir math, pass stability, end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from royaltracer_dx_tpu.camera import Camera
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.ops.reservoir import (
    ReservoirDI,
    get_w,
    is_valid_di,
    update_reservoir_di,
)
from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer, _pick_first_k
from royaltracer_dx_tpu.scene.procedural import cornell_box
from royaltracer_dx_tpu.utils import math3d as m3

CAM = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))


def _seeds(n, s=1):
    rng = np.random.default_rng(s)
    return jnp.asarray(rng.integers(0, 2**32, (n, 2), dtype=np.uint32))


# --------------------------- unit pieces ---------------------------------


def test_reservoir_streaming_selection_statistics():
    """Weighted reservoir sampling picks proportionally to wi."""
    n = 4096
    r = ReservoirDI.zeros_like_lanes(jnp.zeros((n, 3)))
    seed = _seeds(n)
    xs = [jnp.full((n, 3), float(i + 1)) for i in range(3)]
    wis = [1.0, 2.0, 1.0]
    for x, wi in zip(xs, wis):
        r, _, seed = update_reservoir_di(
            r, jnp.ones((n,), bool), jnp.full((n,), wi), jnp.ones((n,)),
            x, x, x, seed,
        )
    picked = np.asarray(r.x2[:, 0])
    frac2 = (picked == 2.0).mean()
    assert abs(frac2 - 0.5) < 0.04  # candidate 2 has half the total weight
    assert np.allclose(np.asarray(r.w_sum), 4.0)
    assert np.allclose(np.asarray(r.m), 3.0)


def test_get_w():
    w = get_w(jnp.asarray([2.0, 2.0]), jnp.asarray([0.5, 0.0]))
    assert np.allclose(np.asarray(w), [4.0, 0.0])


def test_mirror_clamp():
    x = jnp.asarray([-3, 0, 5, 63, 64, 66])
    out = np.asarray(restir.mirror_clamp(x, 64))
    assert (out >= 0).all() and (out < 64).all()
    assert out[0] == 3 and out[4] == 62 and out[5] == 60


def test_pick_first_k():
    accept = jnp.asarray([
        [False, True, False, True, True],
        [False, False, False, False, False],
    ])
    idx, ok = _pick_first_k(accept, 3)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 4])
    assert bool(ok[0].all())
    assert not bool(ok[1].any())


def test_jacobian_identity():
    """Shift between identical shading points has Jacobian 1."""
    x1 = jnp.asarray([[0.0, 0, 0]])
    x2 = jnp.asarray([[1.0, 1, 1]])
    n2 = jnp.asarray([[0.0, 1, 0]])
    j = restir.jacobian_reconnection(x1, x1, x2, n2)
    assert np.isclose(float(j[0]), 1.0)


def test_reject_helpers():
    assert bool(restir.reject_w_sum(jnp.asarray([6.0]), 5.0)[0])
    assert not bool(restir.reject_w_sum(jnp.asarray([4.0]), 5.0)[0])
    j = jnp.asarray([0.1, 1.0, 6.0, np.nan])
    out = np.asarray(restir.reject_jacobian(j, 5.0))
    assert out.tolist() == [True, False, True, True]


def test_reprojection_static_camera_identity():
    """With identity motion, a visible point reprojects onto itself."""
    scene = cornell_box().flatten(cornell_box().build_materials(with_lut=False))
    cfg = RenderConfig(width=64, height=64)
    cam = {k: jnp.asarray(v) for k, v in CAM.matrices(1.0).items()}
    # pixel centers are ray-through-corner in this pipeline; reproject the
    # exact primary hit of pixel (32, 20)
    from royaltracer_dx_tpu.camera import generate_rays

    o, d = generate_rays(cam, 64, 64)
    hit = restir.trace_closest(scene, o, d, cfg)
    px, py = restir.reproject_to_prev_pixel(
        scene, hit["pos"], hit["obj"], cam["view"], cam["proj"], 64, 64
    )
    lane = 20 * 64 + 32
    assert hit["valid"][lane]
    assert abs(int(px[lane]) - 32) <= 1 and abs(int(py[lane]) - 20) <= 1


# --------------------------- end to end ----------------------------------


@pytest.fixture(scope="module")
def restir_rendered():
    cfg = RenderConfig(width=48, height=48)
    r = RestirRenderer(cornell_box(emission=18.0), CAM, cfg)
    for _ in range(4):
        r.render()
    return r


def test_restir_image_sane(restir_rendered):
    img = restir_rendered.radiance()
    finite = np.isfinite(img)
    assert finite.all()
    assert img[finite].max() < 1e3  # no fireflies
    assert np.nanmean(img) > 0.05


def test_restir_temporal_confidence_grows(restir_rendered):
    m = np.asarray(restir_rendered.last_di.m)
    assert m.max() > 1.5  # reuse happened


def test_restir_dynamic_scene_animation():
    """Instance animation (the reference's OnUpdate rotation,
    Renderer.cpp:439-449): per-frame set_transform + update() refits the
    scene, temporal reprojection runs through the prev transforms, and the
    render stays finite with temporal reuse still accumulating.  Camera is
    static, so the framebuffer must NOT reset."""
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    scene = cornell_box(emission=18.0)
    # second instance: the cornell mesh again, shrunk into the box interior
    scene.add_instance(0, np.diag([0.2, 0.2, 0.2, 1.0]).astype(np.float32))
    r = RestirRenderer(scene, CAM, RenderConfig(width=32, height=32))
    for i in range(3):
        ang = 0.3 * i
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array(
            [[c, 0, s, 0.4], [0, 1, 0, 0.4], [-s, 0, c, 0.4], [0, 0, 0, 1]],
            np.float32,
        ) @ np.diag([0.2, 0.2, 0.2, 1.0]).astype(np.float32)
        scene.set_transform(1, rot)
        r.update()
        r.render()
    img = r.radiance()
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
    # static camera: accumulation kept growing across the animated frames
    assert float(np.asarray(r.fb.count).max()) == 3.0
    # temporal reuse survived the animation
    assert float(np.asarray(r.last_di.m).max()) > 1.0


def test_restir_matches_megakernel_mean():
    """Converged ReSTIR and megakernel agree in overall energy (loose)."""
    from royaltracer_dx_tpu.render.renderer import Renderer

    cfg = RenderConfig(width=32, height=32, max_bounces=4)
    mk = Renderer(cornell_box(emission=18.0), CAM, cfg)
    for _ in range(8):
        mk.render()
    rs = RestirRenderer(cornell_box(emission=18.0), CAM, RenderConfig(width=32, height=32))
    for _ in range(8):
        rs.render()
    m_ref = mk.radiance().mean()
    m_res = rs.radiance().mean()
    assert m_res > 0.3 * m_ref
    assert m_res < 3.0 * m_ref


def test_gi_compaction_bit_identical():
    """Wavefront-compacted GI bounces (active lanes partitioned to the
    front, half-width prefix under lax.cond) must produce bit-identical
    frames: seeds travel with their lanes."""
    import numpy as np

    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    cam = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))

    def run(mode):
        rr = RestirRenderer(cornell_box(emission=18.0), cam,
                            RenderConfig(width=24, height=24,
                                         gi_compaction=mode))
        for _ in range(3):
            rr.render()
        return np.asarray(rr.radiance())

    np.testing.assert_array_equal(run("on"), run("off"))


def test_ris_reservoir_estimator_unbiased():
    """Seed-ensemble unbiasedness of the streaming RIS estimator
    (Reservoir_v6.hlsl:30-80 + W = w_sum/p_hat): over many independent
    lanes, E[p_hat(y) * W / M] must equal the integral the candidates
    importance-sample.  Target f(x) = x^2 on [0,1], uniform candidates:
    the RIS estimate of I = 1/3 with M candidates is f(y) * w_sum /
    (M * p_hat(y)) — a factor-of-2 weighting bug (the class VERDICT r1
    called out) shifts the mean far outside the tolerance."""
    import jax.numpy as jnp
    import numpy as np

    from royaltracer_dx_tpu.ops.reservoir import get_w, update_reservoir_p
    from royaltracer_dx_tpu.utils.rng import pixel_seed, tea_random

    n = 200_000
    m_cands = 5
    seed = pixel_seed(jnp.arange(n), jnp.arange(n) * 13 + 7, 4, jnp.uint32(9))
    zero = jnp.zeros((n,))
    zv = (zero, zero, zero)
    r = dict(x2=zv, n2=zv, l2=zv, w_sum=zero, w=zero, m=zero)
    ones = zero + 1.0
    for _ in range(m_cands):
        u, seed = tea_random(seed)
        x = u  # uniform candidate, q = 1
        p_hat = x * x
        wi = p_hat / 1.0
        r, _, seed = update_reservoir_p(
            r, ("x2", "n2", "l2"), ones > 0.0, wi, ones,
            ((x, x, x), zv, zv), seed)
    y = r["x2"][0]
    w = get_w(r["w_sum"], y * y)
    est = np.asarray((y * y) * w / m_cands)
    mean = est.mean()
    stderr = est.std() / np.sqrt(n)
    assert abs(mean - 1.0 / 3.0) < 4 * stderr + 1e-3, (mean, stderr)


def test_record_dtype_f16_close_to_f32():
    """Half-precision packed reservoir records (the reference's
    -enable-16bit-types reservoir storage) stay close to the f32 path:
    same hit structure, small radiance delta after several frames."""
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    def run(rd):
        cam = Camera(eye=(0.5, 0.6, 2.2), center=(0.5, 0.5, 0.0))
        cfg = RenderConfig(width=32, height=32, gi_bounces=1,
                           traversal="brute", aa_jitter=False,
                           record_dtype=rd)
        r = RestirRenderer(cornell_box(emission=18.0), cam, cfg)
        for _ in range(6):
            r.render()
        return r.radiance()

    a = run("f32")
    b = run("f16")
    assert np.isfinite(b).all()
    num = float(np.sqrt(np.mean((a - b) ** 2)))
    den = float(np.sqrt(np.mean(a ** 2)) + 1e-9)
    assert num / den < 0.08, num / den   # storage-precision noise only


def test_visibility_batch_mask_matches_unmasked():
    """Masked lanes trace dead segments (t_max < t_min) and return
    V=1.0; unmasked lanes match the maskless batch bit-for-bit."""
    from royaltracer_dx_tpu.utils import pvec as pv

    scene = cornell_box(emission=18.0).flatten()
    cfg = RenderConfig(width=8, height=8, traversal="brute")
    rng = np.random.default_rng(3)
    n = 256
    x1 = tuple(jnp.asarray(rng.uniform(0.05, 0.95, n), jnp.float32)
               for _ in range(3))
    n1 = pv.normalize(tuple(
        jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(3)))
    x_to = tuple(jnp.asarray(rng.uniform(0.05, 0.95, n), jnp.float32)
                 for _ in range(3))
    mask = jnp.asarray(rng.uniform(size=n) < 0.5)

    v_plain = restir.visibility_batch_p(
        scene, [(x1, n1, x_to), (x_to, n1, x1)], cfg)
    v_masked = restir.visibility_batch_p(
        scene, [(x1, n1, x_to, mask), (x_to, n1, x1, mask)], cfg)
    for vp, vm in zip(v_plain, v_masked):
        vp, vm, mk = np.asarray(vp), np.asarray(vm), np.asarray(mask)
        assert np.array_equal(vm[mk], vp[mk])
        assert (vm[~mk] == 1.0).all()


def test_visibility_batch_grouping_exact():
    """Chunk-cap grouping (r4e: fused 9N pays lax.map overhead at 1080p)
    returns bit-identical results to one fused batch."""
    from royaltracer_dx_tpu.utils import pvec as pv

    scene = cornell_box(emission=18.0).flatten()
    cfg = RenderConfig(width=8, height=8, traversal="brute")
    rng = np.random.default_rng(5)
    n = 128

    def vecs():
        return tuple(jnp.asarray(rng.uniform(0.05, 0.95, n), jnp.float32)
                     for _ in range(3))

    n1 = pv.normalize(tuple(
        jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(3)))
    queries = [(vecs(), n1, vecs()) for _ in range(5)]

    fused = restir.visibility_batch_p(scene, queries, cfg)
    real_cap = restir._TRACE_CHUNK_RAYS
    try:
        restir._TRACE_CHUNK_RAYS = 2 * n    # force groups of 2
        grouped = restir.visibility_batch_p(scene, queries, cfg)
    finally:
        restir._TRACE_CHUNK_RAYS = real_cap
    assert len(grouped) == len(fused)
    for a, b in zip(fused, grouped):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_reuse_ablation_toggles_run():
    """temporal_reuse=False and spatial_candidate_count=0 (the RMSE
    study's attribution ladder) render finite, light-carrying images."""
    for kw in (dict(temporal_reuse=False),
               dict(spatial_candidate_count=0),
               dict(temporal_reuse=False, spatial_candidate_count=0)):
        cfg = RenderConfig(width=16, height=16, gi_bounces=1,
                           traversal="brute", aa_jitter=False, **kw)
        r = RestirRenderer(cornell_box(emission=18.0), CAM, cfg)
        for _ in range(3):
            r.render()
        img = np.asarray(r.radiance())
        assert np.isfinite(img).all()
        assert img.mean() > 0.05


def test_trace_dispatch_chunked_parity(monkeypatch):
    """Batches beyond _TRACE_CHUNK_RAYS run as sequential lax.map chunks
    (the 1080p pass-3 OOM fix): results must match the unchunked trace
    exactly, on both the brute and stream dispatch paths, including the
    alignment padding of a non-multiple ray count."""
    from royaltracer_dx_tpu.ops import stream_trace as st

    scene = cornell_box(emission=18.0).flatten(build_stream=True)
    rng = np.random.default_rng(11)
    n = 1000   # not a multiple of 128 — exercises pad + slice
    o = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t_max = jnp.asarray(rng.uniform(0.3, 2.0, n), jnp.float32)

    for traversal in ("brute", "stream"):
        cfg = RenderConfig(width=8, height=8, traversal=traversal)
        plain_c = restir.trace_closest(scene, o, d, cfg)
        plain_a = restir.trace_occluded(scene, o, d, 1e-4, t_max, cfg)
        monkeypatch.setattr(restir, "_TRACE_CHUNK_RAYS", 256)
        chunk_c = restir.trace_closest(scene, o, d, cfg)
        chunk_a = restir.trace_occluded(scene, o, d, 1e-4, t_max, cfg)
        monkeypatch.undo()
        for k in plain_c:
            assert np.array_equal(np.asarray(plain_c[k]),
                                  np.asarray(chunk_c[k])), (traversal, k)
        assert np.array_equal(np.asarray(plain_a), np.asarray(chunk_a))


@pytest.mark.slow
def test_render_many_matches_sequential():
    """render_many(k) — k frames in ONE jit — must match k sequential
    render() calls on radiance, framebuffer count and ping-pong state
    (the dispatch-amortized path used by the bench RMSE rows and the
    fused-frame composition A/B)."""
    cfg = RenderConfig(width=24, height=24, aa_jitter=False)
    a = RestirRenderer(cornell_box(emission=18.0), CAM, cfg)
    for _ in range(4):
        a.render()
    b = RestirRenderer(cornell_box(emission=18.0), CAM, cfg)
    b.render_many(4)
    assert np.allclose(a.radiance(), b.radiance(), atol=3e-7)
    assert np.array_equal(np.asarray(a.fb.count), np.asarray(b.fb.count))
    assert np.allclose(np.asarray(a.last_di.w_sum),
                       np.asarray(b.last_di.w_sum), atol=3e-6)
    # resuming a batch from sequential state (and vice versa) stays aligned
    a.render()
    b.render_many(1)
    assert np.allclose(a.radiance(), b.radiance(), atol=3e-7)


@pytest.mark.slow
def test_render_many_oracles_match_sequential():
    """DiOracle.render_many and megakernel Renderer.render_many equal
    their sequential loops (f32-vs-f64 accumulation tolerance for the
    oracle; megakernel state is identical per frame)."""
    from royaltracer_dx_tpu.render.di_oracle import DiOracle
    from royaltracer_dx_tpu.render.renderer import Renderer

    cfg = RenderConfig(width=16, height=16, aa_jitter=False)
    a = DiOracle(cornell_box(emission=18.0), CAM, cfg)
    for _ in range(5):
        a.render()
    b = DiOracle(cornell_box(emission=18.0), CAM, cfg)
    b.render_many(5)
    assert np.allclose(a.radiance(), b.radiance(), atol=1e-5)

    mcfg = RenderConfig(width=16, height=16, max_bounces=3,
                        aa_jitter=False)
    ma = Renderer(cornell_box(emission=18.0), CAM, mcfg)
    for _ in range(3):
        ma.render()
    mb = Renderer(cornell_box(emission=18.0), CAM, mcfg)
    mb.render_many(3)
    assert np.allclose(ma.radiance(), mb.radiance(), atol=3e-7)
    assert np.array_equal(np.asarray(ma.fb.count), np.asarray(mb.fb.count))


def test_retire_dead_lanes_bit_identical():
    """Dead-lane trace retirement (cfg.retire_dead_lanes) must be
    BIT-identical over multi-frame renders: masked lanes' hits are
    where()-ed out by every consumer, so collapsing them to dead
    segments cannot change any consumed value (r5; the knob exists only
    for this A/B)."""
    cfg_on = RenderConfig(width=24, height=24, aa_jitter=False)
    cfg_off = RenderConfig(width=24, height=24, aa_jitter=False,
                           retire_dead_lanes=False)
    a = RestirRenderer(cornell_box(emission=18.0), CAM, cfg_on)
    b = RestirRenderer(cornell_box(emission=18.0), CAM, cfg_off)
    for _ in range(3):
        a.render()
        b.render()
    assert np.array_equal(a.radiance(), b.radiance())
    assert np.array_equal(np.asarray(a.last_di.w_sum),
                          np.asarray(b.last_di.w_sum))
    assert np.array_equal(np.asarray(a.last_gi.w_sum),
                          np.asarray(b.last_gi.w_sum))
    assert np.array_equal(np.asarray(a.last_gi.xn),
                          np.asarray(b.last_gi.xn))
