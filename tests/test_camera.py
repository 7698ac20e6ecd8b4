"""Camera matrix and ray-generation semantics (Renderer.cpp:1722-1768,
RayGen_v6_pass1.hlsl:79-95)."""

import math

import numpy as np
import jax.numpy as jnp

from royaltracer_dx_tpu.camera import Camera, generate_rays, look_at, perspective_rh


def test_look_at_maps_eye_to_origin():
    cam = Camera()
    v = cam.view()
    eye = np.array([*cam.eye, 1.0])
    assert np.allclose(v @ eye, [0, 0, 0, 1], atol=1e-5)


def test_look_at_forward_is_minus_z():
    cam = Camera(eye=(0, 0, 5), center=(0, 0, 0))
    v = cam.view()
    c = v @ np.array([0, 0, 0, 1.0])
    assert c[2] < 0  # center in front of camera (RH: looking down -z)


def test_perspective_fov():
    p = perspective_rh(math.radians(60.0), 1.0, 0.1, 1000.0)
    # y scale = cot(30deg)
    assert np.isclose(p[1, 1], 1.0 / math.tan(math.radians(30.0)), atol=1e-6)
    assert np.isclose(p[3, 2], -1.0)


def test_center_ray_points_at_lookat():
    cam = Camera(eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0))
    ca = {k: jnp.asarray(v) for k, v in cam.matrices(1.0).items()}
    w = h = 16
    o, d = generate_rays(ca, w, h)
    assert np.allclose(np.asarray(o[0]), [0.5, 0.5, 2.4], atol=1e-5)
    # pixel (8,8) corner == image center when jitter=0
    center = np.asarray(d[8 * w + 8])
    assert np.allclose(center, [0, 0, -1], atol=1e-5)


def test_ray_field_of_view():
    cam = Camera(eye=(0, 0, 1), center=(0, 0, 0), up=(0, 1, 0))
    ca = {k: jnp.asarray(v) for k, v in cam.matrices(1.0).items()}
    w = h = 64
    o, d = generate_rays(ca, w, h)
    d = np.asarray(d).reshape(h, w, 3)
    # top edge of the frustum: tan(fov/2) up
    top = d[0, w // 2]
    assert top[1] > 0  # screen y=0 is up (d.y flipped)
    angle = math.degrees(math.atan2(abs(top[1]), abs(top[2])))
    assert abs(angle - 30.0) < 1.5


def test_orbit_preserves_distance():
    cam = Camera()
    c2 = cam.orbited(0.1, 0.05)
    d0 = np.linalg.norm(np.array(cam.eye) - np.array(cam.center))
    d1 = np.linalg.norm(np.array(c2.eye) - np.array(c2.center))
    assert np.isclose(d0, d1, rtol=1e-4)


def test_dolly_and_pan():
    cam = Camera()
    near = cam.dollied(0.5)
    d0 = np.linalg.norm(np.array(cam.eye) - np.array(cam.center))
    d1 = np.linalg.norm(np.array(near.eye) - np.array(near.center))
    assert np.isclose(d1, 0.5 * d0, rtol=1e-5)
    pan = cam.panned(0.1, 0.0)
    assert not np.allclose(pan.eye, cam.eye)
    assert np.allclose(
        np.array(pan.eye) - np.array(cam.eye),
        np.array(pan.center) - np.array(cam.center),
        atol=1e-5,
    )


# ----------------------- Manipulator (rdn/manipulator.cpp) ---------------


def test_manipulator_mouse_state_machine():
    """Button/modifier -> action mapping (manipulator.cpp:176-197)."""
    from royaltracer_dx_tpu.camera import Manipulator

    m = Manipulator(width=100, height=100)
    m.set_mouse_position(50, 50)
    assert m.mouse_move(55, 50, lmb=True) == m.ORBIT          # Examine+LMB
    assert m.mouse_move(55, 55, lmb=True, shift=True) == m.DOLLY
    assert m.mouse_move(50, 55, lmb=True, ctrl=True) == m.PAN
    assert m.mouse_move(45, 55, lmb=True, alt=True) == m.LOOKAROUND
    assert m.mouse_move(45, 50, mmb=True) == m.PAN
    assert m.mouse_move(45, 45, rmb=True) == m.DOLLY
    assert m.mouse_move(40, 45) == m.NONE
    m.mode = m.FLY
    assert m.mouse_move(40, 40, lmb=True) == m.LOOKAROUND     # Fly+LMB
    assert m.mouse_move(35, 40, lmb=True, alt=True) == m.ORBIT


def test_manipulator_orbit_matches_camera_orbit():
    """Examine orbit preserves radius and agrees with Camera.orbited's
    invariants (both implement manipulator.cpp orbit())."""
    from royaltracer_dx_tpu.camera import Manipulator

    m = Manipulator(Camera(), width=200, height=200)
    m.set_mouse_position(100, 100)
    r0 = np.linalg.norm(m.pos - m.int)
    m.mouse_move(120, 90, lmb=True)
    r1 = np.linalg.norm(m.pos - m.int)
    assert np.isclose(r0, r1, rtol=1e-6)
    assert not np.allclose(m.pos, np.asarray(Camera().eye, np.float64))
    # interest point unchanged in Examine orbit
    assert np.allclose(m.int, np.asarray(Camera().center, np.float64))


def test_manipulator_trackball():
    """Trackball rotation (manipulator.cpp:236-276): radius preserved,
    up vector rotates with the ball, small drags give small rotations."""
    from royaltracer_dx_tpu.camera import Manipulator

    m = Manipulator(Camera(), width=200, height=200)
    m.mode = m.TRACKBALL
    m.set_mouse_position(100, 100)
    r0 = np.linalg.norm(m.pos - m.int)
    up0 = m.up.copy()
    m.mouse_move(120, 110, lmb=True)  # Trackball+LMB = LookAround = trackball
    r1 = np.linalg.norm(m.pos - m.int)
    assert np.isclose(r0, r1, rtol=1e-6)
    assert not np.allclose(m.up, up0)       # up rides the rotation
    assert np.isclose(np.linalg.norm(m.up), np.linalg.norm(up0), rtol=1e-6)
    # degenerate drag (same point) is a no-op
    pos = m.pos.copy()
    m.mouse_move(120, 110, lmb=True)
    assert np.allclose(m.pos, pos)


def test_manipulator_trackball_project_sphere_hyperbola():
    """projectOntoTBSphere: sphere inside tbsize/sqrt(2), hyperbola
    outside, continuous at the boundary (manipulator.cpp:283-299)."""
    from royaltracer_dx_tpu.camera import Manipulator

    m = Manipulator()
    r = m.tbsize
    inside = m._project_tb(np.array([0.0, 0.0]))
    assert np.isclose(inside, r)
    edge = r * 0.70710678118654752440
    zs = m._project_tb(np.array([edge - 1e-9, 0.0]))
    zh = m._project_tb(np.array([edge + 1e-9, 0.0]))
    assert np.isclose(zs, zh, atol=1e-6)
    far = m._project_tb(np.array([10.0, 0.0]))
    assert far < 0.1


def test_manipulator_dolly_never_crosses_interest():
    from royaltracer_dx_tpu.camera import Manipulator

    m = Manipulator(Camera(eye=(0, 0, 1), center=(0, 0, 0)),
                    width=100, height=100)
    m.set_mouse_position(0, 0)
    for _ in range(50):
        m.mouse_move(m.mouse[0] + 30, m.mouse[1], lmb=True, shift=True)
    # still on the +z side, never through the interest point
    assert m.pos[2] > 0.0


def test_manipulator_walk_dolly_stays_level():
    from royaltracer_dx_tpu.camera import Manipulator

    m = Manipulator(Camera(eye=(0, 1, 5), center=(0, 0, 0)),
                    width=100, height=100)
    m.mode = m.WALK
    y0 = m.pos[1]
    m.set_mouse_position(0, 50)
    m.mouse_move(0, 40, rmb=True)   # RMB dolly; Walk zeroes the up motion
    assert np.isclose(m.pos[1], y0)


def test_seed_mode_time_differs_across_renders():
    """cfg.seed_mode='time' uses wall-clock nanos as the TEA time term
    (Renderer.cpp:1754-1761) so two fresh renderers diverge; 'frame'
    keeps them deterministic."""
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    def one(mode):
        cam = Camera(eye=(0.5, 0.6, 2.2), center=(0.5, 0.5, 0.0))
        cfg = RenderConfig(width=16, height=16, gi_bounces=1,
                           traversal="brute", seed_mode=mode)
        r = RestirRenderer(cornell_box(), cam, cfg)
        r.render()
        return np.asarray(r.fb.accum)

    a, b = one("frame"), one("frame")
    assert np.array_equal(a, b)
    c, d = one("time"), one("time")
    assert not np.array_equal(c, d)
