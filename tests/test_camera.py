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
