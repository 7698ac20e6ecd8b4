"""Camera: view/projection matrices and primary-ray generation.

Behavioral parity targets:
  * view matrix = glm::lookAt (manipulator.cpp:305-307 via CameraManip)
  * projection  = XMMatrixPerspectiveFovRH(60deg, aspect, 0.1, 1000)
    (Renderer.cpp:1730-1731)
  * primary rays reproduce RayGen_v6_pass1.hlsl:59-95: NDC from the pixel
    *corner* (jitter defaults to 0 in v6; the v5 kernel jitters in [0,1)),
    y flipped, direction through the inverse projection & view.

The HLSL consumes XMMATRIX bytes as column-major, so the net effect of its
mul(viewI, v) chain is the standard column-vector transform by the glm
matrices; we implement that math directly (no byte-level transposes).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def look_at(eye, center, up) -> np.ndarray:
    """glm::lookAtRH as a 4x4 (column-vector convention) numpy matrix."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective_rh(fov_y_rad: float, aspect: float, z_near: float, z_far: float) -> np.ndarray:
    """XMMatrixPerspectiveFovRH as a column-vector-convention 4x4.

    XM stores row-vector-convention matrices; expressed in column-vector
    convention (the one this codebase uses) it is the transpose.
    """
    y_scale = 1.0 / math.tan(fov_y_rad / 2.0)
    x_scale = y_scale / aspect
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = x_scale
    m[1, 1] = y_scale
    m[2, 2] = z_far / (z_near - z_far)
    m[2, 3] = z_near * z_far / (z_near - z_far)
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera with the reference's defaults (Renderer.cpp:46-48)."""

    eye: tuple[float, float, float] = (-1.5, 1.5, 3.5)
    center: tuple[float, float, float] = (0.0, 1.0, 0.0)
    up: tuple[float, float, float] = (0.0, 1.0, 0.0)
    fov_y_deg: float = 60.0
    z_near: float = 0.1
    z_far: float = 1000.0

    def view(self) -> np.ndarray:
        return look_at(self.eye, self.center, self.up)

    def proj(self, aspect: float) -> np.ndarray:
        return perspective_rh(math.radians(self.fov_y_deg), aspect, self.z_near, self.z_far)

    def basis(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(right, up, forward) world-space camera basis."""
        eye = np.asarray(self.eye, np.float32)
        center = np.asarray(self.center, np.float32)
        up = np.asarray(self.up, np.float32)
        f = center - eye
        f = f / np.linalg.norm(f)
        s = np.cross(f, up)
        s = s / np.linalg.norm(s)
        u = np.cross(s, f)
        return s, u, f

    def matrices(self, aspect: float) -> dict[str, np.ndarray]:
        v = self.view()
        p = self.proj(aspect)
        return {
            "view": v,
            "proj": p,
            "view_inv": np.linalg.inv(v),
            "proj_inv": np.linalg.inv(p),
        }

    # -- orbit manipulator (the useful subset of rdn/manipulator.{h,cpp}) --

    def orbited(self, dx: float, dy: float) -> "Camera":
        """Orbit eye around center: dx/dy in normalized screen units
        (manipulator.cpp orbit(): full width = 2*pi around up axis)."""
        eye = np.asarray(self.eye, np.float64)
        center = np.asarray(self.center, np.float64)
        up = np.asarray(self.up, np.float64)
        offset = eye - center
        # azimuth around up
        phi = -dx * 2.0 * math.pi
        theta = -dy * 2.0 * math.pi
        # rotate offset about up by phi
        offset = _rotate_axis(offset, up, phi)
        # rotate about camera right by theta, clamping near poles
        f = -offset / np.linalg.norm(offset)
        right = np.cross(f, up)
        rn = np.linalg.norm(right)
        if rn > 1e-8:
            right = right / rn
            cand = _rotate_axis(offset, right, theta)
            cf = -cand / np.linalg.norm(cand)
            if abs(np.dot(cf, up / np.linalg.norm(up))) < 0.99:
                offset = cand
        return dataclasses.replace(self, eye=tuple((center + offset).astype(np.float32)))

    def dollied(self, factor: float) -> "Camera":
        """Move eye toward/away from center (manipulator dolly)."""
        eye = np.asarray(self.eye, np.float64)
        center = np.asarray(self.center, np.float64)
        return dataclasses.replace(
            self, eye=tuple((center + (eye - center) * factor).astype(np.float32))
        )

    def panned(self, dx: float, dy: float) -> "Camera":
        """Translate eye+center along the image plane."""
        right, u, _ = self.basis()
        eye = np.asarray(self.eye, np.float64)
        center = np.asarray(self.center, np.float64)
        d = np.linalg.norm(eye - center)
        delta = (-dx * right + dy * u) * d
        return dataclasses.replace(
            self,
            eye=tuple((eye + delta).astype(np.float32)),
            center=tuple((center + delta).astype(np.float32)),
        )

    def flown(self, forward: float, strafe: float = 0.0, lift: float = 0.0) -> "Camera":
        """Fly mode (manipulator.h:37 Fly): translate eye AND center along
        the camera basis — the look direction is preserved."""
        right, u, f = self.basis()
        delta = forward * f + strafe * right + lift * u
        eye = np.asarray(self.eye, np.float64) + delta
        center = np.asarray(self.center, np.float64) + delta
        return dataclasses.replace(
            self, eye=tuple(eye.astype(np.float32)),
            center=tuple(center.astype(np.float32)),
        )

    def walked(self, forward: float, strafe: float = 0.0) -> "Camera":
        """Walk mode: like fly but constrained to the ground plane (the
        world-up component of motion is dropped)."""
        right, _, f = self.basis()
        up = np.asarray(self.up, np.float64)
        up = up / np.linalg.norm(up)
        def flatten(v):
            v = v - np.dot(v, up) * up
            n = np.linalg.norm(v)
            return v / n if n > 1e-9 else v
        delta = forward * flatten(f) + strafe * flatten(right)
        eye = np.asarray(self.eye, np.float64) + delta
        center = np.asarray(self.center, np.float64) + delta
        return dataclasses.replace(
            self, eye=tuple(eye.astype(np.float32)),
            center=tuple(center.astype(np.float32)),
        )

    def looked(self, dx: float, dy: float) -> "Camera":
        """Rotate the look direction around the eye (fly/walk mouse-look)."""
        right, u, f = self.basis()
        eye = np.asarray(self.eye, np.float64)
        center = np.asarray(self.center, np.float64)
        offset = center - eye
        offset = _rotate_axis(offset, np.asarray(self.up, np.float64), -dx * 2.0 * math.pi)
        offset2 = _rotate_axis(offset, right, -dy * 2.0 * math.pi)
        nf = offset2 / np.linalg.norm(offset2)
        if abs(np.dot(nf, np.asarray(self.up) / np.linalg.norm(self.up))) < 0.99:
            offset = offset2
        return dataclasses.replace(
            self, center=tuple((eye + offset).astype(np.float32))
        )


def generate_rays(
    camera_arrays: dict[str, jax.Array],
    width: int,
    height: int,
    jitter: jax.Array | None = None,
    xs: jax.Array | None = None,
    ys: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Primary rays for every pixel, flattened row-major (y*W + x).

    Implements RayGen_v6_pass1.hlsl:79-95:
      d    = ((pix + jitter)/dims)*2 - 1
      tgt  = projI @ (d.x, -d.y, 1, 1)      (view space)
      dir  = viewI-rotation @ tgt.xyz        (world space, normalized)
      orig = camera position.

    Args:
      camera_arrays: dict with 'view_inv' (4,4) and 'proj_inv' (4,4) arrays
        (column-vector convention).
      jitter: optional [N, 2] subpixel jitter in [0,1); defaults to 0 (the
        v6 behavior).

    Returns:
      (origins [N,3], directions [N,3]) with N = width*height.
    """
    view_inv = camera_arrays["view_inv"]
    proj_inv = camera_arrays["proj_inv"]
    if xs is None:
        ys, xs = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.float32),
            jnp.arange(width, dtype=jnp.float32),
            indexing="ij",
        )
        xs, ys = xs.ravel(), ys.ravel()
    pix = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1)
    if jitter is not None:
        pix = pix + jitter
    dims = jnp.array([width, height], jnp.float32)
    d = (pix / dims) * 2.0 - 1.0
    ndc = jnp.stack([d[:, 0], -d[:, 1], jnp.ones_like(d[:, 0]), jnp.ones_like(d[:, 0])], axis=-1)
    # explicit fp32 broadcasts (a matmul would use the MXU's bf16 default)
    target = jnp.sum(ndc[:, None, :] * proj_inv[None, :, :], axis=-1)
    dirs_view = target[:, :3]
    dirs_world = jnp.sum(dirs_view[:, None, :] * view_inv[None, :3, :3], axis=-1)
    dirs_world = dirs_world * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(dirs_world * dirs_world, axis=-1, keepdims=True), 1e-20)
    )
    origin = view_inv[:3, 3]
    origins = jnp.broadcast_to(origin, dirs_world.shape)
    return origins, dirs_world


def _rotate_axis(v: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    c, s = math.cos(angle), math.sin(angle)
    return v * c + np.cross(axis, v) * s + axis * np.dot(axis, v) * (1.0 - c)
