"""Host-side mesh export and diagnostic rendering.

Capability parity with the reference's pytorch3d visualization path
(``experiments/exp_utils.py:30-63``: save_obj + a 256x256 Phong render per
result mesh). Visualization is diagnostics, not product (SURVEY.md §2.3), so
it stays off the device hot path: plain-text OBJ export plus a small
dependency-free NumPy software rasterizer (z-buffered flat shading, look-at
camera matching the reference's distance-2 view) writing PNGs via PIL when
available and .npy grayscale otherwise.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["save_obj", "save_meshes", "render_mesh", "render_meshes",
           "export_pose_meshes"]


def export_pose_meshes(out_dir: str, body_model, named_poses, *,
                       save_mesh: bool = True, render: bool = False,
                       betas=None, global_orient=None) -> None:
    """SMPL-forward each named pose set and write OBJ meshes and/or PNG
    renders — the reference's per-experiment visualization step
    (``motion_denoise.py:61,112``, ``sample_poses.py:59-62,79-82``,
    ``exp_utils.py:30-63``), shared by the generate/denoise/partial/fit-image
    CLIs.

    Args:
        body_model: a ``posendf_tpu.smpl.BodyModel``.
        named_poses: iterable of ``(prefix, pose_body)`` with pose_body
            (B, 63|69) axis-angle; prefixes become the mesh/render filename
            stems (reference uses init/out).
    """
    os.makedirs(out_dir, exist_ok=True)
    for prefix, pose_body in named_poses:
        res = body_model(pose_body=pose_body, betas=betas,
                         root_orient=global_orient)
        verts = np.asarray(res.vertices)
        if save_mesh:
            save_meshes(out_dir, verts, res.faces, prefix=prefix)
        if render:
            render_meshes(out_dir, verts, res.faces, prefix=prefix)


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:  # OBJ is 1-indexed
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def save_meshes(out_dir: str, vertices: np.ndarray, faces: np.ndarray,
                prefix: str = "out") -> Sequence[str]:
    """(B, V, 3) -> out_dir/meshes/{prefix}_{i:04d}.obj (reference naming,
    ``sample_poses.py:52``)."""
    mesh_dir = os.path.join(out_dir, "meshes")
    os.makedirs(mesh_dir, exist_ok=True)
    paths = []
    for i, v in enumerate(np.asarray(vertices)):
        p = os.path.join(mesh_dir, f"{prefix}_{i:04d}.obj")
        save_obj(p, v, faces)
        paths.append(p)
    return paths


def _look_at(eye, target, up=(0.0, 1.0, 0.0)):
    eye, target, up = (np.asarray(x, np.float64) for x in (eye, target, up))
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    R = np.stack([right, true_up, -fwd])  # world -> camera
    t = -R @ eye
    return R, t


def render_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    image_size: int = 256,
    eye=(0.0, 0.3, 2.0),
    fov_deg: float = 60.0,
    light_dir=(0.3, 0.5, 1.0),
) -> np.ndarray:
    """Z-buffered flat-shaded grayscale render, (S, S) float in [0, 1]."""
    V = np.asarray(vertices, np.float64)
    F = np.asarray(faces, np.int64)
    center = V.mean(axis=0)
    R, t = _look_at(np.asarray(eye) + center, center)
    cam = V @ R.T + t
    f = 0.5 * image_size / np.tan(np.radians(fov_deg) / 2)
    z = -cam[:, 2]
    z = np.where(z < 1e-6, 1e-6, z)
    px = f * cam[:, 0] / z + image_size / 2
    py = -f * cam[:, 1] / z + image_size / 2

    # face normals for shading + backface sign
    tri = V[F]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.where(norm < 1e-12, 1.0, norm)
    ld = np.asarray(light_dir, np.float64)
    ld = ld / np.linalg.norm(ld)
    shade = 0.2 + 0.8 * np.abs(n @ ld)

    img = np.zeros((image_size, image_size), np.float64)
    zbuf = np.full((image_size, image_size), np.inf)
    txy = np.stack([px[F], py[F]], axis=-1)  # (F, 3, 2)
    tz = z[F].mean(axis=1)
    order = np.argsort(-tz)  # far-to-near is fine with z-test; near-first is faster

    for fi in order:
        p = txy[fi]
        x0, y0 = np.floor(p.min(axis=0)).astype(int)
        x1, y1 = np.ceil(p.max(axis=0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, image_size - 1), min(y1, image_size - 1)
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        # barycentric test
        (ax, ay), (bx, by), (cx, cy) = p
        den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if abs(den) < 1e-12:
            continue
        w0 = ((by - cy) * (xs - cx) + (cx - bx) * (ys - cy)) / den
        w1 = ((cy - ay) * (xs - cx) + (ax - cx) * (ys - cy)) / den
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        depth = tz[fi]
        closer = inside & (depth < zbuf[y0:y1 + 1, x0:x1 + 1])
        zbuf[y0:y1 + 1, x0:x1 + 1][closer] = depth
        img[y0:y1 + 1, x0:x1 + 1][closer] = shade[fi]
    return img


def render_meshes(out_dir: str, vertices: np.ndarray, faces: np.ndarray,
                  prefix: str = "out", image_size: int = 256) -> Sequence[str]:
    """(B, V, 3) -> out_dir/render/{prefix}_{i:04d}.png (reference layout,
    ``exp_utils.py:31,63``)."""
    render_dir = os.path.join(out_dir, "render")
    os.makedirs(render_dir, exist_ok=True)
    paths = []
    for i, v in enumerate(np.asarray(vertices)):
        img = render_mesh(v, faces, image_size=image_size)
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        try:
            from PIL import Image

            p = os.path.join(render_dir, f"{prefix}_{i:04d}.png")
            Image.fromarray(arr).save(p)
        except Exception:
            p = os.path.join(render_dir, f"{prefix}_{i:04d}.npy")
            np.save(p, arr)
        paths.append(p)
    return paths
