"""Marching-tetrahedra mesh export (utils/mesh.py): geometric
correctness on the analytic sphere oracle (SURVEY §2.6's debug scene:
known isosurface radius), watertightness, winding, file formats, CLI.
"""

import os

import numpy as np

from nerf_rs_tpu.utils import mesh as mesh_mod


def _sphere_grid(res=32, aabb=1.0, radius=0.5, scale=10.0):
    """sigma = scale*(radius - |p|): smooth, crosses threshold 0 at
    exactly |p| = radius."""
    cell = 2.0 * aabb / res
    c = np.linspace(-aabb + cell / 2, aabb - cell / 2, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(c, c, c, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    return scale * (radius - r)


def test_sphere_vertices_on_isosurface():
    """Every vertex of the extracted mesh lies on the analytic
    isosurface to within linear-interpolation error (<< one cell)."""
    res, aabb, radius = 32, 1.0, 0.5
    sigma = _sphere_grid(res, aabb, radius)
    verts, faces, _ = mesh_mod.marching_tetrahedra(sigma, 0.0, aabb)
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=1)
    cell = 2.0 * aabb / res
    assert np.max(np.abs(r - radius)) < 0.2 * cell, (
        np.max(np.abs(r - radius)), cell)


def test_sphere_mesh_watertight():
    """The sphere isosurface is closed, so every undirected edge must
    be shared by exactly two faces (the marching-tets decomposition
    splits shared cube faces identically across cells)."""
    sigma = _sphere_grid(res=16)
    verts, faces, _ = mesh_mod.marching_tetrahedra(sigma, 0.0, 1.0)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    key = np.minimum(e[:, 0], e[:, 1]) * (10**9) + np.maximum(
        e[:, 0], e[:, 1])
    _, counts = np.unique(key, return_counts=True)
    assert np.all(counts == 2), np.unique(counts)


def test_sphere_winding_outward():
    """Winding normalization: face normals point away from the inside
    region — for the origin-centered sphere, outward."""
    sigma = _sphere_grid(res=24)
    verts, faces, _ = mesh_mod.marching_tetrahedra(sigma, 0.0, 1.0)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    ctr = (v0 + v1 + v2) / 3.0
    dots = (nrm * ctr).sum(axis=1)
    area2 = np.linalg.norm(nrm, axis=1)
    nondegenerate = area2 > 1e-12
    assert np.all(dots[nondegenerate] > 0.0)


def test_mesh_area_matches_sphere():
    """Total face area approximates the analytic sphere area 4*pi*r^2
    (coarse grid -> generous tolerance; catches gross topology or
    duplicate-face bugs that watertightness alone can miss)."""
    radius = 0.5
    sigma = _sphere_grid(res=32, radius=radius)
    verts, faces, _ = mesh_mod.marching_tetrahedra(sigma, 0.0, 1.0)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    expect = 4.0 * np.pi * radius**2
    assert abs(area - expect) / expect < 0.05, (area, expect)


def test_empty_and_full_grids():
    empty = np.full((8, 8, 8), -1.0, np.float32)
    v, f, c = mesh_mod.marching_tetrahedra(empty, 0.0, 1.0)
    assert v.shape == (0, 3) and f.shape == (0, 3)
    # all-inside: no crossings either
    v, f, c = mesh_mod.marching_tetrahedra(-empty, 0.0, 1.0)
    assert v.shape == (0, 3) and f.shape == (0, 3)


def test_vertex_colors_sampled():
    sigma = _sphere_grid(res=16)
    rgb = np.zeros((16, 16, 16, 3), np.float32)
    rgb[..., 0] = 1.0  # uniformly red field
    verts, faces, colors = mesh_mod.marching_tetrahedra(
        sigma, 0.0, 1.0, rgb=rgb)
    assert colors.shape == (verts.shape[0], 3)
    assert np.all(colors[:, 0] == 255) and np.all(colors[:, 1] == 0)


def test_ply_and_obj_roundtrip(tmp_path):
    sigma = _sphere_grid(res=12)
    rgb = np.full((12, 12, 12, 3), 0.5, np.float32)
    verts, faces, colors = mesh_mod.marching_tetrahedra(
        sigma, 0.0, 1.0, rgb=rgb)
    ply = tmp_path / "m.ply"
    obj = tmp_path / "m.obj"
    mesh_mod.save_mesh_ply(str(ply), verts, faces, colors)
    mesh_mod.save_mesh_obj(str(obj), verts, faces)
    head = ply.read_text().splitlines()
    assert head[0] == "ply"
    assert f"element vertex {verts.shape[0]}" in head
    assert f"element face {faces.shape[0]}" in head
    lines = obj.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == verts.shape[0]
    assert sum(1 for l in lines if l.startswith("f ")) == faces.shape[0]
    # OBJ faces are 1-indexed and in range
    fmax = max(int(t) for l in lines if l.startswith("f ")
               for t in l.split()[1:])
    assert fmax == verts.shape[0]


def test_cli_export_mesh(tmp_path):
    """export --mesh writes a non-trivial triangle mesh next to the
    point cloud (e2e through the CLI on a briefly-trained sphere
    field, mirroring test_export's protocol)."""
    from nerf_rs_tpu.cli import main

    save_dir = str(tmp_path / "ckpt")
    common = [
        "--dataset", "sphere",
        "--width", "24", "--height", "24",
        "--num_rays", "128", "--num_samples", "8",
        "--num_views_per_hemisphere", "2",
        "--log_dir", str(tmp_path / "logs"), "--save_dir", save_dir,
        "--precision", "f32",
    ]
    rc = main(["train", *common, "--num_iter", "12", "--save_steps", "10",
               "--eval_steps", "100", "--logging_steps", "100",
               "--learning_rate", "5e-3"])
    assert rc == 0
    # first export just to learn the field's sigma range; a 12-iter
    # field has no surface at an arbitrary threshold
    out = str(tmp_path / "field")
    rc = main(["export", *common, "--grid_res", "16",
               "--export_aabb", "1.0", "--out", out])
    assert rc == 0
    sigma = np.load(out + ".npz")["sigma"]
    thr = float(0.5 * (sigma.min() + sigma.max()))
    rc = main(["export", *common, "--grid_res", "16",
               "--export_aabb", "1.0", "--threshold", str(thr),
               "--mesh", "true", "--out", out])
    assert rc == 0
    assert os.path.exists(out + ".ply")
    assert os.path.exists(out + "_mesh.ply")
    txt = open(out + "_mesh.ply").read().splitlines()
    nverts = int([l for l in txt if l.startswith("element vertex")][0]
                 .split()[-1])
    nfaces = int([l for l in txt if l.startswith("element face")][0]
                 .split()[-1])
    assert nverts > 0 and nfaces > 0
