"""BIM/OBJ mesh staging (reference ``tools/stage_bim.py``).

Area-weighted uniform sampling of mesh triangles from .obj files, with one
instance per ``g``-group (surface/device groups skipped); xy recentered by
mean; writes the room-H5 layout. Triangle sampling is vectorized (the
reference samples per-face in Python with a parallelogram-fold, which is the
standard sqrt-free barycentric fold: (a, b) with a+b>1 reflects to
(1-a, 1-b)).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..utils.io import save_h5_rooms

SKIP_PREFIXES = ("DataDevice", "Light-Surface")


def sample_triangles(vertices: np.ndarray, faces: np.ndarray,
                     density: float, rng: np.random.RandomState
                     ) -> np.ndarray:
    """Uniform area-weighted sampling: ~area/density points per triangle
    (fractional remainder sampled stochastically)."""
    p1 = vertices[faces[:, 0]]
    p2 = vertices[faces[:, 1]]
    p3 = vertices[faces[:, 2]]
    v1 = p2 - p1
    v2 = p3 - p1
    areas = 0.5 * np.linalg.norm(np.cross(v1, v2), axis=1)
    counts = areas / density
    n = np.floor(counts).astype(int)
    n += rng.random_sample(len(n)) < (counts - n)
    total = int(n.sum())
    if total == 0:
        return np.zeros((0, 3))
    face_idx = np.repeat(np.arange(len(faces)), n)
    a = rng.random_sample(total)
    b = rng.random_sample(total)
    outside = a + b > 1.0
    a[outside] = 1.0 - a[outside]
    b[outside] = 1.0 - b[outside]
    return p1[face_idx] + a[:, None] * v1[face_idx] + b[:, None] * v2[face_idx]


def parse_obj_groups(path: str, scale: float = 1.0
                     ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """Parse an .obj into (group_name, vertices, faces) triples; faces are
    triangles indexed into the group's OWN vertex block (the reference keeps
    a per-group vertex offset, ``tools/stage_bim.py:59-75``)."""
    groups = []
    vertices: List[np.ndarray] = []
    faces: List[List[int]] = []
    obj_name = ""
    v_offset = 1
    with open(path) as f:
        for line in f:
            if line.startswith("g "):
                if faces:
                    groups.append((obj_name, np.asarray(vertices),
                                   np.asarray(faces)))
                    v_offset += len(vertices)
                    vertices, faces = [], []
                parts = line.split()
                obj_name = parts[1] if len(parts) > 1 else ""
            elif line.startswith("v "):
                vertices.append(
                    np.array([float(t) for t in line.split()[1:4]]) * scale)
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - v_offset
                       for t in line.split()[1:]]
                for k in range(1, len(idx) - 1):   # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if faces:
        groups.append((obj_name, np.asarray(vertices), np.asarray(faces)))
    return groups


def stage_obj_building(path: str, density: float = 0.03,
                       scale: float = 1.0,
                       rng: Optional[np.random.RandomState] = None
                       ) -> np.ndarray:
    """One .obj -> (N, 8) room points with per-group instance ids."""
    rng = rng or np.random.RandomState(0)
    pts, lbl = [], []
    obj_counter = 0
    for name, verts, faces in parse_obj_groups(path, scale):
        skip = (name.startswith(SKIP_PREFIXES[0])
                or name.startswith(SKIP_PREFIXES[1]) or "Surface" in name)
        if not skip and len(faces):
            sampled = sample_triangles(verts, faces, density, rng)
            if len(sampled):
                pts.append(sampled)
                lbl.append(np.full(len(sampled), obj_counter))
        obj_counter += 1
    if not pts:
        return np.zeros((0, 8), np.float32)
    cloud = np.zeros((sum(len(p) for p in pts), 8), np.float32)
    cloud[:, :3] = np.vstack(pts)
    cloud[:, 6] = np.concatenate(lbl)
    cloud[:, :2] -= cloud[:, :2].mean(axis=0)
    return cloud


def stage_bim(obj_files: List[str], output: str, density: float = 0.03):
    rooms = []
    for path in obj_files:
        scale = 0.3048 if ("Ajax" in path or "sample" in path) else 1.0
        print("Opening", path)
        cloud = stage_obj_building(path, density=density, scale=scale)
        if len(cloud):
            rooms.append(cloud)
    save_h5_rooms(output, rooms)
    print("wrote %d buildings to %s" % (len(rooms), output))
