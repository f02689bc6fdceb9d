"""Semantic KITTI staging (reference ``stage_semantic_kitti.py``).

Parses calib + poses, transforms scans to the world frame, projects RGB from
``image_2`` via ``P2 . Tr`` with a persistent voxel->RGB cache, decodes
labels (``obj = label >> 16``, ``cls = label & 0xFFFF``), drops colorless and
moving-class (>= 250) points, accumulates ``interval`` scans per sample,
downsamples at 0.1, and assigns instance IDs to unlabeled points by
class-constrained voxel connected components at 0.3 (min cluster 50).

Host-side ETL; the per-point dict loops of the reference are vectorized via
the voxel hash. Image IO uses imageio when present, else PIL.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.voxel import equalize_resolution, voxel_coords
from ..eval.components import voxel_adjacency_edges
from ..utils.io import save_h5_rooms
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components as _cc


@dataclasses.dataclass
class KittiConfig:
    interval: int = 20
    min_cluster: int = 50
    voxel_resolution: float = 0.3
    downsample_resolution: float = 0.1
    skip: int = 10


def _read_image(path: str) -> np.ndarray:
    try:
        import imageio
        return np.asarray(imageio.imread(path))
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path))


def parse_calib(path: str) -> Dict[str, np.ndarray]:
    calib = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, content = line.strip().split(":", 1)
            values = [float(v) for v in content.strip().split()]
            pose = np.zeros((4, 4))
            pose[0, :4] = values[0:4]
            pose[1, :4] = values[4:8]
            pose[2, :4] = values[8:12]
            pose[3, 3] = 1.0
            calib[key] = pose
    return calib


def parse_poses(path: str, tr: np.ndarray) -> List[np.ndarray]:
    tr_inv = np.linalg.inv(tr)
    poses = []
    with open(path) as f:
        for line in f:
            values = [float(v) for v in line.strip().split()]
            pose = np.zeros((4, 4))
            pose[0, :4] = values[0:4]
            pose[1, :4] = values[4:8]
            pose[2, :4] = values[8:12]
            pose[3, 3] = 1.0
            poses.append(tr_inv @ pose @ tr)
    return poses


def project_rgb(xyz_local: np.ndarray, image: np.ndarray, p2: np.ndarray,
                tr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Project local scan points into the camera image. Returns
    (rgb (N,3) 0-255, valid (N,))."""
    homo = np.hstack([xyz_local, np.ones((len(xyz_local), 1))])
    cam = (p2 @ (tr @ homo.T)).T
    z = cam[:, 2]
    uv = np.round(cam[:, :2] / np.where(z[:, None] == 0, 1, z[:, None])
                  ).astype(int)
    valid = ((z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < image.shape[1])
             & (uv[:, 1] >= 0) & (uv[:, 1] < image.shape[0]))
    rgb = np.zeros((len(xyz_local), 3))
    rgb[valid] = image[uv[valid, 1], uv[valid, 0], :3]
    return rgb, valid


class VoxelRGBCache:
    """First-seen RGB per world voxel (``stage_semantic_kitti.py:87,112-118``)."""

    def __init__(self):
        self.map: Dict[tuple, np.ndarray] = {}

    def update_and_fill(self, vox: np.ndarray, rgb: np.ndarray,
                        valid: np.ndarray) -> np.ndarray:
        out = rgb.copy()
        for i in np.nonzero(valid)[0]:
            k = tuple(vox[i])
            if k not in self.map:
                self.map[k] = rgb[i]
        for i in np.nonzero(~valid)[0]:
            k = tuple(vox[i])
            if k in self.map:
                out[i] = self.map[k]
        return out

    def clear(self):
        self.map = {}


def relabel_sample(points: np.ndarray, cfg: KittiConfig) -> np.ndarray:
    """Downsample + class-constrained CC relabeling of one interval sample
    (``stage_semantic_kitti.py:139-187``). Returns the filtered sample."""
    eq, _ = equalize_resolution(points[:, :3], cfg.downsample_resolution)
    points = points[eq]

    eq2, uneq2 = equalize_resolution(points[:, :3], cfg.voxel_resolution)
    pts = points[eq2]
    obj_id = pts[:, 6]
    cls_id = pts[:, 7]
    new_obj = np.zeros(len(pts), dtype=int)
    cluster_id = 1
    for oid in sorted(set(obj_id.tolist()) - {0}):
        new_obj[obj_id == oid] = cluster_id
        cluster_id += 1

    src, dst = voxel_adjacency_edges(pts[:, :3], cfg.voxel_resolution)
    keep = (obj_id[src] == 0) & (cls_id[src] == cls_id[dst])
    src, dst = src[keep], dst[keep]
    if len(src):
        g = sp.coo_matrix((np.ones(len(src), np.int8), (src, dst)),
                          shape=(len(pts), len(pts)))
        _, comp = _cc(g, directed=False)
        in_graph = np.zeros(len(pts), bool)
        in_graph[src] = True
        in_graph[dst] = True
        for c in np.unique(comp[in_graph]):
            members = np.nonzero((comp == c) & in_graph)[0]
            if len(members) > cfg.min_cluster:
                new_obj[members] = cluster_id
                cluster_id += 1

    points[:, 6] = new_obj[uneq2]
    return points[points[:, 6] > 0]


def stage_sequence(dataset: str, sequence: str, cfg: KittiConfig,
                   verbose: bool = True) -> List[np.ndarray]:
    """Stage one KITTI sequence into a list of interval samples (N, 8)."""
    seq_dir = os.path.join(dataset, "sequences", sequence)
    calib = parse_calib(os.path.join(seq_dir, "calib.txt"))
    poses = parse_poses(os.path.join(seq_dir, "poses.txt"), calib["Tr"])

    def listing(sub):
        d = os.path.join(seq_dir, sub)
        return sorted(os.path.join(dp, f) for dp, _dn, fn in os.walk(d)
                      for f in fn)

    scans = listing("velodyne")
    labels = listing("labels")
    images = listing("image_2")

    cache = VoxelRGBCache()
    samples: List[np.ndarray] = []
    stacked: List[np.ndarray] = []
    offset = 0
    while offset < len(scans):
        scan = np.fromfile(scans[offset], dtype=np.float32).reshape(-1, 4)
        xyz_local = scan[:, :3]
        rot = poses[offset][:3, :3]
        t = poses[offset][:3, 3]
        xyz_world = xyz_local @ rot.T + t
        vox = voxel_coords(xyz_world, cfg.voxel_resolution)

        image = _read_image(images[offset])
        rgb, valid = project_rgb(xyz_local, image, calib["P2"], calib["Tr"])
        rgb = cache.update_and_fill(vox, rgb, valid)
        rgb = rgb / 255.0 - 0.5

        label = np.fromfile(labels[offset], dtype=np.uint32)
        obj_id = label >> 16
        cls_id = label & 0xFFFF

        pts = np.zeros((len(xyz_world), 8))
        pts[:, :3] = xyz_world
        pts[:, 3:6] = rgb
        pts[:, 6] = obj_id
        pts[:, 7] = cls_id
        pts = pts[~np.all(rgb == -0.5, axis=1)]
        pts = pts[pts[:, 7] < 250]
        stacked.append(pts)
        if verbose:
            print("Processing %d points from %s" % (len(pts), scans[offset]))

        if offset % cfg.interval == cfg.interval - 1:
            sample = relabel_sample(np.vstack(stacked), cfg)
            if verbose:
                print("Creating data sample with %d points %d objects" % (
                    len(sample), len(set(sample[:, 6].tolist()))))
            samples.append(sample)
            stacked = []
            cache.clear()
            offset += cfg.skip * cfg.interval + 1
        else:
            offset += 1
    return samples


def stage_semantic_kitti(dataset: str, output: str, sequences: List[str],
                         cfg: Optional[KittiConfig] = None):
    cfg = cfg or KittiConfig()
    samples = []
    for seq in sequences:
        samples.extend(stage_sequence(dataset, seq, cfg))
    save_h5_rooms(output, samples)
    print("wrote %d samples to %s" % (len(samples), output))
