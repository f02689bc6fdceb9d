"""Supervoxel exploration (C31): oracle tests for seeding/assignment +
the CLI end-to-end (reference ``experimental/supervoxel_embedding.py``)."""

import numpy as np

from learn_region_grow_tpu.cli import supervoxel_embedding as sve
from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.data.synthetic import generate_rooms
from learn_region_grow_tpu.utils.io import save_h5_rooms


def test_seeds_match_naive_first_per_cell():
    """Seed picking = first point per 0.5 m cell in scan order — the
    reference's set-membership loop (supervoxel_embedding.py:78-84)."""
    rng = np.random.RandomState(0)
    pts = np.float32(rng.randn(500, 3) * 1.5)
    vox = np.round(pts / 0.5).astype(np.int64)
    got = sve.supervoxel_seeds(vox)
    seen = set()
    want = []
    for i in range(len(vox)):
        k = tuple(vox[i])
        if k not in seen:
            seen.add(k)
            want.append(i)
    np.testing.assert_array_equal(got, np.array(want))


def test_assignment_matches_naive_argmin():
    """Device cdist assignment == per-point naive argmin over seeds
    (supervoxel_embedding.py:87-91), including across batch boundaries."""
    rng = np.random.RandomState(1)
    feats = np.float32(rng.randn(300, 10))
    seed_idx = np.arange(0, 300, 17)
    got = sve.assign_supervoxels(feats, seed_idx, batch=128)
    seeds = feats[seed_idx]
    want = np.array([np.argmin(np.sum((f - seeds) ** 2, axis=1))
                     for f in feats])
    np.testing.assert_array_equal(got, want)


def test_cli_end_to_end(tmp_path, capsys):
    rooms = generate_rooms(1, seed=5, scale=0.3)
    save_h5_rooms(str(tmp_path / "s3dis_area3.h5"), rooms)
    sve.main(["--area", "3", "--rooms", "0",
              "--data-dir", str(tmp_path),
              "--out-dir", str(tmp_path / "tmp")])
    out = capsys.readouterr().out
    assert "supervoxels" in out and "supervoxel NMI" in out
    assert (tmp_path / "tmp" / "0-cloud.pcd").exists()
