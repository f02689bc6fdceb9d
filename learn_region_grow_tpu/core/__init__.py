from .features import RoomFeatures, prepare_room  # noqa: F401
from .normals import estimate_normals_curvature, voxel_moments  # noqa: F401
from .voxel import (NEIGHBOR_OFFSETS_27, VoxelHash, build_voxel_hash,  # noqa: F401
                    equalize_resolution, pack_voxels, voxel_coords)
