from .gaussians import GaussianMapState, MapConfig  # noqa: F401
from .voxel_map import VoxelMapState, VoxelConfig  # noqa: F401
