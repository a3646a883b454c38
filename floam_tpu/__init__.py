"""floam_tpu — a TPU-native LiDAR SLAM engine (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capabilities of IMU-FLOAM (dan11003/floam):
curvature-based edge/planar feature extraction with IMU deskew, scan-to-map
odometry via point-to-line / point-to-plane IRLS Gauss-Newton on SE(3) with
analytic Jacobians, incremental voxel map maintenance, and trajectory/map
export — redesigned around fixed-shape array programs, a spatial-hash grid
NN search (replacing kd-trees), and a hand-rolled on-device solver
(replacing Ceres). See SURVEY.md for the reference layer map.
"""

from .config import (
    DeskewConfig,
    ExportConfig,
    FeatureConfig,
    FloamConfig,
    LidarConfig,
    MappingConfig,
    OdomConfig,
)
from .types import MapState, OdomState, PointBatch, Pose, RingScan, VoxelGrid

__version__ = "0.1.0"

__all__ = [
    "FloamConfig", "LidarConfig", "FeatureConfig", "OdomConfig",
    "MappingConfig", "DeskewConfig", "ExportConfig",
    "RingScan", "PointBatch", "Pose", "VoxelGrid", "MapState", "OdomState",
]
