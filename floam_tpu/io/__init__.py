"""I/O: KITTI loading, PCD files, trajectory/posegraph export."""
