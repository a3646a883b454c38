"""Typed configuration for the TPU-native FLOAM engine.

This replaces the reference's ROS parameter server + launch-file config
(reference: launch/structor_odom.launch:9-41, read in
src/laserProcessingNode.cpp:183-188, src/odomEstimationNode.cpp:336-348,
src/laserMappingNode.cpp:114-119) with a single typed, immutable config tree.
All constants that were hardcoded in the reference (keyframe thresholds at
include/odomEstimationClass.h:114-116, crop radius at
src/odomEstimationClass.cpp:270-275, curvature/validity thresholds in
src/laserProcessingClass.cpp and src/odomEstimationClass.cpp, map cell sizes
at include/laserMappingClass.h:26-33, IMU extrinsics at
src/laserProcessingNode.cpp:196) are surfaced here.

Capacity fields (``*_capacity``, ``points_per_ring``) are TPU-specific: XLA
requires static shapes, so every variable-size structure of the reference
(per-ring point vectors, feature clouds, maps) becomes a fixed-capacity
padded array with a validity mask.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class LidarConfig:
    """Sensor parameters (reference: include/lidar.h:53-85, src/lidar.cpp:25-51)."""

    num_lines: int = 64
    scan_period: float = 0.1  # seconds per revolution (SCAN_RATE 10 Hz)
    max_distance: float = 90.0
    min_distance: float = 0.5
    vertical_angle: float = 2.0
    #: static per-ring point capacity (TPU padding; HDL-64 has ~2200 pts/ring)
    points_per_ring: int = 2304

    @property
    def max_points(self) -> int:
        return self.num_lines * self.points_per_ring

    # --- sensor presets, mirroring launch/structor_odom.launch:8-18 ---
    @staticmethod
    def vlp16(**kw) -> "LidarConfig":
        return LidarConfig(num_lines=16, points_per_ring=2304, **kw)

    @staticmethod
    def hdl32(**kw) -> "LidarConfig":
        return LidarConfig(num_lines=32, points_per_ring=2304, **kw)

    @staticmethod
    def hdl64(**kw) -> "LidarConfig":
        return LidarConfig(num_lines=64, points_per_ring=2304, **kw)


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Edge/planar feature extraction (reference: src/laserProcessingClass.cpp).

    Defaults reproduce the reference's constants: curvature threshold 0.1
    (:136), 20 edges per sector (:143), 6 sectors (:103), +-5 suppression
    window with 0.05 adjacent-gap break (:150-167), 131-point minimum ring
    size (:89), 11-point curvature window (:95-99).
    """

    curvature_threshold: float = 0.1
    edges_per_sector: int = 20
    sectors_per_ring: int = 6
    suppression_window: int = 5
    suppression_gap_sq: float = 0.05
    min_ring_points: int = 131
    curvature_half_window: int = 5


@dataclasses.dataclass(frozen=True)
class OdomConfig:
    """Scan-to-map odometry (reference: src/odomEstimationClass.cpp)."""

    map_resolution: float = 0.4  # edge voxel leaf; surf leaf is 2x (:13-14)
    #: robust loss: "none" | "huber" | "cauchy". The reference's launch
    #: default is Cauchy but a bug makes it L2 (:83-91 — the CauchyLoss object
    #: is discarded); we implement all three properly as IRLS weights.
    loss: str = "cauchy"
    huber_delta: float = 0.1
    cauchy_scale: float = 0.2
    #: outer association rounds: 12 after init decaying to 2 (:22,31,59-60)
    max_outer_iters: int = 12
    min_outer_iters: int = 2
    #: inner Gauss-Newton iterations per round (Ceres max_num_iterations=4, :102)
    inner_iters: int = 4
    #: 5-NN association validity gate: 5th-NN sq dist < 1.0 m^2 (:154,210)
    k_neighbors: int = 5
    nn_radius_sq: float = 1.0
    #: edge validity: largest cov eigenvalue > 3x middle (:179)
    edge_eig_ratio: float = 3.0
    #: line endpoints at centroid +- 0.1 * principal direction (:181-184)
    line_half_length: float = 0.1
    #: plane fit residual gate 0.2 m (:224-235)
    plane_fit_tol: float = 0.2
    #: keyframe gate (include/odomEstimationClass.h:114-116)
    keyframe_min_transl: float = 0.07
    keyframe_min_rot: float = 2.0 * math.pi / 180.0
    #: local map crop box +-100 m around pose (:270-275)
    crop_radius: float = 100.0
    #: map minimum-size guard (>10 edge, >50 surf; :77)
    min_map_edge: int = 10
    min_map_surf: int = 50
    #: Levenberg damping added to the 6x6 normal matrix diagonal
    damping: float = 1e-4
    #: early-exit the outer association rounds once a round moves the pose
    #: by less than the thresholds below (re-association at an unchanged
    #: pose reproduces the same factors, so skipping is exact; the
    #: reference always runs its full decayed count)
    adaptive_rounds: bool = True
    converge_transl: float = 1e-3
    converge_rot: float = 2e-4
    #: gather k-NN candidate rows ONCE per scan (at the predicted pose) and
    #: re-rank/re-fit them after every GN round's pose update, instead of
    #: re-gathering per outer round. The candidate search radius is inflated
    #: by ``assoc_margin`` so the one gather stays a superset of every
    #: round's true radius-sqrt(nn_radius_sq) neighborhood as long as the
    #: total pose correction stays under the margin (constant-velocity
    #: prediction errors are cm-scale; see docs/PERFORMANCE.md). The
    #: reference re-associates per round against a static kd-tree
    #: (src/odomEstimationClass.cpp:81-108) — one gather per round is the
    #: moral equivalent, and the dominant cost on TPU.
    gather_per_round: bool = False
    assoc_margin: float = 0.25
    #: per-round re-rank implementation: "xla" (candidate_d2 + select_k_mask
    #: + fused-moment fits), "pallas" (ops.assoc_kernel: the same chain in
    #: one VMEM-resident pass over the candidate planes — one HBM read of
    #: the planes per round instead of several; A/B numbers in
    #: docs/PERFORMANCE.md), or "auto" (pallas on accelerators, xla on CPU —
    #: Pallas interpret mode is orders of magnitude too slow for the CPU
    #: test/virtual-mesh paths, and the backends agree to float tolerance)
    assoc_backend: str = "auto"
    #: cap on per-voxel running-mean weight in the hash map (bounds how
    #: slowly a voxel centroid adapts; the reference re-averages the whole
    #: map every keyframe instead)
    voxel_count_cap: float = 25.0
    #: way-probe rounds per map insert: round 1 claims the voxel's natural
    #: sub-voxel slot; extra rounds only resolve bucket-aliased cells
    #: whose slot is taken (rare at the configured load factors). Each
    #: round costs 3 sparse kernels per map side
    map_insert_probe_rounds: int = 2
    # --- static capacities (TPU padding). *_table values are hash-table
    #     SUPERCELL bucket counts (power of 2, x super^3 sub-voxel ways
    #     each; keep expected supercell occupancy well under 1/bucket so
    #     bucket overflow drops stay negligible). The packed query view is
    #     (buckets, 4*way_block) f32 — keep each view <= ~8 MB to stay in
    #     the fast gather tier (docs/PERFORMANCE.md). Supercell sizes are
    #     tuned from the measured row-gather law: k-NN cost ~ rows
    #     gathered; edge S=2 -> 3 and surf S=2 -> 4 cut the per-round
    #     gather cost ~2.2x / ~3.8x at these radii and leaves
    #: association query budgets. Edge picks are compacted strongest-first
    #: (per-sector rank-major) and surf samples azimuth-interleaved, so
    #: overflow drops the weakest/densest points uniformly — the TPU
    #: analogue of the reference's scan-side VoxelGrid downsample
    #: (src/odomEstimationClass.cpp:137-142). k-NN gather cost is linear
    #: in these. Because edge compaction is RANK-major (strongest
    #: curvature picks first), a small edge capacity doubles as a QUALITY
    #: filter: the round-4 sweep (docs/budget_sweep*.jsonl) measured edge
    #: 512 vs 2048 at ~1.7x LOWER longrun drift AND +20-25% throughput on
    #: both the longrun circuit and the 115k-pt bench spiral — weak-edge
    #: tail factors actively hurt the GN solution. Surf capacity stays
    #: 4096 (halving it regressed accuracy on dense 1800-step scans).
    scan_edge_capacity: int = 512  # edge queries after compaction
    scan_surf_capacity: int = 4096  # surf queries after compaction
    scan_surf_slots: int = 8192  # strided surf sample grid, pre-compaction
    map_edge_super: int = 3  # 27 ways/bucket, view rows 128 f32
    map_surf_super: int = 4  # 64 ways/bucket, view rows 256 f32
    map_edge_table: int = 8192  # 221k voxel slots, 4 MB view
    map_surf_table: int = 8192  # 524k voxel slots, 8 MB view
    #: two-phase deskew registration (UpdatePointsToMapSelector, :34-50)
    deskew: bool = False
    #: match the reference's literal behavior of registering the edge cloud
    #: as both edge and surf in the deskew initial iteration (:40; quirk 3)
    deskew_initial_edge_as_surf: bool = False


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    """Global full-resolution map (reference: src/laserMappingClass.cpp).

    The reference's dynamically-growing vector<vector<vector<cloud>>> of
    50 m cells (include/laserMappingClass.h:26-33) becomes a block-sparse
    map: a host-side dict of fixed-capacity device blocks.
    """

    cell_size: float = 50.0
    map_resolution: float = 0.4
    #: neighborhood half-extent re-downsampled around the pose each update
    #: (LASER_CELL_RANGE_HORIZONTAL/VERTICAL = 2, laserMappingClass.h:32-33)
    neighbor_range: int = 2
    #: per-block point capacity (50 m cell at 0.4 m resolution)
    block_capacity: int = 131072
    #: batch capacity for per-scan point binning
    scan_capacity: int = 147456  # 64 * 2304
    #: keep every Nth point of a keyframe cloud in the streaming map feed
    #: (1 = full cloud, the reference's behavior). The map voxel-filters
    #: to ``map_resolution`` anyway, so points past ~1 per voxel only
    #: refine the running mean; stride 2 halves the host feed cost for a
    #: ~2% map-point loss (measured, docs/PERFORMANCE.md round 5) —
    #: useful on host-CPU-starved deployments where the feed worker
    #: contends with the frame loop.
    feed_stride: int = 1


@dataclasses.dataclass(frozen=True)
class DeskewConfig:
    """IMU handling + deskew (reference: src/dataHandler.cpp)."""

    enabled: bool = False
    #: lidar->IMU extrinsic rotation as RPY radians
    #: (hardcoded RPY(0,0,pi) at src/laserProcessingNode.cpp:196)
    extrinsic_rpy: Tuple[float, float, float] = (0.0, 0.0, math.pi)
    #: reference quirk 5: Interpolate() returns the earlier sample
    #: (dataHandler.cpp:48-50). True = proper slerp, False = nearest-before.
    slerp: bool = True
    #: static capacity of the per-scan IMU sample window
    imu_window: int = 64


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """In-loop windowed bundle adjustment over recent keyframes — the
    in-framework replacement for the reference's exit-time handoff to
    g2o/BALM back-ends (src/utils.cpp:3-78, odomEstimationNode.cpp:373-387;
    its own keyframe history is write-only — quirk 9). Refined poses feed
    the exported trajectory/posegraph; the live front-end state is not
    perturbed (matching the reference's front-end/back-end split).

    DEFAULT OFF: the committed ablation (docs/ba_ablation.jsonl, 24
    configs x 240-frame longrun, noise 0.02/0.08, full and degraded
    front-ends) shows window-BA against the same local map the odometry
    already registered to improves ATE by at most ~3% while costing ~1
    extra odometry-step of device time per `every` frames (~2x wall on
    the product loop). The information in the window factors is already
    absorbed by scan-to-map GN; materially better requires revisit
    (map-to-map) constraints, which is posegraph back-end territory —
    exactly what the g2o export hands off. Enable for refinement runs
    where throughput is secondary."""

    enabled: bool = False
    #: keyframes per window
    window: int = 8
    #: run BA every N new keyframes (once the window is full)
    every: int = 4
    #: per-keyframe query budgets inside the BA window: PREFIX slices of
    #: the stored feature clouds (edge is rank-major strongest-first, surf
    #: bit-reversed-azimuth — both orders subsample uniformly). At the full
    #: scan budgets each window solve costs ~window/2 odometry steps of
    #: device time; refinement doesn't need that factor density.
    edge_budget: int = 1024
    surf_budget: int = 2048
    #: GN iterations per window solve
    iters: int = 4
    #: weight on the odometry chain priors (vs unit-weight feature factors)
    prior_weight: float = 100.0
    damping: float = 1e-6


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    """Revisit-constraint pose-graph back-end (floam_tpu.posegraph) — the
    in-framework equivalent of the lio_sam back-end the reference's
    deployment launch chains after the front-end
    (launch/structor_slam.launch:50-52; the g2o export at utils.cpp:3-78
    is the handoff). The windowed-BA ablation (docs/ba_ablation.jsonl)
    showed window refinement against the same local map cannot materially
    help; REVISIT constraints are what closes accumulated drift.

    Flow: every ``keyframe_stride``-th keyframe is stored (host-side
    feature clouds + pose); when a stored keyframe comes within
    ``detect_radius`` of a >= ``min_index_gap``-older stored keyframe, the
    pair is re-registered (posegraph.make_pair_registrar — async device
    program off the frame loop's critical path); accepted constraints
    (factor count + cost gates) enter a pose graph over the stored
    keyframe chain solved at end of run; the correction propagates to the
    full trajectory and the exported posegraph carries the loop edges."""

    enabled: bool = False
    #: store every Nth keyframe as a pose-graph node / loop candidate
    keyframe_stride: int = 4
    #: revisit gate: position proximity (m) + frame index gap
    detect_radius: float = 5.0
    min_index_gap: int = 60
    #: min frames between registration attempts (bounds device work when
    #: driving through an already-mapped region)
    attempt_every: int = 16
    #: cap on total registration attempts per run
    max_attempts: int = 128
    #: association+GN rounds per pair registration (fresh gather each
    #: round, so the pose can pull in across several association radii)
    register_rounds: int = 8
    #: acceptance gates on the registration result: total factor count and
    #: MEAN weighted squared residual (cost / factors) of the final round
    min_factors: int = 300
    max_cost: float = 0.02
    #: pose-graph information weights (residual order rot, trans) — proper
    #: information, unlike the reference's inverted g2o bytes (see
    #: io/export.save_posegraph_graph)
    rot_weight: float = 1000.0
    trans_weight: float = 100.0
    #: extra weight multiplier on loop edges vs odometry chain edges
    loop_weight_scale: float = 1.0
    #: GN iterations / damping of the final graph solve
    iters: int = 8
    damping: float = 1e-4


@dataclasses.dataclass(frozen=True)
class ExportConfig:
    """Trajectory/map export (reference: src/utils.cpp, odomEstimationNode.cpp:373-387)."""

    directory: Optional[str] = None
    output_downsample_size: float = 0.3
    #: merged + downsampled world map PCDs (SaveMerged — the reference
    #: writes these unconditionally at shutdown, odomEstimationNode.cpp:375)
    save_merged: bool = True
    #: reference node default save_BALM=true (odomEstimationNode.cpp:332)
    save_balm: bool = True
    save_posegraph: bool = False
    save_odom: bool = False


def _validate_candidate_budget(odom: OdomConfig) -> None:
    """Fail at config BUILD time (not at trace time) when the k-NN candidate
    count per query exceeds the packed-index selection budget
    (ops/voxelmap._MAX_IDX_BITS). Without this, broken presets ship silently
    and only crash when the first scan is traced."""
    from .ops import voxelmap  # deferred: keep config importable standalone

    radius = float(odom.nn_radius_sq) ** 0.5 + (
        0.0 if odom.gather_per_round else odom.assoc_margin)
    sides = (
        ("edge", odom.map_resolution, odom.map_edge_table,
         odom.map_edge_super),
        ("surf", 2.0 * odom.map_resolution, odom.map_surf_table,
         odom.map_surf_super),
    )
    for name, leaf, table, sup in sides:
        deltas, _ = voxelmap.sub_offset_tables(leaf, sup, radius, table)
        cands = deltas.shape[1] * voxelmap.way_block(sup ** 3)
        try:
            voxelmap._lane_bits(cands)
        except ValueError as e:
            raise ValueError(
                f"invalid OdomConfig ({name} map side, leaf {leaf:g} m, "
                f"supercell {sup}, search radius {radius:g} m): {e}"
            ) from None


@dataclasses.dataclass(frozen=True)
class FloamConfig:
    """Top-level engine configuration."""

    lidar: LidarConfig = dataclasses.field(default_factory=LidarConfig)
    features: FeatureConfig = dataclasses.field(default_factory=FeatureConfig)
    odom: OdomConfig = dataclasses.field(default_factory=OdomConfig)
    mapping: MappingConfig = dataclasses.field(default_factory=MappingConfig)
    deskew: DeskewConfig = dataclasses.field(default_factory=DeskewConfig)
    ba: BAConfig = dataclasses.field(default_factory=BAConfig)
    loop: LoopClosureConfig = dataclasses.field(
        default_factory=LoopClosureConfig)
    export: ExportConfig = dataclasses.field(default_factory=ExportConfig)

    def __post_init__(self):
        _validate_candidate_budget(self.odom)
        # the fused Pallas association kernel tiles queries in rows of 8
        # (ops/assoc_kernel.rank_scalars); catch bad capacities at config
        # build time, not deep inside a trace
        for name, v in (("scan_edge_capacity", self.odom.scan_edge_capacity),
                        ("scan_surf_capacity", self.odom.scan_surf_capacity),
                        ("ba.edge_budget", self.ba.edge_budget),
                        ("ba.surf_budget", self.ba.surf_budget)):
            if v % 8 != 0:
                raise ValueError(
                    f"{name}={v} must be a multiple of 8 (Pallas "
                    "association kernel tile height)")

    def replace(self, **kw) -> "FloamConfig":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def kitti_hdl64(**odom_kw) -> "FloamConfig":
        """KITTI odometry preset: HDL-64, no ring/time fields, no IMU."""
        return FloamConfig(
            lidar=LidarConfig.hdl64(min_distance=2.0, max_distance=60.0),
            odom=OdomConfig(map_resolution=0.4, **odom_kw),
        )

    @staticmethod
    def structor_vlp16(**odom_kw) -> "FloamConfig":
        """Indoor VLP-16 rig preset (launch/structor_odom.launch:9-41)."""
        return FloamConfig(
            lidar=LidarConfig.vlp16(min_distance=0.5, max_distance=90.0),
            odom=OdomConfig(map_resolution=0.1, deskew=True, **odom_kw),
            deskew=DeskewConfig(enabled=True),
        )
