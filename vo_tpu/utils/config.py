"""Typed configuration tree.

The reference configures itself through four module-level constants
(main.py:44-47) plus constructor-kwarg sprawl across every class
(harris.py:16-25, klt.py:23-39, triangulation.py:17-36, p3p.py:14-49,
state.py:8, loader.py:23-31) — its report names RANSAC parameter
sensitivity as a top pain point. Here every knob lives in one frozen
(hashable) dataclass tree so a config can be a static jit argument, and the
defaults reproduce the reference's operating point.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Keypoint detection (ref: harris.py:16-34, klt.py:23-27)."""

    method: str = "shi_tomasi"  # "shi_tomasi" | "harris"
    patch_size: int = 7  # structure-tensor window (ref klt blockSize=7)
    kappa: float = 0.08  # harris kappa (ref harris.py:19 uses 0.09/0.08)
    nms_radius: int = 8  # ref klt minDistance=8 / harris nms_radius=5
    border: int = 16
    quality_level: float = 0.01  # ref klt.py:25
    # Harris-mode overrides (tracker="harris"). The Harris response scales
    # as gradient^4 while Shi-Tomasi's min-eig scales as gradient^2, so the
    # 0.01 quality floor calibrated for Shi-Tomasi starves Harris detection
    # (measured on the headline sequence: 89 corners vs 429 at 2e-4 — the
    # r4 harris-mode map never exceeded ~35 landmarks and limped at 4-6 PnP
    # inliers). nms radius 5 matches the reference (harris.py:21).
    harris_quality_level: float = 2e-4
    harris_nms_radius: int = 5
    min_dist_to_live: float = 8.0  # suppression radius vs existing tracks
    # Fused Pallas response+NMS kernel: True/False force it, None = auto
    # (use it on TPU, XLA path elsewhere).
    use_pallas: bool | None = None


@dataclasses.dataclass(frozen=True)
class DescriptorConfig:
    """Patch-descriptor matching (ref: harris.py:26-34, 196-262)."""

    radius: int = 9  # (2r+1)^2-pixel patch (ref descriptor_radius=9)
    ratio: float = 0.85  # Lowe ratio (ref match_lambda-era 0.85 / sift 0.8)
    # Spatial gate on match displacement between consecutive frames. True
    # flow on the headline sequence is 2-8 px (up to ~20 px during the 90
    # degree turns); 32 px covers that with margin while excluding the
    # repetitive-facade lookalikes that pollute the ratio test at 100 px
    # (measured f150: 391 matches/79% consistent at 32 vs 293/67% at 100).
    max_move_px: float = 32.0
    # Same opt-in miss grace period as SiftConfig.max_miss — measured
    # harmful as a default (see there); 0 keeps the die-on-first-miss
    # semantics of the reference's Matches model.
    max_miss: int = 0


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """DoG front-end (ref: sift.py:8-21 via cv2.SIFT_create)."""

    num_octaves: int = 3
    scales_per_octave: int = 3
    contrast_threshold: float = 0.02
    edge_ratio: float = 10.0
    ratio: float = 0.8  # ref sift.py:45
    # Spatial match gate. Tighter wins decisively for DoG features on the
    # headline sequence (r5 sweep, 150 frames on-chip: ATE 0.115 m /
    # 116 med PnP inliers at 40 px vs 0.834 m / 72 at 100 px) — DoG
    # lookalikes at distance pollute the ratio test exactly like the
    # harris case, and 40 px still covers turn-rate flow (~20 px/frame).
    max_move_px: float = 40.0
    # Frames a slot may coast un-redetected before its track is freed
    # (coasting slots keep identity but are excluded from PnP/triangulation
    # — their xy is stale). MEASURED HARMFUL as a default (r5): sift
    # full-length ATE 23.9 m at max_miss=3 vs 15.6 m at 0, and harris
    # 0.87 m vs 0.55 m through the first turn — the widened rematch gate
    # admits lookalikes that corrupt track identity, costing more than the
    # grace saves. Kept as an opt-in knob; 0 = die on first miss (the
    # reference's Matches semantics).
    max_miss: int = 0


@dataclasses.dataclass(frozen=True)
class KLTConfig:
    """Pyramidal LK (ref: klt.py:29-39)."""

    pyramid_levels: int = 4  # one deeper than ref maxLevel=2: turn-rate flow
    radius: int = 8  # 17x17 window
    max_iters: int = 10
    eps: float = 0.03
    max_err: float = 25.0
    min_eig_threshold: float = 1e-4
    # Seed LK with constant-velocity-model flow (rotation via the infinite
    # homography, depth via landmarks) — extends capture range during fast
    # turns far beyond the pyramid's reach.
    predict_motion: bool = True
    # Pallas DMA patch gather: True/False force, None = auto (TPU only).
    use_pallas: bool | None = None


@dataclasses.dataclass(frozen=True)
class BootstrapConfig:
    """Two-view initialization (ref: main.py:185-193, 204-216)."""

    frame_gap: int = 2  # bootstrap on frames 0 and 2 (main.py:207)
    inlier_threshold_px: float = 1.0  # Sampson px (ref uses algebraic 0.25)
    num_hypotheses: int = 512
    min_inliers: int = 30


@dataclasses.dataclass(frozen=True)
class PnPConfig:
    """RANSAC-P3P localization (ref: main.py:194-201, p3p.py:14-49)."""

    inlier_threshold_px: float = 1.25
    num_hypotheses: int = 256
    refine_iters: int = 10
    min_inliers: int = 8


@dataclasses.dataclass(frozen=True)
class RecoveryConfig:
    """Lost-pose recovery (new capability — the reference assert-crashes on
    PnP failure, p3p.py:153, and its report documents the unrecoverable
    'vicious circle' on Malaga, Report 3.1.2).

    When PnP fails, the prev->curr relative pose is re-estimated visually
    from the current frame's 2D-2D tracks (8-point RANSAC -> E ->
    cheirality vote, the bootstrap machinery) and the unit translation is
    scaled by the constant-velocity speed. This keeps the rotation locked
    to the imagery — a pure constant-velocity fallback compounds rotation
    error during turns until every pose gate fails permanently."""

    enabled: bool = True
    num_hypotheses: int = 256
    inlier_threshold_px: float = 1.0
    min_inliers: int = 30


@dataclasses.dataclass(frozen=True)
class TriangulationConfig:
    """Continuous candidate triangulation (ref: state.py:8, 90-160)."""

    bearing_threshold: float = 0.0075  # rad (state.py:8)
    min_depth: float = 0.5
    max_depth: float = 200.0
    max_reproj_px: float = 2.0


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Sliding-window bundle adjustment (new capability — the reference
    names it as future work, Report §3.1.1)."""

    enabled: bool = True
    window: int = 6  # keyframes in the window
    # True: ba_refine runs inside vo_step at every keyframe push (the
    # single-chip deployment). False: keyframes are still pushed and
    # landmarks written back, but the REFINEMENT is left to an external
    # backend — the sequence-parallel composed-window deployment
    # (run_multiseq --seqpar-shards): per-device budget holds only the obs
    # arrays, and seqpar_ba_refine refines the composed window across the
    # mesh between rollout chunks (parallel/window_blocks.py).
    refine_in_step: bool = True
    # Frames between keyframes (mode "every"). The r4 sweep on the 600-frame
    # headline (TPU v5e, EVAL.md "BA window/cadence sweep") measured
    # every=2 strictly better than the old default 3 on ALL accuracy
    # metrics (ATE 1.18 vs 1.45 m, RPE 0.0215 vs 0.0298 m, rot 0.051 vs
    # 0.075 deg) for ~20% fps — a denser window span samples turns better;
    # window 8 and 8+every2 were both worse (over-wide span weakens the
    # fixed-scale gauge).
    keyframe_every: int = 2
    # Keyframe policy. "every": fixed cadence (the validated default —
    # ATE 1.18 m on the 600-frame headline run; see EVAL.md. The older
    # "0.78 m" figure was a r2 gather-artifact, root-caused in r4).
    # "adaptive": motion/covisibility-gated selection — push when the
    # baseline since the last keyframe is significant relative to scene
    # depth, the camera has rotated, or map overlap with the newest
    # keyframe has decayed; always within [min_gap, max_gap] frames.
    # Keyframes carry information ∝ parallax, not ∝ time: fixed cadence
    # wastes BA iterations on near-identical views when slow/stopped and
    # under-samples fast turns — use "adaptive" on stop-and-go footage.
    # The r2 default flip to "adaptive" regressed headline ATE 3.3x
    # (tools/ablate_keyframes.py records the evidence); it stays opt-in
    # until its gates beat fixed cadence on the no-stop sequence too.
    keyframe_mode: str = "every"
    min_gap: int = 3  # never two keyframes closer than this (frames)
    max_gap: int = 9  # force a keyframe at least this often (while moving)
    # baseline / mean tri depth. Tuned so normal driving (0.3 m/frame at
    # ~20 m scene depth) pushes at gap 3 (0.045 >= 0.04) but not gap 2
    # (0.03 < 0.04) — the r2 value 0.012 fired at every min_gap, halving
    # the window's physical span and regressing headline ATE 3.3x
    # (tools/ablate_keyframes.py).
    min_baseline_ratio: float = 0.04
    min_rotation_rad: float = 0.03  # ~1.7 deg since last keyframe
    min_covisibility: float = 0.6  # overlap with newest keyframe
    iters: int = 5  # GN iterations per refinement
    damping: float = 1e-3
    huber_px: float = 2.0


@dataclasses.dataclass(frozen=True)
class VOConfig:
    """Top-level pipeline config. Hashable -> usable as a static jit arg."""

    capacity: int = 1024  # fixed feature-table slots (ref num_keypoints=1000)
    # Brown-Conrady (k1, k2, p1, p2, k3). Non-zero -> every geometric
    # consumer (PnP, epipolar, triangulation, BA) sees undistorted
    # observations while tracking stays in raw image space. The reference
    # declares but stubs this (camera.py:38-54); all its datasets are
    # rectified, so (0,)*5 reproduces its behavior exactly.
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)
    # Front-end mode, mirroring the reference's Tracker dispatch
    # (tracker.py:17-63): "klt" | "harris" | "sift".
    tracker: str = "klt"
    detector: DetectorConfig = dataclasses.field(default_factory=DetectorConfig)
    klt: KLTConfig = dataclasses.field(default_factory=KLTConfig)
    descriptor: DescriptorConfig = dataclasses.field(default_factory=DescriptorConfig)
    sift: SiftConfig = dataclasses.field(default_factory=SiftConfig)
    bootstrap: BootstrapConfig = dataclasses.field(default_factory=BootstrapConfig)
    pnp: PnPConfig = dataclasses.field(default_factory=PnPConfig)
    recovery: RecoveryConfig = dataclasses.field(default_factory=RecoveryConfig)
    triangulation: TriangulationConfig = dataclasses.field(
        default_factory=TriangulationConfig
    )
    ba: BAConfig = dataclasses.field(default_factory=BAConfig)

    def replace(self, **kw) -> "VOConfig":
        return dataclasses.replace(self, **kw)

    @property
    def desc_dim(self) -> int:
        """Descriptor lane width of the feature table for this tracker mode
        (1 = unused dummy lane for KLT)."""
        if self.tracker == "harris":
            return (2 * self.descriptor.radius + 1) ** 2
        if self.tracker == "sift":
            return 128
        return 1
