"""One typed configuration covering the whole framework.

The reference scatters configuration across ROS launch params, public member
flags and hardcoded constants (SURVEY.md section 5.6); here everything lives
in nested frozen dataclasses so a run is reproducible from a single object
(and hashable, so configs can condition jit specialisation directly).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from cube_slam_wu_tpu.ops.detect import DetectConfig
from cube_slam_wu_tpu.ops.proposal import ProposalConfig


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole intrinsics (fx, fy, cx, cy). Defaults: TUM fr3
    (main_obj.cpp:484-486)."""

    fx: float = 535.4
    fy: float = 539.2
    cx: float = 320.1
    cy: float = 247.6
    width: int = 640
    height: int = 480

    def K(self):
        import numpy as np

        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """LM bundle-adjustment knobs (g2o OptimizationAlgorithmLevenberg
    analogue + our innovation gating extension)."""

    iterations_per_frame: int = 5  # graph.optimize(5), main_obj.cpp:803
    fix_first_frame: bool = True
    soft_gate_alpha: float | None = 2.0  # None = reference behaviour
    soft_gate_power: float = 1.0
    gate_threshold: float | None = None


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Multi-chip layout: keyframe-axis mesh for factor-sharded BA and
    data-parallel front-end batches."""

    mesh_axis: str = "kf"
    n_devices: int | None = None  # None = all available


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    camera: CameraConfig = CameraConfig()
    detect: DetectConfig = DetectConfig()
    proposal: ProposalConfig = ProposalConfig(nominal_skew_ratio=2.0)
    solver: SolverConfig = SolverConfig()
    sharding: ShardingConfig = ShardingConfig()
    online_detect_mode: bool = True  # launch param analogue
    save_results_to_txt: bool = True
    graph_capacity: int | None = None  # None = number of frames


TUM_FR3 = PipelineConfig()

DEMO_DETECT_3D = PipelineConfig(
    camera=CameraConfig(fx=529.5, fy=529.5, cx=365.0, cy=265.0),
    proposal=ProposalConfig(nominal_skew_ratio=1.0, sample_cam_roll_pitch=False),
)
