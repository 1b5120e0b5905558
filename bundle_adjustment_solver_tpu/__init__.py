"""bundle_adjustment_solver_tpu: a TPU-native bundle-adjustment engine.

Brand-new JAX/XLA/Pallas re-design of the capabilities of the C++ reference
ChanghyeonKim93/bundle_adjustment_solver: robust reprojection-error
minimization for full BA (SE(3) poses + 3-D landmarks, multi-camera rigs,
Schur-complement LM) and pose-only BA (mono/stereo x 6-DoF/planar-3-DoF),
batched/sharded for TPU meshes.
"""

from .options import (
    ConvergenceHandle,
    IterationHandle,
    IterationStatus,
    Options,
    OutlierHandle,
    SolverType,
    TrustRegionHandle,
)
from .summary import OptimizationInfo, Summary
from .models.camera import Camera, CameraRig, project, stereo_rig
from .solvers import pose_only

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraRig",
    "ConvergenceHandle",
    "IterationHandle",
    "IterationStatus",
    "Options",
    "OptimizationInfo",
    "OutlierHandle",
    "SolverType",
    "Summary",
    "TrustRegionHandle",
    "pose_only",
    "project",
    "stereo_rig",
]
