"""Abstract solver interface + factory.

Reference parity: the `programming_pattern/` design sketch -- a pure-virtual
`FullBundleAdjustmentSolver` interface with Register*/Fix*/Solve methods and
factory-style instantiation of pluggable backends
(programming_pattern/full_bundle_adjustment_solver.h:9-25,
programming_pattern/main_factory_pattern.cpp:8). Here the two registered
backends are the analytic TPU engine and the autodiff oracle.
"""

from __future__ import annotations

import abc

import numpy as np


class BundleAdjustmentSolverInterface(abc.ABC):
    """The pluggable-solver interface (programming_pattern parity)."""

    @abc.abstractmethod
    def register_camera(self, camera_index, camera): ...

    @abc.abstractmethod
    def register_world_to_body_pose(self, pose_id, pose): ...

    @abc.abstractmethod
    def register_world_point(self, point_id, point): ...

    @abc.abstractmethod
    def fix_registered_pose(self, pose_id): ...

    @abc.abstractmethod
    def fix_registered_point(self, point_id): ...

    @abc.abstractmethod
    def add_point_observation(self, camera_index, pose_id, point_id, pixel): ...

    @abc.abstractmethod
    def solve(self, options): ...


class _OracleBackend(BundleAdjustmentSolverInterface):
    """Autodiff oracle behind the common interface (the 'ceres' analogue of
    programming_pattern's second implementation)."""

    def __init__(self):
        from .models.problem import FullBundleAdjustmentSolver

        self._builder = FullBundleAdjustmentSolver()

    def register_camera(self, camera_index, camera):
        self._builder.add_camera(camera_index, camera)

    def register_world_to_body_pose(self, pose_id, pose):
        self._builder.add_pose(pose_id, pose)

    def register_world_point(self, point_id, point):
        self._builder.add_point(point_id, point)

    def fix_registered_pose(self, pose_id):
        self._builder.make_pose_fixed(pose_id)

    def fix_registered_point(self, point_id):
        self._builder.make_point_fixed(point_id)

    def add_point_observation(self, camera_index, pose_id, point_id, pixel):
        self._builder.add_observation(camera_index, pose_id, point_id, pixel)

    def solve(self, options):
        from .solvers.oracle import full_ba_oracle

        b = self._builder
        poses0 = np.stack([b._poses[p] for p in b._pose_ids])
        points0 = np.stack([b._points[p] for p in b._point_ids])
        fixed_pose = np.asarray(
            [p in b._fixed_poses for p in b._pose_ids], dtype=bool
        )
        fixed_point = np.asarray(
            [p in b._fixed_points for p in b._point_ids], dtype=bool
        )
        pose_index = {pid: k for k, pid in enumerate(b._pose_ids)}
        point_index = {pid: k for k, pid in enumerate(b._point_ids)}
        # Oracle cannot constrain never-observed free points.
        observed = np.zeros(len(b._point_ids), dtype=bool)
        observed[[point_index[p] for p in b._obs_point]] = True
        poses, points, cost = full_ba_oracle(
            [b._cameras[k] for k in sorted(b._cameras)],
            poses0,
            points0,
            np.asarray([0 if c is None else c for c in b._obs_cam]),
            np.asarray([pose_index[p] for p in b._obs_pose]),
            np.asarray([point_index[p] for p in b._obs_point]),
            np.stack(b._obs_pixel),
            fixed_pose_mask=fixed_pose,
            fixed_point_mask=fixed_point | ~observed,
            max_nfev=options.iteration_handle.max_num_iterations,
        )
        b._solved_poses = poses
        b._solved_points = points
        return cost

    def get_pose(self, pose_id):
        return self._builder.get_pose(pose_id)

    def get_point(self, point_id):
        return self._builder.get_point(point_id)


def create_solver(backend: str = "analytic") -> BundleAdjustmentSolverInterface:
    """Factory (programming_pattern/main_factory_pattern.cpp:8):
    'analytic' -> the TPU engine; 'oracle' -> the autodiff stand-in."""
    if backend == "analytic":
        from .models.problem import FullBundleAdjustmentSolver

        return FullBundleAdjustmentSolver()  # implements the same surface
    if backend == "oracle":
        return _OracleBackend()
    raise ValueError(f"unknown solver backend: {backend!r}")


BundleAdjustmentSolverInterface.register(
    __import__(
        "bundle_adjustment_solver_tpu.models.problem",
        fromlist=["FullBundleAdjustmentSolver"],
    ).FullBundleAdjustmentSolver
)
