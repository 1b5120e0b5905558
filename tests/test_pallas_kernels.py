"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU).

The warp kernel is the deliberate analogue of the reference's AVX PointWarper
benchmarked by test/test_warp_simd.cpp; unlike the reference kernel it
applies the pose once (the AVX version double-applies it,
simd_library.cpp:82-97 -- SURVEY.md §2 quirk) and handles tails correctly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bundle_adjustment_solver_tpu.ops.pallas.pose_only_gn import (
    pack_problem_planes,
    pose_only_gn_stats,
)
from bundle_adjustment_solver_tpu.ops.pallas.warp import (
    from_planes,
    to_planes,
    warp_points,
)
from bundle_adjustment_solver_tpu.ops.projection import (
    pose_only_jacobian_6dof,
    residual_and_weight,
)


def _random_pose(rng):
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    return R.astype(np.float32), rng.normal(0, 0.3, 3).astype(np.float32)


class TestWarpKernel:
    @pytest.mark.parametrize("P", [1, 100, 8192, 10_000])
    def test_matches_dense_warp(self, rng, P):
        pts = rng.normal(0, 2, (P, 3)).astype(np.float32)
        R, t = _random_pose(rng)
        out = warp_points(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts), interpret=True
        )
        ref = pts @ R.T + t
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_plane_roundtrip(self, rng):
        pts = rng.normal(size=(777, 3)).astype(np.float32)
        x, y, z, P = to_planes(jnp.asarray(pts))
        back = from_planes(x, y, z, P)
        np.testing.assert_array_equal(np.asarray(back), pts)


class TestPoseOnlyGNKernel:
    def test_matches_jnp_path(self, rng):
        P = 5000
        pts = rng.normal(0, 2, (P, 3)).astype(np.float32)
        pts[:, 2] += 5
        R, t = _random_pose(rng)
        pix = rng.uniform(0, 640, (P, 2)).astype(np.float32)
        valid = rng.uniform(size=P) > 0.1  # include invalid rows

        x, y, z, pu, pv, vf, _ = pack_problem_planes(
            jnp.asarray(pts), jnp.asarray(pix), jnp.asarray(valid)
        )
        rt = jnp.asarray(np.concatenate([R, t[:, None]], axis=1))
        intr = jnp.asarray([338.0, 338.0, 320.0, 240.0], jnp.float32)
        JtWJ, g, cost = pose_only_gn_stats(
            rt, intr, x, y, z, pu, pv, vf, huber=1.0, interpret=True
        )

        Xc = pts @ R.T + t
        r, w, _ = residual_and_weight(
            jnp.asarray(Xc), jnp.asarray(pix), intr[0], intr[1], intr[2],
            intr[3], 1.0,
        )
        J = pose_only_jacobian_6dof(jnp.asarray(Xc), intr[0], intr[1])
        wv = w * jnp.asarray(valid, jnp.float32)
        Jw = J * wv[:, None, None]
        JtWJ_ref = jnp.einsum("pri,prj->ij", Jw, J)
        g_ref = jnp.einsum("pri,pr->i", Jw, r)
        cost_ref = jnp.sum(wv * (r[:, 0] ** 2 + r[:, 1] ** 2))
        # Entries that are near-zero by cancellation differ by reduction
        # order in f32; bound them relative to the matrix scale.
        scale = float(jnp.abs(JtWJ_ref).max())
        np.testing.assert_allclose(
            np.asarray(JtWJ), np.asarray(JtWJ_ref), rtol=2e-5,
            atol=1e-6 * scale,
        )
        g_scale = float(jnp.abs(g_ref).max())
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-5, atol=1e-6 * g_scale
        )
        np.testing.assert_allclose(float(cost), float(cost_ref), rtol=2e-5)


class TestPallasSolverPath:
    def test_mono_6dof_pallas_matches_xla_path(self):
        from bundle_adjustment_solver_tpu.options import (
            ConvergenceHandle,
            IterationHandle,
            Options,
            OutlierHandle,
        )
        from bundle_adjustment_solver_tpu.solvers import pose_only
        from bundle_adjustment_solver_tpu.utils.synthetic import (
            mono_pose_only_problem,
        )

        prob = mono_pose_only_problem(num_points=2000, seed=77)
        base = Options(
            convergence_handle=ConvergenceHandle(1e-6, 1e-6),
            outlier_handle=OutlierHandle(1.0, 2.5),
            iteration_handle=IterationHandle(50),
        )
        pose_x, mask_x, _, ok_x = pose_only.solve_monocular_6dof(
            prob.points, prob.pixels, prob.intrinsics, prob.pose_initial, base
        )
        pose_p, mask_p, _, ok_p = pose_only.solve_monocular_6dof(
            prob.points,
            prob.pixels,
            prob.intrinsics,
            prob.pose_initial,
            base.replace(pallas="interpret"),
        )
        assert ok_x and ok_p
        np.testing.assert_allclose(pose_p, pose_x, atol=1e-4)
        assert mask_p.all() == mask_x.all()


class TestPoseOnlyGNStereoKernel:
    def test_matches_jnp_path(self, rng):
        from bundle_adjustment_solver_tpu.ops.pallas.pose_only_gn import (
            pose_only_gn_stats_stereo,
        )

        P = 5000
        pts = rng.normal(0, 2, (P, 3)).astype(np.float32)
        pts[:, 2] += 5
        R, t = _random_pose(rng)
        pixl = rng.uniform(0, 640, (P, 2)).astype(np.float32)
        pixr = rng.uniform(0, 640, (P, 2)).astype(np.float32)
        valid = rng.uniform(size=P) > 0.1
        valid_r = valid & (rng.uniform(size=P) > 0.2)  # dropped right matches

        T_rl = np.eye(4, dtype=np.float32)
        T_rl[0, 3] = -0.12  # right <- left baseline
        R_rl, t_rl = T_rl[:3, :3], T_rl[:3, 3]

        x, y, z, pul, pvl, vl, _ = pack_problem_planes(
            jnp.asarray(pts), jnp.asarray(pixl), jnp.asarray(valid)
        )
        pur, pvr, vr = pack_problem_planes(
            jnp.asarray(pts), jnp.asarray(pixr), jnp.asarray(valid_r)
        )[3:6]
        rt = jnp.asarray(np.concatenate([R, t[:, None]], axis=1))
        rt_rl = jnp.asarray(np.concatenate([R_rl, t_rl[:, None]], axis=1))
        intr2 = jnp.asarray(
            [[338.0, 338.0, 320.0, 240.0], [340.0, 336.0, 321.0, 239.0]],
            jnp.float32,
        )
        JtWJ, g, cost = pose_only_gn_stats_stereo(
            rt, rt_rl, intr2, x, y, z, pul, pvl, vl, pur, pvr, vr,
            huber=1.0, interpret=True,
        )

        def cam_ref(Xc, pix, intr, v):
            r, w, _ = residual_and_weight(
                jnp.asarray(Xc), jnp.asarray(pix),
                intr[0], intr[1], intr[2], intr[3], 1.0,
            )
            J = pose_only_jacobian_6dof(jnp.asarray(Xc), intr[0], intr[1])
            wv = w * jnp.asarray(v, jnp.float32)
            Jw = J * wv[:, None, None]
            return (
                jnp.einsum("pri,prj->ij", Jw, J),
                jnp.einsum("pri,pr->i", Jw, r),
                jnp.sum(wv * (r[:, 0] ** 2 + r[:, 1] ** 2)),
            )

        Xl = pts @ R.T + t
        Xr = Xl @ R_rl.T + t_rl
        Hl, gl, cl = cam_ref(Xl, pixl, intr2[0], valid)
        Hr, gr, cr = cam_ref(Xr, pixr, intr2[1], valid_r)
        JtWJ_ref = Hl + Hr
        g_ref = gl + gr
        cost_ref = cl + cr

        scale = float(jnp.abs(JtWJ_ref).max())
        np.testing.assert_allclose(
            np.asarray(JtWJ), np.asarray(JtWJ_ref), rtol=2e-5,
            atol=1e-6 * scale,
        )
        g_scale = float(jnp.abs(g_ref).max())
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-5, atol=1e-6 * g_scale
        )
        np.testing.assert_allclose(float(cost), float(cost_ref), rtol=2e-5)


class TestPallasStereoSolverPath:
    def test_stereo_6dof_pallas_matches_xla_path(self):
        from bundle_adjustment_solver_tpu.options import (
            ConvergenceHandle,
            IterationHandle,
            Options,
            OutlierHandle,
        )
        from bundle_adjustment_solver_tpu.solvers import pose_only
        from bundle_adjustment_solver_tpu.utils.synthetic import (
            batched_stereo_pose_only_problem,
        )

        prob = batched_stereo_pose_only_problem(
            num_frames=1, points_per_frame=2000, seed=5, drop_right_frac=0.2
        )
        base = Options(
            convergence_handle=ConvergenceHandle(1e-6, 1e-6),
            outlier_handle=OutlierHandle(1.0, 2.5),
            iteration_handle=IterationHandle(50),
        )
        args = (
            prob.points[0], prob.pixels_left[0], prob.pixels_right[0],
            prob.intrinsics, prob.intrinsics, prob.pose_left_to_right,
            prob.poses_initial[0],
        )
        pose_x, ml_x, mr_x, _, ok_x = pose_only.solve_stereo_6dof(
            *args, base.replace(pallas="never")
        )
        pose_p, ml_p, mr_p, _, ok_p = pose_only.solve_stereo_6dof(
            *args, base.replace(pallas="interpret")
        )
        assert ok_x and ok_p
        np.testing.assert_allclose(pose_p, pose_x, atol=2e-5)
        assert (ml_p == ml_x).mean() > 0.99
        assert (mr_p == mr_x).mean() > 0.99
        # And the pallas path must recover the generator's truth.
        np.testing.assert_allclose(
            pose_p, prob.poses_true[0], atol=1e-3
        )


class TestFusedBatchedSolvers:
    """Frames-along-lanes fused batched drivers vs the vmapped XLA path."""

    def _problem(self, B=5, P=100, seed=3):
        from bundle_adjustment_solver_tpu.utils.synthetic import (
            batched_stereo_pose_only_problem,
        )

        return batched_stereo_pose_only_problem(
            num_frames=B, points_per_frame=P, seed=seed, drop_right_frac=0.15,
            pixel_noise=0.3,
        )

    def _opts(self, **kw):
        from bundle_adjustment_solver_tpu.options import (
            ConvergenceHandle,
            IterationHandle,
            Options,
            OutlierHandle,
        )

        return Options(
            convergence_handle=ConvergenceHandle(1e-7, 1e-7),
            outlier_handle=OutlierHandle(1.0, 2.5),
            iteration_handle=IterationHandle(40),
        ).replace(**kw)

    def test_batched_stereo_fused_matches_vmap(self):
        from bundle_adjustment_solver_tpu.solvers import pose_only

        prob = self._problem()
        B, P = prob.points.shape[:2]
        args = (
            jnp.asarray(prob.points, jnp.float32),
            jnp.asarray(prob.pixels_left, jnp.float32),
            jnp.asarray(prob.pixels_right, jnp.float32),
            jnp.ones((B, P), bool),
            jnp.asarray(prob.intrinsics, jnp.float32),
            jnp.asarray(prob.intrinsics, jnp.float32),
            jnp.asarray(prob.pose_left_to_right, jnp.float32),
            jnp.asarray(prob.poses_initial, jnp.float32),
        )
        ref = pose_only.solve_stereo_6dof_batched(
            *args, self._opts(pallas="never")
        )
        fused = pose_only.solve_stereo_6dof_batched(
            *args, self._opts(pallas="interpret")
        )
        assert bool(fused.success.all())
        np.testing.assert_allclose(
            np.asarray(fused.pose), np.asarray(ref.pose), atol=3e-5
        )
        # Row-wise SE(3) math rounds differently from the vmapped batched
        # matmuls; near a convergence threshold that can shift a frame's
        # stop point by one iteration (poses above still agree).
        assert (
            np.abs(
                np.asarray(fused.num_iterations, np.int64)
                - np.asarray(ref.num_iterations, np.int64)
            ).max()
            <= 1
        )
        np.testing.assert_array_equal(
            np.asarray(fused.converged), np.asarray(ref.converged)
        )
        assert (np.asarray(fused.mask_inlier)
                == np.asarray(ref.mask_inlier)).mean() > 0.99
        assert (np.asarray(fused.mask_inlier_right)
                == np.asarray(ref.mask_inlier_right)).mean() > 0.99
        # info rows: costs agree per frame on the common prefix
        ni = np.minimum(np.asarray(ref.num_info), np.asarray(fused.num_info))
        fi, ri = np.asarray(fused.info), np.asarray(ref.info)
        for b in range(B):
            np.testing.assert_allclose(
                fi[b, : ni[b], 0], ri[b, : ni[b], 0], rtol=2e-4
            )
        # debug pose traces agree on the common prefix
        nd = np.minimum(np.asarray(ref.num_debug), np.asarray(fused.num_debug))
        fd, rd = np.asarray(fused.debug_poses), np.asarray(ref.debug_poses)
        for b in range(B):
            np.testing.assert_allclose(
                fd[b, : nd[b]], rd[b, : nd[b]], atol=3e-5
            )

    def test_batched_mono_fused_matches_vmap(self):
        from bundle_adjustment_solver_tpu.solvers import pose_only

        prob = self._problem(B=4, P=120, seed=8)
        B, P = prob.points.shape[:2]
        args = (
            jnp.asarray(prob.points, jnp.float32),
            jnp.asarray(prob.pixels_left, jnp.float32),
            jnp.ones((B, P), bool),
            jnp.asarray(prob.intrinsics, jnp.float32),
            jnp.asarray(prob.poses_initial, jnp.float32),
        )
        ref = pose_only.solve_monocular_6dof_batched(
            *args, self._opts(pallas="never")
        )
        fused = pose_only.solve_monocular_6dof_batched(
            *args, self._opts(pallas="interpret")
        )
        assert bool(fused.success.all())
        np.testing.assert_allclose(
            np.asarray(fused.pose), np.asarray(ref.pose), atol=3e-5
        )
        assert (
            np.abs(
                np.asarray(fused.num_iterations, np.int64)
                - np.asarray(ref.num_iterations, np.int64)
            ).max()
            <= 1
        )
        assert (np.asarray(fused.mask_inlier)
                == np.asarray(ref.mask_inlier)).mean() > 0.99

    def test_batched_fused_history_off(self):
        from bundle_adjustment_solver_tpu.solvers import pose_only

        prob = self._problem(B=3, P=64, seed=2)
        B, P = prob.points.shape[:2]
        args = (
            jnp.asarray(prob.points, jnp.float32),
            jnp.asarray(prob.pixels_left, jnp.float32),
            jnp.asarray(prob.pixels_right, jnp.float32),
            jnp.ones((B, P), bool),
            jnp.asarray(prob.intrinsics, jnp.float32),
            jnp.asarray(prob.intrinsics, jnp.float32),
            jnp.asarray(prob.pose_left_to_right, jnp.float32),
            jnp.asarray(prob.poses_initial, jnp.float32),
        )
        full = pose_only.solve_stereo_6dof_batched(
            *args, self._opts(pallas="interpret")
        )
        slim = pose_only.solve_stereo_6dof_batched(
            *args, self._opts(pallas="interpret", record_history=False)
        )
        np.testing.assert_array_equal(
            np.asarray(slim.pose), np.asarray(full.pose)
        )
        assert slim.info.shape[1] == 1
        assert slim.debug_poses.shape[1] == 1


class TestFusedBatchedPlanarSolvers:
    """Planar 3-DoF frames-along-lanes fused drivers vs the vmapped path."""

    def _batch(self, stereo, B=4):
        from tests.test_pose_only import TestPlanar3Dof

        tp = TestPlanar3Dof()
        probs = [
            tp._make_problem(stereo=stereo, seed=10 + b) for b in range(B)
        ]
        stack = lambda k: jnp.asarray(
            np.stack([p[k] for p in probs]), jnp.float32
        )
        return probs, stack

    def test_planar_mono_fused_matches_vmap(self):
        from bundle_adjustment_solver_tpu.solvers import pose_only
        from tests.test_pose_only import make_options

        probs, stack = self._batch(stereo=False)
        B = len(probs)
        pts = stack("points")
        args = (
            pts,
            stack("pixels"),
            jnp.ones(pts.shape[:2], bool),
            jnp.asarray(probs[0]["intrinsics"], jnp.float32),
            jnp.asarray(probs[0]["base_to_camera"], jnp.float32),
            stack("T_wlast"),
            stack("T_wc_init"),
        )
        opts = make_options(max_iter=60)
        ref = pose_only.solve_monocular_planar3dof_batched(
            *args, opts.replace(pallas="never")
        )
        fused = pose_only.solve_monocular_planar3dof_batched(
            *args, opts.replace(pallas="interpret")
        )
        assert bool(fused.success.all())
        np.testing.assert_allclose(
            np.asarray(fused.pose), np.asarray(ref.pose), atol=3e-5
        )
        np.testing.assert_array_equal(
            np.asarray(fused.num_iterations), np.asarray(ref.num_iterations)
        )
        for b, p in enumerate(probs):
            assert (
                np.abs(np.asarray(fused.pose[b]) - p["T_wc_true"]).max()
                < 1e-3
            )

    def test_planar_stereo_fused_matches_vmap(self):
        from bundle_adjustment_solver_tpu.solvers import pose_only
        from tests.test_pose_only import make_options

        probs, stack = self._batch(stereo=True)
        B = len(probs)
        pts = stack("points")
        intr = jnp.asarray(probs[0]["intrinsics"], jnp.float32)
        args = (
            pts,
            stack("pixels"),
            stack("pixels_right"),
            jnp.ones(pts.shape[:2], bool),
            intr,
            intr,
            jnp.asarray(probs[0]["base_to_camera"], jnp.float32),
            jnp.asarray(probs[0]["T_lr"], jnp.float32),
            stack("T_wlast"),
            stack("T_wc_init"),
        )
        opts = make_options(max_iter=60)
        ref = pose_only.solve_stereo_planar3dof_batched(
            *args, opts.replace(pallas="never")
        )
        fused = pose_only.solve_stereo_planar3dof_batched(
            *args, opts.replace(pallas="interpret")
        )
        assert bool(fused.success.all())
        np.testing.assert_allclose(
            np.asarray(fused.pose), np.asarray(ref.pose), atol=3e-5
        )
        np.testing.assert_array_equal(
            np.asarray(fused.num_iterations), np.asarray(ref.num_iterations)
        )
        for b, p in enumerate(probs):
            assert (
                np.abs(np.asarray(fused.pose[b]) - p["T_wc_true"]).max()
                < 1e-3
            )
