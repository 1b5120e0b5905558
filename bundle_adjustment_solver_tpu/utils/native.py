"""ctypes bindings for the native problem compiler (csrc/problem_compiler.cpp).

Builds the shared library on first use (g++ -O3 -shared) into the package's
`_native` directory; every entry point has a pure-numpy fallback so the
package works without a toolchain. See csrc/problem_compiler.cpp for what
each routine replaces in the reference.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

# Contract version this wrapper was written against (csrc ba_abi_version).
# A cached .so reporting anything else -- e.g. a stale build in a read-only
# checkout where the mtime rebuild couldn't run -- is REJECTED outright and
# every entry point uses its numpy fallback: running an old binary against
# new calling conventions (like the pre-duplicate-detection ba_pm_fill)
# would silently corrupt problems rather than fail.
_ABI_VERSION = 2


def _source_path() -> pathlib.Path:
    return (
        pathlib.Path(__file__).resolve().parents[2] / "csrc" /
        "problem_compiler.cpp"
    )


def _lib_path() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent / "_native" / "libbacompile.so"


def _build() -> pathlib.Path | None:
    src = _source_path()
    out = _lib_path()
    if not src.exists():
        return None
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    base = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(out),
    ]
    # OpenMP parallelizes the per-point fill loop (~num_cores x at 12M
    # observations); fall back to a serial build where unavailable.
    for cmd in (base + ["-fopenmp"], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return out
        except Exception:
            continue
    return None


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None or not path.exists():
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        try:
            lib.ba_abi_version.restype = ctypes.c_int64
            version = int(lib.ba_abi_version())
        except AttributeError:
            version = 1  # pre-versioning builds
        if version != _ABI_VERSION:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.ba_sort_by_segments.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p
        ]
        lib.ba_sort_by_segments.restype = ctypes.c_int
        lib.ba_connectivity.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p,
        ]
        lib.ba_connectivity.restype = ctypes.c_int
        lib.ba_partition_landmarks.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p
        ]
        lib.ba_partition_landmarks.restype = ctypes.c_int
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ba_pm_probe.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p,
        ]
        lib.ba_pm_probe.restype = ctypes.c_int64
        lib.ba_pm_fill.argtypes = [
            i32p, i32p, i32p, f64p, f64p, i32p, u8p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, f32p, i32p, i32p, f32p, i32p,
        ]
        lib.ba_pm_fill.restype = ctypes.c_int
        lib.ba_finalize_obs.argtypes = [
            i32p, i32p, i32p, i32p, i32p, f64p, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, f64p, i32p, i32p,
        ]
        lib.ba_finalize_obs.restype = ctypes.c_int
        lib.ba_pm_windows.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p, i32p,
        ]
        lib.ba_pm_windows.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def _i32(a: np.ndarray):
    return np.ascontiguousarray(a, dtype=np.int32)


def sort_by_segments(
    point_opt: np.ndarray,
    pose_opt: np.ndarray,
    num_point_keys: int,
    num_pose_keys: int,
) -> np.ndarray:
    """Stable sort order by (point_opt, pose_opt). Native counting sort when
    available; numpy lexsort fallback."""
    lib = get_lib()
    n = point_opt.shape[0]
    if lib is not None and n > 0:
        po = _i32(point_opt)
        ps = _i32(pose_opt)
        order = np.empty(n, dtype=np.int64)
        rc = lib.ba_sort_by_segments(
            po.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            num_point_keys,
            num_pose_keys,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc == 0:
            return order
    return np.lexsort((pose_opt, point_opt))


def connectivity(
    obs_pose: np.ndarray,
    obs_point: np.ndarray,
    num_poses: int,
    num_points: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(points_per_pose, poses_per_point) unique-pair counts
    (reference CheckPoseAndPointConnectivity data, full cpp:310-341)."""
    lib = get_lib()
    n = obs_pose.shape[0]
    if lib is not None and n > 0:
        op = _i32(obs_pose)
        oi = _i32(obs_point)
        ppp = np.zeros(num_poses, dtype=np.int32)
        ppt = np.zeros(num_points, dtype=np.int32)
        rc = lib.ba_connectivity(
            op.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            oi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            num_poses,
            num_points,
            ppp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ppt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return ppp, ppt
    pairs = np.unique(
        np.stack([obs_pose, obs_point], axis=-1), axis=0
    )
    ppp = np.bincount(pairs[:, 0], minlength=num_poses).astype(np.int32)
    ppt = np.bincount(pairs[:, 1], minlength=num_points).astype(np.int32)
    return ppp, ppt


def pm_probe(
    obs_pose: np.ndarray, obs_point: np.ndarray, num_points: int,
    num_poses: int,
) -> tuple[int, np.ndarray, np.ndarray] | None:
    """Native per-point (unique-pose slot count, min observing pose) probe
    for the point-major layout builder. Returns (kp_max, slot_count,
    min_pose) or None when the native library is unavailable."""
    lib = get_lib()
    n = obs_pose.shape[0]
    if lib is None or n == 0:
        return None
    op = _i32(obs_pose)
    oi = _i32(obs_point)
    slot_count = np.empty(num_points, dtype=np.int32)
    min_pose = np.empty(num_points, dtype=np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    kp_max = lib.ba_pm_probe(
        op.ctypes.data_as(i32p), oi.ctypes.data_as(i32p), n, num_points,
        num_poses, slot_count.ctypes.data_as(i32p),
        min_pose.ctypes.data_as(i32p),
    )
    if kp_max < 0:
        return None
    return int(kp_max), slot_count, min_pose


# Sentinel: ba_pm_fill found a duplicate (point, pose, camera) observation;
# the point-major layout cannot represent it (one cell per slot-camera), so
# the caller must fall back to the observation-table engine.
DUPLICATE_OBSERVATION = object()


def pm_fill(
    obs_pose, obs_point, obs_cam, obs_pixel, points, pose_opt_of,
    point_is_opt, rank_of_point, n_opt: int, num_cams: int, kp: int, mp: int,
):
    """Native scatter of observations into the padded cam-major planes.

    Returns (obs_f32, slot_pose, slot_opt, X, point_ref) -- obs_f32 is the
    (3*kp*num_cams, mp) stack of [u, v, valid] planes the kernels consume,
    filled in place (no separate concatenate copy) -- or
    DUPLICATE_OBSERVATION when the observation list repeats a (point, pose,
    camera) triple, or None when the native library is unavailable."""
    lib = get_lib()
    n = obs_pose.shape[0]
    num_points = points.shape[0]
    num_poses = pose_opt_of.shape[0]
    if lib is None or n == 0:
        return None
    op = _i32(obs_pose)
    oi = _i32(obs_point)
    oc = _i32(obs_cam)
    pix = np.ascontiguousarray(obs_pixel, dtype=np.float64)
    pts = np.ascontiguousarray(points, dtype=np.float64)
    poo = _i32(pose_opt_of)
    pio = np.ascontiguousarray(point_is_opt, dtype=np.uint8)
    rop = _i32(rank_of_point)

    kc = kp * num_cams
    obs_f32 = np.zeros((3 * kc, mp), dtype=np.float32)
    u = obs_f32[:kc]  # contiguous row-slice views share the one buffer
    v = obs_f32[kc:2 * kc]
    valid = obs_f32[2 * kc:]
    slot_pose = np.zeros((kp, mp), dtype=np.int32)
    slot_opt = np.full((kp, mp), -1, dtype=np.int32)
    X = np.zeros((4, mp), dtype=np.float32)
    point_ref = np.full(mp, -1, dtype=np.int32)

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.ba_pm_fill(
        op.ctypes.data_as(i32p), oi.ctypes.data_as(i32p),
        oc.ctypes.data_as(i32p), pix.ctypes.data_as(f64p),
        pts.ctypes.data_as(f64p), poo.ctypes.data_as(i32p),
        pio.ctypes.data_as(u8p), rop.ctypes.data_as(i32p),
        n, num_points, num_poses, n_opt, num_cams, kp, mp,
        u.ctypes.data_as(f32p), v.ctypes.data_as(f32p),
        valid.ctypes.data_as(f32p), slot_pose.ctypes.data_as(i32p),
        slot_opt.ctypes.data_as(i32p), X.ctypes.data_as(f32p),
        point_ref.ctypes.data_as(i32p),
    )
    if rc == -4:
        return DUPLICATE_OBSERVATION
    if rc != 0:
        return None
    return obs_f32, slot_pose, slot_opt, X, point_ref


def finalize_obs(point_opt, pose_opt, cam, pose, point, pixel,
                 pixel_scale: float, num_point_keys: int,
                 num_pose_keys: int):
    """Fused stable sort-by-(point_opt, pose_opt) + permute of the whole
    observation table, with the pixel scale folded in. Returns
    (cam, pose, point, pixel_scaled, pose_opt, point_opt) already sorted,
    or None when the native library is unavailable (callers run the
    sort_by_segments + fancy-index path instead)."""
    lib = get_lib()
    n = int(point_opt.shape[0])
    if lib is None or n == 0:
        return None
    po = _i32(point_opt)
    ps = _i32(pose_opt)
    ca = _i32(cam)
    pj = _i32(pose)
    pi = _i32(point)
    px = np.ascontiguousarray(pixel, dtype=np.float64)
    cam_o = np.empty(n, dtype=np.int32)
    pose_o = np.empty(n, dtype=np.int32)
    point_o = np.empty(n, dtype=np.int32)
    pixel_o = np.empty((n, 2), dtype=np.float64)
    pose_opt_o = np.empty(n, dtype=np.int32)
    point_opt_o = np.empty(n, dtype=np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    rc = lib.ba_finalize_obs(
        po.ctypes.data_as(i32p), ps.ctypes.data_as(i32p),
        ca.ctypes.data_as(i32p), pj.ctypes.data_as(i32p),
        pi.ctypes.data_as(i32p), px.ctypes.data_as(f64p),
        float(pixel_scale), n, num_point_keys, num_pose_keys,
        cam_o.ctypes.data_as(i32p), pose_o.ctypes.data_as(i32p),
        point_o.ctypes.data_as(i32p), pixel_o.ctypes.data_as(f64p),
        pose_opt_o.ctypes.data_as(i32p), point_opt_o.ctypes.data_as(i32p),
    )
    if rc != 0:
        return None
    return cam_o, pose_o, point_o, pixel_o, pose_opt_o, point_opt_o


def pm_windows(slot_pose, slot_opt, valid_plane, kp: int, num_cams: int,
               mp: int, bm: int):
    """Native per-block gather-window reduction (raw min/max values).

    Returns (gmin, gmax, smin, smax) int32 (nblocks,) arrays -- empty blocks
    carry gmin=INT32_MAX/gmax=-1 (resp. smin/smax) exactly like the numpy
    reduction -- or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or mp % bm != 0:
        return None
    sp = _i32(slot_pose)
    so = _i32(slot_opt)
    vp = np.ascontiguousarray(valid_plane, dtype=np.float32)
    nblocks = mp // bm
    gmin = np.empty(nblocks, dtype=np.int32)
    gmax = np.empty(nblocks, dtype=np.int32)
    smin = np.empty(nblocks, dtype=np.int32)
    smax = np.empty(nblocks, dtype=np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.ba_pm_windows(
        sp.ctypes.data_as(i32p), so.ctypes.data_as(i32p),
        vp.ctypes.data_as(f32p), kp, num_cams, mp, bm,
        gmin.ctypes.data_as(i32p), gmax.ctypes.data_as(i32p),
        smin.ctypes.data_as(i32p), smax.ctypes.data_as(i32p),
    )
    if rc != 0:
        return None
    return gmin, gmax, smin, smax


def partition_landmarks(
    obs_per_point: np.ndarray, total_obs: int, num_shards: int
) -> np.ndarray:
    """(num_shards + 1,) contiguous, observation-balanced point-id cuts."""
    lib = get_lib()
    m = obs_per_point.shape[0]
    if lib is not None:
        opp = np.ascontiguousarray(obs_per_point, dtype=np.int64)
        out = np.empty(num_shards + 1, dtype=np.int64)
        rc = lib.ba_partition_landmarks(
            opp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            m,
            total_obs,
            num_shards,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc == 0:
            return out
    boundaries = [0]
    target = total_obs / num_shards
    acc = 0
    for pid in range(m):
        acc += int(obs_per_point[pid])
        if acc >= target * len(boundaries) and len(boundaries) < num_shards:
            boundaries.append(pid + 1)
    while len(boundaries) < num_shards:
        boundaries.append(m)
    boundaries.append(m)
    return np.asarray(boundaries, dtype=np.int64)
