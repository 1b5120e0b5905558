// Native problem compiler for bundle_adjustment_solver_tpu.
//
// Host-side runtime work that sits between user registration and the static
// device arrays the TPU solvers consume. The reference does the equivalent
// in C++ with pointer-keyed hash maps and serial passes
// (FinalizeParameters / SetProblemSize / connectivity maps,
// core/full_bundle_adjustment_solver.cpp:182-341, 669-700); at millions of
// observations these passes dominate setup time in Python, so they are
// native here too:
//
//   ba_sort_by_segments     -- stable counting sort of observations by
//                              (point_opt, pose_opt): the segment layout
//                              every downstream segment_sum relies on.
//   ba_connectivity         -- unique-pair counts: points seen per pose and
//                              poses seeing each point (the reference's
//                              CheckPoseAndPointConnectivity warning data).
//   ba_partition_landmarks  -- contiguous observation-balanced landmark
//                              partition for the multi-device sharding.
//
// Compiled as a plain C shared library (no pybind11 in this image); loaded
// via ctypes with a pure-numpy fallback (see utils/native.py).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Stable counting sort of [0, n) observation rows by key
// point_opt * (num_pose_keys) + pose_opt. Keys must be in range
// (point_opt <= num_point_keys-1, pose_opt <= num_pose_keys-1).
// Writes the permutation into order_out (int64).
int ba_sort_by_segments(const int32_t* point_opt, const int32_t* pose_opt,
                        int64_t n, int64_t num_point_keys,
                        int64_t num_pose_keys, int64_t* order_out) {
  if (n < 0 || num_point_keys <= 0 || num_pose_keys <= 0) return -1;
  // Two-pass LSD counting sort: first by pose_opt, then stable by point_opt.
  std::vector<int64_t> tmp(static_cast<size_t>(n));
  {
    std::vector<int64_t> count(static_cast<size_t>(num_pose_keys) + 1, 0);
    for (int64_t i = 0; i < n; ++i) count[pose_opt[i] + 1]++;
    for (int64_t k = 0; k < num_pose_keys; ++k) count[k + 1] += count[k];
    for (int64_t i = 0; i < n; ++i) tmp[count[pose_opt[i]]++] = i;
  }
  {
    std::vector<int64_t> count(static_cast<size_t>(num_point_keys) + 1, 0);
    for (int64_t i = 0; i < n; ++i) count[point_opt[i] + 1]++;
    for (int64_t k = 0; k < num_point_keys; ++k) count[k + 1] += count[k];
    for (int64_t i = 0; i < n; ++i) {
      const int64_t row = tmp[static_cast<size_t>(i)];
      order_out[count[point_opt[row]]++] = row;
    }
  }
  return 0;
}

// Unique-pair connectivity counts. Inputs need NOT be sorted.
// points_per_pose[j] = #distinct points observed by pose j;
// poses_per_point[i] = #distinct poses observing point i.
// Uses a last-seen stamp array: O(n + N + M) time, no hashing.
int ba_connectivity(const int32_t* obs_pose, const int32_t* obs_point,
                    int64_t n, int64_t num_poses, int64_t num_points,
                    int32_t* points_per_pose, int32_t* poses_per_point) {
  if (n < 0 || num_poses <= 0 || num_points <= 0) return -1;
  std::memset(points_per_pose, 0, sizeof(int32_t) * num_poses);
  std::memset(poses_per_point, 0, sizeof(int32_t) * num_points);
  // Count unique pairs by sorting-by-point via counting sort buckets, then
  // a stamp per pose within each point's run (and vice versa).
  std::vector<int64_t> start(static_cast<size_t>(num_points) + 1, 0);
  for (int64_t i = 0; i < n; ++i) start[obs_point[i] + 1]++;
  for (int64_t k = 0; k < num_points; ++k) start[k + 1] += start[k];
  std::vector<int32_t> pose_of(static_cast<size_t>(n));
  {
    std::vector<int64_t> cursor(start.begin(), start.end() - 1);
    for (int64_t i = 0; i < n; ++i)
      pose_of[cursor[obs_point[i]]++] = obs_pose[i];
  }
  std::vector<int64_t> stamp(static_cast<size_t>(num_poses), -1);
  for (int64_t p = 0; p < num_points; ++p) {
    for (int64_t k = start[p]; k < start[p + 1]; ++k) {
      const int32_t j = pose_of[static_cast<size_t>(k)];
      if (stamp[j] != p) {
        stamp[j] = p;
        poses_per_point[p]++;
        points_per_pose[j]++;
      }
    }
  }
  return 0;
}

// Greedy contiguous landmark partition balancing observation counts.
// obs_per_point: (M,) observation count per point id.
// boundaries_out: (num_shards + 1,) point-id cut points
// (boundaries_out[0] == 0, boundaries_out[num_shards] == M).
int ba_partition_landmarks(const int64_t* obs_per_point, int64_t num_points,
                           int64_t total_obs, int64_t num_shards,
                           int64_t* boundaries_out) {
  if (num_points < 0 || num_shards <= 0) return -1;
  boundaries_out[0] = 0;
  const double target = static_cast<double>(total_obs) / num_shards;
  int64_t next = 1;
  int64_t acc = 0;
  for (int64_t p = 0; p < num_points && next < num_shards; ++p) {
    acc += obs_per_point[p];
    if (static_cast<double>(acc) >= target * next) {
      boundaries_out[next++] = p + 1;
    }
  }
  while (next <= num_shards) boundaries_out[next++] = num_points;
  return 0;
}

}  // extern "C"
