// Native IO / host-side point-cloud kernels for the i2pnet_tpu data
// pipeline. The reference's native layer is CUDA compute (pointnet2,
// fused_conv) — on TPU that moved to XLA/Pallas; what remains hot on the
// HOST is the input pipeline (150k-point clouds per sample, single-core
// box). These kernels fuse read+transform+pad into single passes.
//
// Exposed via a plain C ABI for ctypes (no pybind11 on this image).
//
// Build: make -C native   (produces libi2pnet_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Read a KITTI velodyne .bin (x,y,z,intensity f32 records).
// Returns the number of points read (<= max_points), or -1 on error.
// xyz_out: (max_points, 3) f32; intensity_out: (max_points,) f32.
int64_t read_velodyne_bin(const char* path, float* xyz_out,
                          float* intensity_out, int64_t max_points) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<float> buf(static_cast<size_t>(max_points) * 4);
  size_t n_vals = fread(buf.data(), sizeof(float), buf.size(), f);
  fclose(f);
  int64_t n = static_cast<int64_t>(n_vals / 4);
  for (int64_t i = 0; i < n; ++i) {
    xyz_out[i * 3 + 0] = buf[i * 4 + 0];
    xyz_out[i * 3 + 1] = buf[i * 4 + 1];
    xyz_out[i * 3 + 2] = buf[i * 4 + 2];
    intensity_out[i] = buf[i * 4 + 3];
  }
  return n;
}

// Apply a 3x4 extrinsic to n points, writing into a zero-padded
// (total, 3) buffer: out[i] = E[:, :3] @ p[i] + E[:, 3] for i < n,
// zeros for n <= i < total. Single fused pass.
void transform_pad_points(const float* xyz, int64_t n, const float* E,
                          float* out, int64_t total) {
  const float r00 = E[0], r01 = E[1], r02 = E[2], tx = E[3];
  const float r10 = E[4], r11 = E[5], r12 = E[6], ty = E[7];
  const float r20 = E[8], r21 = E[9], r22 = E[10], tz = E[11];
  int64_t i = 0;
  for (; i < n; ++i) {
    const float x = xyz[i * 3 + 0];
    const float y = xyz[i * 3 + 1];
    const float z = xyz[i * 3 + 2];
    out[i * 3 + 0] = r00 * x + r01 * y + r02 * z + tx;
    out[i * 3 + 1] = r10 * x + r11 * y + r12 * z + ty;
    out[i * 3 + 2] = r20 * x + r21 * y + r22 * z + tz;
  }
  if (i < total) {
    memset(out + i * 3, 0, sizeof(float) * 3 * static_cast<size_t>(total - i));
  }
}

// Voxel-grid average downsample (hash map, one pass). points: (n, c) with
// xyz in the first three columns. out: (n, c) buffer (worst case no
// merging). Returns the number of output points.
int64_t voxel_downsample(const float* points, int64_t n, int32_t c,
                         float voxel, float* out) {
  if (n == 0) return 0;
  float minx = points[0], miny = points[1], minz = points[2];
  for (int64_t i = 1; i < n; ++i) {
    const float* p = points + i * c;
    if (p[0] < minx) minx = p[0];
    if (p[1] < miny) miny = p[1];
    if (p[2] < minz) minz = p[2];
  }
  const float inv = 1.0f / voxel;
  std::unordered_map<uint64_t, int64_t> cell_to_out;
  cell_to_out.reserve(static_cast<size_t>(n));
  std::vector<int64_t> counts;
  counts.reserve(static_cast<size_t>(n));
  int64_t n_out = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + i * c;
    const uint64_t vx = static_cast<uint64_t>((p[0] - minx) * inv);
    const uint64_t vy = static_cast<uint64_t>((p[1] - miny) * inv);
    const uint64_t vz = static_cast<uint64_t>((p[2] - minz) * inv);
    const uint64_t key = (vx << 42) | (vy << 21) | vz;  // 21 bits per axis
    auto it = cell_to_out.find(key);
    if (it == cell_to_out.end()) {
      cell_to_out.emplace(key, n_out);
      float* o = out + n_out * c;
      for (int32_t k = 0; k < c; ++k) o[k] = p[k];
      counts.push_back(1);
      ++n_out;
    } else {
      float* o = out + it->second * c;
      for (int32_t k = 0; k < c; ++k) o[k] += p[k];
      ++counts[static_cast<size_t>(it->second)];
    }
  }
  for (int64_t j = 0; j < n_out; ++j) {
    const float scale = 1.0f / static_cast<float>(counts[static_cast<size_t>(j)]);
    float* o = out + j * c;
    for (int32_t k = 0; k < c; ++k) o[k] *= scale;
  }
  return n_out;
}

// Fused large-range sample assembly (the hot loop of
// KittiLargeRangeDataset.__getitem__): permute points by idx, transform by
// the init extrinsic, rotate normals, zero-pad everything to `total`.
void assemble_large_range_sample(
    const float* xyz, const float* intensity, const float* normals,
    const int64_t* perm, int64_t n, const float* E, int64_t total,
    float* lidar_out, float* feats_out, float* raw_out, float* sn_out) {
  const float r00 = E[0], r01 = E[1], r02 = E[2], tx = E[3];
  const float r10 = E[4], r11 = E[5], r12 = E[6], ty = E[7];
  const float r20 = E[8], r21 = E[9], r22 = E[10], tz = E[11];
  int64_t i = 0;
  for (; i < n; ++i) {
    const int64_t s = perm[i];
    const float x = xyz[s * 3 + 0];
    const float y = xyz[s * 3 + 1];
    const float z = xyz[s * 3 + 2];
    raw_out[i * 3 + 0] = x;
    raw_out[i * 3 + 1] = y;
    raw_out[i * 3 + 2] = z;
    lidar_out[i * 3 + 0] = r00 * x + r01 * y + r02 * z + tx;
    lidar_out[i * 3 + 1] = r10 * x + r11 * y + r12 * z + ty;
    lidar_out[i * 3 + 2] = r20 * x + r21 * y + r22 * z + tz;
    feats_out[i] = intensity[s];
    if (normals && sn_out) {
      const float nx = normals[s * 3 + 0];
      const float ny = normals[s * 3 + 1];
      const float nz = normals[s * 3 + 2];
      sn_out[i * 3 + 0] = r00 * nx + r01 * ny + r02 * nz;
      sn_out[i * 3 + 1] = r10 * nx + r11 * ny + r12 * nz;
      sn_out[i * 3 + 2] = r20 * nx + r21 * ny + r22 * nz;
    }
  }
  const int64_t pad = total - i;
  if (pad > 0) {
    memset(lidar_out + i * 3, 0, sizeof(float) * 3 * static_cast<size_t>(pad));
    memset(raw_out + i * 3, 0, sizeof(float) * 3 * static_cast<size_t>(pad));
    memset(feats_out + i, 0, sizeof(float) * static_cast<size_t>(pad));
    if (sn_out) {
      memset(sn_out + i * 3, 0, sizeof(float) * 3 * static_cast<size_t>(pad));
    }
  }
}

}  // extern "C"
