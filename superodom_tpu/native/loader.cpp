// Native host runtime for superodom_tpu: the data-loader side of the
// framework, replacing the reference's C++ ingestion path (PCL point
// decoding, featureExtraction.cpp sensor handlers, MapRingBuffer.h) with a
// small dependency-free C++17 library exposed over a C ABI (consumed via
// ctypes; see superodom_tpu/native/__init__.py).
//
// Components:
//   * so_decode_points  — generic packed-record point decoder (the role of
//     pcl::fromROSMsg over PointCloud2 layouts): arbitrary per-field byte
//     offsets/types, one pass, branch-free inner loop.
//   * so_synth_ring_time — VLP ring-id + column/laser timing model
//     (reference assignTimeforPointCloud, featureExtraction.cpp:646-708).
//   * so_imu_buffer_*   — time-indexed bounded IMU buffer with window
//     extraction + scan/IMU synchronization check (reference
//     container/MapRingBuffer.h + synchronize_measurements,
//     featureExtraction.cpp:171-217).
//   * so_voxel_downsample — hash-grid thinning for large prior maps before
//     device upload (the role of pcl::VoxelGrid at map-load time).
//
// Build: see Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <map>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// generic packed point decoder
// ---------------------------------------------------------------------------

// field type tags (subset of sensor_msgs/PointField)
enum SoFieldType : int32_t {
  SO_F32 = 0,
  SO_F64 = 1,
  SO_I8 = 2,
  SO_U8 = 3,
  SO_I16 = 4,
  SO_U16 = 5,
  SO_I32 = 6,
  SO_U32 = 7,
};

static inline double read_field(const uint8_t* p, int32_t type) {
  switch (type) {
    case SO_F32: { float v; std::memcpy(&v, p, 4); return v; }
    case SO_F64: { double v; std::memcpy(&v, p, 8); return v; }
    case SO_I8:  { int8_t v; std::memcpy(&v, p, 1); return v; }
    case SO_U8:  { uint8_t v; std::memcpy(&v, p, 1); return v; }
    case SO_I16: { int16_t v; std::memcpy(&v, p, 2); return v; }
    case SO_U16: { uint16_t v; std::memcpy(&v, p, 2); return v; }
    case SO_I32: { int32_t v; std::memcpy(&v, p, 4); return v; }
    case SO_U32: { uint32_t v; std::memcpy(&v, p, 4); return v; }
  }
  return 0.0;
}

// Decode n packed records of `stride` bytes.  offsets/types describe the
// x, y, z, time, ring, intensity fields; offset < 0 means "absent" (output
// zero-filled).  time_scale converts the raw time value to seconds (e.g.
// 1e-9 for nanosecond stamps).  Returns the number of finite points kept;
// non-finite xyz rows are dropped (the reference's std::isfinite gates).
int64_t so_decode_points(const uint8_t* data, int64_t n, int64_t stride,
                         const int64_t* offsets, const int32_t* types,
                         double time_scale,
                         float* xyz_out, float* t_out, int32_t* ring_out,
                         float* intensity_out) {
  const int64_t ox = offsets[0], oy = offsets[1], oz = offsets[2];
  const int64_t ot = offsets[3], oring = offsets[4], oint = offsets[5];
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* rec = data + i * stride;
    const float x = static_cast<float>(read_field(rec + ox, types[0]));
    const float y = static_cast<float>(read_field(rec + oy, types[1]));
    const float z = static_cast<float>(read_field(rec + oz, types[2]));
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    xyz_out[3 * m + 0] = x;
    xyz_out[3 * m + 1] = y;
    xyz_out[3 * m + 2] = z;
    t_out[m] = ot >= 0
                   ? static_cast<float>(read_field(rec + ot, types[3]) * time_scale)
                   : 0.0f;
    ring_out[m] = oring >= 0
                      ? static_cast<int32_t>(read_field(rec + oring, types[4]))
                      : 0;
    intensity_out[m] =
        oint >= 0 ? static_cast<float>(read_field(rec + oint, types[5])) : 0.0f;
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// VLP ring/time synthesis (reference featureExtraction.cpp:646-708)
// ---------------------------------------------------------------------------

int64_t so_synth_ring_time(const float* xyz, int64_t n, int32_t n_scan_lines,
                           double column_time, double laser_time,
                           float* xyz_out, float* t_out, int32_t* ring_out) {
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    const double angle =
        std::atan2((double)z, std::sqrt((double)x * x + (double)y * y)) *
        180.0 / M_PI;
    int scan_id = 0;
    bool ok = true;
    if (n_scan_lines == 16) {
      scan_id = (int)((angle + 15.0) / 2.0 + 0.5);
      ok = scan_id >= 0 && scan_id < 16;
    } else if (n_scan_lines == 32) {
      scan_id = (int)((angle + 92.0 / 3.0) * 3.0 / 4.0);
      ok = scan_id >= 0 && scan_id < 32;
    } else if (n_scan_lines == 64) {
      scan_id = angle >= -8.83 ? (int)((2.0 - angle) * 3.0 + 0.5)
                               : 32 + (int)((-8.83 - angle) * 2.0 + 0.5);
      ok = angle <= 2.0 && angle >= -24.33 && scan_id >= 0 && scan_id <= 50;
    } else {
      ok = false;
    }
    if (!ok) continue;
    xyz_out[3 * m + 0] = x;
    xyz_out[3 * m + 1] = y;
    xyz_out[3 * m + 2] = z;
    t_out[m] = (float)(column_time * (double)(i / n_scan_lines) +
                       laser_time * (double)(i % n_scan_lines));
    ring_out[m] = scan_id;
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// IMU ring buffer + scan synchronization
// ---------------------------------------------------------------------------

struct SoImuBuffer {
  struct Sample {
    double t;
    float acc[3];
    float gyr[3];
  };
  std::map<double, Sample> samples;  // time-indexed, like MapRingBuffer
  size_t capacity;
};

void* so_imu_buffer_new(int64_t capacity) {
  auto* b = new SoImuBuffer();
  b->capacity = static_cast<size_t>(capacity);
  return b;
}

void so_imu_buffer_free(void* h) { delete static_cast<SoImuBuffer*>(h); }

void so_imu_buffer_add(void* h, double t, const float* acc, const float* gyr) {
  auto* b = static_cast<SoImuBuffer*>(h);
  SoImuBuffer::Sample s;
  s.t = t;
  std::memcpy(s.acc, acc, 12);
  std::memcpy(s.gyr, gyr, 12);
  b->samples[t] = s;
  while (b->samples.size() > b->capacity)  // evict oldest (MapRingBuffer.h:39)
    b->samples.erase(b->samples.begin());
}

int64_t so_imu_buffer_size(void* h) {
  return static_cast<int64_t>(static_cast<SoImuBuffer*>(h)->samples.size());
}

// Synchronization check (featureExtraction.cpp:171-217): 1 if the buffer
// fully covers [t0, t1] (one sample at-or-before t0 and one after t1),
// 0 if not yet coverable (wait), -1 if the scan predates the buffer (drop).
int32_t so_imu_buffer_sync(void* h, double t0, double t1) {
  auto* b = static_cast<SoImuBuffer*>(h);
  if (b->samples.empty()) return 0;
  const double first = b->samples.begin()->first;
  const double last = b->samples.rbegin()->first;
  if (first > t0) return -1;
  if (last <= t1) return 0;
  return 1;
}

// Extract (at most max_out) samples covering [t0, t1] inclusive of one
// sample before t0 and one after t1; evenly decimated when over capacity.
// Returns the number written.
int64_t so_imu_buffer_window(void* h, double t0, double t1, int64_t max_out,
                             double* t_out, float* acc_out, float* gyr_out) {
  auto* b = static_cast<SoImuBuffer*>(h);
  if (b->samples.empty()) return 0;
  auto lo = b->samples.upper_bound(t0);
  if (lo != b->samples.begin()) --lo;
  auto hi = b->samples.upper_bound(t1);
  if (hi != b->samples.end()) ++hi;

  std::vector<const SoImuBuffer::Sample*> sel;
  for (auto it = lo; it != hi; ++it) sel.push_back(&it->second);
  const int64_t n = static_cast<int64_t>(sel.size());
  if (n == 0) return 0;

  const int64_t out_n = n <= max_out ? n : max_out;
  for (int64_t k = 0; k < out_n; ++k) {
    const int64_t idx =
        n <= max_out ? k : (k * (n - 1)) / (out_n - 1 > 0 ? out_n - 1 : 1);
    const auto* s = sel[static_cast<size_t>(idx)];
    t_out[k] = s->t;
    std::memcpy(acc_out + 3 * k, s->acc, 12);
    std::memcpy(gyr_out + 3 * k, s->gyr, 12);
  }
  return out_n;
}

// Drop samples older than t (MapRingBuffer::clean).
void so_imu_buffer_clean(void* h, double t) {
  auto* b = static_cast<SoImuBuffer*>(h);
  b->samples.erase(b->samples.begin(), b->samples.lower_bound(t));
}

// ---------------------------------------------------------------------------
// host-side voxel downsample (prior-map loading)
// ---------------------------------------------------------------------------

int64_t so_voxel_downsample(const float* xyz, int64_t n, double res,
                            float* xyz_out) {
  struct Key {
    int32_t x, y, z;
    bool operator==(const Key& o) const {
      return x == o.x && y == o.y && z == o.z;
    }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      // murmur-style mix; see ops/voxel.py for why plain XOR is unsafe
      uint32_t h = (uint32_t)k.x * 73856093u + (uint32_t)k.y * 19349663u +
                   (uint32_t)k.z * 83492791u;
      h ^= h >> 16; h *= 0x85ebca6bu; h ^= h >> 13;
      h *= 0xc2b2ae35u; h ^= h >> 16;
      return h;
    }
  };
  struct Acc {
    double sx = 0, sy = 0, sz = 0;
    int64_t c = 0;
  };
  std::unordered_map<Key, Acc, KeyHash> cells;
  cells.reserve(static_cast<size_t>(n / 2));
  const double inv = 1.0 / res;
  for (int64_t i = 0; i < n; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    Key k{(int32_t)std::floor(x * inv), (int32_t)std::floor(y * inv),
          (int32_t)std::floor(z * inv)};
    auto& a = cells[k];
    a.sx += x; a.sy += y; a.sz += z; ++a.c;
  }
  int64_t m = 0;
  for (const auto& [k, a] : cells) {
    xyz_out[3 * m + 0] = (float)(a.sx / a.c);
    xyz_out[3 * m + 1] = (float)(a.sy / a.c);
    xyz_out[3 * m + 2] = (float)(a.sz / a.c);
    ++m;
  }
  return m;
}

}  // extern "C"
