// Host-side native kernels for the TPU LiDAR framework.
//
// The reference ships C++/CUDA for its host data path (spconv's
// VoxelGeneratorV2 and pcdet/ops/iou3d_nms src); these are the TPU-native
// host equivalents: the device path is jax/XLA, but per-scan input prep and
// evaluation run on CPU workers where tight C++ loops beat numpy by an
// order of magnitude.
//
//   voxelize_f32     — hard voxelization with first-come voxel/point order,
//                      semantics identical to lidardetection_tpu.ops.
//                      voxelize.voxelize_np (itself mirroring spconv's
//                      VoxelGenerator as called from
//                      pcdet/datasets/processor/data_processor.py:48-81).
//   rotated_iou_bev  — pairwise rotated BEV IoU matrix used by the KITTI
//                      offline eval (pcdet/datasets/kitti/kitti_object_eval
//                      _python/rotate_iou.py) — polygon-clipping formulation.
//
// Build: g++ -O3 -march=native -shared -fPIC voxelizer.cpp -o libnative.so
// Python binding: ctypes (see native/__init__.py). No pybind11 dependency.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

// Open-addressing hash map: int64 voxel key -> int32 slot.
struct KeySlotMap {
    std::vector<int64_t> keys;
    std::vector<int32_t> slots;
    uint64_t mask;

    explicit KeySlotMap(int64_t expect) {
        uint64_t cap = 64;
        while (cap < static_cast<uint64_t>(expect) * 4) cap <<= 1;
        keys.assign(cap, -1);
        slots.assign(cap, -1);
        mask = cap - 1;
    }

    // Returns slot if present, else -1; `pos` receives the probe position
    // for a subsequent insert.
    int32_t find(int64_t key, uint64_t* pos) const {
        uint64_t h = static_cast<uint64_t>(key) * 0x9E3779B97F4A7C15ull;
        uint64_t i = h & mask;
        while (true) {
            if (keys[i] == key) { *pos = i; return slots[i]; }
            if (keys[i] == -1) { *pos = i; return -1; }
            i = (i + 1) & mask;
        }
    }

    void insert_at(uint64_t pos, int64_t key, int32_t slot) {
        keys[pos] = key;
        slots[pos] = slot;
    }
};

}  // namespace

extern "C" {

// points: (n, c) row-major float32, c >= 3 (x, y, z, ...).
// pc_range: 6 floats (x0 y0 z0 x1 y1 z1); voxel_size: 3 floats.
// Outputs (caller-allocated):
//   voxels     (max_voxels, max_points, c) — fully zero-filled here
//   coords     (max_voxels, 3) int32, (z, y, x), padded -1
//   num_points (max_voxels,) int32
// Returns number of voxels produced.
//
// `sort_rows != 0` permutes the voxel rows into ascending linear-key order
// ((z*gy + y)*gx + x) before returning — the framework-wide "sorted voxel
// table" contract that lets device scatter kernels use contiguous tile
// ranges (searchsorted starts). Voxel membership and per-voxel point order
// (first-come) are unaffected; only row order changes.
int32_t voxelize_f32(const float* points, int64_t n, int32_t c,
                     const float* pc_range, const float* voxel_size,
                     int32_t max_points, int32_t max_voxels,
                     int32_t sort_rows,
                     float* voxels, int32_t* coords, int32_t* num_points) {
    // grid = round((hi - lo) / vs) in float64, matching
    // voxelize.grid_size_from_range / data_processor.py:62-64.
    int64_t grid[3];
    for (int k = 0; k < 3; ++k) {
        double g = (static_cast<double>(pc_range[3 + k]) - pc_range[k]) /
                   static_cast<double>(voxel_size[k]);
        grid[k] = static_cast<int64_t>(std::llround(g));
    }
    const int64_t gx = grid[0], gy = grid[1];

    std::memset(voxels, 0,
                sizeof(float) * static_cast<size_t>(max_voxels) * max_points * c);
    std::memset(num_points, 0, sizeof(int32_t) * max_voxels);
    for (int64_t i = 0; i < static_cast<int64_t>(max_voxels) * 3; ++i)
        coords[i] = -1;

    KeySlotMap map(max_voxels);
    int32_t n_vox = 0;
    for (int64_t i = 0; i < n; ++i) {
        const float* p = points + i * c;
        int64_t cx[3];
        bool in_range = true;
        for (int k = 0; k < 3; ++k) {
            // float32 intermediate to match numpy float32 arithmetic exactly
            float f = (p[k] - pc_range[k]) / voxel_size[k];
            cx[k] = static_cast<int64_t>(std::floor(f));
            if (cx[k] < 0 || cx[k] >= grid[k]) { in_range = false; break; }
        }
        if (!in_range) continue;
        int64_t key = (cx[2] * gy + cx[1]) * gx + cx[0];
        uint64_t pos;
        int32_t slot = map.find(key, &pos);
        if (slot < 0) {
            if (n_vox >= max_voxels) continue;
            slot = n_vox++;
            map.insert_at(pos, key, slot);
            coords[slot * 3 + 0] = static_cast<int32_t>(cx[2]);
            coords[slot * 3 + 1] = static_cast<int32_t>(cx[1]);
            coords[slot * 3 + 2] = static_cast<int32_t>(cx[0]);
        }
        int32_t cnt = num_points[slot];
        if (cnt < max_points) {
            std::memcpy(voxels + (static_cast<int64_t>(slot) * max_points + cnt) * c,
                        p, sizeof(float) * c);
            num_points[slot] = cnt + 1;
        }
    }

    if (sort_rows && n_vox > 1) {
        std::vector<std::pair<int64_t, int32_t>> order(n_vox);
        for (int32_t s = 0; s < n_vox; ++s) {
            const int64_t key = (static_cast<int64_t>(coords[s * 3 + 0]) * gy
                                 + coords[s * 3 + 1]) * gx + coords[s * 3 + 2];
            order[s] = {key, s};
        }
        std::sort(order.begin(), order.end());
        const int64_t row_f = static_cast<int64_t>(max_points) * c;
        std::vector<float> vox_tmp(static_cast<size_t>(n_vox) * row_f);
        std::vector<int32_t> crd_tmp(static_cast<size_t>(n_vox) * 3);
        std::vector<int32_t> cnt_tmp(n_vox);
        for (int32_t d = 0; d < n_vox; ++d) {
            const int32_t s = order[d].second;
            std::memcpy(&vox_tmp[static_cast<size_t>(d) * row_f],
                        voxels + static_cast<int64_t>(s) * row_f,
                        sizeof(float) * row_f);
            std::memcpy(&crd_tmp[static_cast<size_t>(d) * 3], coords + s * 3,
                        sizeof(int32_t) * 3);
            cnt_tmp[d] = num_points[s];
        }
        std::memcpy(voxels, vox_tmp.data(), sizeof(float) * vox_tmp.size());
        std::memcpy(coords, crd_tmp.data(), sizeof(int32_t) * crd_tmp.size());
        std::memcpy(num_points, cnt_tmp.data(), sizeof(int32_t) * n_vox);
    }
    return n_vox;
}

// ---------------------------------------------------------------------------
// Rotated BEV IoU (Sutherland–Hodgman polygon clipping), float64.
// Boxes are (cx, cy, dx, dy, heading) — centre form, heading in radians,
// matching lidardetection_tpu.core.np_geometry.boxes_bev_iou_cpu.
// criterion: -1 = IoU, 0 = inter/area_a, 1 = inter/area_b (the KITTI eval's
// image/bev criteria, rotate_iou.py:292-330).
// ---------------------------------------------------------------------------

namespace {

struct Pt { double x, y; };

inline void box_corners(const float* b, Pt* c4) {
    const double cx = b[0], cy = b[1], dx = b[2] * 0.5, dy = b[3] * 0.5;
    const double ca = std::cos(static_cast<double>(b[4]));
    const double sa = std::sin(static_cast<double>(b[4]));
    const double ox[4] = {dx, dx, -dx, -dx};
    const double oy[4] = {-dy, dy, dy, -dy};
    for (int i = 0; i < 4; ++i) {
        c4[i].x = cx + ox[i] * ca - oy[i] * sa;
        c4[i].y = cy + ox[i] * sa + oy[i] * ca;
    }
}

// Clip polygon `in` (n vertices) against the half-plane left of a->b.
inline int clip_edge(const Pt* in, int n, Pt a, Pt b, Pt* out) {
    int m = 0;
    const double ex = b.x - a.x, ey = b.y - a.y;
    for (int i = 0; i < n; ++i) {
        const Pt& p = in[i];
        const Pt& q = in[(i + 1) % n];
        // corners are CCW, so the rectangle interior is left of a->b
        // (cross >= 0); keep that side.
        const double dp = ex * (p.y - a.y) - ey * (p.x - a.x);
        const double dq = ex * (q.y - a.y) - ey * (q.x - a.x);
        if (dp >= 0) out[m++] = p;
        if ((dp < 0 && dq > 0) || (dp > 0 && dq < 0)) {
            const double t = dp / (dp - dq);
            out[m].x = p.x + t * (q.x - p.x);
            out[m].y = p.y + t * (q.y - p.y);
            ++m;
        }
    }
    return m;
}

inline double polygon_area(const Pt* p, int n) {
    double a = 0;
    for (int i = 0; i < n; ++i) {
        const Pt& u = p[i];
        const Pt& v = p[(i + 1) % n];
        a += u.x * v.y - u.y * v.x;
    }
    return std::fabs(a) * 0.5;
}

inline double rect_intersection(const Pt* ca, const Pt* cb) {
    Pt buf0[16], buf1[16];
    std::memcpy(buf0, ca, sizeof(Pt) * 4);
    int n = 4;
    Pt* cur = buf0;
    Pt* nxt = buf1;
    for (int e = 0; e < 4 && n > 2; ++e) {
        n = clip_edge(cur, n, cb[e], cb[(e + 1) % 4], nxt);
        Pt* t = cur; cur = nxt; nxt = t;
    }
    return n > 2 ? polygon_area(cur, n) : 0.0;
}

}  // namespace

// boxes_a (na, 5), boxes_b (nb, 5) float32 -> out (na, nb) float32.
void rotated_iou_bev(const float* boxes_a, int64_t na,
                     const float* boxes_b, int64_t nb,
                     int32_t criterion, float* out) {
    std::vector<Pt> corners_b(static_cast<size_t>(nb) * 4);
    std::vector<double> area_b(nb);
    for (int64_t j = 0; j < nb; ++j) {
        box_corners(boxes_b + j * 5, &corners_b[j * 4]);
        area_b[j] = static_cast<double>(boxes_b[j * 5 + 2]) * boxes_b[j * 5 + 3];
    }
    for (int64_t i = 0; i < na; ++i) {
        Pt ca[4];
        box_corners(boxes_a + i * 5, ca);
        const double aa =
            static_cast<double>(boxes_a[i * 5 + 2]) * boxes_a[i * 5 + 3];
        for (int64_t j = 0; j < nb; ++j) {
            const double inter = rect_intersection(ca, &corners_b[j * 4]);
            double denom;
            if (criterion == 0) denom = aa;
            else if (criterion == 1) denom = area_b[j];
            else denom = aa + area_b[j] - inter;
            out[i * nb + j] =
                denom > 0 ? static_cast<float>(inter / denom) : 0.0f;
        }
    }
}

}  // extern "C"
