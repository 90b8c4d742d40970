// Native strip packer for the ray-stab acceleration-structure build.
//
// The reference delegates its AS build to the driver's native BVH builder
// (Voxelizer.cpp:264-326 BuildRaytracingAccelerationStructure); this is the
// TPU framework's equivalent native component: the greedy packing of
// direction-cell ray groups into 128-lane strips with per-strip candidate
// unions (the irregular sequential walk in
// ops/raystab_fast._make_packs_py, which is the behavioral reference —
// outputs must be bit-identical, pinned by tests/test_raystab2.py).
//
// Contract (mirrors the Python exactly):
//  - iterate fine cells in order; skip cells with no candidates or rays;
//  - cells with > 128 rays: flush the pool, sort the cell's rays by origin
//    radius s0 (stable), emit full 128-lane strips sharing the cell's
//    bound-sorted unique candidate list, send the tail to the pool;
//  - small cells accumulate in the pool until 128 lanes would overflow;
//  - a flushed pool emits one strip whose candidate list is the
//    bound-sorted unique union of its cells' raw lists;
//  - candidate lists: ascending unique ids, then stable-sorted by
//    tri_bounds (ties keep ascending id order) when bounds are given.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct AccelPackResult {
    std::vector<int32_t> ray_data;
    std::vector<int64_t> ray_offs;
    std::vector<int64_t> id_data;
    std::vector<int64_t> id_offs;
};

}  // namespace

extern "C" {

void* accelpack_run(
    const int64_t* cell_offs, const int64_t* cell_data, int64_t n_cells,
    const int32_t* ray_table, int64_t r_cap,
    const int64_t* rc, const float* s0, const double* tri_bounds) {
    auto* res = new (std::nothrow) AccelPackResult();
    if (!res) return nullptr;
    res->ray_offs.push_back(0);
    res->id_offs.push_back(0);

    std::vector<int32_t> cur_rays;  // pooled ray lanes
    std::vector<int64_t> cur_ids;   // pooled raw candidate ids (with dups)
    std::vector<int64_t> uniq;      // scratch: sorted unique candidates
    std::vector<int32_t> full;      // scratch: big-cell ray order

    auto emit = [&](const int32_t* rays, int64_t nr,
                    const std::vector<int64_t>& ids) {
        res->ray_data.insert(res->ray_data.end(), rays, rays + nr);
        res->ray_offs.push_back(static_cast<int64_t>(res->ray_data.size()));
        res->id_data.insert(res->id_data.end(), ids.begin(), ids.end());
        res->id_offs.push_back(static_cast<int64_t>(res->id_data.size()));
    };

    auto sort_ids = [&](std::vector<int64_t>& ids) {
        std::sort(ids.begin(), ids.end());  // np.unique: ascending…
        ids.erase(std::unique(ids.begin(), ids.end()), ids.end());
        if (tri_bounds) {  // …then stable by bound, ties keep id order
            std::stable_sort(
                ids.begin(), ids.end(),
                [&](int64_t a, int64_t b) {
                    return tri_bounds[a] < tri_bounds[b];
                });
        }
    };

    auto close = [&]() {
        if (!cur_rays.empty()) {
            uniq = cur_ids;
            sort_ids(uniq);
            emit(cur_rays.data(), static_cast<int64_t>(cur_rays.size()),
                 uniq);
        }
        cur_rays.clear();
        cur_ids.clear();
    };

    for (int64_t c = 0; c < n_cells; ++c) {
        const int64_t beg = cell_offs[c], end = cell_offs[c + 1];
        const int64_t m = end - beg;
        const int64_t nray = rc[c];
        if (m == 0 || nray == 0) continue;
        const int32_t* row = ray_table + c * r_cap;
        if (nray > 128) {
            close();
            uniq.assign(cell_data + beg, cell_data + end);
            sort_ids(uniq);
            full.assign(row, row + nray);
            // strips in origin-radius order (stable, like np.argsort)
            std::stable_sort(
                full.begin(), full.end(),
                [&](int32_t a, int32_t b) { return s0[a] < s0[b]; });
            for (int64_t s = 0; s < nray; s += 128) {
                const int64_t len = std::min<int64_t>(128, nray - s);
                if (len == 128) {
                    emit(full.data() + s, 128, uniq);
                } else {  // tail strip joins the packing pool
                    cur_rays.insert(cur_rays.end(), full.begin() + s,
                                    full.begin() + s + len);
                    cur_ids.insert(cur_ids.end(), cell_data + beg,
                                   cell_data + end);
                }
            }
            continue;
        }
        if (static_cast<int64_t>(cur_rays.size()) + nray > 128) close();
        cur_rays.insert(cur_rays.end(), row, row + nray);
        cur_ids.insert(cur_ids.end(), cell_data + beg, cell_data + end);
    }
    close();
    return res;
}

int64_t accelpack_n_packs(void* h) {
    return static_cast<int64_t>(
        static_cast<AccelPackResult*>(h)->ray_offs.size()) - 1;
}

int64_t accelpack_ray_total(void* h) {
    return static_cast<int64_t>(
        static_cast<AccelPackResult*>(h)->ray_data.size());
}

int64_t accelpack_id_total(void* h) {
    return static_cast<int64_t>(
        static_cast<AccelPackResult*>(h)->id_data.size());
}

void accelpack_copy(void* h, int32_t* ray_data, int64_t* ray_offs,
                    int64_t* id_data, int64_t* id_offs) {
    auto* r = static_cast<AccelPackResult*>(h);
    std::copy(r->ray_data.begin(), r->ray_data.end(), ray_data);
    std::copy(r->ray_offs.begin(), r->ray_offs.end(), ray_offs);
    std::copy(r->id_data.begin(), r->id_data.end(), id_data);
    std::copy(r->id_offs.begin(), r->id_offs.end(), id_offs);
}

void accelpack_free(void* h) { delete static_cast<AccelPackResult*>(h); }

// Voxel-center -> direction-cubemap cell id for every voxel of an n^3
// grid, fused with the center generation (the numpy path materializes a
// [V,3] meshgrid first). Bit-identical to
// ops/raystab_fast._dir_cells_host over ops/packing.voxel_centers_norm:
// same f32 expressions, same first-max tie rule, same trunc-toward-zero
// cast (pinned by tests/test_raystab_fast.py).
void accelpack_dir_cells(int64_t n, int64_t g, int64_t* out) {
    std::vector<float> t(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) {
        t[static_cast<size_t>(i)] =
            (static_cast<float>(i) + 0.5f) / static_cast<float>(n) * 2.0f -
            1.0f;
    }
    const float half_g = 0.5f * static_cast<float>(g);
    const int64_t gg = g * g;
    int64_t v = 0;
    for (int64_t i = 0; i < n; ++i) {
        const float x = t[static_cast<size_t>(i)];
        const float ax = x < 0 ? -x : x;
        for (int64_t j = 0; j < n; ++j) {
            const float y = -t[static_cast<size_t>(j)];
            const float ay = y < 0 ? -y : y;
            for (int64_t k = 0; k < n; ++k, ++v) {
                const float z = t[static_cast<size_t>(k)];
                const float az = z < 0 ? -z : z;
                // np.argmax's first-max tie rule
                const int a = (ax >= ay) ? (ax >= az ? 0 : 2)
                                         : (ay >= az ? 1 : 2);
                const float da = a == 0 ? x : (a == 1 ? y : z);
                const float db = a == 0 ? y : x;  // _OTHERS[a, 0]
                const float dc = a == 2 ? y : z;  // _OTHERS[a, 1]
                const float ada = da < 0 ? -da : da;
                int64_t iu =
                    static_cast<int64_t>((db / ada + 1.0f) * half_g);
                int64_t iv =
                    static_cast<int64_t>((dc / ada + 1.0f) * half_g);
                iu = iu < 0 ? 0 : (iu > g - 1 ? g - 1 : iu);
                iv = iv < 0 ? 0 : (iv > g - 1 ? g - 1 : iv);
                const int64_t f = 2 * a + (da < 0 ? 1 : 0);
                out[v] = f * gg + iu * g + iv;
            }
        }
    }
}

}  // extern "C"
