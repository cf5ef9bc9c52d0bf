// vrv_native: host-side native helpers for the vrv_tpu framework.
//
// The reference implements its host runtime in Rust (the sole native
// language there); the TPU build keeps the device path in JAX/XLA and
// implements host-side hot loops natively here:
//
//   - murmur3 chain (reference src/render_system/pathtrace_shader.rs:78-119)
//     as a bit-exact oracle for the device RNG
//   - Amanatides-Woo DDA single-ray tracer: picking/physics queries and a
//     test oracle for the device tracer (ops/dda.py)
//   - face-culled mesh face counting + emissive-face extraction: the hot
//     part of light-structure rebuilds on world edits (render/lightbvh.py)
//   - 0.01-step trace_to_solid (reference src/game_system/chunk_manager.rs:394-443)
//     for reference-identical block picking at native speed
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native  (produces libvrv_native.so)

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// murmur3 (bit-exact with the GLSL reference)
// ---------------------------------------------------------------------------

uint32_t vrv_murmur3_combine(uint32_t h, uint32_t k) {
    k *= 0x1b873593u;
    h ^= k;
    h = (h << 13) | (h >> 19);
    h = h * 5u + 0xe6546b64u;
    return h;
}

uint32_t vrv_murmur3_finalize(uint32_t h) {
    h ^= h >> 16;
    h *= 0x85ebca6bu;
    h ^= h >> 13;
    h *= 0xc2b2ae35u;
    h ^= h >> 16;
    return h;
}

float vrv_float_construct(uint32_t m) {
    m &= 0x007FFFFFu;
    m |= 0x3F800000u;
    float f;
    std::memcpy(&f, &m, 4);
    return f - 1.0f;
}

float vrv_murmur3_finalizef(uint32_t h) {
    return vrv_float_construct(vrv_murmur3_finalize(h));
}

// batched draw: out[i] = finalizef(combine(seed[i], slot))
void vrv_murmur3_draw_batch(const uint32_t* seeds, uint32_t slot, float* out,
                            int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = vrv_murmur3_finalizef(vrv_murmur3_combine(seeds[i], slot));
    }
}

// ---------------------------------------------------------------------------
// single-ray DDA over a dense uint8 grid (grid-local coordinates)
//
// Face ids match block.rs BlockFace: 0=left(-x) 1=right(+x) 2=down(-y)
// 3=up(+y) 4=back(-z) 5=front(+z). Returns 1 on hit.
// Semantics identical to ops/dda.py::trace (entering + exiting faces,
// t in [t_min, t_max]).
// ---------------------------------------------------------------------------

static inline uint8_t cell_block(const uint8_t* grid, const int64_t* size,
                                 int64_t x, int64_t y, int64_t z, uint8_t air) {
    if (x < 0 || y < 0 || z < 0 || x >= size[0] || y >= size[1] || z >= size[2])
        return air;
    return grid[(x * size[1] + y) * size[2] + z];
}

int vrv_dda_trace(const uint8_t* grid, const int64_t* size,
                  const uint8_t* translucent, int n_blocks_incl_air,
                  const double* origin, const double* dir,
                  double t_min, double t_max,
                  // outputs
                  double* t_out, int32_t* block_out, int32_t* face_out,
                  int64_t* cell_out, int32_t* entering_out) {
    const uint8_t air = (uint8_t)(n_blocks_incl_air - 1);
    double o[3], d[3], inv[3];
    for (int i = 0; i < 3; ++i) {
        o[i] = origin[i];
        d[i] = dir[i];
        double ds = (std::fabs(d[i]) < 1e-12) ? 1e-12 : d[i];
        inv[i] = 1.0 / ds;
    }

    // slab clip
    double t_enter = -1e30, t_exit = 1e30;
    int enter_axis = 0;
    for (int i = 0; i < 3; ++i) {
        double lo = (0.0 - o[i]) * inv[i];
        double hi = ((double)size[i] - o[i]) * inv[i];
        double tn = lo < hi ? lo : hi;
        double tf = lo < hi ? hi : lo;
        if (tn > t_enter) { t_enter = tn; enter_axis = i; }
        if (tf < t_exit) t_exit = tf;
    }
    double t0 = t_enter > t_min ? t_enter : t_min;
    if (t0 > t_exit || t0 > t_max) return 0;

    int64_t cell[3];
    for (int i = 0; i < 3; ++i) {
        double p = o[i] + t0 * d[i];
        int64_t c = (int64_t)std::floor(p);
        if (c < 0) c = 0;
        if (c >= size[i]) c = size[i] - 1;
        cell[i] = c;
    }
    uint8_t cur = cell_block(grid, size, cell[0], cell[1], cell[2], air);

    // entry-face hit for rays starting outside
    if (t_enter > t_min && cur != air && t_enter <= t_max) {
        *t_out = t_enter;
        *block_out = cur;
        *face_out = enter_axis * 2 + (d[enter_axis] > 0 ? 0 : 1);
        std::memcpy(cell_out, cell, sizeof(cell));
        *entering_out = 1;
        return 1;
    }

    const int64_t max_steps = size[0] + size[1] + size[2] + 3;
    for (int64_t step = 0; step < max_steps; ++step) {
        // next boundary
        double t_axes[3];
        for (int i = 0; i < 3; ++i) {
            double nb = (double)cell[i] + (d[i] > 0 ? 1.0 : 0.0);
            t_axes[i] = (std::fabs(d[i]) < 1e-12) ? 1e30 : (nb - o[i]) * inv[i];
        }
        int axis = 0;
        if (t_axes[1] < t_axes[axis]) axis = 1;
        if (t_axes[2] < t_axes[axis]) axis = 2;
        double t_next = t_axes[axis];
        if (t_next > t_max) return 0;
        int sgn = d[axis] > 0 ? 1 : -1;
        int64_t ncell[3] = {cell[0], cell[1], cell[2]};
        ncell[axis] += sgn;
        bool inside = ncell[0] >= 0 && ncell[1] >= 0 && ncell[2] >= 0 &&
                      ncell[0] < size[0] && ncell[1] < size[1] && ncell[2] < size[2];
        uint8_t nb = inside ? cell_block(grid, size, ncell[0], ncell[1], ncell[2], air)
                            : air;
        bool entering = (nb != air) && translucent[cur];
        bool exiting = (cur != air) && translucent[nb];
        if (t_next >= t_min && (entering || exiting)) {
            *t_out = t_next;
            *block_out = entering ? nb : cur;
            *face_out = axis * 2 + (entering ? (sgn > 0 ? 0 : 1) : (sgn > 0 ? 1 : 0));
            if (entering) std::memcpy(cell_out, ncell, sizeof(ncell));
            else std::memcpy(cell_out, cell, sizeof(ncell));
            *entering_out = entering ? 1 : 0;
            return 1;
        }
        if (!inside) return 0;
        std::memcpy(cell, ncell, sizeof(ncell));
        cur = nb;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// 0.01-step trace_to_solid (chunk_manager.rs:394-443 semantics, including
// the corner-skip behavior). Returns 1 on hit; face per the reference
// truth table; -1 face on the unreachable diagonal case.
// grid origin: world coords of cell (0,0,0).
// ---------------------------------------------------------------------------

int vrv_trace_to_solid(const uint8_t* grid, const int64_t* size,
                       const double* grid_origin,
                       const uint8_t* solid, int n_blocks_incl_air,
                       const double* origin, const double* dir, double radius,
                       int64_t* coords_out, int32_t* face_out) {
    (void)n_blocks_incl_air;
    const double step = 0.01;
    double norm = std::sqrt(dir[0] * dir[0] + dir[1] * dir[1] + dir[2] * dir[2]);
    double d[3] = {dir[0] / norm * step, dir[1] / norm * step, dir[2] / norm * step};
    double loc[3] = {origin[0], origin[1], origin[2]};
    int64_t q[3] = {(int64_t)std::floor(loc[0]), (int64_t)std::floor(loc[1]),
                    (int64_t)std::floor(loc[2])};
    const double r2 = radius * radius;
    while (true) {
        int64_t fq[3];
        while (true) {
            fq[0] = (int64_t)std::floor(loc[0]);
            fq[1] = (int64_t)std::floor(loc[1]);
            fq[2] = (int64_t)std::floor(loc[2]);
            if (fq[0] != q[0] || fq[1] != q[1] || fq[2] != q[2]) break;
            loc[0] += d[0]; loc[1] += d[1]; loc[2] += d[2];
            double dx = loc[0] - origin[0], dy = loc[1] - origin[1],
                   dz = loc[2] - origin[2];
            if (dx * dx + dy * dy + dz * dz > r2) return 0;
        }
        int64_t last[3] = {(int64_t)std::floor(loc[0] - d[0]),
                           (int64_t)std::floor(loc[1] - d[1]),
                           (int64_t)std::floor(loc[2] - d[2])};
        q[0] = fq[0]; q[1] = fq[1]; q[2] = fq[2];

        int64_t cx = q[0] - (int64_t)grid_origin[0];
        int64_t cy = q[1] - (int64_t)grid_origin[1];
        int64_t cz = q[2] - (int64_t)grid_origin[2];
        if (cx < 0 || cy < 0 || cz < 0 || cx >= size[0] || cy >= size[1] ||
            cz >= size[2])
            return 0;  // outside the loaded world
        uint8_t b = grid[(cx * size[1] + cy) * size[2] + cz];
        if (solid[b]) {
            int64_t dx = q[0] - last[0], dy = q[1] - last[1], dz = q[2] - last[2];
            int face = -1;
            if (dx == -1) face = 1;       // RIGHT
            else if (dx == 1) face = 0;   // LEFT
            else if (dy == -1) face = 3;  // UP
            else if (dy == 1) face = 2;   // DOWN
            else if (dz == -1) face = 5;  // FRONT
            else if (dz == 1) face = 4;   // BACK
            if (face < 0) return 0;       // diagonal skip (reference panics)
            coords_out[0] = q[0]; coords_out[1] = q[1]; coords_out[2] = q[2];
            *face_out = face;
            return 1;
        }
    }
}

// ---------------------------------------------------------------------------
// emissive-face extraction for light-structure rebuilds.
// For every cell with an emissive block, for every face toward a
// translucent neighbour, writes (cell xyz, face) records.
// Returns the number of records (capped at max_out).
// ---------------------------------------------------------------------------

int64_t vrv_emissive_faces(const uint8_t* grid, const int64_t* size,
                           const uint8_t* translucent,
                           const float* tex_lum, int n_blocks_incl_air,
                           int32_t* out_cells_faces /* (max_out, 4) */,
                           int64_t max_out) {
    const uint8_t air = (uint8_t)(n_blocks_incl_air - 1);
    static const int off[6][3] = {{-1, 0, 0}, {1, 0, 0}, {0, -1, 0},
                                  {0, 1, 0},  {0, 0, -1}, {0, 0, 1}};
    int64_t n = 0;
    for (int64_t x = 0; x < size[0]; ++x)
        for (int64_t y = 0; y < size[1]; ++y)
            for (int64_t z = 0; z < size[2]; ++z) {
                uint8_t b = grid[(x * size[1] + y) * size[2] + z];
                if (b == air) continue;
                for (int f = 0; f < 6; ++f) {
                    if (tex_lum[b * 6 + f] <= 0.0f) continue;
                    uint8_t nb = cell_block(grid, size, x + off[f][0],
                                            y + off[f][1], z + off[f][2], air);
                    if (!translucent[nb]) continue;
                    if (n < max_out) {
                        out_cells_faces[n * 4 + 0] = (int32_t)x;
                        out_cells_faces[n * 4 + 1] = (int32_t)y;
                        out_cells_faces[n * 4 + 2] = (int32_t)z;
                        out_cells_faces[n * 4 + 3] = f;
                    }
                    ++n;
                }
            }
    return n;
}

// ---------------------------------------------------------------------------
// face-culled mesh face count (gen_mesh parity helper): counts faces that
// chunk.rs:147-281 would emit for a volume with air padding.
// ---------------------------------------------------------------------------

int64_t vrv_count_mesh_faces(const uint8_t* grid, const int64_t* size,
                             const uint8_t* translucent, int n_blocks_incl_air) {
    const uint8_t air = (uint8_t)(n_blocks_incl_air - 1);
    static const int off[6][3] = {{-1, 0, 0}, {1, 0, 0}, {0, -1, 0},
                                  {0, 1, 0},  {0, 0, -1}, {0, 0, 1}};
    int64_t n = 0;
    for (int64_t x = 0; x < size[0]; ++x)
        for (int64_t y = 0; y < size[1]; ++y)
            for (int64_t z = 0; z < size[2]; ++z) {
                uint8_t b = grid[(x * size[1] + y) * size[2] + z];
                if (b == air) continue;
                for (int f = 0; f < 6; ++f) {
                    uint8_t nb = cell_block(grid, size, x + off[f][0],
                                            y + off[f][1], z + off[f][2], air);
                    if (translucent[nb]) ++n;
                }
            }
    return n;
}

}  // extern "C"
