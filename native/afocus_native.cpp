// Native host-side geometry kernels for the data pipeline.
//
// The reference reaches native code through torch's CUDA grid_sample and the c3d
// binary (SURVEY.md §2); here the host-side equivalents (dataset build, offline
// preprocessing) get a C++ fast path so the single host core is not bottlenecked by
// interpreter overhead when the TPU is busy. Semantics match
// acquisition_focus_tpu.ops.resample.grid_sample exactly (torch affine_grid +
// grid_sample, align_corners=False, zero padding).
//
// Build: scripts/build_native.sh  ->  native/libafocus.so  (ctypes, no pybind11)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Trilinear / nearest affine resample.
//  vol:   C x D x H x W float32 (C-contiguous)
//  theta: 4x4 row-major grid-space affine (torch convention)
//  out:   C x Do x Ho x Wo float32
void resample_affine(const float* vol, int64_t C, int64_t D, int64_t H, int64_t W,
                     const double* theta, int64_t Do, int64_t Ho, int64_t Wo,
                     int nearest, float* out) {
    const double a00 = theta[0], a01 = theta[1], a02 = theta[2], a03 = theta[3];
    const double a10 = theta[4], a11 = theta[5], a12 = theta[6], a13 = theta[7];
    const double a20 = theta[8], a21 = theta[9], a22 = theta[10], a23 = theta[11];

    const int64_t in_plane = H * W;
    const int64_t in_vol = D * in_plane;
    const int64_t out_plane = Ho * Wo;
    const int64_t out_vol = Do * out_plane;

    for (int64_t d = 0; d < Do; ++d) {
        const double gz = (2.0 * d + 1.0) / Do - 1.0;
        for (int64_t h = 0; h < Ho; ++h) {
            const double gy = (2.0 * h + 1.0) / Ho - 1.0;
            for (int64_t w = 0; w < Wo; ++w) {
                const double gx = (2.0 * w + 1.0) / Wo - 1.0;
                // normalized sample point
                const double sx = a00 * gx + a01 * gy + a02 * gz + a03;
                const double sy = a10 * gx + a11 * gy + a12 * gz + a13;
                const double sz = a20 * gx + a21 * gy + a22 * gz + a23;
                // continuous voxel coords (align_corners=False)
                const double ix = ((sx + 1.0) * W - 1.0) * 0.5;
                const double iy = ((sy + 1.0) * H - 1.0) * 0.5;
                const double iz = ((sz + 1.0) * D - 1.0) * 0.5;
                const int64_t o = d * out_plane + h * Wo + w;

                if (nearest) {
                    const int64_t xi = (int64_t)std::nearbyint(ix);
                    const int64_t yi = (int64_t)std::nearbyint(iy);
                    const int64_t zi = (int64_t)std::nearbyint(iz);
                    const bool ok = xi >= 0 && xi < W && yi >= 0 && yi < H &&
                                    zi >= 0 && zi < D;
                    const int64_t src = zi * in_plane + yi * W + xi;
                    for (int64_t c = 0; c < C; ++c)
                        out[c * out_vol + o] = ok ? vol[c * in_vol + src] : 0.0f;
                    continue;
                }

                const int64_t x0 = (int64_t)std::floor(ix);
                const int64_t y0 = (int64_t)std::floor(iy);
                const int64_t z0 = (int64_t)std::floor(iz);
                const double fx = ix - x0, fy = iy - y0, fz = iz - z0;

                for (int64_t c = 0; c < C; ++c) {
                    double acc = 0.0;
                    const float* vc = vol + c * in_vol;
                    for (int dz = 0; dz <= 1; ++dz) {
                        const int64_t z = z0 + dz;
                        if (z < 0 || z >= D) continue;
                        const double wz = dz ? fz : 1.0 - fz;
                        for (int dy = 0; dy <= 1; ++dy) {
                            const int64_t y = y0 + dy;
                            if (y < 0 || y >= H) continue;
                            const double wy = dy ? fy : 1.0 - fy;
                            for (int dx = 0; dx <= 1; ++dx) {
                                const int64_t x = x0 + dx;
                                if (x < 0 || x >= W) continue;
                                const double wx = dx ? fx : 1.0 - fx;
                                acc += wz * wy * wx *
                                       (double)vc[z * in_plane + y * W + x];
                            }
                        }
                    }
                    out[c * out_vol + o] = (float)acc;
                }
            }
        }
    }
}

// Foreground mass center of an int32 label volume (for crop_around_label_center).
void label_center(const int32_t* label, int64_t D, int64_t H, int64_t W,
                  double* center_dhw) {
    double sd = 0, sh = 0, sw = 0, n = 0;
    int64_t i = 0;
    for (int64_t d = 0; d < D; ++d)
        for (int64_t h = 0; h < H; ++h)
            for (int64_t w = 0; w < W; ++w, ++i)
                if (label[i] != 0) { sd += d; sh += h; sw += w; n += 1; }
    if (n == 0) { center_dhw[0] = D / 2.0; center_dhw[1] = H / 2.0;
                  center_dhw[2] = W / 2.0; return; }
    center_dhw[0] = sd / n; center_dhw[1] = sh / n; center_dhw[2] = sw / n;
}

}  // extern "C"
