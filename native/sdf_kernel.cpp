// Native host SDF kernel: minimum-image shell selection + (theta, phi)
// 2-D angular histogram.
//
// Role: the CPU production route for the spatial distribution function
// (lammps_analysis_tpu/calculators/spatial_distribution_function.py) when
// no TPU is attached. Mirrors the jitted XLA path's semantics exactly up
// to f32 rounding / libm-vs-XLA acos-atan2 ulp differences:
//   - displacement:  r = pos_b[j] - pos_a[i]
//   - minimum image: dx -= L * rint(dx / L)      (round half to even)
//   - shell mask:    r_min <= d <= d_max         (INCLUSIVE both ends)
//   - same-species:  skip j == i (global index equality)
//   - theta = acos(d > 0 ? z/d : 1),  phi = atan2(y, x)
//   - bins:  clip(int(theta / pi * n), 0, n-1) x
//            clip(int((phi + pi) / (2 pi) * n), 0, n-1)
//     (trunc-toward-zero int cast, matching ops/histogram.py::bin_indices)
//
// Design notes (single wide core, AVX autovectorisation):
//   - The shell selects a tiny fraction of pairs at production
//     workloads (~0.2% at the benchmark r in [1.5, 2.5], 10k atoms), so
//     the kernel is a two-pass loop: pass 1 is a branchless vectorised
//     sweep writing d^2 per j into an L1-resident chunk buffer; pass 2
//     is a scalar scan whose in-shell branch (rare, predictable)
//     computes the two libm angle calls and the histogram increment.
//     The reference analog materialises the full (F, Na, Nb, 3) tensor
//     (mdsuite/calculators/spatial_distribution_function.py:72-330) —
//     5 TB at this shape.
//   - x/y/z are transposed to SoA per frame so pass 1 streams
//     unit-stride (same trick as rdf_kernel.cpp).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int kChunk = 4096;  // pass-1 d^2 staging width (16 KB)
}

extern "C" int64_t sdf_hist_f32(
    const float* pos_a,   // (n_frames, n_a, 3) C-contiguous
    const float* pos_b,   // (n_frames, n_b, 3) C-contiguous
    int64_t n_frames, int64_t n_a, int64_t n_b,
    const float* box,     // (3,) edge lengths; nullptr = open bounds
    float r_min, float r_max, int32_t n_bins,
    int32_t same_species,  // nonzero: skip j == i
    uint64_t* out)         // (n_bins, n_bins), caller-zeroed
{
    if (n_bins <= 0 || r_max <= 0.0f || r_min < 0.0f || r_min > r_max)
        return -1;
    const float lo2 = r_min * r_min;
    const float hi2 = r_max * r_max;
    const float bx = box ? box[0] : 0.0f;
    const float by = box ? box[1] : 0.0f;
    const float bz = box ? box[2] : 0.0f;
    const bool mic = box != nullptr;
    const float pi_f = 3.14159265358979323846f;
    const float two_pi_f = 6.28318530717958647692f;
    const float nb_f = static_cast<float>(n_bins);

    std::vector<float> xb(n_b), yb(n_b), zb(n_b);
    std::vector<float> d2(kChunk);
    std::vector<float> dxs(kChunk), dys(kChunk), dzs(kChunk);

    for (int64_t f = 0; f < n_frames; ++f) {
        const float* pb = pos_b + f * n_b * 3;
        const float* pa = pos_a + f * n_a * 3;
        for (int64_t j = 0; j < n_b; ++j) {
            xb[j] = pb[j * 3 + 0];
            yb[j] = pb[j * 3 + 1];
            zb[j] = pb[j * 3 + 2];
        }
        for (int64_t i = 0; i < n_a; ++i) {
            const float xi = pa[i * 3 + 0];
            const float yi = pa[i * 3 + 1];
            const float zi = pa[i * 3 + 2];
            for (int64_t j0 = 0; j0 < n_b; j0 += kChunk) {
                const int w =
                    static_cast<int>(std::min<int64_t>(kChunk, n_b - j0));
                // pass 1: branchless, vectorisable
                for (int c = 0; c < w; ++c) {
                    float dx = xb[j0 + c] - xi;
                    float dy = yb[j0 + c] - yi;
                    float dz = zb[j0 + c] - zi;
                    if (mic) {
                        dx -= bx * std::rint(dx / bx);
                        dy -= by * std::rint(dy / by);
                        dz -= bz * std::rint(dz / bz);
                    }
                    dxs[c] = dx;
                    dys[c] = dy;
                    dzs[c] = dz;
                    d2[c] = dx * dx + dy * dy + dz * dz;
                }
                // pass 2: scalar scan, rare in-shell branch
                for (int c = 0; c < w; ++c) {
                    const float v = d2[c];
                    if (v < lo2 || v > hi2) continue;
                    if (same_species && j0 + c == i) continue;
                    const float d = std::sqrt(v);
                    // d == 0 only when r_min == 0: acos(1) = 0 (XLA's
                    // where(r > 0, z/r, 1) convention)
                    const float ct = d > 0.0f ? dzs[c] / d : 1.0f;
                    const float theta =
                        std::acos(std::min(1.0f, std::max(-1.0f, ct)));
                    const float phi = std::atan2(dys[c], dxs[c]);
                    // op-for-op the same scaling as bin_indices:
                    // (v - min) / (max - min) * n in f32
                    int ti = static_cast<int>((theta / pi_f) * nb_f);
                    int pj =
                        static_cast<int>(((phi + pi_f) / two_pi_f) * nb_f);
                    ti = std::min(n_bins - 1, std::max(0, ti));
                    pj = std::min(n_bins - 1, std::max(0, pj));
                    ++out[static_cast<int64_t>(ti) * n_bins + pj];
                }
            }
        }
    }
    return 0;
}
