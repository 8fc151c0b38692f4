// Native host RDF kernel: minimum-image pair-distance histograms.
//
// Role: the CPU production route for the RDF histogram when no TPU is
// attached (single-device CPU backend). Mirrors the semantics of the XLA
// kernel in lammps_analysis_tpu/ops/rdf.py::rdf_histogram (itself a
// re-design of the reference's tf.histogram_fixed_width pipeline,
// mdsuite/calculators/radial_distribution_function.py) exactly up to f32
// rounding at bin edges:
//   - minimum image: dx -= L * rint(dx / L)     (round half to even)
//   - mask:          d  <  cutoff               (strict)
//   - bin:           clip(trunc(d / cutoff * n_bins), 0, n_bins - 1)
//
// Design notes (single wide core, AVX-512 via g++ autovectorisation;
// measured 1.12 G pairs/s at the 10240-atom / 500-bin bench workload,
// ~1.9 cycles/pair, vs 76.5 M pairs/s for the jitted XLA-CPU route):
//   - The species layout is the framework's canonical concatenated-block
//     layout (ops/rdf.py::build_species_layout): per-(i-species, j-segment)
//     the unordered pair channel is CONSTANT, so the inner loop carries no
//     per-pair gather and padding rows are never visited.
//   - Two-pass inner loop: pass 1 is a branchless vectorisable sweep that
//     writes a bin slot per j (out-of-cutoff pairs land in rotating dump
//     slots past n_bins); pass 2 is the scalar histogram increment.
//     Splitting the passes lets gcc vectorise the arithmetic (rintf/sqrtf
//     need -fno-math-errno) while the scatter stays scalar.
//   - Pass 2 increments FOUR interleaved sub-histograms (merged at the
//     end): consecutive increments of one array serialise behind
//     store-to-load forwarding (~5 cycles each) whenever neighbouring
//     pairs share a bin — measured 0.44 -> 1.12 G pairs/s from the 4-way
//     split plus rotating dump slots.
//   - Frames are transposed to SoA x/y/z once each (~120 KB at 10k atoms,
//     L2-resident) so pass 1 streams unit-stride.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kChunk = 2048;  // pass-1/pass-2 staging width (8 KB of slots)
constexpr int kWays = 4;      // interleaved sub-histograms in pass 2

}  // namespace

extern "C" int64_t rdf_hist_f32(
    const float* pos,           // (n_frames, n_pad, 3) C-contiguous
    int64_t n_frames, int64_t n_pad,
    const int32_t* seg_start,   // (n_species,) first row of each block
    const int32_t* seg_count,   // (n_species,) real atoms in each block
    int32_t n_species,
    const int32_t* pair_table,  // (n_species, n_species) unordered pair id
    const float* box,           // (3,) edge lengths; nullptr = open bounds
    float cutoff, int32_t n_bins, int32_t n_pairs,
    uint64_t* out)              // (n_pairs, n_bins), caller-zeroed
{
    if (n_bins <= 0 || n_pairs <= 0 || cutoff <= 0.0f) return -1;
    const float cut2 = cutoff * cutoff;
    const float scale = static_cast<float>(n_bins) / cutoff;
    const float bx = box ? box[0] : 0.0f;
    const float by = box ? box[1] : 0.0f;
    const float bz = box ? box[2] : 0.0f;
    const float ibx = box ? 1.0f / bx : 0.0f;
    const float iby = box ? 1.0f / by : 0.0f;
    const float ibz = box ? 1.0f / bz : 0.0f;

    std::vector<float> x(n_pad), y(n_pad), z(n_pad);
    // kWays sub-histograms per pair channel, each with 4 rotating dump
    // slots past n_bins for out-of-cutoff pairs.
    const int32_t stride = n_bins + 4;
    std::vector<uint64_t> hist(
        static_cast<size_t>(n_pairs) * stride * kWays, 0);
    int32_t slots[kChunk];

    for (int64_t f = 0; f < n_frames; ++f) {
        const float* fp = pos + f * n_pad * 3;
        for (int64_t a = 0; a < n_pad; ++a) {
            x[a] = fp[a * 3 + 0];
            y[a] = fp[a * 3 + 1];
            z[a] = fp[a * 3 + 2];
        }
        for (int32_t si = 0; si < n_species; ++si) {
            const int64_t i_lo = seg_start[si];
            const int64_t i_hi = i_lo + seg_count[si];
            for (int64_t i = i_lo; i < i_hi; ++i) {
                const float xi = x[i], yi = y[i], zi = z[i];
                for (int32_t sj = si; sj < n_species; ++sj) {
                    const int64_t j_lo =
                        (sj == si) ? i + 1 : seg_start[sj];
                    const int64_t j_hi = seg_start[sj] + seg_count[sj];
                    uint64_t* hp =
                        hist.data() +
                        static_cast<size_t>(pair_table[si * n_species + sj]) *
                            stride * kWays;
                    uint64_t* h1 = hp + stride;
                    uint64_t* h2 = hp + stride * 2;
                    uint64_t* h3 = hp + stride * 3;
                    for (int64_t j0 = j_lo; j0 < j_hi; j0 += kChunk) {
                        const int len = static_cast<int>(
                            std::min<int64_t>(kChunk, j_hi - j0));
                        const float* xj = x.data() + j0;
                        const float* yj = y.data() + j0;
                        const float* zj = z.data() + j0;
                        if (box) {
                            for (int t = 0; t < len; ++t) {
                                float dx = xi - xj[t];
                                float dy = yi - yj[t];
                                float dz = zi - zj[t];
                                dx -= bx * rintf(dx * ibx);
                                dy -= by * rintf(dy * iby);
                                dz -= bz * rintf(dz * ibz);
                                const float r2 = dx * dx + dy * dy + dz * dz;
                                int32_t bin = static_cast<int32_t>(
                                    sqrtf(r2) * scale);
                                bin = bin < n_bins ? bin : n_bins - 1;
                                slots[t] =
                                    (r2 < cut2) ? bin : n_bins + (t & 3);
                            }
                        } else {
                            for (int t = 0; t < len; ++t) {
                                const float dx = xi - xj[t];
                                const float dy = yi - yj[t];
                                const float dz = zi - zj[t];
                                const float r2 = dx * dx + dy * dy + dz * dz;
                                int32_t bin = static_cast<int32_t>(
                                    sqrtf(r2) * scale);
                                bin = bin < n_bins ? bin : n_bins - 1;
                                slots[t] =
                                    (r2 < cut2) ? bin : n_bins + (t & 3);
                            }
                        }
                        int t = 0;
                        for (; t + 3 < len; t += 4) {
                            ++hp[slots[t]];
                            ++h1[slots[t + 1]];
                            ++h2[slots[t + 2]];
                            ++h3[slots[t + 3]];
                        }
                        for (; t < len; ++t) ++hp[slots[t]];
                    }
                }
            }
        }
    }

    for (int32_t p = 0; p < n_pairs; ++p)
        for (int32_t b = 0; b < n_bins; ++b) {
            const uint64_t* hp =
                hist.data() + static_cast<size_t>(p) * stride * kWays;
            out[static_cast<size_t>(p) * n_bins + b] =
                hp[b] + hp[stride + b] + hp[stride * 2 + b] +
                hp[stride * 3 + b];
        }
    return 0;
}
