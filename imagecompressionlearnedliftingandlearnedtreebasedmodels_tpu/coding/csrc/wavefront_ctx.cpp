// Native per-diagonal context evaluation for the wavefront AR coder.
//
// The ZTsepSubbands finer-level coding step evaluates, for each pixel on an
// anti-diagonal: a masked 5x5 grouped conv center (csc), fusion with the
// precomputed parent context (plc), and a grouped 1x1 conv stack (cgp) to
// (sigma, mu) -> CDF index. These are tiny dense ops dominated by dispatch
// overhead in any tensor framework; this C++ path evaluates a whole
// diagonal's pixels in one call with simple FMA loops.
//
// Weight layout matches the flax params exactly:
//   csc kernel (5,5,1,so*81) grouped by so (input channel g feeds outputs
//   [g*81,(g+1)*81)), bias (so*81)
//   cgp convs 1x1 grouped by so: kernel (in/g, out_total), bias (out_total)
// LeakyReLU slope 0.01 between cgp layers (flax/torch default).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr float kLReLU = 0.01f;

inline void grouped_matmul_lrelu(const float* x, int in_total,
                                 const float* w, const float* b,
                                 int out_total, int groups, bool act,
                                 float* y) {
  // w layout: (out_total, in_per_g) — pre-transposed by the Python binding
  // for unit-stride weight reads (the flax kernel layout (in, out) strides
  // by out_total per tap, which is cache-hostile here).
  const int in_g = in_total / groups;
  const int out_g = out_total / groups;
  for (int o = 0; o < out_total; ++o) {
    const int g = o / out_g;
    const float* xg = x + g * in_g;
    const float* wo = w + static_cast<int64_t>(o) * in_g;
    float acc = b ? b[o] : 0.0f;
    for (int i = 0; i < in_g; ++i) {
      acc += xg[i] * wo[i];
    }
    y[o] = (act && acc < 0.0f) ? acc * kLReLU : acc;
  }
}

}  // namespace

extern "C" {

// Evaluate n level-path centers.
//   patches: (n, 5, 5, so) causal windows (future taps may hold garbage —
//            the mask excludes them)
//   plc:     (n, so*81) parent context at the pixels
//   csc_w:   (5, 5, 1, so*81); csc_b: (so*81)
//   w1..w4 / b1..b4: cgp grouped 1x1 convs, kernel (in_g, out_total)
//   scale_table: (n_scales) ascending; scale_bound lower bound
// Outputs: idx (n, so) int32 CDF rows; mu (n, so) float32.
void ztsep_level_centers(
    const float* patches, int64_t n, int32_t so,
    const float* plc,
    const float* csc_w, const float* csc_b,
    const float* w1, const float* b1, int32_t out1,
    const float* w2, const float* b2, int32_t out2,
    const float* w3, const float* b3, int32_t out3,
    const float* w4, const float* b4, int32_t out4,
    const float* scale_table, int32_t n_scales, float scale_bound,
    int32_t* idx_out, float* mu_out) {
  const int wide = so * 81;          // csc output channels
  const int fused_n = 2 * wide;      // interleaved plc/csc blocks
  std::vector<float> csc(wide), fused(fused_n);
  std::vector<float> h1(out1), h2(out2), h3(out3), h4(out4);

  // mask-A over 5x5: rows 0,1 full; row 2 cols 0,1
  int mask_pos[12];
  int nm = 0;
  for (int r = 0; r < 2; ++r)
    for (int c = 0; c < 5; ++c) mask_pos[nm++] = r * 5 + c;
  mask_pos[nm++] = 2 * 5 + 0;
  mask_pos[nm++] = 2 * 5 + 1;

  for (int64_t p = 0; p < n; ++p) {
    const float* patch = patches + p * 25 * so;
    // csc center: out channel o in group g uses input channel g only.
    // csc_w pre-transposed to (wide, 25) for unit-stride tap reads.
    for (int o = 0; o < wide; ++o) {
      const int g = o / 81;
      const float* wo = csc_w + static_cast<int64_t>(o) * 25;
      float acc = csc_b[o];
      for (int m = 0; m < nm; ++m) {
        const int pos = mask_pos[m];
        acc += patch[pos * so + g] * wo[pos];
      }
      csc[o] = acc;
    }
    // fuse: per group [plc_g(81), csc_g(81)]
    const float* plc_p = plc + p * wide;
    for (int g = 0; g < so; ++g) {
      for (int i = 0; i < 81; ++i) {
        fused[g * 162 + i] = plc_p[g * 81 + i];
        fused[g * 162 + 81 + i] = csc[g * 81 + i];
      }
    }
    grouped_matmul_lrelu(fused.data(), fused_n, w1, b1, out1, so, true,
                         h1.data());
    grouped_matmul_lrelu(h1.data(), out1, w2, b2, out2, so, true, h2.data());
    grouped_matmul_lrelu(h2.data(), out2, w3, b3, out3, so, true, h3.data());
    grouped_matmul_lrelu(h3.data(), out3, w4, b4, out4, so, false,
                         h4.data());
    // h4: per group (sigma, mu) interleaved over groups: channels
    // [2g] = sigma_g, [2g+1] = mu_g (global 0::2 / 1::2 split)
    for (int g = 0; g < so; ++g) {
      float sigma = h4[2 * g];
      const float mu = h4[2 * g + 1];
      if (sigma < scale_bound) sigma = scale_bound;
      int32_t idx = 0;
      for (int s = 0; s < n_scales - 1; ++s) {
        if (sigma > scale_table[s]) ++idx;
      }
      idx_out[p * so + g] = idx;
      mu_out[p * so + g] = mu;
    }
  }
}

}  // extern "C"
