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

inline void grouped_matmul_lrelu(const float* __restrict__ x, int in_total,
                                 const float* __restrict__ w,
                                 const float* __restrict__ b,
                                 int out_total, int groups, bool act,
                                 float* __restrict__ y) {
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
#pragma omp simd reduction(+ : acc)
    for (int i = 0; i < in_g; ++i) {
      acc += xg[i] * wo[i];
    }
    y[o] = (act && acc < 0.0f) ? acc * kLReLU : acc;
  }
}

// Batched form over a whole diagonal: activations live transposed as
// (channels, n) so the n centers are the unit-stride SIMD axis and every
// weight is read ONCE per diagonal instead of once per center (the
// per-center form is L2-bandwidth-bound on the 315 KB cgp layer-1 weights).
inline void grouped_gemm_lrelu_T(const float* __restrict__ xT, int in_total,
                                 const float* __restrict__ w,
                                 const float* __restrict__ b,
                                 int out_total, int groups, bool act,
                                 int64_t n, float* __restrict__ yT) {
  // Input channels unrolled by 4: one y-row load/store pass covers four
  // inputs (the plain axpy form was store-bound at ~4.6 GMAC/s; this form
  // measured ~3x that). Each y element still accumulates in a FIXED
  // (i ascending, left-to-right within the 4-term sum) order — determinism
  // of the coding arithmetic is per-binary and checked against
  // ``ztsep_ctx_fingerprint`` at decode time.
  const int in_g = in_total / groups;
  const int out_g = out_total / groups;
  for (int o = 0; o < out_total; ++o) {
    const int g = o / out_g;
    const float* wo = w + static_cast<int64_t>(o) * in_g;
    float* yrow = yT + static_cast<int64_t>(o) * n;
    const float bias = b ? b[o] : 0.0f;
    for (int64_t p = 0; p < n; ++p) yrow[p] = bias;
    const float* xbase = xT + static_cast<int64_t>(g) * in_g * n;
    int i = 0;
    for (; i + 4 <= in_g; i += 4) {
      const float w0 = wo[i], w1 = wo[i + 1], w2 = wo[i + 2], w3 = wo[i + 3];
      const float* __restrict__ x0 = xbase + static_cast<int64_t>(i) * n;
      const float* __restrict__ x1 = x0 + n;
      const float* __restrict__ x2 = x1 + n;
      const float* __restrict__ x3 = x2 + n;
#pragma omp simd
      for (int64_t p = 0; p < n; ++p)
        yrow[p] += w0 * x0[p] + w1 * x1[p] + w2 * x2[p] + w3 * x3[p];
    }
    for (; i < in_g; ++i) {
      const float wv = wo[i];
      const float* __restrict__ xrow = xbase + static_cast<int64_t>(i) * n;
#pragma omp simd
      for (int64_t p = 0; p < n; ++p) yrow[p] += wv * xrow[p];
    }
    if (act) {
      for (int64_t p = 0; p < n; ++p)
        yrow[p] = yrow[p] < 0.0f ? yrow[p] * kLReLU : yrow[p];
    }
  }
}

// Same, but accumulating ONTO an already-initialized yT (bias/base included
// by the caller) with the LReLU applied afterwards.
inline void grouped_gemm_acc_lrelu_T(const float* __restrict__ xT,
                                     int in_total,
                                     const float* __restrict__ w,
                                     int out_total, int groups, bool act,
                                     int64_t n, float* __restrict__ yT) {
  const int in_g = in_total / groups;
  const int out_g = out_total / groups;
  for (int o = 0; o < out_total; ++o) {
    const int g = o / out_g;
    const float* wo = w + static_cast<int64_t>(o) * in_g;
    float* yrow = yT + static_cast<int64_t>(o) * n;
    const float* xbase = xT + static_cast<int64_t>(g) * in_g * n;
    int i = 0;
    for (; i + 4 <= in_g; i += 4) {
      const float w0 = wo[i], w1 = wo[i + 1], w2 = wo[i + 2], w3 = wo[i + 3];
      const float* __restrict__ x0 = xbase + static_cast<int64_t>(i) * n;
      const float* __restrict__ x1 = x0 + n;
      const float* __restrict__ x2 = x1 + n;
      const float* __restrict__ x3 = x2 + n;
#pragma omp simd
      for (int64_t p = 0; p < n; ++p)
        yrow[p] += w0 * x0[p] + w1 * x1[p] + w2 * x2[p] + w3 * x3[p];
    }
    for (; i < in_g; ++i) {
      const float wv = wo[i];
      const float* __restrict__ xrow = xbase + static_cast<int64_t>(i) * n;
#pragma omp simd
      for (int64_t p = 0; p < n; ++p) yrow[p] += wv * xrow[p];
    }
    if (act) {
      for (int64_t p = 0; p < n; ++p)
        yrow[p] = yrow[p] < 0.0f ? yrow[p] * kLReLU : yrow[p];
    }
  }
}

// Level-path center evaluation, shared by the per-diagonal entry point and
// the fully-native plane walk below. The masked 5x5 csc conv reads its 12
// causal taps (rows 0,1 full; row 2 cols 0,1) either from gathered patches
// or straight from the padded plane; the cgp 1x1 stack then runs batched
// over the diagonal with centers as the unit-stride SIMD axis.

struct LevelParams {
  const float *csc_w, *csc_b;
  const float *w1, *b1, *w2, *b2, *w3, *b3, *w4, *b4;
  int32_t out1, out2, out3, out4;
  const float* scale_table;
  int32_t n_scales;
  float scale_bound;
};

struct LevelBufs {  // reused across diagonals to avoid re-allocation
  std::vector<float> fusedT, h1T, h2T, h3T, h4T;
};

// h1T (already built and activated) -> h2..h4 -> idx/mu.
inline void level_tail_from_h1(LevelBufs* bufs, int64_t n, int32_t so,
                               const LevelParams& P, int32_t* idx_out,
                               float* mu_out) {
  bufs->h2T.resize(static_cast<size_t>(P.out2) * n);
  bufs->h3T.resize(static_cast<size_t>(P.out3) * n);
  bufs->h4T.resize(static_cast<size_t>(P.out4) * n);
  grouped_gemm_lrelu_T(bufs->h1T.data(), P.out1, P.w2, P.b2, P.out2, so,
                       true, n, bufs->h2T.data());
  grouped_gemm_lrelu_T(bufs->h2T.data(), P.out2, P.w3, P.b3, P.out3, so,
                       true, n, bufs->h3T.data());
  grouped_gemm_lrelu_T(bufs->h3T.data(), P.out3, P.w4, P.b4, P.out4, so,
                       false, n, bufs->h4T.data());

  // h4: per group (sigma, mu) interleaved over groups: channels
  // [2g] = sigma_g, [2g+1] = mu_g (global 0::2 / 1::2 split)
  const float* h4T = bufs->h4T.data();
  for (int64_t p = 0; p < n; ++p) {
    for (int g = 0; g < so; ++g) {
      float sigma = h4T[static_cast<int64_t>(2 * g) * n + p];
      const float mu = h4T[static_cast<int64_t>(2 * g + 1) * n + p];
      if (sigma < P.scale_bound) sigma = P.scale_bound;
      int32_t idx = 0;
      for (int s = 0; s < P.n_scales - 1; ++s) {
        if (sigma > P.scale_table[s]) ++idx;
      }
      idx_out[p * so + g] = idx;
      mu_out[p * so + g] = mu;
    }
  }
}

// fusedT (already built, interleaved plc/csc blocks per group) -> idx/mu.
inline void level_core(LevelBufs* bufs, int64_t n, int32_t so,
                       const LevelParams& P, int32_t* idx_out,
                       float* mu_out) {
  const int fused_n = 2 * so * 81;
  bufs->h1T.resize(static_cast<size_t>(P.out1) * n);
  grouped_gemm_lrelu_T(bufs->fusedT.data(), fused_n, P.w1, P.b1, P.out1, so,
                       true, n, bufs->h1T.data());
  level_tail_from_h1(bufs, n, so, P, idx_out, mu_out);
}

// csc taps: rows 0,1 full; row 2 cols 0,1 (mask-A over 5x5)
constexpr int kCscTaps[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};

// ---------------------------------------------------------------------------
// Blocked planar 3x3 SAME conv for the whole-plane parent-context (plc)
// pass. Planes are channel-planar with a padded row stride (ws + 2, ws =
// round_up(w, 32)) so the 32-pixel tiles never need edge handling. Each
// output element accumulates in a FIXED (tap-major, channel-ascending)
// order with independent SIMD lanes along the pixel axis — vector width
// never changes the result; FMA contraction is the only arch-dependent
// freedom and is guarded by the runtime fingerprint below.
//
// wpack layout: (ceil(cout/4), 9, cin, 4) — the 4 outputs of a block are
// interleaved innermost so one (tap, channel) step feeds 4 broadcasts.
// out_off = 0 writes unpadded (h, ws) planes; out_off = 1 writes into
// 1-padded (h+2, ws+2) planes at offset (1,1) so the result can feed the
// next conv (the caller must re-zero the junk tail columns [w+1, ws+2)
// when ws > w).
inline void conv3x3_planar(const float* __restrict__ in, int cin, int h,
                           int ws, const float* __restrict__ wpack,
                           const float* __restrict__ bias, int cout_p4,
                           bool act, float* __restrict__ out, int out_off) {
  const int pstr = ws + 2;
  constexpr int TP = 32;
  static_assert(TP == 32, "tile width is the planar padding quantum");
  const int64_t in_plane = static_cast<int64_t>(h + 2) * pstr;
  const int out_str = out_off ? pstr : ws;
  const int64_t out_plane =
      static_cast<int64_t>(h + 2 * out_off) * out_str;
  // Row-major over output rows, out-blocks inner: the 3-row input strip a
  // row touches (~750 KB at 243 channels) stays L2-resident across all
  // out-blocks instead of restreaming the whole input plane per block
  // (measured 30.8 -> 66 GFLOP/s on the 243-wide finest-level conv).
  for (int r = 0; r < h; ++r) {
    for (int ob = 0; ob < cout_p4 / 4; ++ob) {
      const float* wb = wpack + static_cast<int64_t>(ob) * 9 * cin * 4;
      const float b0 = bias[ob * 4 + 0], b1 = bias[ob * 4 + 1];
      const float b2 = bias[ob * 4 + 2], b3 = bias[ob * 4 + 3];
      for (int p0 = 0; p0 < ws; p0 += TP) {
        float a0[TP], a1[TP], a2[TP], a3[TP];
        for (int t = 0; t < TP; ++t) {
          a0[t] = b0; a1[t] = b1; a2[t] = b2; a3[t] = b3;
        }
        for (int t = 0; t < 9; ++t) {
          const float* inb =
              in + static_cast<int64_t>(r + t / 3) * pstr + p0 + t % 3;
          const float* wt = wb + static_cast<int64_t>(t) * cin * 4;
          for (int c = 0; c < cin; ++c) {
            const float* __restrict__ x = inb + c * in_plane;
            const float w0 = wt[c * 4 + 0], w1 = wt[c * 4 + 1];
            const float w2 = wt[c * 4 + 2], w3 = wt[c * 4 + 3];
#pragma omp simd
            for (int q = 0; q < TP; ++q) {
              const float xv = x[q];
              a0[q] += w0 * xv; a1[q] += w1 * xv;
              a2[q] += w2 * xv; a3[q] += w3 * xv;
            }
          }
        }
        float* ob0 = out + static_cast<int64_t>(ob * 4) * out_plane
                     + static_cast<int64_t>(r + out_off) * out_str + p0
                     + out_off;
        float* rows[4] = {ob0, ob0 + out_plane, ob0 + 2 * out_plane,
                          ob0 + 3 * out_plane};
        const float* accs[4] = {a0, a1, a2, a3};
        for (int o = 0; o < 4; ++o) {
          const float* a = accs[o];
          float* y = rows[o];
          if (act) {
            for (int q = 0; q < TP; ++q)
              y[q] = a[q] < 0.0f ? a[q] * kLReLU : a[q];
          } else {
            for (int q = 0; q < TP; ++q) y[q] = a[q];
          }
        }
      }
    }
  }
}

// Build fusedT for one diagonal reading csc taps via `tap(p, pos)` and
// plc rows via `plcrow(p)`; group g rows [g*162, g*162+81) = plc_g,
// [g*162+81, g*162+162) = csc_g.
template <typename TapFn, typename PlcFn>
inline void level_build_fusedT(LevelBufs* bufs, int64_t n, int32_t so,
                               const LevelParams& P, TapFn tap,
                               PlcFn plcrow) {
  const int wide = so * 81;
  bufs->fusedT.resize(static_cast<size_t>(2 * wide) * n);
  float* fusedT = bufs->fusedT.data();
  for (int64_t p = 0; p < n; ++p) {
    for (int o = 0; o < wide; ++o) {
      const int g = o / 81;
      const float* wo = P.csc_w + static_cast<int64_t>(o) * 25;
      float acc = P.csc_b[o];
      for (int m = 0; m < 12; ++m) {
        const int pos = kCscTaps[m];
        acc += tap(p, pos, g) * wo[pos];
      }
      fusedT[(static_cast<int64_t>(g) * 162 + 81 + o % 81) * n + p] = acc;
    }
    const float* plc_p = plcrow(p);
    for (int g = 0; g < so; ++g)
      for (int i = 0; i < 81; ++i)
        fusedT[(static_cast<int64_t>(g) * 162 + i) * n + p] =
            plc_p[g * 81 + i];
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
  const LevelParams P{csc_w, csc_b, w1, b1, w2, b2, w3, b3, w4, b4,
                      out1, out2, out3, out4,
                      scale_table, n_scales, scale_bound};
  LevelBufs bufs;
  level_build_fusedT(
      &bufs, n, so, P,
      [&](int64_t p, int pos, int g) {
        return patches[(p * 25 + pos) * so + g];
      },
      [&](int64_t p) { return plc + p * static_cast<int64_t>(so) * 81; });
  level_core(&bufs, n, so, P, idx_out, mu_out);
}

// Whole-plane parent-context (plc) pass on the HOST: nearest x2 upsample of
// the decoded parent + dense 3x3 conv (LReLU) + dense 3x3 conv — the
// reference's plc CNN (LiftingBasedDWT_net.py:271-272,348) evaluated with
// deterministic, backend-free arithmetic. Replaces the accelerator pass
// that (a) pinned bitstreams to the encoding backend's bf16 accumulation
// order and (b) on tunneled TPUs read back a (h, w, 81*so) float plane
// (~95 MB at the finest Kodak level) per level per direction.
//   parent: (h2, w2, so) HWC;  out: (h, w, wide) HWC, h=2*h2, w=2*w2.
//   w1pack: (ceil(wide/4), 9, so, 4); w2pack: (ceil(wide/4), 9, wide, 4)
//   (biases zero-padded to the same rounded widths).
void ztsep_plc_plane(
    const float* parent, int32_t h2, int32_t w2, int32_t so,
    const float* w1pack, const float* b1, int32_t wide,
    const float* w2pack, const float* b2,
    float* out) {
  const int h = 2 * h2, w = 2 * w2;
  const int ws = (w + 31) & ~31;
  const int pstr = ws + 2;
  const int wide_p4 = (wide + 3) & ~3;
  const int64_t plane_pad = static_cast<int64_t>(h + 2) * pstr;

  // upsampled input, planar padded
  std::vector<float> xpad(static_cast<size_t>(so) * plane_pad, 0.0f);
  for (int c = 0; c < so; ++c) {
    float* xc = xpad.data() + c * plane_pad;
    for (int r = 0; r < h; ++r) {
      const float* prow = parent + static_cast<int64_t>(r >> 1) * w2 * so;
      float* xr = xc + static_cast<int64_t>(r + 1) * pstr + 1;
      for (int p = 0; p < w; ++p) xr[p] = prow[(p >> 1) * so + c];
    }
  }

  // conv1 -> padded planar (junk tail columns re-zeroed), LReLU
  std::vector<float> a1(static_cast<size_t>(wide_p4) * plane_pad, 0.0f);
  conv3x3_planar(xpad.data(), so, h, ws, w1pack, b1, wide_p4, true,
                 a1.data(), 1);
  if (ws > w) {
    for (int c = 0; c < wide_p4; ++c) {
      float* ac = a1.data() + c * plane_pad;
      for (int r = 1; r <= h; ++r) {
        float* row = ac + static_cast<int64_t>(r) * pstr;
        for (int p = w + 1; p < pstr; ++p) row[p] = 0.0f;
      }
    }
  }

  // conv2 -> unpadded planar, then planar -> HWC
  std::vector<float> a2(static_cast<size_t>(wide_p4) * h * ws);
  conv3x3_planar(a1.data(), wide, h, ws, w2pack, b2, wide_p4, false,
                 a2.data(), 0);
  const int64_t oplane = static_cast<int64_t>(h) * ws;
  for (int r = 0; r < h; ++r) {
    for (int o = 0; o < wide; ++o) {
      const float* src = a2.data() + o * oplane
                         + static_cast<int64_t>(r) * ws;
      float* dst = out + (static_cast<int64_t>(r) * w) * wide + o;
      for (int p = 0; p < w; ++p) dst[static_cast<int64_t>(p) * wide] =
          src[p];
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Incremental 5-layer masked PixelCNN plane walk (the xe / coarsest-details
// paths, reference LiftingBasedDWT_net.py:298-317). Instead of re-running the
// masked stack over an 11x11 dependency cone per center (~1.1M MAC/center),
// every layer activation is computed exactly ONCE per pixel across the whole
// wavefront walk (~45k*ic MAC/pixel, ~24x less): when diagonal d's pixels are
// about to be decoded, each layer's activations AT those pixels depend only
// on already-computed values — layer 0 is mask-A (no center tap, inputs are
// decoded pixels of diagonals < d) and layers 1..4 are mask-B whose center
// tap reads the PREVIOUS layer at the same pixel, computed earlier in the
// same call. The caller owns per-layer activation planes (zero-initialized,
// 1-pixel zero padding) that persist across the walk.
//
// Layer l: 3x3 conv grouped by ic, mask A for l=0 (taps r0c0 r0c1 r0c2 r1c0)
// and mask B for l>0 (+ center tap), LeakyReLU(0.01) after layers 0..3.
// Weights pre-transposed by the binding to (out, 9, in_g); channels of the
// final layer are per-group (sigma, mu) pairs: [2g] = sigma_g, [2g+1] = mu_g.

namespace {

struct LayerSpec {
  const float* w;  // (out, 9, in_g)
  const float* b;  // (out)
  int out_ch;
  int in_ch;
};

// Evaluate layer l at the n wavefront pixels. ``in`` is the previous
// activation plane (or the decoded plane for l=0), row-major with
// ``in_pad`` zero padding and ``in_ch`` contiguous channels per pixel;
// ``out`` is this layer's plane (1-pixel padding) or, for the last layer,
// a dense (n, out_ch) buffer.
inline void pixelcnn_layer_at(const float* __restrict__ in, int in_pad,
                              int w_img, const LayerSpec& L, int groups,
                              bool mask_a, bool act,
                              const int64_t* rows, const int64_t* cols,
                              int64_t n, float* __restrict__ out,
                              int out_pad, bool out_plane, int w_out) {
  const int in_g = L.in_ch / groups;
  const int out_g = L.out_ch / groups;
  const int ntaps = mask_a ? 4 : 5;
  const int64_t in_stride = static_cast<int64_t>(w_img + 2 * in_pad) * L.in_ch;
  for (int64_t p = 0; p < n; ++p) {
    const int64_t r = rows[p], c = cols[p];
    float* yp = out_plane
        ? out + ((r + out_pad) * (w_out + 2 * out_pad) + (c + out_pad))
                    * L.out_ch
        : out + p * L.out_ch;
    for (int o = 0; o < L.out_ch; ++o) {
      const int g = o / out_g;
      const float* wo = L.w + static_cast<int64_t>(o) * 9 * in_g;
      float acc = L.b[o];
      for (int t = 0; t < ntaps; ++t) {
        const int64_t rr = r + t / 3 - 1 + in_pad;
        const int64_t cc = c + t % 3 - 1 + in_pad;
        const float* __restrict__ x =
            in + rr * in_stride + cc * L.in_ch + g * in_g;
        const float* __restrict__ wt = wo + t * in_g;
#pragma omp simd reduction(+ : acc)
        for (int i = 0; i < in_g; ++i) acc += wt[i] * x[i];
      }
      yp[o] = (act && acc < 0.0f) ? acc * kLReLU : acc;
    }
  }
}

}  // namespace

extern "C" {

// One wavefront step: given the decoded plane so far (row-major, ``pad``
// zero padding, ic channels) and the diagonal's pixel coords, advance the
// four persistent activation planes a0..a3 (each (h+2)x(w+2)xout_l,
// 1-pixel padding, zero-initialized by the caller before the walk) at those
// pixels and emit the centers' CDF rows + mu.
// Weights wl (out_l, 9, in_l/ic); outs (81ic, 81ic, 27ic, 9ic, 2ic).
void ztsep_pixelcnn_step(
    const float* plane, int32_t h, int32_t w, int32_t pad, int32_t ic,
    const int64_t* rows, const int64_t* cols, int64_t n,
    float* a0, float* a1, float* a2, float* a3,
    const float* w0, const float* b0, int32_t o0,
    const float* w1, const float* b1, int32_t o1,
    const float* w2, const float* b2, int32_t o2,
    const float* w3, const float* b3, int32_t o3,
    const float* w4, const float* b4, int32_t o4,
    const float* scale_table, int32_t n_scales, float scale_bound,
    int32_t* idx_out, float* mu_out) {
  (void)h;
  const LayerSpec specs[5] = {
      {w0, b0, o0, ic}, {w1, b1, o1, o0}, {w2, b2, o2, o1},
      {w3, b3, o3, o2}, {w4, b4, o4, o3}};
  float* acts[4] = {a0, a1, a2, a3};

  pixelcnn_layer_at(plane, pad, w, specs[0], ic, /*mask_a=*/true,
                    /*act=*/true, rows, cols, n, acts[0], 1, true, w);
  for (int l = 1; l < 4; ++l) {
    pixelcnn_layer_at(acts[l - 1], 1, w, specs[l], ic, false, true, rows,
                      cols, n, acts[l], 1, true, w);
  }
  std::vector<float> head(static_cast<size_t>(n) * o4);
  pixelcnn_layer_at(acts[3], 1, w, specs[4], ic, false, false, rows, cols,
                    n, head.data(), 0, false, w);

  for (int64_t p = 0; p < n; ++p) {
    const float* hp = head.data() + p * o4;
    for (int g = 0; g < ic; ++g) {
      float sigma = hp[2 * g];
      const float mu = hp[2 * g + 1];
      if (sigma < scale_bound) sigma = scale_bound;
      int32_t idx = 0;
      for (int s = 0; s < n_scales - 1; ++s) {
        if (sigma > scale_table[s]) ++idx;
      }
      idx_out[p * ic + g] = idx;
      mu_out[p * ic + g] = mu;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fully-native wavefront walk of one finer-level ("level" kind) detail
// plane: the anti-diagonal loop, per-diagonal center evaluation, rANS
// symbol coding, and decoded-value writeback all run in ONE C++ call —
// the Python per-diagonal loop (numpy gathers + ctypes marshalling per
// step, ~2000 steps for a Kodak-size finest level) is eliminated.
// Replaces the reference's per-pixel Python AR loop
// (LiftingBasedDWT_net.py:469-556) at the plane granularity.
//
// Encode (mode 0): x_true given; emits symbols/indexes (diagonal-major,
// channel-minor — identical stream order to the Python walk) for the
// caller to flush through the buffered rANS encoder, and fills `padded`
// with the decoded values round(x - mu) + mu so the context is
// bit-identical to what the decoder will reconstruct.
// Decode (mode 1): consumes `stream` with an inline rANS decoder
// (rans_core.h — bit-compatible with librans.so by construction) and
// fills `padded`.

#include <cmath>

#include "rans_core.h"

extern "C" {

void ztsep_level_walk(
    int32_t mode, int32_t h, int32_t w, int32_t so,
    float* padded,                 // (h+4, w+4, so) zero-init, pad=2
    const float* plc,              // (h, w, so*81)
    const float* x_true,           // (h, w, so) encode mode, else null
    const float* csc_w, const float* csc_b,
    const float* w1, const float* b1, int32_t out1,
    const float* w2, const float* b2, int32_t out2,
    const float* w3, const float* b3, int32_t out3,
    const float* w4, const float* b4, int32_t out4,
    const float* scale_table, int32_t n_scales, float scale_bound,
    const uint32_t* cdfs, int32_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets,
    const uint8_t* stream, int64_t nbytes,  // decode mode
    int32_t* sym_out, int32_t* idx_out) {   // (h*w*so), encode mode
  const LevelParams P{csc_w, csc_b, w1, b1, w2, b2, w3, b3, w4, b4,
                      out1, out2, out3, out4,
                      scale_table, n_scales, scale_bound};
  const int wpad = w + 4;
  const int64_t wide = static_cast<int64_t>(so) * 81;

  ranscore::RansDecState dec;
  if (mode == 1) dec.init(stream, nbytes);

  // Split cgp layer 1 around the fused [plc_g; csc_g] input blocks:
  // h1 = lrelu(W1p·plc + W1c·csc + b1). The plc half is evaluated straight
  // from the precomputed plc rows (one GEMV per center) instead of
  // materializing fusedT; W1pT is transposed (group, i, out_g) so the
  // per-center accumulation vectorizes over the 162 outputs with a fixed
  // i-ascending order.
  const int out_g1 = out1 / so;
  std::vector<float> W1pT(static_cast<size_t>(so) * 81 * out_g1);
  std::vector<float> W1c(static_cast<size_t>(out1) * 81);
  for (int o = 0; o < out1; ++o) {
    const int g = o / out_g1;
    for (int i = 0; i < 81; ++i) {
      W1pT[(static_cast<size_t>(g) * 81 + i) * out_g1 + (o - g * out_g1)] =
          w1[static_cast<int64_t>(o) * 162 + i];
      W1c[static_cast<size_t>(o) * 81 + i] =
          w1[static_cast<int64_t>(o) * 162 + 81 + i];
    }
  }

  LevelBufs bufs;
  std::vector<float> cscT, acc1(out1);
  std::vector<int32_t> idx_buf;
  std::vector<float> mu_buf;
  std::vector<int32_t> rr_buf, cc_buf;
  int64_t out_pos = 0;

  const int dmax = 3 * (h - 1) + (w - 1);
  for (int d = 0; d <= dmax; ++d) {
    // pixels (r, c = d - 3r) with 0 <= c < w, rows ascending
    const int rlo = d >= w ? (d - w + 3) / 3 : 0;
    const int rhi = d / 3 < h - 1 ? d / 3 : h - 1;
    if (rhi < rlo) continue;
    const int64_t n = rhi - rlo + 1;
    rr_buf.resize(n);
    cc_buf.resize(n);
    for (int64_t p = 0; p < n; ++p) {
      rr_buf[p] = rlo + static_cast<int32_t>(p);
      cc_buf[p] = d - 3 * rr_buf[p];
    }
    idx_buf.resize(n * so);
    mu_buf.resize(n * so);

    // csc: masked 5x5 taps straight off the padded plane, transposed
    // (patch top-left at the unpadded coordinate; pad=2 -> center +2,+2)
    cscT.resize(static_cast<size_t>(wide) * n);
    for (int64_t p = 0; p < n; ++p) {
      const int64_t r0 = rr_buf[p], c0 = cc_buf[p];
      for (int o = 0; o < wide; ++o) {
        const int g = o / 81;
        const float* wo = P.csc_w + static_cast<int64_t>(o) * 25;
        float acc = P.csc_b[o];
        for (int m = 0; m < 12; ++m) {
          const int pos = kCscTaps[m];
          acc += padded[((r0 + pos / 5) * wpad + c0 + pos % 5) * so + g]
                 * wo[pos];
        }
        cscT[static_cast<size_t>(o) * n + p] = acc;
      }
    }
    // h1 = b1 + W1p·plc (per-center GEMV), scattered into h1T columns
    bufs.h1T.resize(static_cast<size_t>(out1) * n);
    for (int64_t p = 0; p < n; ++p) {
      const float* plc_p =
          plc + (static_cast<int64_t>(rr_buf[p]) * w + cc_buf[p]) * wide;
      for (int o = 0; o < out1; ++o) acc1[o] = P.b1[o];
      for (int g = 0; g < so; ++g) {
        float* ag = acc1.data() + static_cast<size_t>(g) * out_g1;
        const float* wg = W1pT.data()
                          + static_cast<size_t>(g) * 81 * out_g1;
        for (int i = 0; i < 81; ++i) {
          const float v = plc_p[g * 81 + i];
          const float* __restrict__ wrow = wg + static_cast<size_t>(i)
                                           * out_g1;
#pragma omp simd
          for (int o = 0; o < out_g1; ++o) ag[o] += wrow[o] * v;
        }
      }
      float* h1 = bufs.h1T.data();
      for (int o = 0; o < out1; ++o)
        h1[static_cast<size_t>(o) * n + p] = acc1[o];
    }
    // += W1c·csc, LReLU, then the shared cgp tail
    grouped_gemm_acc_lrelu_T(cscT.data(), static_cast<int>(wide),
                             W1c.data(), out1, so, true, n,
                             bufs.h1T.data());
    level_tail_from_h1(&bufs, n, so, P, idx_buf.data(), mu_buf.data());

    for (int64_t p = 0; p < n; ++p) {
      const int64_t r = rr_buf[p], c = cc_buf[p];
      float* hat = padded + ((r + 2) * wpad + (c + 2)) * so;
      for (int g = 0; g < so; ++g) {
        const int32_t row = idx_buf[p * so + g];
        const float mu = mu_buf[p * so + g];
        int32_t sym;
        if (mode == 0) {
          const float x = x_true[(r * w + c) * so + g];
          // nearbyintf under the default FP environment rounds half to
          // even — matching np.round in the surrogate/jax paths
          sym = static_cast<int32_t>(nearbyintf(x - mu));
          sym_out[out_pos] = sym;
          idx_out[out_pos] = row;
        } else {
          sym = ranscore::decode_symbol(
              &dec, cdfs + static_cast<int64_t>(row) * cdf_stride,
              cdf_lengths[row], offsets[row]);
        }
        ++out_pos;
        hat[g] = static_cast<float>(sym) + mu;
      }
    }
  }
}

// Runtime arithmetic fingerprint: run EVERY coding-path kernel on a fixed
// pseudorandom workload and FNV-hash the output bits. Two builds/machines
// with equal fingerprints produce bit-identical context parameters and
// therefore bit-compatible streams; the decoder compares fingerprints
// (PlaneStreams.meta["ctx_fp"]) and refuses mismatches loudly instead of
// corrupting planes silently. The free variables this captures: FMA
// contraction and `omp simd reduction` reassociation under -march=native
// (vector-width-dependent), both exercised below via the plc plane pass,
// the grouped gemms, the per-center level evaluator, and the incremental
// PixelCNN step.
uint64_t ztsep_ctx_fingerprint() {
  uint32_t s = 0x12345u;
  auto next = [&s]() {
    s = s * 1664525u + 1013904223u;
    // ~U(-1, 1), 2^-31 grid
    return (static_cast<int32_t>(s) >> 8) * (1.0f / 8388608.0f);
  };
  auto fill = [&next](std::vector<float>& v) {
    for (auto& x : v) x = next();
  };
  uint64_t fp = 1469598103934665603ull;  // FNV-1a 64
  auto mix_bytes = [&fp](const void* p, size_t nbytes) {
    const unsigned char* b = static_cast<const unsigned char*>(p);
    for (size_t i = 0; i < nbytes; ++i) {
      fp ^= b[i];
      fp *= 1099511628211ull;
    }
  };
  auto mix = [&mix_bytes](const std::vector<float>& v) {
    mix_bytes(v.data(), v.size() * 4);
  };

  // 1) whole-plane plc pass (conv3x3_planar, both activations)
  {
    const int so = 3, h2 = 4, w2 = 8, wide = 12;
    std::vector<float> parent(h2 * w2 * so), w1((wide + 3) / 4 * 4 * 9 * so),
        b1((wide + 3) & ~3), w2p((wide + 3) / 4 * 4 * 9 * wide),
        b2((wide + 3) & ~3), out(2 * h2 * 2 * w2 * wide);
    for (auto* v : {&parent, &w1, &b1, &w2p, &b2}) fill(*v);
    ztsep_plc_plane(parent.data(), h2, w2, so, w1.data(), b1.data(), wide,
                    w2p.data(), b2.data(), out.data());
    mix(out);
  }

  // 2) diagonal-batched grouped gemms (plain and accumulate forms)
  {
    const int in_t = 12, out_t = 24, groups = 3;
    std::vector<float> xT(in_t * 16), wg(out_t * (in_t / groups)), bg(out_t),
        yT(out_t * 16), y2T(out_t * 16);
    for (auto* v : {&xT, &wg, &bg}) fill(*v);
    grouped_gemm_lrelu_T(xT.data(), in_t, wg.data(), bg.data(), out_t,
                         groups, true, 16, yT.data());
    for (size_t i = 0; i < y2T.size(); ++i) y2T[i] = bg[i / 16];
    grouped_gemm_acc_lrelu_T(xT.data(), in_t, wg.data(), out_t, groups, true,
                             16, y2T.data());
    mix(yT);
    mix(y2T);
  }

  // 3) per-center level evaluator (csc taps + cgp tail). Cgp widths follow
  // the real ratio constraints: in1 = 2*81 per group, out4 = 2*so.
  {
    const int so = 3, n = 5;
    const int out1 = 18, out2 = 12, out3 = 9, out4 = 2 * so;
    std::vector<float> patches(n * 25 * so), plc(n * so * 81),
        csc_w(so * 81 * 25), csc_b(so * 81),
        w1(out1 * 162), b1(out1), w2(out2 * (out1 / so)), b2(out2),
        w3(out3 * (out2 / so)), b3(out3), w4(out4 * (out3 / so)), b4(out4);
    for (auto* v : {&patches, &plc, &csc_w, &csc_b, &w1, &b1, &w2, &b2, &w3,
                    &b3, &w4, &b4})
      fill(*v);
    std::vector<float> table = {0.2f, 0.5f, 1.0f, 2.0f, 5.0f};
    std::vector<int32_t> idx(n * so);
    std::vector<float> mu(n * so);
    ztsep_level_centers(patches.data(), n, so, plc.data(), csc_w.data(),
                        csc_b.data(), w1.data(), b1.data(), out1, w2.data(),
                        b2.data(), out2, w3.data(), b3.data(), out3,
                        w4.data(), b4.data(), out4, table.data(), 5, 0.11f,
                        idx.data(), mu.data());
    mix_bytes(idx.data(), idx.size() * 4);
    mix(mu);
  }

  // 4) incremental PixelCNN step (masked taps + simd-reduction inner loop)
  {
    const int ic = 1, h = 5, w = 6, pad = 5;
    const int o0 = 8, o1 = 8, o2 = 8, o3 = 8, o4 = 2 * ic;
    std::vector<float> plane((h + 2 * pad) * (w + 2 * pad) * ic);
    fill(plane);
    std::vector<float> ws[5], bs[5];
    const int outs[5] = {o0, o1, o2, o3, o4};
    int in_prev = ic;
    for (int l = 0; l < 5; ++l) {
      ws[l].resize(static_cast<size_t>(outs[l]) * 9 * (in_prev / ic));
      bs[l].resize(outs[l]);
      fill(ws[l]);
      fill(bs[l]);
      in_prev = outs[l];
    }
    std::vector<float> a0((h + 2) * (w + 2) * o0, 0.0f),
        a1((h + 2) * (w + 2) * o1, 0.0f), a2((h + 2) * (w + 2) * o2, 0.0f),
        a3((h + 2) * (w + 2) * o3, 0.0f);
    std::vector<float> table = {0.2f, 0.5f, 1.0f, 2.0f, 5.0f};
    // two anti-diagonals (d = 2r + c) of the h x w plane
    for (int d = 3; d <= 4; ++d) {
      std::vector<int64_t> rows, cols;
      for (int r = 0; r < h; ++r) {
        const int c = d - 2 * r;
        if (c >= 0 && c < w) {
          rows.push_back(r);
          cols.push_back(c);
        }
      }
      std::vector<int32_t> idx(rows.size() * ic);
      std::vector<float> mu(rows.size() * ic);
      ztsep_pixelcnn_step(plane.data(), h, w, pad, ic, rows.data(),
                          cols.data(), static_cast<int64_t>(rows.size()),
                          a0.data(), a1.data(), a2.data(), a3.data(),
                          ws[0].data(), bs[0].data(), o0, ws[1].data(),
                          bs[1].data(), o1, ws[2].data(), bs[2].data(), o2,
                          ws[3].data(), bs[3].data(), o3, ws[4].data(),
                          bs[4].data(), o4, table.data(), 5, 0.11f,
                          idx.data(), mu.data());
      mix_bytes(idx.data(), idx.size() * 4);
      mix(mu);
    }
    mix(a3);
  }
  return fp;
}

}  // extern "C"
