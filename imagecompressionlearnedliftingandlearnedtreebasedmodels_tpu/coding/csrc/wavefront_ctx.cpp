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
  const int in_g = in_total / groups;
  const int out_g = out_total / groups;
  for (int o = 0; o < out_total; ++o) {
    const int g = o / out_g;
    const float* wo = w + static_cast<int64_t>(o) * in_g;
    float* yrow = yT + static_cast<int64_t>(o) * n;
    const float bias = b ? b[o] : 0.0f;
    for (int64_t p = 0; p < n; ++p) yrow[p] = bias;
    const float* xbase = xT + static_cast<int64_t>(g) * in_g * n;
    for (int i = 0; i < in_g; ++i) {
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

// fusedT (already built, interleaved plc/csc blocks per group) -> idx/mu.
inline void level_core(LevelBufs* bufs, int64_t n, int32_t so,
                       const LevelParams& P, int32_t* idx_out,
                       float* mu_out) {
  const int fused_n = 2 * so * 81;
  bufs->h1T.resize(static_cast<size_t>(P.out1) * n);
  bufs->h2T.resize(static_cast<size_t>(P.out2) * n);
  bufs->h3T.resize(static_cast<size_t>(P.out3) * n);
  bufs->h4T.resize(static_cast<size_t>(P.out4) * n);
  grouped_gemm_lrelu_T(bufs->fusedT.data(), fused_n, P.w1, P.b1, P.out1, so,
                       true, n, bufs->h1T.data());
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

// csc taps: rows 0,1 full; row 2 cols 0,1 (mask-A over 5x5)
constexpr int kCscTaps[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};

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

  LevelBufs bufs;
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
    // patch top-left at the unpadded coordinate: tap pos (pr,pc) of the
    // center (r,c) reads padded[r+pr][c+pc] (pad=2 -> center at +2,+2)
    level_build_fusedT(
        &bufs, n, so, P,
        [&](int64_t p, int pos, int g) {
          const int64_t r = rr_buf[p] + pos / 5, c = cc_buf[p] + pos % 5;
          return padded[(r * wpad + c) * so + g];
        },
        [&](int64_t p) {
          return plc + (static_cast<int64_t>(rr_buf[p]) * w + cc_buf[p])
                     * wide;
        });
    level_core(&bufs, n, so, P, idx_buf.data(), mu_buf.data());

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

}  // extern "C"
