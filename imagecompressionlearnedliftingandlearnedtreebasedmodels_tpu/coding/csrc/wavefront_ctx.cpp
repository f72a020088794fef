// Native per-diagonal context evaluation for the wavefront AR coder.
//
// The ZTsepSubbands finer-level coding step evaluates, for each pixel on an
// anti-diagonal: a masked 5x5 grouped conv center (csc), fusion with the
// precomputed parent context (plc), and a grouped 1x1 conv stack (cgp) to
// (sigma, mu) -> CDF index. These are tiny dense ops dominated by dispatch
// overhead in any tensor framework; this C++ path evaluates a whole
// diagonal's pixels in one call with register-blocked FMA kernels.
//
// Weight layout matches the flax params exactly:
//   csc kernel (5,5,1,so*81) grouped by so (input channel g feeds outputs
//   [g*81,(g+1)*81)), bias (so*81)
//   cgp convs 1x1 grouped by so: kernel (in/g, out_total), bias (out_total)
// LeakyReLU slope 0.01 between cgp layers (flax/torch default).
//
// Algebraic restructuring (bit-identical between the plane walk and the
// per-diagonal entry point, both built on the same core):
//   cgp layer 0 consumes the fused [plc_g ; csc_g] blocks per group, and
//   csc is itself LINEAR (masked 5x5, 12 causal taps). So
//     h1 = lrelu(W1p*plc + W1c*(Csc*x + csc_b) + b1)
//        = lrelu(W1p*plc + (W1c*Csc)*x + (b1 + W1c*csc_b))
//   The 12-tap composed map (W1c*Csc) cuts the csc+fusion cost from
//   ~42k to ~5.8k MAC/center, and the plc half runs as a diagonal-batched
//   grouped GEMM instead of a per-center GEMV. Composition happens HERE in
//   fixed j-ascending order (never in numpy/BLAS) so the arithmetic is
//   covered by ztsep_ctx_fingerprint().

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "rans_core.h"

namespace {

constexpr float kLReLU = 0.01f;

// ---------------------------------------------------------------------------
// Vector micro-kernel plumbing. GCC/Clang vector extensions: 16 f32 lanes,
// legalized to zmm on AVX-512 (see -mprefer-vector-width=512 in the build),
// 2x ymm elsewhere — lane semantics identical either way, so results do not
// depend on the target's vector width. Every accumulator below is built by
// one FMA per (lane, input) in a FIXED input-ascending order; the only
// arch-dependent freedom is FMA contraction, captured by the runtime
// fingerprint at the bottom of this file.
typedef float v16 __attribute__((vector_size(64)));

inline v16 v16load(const float* p) {
  v16 v;
  __builtin_memcpy(&v, p, 64);
  return v;
}
inline void v16store(float* p, v16 v) { __builtin_memcpy(p, &v, 64); }
inline v16 v16splat(float x) {
  // braced form -> single vbroadcastss (or an embedded-broadcast FMA
  // operand); the ((v16){} + x) idiom costs an extra vaddss on the FP
  // ports, which contend with the FMAs
  return (v16){x, x, x, x, x, x, x, x, x, x, x, x, x, x, x, x};
}
inline v16 v16lrelu(v16 a) { return a < 0.0f ? a * kLReLU : a; }

inline int64_t round_up32(int64_t n) { return (n + 31) & ~int64_t(31); }

// OB output rows x 32-pixel tiles over the whole row span [0, n32).
//   x: (in_g, n32) rows for this group;  w: OB rows, stride in_g;
//   y: OB rows, stride n32. acc=false initializes from bias (or 0), else
//   accumulates onto existing y.
template <int OB>
void gemm_rows(const float* __restrict__ xg, int64_t n32,
               const float* __restrict__ w, int in_g,
               const float* __restrict__ bias, bool acc, bool act,
               float* __restrict__ y) {
  for (int64_t p = 0; p < n32; p += 32) {
    v16 a[OB][2];
#pragma GCC unroll 8
    for (int o = 0; o < OB; ++o) {
      if (acc) {
        a[o][0] = v16load(y + static_cast<int64_t>(o) * n32 + p);
        a[o][1] = v16load(y + static_cast<int64_t>(o) * n32 + p + 16);
      } else {
        a[o][0] = a[o][1] = v16splat(bias ? bias[o] : 0.0f);
      }
    }
    for (int i = 0; i < in_g; ++i) {
      const v16 x0 = v16load(xg + static_cast<int64_t>(i) * n32 + p);
      const v16 x1 = v16load(xg + static_cast<int64_t>(i) * n32 + p + 16);
#pragma GCC unroll 8
      for (int o = 0; o < OB; ++o) {
        const v16 wv = v16splat(w[static_cast<int64_t>(o) * in_g + i]);
        a[o][0] += wv * x0;
        a[o][1] += wv * x1;
      }
    }
#pragma GCC unroll 8
    for (int o = 0; o < OB; ++o) {
      if (act) {
        a[o][0] = v16lrelu(a[o][0]);
        a[o][1] = v16lrelu(a[o][1]);
      }
      v16store(y + static_cast<int64_t>(o) * n32 + p, a[o][0]);
      v16store(y + static_cast<int64_t>(o) * n32 + p + 16, a[o][1]);
    }
  }
}

inline void gemm_rows_dispatch(int ob, const float* xg, int64_t n32,
                               const float* w, int in_g, const float* bias,
                               bool acc, bool act, float* y) {
  switch (ob) {
    case 8: gemm_rows<8>(xg, n32, w, in_g, bias, acc, act, y); break;
    case 7: gemm_rows<7>(xg, n32, w, in_g, bias, acc, act, y); break;
    case 6: gemm_rows<6>(xg, n32, w, in_g, bias, acc, act, y); break;
    case 5: gemm_rows<5>(xg, n32, w, in_g, bias, acc, act, y); break;
    case 4: gemm_rows<4>(xg, n32, w, in_g, bias, acc, act, y); break;
    case 3: gemm_rows<3>(xg, n32, w, in_g, bias, acc, act, y); break;
    case 2: gemm_rows<2>(xg, n32, w, in_g, bias, acc, act, y); break;
    default: gemm_rows<1>(xg, n32, w, in_g, bias, acc, act, y); break;
  }
}

// Grouped 1x1 "conv" over transposed activations: xT (in_total, n32) with
// group g's rows at [g*in_g, (g+1)*in_g); w (out_total, in_g) row-major;
// yT (out_total, n32). Each output element accumulates bias-then-inputs in
// ascending-i order — remainder blocking never changes the bits.
inline void grouped_gemm_v(const float* xT, int in_total, const float* w,
                           const float* b, int out_total, int groups,
                           bool acc, bool act, int64_t n32, float* yT) {
  const int in_g = in_total / groups;
  const int out_g = out_total / groups;
  for (int g = 0; g < groups; ++g) {
    const float* xg = xT + static_cast<int64_t>(g) * in_g * n32;
    int o = 0;
    while (o < out_g) {
      const int ob = out_g - o >= 8 ? 8 : out_g - o;
      const int oo = g * out_g + o;
      gemm_rows_dispatch(ob, xg, n32, w + static_cast<int64_t>(oo) * in_g,
                         in_g, b ? b + oo : nullptr, acc, act,
                         yT + static_cast<int64_t>(oo) * n32);
      o += ob;
    }
  }
}

// ---------------------------------------------------------------------------
// Level-path ("level" kind) core: composed cgp-layer-0 + tail, shared by the
// per-diagonal entry point and the fully-native plane walk so the two are
// bit-identical by construction.

struct LevelParams {
  const float *csc_w, *csc_b;
  const float *w1, *b1, *w2, *b2, *w3, *b3, *w4, *b4;
  int32_t out1, out2, out3, out4;
  const float* scale_table;
  int32_t n_scales;
  float scale_bound;
};

// csc taps: rows 0,1 full; row 2 cols 0,1 (mask-A over 5x5)
constexpr int kCscTaps[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};

// Precomposed cgp layer 0 (see header comment). Built in fixed j-ascending
// order from the raw flax weights on every call — cheap (~0.5 MMAC) and
// keeps the arithmetic inside fingerprint-covered code.
struct LevelComposed {
  std::vector<float> W1p;    // (out1, 81): plc half of cgp layer 0
  std::vector<float> W1c12;  // (out1, 12): (W1c * Csc) composed taps
  std::vector<float> b1eff;  // (out1): b1 + W1c * csc_b
};

inline void build_composed(const LevelParams& P, int so, LevelComposed* C) {
  const int out1 = P.out1;
  const int out_g1 = out1 / so;
  C->W1p.resize(static_cast<size_t>(out1) * 81);
  C->W1c12.resize(static_cast<size_t>(out1) * 12);
  C->b1eff.resize(out1);
  for (int o = 0; o < out1; ++o) {
    const int g = o / out_g1;
    const float* w1o = P.w1 + static_cast<int64_t>(o) * 162;
    for (int i = 0; i < 81; ++i)
      C->W1p[static_cast<size_t>(o) * 81 + i] = w1o[i];
    float beff = P.b1[o];
    for (int j = 0; j < 81; ++j)
      beff += w1o[81 + j] * P.csc_b[g * 81 + j];
    C->b1eff[o] = beff;
    for (int t = 0; t < 12; ++t) {
      const int pos = kCscTaps[t];
      float acc = 0.0f;
      for (int j = 0; j < 81; ++j)
        acc += w1o[81 + j] * P.csc_w[static_cast<int64_t>(g * 81 + j) * 25
                                     + pos];
      C->W1c12[static_cast<size_t>(o) * 12 + t] = acc;
    }
  }
}

struct LevelBufs {  // reused across diagonals to avoid re-allocation
  std::vector<float> plcT, tapsT, h1T, h2T, h3T, h4T;
};

// h1T (already built and activated, stride n32) -> h2..h4 -> idx/mu for the
// first n centers.
inline void level_tail_from_h1(LevelBufs* bufs, int64_t n, int64_t n32,
                               int32_t so, const LevelParams& P,
                               int32_t* idx_out, float* mu_out) {
  bufs->h2T.resize(static_cast<size_t>(P.out2) * n32);
  bufs->h3T.resize(static_cast<size_t>(P.out3) * n32);
  bufs->h4T.resize(static_cast<size_t>(P.out4) * n32);
  grouped_gemm_v(bufs->h1T.data(), P.out1, P.w2, P.b2, P.out2, so, false,
                 true, n32, bufs->h2T.data());
  grouped_gemm_v(bufs->h2T.data(), P.out2, P.w3, P.b3, P.out3, so, false,
                 true, n32, bufs->h3T.data());
  grouped_gemm_v(bufs->h3T.data(), P.out3, P.w4, P.b4, P.out4, so, false,
                 false, n32, bufs->h4T.data());

  // h4: per group (sigma, mu) interleaved over groups: channels
  // [2g] = sigma_g, [2g+1] = mu_g (global 0::2 / 1::2 split)
  const float* h4T = bufs->h4T.data();
  for (int64_t p = 0; p < n; ++p) {
    for (int g = 0; g < so; ++g) {
      float sigma = h4T[static_cast<int64_t>(2 * g) * n32 + p];
      const float mu = h4T[static_cast<int64_t>(2 * g + 1) * n32 + p];
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

// Full diagonal evaluation: gather plcT/tapsT via the callbacks, run the
// composed layer-0 GEMMs and the tail. tap(p, pos, g) must return the
// causal 5x5 window value at mask position ``pos`` for center p, channel g;
// plcrow(p) the center's (so*81) parent-context row.
template <typename TapFn, typename PlcFn>
inline void level_diag_eval(LevelBufs* bufs, int64_t n, int32_t so,
                            const LevelParams& P, const LevelComposed& C,
                            TapFn tap, PlcFn plcrow, int32_t* idx_out,
                            float* mu_out) {
  const int wide = so * 81;
  const int64_t n32 = round_up32(n);
  bufs->plcT.assign(static_cast<size_t>(wide) * n32, 0.0f);
  bufs->tapsT.assign(static_cast<size_t>(so) * 12 * n32, 0.0f);
  bufs->h1T.resize(static_cast<size_t>(P.out1) * n32);
  float* plcT = bufs->plcT.data();
  float* tapsT = bufs->tapsT.data();
  for (int64_t p = 0; p < n; ++p) {
    const float* plc_p = plcrow(p);
    for (int i = 0; i < wide; ++i)
      plcT[static_cast<int64_t>(i) * n32 + p] = plc_p[i];
    for (int g = 0; g < so; ++g)
      for (int t = 0; t < 12; ++t)
        tapsT[(static_cast<int64_t>(g) * 12 + t) * n32 + p] =
            tap(p, kCscTaps[t], g);
  }
  grouped_gemm_v(plcT, wide, C.W1p.data(), C.b1eff.data(), P.out1, so,
                 false, false, n32, bufs->h1T.data());
  grouped_gemm_v(tapsT, so * 12, C.W1c12.data(), nullptr, P.out1, so,
                 true, true, n32, bufs->h1T.data());
  level_tail_from_h1(bufs, n, n32, so, P, idx_out, mu_out);
}

// ---------------------------------------------------------------------------
// Blocked planar 3x3 SAME conv for the whole-plane parent-context (plc)
// pass. Planes are channel-planar with a padded row stride (ws + 2, ws =
// round_up(w, 32)) so the 32-pixel tiles never need edge handling. Each
// output element accumulates in a FIXED (tap-major, channel-ascending)
// order with independent SIMD lanes along the pixel axis — vector width
// never changes the result; FMA contraction is the only arch-dependent
// freedom and is guarded by the runtime fingerprint below.
//
// wpack layout: (ceil(cout/8), 9, cin, 8) — the 8 outputs of a block are
// interleaved innermost so one (tap, channel) step feeds 8 broadcasts into
// 16 register-resident v16 accumulators (the previous 4-wide stack-array
// form was store-bound at ~10 GMAC/s; this form is FMA-bound).
// out_off = 0 writes unpadded (h, ws) planes; out_off = 1 writes into
// 1-padded (h+2, ws+2) planes at offset (1,1) so the result can feed the
// next conv (the caller must re-zero the junk tail columns [w+1, ws+2)
// when ws > w).
//
// Loop order is (row, TAP, out-block, pixel-tile) with the partial sums
// parked in the output rows between tap passes: per (row, tap) the live
// working set is ONE input row across all channels (~375 KB at 243 ch)
// plus that tap's weight slice (~240 KB) — both L2-resident across the
// 31 out-blocks — instead of the earlier (row, out-block) order whose
// 3-row strip (~2 MB) plus the full weight array (~2.2 MB) cycled
// through L2 every row (L3-bound at ~40 GMAC/s; this form measures ~2.5x
// that at the flagship 243->248 shape). Each output element still
// accumulates bias-then-(tap-major, channel-ascending) — the tap passes
// only stage the SAME chain through memory, so results are bit-identical
// to the single-pass form and the fingerprint is unchanged (fp32
// round-trips through memory exactly).
inline void conv3x3_planar(const float* __restrict__ in, int cin, int h,
                           int ws, const float* __restrict__ wpack,
                           const float* __restrict__ bias, int cout_p8,
                           bool act, float* __restrict__ out, int out_off) {
  const int pstr = ws + 2;
  const int64_t in_plane = static_cast<int64_t>(h + 2) * pstr;
  const int out_str = out_off ? pstr : ws;
  const int64_t out_plane =
      static_cast<int64_t>(h + 2 * out_off) * out_str;
  for (int r = 0; r < h; ++r) {
    for (int t = 0; t < 9; ++t) {
      const float* int_row =
          in + static_cast<int64_t>(r + t / 3) * pstr + t % 3;
      const bool first = t == 0, last = t == 8;
      for (int ob = 0; ob < cout_p8 / 8; ++ob) {
        const float* wt = wpack
            + (static_cast<int64_t>(ob) * 9 + t) * cin * 8;
        const float* bb = bias + ob * 8;
        float* ob_row = out + static_cast<int64_t>(ob * 8) * out_plane
                        + static_cast<int64_t>(r + out_off) * out_str
                        + out_off;
        for (int p0 = 0; p0 < ws; p0 += 32) {
          v16 a[8][2];
          if (first) {
#pragma GCC unroll 8
            for (int o = 0; o < 8; ++o) a[o][0] = a[o][1] = v16splat(bb[o]);
          } else {
#pragma GCC unroll 8
            for (int o = 0; o < 8; ++o) {
              float* yp = ob_row + o * out_plane + p0;
              a[o][0] = v16load(yp);
              a[o][1] = v16load(yp + 16);
            }
          }
          const float* inb = int_row + p0;
          for (int c = 0; c < cin; ++c) {
            const float* __restrict__ x = inb + c * in_plane;
            const v16 x0 = v16load(x);
            const v16 x1 = v16load(x + 16);
            const float* wc = wt + c * 8;
#pragma GCC unroll 8
            for (int o = 0; o < 8; ++o) {
              const v16 wv = v16splat(wc[o]);
              a[o][0] += wv * x0;
              a[o][1] += wv * x1;
            }
          }
#pragma GCC unroll 8
          for (int o = 0; o < 8; ++o) {
            v16 y0 = a[o][0], y1 = a[o][1];
            if (act && last) {
              y0 = v16lrelu(y0);
              y1 = v16lrelu(y1);
            }
            float* yp = ob_row + o * out_plane + p0;
            v16store(yp, y0);
            v16store(yp + 16, y1);
          }
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Evaluate n level-path centers (the per-diagonal entry point; shares
// level_diag_eval with the plane walk below, so the two are bit-identical).
//   patches: (n, 5, 5, so) causal windows (future taps may hold garbage —
//            the mask excludes them)
//   plc:     (n, so*81) parent context at the pixels
//   csc_w:   (so*81, 25) pre-transposed; csc_b: (so*81)
//   w1..w4 / b1..b4: cgp grouped 1x1 convs, kernel (out_total, in_g)
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
  LevelComposed C;
  build_composed(P, so, &C);
  LevelBufs bufs;
  level_diag_eval(
      &bufs, n, so, P, C,
      [&](int64_t p, int pos, int g) {
        return patches[(p * 25 + pos) * so + g];
      },
      [&](int64_t p) { return plc + p * static_cast<int64_t>(so) * 81; },
      idx_out, mu_out);
}

// Whole-plane parent-context (plc) pass on the HOST: nearest x2 upsample of
// the decoded parent + dense 3x3 conv (LReLU) + dense 3x3 conv — the
// reference's plc CNN (LiftingBasedDWT_net.py:271-272,348) evaluated with
// deterministic, backend-free arithmetic. Replaces the accelerator pass
// that (a) pinned bitstreams to the encoding backend's bf16 accumulation
// order and (b) on tunneled TPUs read back a (h, w, 81*so) float plane
// (~95 MB at the finest Kodak level) per level per direction.
//   parent: (h2, w2, so) HWC;  out: (h, w, wide) HWC, h=2*h2, w=2*w2.
//   w1pack: (ceil(wide/8), 9, so, 8); w2pack: (ceil(wide/8), 9, wide, 8)
//   (biases zero-padded to the same rounded widths).
void ztsep_plc_plane(
    const float* parent, int32_t h2, int32_t w2, int32_t so,
    const float* w1pack, const float* b1, int32_t wide,
    const float* w2pack, const float* b2,
    float* out) {
  const int h = 2 * h2, w = 2 * w2;
  const int ws = (w + 31) & ~31;
  const int pstr = ws + 2;
  const int wide_p8 = (wide + 7) & ~7;
  const int64_t plane_pad = static_cast<int64_t>(h + 2) * pstr;

  // Persistent scratch (~200 MB at the finest Kodak level): the pass runs
  // ~9x per image per plane, and glibc returns >128 KB frees to the kernel,
  // so per-call vectors would pay mmap+page-fault+zero churn every call.
  // Zero-guarantees on reuse: xpad borders are never written (stay zero
  // once zeroed for a given geometry); a1's pad borders likewise, and its
  // junk tail columns are explicitly re-zeroed below; a2 is fully
  // overwritten. Re-zero only when the geometry changes.
  thread_local std::vector<float> xpad, a1, a2;
  thread_local int64_t last_geom = -1;
  const int64_t geom = (static_cast<int64_t>(h) << 40)
                       | (static_cast<int64_t>(ws) << 16) | so;
  const size_t xpad_n = static_cast<size_t>(so) * plane_pad;
  const size_t a1_n = static_cast<size_t>(wide_p8) * plane_pad;
  if (geom != last_geom || xpad.size() < xpad_n || a1.size() < a1_n) {
    xpad.assign(xpad_n, 0.0f);
    a1.assign(a1_n, 0.0f);
    last_geom = geom;
  }
  a2.resize(static_cast<size_t>(wide_p8) * h * ws);

  // upsampled input, planar padded
  for (int c = 0; c < so; ++c) {
    float* xc = xpad.data() + c * plane_pad;
    for (int r = 0; r < h; ++r) {
      const float* prow = parent + static_cast<int64_t>(r >> 1) * w2 * so;
      float* xr = xc + static_cast<int64_t>(r + 1) * pstr + 1;
      for (int p = 0; p < w; ++p) xr[p] = prow[(p >> 1) * so + c];
    }
  }

  // conv1 -> padded planar (junk tail columns re-zeroed), LReLU
  conv3x3_planar(xpad.data(), so, h, ws, w1pack, b1, wide_p8, true,
                 a1.data(), 1);
  if (ws > w) {
    for (int c = 0; c < wide_p8; ++c) {
      float* ac = a1.data() + c * plane_pad;
      for (int r = 1; r <= h; ++r) {
        float* row = ac + static_cast<int64_t>(r) * pstr;
        for (int p = w + 1; p < pstr; ++p) row[p] = 0.0f;
      }
    }
  }

  // conv2 -> unpadded planar, then blocked planar -> HWC transpose
  // (16x16 tiles through a local buffer: both the strided reads and the
  // strided writes touch each cache line once instead of once per element)
  conv3x3_planar(a1.data(), wide, h, ws, w2pack, b2, wide_p8, false,
                 a2.data(), 0);
  const int64_t oplane = static_cast<int64_t>(h) * ws;
  float tile[16][16];
  for (int r = 0; r < h; ++r) {
    const float* a2r = a2.data() + static_cast<int64_t>(r) * ws;
    float* outr = out + static_cast<int64_t>(r) * w * wide;
    for (int p0 = 0; p0 < w; p0 += 16) {
      const int pn = w - p0 < 16 ? w - p0 : 16;
      for (int o0 = 0; o0 < wide; o0 += 16) {
        const int on = wide - o0 < 16 ? wide - o0 : 16;
        for (int o = 0; o < on; ++o) {
          const float* src = a2r + static_cast<int64_t>(o0 + o) * oplane
                             + p0;
          for (int p = 0; p < pn; ++p) tile[o][p] = src[p];
        }
        for (int p = 0; p < pn; ++p) {
          float* dst = outr + static_cast<int64_t>(p0 + p) * wide + o0;
          for (int o = 0; o < on; ++o) dst[o] = tile[o][p];
        }
      }
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

// Vectorized layer evaluation with OUTPUTS as the SIMD axis. Weights are
// repacked (by the Python binding) to (groups, ntaps, in_g, out_g16) with
// the per-group output lanes padded to 16 and the causal taps compacted
// (mask A: (-1,-1),(-1,0),(-1,1),(0,-1); mask B adds the center). Each
// output element accumulates bias-then-(tap-major, input-ascending) — the
// same fixed order as the scalar form, minus the `omp simd reduction`
// reassociation (so this form's bits are vector-width independent).
struct LayerSpecV {
  const float* wT;  // (groups, ntaps, in_g, out_g16)
  const float* b;   // (groups, out_g16), padding lanes zero
  int out_ch;       // true total outputs
  int in_ch;        // true total inputs
  int out_g16;      // padded per-group outputs
};

constexpr int kMaskTapR[5] = {-1, -1, -1, 0, 0};
constexpr int kMaskTapC[5] = {-1, 0, 1, -1, 0};

template <int NACC>
inline void pixelcnn_center_vec(const float* __restrict__ in,
                                int64_t in_stride, int in_ch, int64_t r,
                                int64_t c, int in_pad, const LayerSpecV& L,
                                int groups, int ntaps, bool act,
                                float* __restrict__ yp) {
  const int in_g = in_ch / groups;
  const int out_g = L.out_ch / groups;
  for (int g = 0; g < groups; ++g) {
    v16 acc[NACC];
#pragma GCC unroll 8
    for (int k = 0; k < NACC; ++k)
      acc[k] = v16load(L.b + (static_cast<int64_t>(g) * L.out_g16) + k * 16);
    const float* wg = L.wT + static_cast<int64_t>(g) * ntaps * in_g
                      * L.out_g16;
    for (int t = 0; t < ntaps; ++t) {
      const int64_t rr = r + kMaskTapR[t] + in_pad;
      const int64_t cc = c + kMaskTapC[t] + in_pad;
      const float* __restrict__ x = in + rr * in_stride + cc * in_ch
                                    + g * in_g;
      const float* wt = wg + static_cast<int64_t>(t) * in_g * L.out_g16;
      for (int i = 0; i < in_g; ++i) {
        const v16 xv = v16splat(x[i]);
        const float* wr = wt + static_cast<int64_t>(i) * L.out_g16;
#pragma GCC unroll 8
        for (int k = 0; k < NACC; ++k)
          acc[k] += xv * v16load(wr + k * 16);
      }
    }
    float* yg = yp + g * out_g;
    int o = 0;
    for (int k = 0; k < NACC; ++k) {
      v16 a = act ? v16lrelu(acc[k]) : acc[k];
      if (o + 16 <= out_g) {
        v16store(yg + o, a);  // may overlap next group: see ordering note
        o += 16;
      } else {
        for (int l = 0; l < 16 && o < out_g; ++l, ++o) yg[o] = a[l];
        break;
      }
    }
  }
}

// NOTE on the full-v16 store above: when out_g is not a multiple of 16 the
// LAST chunk is stored lane-by-lane, so a group's stores never touch the
// next group's channels. Full chunks only cover o+16 <= out_g.

inline void pixelcnn_layer_at_vec(const float* __restrict__ in, int in_pad,
                                  int w_img, const LayerSpecV& L, int groups,
                                  bool mask_a, bool act,
                                  const int64_t* rows, const int64_t* cols,
                                  int64_t n, float* __restrict__ out,
                                  int out_pad, bool out_plane, int w_out) {
  const int ntaps = mask_a ? 4 : 5;
  const int nacc = L.out_g16 / 16;
  const int64_t in_stride =
      static_cast<int64_t>(w_img + 2 * in_pad) * L.in_ch;
  for (int64_t p = 0; p < n; ++p) {
    const int64_t r = rows[p], c = cols[p];
    float* yp = out_plane
        ? out + ((r + out_pad) * (w_out + 2 * out_pad) + (c + out_pad))
                    * L.out_ch
        : out + p * L.out_ch;
    switch (nacc) {
      case 1:
        pixelcnn_center_vec<1>(in, in_stride, L.in_ch, r, c, in_pad, L,
                               groups, ntaps, act, yp);
        break;
      case 2:
        pixelcnn_center_vec<2>(in, in_stride, L.in_ch, r, c, in_pad, L,
                               groups, ntaps, act, yp);
        break;
      case 3:
        pixelcnn_center_vec<3>(in, in_stride, L.in_ch, r, c, in_pad, L,
                               groups, ntaps, act, yp);
        break;
      case 4:
        pixelcnn_center_vec<4>(in, in_stride, L.in_ch, r, c, in_pad, L,
                               groups, ntaps, act, yp);
        break;
      case 5:
        pixelcnn_center_vec<5>(in, in_stride, L.in_ch, r, c, in_pad, L,
                               groups, ntaps, act, yp);
        break;
      case 6:
        pixelcnn_center_vec<6>(in, in_stride, L.in_ch, r, c, in_pad, L,
                               groups, ntaps, act, yp);
        break;
      default:
        // out_g16 > 96 never occurs (out_g <= 81 in every config); fall
        // back to a generic loop to stay correct if it ever does
        for (int g = 0; g < groups; ++g) {
          const int in_g = L.in_ch / groups;
          const int out_g = L.out_ch / groups;
          const float* wg = L.wT + static_cast<int64_t>(g) * ntaps * in_g
                            * L.out_g16;
          std::vector<float> accv(L.out_g16);
          for (int k = 0; k < L.out_g16; ++k)
            accv[k] = L.b[static_cast<int64_t>(g) * L.out_g16 + k];
          for (int t = 0; t < ntaps; ++t) {
            const int64_t rr = r + kMaskTapR[t] + in_pad;
            const int64_t cc = c + kMaskTapC[t] + in_pad;
            const float* x = in + rr * in_stride + cc * L.in_ch + g * in_g;
            const float* wt = wg + static_cast<int64_t>(t) * in_g
                              * L.out_g16;
            for (int i = 0; i < in_g; ++i)
              for (int k = 0; k < L.out_g16; ++k)
                accv[k] += x[i] * wt[static_cast<int64_t>(i) * L.out_g16
                                     + k];
          }
          for (int o = 0; o < out_g; ++o) {
            float a = accv[o];
            yp[g * out_g + o] = (act && a < 0.0f) ? a * kLReLU : a;
          }
        }
    }
  }
}

// Run the five layers at the n wavefront pixels, advancing the persistent
// activation planes and filling the (n, o4) head buffer, then turn the
// head's per-group (sigma, mu) pairs into CDF rows + mu.
inline void pixelcnn_diag_eval(const float* plane, int32_t w, int32_t pad,
                               int32_t ic, const LayerSpecV specs[5],
                               float* acts[4], const int64_t* rows,
                               const int64_t* cols, int64_t n,
                               const float* scale_table, int32_t n_scales,
                               float scale_bound, std::vector<float>* head,
                               int32_t* idx_out, float* mu_out) {
  pixelcnn_layer_at_vec(plane, pad, w, specs[0], ic, /*mask_a=*/true,
                        /*act=*/true, rows, cols, n, acts[0], 1, true, w);
  for (int l = 1; l < 4; ++l) {
    pixelcnn_layer_at_vec(acts[l - 1], 1, w, specs[l], ic, false, true,
                          rows, cols, n, acts[l], 1, true, w);
  }
  const int o4 = specs[4].out_ch;
  head->resize(static_cast<size_t>(n) * o4);
  pixelcnn_layer_at_vec(acts[3], 1, w, specs[4], ic, false, false, rows,
                        cols, n, head->data(), 0, false, w);

  for (int64_t p = 0; p < n; ++p) {
    const float* hp = head->data() + p * o4;
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

}  // namespace

extern "C" {

// One wavefront step: given the decoded plane so far (row-major, ``pad``
// zero padding, ic channels) and the diagonal's pixel coords, advance the
// four persistent activation planes a0..a3 (each (h+2)x(w+2)xout_l,
// 1-pixel padding, zero-initialized by the caller before the walk) at those
// pixels and emit the centers' CDF rows + mu.
// Weights wl repacked (ic, ntaps_l, in_l/ic, og16_l) with per-group output
// lanes padded to 16 (see LayerSpecV); biases (ic, og16_l), padding zero.
// True outs (81ic, 81ic, 27ic, 9ic, 2ic).
void ztsep_pixelcnn_step(
    const float* plane, int32_t h, int32_t w, int32_t pad, int32_t ic,
    const int64_t* rows, const int64_t* cols, int64_t n,
    float* a0, float* a1, float* a2, float* a3,
    const float* w0, const float* b0, int32_t o0, int32_t og0,
    const float* w1, const float* b1, int32_t o1, int32_t og1,
    const float* w2, const float* b2, int32_t o2, int32_t og2,
    const float* w3, const float* b3, int32_t o3, int32_t og3,
    const float* w4, const float* b4, int32_t o4, int32_t og4,
    const float* scale_table, int32_t n_scales, float scale_bound,
    int32_t* idx_out, float* mu_out) {
  (void)h;
  const LayerSpecV specs[5] = {
      {w0, b0, o0, ic, og0}, {w1, b1, o1, o0, og1}, {w2, b2, o2, o1, og2},
      {w3, b3, o3, o2, og3}, {w4, b4, o4, o3, og4}};
  float* acts[4] = {a0, a1, a2, a3};
  std::vector<float> head;
  pixelcnn_diag_eval(plane, w, pad, ic, specs, acts, rows, cols, n,
                     scale_table, n_scales, scale_bound, &head, idx_out,
                     mu_out);
}

// Fully-native wavefront walk of one xe / coarsest-details plane: the
// anti-diagonal loop (a = 2 for the 3x3 masked stacks), incremental
// five-layer evaluation, rANS coding and decoded-value writeback in ONE
// C++ call — mirrors ztsep_level_walk for the PixelCNN planes, replacing
// ~110 Python step+decode_stream round trips per Kodak-size plane.
// Encode (mode 0): x_true given, emits symbols/indexes diagonal-major.
// Decode (mode 1): consumes `stream` via the inline rANS decoder.
void ztsep_pixelcnn_walk(
    int32_t mode, int32_t h, int32_t w, int32_t ic, int32_t pad,
    float* padded,             // (h+2*pad, w+2*pad, ic) zero-init
    const float* x_true,       // (h, w, ic) encode mode, else null
    const float* w0, const float* b0, int32_t o0, int32_t og0,
    const float* w1, const float* b1, int32_t o1, int32_t og1,
    const float* w2, const float* b2, int32_t o2, int32_t og2,
    const float* w3, const float* b3, int32_t o3, int32_t og3,
    const float* w4, const float* b4, int32_t o4, int32_t og4,
    const float* scale_table, int32_t n_scales, float scale_bound,
    const uint32_t* cdfs, int32_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets,
    const uint8_t* stream, int64_t nbytes,
    int32_t* sym_out, int32_t* idx_out) {
  const LayerSpecV specs[5] = {
      {w0, b0, o0, ic, og0}, {w1, b1, o1, o0, og1}, {w2, b2, o2, o1, og2},
      {w3, b3, o3, o2, og3}, {w4, b4, o4, o3, og4}};
  const int wpad2 = w + 2 * pad;
  std::vector<float> av[4];
  float* acts[4];
  for (int l = 0; l < 4; ++l) {
    av[l].assign(static_cast<size_t>(h + 2) * (w + 2) * specs[l].out_ch,
                 0.0f);
    acts[l] = av[l].data();
  }
  ranscore::RansDecState dec;
  if (mode == 1) dec.init(stream, nbytes);

  std::vector<int64_t> rr_buf, cc_buf;
  std::vector<int32_t> idx_buf;
  std::vector<float> mu_buf, head;
  int64_t out_pos = 0;
  const int dmax = 2 * (h - 1) + (w - 1);
  for (int d = 0; d <= dmax; ++d) {
    // pixels (r, c = d - 2r) with 0 <= c < w, rows ascending
    const int rlo = d >= w ? (d - w + 2) / 2 : 0;
    const int rhi = d / 2 < h - 1 ? d / 2 : h - 1;
    if (rhi < rlo) continue;
    const int64_t n = rhi - rlo + 1;
    rr_buf.resize(n);
    cc_buf.resize(n);
    for (int64_t p = 0; p < n; ++p) {
      rr_buf[p] = rlo + p;
      cc_buf[p] = d - 2 * rr_buf[p];
    }
    idx_buf.resize(n * ic);
    mu_buf.resize(n * ic);
    pixelcnn_diag_eval(padded, w, pad, ic, specs, acts, rr_buf.data(),
                       cc_buf.data(), n, scale_table, n_scales,
                       scale_bound, &head, idx_buf.data(), mu_buf.data());
    for (int64_t p = 0; p < n; ++p) {
      const int64_t r = rr_buf[p], c = cc_buf[p];
      float* hat = padded + ((r + pad) * wpad2 + (c + pad)) * ic;
      for (int g = 0; g < ic; ++g) {
        const int32_t row = idx_buf[p * ic + g];
        const float mu = mu_buf[p * ic + g];
        int32_t sym;
        if (mode == 0) {
          const float x = x_true[(r * w + c) * ic + g];
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
  LevelComposed C;
  build_composed(P, so, &C);
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

    level_diag_eval(
        &bufs, n, so, P, C,
        // masked 5x5 taps straight off the padded plane (patch top-left at
        // the unpadded coordinate; pad=2 -> center +2,+2)
        [&](int64_t p, int pos, int g) {
          const int64_t r0 = rr_buf[p], c0 = cc_buf[p];
          return padded[((r0 + pos / 5) * wpad + c0 + pos % 5) * so + g];
        },
        [&](int64_t p) {
          return plc + (static_cast<int64_t>(rr_buf[p]) * w + cc_buf[p])
                 * wide;
        },
        idx_buf.data(), mu_buf.data());

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
// contraction under -march=native plus the `omp simd reduction`
// reassociation in the PixelCNN step (vector-width-dependent), exercised
// below via the plc plane pass, the grouped GEMMs, the composed per-center
// level evaluator, and the incremental PixelCNN step. The v16 kernels'
// lane semantics are width-independent by construction, so their only
// contribution is FMA contraction.
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
    const int wide_p8 = (wide + 7) & ~7;
    std::vector<float> parent(h2 * w2 * so),
        w1(static_cast<size_t>(wide_p8) * 9 * so), b1(wide_p8),
        w2p(static_cast<size_t>(wide_p8) * 9 * wide), b2(wide_p8),
        out(2 * h2 * 2 * w2 * wide);
    for (auto* v : {&parent, &w1, &b1, &w2p, &b2}) fill(*v);
    ztsep_plc_plane(parent.data(), h2, w2, so, w1.data(), b1.data(), wide,
                    w2p.data(), b2.data(), out.data());
    mix(out);
  }

  // 2) diagonal-batched grouped GEMMs (init and accumulate forms, with an
  // output-group width that exercises the 8/remainder blocking)
  {
    const int in_t = 12, out_t = 30, groups = 3;
    const int64_t n32 = 32;
    std::vector<float> xT(in_t * n32), wg(out_t * (in_t / groups)),
        bg(out_t), yT(out_t * n32), y2T(out_t * n32);
    for (auto* v : {&xT, &wg, &bg}) fill(*v);
    grouped_gemm_v(xT.data(), in_t, wg.data(), bg.data(), out_t, groups,
                   false, true, n32, yT.data());
    for (size_t i = 0; i < y2T.size(); ++i) y2T[i] = bg[i / n32];
    grouped_gemm_v(xT.data(), in_t, wg.data(), nullptr, out_t, groups,
                   true, true, n32, y2T.data());
    mix(yT);
    mix(y2T);
  }

  // 3) per-center level evaluator (composed csc taps + cgp tail). Cgp
  // widths follow the real ratio constraints: in1 = 2*81 per group,
  // out4 = 2*so.
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

  // 4) incremental PixelCNN step (vectorized masked-tap layers, repacked
  // (groups, ntaps, in_g, out_g16) weights — exercised exactly as the
  // plane walk evaluates them)
  {
    const int ic = 1, h = 5, w = 6, pad = 5;
    const int o0 = 8, o1 = 8, o2 = 8, o3 = 8, o4 = 2 * ic;
    std::vector<float> plane((h + 2 * pad) * (w + 2 * pad) * ic);
    fill(plane);
    std::vector<float> ws[5], bs[5];
    const int outs[5] = {o0, o1, o2, o3, o4};
    int og16[5];
    int in_prev = ic;
    for (int l = 0; l < 5; ++l) {
      const int ntaps = l == 0 ? 4 : 5;
      const int out_g = outs[l] / ic;
      og16[l] = (out_g + 15) & ~15;
      ws[l].assign(static_cast<size_t>(ic) * ntaps * (in_prev / ic)
                   * og16[l], 0.0f);
      bs[l].assign(static_cast<size_t>(ic) * og16[l], 0.0f);
      // fill only the true output lanes (padding stays zero, matching the
      // binding's repack)
      for (size_t base = 0; base < ws[l].size(); base += og16[l])
        for (int o = 0; o < out_g; ++o) ws[l][base + o] = next();
      for (int g = 0; g < ic; ++g)
        for (int o = 0; o < out_g; ++o)
          bs[l][static_cast<size_t>(g) * og16[l] + o] = next();
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
      ztsep_pixelcnn_step(
          plane.data(), h, w, pad, ic, rows.data(), cols.data(),
          static_cast<int64_t>(rows.size()), a0.data(), a1.data(),
          a2.data(), a3.data(),
          ws[0].data(), bs[0].data(), o0, og16[0],
          ws[1].data(), bs[1].data(), o1, og16[1],
          ws[2].data(), bs[2].data(), o2, og16[2],
          ws[3].data(), bs[3].data(), o3, og16[3],
          ws[4].data(), bs[4].data(), o4, og16[4],
          table.data(), 5, 0.11f, idx.data(), mu.data());
      mix_bytes(idx.data(), idx.size() * 4);
      mix(mu);
    }
    mix(a3);
  }
  return fp;
}

}  // extern "C"
