// EBCOT Tier-1 + MQ coder — native fast path (C ABI, OpenMP batch).
//
// Algorithmically identical to the Python reference implementation in
// qsvc_tpu/codec/{mq,tier1}.py (same T.88 state machine, same guarded
// flush, same pass structure and scan order); the Python tests assert
// bit-exact agreement between the two.  This is the framework's native
// replacement for the entropy coding the reference delegates to the
// closed-source Kakadu binaries (texture_compress_fb_j2k.py:183-196).
//
// Build: g++ -O3 -fopenmp -shared -fPIC ebcot.cpp -o libqsvc.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------- MQ tables
struct QeRow { uint16_t qe; uint8_t nmps, nlps, sw; };
static const QeRow QE[47] = {
  {0x5601,1,1,1},{0x3401,2,6,0},{0x1801,3,9,0},{0x0AC1,4,12,0},
  {0x0521,5,29,0},{0x0221,38,33,0},{0x5601,7,6,1},{0x5401,8,14,0},
  {0x4801,9,14,0},{0x3801,10,14,0},{0x3001,11,17,0},{0x2401,12,18,0},
  {0x1C01,13,20,0},{0x1601,29,21,0},{0x5601,15,14,1},{0x5401,16,14,0},
  {0x5101,17,15,0},{0x4801,18,16,0},{0x3801,19,17,0},{0x3401,20,18,0},
  {0x3001,21,19,0},{0x2801,22,19,0},{0x2401,23,20,0},{0x2201,24,21,0},
  {0x1C01,25,22,0},{0x1801,26,23,0},{0x1601,27,24,0},{0x1401,28,25,0},
  {0x1201,29,26,0},{0x1101,30,27,0},{0x0AC1,31,28,0},{0x09C1,32,29,0},
  {0x08A1,33,30,0},{0x0521,34,31,0},{0x0441,35,32,0},{0x02A1,36,33,0},
  {0x0221,37,34,0},{0x0141,38,35,0},{0x0111,39,36,0},{0x0085,40,37,0},
  {0x0049,41,38,0},{0x0025,42,39,0},{0x0015,43,40,0},{0x0009,44,41,0},
  {0x0005,45,42,0},{0x0001,45,43,0},{0x5601,46,46,0},
};

constexpr int N_CTX = 19;
constexpr int CTX_RL = 17;
constexpr int CTX_UNI = 18;

struct Ctx { uint8_t idx, mps; };

static void init_ctx(Ctx* c) {
  for (int i = 0; i < N_CTX; i++) { c[i].idx = 0; c[i].mps = 0; }
  c[0].idx = 4; c[CTX_RL].idx = 3; c[CTX_UNI].idx = 46;
}

// ---------------------------------------------------------------- encoder
struct MQEnc {
  Ctx ctx[N_CTX];
  uint32_t a, c;
  int ct, b;                      // b = -1: none staged
  std::vector<uint8_t> out;       // committed bytes
  std::vector<uint8_t> pending;

  MQEnc() { init_ctx(ctx); reset_interval(); }
  void reset_interval() { a = 0x8000; c = 0; ct = 12; b = -1; pending.clear(); }

  void push() { if (b >= 0) pending.push_back((uint8_t)b); }

  void byteout() {
    if (b == 0xFF) {
      push(); b = (c >> 20) & 0xFF; c &= 0xFFFFF; ct = 7;
    } else if (c < 0x8000000u) {
      push(); b = (c >> 19) & 0xFF; c &= 0x7FFFF; ct = 8;
    } else {
      b += 1;
      if (b == 0xFF) {
        c &= 0x7FFFFFF; push(); b = (c >> 20) & 0xFF; c &= 0xFFFFF; ct = 7;
      } else {
        push(); b = (c >> 19) & 0xFF; c &= 0x7FFFF; ct = 8;
      }
    }
  }

  void renorm() {
    do {
      if (ct == 0) byteout();
      a = (a << 1) & 0xFFFF;
      c = (c << 1) & 0xFFFFFFF;
      ct--;
    } while (!(a & 0x8000));
  }

  void encode(int bit, int cx) {
    Ctx& s = ctx[cx];
    const QeRow& q = QE[s.idx];
    a -= q.qe;
    if (bit == s.mps) {
      if (a & 0x8000) { c += q.qe; }
      else {
        if (a < q.qe) a = q.qe; else c += q.qe;
        s.idx = q.nmps;
        renorm();
      }
    } else {
      if (a < q.qe) c += q.qe; else a = q.qe;
      if (q.sw) s.mps = 1 - s.mps;
      s.idx = q.nlps;
      renorm();
    }
  }

  // guarded flush (see qsvc_tpu/codec/mq.py flush docstring)
  int flush() {
    int p = 13 - ct; if (p < 0) p = 0;
    uint64_t tempc64 = (uint64_t)c + a - 1;
    int64_t t = (int64_t)tempc64 - ((int64_t)1 << (p + 1));
    uint32_t tempc = (uint32_t)((t >> p) << p);
    if (c < tempc) c = tempc;
    c = (c << ct) & 0xFFFFFFF; byteout();
    c = (c << ct) & 0xFFFFFFF; byteout();
    if (b != 0xFF && b >= 0) pending.push_back((uint8_t)b);
    out.insert(out.end(), pending.begin(), pending.end());
    if (!out.empty() && out.back() == 0xFF) out.pop_back();
    reset_interval();
    return (int)out.size();
  }
};

// ---------------------------------------------------------------- decoder
struct MQDec {
  Ctx ctx[N_CTX];
  const uint8_t* data;
  int bp, end, datalen;
  uint32_t a, c; int ct, b;

  MQDec(const uint8_t* d, int n) : data(d), bp(0), end(n), datalen(n) {
    init_ctx(ctx);
  }
  int byte(int i) const { return i < end ? data[i] : 0xFF; }

  void start_segment(int s, int e) {
    bp = s; end = e < datalen ? e : datalen;
    b = byte(bp);
    c = (uint32_t)b << 16;
    bytein();
    c <<= 7; ct -= 7; a = 0x8000;
  }

  void bytein() {
    if (b == 0xFF) {
      if (byte(bp + 1) > 0x8F) { c += 0xFF00; ct = 8; }
      else { bp++; b = byte(bp); c += (uint32_t)b << 9; ct = 7; }
    } else {
      bp++; b = byte(bp); c += (uint32_t)b << 8; ct = 8;
    }
  }

  void renorm() {
    do {
      if (ct == 0) bytein();
      a = (a << 1) & 0xFFFF;
      c <<= 1;
      ct--;
    } while (!(a & 0x8000));
  }

  int decode(int cx) {
    Ctx& s = ctx[cx];
    const QeRow& q = QE[s.idx];
    int d;
    a -= q.qe;
    uint32_t chigh = (c >> 16) & 0xFFFF;
    if (chigh < q.qe) {
      if (a < q.qe) { d = s.mps; s.idx = q.nmps; }
      else {
        d = 1 - s.mps;
        if (q.sw) s.mps = 1 - s.mps;
        s.idx = q.nlps;
      }
      a = q.qe;
      renorm();
    } else {
      c -= (uint32_t)q.qe << 16;
      if (!(a & 0x8000)) {
        if (a < q.qe) {
          d = 1 - s.mps;
          if (q.sw) s.mps = 1 - s.mps;
          s.idx = q.nlps;
        } else { d = s.mps; s.idx = q.nmps; }
        renorm();
      } else d = s.mps;
    }
    return d;
  }
};

// ----------------------------------------------------------- Tier-1 common

// band codes: 0 = LL/LH family, 1 = HL (transpose), 2 = HH
static inline int sig_ctx(int h, int v, int d, int band) {
  if (band == 1) { int t = h; h = v; v = t; }
  if (band != 2) {
    if (h == 2) return 8;
    if (h == 1) return v >= 1 ? 7 : (d >= 1 ? 6 : 5);
    if (v == 2) return 4;
    if (v == 1) return 3;
    return d >= 2 ? 2 : d;
  }
  int hv = h + v;
  if (d >= 3) return 8;
  if (d == 2) return hv >= 1 ? 7 : 6;
  if (d == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
  return hv >= 2 ? 2 : hv;
}

// sign context + xor from clipped (h, v) in {-1,0,1}
static inline void sign_ctx(int h, int v, int* cx, int* xr) {
  if (h == 0 && v == 0) { *cx = 9; *xr = 0; }
  else if (h == 0) { *cx = 10; *xr = v < 0; }
  else if (h == 1) { *cx = v == 1 ? 13 : (v == 0 ? 12 : 11); *xr = 0; }
  else { *cx = v == 1 ? 11 : (v == 0 ? 12 : 13); *xr = 1; }
}

struct T1State {
  int h, w;
  std::vector<uint8_t> sig, vis, ref, sgn;
  T1State(int h_, int w_) : h(h_), w(w_),
    sig(h_ * w_, 0), vis(h_ * w_, 0), ref(h_ * w_, 0), sgn(h_ * w_, 0) {}
  inline int S(int y, int x) const {
    return (y >= 0 && y < h && x >= 0 && x < w) ? sig[y * w + x] : 0;
  }
  inline void counts(int y, int x, int* hh, int* vv, int* dd) const {
    *hh = S(y, x - 1) + S(y, x + 1);
    *vv = S(y - 1, x) + S(y + 1, x);
    *dd = S(y - 1, x - 1) + S(y - 1, x + 1) + S(y + 1, x - 1) + S(y + 1, x + 1);
  }
  inline void signnb(int y, int x, int* hc, int* vc) const {
    auto con = [&](int yy, int xx) -> int {
      if (yy < 0 || yy >= h || xx < 0 || xx >= w || !sig[yy * w + xx]) return 0;
      return sgn[yy * w + xx] ? -1 : 1;
    };
    int hh = con(y, x - 1) + con(y, x + 1);
    int vv = con(y - 1, x) + con(y + 1, x);
    *hc = hh > 1 ? 1 : (hh < -1 ? -1 : hh);
    *vc = vv > 1 ? 1 : (vv < -1 ? -1 : vv);
  }
};

static double distortion(const int64_t* mag, const T1State& st, int plane,
                         bool mixed) {
  double sse = 0.0;
  int64_t half_lo = plane > 0 ? (int64_t)1 << (plane - 1) : 0;
  int64_t half_hi = (int64_t)1 << plane;
  for (int i = 0; i < st.h * st.w; i++) {
    int64_t m = mag[i], rec = 0;
    if (st.sig[i]) {
      if (!mixed || st.vis[i]) rec = ((m >> plane) << plane) + half_lo;
      else rec = ((m >> (plane + 1)) << (plane + 1)) + half_hi;
    }
    double e = (double)(m - rec);
    sse += e * e;
  }
  return sse;
}

} // namespace

extern "C" {

// Encode one code-block.
// coeffs: h*w int64 row-major.  Returns total bytes (or -1 if out_cap too
// small).  Outputs: msbs, n_passes, pass_ends[<=3*64], pass_dist, dist0.
int qsvc_encode_block_t(const int64_t* coeffs, int h, int w, int band,
                        uint8_t* out_buf, int out_cap,
                        int* msbs_out, int* n_passes_out,
                        int* pass_ends, double* pass_dist, double* dist0,
                        double min_slope) {
  int n = h * w;
  std::vector<int64_t> mag(n);
  std::vector<uint8_t> neg(n);
  int64_t mx = 0;
  for (int i = 0; i < n; i++) {
    int64_t v = coeffs[i];
    mag[i] = v < 0 ? -v : v;
    neg[i] = v < 0;
    if (mag[i] > mx) mx = mag[i];
  }
  double d0 = 0.0;
  for (int i = 0; i < n; i++) d0 += (double)mag[i] * (double)mag[i];
  *dist0 = d0;
  int msbs = 0; while (mx >> msbs) msbs++;
  *msbs_out = msbs;
  if (msbs == 0) { *n_passes_out = 0; return 0; }

  T1State st(h, w);
  MQEnc enc;
  int np = 0;

  auto code_sign = [&](int y, int x) {
    int hc, vc, cx, xr;
    st.signnb(y, x, &hc, &vc);
    sign_ctx(hc, vc, &cx, &xr);
    enc.encode((int)(neg[y * w + x] ^ xr), cx);
  };

  auto sig_pass = [&](int plane) {
    int64_t bit = (int64_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++)
        for (int r = 0; r < rows; r++) {
          int y = y0 + r, i = y * w + x;
          if (st.sig[i]) continue;
          int hh, vv, dd;
          st.counts(y, x, &hh, &vv, &dd);
          if (hh + vv + dd == 0) continue;
          int b = (mag[i] & bit) ? 1 : 0;
          enc.encode(b, sig_ctx(hh, vv, dd, band));
          if (b) { st.sig[i] = 1; st.sgn[i] = neg[i]; code_sign(y, x); }
          st.vis[i] = 1;
        }
    }
  };

  auto mag_pass = [&](int plane) {
    int64_t bit = (int64_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++)
        for (int r = 0; r < rows; r++) {
          int y = y0 + r, i = y * w + x;
          if (!st.sig[i] || st.vis[i]) continue;
          int cx;
          if (st.ref[i]) cx = 16;
          else {
            int hh, vv, dd;
            st.counts(y, x, &hh, &vv, &dd);
            cx = (hh + vv + dd) ? 15 : 14;
          }
          enc.encode((mag[i] & bit) ? 1 : 0, cx);
          st.ref[i] = 1; st.vis[i] = 1;
        }
    }
  };

  auto cleanup_pass = [&](int plane) {
    int64_t bit = (int64_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        int r = 0;
        bool rl = rows == 4;
        if (rl) for (int k = 0; k < 4; k++) {
          int i = (y0 + k) * w + x;
          if (st.vis[i] || st.sig[i]) { rl = false; break; }
          int hh, vv, dd;
          st.counts(y0 + k, x, &hh, &vv, &dd);
          if (hh + vv + dd) { rl = false; break; }
        }
        if (rl) {
          int first = -1;
          for (int k = 0; k < 4; k++)
            if (mag[(y0 + k) * w + x] & bit) { first = k; break; }
          if (first < 0) { enc.encode(0, CTX_RL); continue; }
          enc.encode(1, CTX_RL);
          enc.encode((first >> 1) & 1, CTX_UNI);
          enc.encode(first & 1, CTX_UNI);
          int y = y0 + first, i = y * w + x;
          st.sig[i] = 1; st.sgn[i] = neg[i]; code_sign(y, x);
          r = first + 1;
        }
        for (int k = r; k < rows; k++) {
          int y = y0 + k, i = y * w + x;
          if (st.sig[i] || st.vis[i]) continue;
          int hh, vv, dd;
          st.counts(y, x, &hh, &vv, &dd);
          int b = (mag[i] & bit) ? 1 : 0;
          enc.encode(b, sig_ctx(hh, vv, dd, band));
          if (b) { st.sig[i] = 1; st.sgn[i] = neg[i]; code_sign(y, x); }
        }
      }
    }
    std::fill(st.vis.begin(), st.vis.end(), 0);
  };

  cleanup_pass(msbs - 1);
  pass_ends[np] = enc.flush();
  pass_dist[np++] = distortion(mag.data(), st, msbs - 1, false);
  for (int plane = msbs - 2; plane >= 0; plane--) {
    sig_pass(plane);
    pass_ends[np] = enc.flush();
    pass_dist[np++] = distortion(mag.data(), st, plane, true);
    mag_pass(plane);
    pass_ends[np] = enc.flush();
    pass_dist[np++] = distortion(mag.data(), st, plane, true);
    cleanup_pass(plane);
    pass_ends[np] = enc.flush();
    pass_dist[np++] = distortion(mag.data(), st, plane, false);
    // early stop: once a whole plane's distortion-length slope falls below
    // min_slope, deeper planes (with ~4x smaller slopes) cannot be kept by
    // any truncation at that threshold — skip coding them entirely.
    if (min_slope > 0 && np >= 4) {
      double dD = pass_dist[np - 4] - pass_dist[np - 1];
      double dR = (double)(pass_ends[np - 1] - pass_ends[np - 4]);
      if (dR > 0 && dD / dR < min_slope) break;
    }
  }
  *n_passes_out = np;
  int total = (int)enc.out.size();
  if (total > out_cap) return -1;
  std::memcpy(out_buf, enc.out.data(), total);
  return total;
}

int qsvc_encode_block(const int64_t* coeffs, int h, int w, int band,
                      uint8_t* out_buf, int out_cap,
                      int* msbs_out, int* n_passes_out,
                      int* pass_ends, double* pass_dist, double* dist0) {
  return qsvc_encode_block_t(coeffs, h, w, band, out_buf, out_cap,
                             msbs_out, n_passes_out, pass_ends, pass_dist,
                             dist0, 0.0);
}

// Decode one code-block (possibly truncated to n_passes).
int qsvc_decode_block(const uint8_t* data, int len, int msbs, int n_passes,
                      const int* pass_ends, int n_pass_ends,
                      int h, int w, int band, int64_t* out) {
  int n = h * w;
  std::memset(out, 0, n * sizeof(int64_t));
  if (msbs == 0 || n_passes == 0) return 0;
  T1State st(h, w);
  MQDec dec(data, len);

  auto seg = [&](int i) {
    int s = i == 0 ? 0 : pass_ends[i - 1];
    int e = i < n_pass_ends ? pass_ends[i] : len;
    dec.start_segment(s, e);
  };

  auto decode_sign = [&](int y, int x) -> int {
    int hc, vc, cx, xr;
    st.signnb(y, x, &hc, &vc);
    sign_ctx(hc, vc, &cx, &xr);
    return dec.decode(cx) ^ xr;
  };

  auto sig_pass = [&](int plane) {
    int64_t bit = (int64_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++)
        for (int r = 0; r < rows; r++) {
          int y = y0 + r, i = y * w + x;
          if (st.sig[i]) continue;
          int hh, vv, dd;
          st.counts(y, x, &hh, &vv, &dd);
          if (hh + vv + dd == 0) continue;
          if (dec.decode(sig_ctx(hh, vv, dd, band))) {
            st.sig[i] = 1; out[i] |= bit; st.sgn[i] = decode_sign(y, x);
          }
          st.vis[i] = 1;
        }
    }
  };

  auto mag_pass = [&](int plane) {
    int64_t bit = (int64_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++)
        for (int r = 0; r < rows; r++) {
          int y = y0 + r, i = y * w + x;
          if (!st.sig[i] || st.vis[i]) continue;
          int cx;
          if (st.ref[i]) cx = 16;
          else {
            int hh, vv, dd;
            st.counts(y, x, &hh, &vv, &dd);
            cx = (hh + vv + dd) ? 15 : 14;
          }
          if (dec.decode(cx)) out[i] |= bit;
          st.ref[i] = 1; st.vis[i] = 1;
        }
    }
  };

  auto cleanup_pass = [&](int plane) {
    int64_t bit = (int64_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        int r = 0;
        bool rl = rows == 4;
        if (rl) for (int k = 0; k < 4; k++) {
          int i = (y0 + k) * w + x;
          if (st.vis[i] || st.sig[i]) { rl = false; break; }
          int hh, vv, dd;
          st.counts(y0 + k, x, &hh, &vv, &dd);
          if (hh + vv + dd) { rl = false; break; }
        }
        if (rl) {
          if (!dec.decode(CTX_RL)) continue;
          int first = (dec.decode(CTX_UNI) << 1) | dec.decode(CTX_UNI);
          int y = y0 + first, i = y * w + x;
          st.sig[i] = 1; out[i] |= bit; st.sgn[i] = decode_sign(y, x);
          r = first + 1;
        }
        for (int k = r; k < rows; k++) {
          int y = y0 + k, i = y * w + x;
          if (st.sig[i] || st.vis[i]) continue;
          int hh, vv, dd;
          st.counts(y, x, &hh, &vv, &dd);
          if (dec.decode(sig_ctx(hh, vv, dd, band))) {
            st.sig[i] = 1; out[i] |= bit; st.sgn[i] = decode_sign(y, x);
          }
        }
      }
    }
    std::fill(st.vis.begin(), st.vis.end(), 0);
  };

  seg(0);
  cleanup_pass(msbs - 1);
  int pass_idx = 1, plane = msbs - 1;
  bool after_spp = false;
  int p = msbs - 2;
  while (p >= 0 && pass_idx < n_passes) {
    seg(pass_idx); sig_pass(p); pass_idx++; plane = p;
    if (pass_idx >= n_passes) { after_spp = true; break; }
    seg(pass_idx); mag_pass(p); pass_idx++;
    if (pass_idx >= n_passes) break;
    seg(pass_idx); cleanup_pass(p); pass_idx++;
    p--;
  }

  for (int i = 0; i < n; i++) {
    if (!st.sig[i]) continue;
    int u = (after_spp && !st.vis[i]) ? plane + 1 : plane;
    int64_t half = u > 0 ? ((int64_t)1 << u) >> 1 : 0;
    int64_t rec = out[i] + half;
    out[i] = st.sgn[i] ? -rec : rec;
  }
  return 0;
}

// Batched encode with OpenMP.  Buffers are per-block strided.
void qsvc_encode_blocks(const int64_t* coeffs, const int* offsets,
                        const int* hs, const int* ws, const int* bands,
                        int n_blocks,
                        uint8_t* out_bufs, int out_stride,
                        int* out_lens, int* msbs, int* n_passes,
                        int* pass_ends, int pass_stride,
                        double* pass_dist, double* dist0,
                        const double* min_slopes) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n_blocks; i++) {
    out_lens[i] = qsvc_encode_block_t(
        coeffs + offsets[i], hs[i], ws[i], bands[i],
        out_bufs + (size_t)i * out_stride, out_stride,
        msbs + i, n_passes + i,
        pass_ends + (size_t)i * pass_stride,
        pass_dist + (size_t)i * pass_stride, dist0 + i,
        min_slopes ? min_slopes[i] : 0.0);
  }
}

void qsvc_decode_blocks(const uint8_t* data, const int64_t* data_offsets,
                        const int* lens, const int* msbs,
                        const int* n_passes, const int* pass_ends,
                        const int* n_pass_ends, int pass_stride,
                        const int* hs, const int* ws, const int* bands,
                        int n_blocks, int64_t* out, const int* out_offsets) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n_blocks; i++) {
    qsvc_decode_block(data + data_offsets[i], lens[i], msbs[i], n_passes[i],
                      pass_ends + (size_t)i * pass_stride, n_pass_ends[i],
                      hs[i], ws[i], bands[i], out + out_offsets[i]);
  }
}

} // extern "C"
