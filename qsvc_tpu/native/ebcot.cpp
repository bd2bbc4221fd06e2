// EBCOT Tier-1 + MQ coder — native fast path (C ABI, OpenMP batch).
//
// Algorithmically identical to the Python reference implementation in
// qsvc_tpu/codec/{mq,tier1}.py (same T.88 state machine, same guarded
// flush, same pass structure and scan order); the Python tests assert
// bit-exact agreement of the coded bytes between the two.  This is the
// framework's native replacement for the entropy coding the reference
// delegates to the closed-source Kakadu binaries
// (texture_compress_fb_j2k.py:183-196).
//
// Fast-path engineering (vs the straightforward per-coefficient version):
//  * one uint16 "flags" word per coefficient in a border-padded lattice,
//    caching the 8-neighbour significance bits + 4 NSEW neighbour sign
//    bits + SIG/VIS/REF/SGN of the coefficient itself — updated on the
//    fly when a coefficient becomes significant, so every context lookup
//    is one load + one table index instead of 9 bounds-checked loads;
//  * 256-entry significance-context LUT per band family and a 256-entry
//    sign-context LUT (context | xorbit<<5);
//  * incremental distortion tracking (SSE updated per coding event)
//    instead of a full-block rescan after every pass;
//  * strided input/output variants so whole packed DWT planes can be
//    passed once from Python with zero per-tile copies;
//  * OpenMP across code-blocks (each block's MQ stream is independent).
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
static inline int sig_ctx_ref(int h, int v, int d, int band) {
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
static inline void sign_ctx_ref(int h, int v, int* cx, int* xr) {
  if (h == 0 && v == 0) { *cx = 9; *xr = 0; }
  else if (h == 0) { *cx = 10; *xr = v < 0; }
  else if (h == 1) { *cx = v == 1 ? 13 : (v == 0 ? 12 : 11); *xr = 0; }
  else { *cx = v == 1 ? 11 : (v == 0 ? 12 : 13); *xr = 1; }
}

// Flag-word layout (one uint16 per coefficient, border-padded lattice):
//   bits 0..7  neighbour significance: NW N NE W E SW S SE
//   bits 8..11 neighbour signs (1 = negative): N S W E
//   bit 12 SIG, bit 13 VIS, bit 14 REF, bit 15 SGN (own sign)
constexpr uint16_t F_NW = 1 << 0, F_N = 1 << 1, F_NE = 1 << 2;
constexpr uint16_t F_W  = 1 << 3, F_E = 1 << 4;
constexpr uint16_t F_SW = 1 << 5, F_S = 1 << 6, F_SE = 1 << 7;
constexpr uint16_t F_SGN_N = 1 << 8, F_SGN_S = 1 << 9;
constexpr uint16_t F_SGN_W = 1 << 10, F_SGN_E = 1 << 11;
constexpr uint16_t F_SIG = 1 << 12, F_VIS = 1 << 13;
constexpr uint16_t F_REF = 1 << 14, F_SGN = 1 << 15;
constexpr uint16_t F_NBR = 0x00FF;

struct Luts {
  uint8_t sig[3][256];
  uint8_t sign[256];   // (cx | xr<<5) keyed by sigN|sigS<<1|sigW<<2|sigE<<3
                       //              | sgnN<<4|sgnS<<5|sgnW<<6|sgnE<<7
  Luts() {
    for (int band = 0; band < 3; band++)
      for (int b = 0; b < 256; b++) {
        int h = ((b >> 3) & 1) + ((b >> 4) & 1);
        int v = ((b >> 1) & 1) + ((b >> 6) & 1);
        int d = (b & 1) + ((b >> 2) & 1) + ((b >> 5) & 1) + ((b >> 7) & 1);
        sig[band][b] = (uint8_t)sig_ctx_ref(h, v, d, band);
      }
    for (int b = 0; b < 256; b++) {
      auto con = [&](int sig_bit, int sgn_bit) -> int {
        if (!((b >> sig_bit) & 1)) return 0;
        return ((b >> sgn_bit) & 1) ? -1 : 1;
      };
      int hh = con(2, 6) + con(3, 7);   // W + E
      int vv = con(0, 4) + con(1, 5);   // N + S
      int hc = hh > 1 ? 1 : (hh < -1 ? -1 : hh);
      int vc = vv > 1 ? 1 : (vv < -1 ? -1 : vv);
      int cx, xr;
      sign_ctx_ref(hc, vc, &cx, &xr);
      sign[b] = (uint8_t)(cx | (xr << 5));
    }
  }
};
static const Luts LUT;

static inline int sign_lut_index(uint16_t f) {
  return ((f >> 1) & 1) | (((f >> 6) & 1) << 1) |
         (((f >> 3) & 1) << 2) | (((f >> 4) & 1) << 3) |
         (((f >> 8) & 0xF) << 4);
}

struct T1Lattice {
  int h, w, w2;
  std::vector<uint16_t> fl;  // (h+2) x (w+2), border-padded
  T1Lattice(int h_, int w_) : h(h_), w(w_), w2(w_ + 2),
                              fl((h_ + 2) * (w_ + 2), 0) {}
  inline uint16_t* at(int y, int x) { return &fl[(y + 1) * w2 + (x + 1)]; }
  inline void set_sig(int y, int x, int neg) {
    uint16_t* p = at(y, x);
    p[0] |= F_SIG | (neg ? F_SGN : 0);
    p[-w2 - 1] |= F_SE;
    p[-w2]     |= (uint16_t)(F_S | (neg ? F_SGN_S : 0));
    p[-w2 + 1] |= F_SW;
    p[-1]      |= (uint16_t)(F_E | (neg ? F_SGN_E : 0));
    p[+1]      |= (uint16_t)(F_W | (neg ? F_SGN_W : 0));
    p[w2 - 1]  |= F_NE;
    p[w2]      |= (uint16_t)(F_N | (neg ? F_SGN_N : 0));
    p[w2 + 1]  |= F_NW;
  }
  void clear_vis() {
    // VIS bits only ever set on interior cells
    for (size_t i = 0; i < fl.size(); i++) fl[i] &= (uint16_t)~F_VIS;
  }
};

// reconstruction value of magnitude m truncated at plane p (spec mid-point)
static inline int64_t recon(int64_t m, int p) {
  int64_t half = p > 0 ? (int64_t)1 << (p - 1) : 0;
  return ((m >> p) << p) + half;
}

// -------------------------------------------------------------- encoder T1
//
// Templated on the (possibly strided) coefficient reader so packed DWT
// planes can be coded in place.
template <typename T>
static int encode_block_impl(const T* coeffs, int stride, int h, int w,
                             int band, uint8_t* out_buf, int out_cap,
                             int* msbs_out, int* n_passes_out,
                             int* pass_ends, double* pass_dist,
                             double* dist0, double min_slope) {
  const int n = h * w;
  std::vector<int32_t> mag(n);
  std::vector<uint8_t> neg(n);
  int32_t mx = 0;
  double d0 = 0.0;
  for (int y = 0; y < h; y++) {
    const T* row = coeffs + (size_t)y * stride;
    for (int x = 0; x < w; x++) {
      int32_t v = (int32_t)row[x];
      int32_t m = v < 0 ? -v : v;
      mag[y * w + x] = m;
      neg[y * w + x] = v < 0;
      if (m > mx) mx = m;
      d0 += (double)m * (double)m;
    }
  }
  *dist0 = d0;
  int msbs = 0; while (mx >> msbs) msbs++;
  *msbs_out = msbs;
  if (msbs == 0) { *n_passes_out = 0; return 0; }

  T1Lattice st(h, w);
  MQEnc enc;
  int np = 0;
  double sse = d0;   // incrementally tracked SSE (== distortion() rescan)
  const uint8_t* SIGLUT = LUT.sig[band];

  auto code_sign = [&](int y, int x, int ng) {
    uint16_t f = *st.at(y, x);
    uint8_t s = LUT.sign[sign_lut_index(f)];
    enc.encode(ng ^ (s >> 5), s & 0x1F);
  };

  auto become_sig = [&](int y, int x, int i, int plane) {
    int ng = neg[i];
    // sign context must be computed BEFORE the neighbour update
    code_sign(y, x, ng);
    st.set_sig(y, x, ng);
    double m = (double)mag[i];
    double e = m - (double)recon(mag[i], plane);
    sse += e * e - m * m;
  };

  auto sig_pass = [&](int plane) {
    const int32_t bit = (int32_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        uint16_t* col = st.at(y0, x);
        for (int r = 0; r < rows; r++) {
          uint16_t f = col[r * st.w2];
          if (f & F_SIG) continue;
          if (!(f & F_NBR)) continue;
          int y = y0 + r, i = y * w + x;
          int b = (mag[i] & bit) ? 1 : 0;
          enc.encode(b, SIGLUT[f & 0xFF]);
          if (b) become_sig(y, x, i, plane);
          col[r * st.w2] |= F_VIS;
        }
      }
    }
  };

  auto mag_pass = [&](int plane) {
    const int32_t bit = (int32_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        uint16_t* col = st.at(y0, x);
        for (int r = 0; r < rows; r++) {
          uint16_t f = col[r * st.w2];
          if (!(f & F_SIG) || (f & F_VIS)) continue;
          int i = (y0 + r) * w + x;
          int cx = (f & F_REF) ? 16 : ((f & F_NBR) ? 15 : 14);
          enc.encode((mag[i] & bit) ? 1 : 0, cx);
          col[r * st.w2] |= F_REF | F_VIS;
          double m = (double)mag[i];
          double eo = m - (double)recon(mag[i], plane + 1);
          double en = m - (double)recon(mag[i], plane);
          sse += en * en - eo * eo;
        }
      }
    }
  };

  auto cleanup_pass = [&](int plane) {
    const int32_t bit = (int32_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        uint16_t* col = st.at(y0, x);
        int r = 0;
        bool rl = rows == 4
            && !(col[0] & (F_SIG | F_VIS | F_NBR))
            && !(col[st.w2] & (F_SIG | F_VIS | F_NBR))
            && !(col[2 * st.w2] & (F_SIG | F_VIS | F_NBR))
            && !(col[3 * st.w2] & (F_SIG | F_VIS | F_NBR));
        if (rl) {
          int first = -1;
          for (int k = 0; k < 4; k++)
            if (mag[(y0 + k) * w + x] & bit) { first = k; break; }
          if (first < 0) { enc.encode(0, CTX_RL); continue; }
          enc.encode(1, CTX_RL);
          enc.encode((first >> 1) & 1, CTX_UNI);
          enc.encode(first & 1, CTX_UNI);
          int y = y0 + first;
          become_sig(y, x, y * w + x, plane);
          r = first + 1;
        }
        for (int k = r; k < rows; k++) {
          uint16_t f = col[k * st.w2];
          if (f & (F_SIG | F_VIS)) continue;
          int y = y0 + k, i = y * w + x;
          int b = (mag[i] & bit) ? 1 : 0;
          enc.encode(b, SIGLUT[f & 0xFF]);
          if (b) become_sig(y, x, i, plane);
        }
      }
    }
    st.clear_vis();
  };

  cleanup_pass(msbs - 1);
  pass_ends[np] = enc.flush();
  pass_dist[np++] = sse;
  for (int plane = msbs - 2; plane >= 0; plane--) {
    sig_pass(plane);
    pass_ends[np] = enc.flush();
    pass_dist[np++] = sse;
    mag_pass(plane);
    pass_ends[np] = enc.flush();
    pass_dist[np++] = sse;
    cleanup_pass(plane);
    pass_ends[np] = enc.flush();
    pass_dist[np++] = sse;
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

// -------------------------------------------------------------- decoder T1
template <typename OutT>
static int decode_block_impl(const uint8_t* data, int len, int msbs,
                             int n_passes, const int* pass_ends,
                             int n_pass_ends, int h, int w, int band,
                             OutT* out, int ostride) {
  for (int y = 0; y < h; y++)
    std::memset(out + (size_t)y * ostride, 0, w * sizeof(OutT));
  if (msbs == 0 || n_passes == 0) return 0;
  const int n = h * w;
  std::vector<int32_t> val(n, 0);
  T1Lattice st(h, w);
  MQDec dec(data, len);
  const uint8_t* SIGLUT = LUT.sig[band];

  auto seg = [&](int i) {
    int s = i == 0 ? 0 : pass_ends[i - 1];
    int e = i < n_pass_ends ? pass_ends[i] : len;
    dec.start_segment(s, e);
  };

  auto decode_sig = [&](int y, int x, int i, int32_t bit) {
    uint16_t f = *st.at(y, x);
    uint8_t s = LUT.sign[sign_lut_index(f)];
    int ng = dec.decode(s & 0x1F) ^ (s >> 5);
    val[i] |= bit;
    st.set_sig(y, x, ng);
  };

  auto sig_pass = [&](int plane) {
    const int32_t bit = (int32_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        uint16_t* col = st.at(y0, x);
        for (int r = 0; r < rows; r++) {
          uint16_t f = col[r * st.w2];
          if (f & F_SIG) continue;
          if (!(f & F_NBR)) continue;
          int y = y0 + r, i = y * w + x;
          if (dec.decode(SIGLUT[f & 0xFF])) decode_sig(y, x, i, bit);
          col[r * st.w2] |= F_VIS;
        }
      }
    }
  };

  auto mag_pass = [&](int plane) {
    const int32_t bit = (int32_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        uint16_t* col = st.at(y0, x);
        for (int r = 0; r < rows; r++) {
          uint16_t f = col[r * st.w2];
          if (!(f & F_SIG) || (f & F_VIS)) continue;
          int i = (y0 + r) * w + x;
          int cx = (f & F_REF) ? 16 : ((f & F_NBR) ? 15 : 14);
          if (dec.decode(cx)) val[i] |= bit;
          col[r * st.w2] |= F_REF | F_VIS;
        }
      }
    }
  };

  auto cleanup_pass = [&](int plane) {
    const int32_t bit = (int32_t)1 << plane;
    for (int y0 = 0; y0 < h; y0 += 4) {
      int rows = h - y0 < 4 ? h - y0 : 4;
      for (int x = 0; x < w; x++) {
        uint16_t* col = st.at(y0, x);
        int r = 0;
        bool rl = rows == 4
            && !(col[0] & (F_SIG | F_VIS | F_NBR))
            && !(col[st.w2] & (F_SIG | F_VIS | F_NBR))
            && !(col[2 * st.w2] & (F_SIG | F_VIS | F_NBR))
            && !(col[3 * st.w2] & (F_SIG | F_VIS | F_NBR));
        if (rl) {
          if (!dec.decode(CTX_RL)) continue;
          int first = (dec.decode(CTX_UNI) << 1) | dec.decode(CTX_UNI);
          int y = y0 + first;
          decode_sig(y, x, y * w + x, bit);
          r = first + 1;
        }
        for (int k = r; k < rows; k++) {
          uint16_t f = col[k * st.w2];
          if (f & (F_SIG | F_VIS)) continue;
          int y = y0 + k, i = y * w + x;
          if (dec.decode(SIGLUT[f & 0xFF])) decode_sig(y, x, i, bit);
        }
      }
    }
    st.clear_vis();
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

  for (int y = 0; y < h; y++) {
    OutT* orow = out + (size_t)y * ostride;
    for (int x = 0; x < w; x++) {
      uint16_t f = *st.at(y, x);
      if (!(f & F_SIG)) continue;
      int i = y * w + x;
      int u = (after_spp && !(f & F_VIS)) ? plane + 1 : plane;
      int32_t half = u > 0 ? ((int32_t)1 << u) >> 1 : 0;
      int32_t rec = val[i] + half;
      orow[x] = (OutT)((f & F_SGN) ? -rec : rec);
    }
  }
  return 0;
}

} // namespace

extern "C" {

// ------------------------------------------------- legacy int64 single APIs

int qsvc_encode_block_t(const int64_t* coeffs, int h, int w, int band,
                        uint8_t* out_buf, int out_cap,
                        int* msbs_out, int* n_passes_out,
                        int* pass_ends, double* pass_dist, double* dist0,
                        double min_slope) {
  return encode_block_impl<int64_t>(coeffs, w, h, w, band, out_buf, out_cap,
                                    msbs_out, n_passes_out, pass_ends,
                                    pass_dist, dist0, min_slope);
}

int qsvc_encode_block(const int64_t* coeffs, int h, int w, int band,
                      uint8_t* out_buf, int out_cap,
                      int* msbs_out, int* n_passes_out,
                      int* pass_ends, double* pass_dist, double* dist0) {
  return qsvc_encode_block_t(coeffs, h, w, band, out_buf, out_cap,
                             msbs_out, n_passes_out, pass_ends, pass_dist,
                             dist0, 0.0);
}

int qsvc_decode_block(const uint8_t* data, int len, int msbs, int n_passes,
                      const int* pass_ends, int n_pass_ends,
                      int h, int w, int band, int64_t* out) {
  return decode_block_impl<int64_t>(data, len, msbs, n_passes, pass_ends,
                                    n_pass_ends, h, w, band, out, w);
}

// --------------------------------------------------- legacy batched (int64)

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

// ------------------------------------------- strided packed-plane batched
//
// The production path: one call per (frames, H, W) stack of packed DWT
// planes (int16 or int32, as produced on device), per-block byte offsets
// into the base pointer and a shared row stride — zero host-side copies.

#define QSVC_STRIDED_ENC(NAME, T)                                            \
void NAME(const T* base, const int64_t* offsets, int stride,                 \
          const int* hs, const int* ws, const int* bands, int n_blocks,      \
          uint8_t* out_bufs, int out_stride, int* out_lens, int* msbs,       \
          int* n_passes, int* pass_ends, int pass_stride,                    \
          double* pass_dist, double* dist0, const double* min_slopes) {      \
  _Pragma("omp parallel for schedule(dynamic)")                              \
  for (int i = 0; i < n_blocks; i++) {                                       \
    out_lens[i] = encode_block_impl<T>(                                      \
        base + offsets[i], stride, hs[i], ws[i], bands[i],                   \
        out_bufs + (size_t)i * out_stride, out_stride,                       \
        msbs + i, n_passes + i,                                              \
        pass_ends + (size_t)i * pass_stride,                                 \
        pass_dist + (size_t)i * pass_stride, dist0 + i,                      \
        min_slopes ? min_slopes[i] : 0.0);                                   \
  }                                                                          \
}

QSVC_STRIDED_ENC(qsvc_encode_blocks_s16, int16_t)
QSVC_STRIDED_ENC(qsvc_encode_blocks_s32, int32_t)

// Strided batch decode into a preallocated int32 plane stack.
void qsvc_decode_blocks_s32(const uint8_t* data, const int64_t* data_offsets,
                            const int* lens, const int* msbs,
                            const int* n_passes, const int* pass_ends,
                            const int* n_pass_ends, int pass_stride,
                            const int* hs, const int* ws, const int* bands,
                            int n_blocks, int32_t* out_base,
                            const int64_t* out_offsets, int out_row_stride) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n_blocks; i++) {
    decode_block_impl<int32_t>(
        data + data_offsets[i], lens[i], msbs[i], n_passes[i],
        pass_ends + (size_t)i * pass_stride, n_pass_ends[i],
        hs[i], ws[i], bands[i],
        out_base + out_offsets[i], out_row_stride);
  }
}

} // extern "C"
