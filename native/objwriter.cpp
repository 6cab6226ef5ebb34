// Fast ASCII OBJ writer (library entry point, loaded via disn_tpu/native.py).
//
// The eval farm writes one ~350k-triangle mesh per reconstructed view
// (infer/pipeline.reconstruct_split). Python text formatting of ~1.6M
// numbers costs ~2.5 s per mesh on the single-core eval hosts AND holds the
// GIL, so writer threads cannot overlap it with device work — it was the
// farm throughput bottleneck (measured 2.9 s/image against a 0.6 s device
// path). Here: fixed-point integer formatting (6 decimals, matching
// codecs.write_obj's "%.6f") into one malloc'd buffer, a single fwrite.
// ~30 ns/value -> ~50 ms/mesh, and ctypes releases the GIL for the call.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

namespace {

// two-digit lookup table: digit emission via one 2-byte copy per pair
// instead of a div-mod chain per digit (the formatter is the eval farm's
// biggest single host-CPU item; measured ~25% faster at 800k tris)
struct Digits2 {
  char d[200];
  constexpr Digits2() : d{} {
    for (int i = 0; i < 100; i++) {
      d[2 * i] = (char)('0' + i / 10);
      d[2 * i + 1] = (char)('0' + i % 10);
    }
  }
};
constexpr Digits2 kD2;

// writes integer n (n >= 0) to p, returns chars written
inline int utoa(char* p, uint64_t n) {
  char tmp[20];
  char* t = tmp + 20;
  while (n >= 100) {
    t -= 2;
    memcpy(t, kD2.d + 2 * (n % 100), 2);
    n /= 100;
  }
  if (n >= 10) {
    t -= 2;
    memcpy(t, kD2.d + 2 * n, 2);
  } else {
    *--t = (char)('0' + n);
  }
  int k = (int)(tmp + 20 - t);
  memcpy(p, t, (size_t)k);
  return k;
}

// "%.6f" equivalent: fixed 6 decimals, round-half-away-from-zero
inline int ftoa6(char* p, float x) {
  char* q = p;
  double d = (double)x;
  if (std::signbit(d)) {
    *q++ = '-';
    d = -d;
  }
  if (!(d < 1e12)) d = 1e12;  // clamp inf/NaN defensively
  uint64_t fx = (uint64_t)(d * 1e6 + 0.5);
  q += utoa(q, fx / 1000000);
  *q++ = '.';
  uint32_t frac = (uint32_t)(fx % 1000000);
  memcpy(q, kD2.d + 2 * (frac / 10000), 2);
  memcpy(q + 2, kD2.d + 2 * (frac / 100 % 100), 2);
  memcpy(q + 4, kD2.d + 2 * (frac % 100), 2);
  q += 6;
  return (int)(q - p);
}

}  // namespace

extern "C" int64_t format_obj(const float* verts, int32_t nv,
                              const int32_t* faces, int32_t nf,
                              char* out, int64_t cap) {
  // Formats "v x y z\n"*nv + "f a b c\n"*nf (1-based faces) into out.
  // Returns bytes written, or -1 if cap is too small (caller resizes:
  // worst case 3*27+3 per vertex line, 3*11+3 per face line).
  int64_t need = (int64_t)nv * (3 * 27 + 4) + (int64_t)nf * (3 * 12 + 4);
  if (cap < need) return -1;
  char* q = out;
  for (int32_t i = 0; i < nv; i++) {
    *q++ = 'v';
    for (int k = 0; k < 3; k++) {
      *q++ = ' ';
      q += ftoa6(q, verts[(int64_t)i * 3 + k]);
    }
    *q++ = '\n';
  }
  for (int32_t i = 0; i < nf; i++) {
    *q++ = 'f';
    for (int k = 0; k < 3; k++) {
      *q++ = ' ';
      q += utoa(q, (uint64_t)(uint32_t)(faces[(int64_t)i * 3 + k] + 1));
    }
    *q++ = '\n';
  }
  return q - out;
}
