// Fast ASCII OBJ parser (library entry point, loaded via disn_tpu/native.py).
//
// The evaluator (eval/runner.py, mirroring the reference's pymesh loads in
// test/test_cd_emd.py:246-258) reads GT + 24 predicted view meshes per
// object; the pure-Python reader in core/codecs.py walks ~530k lines of a
// 350k-triangle OBJ at interpreter speed (~seconds per mesh on the
// single-core eval hosts) and holds the GIL — it would dominate a full-split
// eval the way Python OBJ *formatting* dominated the farm before
// objwriter.cpp. Semantics match codecs.read_obj exactly: 'v x y z' floats,
// 'f' faces take the first index of each 'i/j/k' token (1-based -> 0-based)
// and fan-triangulate polygons; everything else is ignored.
//
// Number parsing: a fixed-point fast path (all the meshes this framework
// writes are %.6f) accumulating digits into a u64 and dividing by an exact
// power of ten. Both u (<= 15 digits < 2^53) and 10^k are then EXACTLY
// representable doubles, so the single division is the correctly-rounded
// double of the decimal — exactly what Python's float() produces — then
// narrowed to f32 the same way numpy narrows. Exponents / >=16-digit forms
// fall back to strtod (same double -> float path, so parity with the Python
// reader holds everywhere; at 16+ digits u itself would round before the
// division — double rounding — losing the invariant). strtof was 4-5x
// slower than the whole rest of the parse.
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

inline bool is_sp(char c) { return c == ' ' || c == '\t' || c == '\r'; }
inline bool is_dig(char c) { return c >= '0' && c <= '9'; }

// advance past the current line (leaves p after '\n' or at end)
inline const char* skip_line(const char* p, const char* end) {
  while (p < end && *p != '\n') p++;
  return p < end ? p + 1 : end;
}

const double kPow10[16] = {1e0,  1e1,  1e2,  1e3, 1e4,  1e5,
                           1e6,  1e7,  1e8,  1e9, 1e10, 1e11,
                           1e12, 1e13, 1e14, 1e15};

// returns the char after the number, or nullptr on no digits
inline const char* parse_f32(const char* q, const char* end, float* out) {
  const char* s = q;
  bool neg = false;
  if (q < end && (*q == '-' || *q == '+')) {
    neg = *q == '-';
    q++;
  }
  uint64_t u = 0;
  int nd = 0, k = 0;
  bool any = false, slow = false;
  while (q < end && is_dig(*q)) {
    if (nd < 15) {  // keep u < 2^53 so (double)u is exact — see header
      u = u * 10 + (uint64_t)(*q - '0');
      nd++;
    } else {
      slow = true;
    }
    q++;
    any = true;
  }
  if (q < end && *q == '.') {
    q++;
    while (q < end && is_dig(*q)) {
      if (nd < 15) {
        u = u * 10 + (uint64_t)(*q - '0');
        nd++;
        k++;
      } else {
        slow = true;
      }
      q++;
      any = true;
    }
  }
  if (q < end && (*q == 'e' || *q == 'E')) slow = true;
  if (!any) slow = true;  // inf/nan/garbage: let strtod decide
  if (slow) {
    char* qe = nullptr;
    double d = strtod(s, &qe);
    if (qe == s) return nullptr;
    *out = (float)d;
    return qe;
  }
  double d = (double)u / kPow10[k];
  *out = (float)(neg ? -d : d);
  return q;
}

inline const char* parse_i32(const char* q, const char* end, int32_t* out) {
  bool neg = false;
  if (q < end && (*q == '-' || *q == '+')) {
    neg = *q == '-';
    q++;
  }
  if (q >= end || !is_dig(*q)) return nullptr;
  int64_t v = 0;
  while (q < end && is_dig(*q)) {
    v = v * 10 + (*q - '0');
    q++;
  }
  *out = (int32_t)(neg ? -v : v);
  return q;
}

}  // namespace

extern "C" int64_t parse_obj(const char* buf, int64_t len,
                             float* verts, int64_t vcap,
                             int32_t* faces, int64_t fcap,
                             int64_t* out_counts) {
  // Parses buf[0:len]; writes up to vcap vertices (x,y,z triples) and fcap
  // triangles (3 x int32). Returns 0 on success with out_counts = {nv, nf};
  // -1 if a cap is too small (out_counts then holds the NEEDED counts so
  // the caller can resize and retry); -2 on a malformed numeric field.
  const char* p = buf;
  const char* end = buf + len;
  int64_t nv = 0, nf = 0;
  bool overflow = false;
  while (p < end) {
    // Python-reader parity (codecs.read_obj): a directive is the literal
    // "v " / "f " prefix at COLUMN 0 — no leading whitespace, no tab
    // separator (line.startswith("v ")); anything else skips the line
    if (*p == 'v' && p + 1 < end && p[1] == ' ') {
      const char* q = p + 1;
      float xyz[3];
      for (int k = 0; k < 3; k++) {
        while (q < end && is_sp(*q)) q++;
        q = parse_f32(q, end, &xyz[k]);
        if (!q) return -2;
      }
      if (nv < vcap) {
        verts[nv * 3 + 0] = xyz[0];
        verts[nv * 3 + 1] = xyz[1];
        verts[nv * 3 + 2] = xyz[2];
      } else {
        overflow = true;
      }
      nv++;
      p = skip_line(q, end);
    } else if (*p == 'f' && p + 1 < end && p[1] == ' ') {
      const char* q = p + 1;
      int32_t idx[64];
      int n = 0;
      while (true) {
        while (q < end && is_sp(*q)) q++;
        if (q >= end || *q == '\n' || *q == '#') break;
        int32_t v;
        q = parse_i32(q, end, &v);
        if (!q) return -2;
        // skip the /vt/vn tail of the token
        while (q < end && !is_sp(*q) && *q != '\n') q++;
        if (n == 64) return -2;  // >64-gon: treat as malformed so the
        // caller falls back to the Python loop (which fan-triangulates
        // arbitrary polygons) instead of silently truncating the face
        idx[n++] = v - 1;
      }
      for (int i = 1; i + 1 < n; i++) {
        if (nf < fcap) {
          faces[nf * 3 + 0] = idx[0];
          faces[nf * 3 + 1] = idx[i];
          faces[nf * 3 + 2] = idx[i + 1];
        } else {
          overflow = true;
        }
        nf++;
      }
      p = skip_line(q, end);
    } else {
      p = skip_line(p, end);
    }
  }
  out_counts[0] = nv;
  out_counts[1] = nf;
  return overflow ? -1 : 0;
}
