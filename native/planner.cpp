// Native host-side index-plan builder for elasticdiffusion_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native runtime
// component around it: it builds the static gather/scatter plans (patch
// views, context crops, rational resample keep-lines, first-writer owner
// maps) that the Python layer otherwise derives with numpy. Exposed via a C
// ABI for ctypes (no pybind11 in this environment). Semantics mirror
// elasticdiffusion_tpu/ops/{views,resample}.py, which in turn transcribe
// /root/reference/elastic_diffusion.py:197-229, 446-630, 706-757.
//
// Build: make -C native  (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// views (elastic_diffusion.py:197-229)
// ---------------------------------------------------------------------------

// out_views: int32 buffer of capacity max_views*4 -> (h0, h1, w0, w1) rows.
// returns number of views, or -1 on overflow.
int ed_build_views(int H, int W, int h_ws, int w_ws, int stride,
                   int* out_views, int max_views) {
  int nbh = stride ? (int)std::ceil((double)(H - h_ws) / stride) + 1 : 1;
  int nbw = stride ? (int)std::ceil((double)(W - w_ws) / stride) + 1 : 1;
  int total = nbh * nbw;
  if (total > max_views) return -1;
  for (int i = 0; i < total; ++i) {
    int h0 = (i / nbw) * stride;
    int h1 = h0 + h_ws;
    if (h1 > H) { h0 = std::max(0, h0 - (h1 - H)); h1 = H; }
    int w0 = (i % nbw) * stride;
    int w1 = w0 + w_ws;
    if (w1 > W) { w0 = std::max(0, w0 - (w1 - W)); w1 = W; }
    out_views[4 * i + 0] = h0;
    out_views[4 * i + 1] = h1;
    out_views[4 * i + 2] = w0;
    out_views[4 * i + 3] = w1;
  }
  return total;
}

// ---------------------------------------------------------------------------
// context crop (elastic_diffusion.py:706-757)
// ---------------------------------------------------------------------------

static int context_lines(int start, int end, int limit, int S, int n,
                         int* before, int* after, int* n_before, int* n_after) {
  // returns 0; fills strided context line indices on both sides
  auto arange = [](int lo, int hi, int step, int* buf) {
    int c = 0;
    for (int v = lo; v < hi; v += step) buf[c++] = v;
    return c;
  };
  if (start - n * S < 0) {
    *n_before = arange(std::max(0, start - n * S), start - S + 1, S, before);
    int na = 2 * n - *n_before;
    *n_after = arange(end - 1 + S, std::min(limit, end + na * S), S, after);
  } else {
    *n_after = arange(end - 1 + S, std::min(limit, end + n * S), S, after);
    int nb = 2 * n - *n_after;
    *n_before = arange(std::max(0, start - nb * S), start - S + 1, S, before);
  }
  return 0;
}

// rows: capacity (b-a) + 2n; cols: capacity (d-c) + 2n; margins: int32[4].
// returns out_h in *out_h, out_w in *out_w.
int ed_crop_context_indices(int H, int W, int a, int b, int c, int d,
                            int S, int n, int* rows, int* cols,
                            int* margins, int* out_h, int* out_w) {
  std::vector<int> before(2 * n + 2), after(2 * n + 2);
  int n_t, n_b, n_l, n_r;
  context_lines(a, b, H, S, n, before.data(), after.data(), &n_t, &n_b);
  int k = 0;
  for (int i = 0; i < n_t; ++i) rows[k++] = before[i];
  for (int v = a; v < b; ++v) rows[k++] = v;
  for (int i = 0; i < n_b; ++i) rows[k++] = after[i];
  *out_h = k;
  context_lines(c, d, W, S, n, before.data(), after.data(), &n_l, &n_r);
  k = 0;
  for (int i = 0; i < n_l; ++i) cols[k++] = before[i];
  for (int v = c; v < d; ++v) cols[k++] = v;
  for (int i = 0; i < n_r; ++i) cols[k++] = after[i];
  *out_w = k;
  margins[0] = n_t; margins[1] = n_b; margins[2] = n_l; margins[3] = n_r;
  return 0;
}

// ---------------------------------------------------------------------------
// first-writer owner map (elastic_diffusion.py:852-861)
// ---------------------------------------------------------------------------

// views: (V,4) int32; margins: (V,4) int32; outputs: (H*W,) int32 each.
int ed_owner_map(int H, int W, const int* views, const int* margins, int V,
                 int* owner_view, int* owner_y, int* owner_x) {
  std::fill(owner_view, owner_view + H * W, -1);
  std::memset(owner_y, 0, sizeof(int) * H * W);
  std::memset(owner_x, 0, sizeof(int) * H * W);
  for (int v = 0; v < V; ++v) {
    int a = views[4 * v], b = views[4 * v + 1];
    int c = views[4 * v + 2], d = views[4 * v + 3];
    int n_t = margins[4 * v], n_l = margins[4 * v + 2];
    for (int y = a; y < b; ++y)
      for (int x = c; x < d; ++x) {
        int idx = y * W + x;
        if (owner_view[idx] == -1) {
          owner_view[idx] = v;
          owner_y[idx] = n_t + (y - a);
          owner_x[idx] = n_l + (x - c);
        }
      }
  }
  for (int i = 0; i < H * W; ++i)
    if (owner_view[i] < 0) return -1;  // views must tile the grid
  return 0;
}

// ---------------------------------------------------------------------------
// rational resample axis plan (elastic_diffusion.py:446-630)
// ---------------------------------------------------------------------------

// Python Fraction(double).limit_denominator(max_den) via exact mantissa
// fraction + Stern-Brocot bounds (same tie-break: closer candidate, and the
// upper bound k = (max_den - q0) / q1 convergent construction).
static void limit_denominator(double f, long long max_den,
                              long long* out_n, long long* out_d) {
  // exact fraction of the double
  int exp2;
  double m = std::frexp(f, &exp2);  // f = m * 2^exp2, 0.5<=m<1
  long long num = (long long)std::ldexp(m, 53);
  long long den = 1LL << 53;
  int e = exp2;  // f = num/den * 2^e
  while (e > 0) { num <<= 1; --e; }
  while (e < 0) { den <<= 1; ++e; }
  __int128 g = std::__gcd((long long)num, (long long)den);
  num /= (long long)g; den /= (long long)g;
  if (den <= max_den) { *out_n = num; *out_d = den; return; }

  // continued-fraction bounds (transcription of CPython Fraction)
  long long p0 = 0, q0 = 1, p1 = 1, q1 = 0;
  long long n = num, d = den;
  while (true) {
    long long a = n / d;
    long long q2 = q0 + a * q1;
    if (q2 > max_den) break;
    long long p2 = p0 + a * p1;
    p0 = p1; q0 = q1; p1 = p2; q1 = q2;
    long long t = n - a * d;
    n = d; d = t;
    if (d == 0) break;
  }
  long long k = (max_den - q0) / q1;
  long long b1n = p0 + k * p1, b1d = q0 + k * q1;  // bound1
  long long b2n = p1, b2d = q1;                    // bound2
  // closer to f wins; tie -> bound2 (CPython: if bound2 is closer or equal)
  __int128 d1 = ( (__int128)b1n * den - (__int128)num * b1d );
  __int128 d2 = ( (__int128)b2n * den - (__int128)num * b2d );
  if (d1 < 0) d1 = -d1;
  if (d2 < 0) d2 = -d2;
  // compare |b1 - f| vs |b2 - f|: d1/b1d vs d2/b2d
  if (d2 * (__int128)b1d <= d1 * (__int128)b2d) { *out_n = b2n; *out_d = b2d; }
  else { *out_n = b1n; *out_d = b1d; }
}

int ed_to_even_rational(double f, int max_block_sz, int* out_keep, int* out_block) {
  long long n, d;
  limit_denominator(f, max_block_sz, &n, &d);
  if (n % 2 != 0 || d % 2 != 0) limit_denominator(f, max_block_sz / 2, &n, &d);
  if (n % 2 != 0 || d % 2 != 0) { n *= 2; d *= 2; }
  *out_keep = (int)n;
  *out_block = (int)d;
  return 0;
}

// keep offsets + split positions for one block (elastic_diffusion.py:478-499)
static void keep_blocks(int block_sz, int n_remove,
                        std::vector<int>* offsets, std::vector<int>* masked) {
  int num_pairs = n_remove / 2;
  std::vector<char> mask(block_sz, 1);
  int interval = num_pairs + 1 > 0 ? block_sz / (num_pairs + 1) : block_sz;
  if (interval % 2 != 0) interval += 1;
  for (int i = 0; i < num_pairs; ++i) {
    int start = (i + 1) * interval - 1;
    masked->push_back(start - 1 - i * 2);
    masked->push_back(start + 2 - (i + 1) * 2);
    for (int j = start; j < std::min(start + 2, block_sz); ++j) mask[j] = 0;
  }
  for (int j = 0; j < block_sz; ++j)
    if (mask[j]) offsets->push_back(j);
}

// src_map / mask_line_of buffers of capacity >= 2*out_size + block_sz.
// returns effective kept length L (even), or -1 if odd (reference crashes).
int ed_axis_plan(int in_size, int out_size, int* src_map, int* mask_line_of) {
  int n_keep, block_sz;
  ed_to_even_rational((double)out_size / in_size, 32, &n_keep, &block_sz);
  int n_remove = block_sz - n_keep;
  long long num_blocks = (2LL * out_size) / n_keep;
  if (num_blocks * block_sz > 2LL * in_size) num_blocks -= 1;
  long long blocks_extent = num_blocks * block_sz;

  std::vector<int> offsets, masked;
  keep_blocks(block_sz, n_remove, &offsets, &masked);

  std::vector<int> kept;
  for (long long b = 0; b < blocks_extent; b += block_sz)
    for (int o : offsets) {
      long long v = b + o;
      if (v < 2LL * in_size) kept.push_back((int)v);
    }
  long long remain = 2LL * out_size - (long long)kept.size();
  for (long long v = blocks_extent;
       v < std::min(blocks_extent + std::max(remain, 0LL), 2LL * in_size); ++v)
    kept.push_back((int)v);
  int L = (int)kept.size();
  if (L % 2 != 0) return -1;
  for (int i = 0; i < L; ++i) src_map[i] = kept[i] / 2;

  // split positions from the REQUESTED out size (reference behavior)
  std::vector<int> splits;
  if (!masked.empty())
    for (int base = 0; base < 2 * out_size; base += n_keep)
      for (int mpos : masked) splits.push_back(base + mpos);

  // pointer-desync restore semantics (elastic_diffusion.py:446-465)
  int i = 0, j = 0, out = 0;
  while (i < L) {
    if (j < (int)splits.size() && i == splits[j]) {
      mask_line_of[i] = out;
      if (i + 1 < L) mask_line_of[i + 1] = out + 1;
      out += 2; j += 2;
    } else {
      mask_line_of[i] = out;
      if (i + 1 < L) mask_line_of[i + 1] = out;
      out += 1;
    }
    i += 2;
  }
  // discard slot for lines beyond the original extent
  for (int k2 = 0; k2 < L; ++k2)
    if (mask_line_of[k2] >= in_size) mask_line_of[k2] = in_size;
  return L;
}

}  // extern "C"
