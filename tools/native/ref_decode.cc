// Native re-derivation of the reference's per-class CRF refinement cost.
//
// The PyTorch reference refines every candidate class mask with pydensecrf
// (C++ permutohedral-lattice mean-field; reference tools/seg_evaluation.py:
// 31-54): 2 labels, 3 iterations, Gaussian pairwise (sxy=3, compat=3) +
// bilateral pairwise (sxy=40, srgb=13, compat=10). pydensecrf is not
// installable here, so this file re-implements the same mean-field with the
// same approximation family at native speed: separable truncated Gaussian
// for the spatial kernel and a splat -> 1-2-1 blur -> slice bilateral grid
// for the bilateral kernel (the regular-grid sibling of the permutohedral
// lattice, doing less work per point than its barycentric splat/slice).
// Timing this gives a defensible stand-in for the reference's host-side
// per-class decode cost. Built by tools/measure_baseline.py via g++ -O3.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// separable Gaussian along rows then cols, 2 channels, zero ("constant")
// boundary like scipy.ndimage.gaussian_filter(mode="constant")
void gaussian2d(const float* in, float* out, int h, int w, float sigma) {
  const int radius = static_cast<int>(4.0f * sigma + 0.5f);
  std::vector<float> k(2 * radius + 1);
  float sum = 0.f;
  for (int i = -radius; i <= radius; ++i) {
    k[i + radius] = std::exp(-0.5f * i * i / (sigma * sigma));
    sum += k[i + radius];
  }
  for (auto& v : k) v /= sum;

  std::vector<float> tmp(static_cast<size_t>(h) * w);
  for (int c = 0; c < 2; ++c) {
    const float* src = in + static_cast<size_t>(c) * h * w;
    float* dst = out + static_cast<size_t>(c) * h * w;
    // rows
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        float acc = 0.f;
        const int lo = x - radius < 0 ? -x : -radius;
        const int hi = x + radius >= w ? w - 1 - x : radius;
        for (int i = lo; i <= hi; ++i)
          acc += k[i + radius] * src[y * w + x + i];
        tmp[y * w + x] = acc;
      }
    }
    // cols
    for (int y = 0; y < h; ++y) {
      const int lo = y - radius < 0 ? -y : -radius;
      const int hi = y + radius >= h ? h - 1 - y : radius;
      for (int x = 0; x < w; ++x) {
        float acc = 0.f;
        for (int i = lo; i <= hi; ++i)
          acc += k[i + radius] * tmp[(y + i) * w + x];
        dst[y * w + x] = acc;
      }
    }
  }
}

// 1-2-1 binomial blur along one axis of a flattened 5-D grid
void blur_axis(std::vector<float>& g, const int dims[5], int axis, int ch) {
  int stride = 1;
  for (int a = axis + 1; a < 5; ++a) stride *= dims[a];
  int n_cells = 1;
  for (int a = 0; a < 5; ++a) n_cells = n_cells * dims[a];
  const int extent = dims[axis];
  std::vector<float> line(extent);
  const int outer = n_cells / (extent * stride);
  for (int c = 0; c < ch; ++c) {
    float* base = g.data() + static_cast<size_t>(c) * n_cells;
    for (int o = 0; o < outer; ++o) {
      for (int s = 0; s < stride; ++s) {
        float* p = base + static_cast<size_t>(o) * extent * stride + s;
        for (int i = 0; i < extent; ++i) line[i] = p[i * stride];
        for (int i = 0; i < extent; ++i) {
          const float lo = i > 0 ? line[i - 1] : line[i];
          const float hi = i < extent - 1 ? line[i + 1] : line[i];
          p[i * stride] = 0.25f * (lo + 2.f * line[i] + hi);
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// probs: (h*w) foreground probability; img: (h*w*3) uint8 RGB;
// out: (h*w) int32 argmax labels. Returns 0 on success.
int dense_crf_binary(const uint8_t* img, const float* probs, int h, int w,
                     int iters, float g_sxy, float g_compat, float b_sxy,
                     float b_srgb, float b_compat, int32_t* out) {
  const int n = h * w;

  // unary
  std::vector<float> u(2 * n), q(2 * n), mg(2 * n), mb(2 * n);
  for (int i = 0; i < n; ++i) {
    const float p = probs[i];
    u[i] = -std::log(1.f - p + 1e-8f);
    u[n + i] = -std::log(p + 1e-8f);
  }
  for (int i = 0; i < n; ++i) {
    const float a = -u[i], b = -u[n + i];
    const float m = a > b ? a : b;
    const float ea = std::exp(a - m), eb = std::exp(b - m);
    q[i] = ea / (ea + eb);
    q[n + i] = eb / (ea + eb);
  }

  // bilateral grid cell per pixel (static across iterations)
  int dims[5] = {0, 0, 0, 0, 0};
  std::vector<int32_t> cell(n);
  {
    std::vector<int> gy(n), gx(n), gr(n), gg(n), gb(n);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const int i = y * w + x;
        gy[i] = static_cast<int>(y / b_sxy);
        gx[i] = static_cast<int>(x / b_sxy);
        gr[i] = static_cast<int>(img[3 * i + 0] / b_srgb);
        gg[i] = static_cast<int>(img[3 * i + 1] / b_srgb);
        gb[i] = static_cast<int>(img[3 * i + 2] / b_srgb);
        dims[0] = dims[0] > gy[i] + 1 ? dims[0] : gy[i] + 1;
        dims[1] = dims[1] > gx[i] + 1 ? dims[1] : gx[i] + 1;
        dims[2] = dims[2] > gr[i] + 1 ? dims[2] : gr[i] + 1;
        dims[3] = dims[3] > gg[i] + 1 ? dims[3] : gg[i] + 1;
        dims[4] = dims[4] > gb[i] + 1 ? dims[4] : gb[i] + 1;
      }
    for (int i = 0; i < n; ++i) {
      int32_t idx = gy[i];
      idx = idx * dims[1] + gx[i];
      idx = idx * dims[2] + gr[i];
      idx = idx * dims[3] + gg[i];
      idx = idx * dims[4] + gb[i];
      cell[i] = idx;
    }
  }
  int n_cells = 1;
  for (int a = 0; a < 5; ++a) n_cells *= dims[a];
  if (n_cells <= 0) return 1;

  // kernel normalization: filtered all-ones (pydensecrf-style), static
  std::vector<float> norm(n_cells, 0.f);
  for (int i = 0; i < n; ++i) norm[cell[i]] += 1.f;
  {
    std::vector<float> tmp = norm;
    for (int a = 0; a < 5; ++a) blur_axis(tmp, dims, a, 1);
    norm.swap(tmp);
  }

  std::vector<float> grid(2 * static_cast<size_t>(n_cells));
  for (int it = 0; it < iters; ++it) {
    // spatial message
    gaussian2d(q.data(), mg.data(), h, w, g_sxy);
    // bilateral message: splat, blur, slice
    std::memset(grid.data(), 0, grid.size() * sizeof(float));
    for (int i = 0; i < n; ++i) {
      grid[cell[i]] += q[i];
      grid[n_cells + cell[i]] += q[n + i];
    }
    for (int a = 0; a < 5; ++a) blur_axis(grid, dims, a, 2);
    for (int i = 0; i < n; ++i) {
      const float nz = norm[cell[i]] > 1e-12f ? norm[cell[i]] : 1e-12f;
      mb[i] = grid[cell[i]] / nz;
      mb[n + i] = grid[n_cells + cell[i]] / nz;
    }
    // mean-field update
    for (int i = 0; i < n; ++i) {
      const float a = -u[i] + g_compat * mg[i] + b_compat * mb[i];
      const float b =
          -u[n + i] + g_compat * mg[n + i] + b_compat * mb[n + i];
      const float m = a > b ? a : b;
      const float ea = std::exp(a - m), eb = std::exp(b - m);
      q[i] = ea / (ea + eb);
      q[n + i] = eb / (ea + eb);
    }
  }
  for (int i = 0; i < n; ++i) out[i] = q[n + i] > q[i] ? 1 : 0;
  return 0;
}

}  // extern "C"
