// Native geometry ops for the evaluation harness.
//
// TPU-native equivalent of the reference's C++/CUDA L0 layer
// (second/core/box_ops_cc.so: rbbox_iou; second/core/non_max_suppression/
// nms.so + the numba-CUDA rotate_iou_kernel_eval, nms_gpu.py:180-415).
// The device hot path uses jitted XLA (see pillars_tpu/ops); this library
// serves the HOST eval harness, where the KITTI AP computation does
// dt x gt rotated-IoU matrices over thousands of frames — OpenMP across
// pairs.
//
// Exposed via a plain C ABI, loaded with ctypes (pillars_tpu/native).
//
// Algorithm identical to pillars_tpu/geometry/rotated_iou.py (and the
// reference kernel): clockwise corners -> contained corners + edge
// intersections -> angular sort -> shoelace.

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

struct P2 {
  double x, y;
};

// corners of [cx, cy, xd, yd, angle], clockwise rotation
// (reference nms_gpu.py:371-394, rbbox_to_corners)
inline void rbbox_to_corners(const float* b, P2* c) {
  const double a_cos = std::cos((double)b[4]);
  const double a_sin = std::sin((double)b[4]);
  const double cx = b[0], cy = b[1];
  const double hx = b[2] * 0.5, hy = b[3] * 0.5;
  const double sx[4] = {-hx, -hx, hx, hx};
  const double sy[4] = {-hy, hy, hy, -hy};
  for (int i = 0; i < 4; ++i) {
    c[i].x = a_cos * sx[i] + a_sin * sy[i] + cx;
    c[i].y = -a_sin * sx[i] + a_cos * sy[i] + cy;
  }
}

// inclusive point-in-quad via AB/AD projections (nms_gpu.py:327-343)
inline bool point_in_quad(double px, double py, const P2* c) {
  const double ab0 = c[1].x - c[0].x, ab1 = c[1].y - c[0].y;
  const double ad0 = c[3].x - c[0].x, ad1 = c[3].y - c[0].y;
  const double ap0 = px - c[0].x, ap1 = py - c[0].y;
  const double abab = ab0 * ab0 + ab1 * ab1;
  const double abap = ab0 * ap0 + ab1 * ap1;
  const double adad = ad0 * ad0 + ad1 * ad1;
  const double adap = ad0 * ap0 + ad1 * ap1;
  // small relative tolerance so corners of an IDENTICAL quad count as
  // contained despite rounding (ab.ad is only zero in exact arithmetic)
  const double e1 = 1e-9 * (abab + 1.0);
  const double e2 = 1e-9 * (adad + 1.0);
  return abab + e1 >= abap && abap >= -e1 && adad + e2 >= adap &&
         adap >= -e2;
}

// strict proper-intersection of segments (nms_gpu.py:239-282)
inline bool seg_intersection(const P2& A, const P2& B, const P2& C,
                             const P2& D, P2* out) {
  const bool acd = (D.y - A.y) * (C.x - A.x) > (C.y - A.y) * (D.x - A.x);
  const bool bcd = (D.y - B.y) * (C.x - B.x) > (C.y - B.y) * (D.x - B.x);
  if (acd == bcd) return false;
  const bool abc = (C.y - A.y) * (B.x - A.x) > (B.y - A.y) * (C.x - A.x);
  const bool abd = (D.y - A.y) * (B.x - A.x) > (B.y - A.y) * (D.x - A.x);
  if (abc == abd) return false;
  const double BA0 = B.x - A.x, BA1 = B.y - A.y;
  const double DC0 = D.x - C.x, DC1 = D.y - C.y;
  const double ABBA = A.x * B.y - B.x * A.y;
  const double CDDC = C.x * D.y - D.x * C.y;
  const double DH = BA1 * DC0 - BA0 * DC1;
  if (std::fabs(DH) < 1e-12) return false;
  out->x = (ABBA * DC0 - BA0 * CDDC) / DH;
  out->y = (ABBA * DC1 - BA1 * CDDC) / DH;
  return true;
}

inline double intersection_area(const P2* c1, const P2* c2) {
  P2 pts[24];
  int n = 0;
  for (int i = 0; i < 4; ++i) {
    if (point_in_quad(c1[i].x, c1[i].y, c2)) pts[n++] = c1[i];
    if (point_in_quad(c2[i].x, c2[i].y, c1)) pts[n++] = c2[i];
  }
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) {
      P2 p;
      if (seg_intersection(c1[i], c1[(i + 1) & 3], c2[j], c2[(j + 1) & 3],
                           &p))
        pts[n++] = p;
    }
  }
  if (n < 3) return 0.0;
  double cx = 0, cy = 0;
  for (int i = 0; i < n; ++i) {
    cx += pts[i].x;
    cy += pts[i].y;
  }
  cx /= n;
  cy /= n;
  double key[24];
  for (int i = 0; i < n; ++i) key[i] = std::atan2(pts[i].y - cy, pts[i].x - cx);
  // insertion sort by angle (n <= 24)
  for (int i = 1; i < n; ++i) {
    P2 p = pts[i];
    double k = key[i];
    int j = i - 1;
    while (j >= 0 && key[j] > k) {
      key[j + 1] = key[j];
      pts[j + 1] = pts[j];
      --j;
    }
    key[j + 1] = k;
    pts[j + 1] = p;
  }
  double area = 0;
  for (int i = 0; i < n; ++i) {
    const P2& a = pts[i];
    const P2& b = pts[(i + 1) % n];
    area += a.x * b.y - b.x * a.y;
  }
  return std::fabs(area) * 0.5;
}

}  // namespace

extern "C" {

// boxes1 [n, 5], boxes2 [k, 5] -> out [n, k]
// criterion: -1 IoU, 0 inter/area1, 1 inter/area2, 2 raw intersection
void rotated_overlap_matrix(const float* boxes1, int64_t n,
                            const float* boxes2, int64_t k, int criterion,
                            float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    P2 c1[4];
    rbbox_to_corners(boxes1 + i * 5, c1);
    const double area1 = (double)boxes1[i * 5 + 2] * boxes1[i * 5 + 3];
    for (int64_t j = 0; j < k; ++j) {
      P2 c2[4];
      rbbox_to_corners(boxes2 + j * 5, c2);
      const double area2 = (double)boxes2[j * 5 + 2] * boxes2[j * 5 + 3];
      const double inter = intersection_area(c1, c2);
      double denom;
      switch (criterion) {
        case -1:
          denom = area1 + area2 - inter;
          break;
        case 0:
          denom = area1;
          break;
        case 1:
          denom = area2;
          break;
        default:
          out[i * k + j] = (float)inter;
          continue;
      }
      out[i * k + j] =
          (float)(std::fabs(denom) < 1e-12 ? inter : inter / denom);
    }
  }
}

// Greedy standup NMS with the reference's +1 pixel convention
// (eval_helper_functions.py:553-598). boxes [n, 4] must be sorted by
// descending score by the caller. Returns number kept; indices in keep_out.
int64_t nms_standup(const float* boxes, int64_t n, float iou_threshold,
                    int64_t post_max, int64_t* keep_out) {
  int64_t kept = 0;
  // suppressed bitmap
  bool* suppressed = new bool[n]();
  for (int64_t i = 0; i < n && kept < post_max; ++i) {
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    const float* a = boxes + i * 4;
    const double sa = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0);
    for (int64_t j = i + 1; j < n; ++j) {
      if (suppressed[j]) continue;
      const float* b = boxes + j * 4;
      const double w =
          std::max(0.0, (double)std::min(a[2], b[2]) -
                            std::max(a[0], b[0]) + 1.0);
      const double h =
          std::max(0.0, (double)std::min(a[3], b[3]) -
                            std::max(a[1], b[1]) + 1.0);
      const double inter = w * h;
      const double sb = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
      if (inter / (sa + sb - inter) > iou_threshold) suppressed[j] = true;
    }
  }
  delete[] suppressed;
  return kept;
}

}  // extern "C"
