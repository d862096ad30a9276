// Native KITTI-AP greedy matcher for the evaluation harness.
//
// TPU-native equivalent of the reference's numba-JIT matcher kernels
// (second/utils/eval.py:166-286 compute_statistics_jit and :298-345
// fused_compute_statistics). numba is not part of this image's stack, and
// the matcher is an inherently sequential greedy assignment per frame, so
// it lives here as C++ (OpenMP across frames) instead of Python loops.
// The Python twin (pillars_tpu/eval/kitti_ap.py::compute_statistics) stays
// as the oracle for tests and as the fallback when no toolchain exists.
//
// Data layout (all row-major, float64):
//   overlaps  per frame [ndt, ngt]   (dt x gt)
//   gt_datas  per frame [ngt, 5]     (bbox x1 y1 x2 y2, alpha)
//   dt_datas  per frame [ndt, 6]     (bbox x1 y1 x2 y2, alpha, score)
//   ignored_gt/ignored_det int64 per frame
//   dc_bboxes per frame [ndc, 4]
// Frames are concatenated; *_off arrays hold row offsets with a final
// sentinel (len = num_frames + 1). ov_off holds ELEMENT offsets of each
// frame's matrix.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kNoDetection = -10000000.0;  // eval.py NO_DETECTION

// image_box_overlap criterion=0 for one (dt bbox, dontcare bbox) pair
// (reference eval.py:97-125; no +1 pixel convention here).
inline double image_overlap_c0(const double* a, const double* b) {
  const double iw = std::min(a[2], b[2]) - std::max(a[0], b[0]);
  const double ih = std::min(a[3], b[3]) - std::max(a[1], b[1]);
  if (iw <= 0.0 || ih <= 0.0) return 0.0;
  const double inter = iw * ih;
  return inter / ((a[2] - a[0]) * (a[3] - a[1]));
}

struct Frame {
  const double* ov;
  const double* gt;
  const double* dt;
  const int64_t* igt;
  const int64_t* idt;
  const double* dc;
  int64_t ndc;
  int64_t ngt;
  int64_t ndt;
};

// Exact mirror of compute_statistics (kitti_ap.py:214-304 /
// reference eval.py:166-286), including elif ordering and the
// assigned-ignored-det tie semantics.
//
// When cand/cand_off are non-null they give, for each gt i, the ascending-j
// list of dts with idt[j] != -1 and overlap > min_overlap. Every matcher
// branch requires overlap > min_overlap, and js failing it have no other
// effect, so iterating candidates is semantics-preserving — it just lets
// the batched caller amortize the ngt*ndt overlap scan across thresholds.
void stats_core(const Frame& f, int metric, double min_overlap, double thresh,
                bool compute_fp, bool compute_aos, double* out4,
                double* thresholds_out, int64_t* nthresh_out,
                const int32_t* cand = nullptr,
                const int64_t* cand_off = nullptr) {
  std::vector<char> assigned(f.ndt, 0), ign_thresh(f.ndt, 0);
  if (compute_fp) {
    for (int64_t j = 0; j < f.ndt; ++j)
      if (f.dt[j * 6 + 5] < thresh) ign_thresh[j] = 1;
  }
  int64_t tp = 0, fp = 0, fn = 0;
  double similarity = 0.0;
  std::vector<double> delta;
  delta.reserve((size_t)f.ngt);
  int64_t thresh_idx = 0;
  for (int64_t i = 0; i < f.ngt; ++i) {
    if (f.igt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = kNoDetection;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;
    const int64_t cbeg = cand ? cand_off[i] : 0;
    const int64_t cend = cand ? cand_off[i + 1] : f.ndt;
    for (int64_t c = cbeg; c < cend; ++c) {
      const int64_t j = cand ? (int64_t)cand[c] : c;
      if (f.idt[j] == -1 || assigned[j] || ign_thresh[j]) continue;
      const double overlap = f.ov[j * f.ngt + i];
      const double dt_score = f.dt[j * 6 + 5];
      if (!compute_fp && overlap > min_overlap &&
          dt_score > valid_detection) {
        det_idx = j;
        valid_detection = dt_score;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 f.idt[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1.0;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == kNoDetection && f.idt[j] == 1) {
        det_idx = j;
        valid_detection = 1.0;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == kNoDetection && f.igt[i] == 0) {
      fn += 1;
    } else if (valid_detection != kNoDetection &&
               (f.igt[i] == 1 || f.idt[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != kNoDetection) {
      tp += 1;
      if (thresholds_out) thresholds_out[thresh_idx] = f.dt[det_idx * 6 + 5];
      thresh_idx += 1;
      if (compute_aos) delta.push_back(f.gt[i * 5 + 4] - f.dt[det_idx * 6 + 4]);
      assigned[det_idx] = 1;
    }
  }
  if (compute_fp) {
    for (int64_t j = 0; j < f.ndt; ++j) {
      if (!(assigned[j] || f.idt[j] == -1 || f.idt[j] == 1 || ign_thresh[j]))
        fp += 1;
    }
    int64_t nstuff = 0;
    if (metric == 0 && f.ndc > 0) {
      for (int64_t i = 0; i < f.ndc; ++i) {
        for (int64_t j = 0; j < f.ndt; ++j) {
          if (assigned[j] || f.idt[j] == -1 || f.idt[j] == 1 ||
              ign_thresh[j])
            continue;
          if (image_overlap_c0(f.dt + j * 6, f.dc + i * 4) > min_overlap) {
            assigned[j] = 1;
            nstuff += 1;
          }
        }
      }
    }
    fp -= nstuff;
    if (compute_aos) {
      double s = 0.0;
      for (double d : delta) s += (1.0 + std::cos(d)) / 2.0;
      similarity = (tp > 0 || fp > 0) ? s : -1.0;
    }
  }
  out4[0] = (double)tp;
  out4[1] = (double)fp;
  out4[2] = (double)fn;
  out4[3] = similarity;
  if (nthresh_out) *nthresh_out = thresh_idx;
}

inline Frame make_frame(const double* ov_flat, const int64_t* ov_off,
                        const double* gt_flat, const int64_t* gt_off,
                        const double* dt_flat, const int64_t* dt_off,
                        const int64_t* igt_flat, const int64_t* idt_flat,
                        const double* dc_flat, const int64_t* dc_off,
                        int64_t fi) {
  Frame f;
  f.ov = ov_flat + ov_off[fi];
  f.gt = gt_flat + gt_off[fi] * 5;
  f.dt = dt_flat + dt_off[fi] * 6;
  f.igt = igt_flat + gt_off[fi];
  f.idt = idt_flat + dt_off[fi];
  f.dc = dc_flat ? dc_flat + dc_off[fi] * 4 : nullptr;
  f.ndc = dc_off ? dc_off[fi + 1] - dc_off[fi] : 0;
  f.ngt = gt_off[fi + 1] - gt_off[fi];
  f.ndt = dt_off[fi + 1] - dt_off[fi];
  return f;
}

}  // namespace

extern "C" {

// Phase 1 of eval_class (eval.py:613-621): per-frame matched-TP scores
// (compute_fp=false, thresh=0). scores_out capacity = total gt rows; frame
// fi writes at gt_off[fi], count into counts_out[fi].
void eval_match_scores_batch(const double* ov_flat, const int64_t* ov_off,
                             const double* gt_flat, const int64_t* gt_off,
                             const double* dt_flat, const int64_t* dt_off,
                             const int64_t* igt_flat, const int64_t* idt_flat,
                             int64_t num_frames, int metric,
                             double min_overlap, double* scores_out,
                             int64_t* counts_out) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t fi = 0; fi < num_frames; ++fi) {
    Frame f = make_frame(ov_flat, ov_off, gt_flat, gt_off, dt_flat, dt_off,
                         igt_flat, idt_flat, nullptr, nullptr, fi);
    double out4[4];
    stats_core(f, metric, min_overlap, 0.0, false, false, out4,
               scores_out + gt_off[fi], counts_out + fi);
  }
}

// Phase 2 (eval.py:622-645 + fused_compute_statistics): accumulate
// pr[T, 4] = (tp, fp, fn, similarity) over all frames x thresholds.
// pr must be zero-initialized by the caller. similarity == -1 frames are
// skipped in the sum (eval.py:643-644).
void eval_fused_statistics_batch(
    const double* ov_flat, const int64_t* ov_off, const double* gt_flat,
    const int64_t* gt_off, const double* dt_flat, const int64_t* dt_off,
    const int64_t* igt_flat, const int64_t* idt_flat, const double* dc_flat,
    const int64_t* dc_off, int64_t num_frames, int metric, double min_overlap,
    const double* threshs, int64_t num_threshs, int compute_aos, double* pr) {
#pragma omp parallel
  {
    std::vector<double> local((size_t)num_threshs * 4, 0.0);
    std::vector<int32_t> cand;
    std::vector<int64_t> cand_off;
    std::vector<double> scores;
#pragma omp for schedule(dynamic, 16) nowait
    for (int64_t fi = 0; fi < num_frames; ++fi) {
      Frame f = make_frame(ov_flat, ov_off, gt_flat, gt_off, dt_flat, dt_off,
                           igt_flat, idt_flat, dc_flat, dc_off, fi);
      // Per-gt candidate dts (overlap > min_overlap), built once per frame
      // and shared by all thresholds.
      cand.clear();
      cand_off.assign((size_t)f.ngt + 1, 0);
      for (int64_t i = 0; i < f.ngt; ++i) {
        if (f.igt[i] != -1) {
          for (int64_t j = 0; j < f.ndt; ++j) {
            if (f.idt[j] != -1 && f.ov[j * f.ngt + i] > min_overlap)
              cand.push_back((int32_t)j);
          }
        }
        cand_off[(size_t)i + 1] = (int64_t)cand.size();
      }
      // Thresholds with the same active-dt set {j : score_j >= thresh}
      // produce identical statistics; the set is determined by how many
      // sorted scores clear the threshold, so memoize on that count.
      scores.assign(f.ndt, 0.0);
      for (int64_t j = 0; j < f.ndt; ++j) scores[(size_t)j] = f.dt[j * 6 + 5];
      std::sort(scores.begin(), scores.end());
      double out4[4];
      int64_t prev_active = -1;
      for (int64_t t = 0; t < num_threshs; ++t) {
        const int64_t active =
            f.ndt - (std::lower_bound(scores.begin(), scores.end(),
                                      threshs[t]) -
                     scores.begin());
        if (active != prev_active) {
          stats_core(f, metric, min_overlap, threshs[t], true,
                     compute_aos != 0, out4, nullptr, nullptr, cand.data(),
                     cand_off.data());
          prev_active = active;
        }
        local[t * 4 + 0] += out4[0];
        local[t * 4 + 1] += out4[1];
        local[t * 4 + 2] += out4[2];
        if (out4[3] != -1.0) local[t * 4 + 3] += out4[3];
      }
    }
#pragma omp critical
    for (int64_t i = 0; i < num_threshs * 4; ++i) pr[i] += local[i];
  }
}

}  // extern "C"
