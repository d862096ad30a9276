"""Unit tests for the pre-liftoff detection-quality proxy metrics
(eval/proxies.py; VERDICT r4 #6 — the per-epoch convergence signal for
long runs whose AP matrix is still all-zero)."""

import numpy as np

from pillars_tpu.eval.proxies import detection_quality_proxies


def _anno(locs, scores=None):
    locs = np.asarray(locs, np.float64).reshape(-1, 3)
    a = {"location": locs,
         "name": np.array(["Car"] * len(locs))}
    if scores is not None:
        a["score"] = np.asarray(scores, np.float64)
    return a


class TestDetectionQualityProxies:
    def test_perfect_detections(self):
        gt = [_anno([[0, 1, 5], [10, 1, 20]])]
        dt = [_anno([[0, 1, 5], [10, 1, 20]], scores=[0.9, 0.8])]
        p = detection_quality_proxies(dt, gt)
        assert p["proxy_topk_bev_dist"] == 0.0
        assert p["proxy_matched_frac"] == 1.0
        assert p["proxy_bg_score_p50"] == 0.0  # no background dets
        assert p["proxy_num_dets"] == 2.0

    def test_bev_distance_is_xz_plane(self):
        # camera coords: y is height — a pure-y offset must not count
        gt = [_anno([[0, 0, 10]])]
        dt = [_anno([[3, 99, 14]], scores=[0.5])]  # BEV offset (3,4) -> 5 m
        p = detection_quality_proxies(dt, gt)
        assert abs(p["proxy_topk_bev_dist"] - 5.0) < 1e-9
        assert p["proxy_matched_frac"] == 0.0

    def test_top_k_selects_highest_scores(self):
        gt = [_anno([[0, 0, 0]])]
        # best-scoring det is 1 m away, the low-score one 100 m away
        dt = [_anno([[1, 0, 0], [100, 0, 0]], scores=[0.9, 0.1])]
        p = detection_quality_proxies(dt, gt, top_k=1)
        assert abs(p["proxy_topk_bev_dist"] - 1.0) < 1e-9
        assert p["proxy_matched_frac"] == 1.0

    def test_background_score_median(self):
        gt = [_anno([[0, 0, 0]])]
        dt = [_anno([[0, 0, 0], [50, 0, 0], [60, 0, 0], [70, 0, 0]],
                    scores=[0.9, 0.3, 0.2, 0.1])]
        p = detection_quality_proxies(dt, gt)
        assert abs(p["proxy_bg_score_p50"] - 0.2) < 1e-9

    def test_empty_frames_and_sentinels(self):
        p = detection_quality_proxies([_anno([])], [_anno([])])
        assert p["proxy_topk_bev_dist"] == -1.0
        assert p["proxy_matched_frac"] == 0.0
        assert p["proxy_num_dets"] == 0.0

    def test_dets_without_gt_count_as_background(self):
        gt = [_anno([])]
        dt = [_anno([[1, 0, 0]], scores=[0.7])]
        p = detection_quality_proxies(dt, gt)
        assert p["proxy_bg_score_p50"] == 0.7
        assert p["proxy_topk_bev_dist"] == -1.0  # no frame had both

    def test_dontcare_gt_rows_ignored(self):
        # reference kitti_common DontCare convention: location -1000s
        gt = [_anno([[-1000, -1000, -1000], [0, 0, 5]])]
        dt = [_anno([[0, 0, 5]], scores=[0.9])]
        p = detection_quality_proxies(dt, gt)
        assert p["proxy_topk_bev_dist"] == 0.0
        assert p["proxy_matched_frac"] == 1.0

    def test_logged_keys_reach_eval_row(self, tmp_path):
        """log_eval(extra=...) lands proxy_* columns in metrics.csv."""
        import csv

        from pillars_tpu.train.metrics_log import MetricLogger

        log = MetricLogger(str(tmp_path))
        ap = np.zeros((1, 1, 6))
        log.log_eval(5, ap, ap, ap, score=0.0,
                     extra={"proxy_topk_bev_dist": 3.1,
                            "proxy_bg_score_p50": 0.13})
        rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
        assert float(rows[-1]["proxy_topk_bev_dist"]) == 3.1
        assert float(rows[-1]["proxy_bg_score_p50"]) == 0.13
