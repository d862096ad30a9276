"""KITTI AP evaluator tests on crafted scenes with known answers."""

import numpy as np
import pytest

from pillars_tpu.eval import kitti_ap


def make_anno(locs, dims, rots, names=None, scores=None, alphas=None,
              bbox_h=200.0):
    n = len(locs)
    names = names or ["Pedestrian"] * n
    bbox = np.zeros((n, 4))
    bbox[:, 2] = 100.0
    bbox[:, 3] = bbox_h  # tall enough for every difficulty
    anno = {
        "name": np.array(names),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, dtype=np.int64),
        "alpha": np.array(alphas if alphas is not None else np.zeros(n)),
        "bbox": bbox,
        "dimensions": np.array(dims, dtype=np.float64).reshape(n, 3),
        "location": np.array(locs, dtype=np.float64).reshape(n, 3),
        "rotation_y": np.array(rots, dtype=np.float64).reshape(n),
    }
    if scores is not None:
        anno["score"] = np.array(scores, dtype=np.float64)
    else:
        anno["score"] = np.ones(n)
    return anno


def scene(seed, n=3):
    rng = np.random.RandomState(seed)
    locs = np.stack([rng.uniform(-3, 3, n), rng.uniform(1.0, 1.5, n),
                     rng.uniform(2, 6, n)], axis=1)
    locs[:, 0] = np.linspace(-3, 3, n)  # keep boxes apart
    dims = np.tile([0.8, 1.7, 0.6], (n, 1))
    rots = rng.uniform(-np.pi, np.pi, n)
    return locs, dims, rots


class TestPerfectPredictions:
    def test_ap_100(self):
        gt_annos, dt_annos = [], []
        for s in range(16):
            locs, dims, rots = scene(s)
            gt_annos.append(make_anno(locs, dims, rots))
            dt_annos.append(make_anno(locs, dims, rots,
                                      scores=[0.9, 0.8, 0.7]))
        result, mAPbbox, mAPbev, mAP3d, mAPaos = \
            kitti_ap.get_official_eval_result(
                gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        # perfect predictions: every threshold, every difficulty = 100
        np.testing.assert_allclose(mAPbev[0], 100.0)
        np.testing.assert_allclose(mAP3d[0], 100.0)
        np.testing.assert_allclose(mAPaos[0], 100.0)
        assert "bev  AP:100.00" in result

    def test_aggregate_score(self):
        gt_annos, dt_annos = [], []
        for s in range(16):
            locs, dims, rots = scene(s)
            gt_annos.append(make_anno(locs, dims, rots))
            dt_annos.append(make_anno(locs, dims, rots, scores=[0.9, 0.8, 0.7]))
        _, _, bev, d3, aos = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        score = kitti_ap.aggregate_eval_score(d3, aos, bev)
        assert score == pytest.approx(100.0)


class TestNoPredictions:
    def test_ap_0(self):
        gt_annos, dt_annos = [], []
        for s in range(3):
            locs, dims, rots = scene(s)
            gt_annos.append(make_anno(locs, dims, rots))
            dt_annos.append({
                "name": np.array([]), "truncated": np.array([]),
                "occluded": np.array([]), "alpha": np.array([]),
                "bbox": np.zeros((0, 4)), "dimensions": np.zeros((0, 3)),
                "location": np.zeros((0, 3)), "rotation_y": np.array([]),
                "score": np.array([]),
            })
        _, _, mAPbev, mAP3d, _ = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        np.testing.assert_allclose(mAPbev[0], 0.0)
        np.testing.assert_allclose(mAP3d[0], 0.0)


class TestPartialMatches:
    def test_missed_gt_reduces_recall(self):
        """Detect 2 of 3 objects per scene -> recall capped at 2/3, so AP
        (41-pt, every 4th / 11) lands well below 100 but above 0."""
        gt_annos, dt_annos = [], []
        for s in range(16):
            locs, dims, rots = scene(s)
            gt_annos.append(make_anno(locs, dims, rots))
            dt_annos.append(make_anno(locs[:2], dims[:2], rots[:2],
                                      scores=[0.9, 0.8]))
        _, _, mAPbev, mAP3d, _ = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        assert 30.0 < mAPbev[0, 0, 0] < 75.0
        # 3d equals bev here (identical boxes)
        np.testing.assert_allclose(mAP3d[0, 0, 0], mAPbev[0, 0, 0])

    def test_false_positives_reduce_precision(self):
        gt_annos, dt_annos = [], []
        for s in range(16):
            locs, dims, rots = scene(s)
            gt_annos.append(make_anno(locs, dims, rots))
            # 3 correct + 3 hallucinated, interleaved scores
            fake_locs = locs + np.array([0.0, 0.0, 30.0])
            dt = make_anno(np.concatenate([locs, fake_locs]),
                           np.concatenate([dims, dims]),
                           np.concatenate([rots, rots]),
                           scores=[0.9, 0.8, 0.7, 0.85, 0.75, 0.65])
            dt_annos.append(dt)
        _, _, mAPbev, _, _ = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        assert mAPbev[0, 0, 0] < 100.0

    def test_aos_penalizes_flipped_orientation(self):
        gt_annos, dt_annos, dt_flipped = [], [], []
        for s in range(16):
            locs, dims, rots = scene(s)
            alphas = np.array([0.3, -0.5, 1.0])
            gt_annos.append(make_anno(locs, dims, rots, alphas=alphas))
            dt_annos.append(make_anno(locs, dims, rots, alphas=alphas,
                                      scores=[0.9, 0.8, 0.7]))
            dt_flipped.append(make_anno(locs, dims, rots,
                                        alphas=alphas + np.pi,
                                        scores=[0.9, 0.8, 0.7]))
        _, _, _, _, aos_good = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        _, _, _, _, aos_bad = kitti_ap.get_official_eval_result(
            gt_annos, dt_flipped, ["Pedestrian"], compute_bbox=False)
        assert aos_good[0, 0, 0] == pytest.approx(100.0)
        assert aos_bad[0, 0, 0] == pytest.approx(0.0, abs=1.0)

    def test_score_ordering_matters(self):
        """High-scored FPs hurt more than low-scored FPs."""
        def build(fp_score):
            gt_annos, dt_annos = [], []
            for s in range(16):
                locs, dims, rots = scene(s)
                gt_annos.append(make_anno(locs, dims, rots))
                fake = locs + np.array([0.0, 0.0, 30.0])
                dt_annos.append(make_anno(
                    np.concatenate([locs, fake[:1]]),
                    np.concatenate([dims, dims[:1]]),
                    np.concatenate([rots, rots[:1]]),
                    scores=[0.9, 0.8, 0.7, fp_score]))
            _, _, bev, _, _ = kitti_ap.get_official_eval_result(
                gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
            return bev[0, 0, 0]
        assert build(0.95) < build(0.1) + 1e-9


class TestDifficultyFiltering:
    def test_occluded_gt_ignored_at_easy(self):
        gt_annos, dt_annos = [], []
        for s in range(24):
            locs, dims, rots = scene(s)
            gt = make_anno(locs, dims, rots)
            gt["occluded"] = np.array([2, 0, 0])  # first box hard-occluded
            gt_annos.append(gt)
            # detect only the two unoccluded boxes
            dt_annos.append(make_anno(locs[1:], dims[1:], rots[1:],
                                      scores=[0.9, 0.8]))
        _, _, bev, _, _ = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        # difficulty 0 (easy): occluded boxes ignored -> perfect score
        assert bev[0, 0, 0] == pytest.approx(100.0)
        # difficulty 2 (hard): occluded boxes count -> recall capped at 2/3
        assert bev[0, 2, 0] < 75.0


def _d3_box_overlap_loop(boxes, qboxes, criterion=-1):
    """TEST ORACLE ONLY: loop-for-loop twin of the reference numba kernel
    (second/utils/eval.py:132-156) pinning the vectorized
    kitti_ap.d3_box_overlap."""
    rinc = kitti_ap._rotated_overlap(boxes[:, [0, 2, 3, 5, 6]],
                                     qboxes[:, [0, 2, 3, 5, 6]], 2)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = rinc.astype(np.float64)
    for i in range(n):
        for j in range(k):
            if rinc[i, j] > 0:
                iw = (min(boxes[i, 1], qboxes[j, 1])
                      - max(boxes[i, 1] - boxes[i, 4],
                            qboxes[j, 1] - qboxes[j, 4]))
                if iw > 0:
                    area1 = boxes[i, 3] * boxes[i, 4] * boxes[i, 5]
                    area2 = qboxes[j, 3] * qboxes[j, 4] * qboxes[j, 5]
                    inc = iw * rinc[i, j]
                    if criterion == -1:
                        ua = area1 + area2 - inc
                    elif criterion == 0:
                        ua = area1
                    elif criterion == 1:
                        ua = area2
                    else:
                        ua = 1.0
                    out[i, j] = inc / ua
                else:
                    out[i, j] = 0.0
    return out


class TestD3OverlapVectorized:
    """Vectorized d3_box_overlap must match the loop oracle exactly."""

    def _rand_boxes(self, rng, n):
        b = np.zeros((n, 7))
        b[:, 0] = rng.uniform(-10, 10, n)      # x
        b[:, 1] = rng.uniform(-2, 2, n)        # y (camera, down, box bottom)
        b[:, 2] = rng.uniform(0, 40, n)        # z
        b[:, 3:6] = rng.uniform(0.3, 3.0, (n, 3))  # l, h, w
        b[:, 6] = rng.uniform(-np.pi, np.pi, n)
        return b

    @pytest.mark.parametrize("criterion", [-1, 0, 1, 2])
    def test_matches_loop_oracle(self, rng, criterion):
        boxes = self._rand_boxes(rng, 40)
        qboxes = self._rand_boxes(rng, 35)
        # force clusters so many pairs genuinely overlap
        qboxes[:20, [0, 1, 2]] = boxes[:20, [0, 1, 2]] + rng.normal(
            0, 0.3, (20, 3))
        got = kitti_ap.d3_box_overlap(boxes, qboxes, criterion)
        want = _d3_box_overlap_loop(boxes, qboxes, criterion)
        assert (want > 0.1).sum() > 10  # the test actually exercises overlap
        np.testing.assert_array_equal(got, want)

    def test_empty(self):
        boxes = self._rand_boxes(np.random.RandomState(0), 4)
        empty = np.zeros((0, 7))
        assert kitti_ap.d3_box_overlap(boxes, empty).shape == (4, 0)
        assert kitti_ap.d3_box_overlap(empty, boxes).shape == (0, 4)


class TestNativeMatcherParity:
    """Native C++ batched matcher (csrc/eval_matcher.cc) must reproduce the
    pure-Python compute_statistics path bit-for-bit through eval_class."""

    def test_full_eval_matches_python_path(self, rng, monkeypatch):
        from pillars_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        gt_annos, dt_annos = [], []
        for s in range(32):
            locs, dims, rots = scene(s)
            gt = make_anno(locs, dims, rots)
            if s % 4 == 0:  # some occlusion + dontcare-like ignored rows
                gt["occluded"] = np.array([2, 0, 0])
            gt_annos.append(gt)
            keep = rng.rand(len(locs)) > 0.2
            n = int(keep.sum())
            if n == 0:
                keep[:] = True
                n = len(locs)
            dt_annos.append(make_anno(
                locs[keep] + rng.normal(0, 0.05, (n, 3)),
                dims[keep], rots[keep] + rng.normal(0, 0.1, n),
                scores=rng.uniform(0.1, 1.0, n)))
        _, _, bev_n, d3_n, aos_n = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        monkeypatch.setattr(native, "available", lambda: False)
        _, _, bev_p, d3_p, aos_p = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, ["Pedestrian"], compute_bbox=False)
        np.testing.assert_array_equal(bev_n, bev_p)
        np.testing.assert_array_equal(d3_n, d3_p)
        np.testing.assert_array_equal(aos_n, aos_p)


def _matcher_oracle(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                    dc_bboxes, metric, min_overlap, thresh=0.0,
                    compute_fp=False, compute_aos=False):
    """TEST ORACLE ONLY: line-faithful transcription of the reference's
    greedy matcher (second/utils/eval.py:166-286, compute_statistics_jit),
    kept here to pin kitti_ap.compute_statistics — which is structured
    differently (vectorized per-GT candidate selection) — to the de-facto
    KITTI-AP matching semantics."""
    det_size = dt_datas.shape[0]
    gt_size = gt_datas.shape[0]
    dt_scores = dt_datas[:, -1]
    dt_alphas = dt_datas[:, 4]
    gt_alphas = gt_datas[:, 4]
    dt_bboxes = dt_datas[:, :4]
    NO_DETECTION = kitti_ap.NO_DETECTION

    assigned_detection = [False] * det_size
    ignored_threshold = [False] * det_size
    if compute_fp:
        for i in range(det_size):
            if dt_scores[i] < thresh:
                ignored_threshold[i] = True
    tp, fp, fn, similarity = 0, 0, 0, 0.0
    thresholds = np.zeros((gt_size,))
    thresh_idx = 0
    delta = np.zeros((gt_size,))
    delta_idx = 0
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0.0
        assigned_ignored_det = False
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned_detection[j] or \
                    ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            dt_score = dt_scores[j]
            if (not compute_fp and overlap > min_overlap
                    and dt_score > valid_detection):
                det_idx = j
                valid_detection = dt_score
            elif (compute_fp and overlap > min_overlap
                  and (overlap > max_overlap or assigned_ignored_det)
                  and ignored_det[j] == 0):
                max_overlap = overlap
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = False
            elif (compute_fp and overlap > min_overlap
                  and valid_detection == NO_DETECTION
                  and ignored_det[j] == 1):
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == NO_DETECTION and ignored_gt[i] == 0:
            fn += 1
        elif (valid_detection != NO_DETECTION
              and (ignored_gt[i] == 1 or ignored_det[det_idx] == 1)):
            assigned_detection[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            thresholds[thresh_idx] = dt_scores[det_idx]
            thresh_idx += 1
            if compute_aos:
                delta[delta_idx] = gt_alphas[i] - dt_alphas[det_idx]
                delta_idx += 1
            assigned_detection[det_idx] = True
    if compute_fp:
        for i in range(det_size):
            if not (assigned_detection[i] or ignored_det[i] == -1
                    or ignored_det[i] == 1 or ignored_threshold[i]):
                fp += 1
        nstuff = 0
        if metric == 0 and len(dc_bboxes) > 0:
            dc = (np.stack(dc_bboxes, 0) if isinstance(dc_bboxes, list)
                  else dc_bboxes)
            overlaps_dt_dc = kitti_ap.image_box_overlap(dt_bboxes, dc, 0)
            for i in range(dc.shape[0]):
                for j in range(det_size):
                    if (assigned_detection[j] or ignored_det[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if overlaps_dt_dc[j, i] > min_overlap:
                        assigned_detection[j] = True
                        nstuff += 1
        fp -= nstuff
        if compute_aos:
            tmp = np.zeros((fp + delta_idx,))
            for i in range(delta_idx):
                tmp[i + fp] = (1.0 + np.cos(delta[i])) / 2.0
            similarity = np.sum(tmp) if (tp > 0 or fp > 0) else -1.0
    return tp, fp, fn, similarity, thresholds[:thresh_idx]


class TestMatcherDifferential:
    """Randomized differential sweep: the restructured matcher must agree
    with the line-faithful reference-loop oracle on every output over
    1000+ crafted frames (ties, ignored GT/dets, DontCare regions,
    thresholds, both modes, AOS)."""

    def _frame(self, rng):
        n_gt = rng.randint(0, 9)
        n_dt = rng.randint(0, 12)
        gt = np.zeros((n_gt, 5))
        gt[:, :4] = rng.uniform(0, 100, (n_gt, 4))
        gt[:, 4] = rng.uniform(-np.pi, np.pi, n_gt)
        dt = np.zeros((n_dt, 6))
        dt[:, :4] = rng.uniform(0, 100, (n_dt, 4))
        dt[:, 4] = rng.uniform(-np.pi, np.pi, n_dt)
        # quantized scores: force ties in both score and overlap
        dt[:, 5] = rng.randint(0, 6, n_dt) / 5.0
        overlaps = rng.randint(0, 8, (n_dt, n_gt)) / 8.0
        ignored_gt = rng.choice([-1, 0, 0, 0, 1], n_gt)
        ignored_det = rng.choice([-1, 0, 0, 0, 1], n_dt)
        n_dc = rng.randint(0, 3)
        dc = [rng.uniform(0, 100, 4) for _ in range(n_dc)]
        for b in dc:
            b[2:] = b[:2] + np.abs(b[2:] - b[:2]) + 1.0
        return overlaps, gt, dt, ignored_gt, ignored_det, dc

    def test_matches_reference_loop(self):
        rng = np.random.RandomState(1234)
        checked = 0
        for trial in range(1200):
            overlaps, gt, dt, igt, idet, dc = self._frame(rng)
            metric = rng.randint(0, 3)
            min_overlap = rng.choice([0.0, 0.25, 0.5, 0.625, 0.75])
            compute_fp = bool(rng.randint(0, 2))
            thresh = rng.choice([0.0, 0.2, 0.4, 0.8])
            compute_aos = compute_fp and bool(rng.randint(0, 2))
            got = kitti_ap.compute_statistics(
                overlaps, gt, dt, igt, idet, dc, metric, min_overlap,
                thresh=thresh, compute_fp=compute_fp,
                compute_aos=compute_aos)
            want = _matcher_oracle(
                overlaps, gt, dt, igt, idet, dc, metric, min_overlap,
                thresh=thresh, compute_fp=compute_fp,
                compute_aos=compute_aos)
            assert got[:3] == want[:3], (trial, got[:3], want[:3])
            assert got[3] == pytest.approx(want[3]), trial
            np.testing.assert_array_equal(got[4], want[4], err_msg=str(trial))
            checked += 1
        assert checked == 1200


def _get_thresholds_loop(scores, num_gt, num_sample_pts=41):
    """TEST ORACLE ONLY: line-faithful twin of the reference's threshold
    walk (second/utils/eval.py:19-38) pinning the closed-form
    kitti_ap.get_thresholds."""
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return thresholds


class TestGetThresholdsClosedForm:
    """Closed-form get_thresholds must match the line-faithful loop twin."""

    @pytest.mark.parametrize("n,num_gt", [
        (0, 5), (1, 1), (1, 7), (3, 3), (40, 41), (41, 41), (42, 41),
        (100, 80), (1000, 900), (5000, 6000), (37, 2000),
    ])
    def test_matches_loop_oracle(self, rng, n, num_gt):
        scores = rng.uniform(0, 1, n)
        got = kitti_ap.get_thresholds(scores.copy(), num_gt)
        want = _get_thresholds_loop(scores.copy(), num_gt)
        assert got == want

    def test_ties_match(self, rng):
        scores = np.repeat(rng.uniform(0, 1, 20), 5)  # heavy score ties
        got = kitti_ap.get_thresholds(scores.copy(), 90)
        want = _get_thresholds_loop(scores.copy(), 90)
        assert got == want
