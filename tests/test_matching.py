import numpy as np

from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.ops.matching import (
    match_detections,
    obj_pr,
    obj_pr_curve,
    voxel_pr,
)


def test_perfect_match():
    gt = Tbars(locs=[[10, 10, 10], [30, 30, 30]])
    pred = Tbars(locs=[[10, 10, 11], [30, 31, 30]], conf=[0.9, 0.8])
    p, r = obj_pr(pred, gt, dist_thresh=5.0)
    assert p == 1.0 and r == 1.0


def test_greedy_order_and_one_to_one():
    gt = Tbars(locs=[[10, 10, 10]])
    # two predictions near the same gt: only the higher-conf one matches
    pred = Tbars(locs=[[10, 10, 12], [10, 10, 9]], conf=[0.5, 0.9])
    tp, midx, pred_sorted = match_detections(pred, gt, dist_thresh=5.0)
    # canonical order: conf desc -> [0.9 @ (10,10,9)], [0.5 @ (10,10,12)]
    assert pred_sorted.conf[0] == 0.9
    assert tp.tolist() == [True, False]
    assert midx.tolist() == [0, -1]


def test_distance_threshold_excludes():
    gt = Tbars(locs=[[0, 0, 0]])
    pred = Tbars(locs=[[0, 0, 6]], conf=[1.0])
    p, r = obj_pr(pred, gt, dist_thresh=5.0)
    assert p == 0.0 and r == 0.0
    p, r = obj_pr(pred, gt, dist_thresh=6.0)
    assert p == 1.0 and r == 1.0


def test_nearest_tie_breaks_to_lowest_gt_index():
    gt = Tbars(locs=[[0, 0, 2], [0, 0, -2]])
    pred = Tbars(locs=[[0, 0, 0]], conf=[1.0])
    tp, midx, _ = match_detections(pred, gt, dist_thresh=5.0)
    assert tp[0] and midx[0] == 0


def test_pr_curve_monotone_recall():
    rng = np.random.default_rng(0)
    gt = Tbars(locs=rng.uniform(0, 100, (20, 3)))
    noise = rng.uniform(0, 100, (10, 3))
    pred_locs = np.concatenate([gt.locs + rng.normal(0, 1, (20, 3)), noise])
    pred = Tbars(locs=pred_locs, conf=rng.uniform(0.5, 1.0, 30))
    curve = obj_pr_curve(pred, gt, dist_thresh=5.0)
    assert np.all(np.diff(curve["recall"]) >= 0)
    assert curve["num_gt"] == 20
    assert len(curve["precision"]) == 30
    # final recall counts all matched gt
    assert curve["tp"][-1] <= 20


def test_empty_predictions():
    gt = Tbars(locs=[[1, 1, 1]])
    pred = Tbars(locs=np.zeros((0, 3)), conf=np.zeros(0))
    p, r = obj_pr(pred, gt)
    assert p == 0.0 and r == 0.0
    curve = obj_pr_curve(pred, gt)
    assert len(curve["precision"]) == 0


def test_voxel_pr():
    labels = np.zeros((10, 10, 10), np.float32)
    labels[2:4, 2:4, 2:4] = 1
    prob = labels * 0.9 + 0.05
    res = voxel_pr(prob, labels, thresholds=[0.5])
    assert res["precision"][0] == 1.0 and res["recall"][0] == 1.0
    # masked-out voxels don't count
    mask = np.ones_like(labels)
    mask[2:4, 2:4, 2:4] = 0
    res = voxel_pr(prob, labels, mask=mask, thresholds=[0.5])
    assert res["recall"][0] == 0.0
