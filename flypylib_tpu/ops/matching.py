"""Precision-recall point matching and evaluation.

Parity: flypylib fplobjdetect ``obj_pr``-style evaluation (SURVEY.md
section 3.3): greedy confidence-ordered one-to-one matching of predicted
points to ground-truth points within a Euclidean distance threshold,
swept over confidence to produce a PR curve; plus voxel-wise PR.

Matching runs on host: detection lists are tiny (thousands) compared to the
volumes, so this is never a bottleneck — the device keeps the heavy
map-level work (SURVEY.md section 7.2 step 3).

Pinned matching rule: iterate predictions in canonical order (conf desc,
z/y/x asc); each prediction matches the nearest not-yet-matched ground
truth within ``dist_thresh`` (ties -> lowest ground-truth index); matched
predictions are true positives.  The PR curve is the cumulative
precision/recall over this single matching as the confidence cutoff sweeps
down the sorted predictions (matching once, then cumsum).
"""

from __future__ import annotations

import numpy as np

from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.ops.host_reference import sort_detections


def _match_dense(pred_locs, gt_locs, thresh2, tp, match_idx):
    """O(n_pred * n_gt) reference matcher (small lists)."""
    d2 = np.sum(
        (pred_locs[:, None, :] - gt_locs[None, :, :]) ** 2, axis=2
    )  # (n_pred, n_gt)
    taken = np.zeros(len(gt_locs), dtype=bool)
    for i in range(len(pred_locs)):
        row = np.where(taken, np.inf, d2[i])
        j = int(np.argmin(row))  # argmin returns lowest index on ties
        if row[j] <= thresh2:
            tp[i] = True
            match_idx[i] = j
            taken[j] = True


def _match_kdtree(pred_locs, gt_locs, thresh, thresh2, tp, match_idx):
    """cKDTree matcher for pod-scale lists (10^5-10^6 detections): each
    prediction only examines ground truths within the distance threshold,
    so cost is O((n_pred + n_gt) log n_gt + matches) instead of the dense
    O(n_pred * n_gt) matrix.  Identical results to :func:`_match_dense`
    including the tie rule (pinned by tests/test_matching.py): candidates
    are re-scored with the same ``sum((p - g)**2)`` arithmetic and taken
    in (d2, gt_index) order."""
    from scipy.spatial import cKDTree

    tree = cKDTree(gt_locs)
    # tiny inflation so boundary points survive the tree's own metric
    # rounding; the exact d2 <= thresh2 filter below decides membership
    neighbors = tree.query_ball_point(
        pred_locs, r=float(thresh) * (1 + 1e-9) + 1e-12, workers=-1
    )
    taken = np.zeros(len(gt_locs), dtype=bool)
    for i, nbrs in enumerate(neighbors):
        if not nbrs:
            continue
        nbrs = np.asarray(nbrs, dtype=np.int64)
        d2 = np.sum((pred_locs[i] - gt_locs[nbrs]) ** 2, axis=1)
        order = np.lexsort((nbrs, d2))  # d2 asc, gt index asc on ties
        for k in order:
            j = int(nbrs[k])
            if d2[k] > thresh2:
                break
            if not taken[j]:
                tp[i] = True
                match_idx[i] = j
                taken[j] = True
                break


def match_detections(
    pred: Tbars, gt: Tbars, dist_thresh: float = 10.0
) -> tuple[np.ndarray, np.ndarray, Tbars]:
    """Greedy one-to-one matching.

    Returns ``(tp, match_idx, pred_sorted)`` where ``tp[i]`` says whether the
    i-th prediction (canonical order) matched, ``match_idx[i]`` is the
    matched ground-truth index (-1 if none).  Small lists use the dense
    matrix; large ones switch to a cKDTree with bit-identical results.
    """
    pred = sort_detections(pred.locs, pred.conf)
    n_pred, n_gt = len(pred), len(gt)
    tp = np.zeros(n_pred, dtype=bool)
    match_idx = np.full(n_pred, -1, dtype=np.int64)
    if n_pred == 0 or n_gt == 0:
        return tp, match_idx, pred

    thresh2 = float(dist_thresh) ** 2
    if n_pred * n_gt <= 4_000_000:
        _match_dense(pred.locs, gt.locs, thresh2, tp, match_idx)
    else:
        _match_kdtree(
            pred.locs, gt.locs, float(dist_thresh), thresh2, tp, match_idx
        )
    return tp, match_idx, pred


def obj_pr_curve(
    pred: Tbars, gt: Tbars, dist_thresh: float = 10.0
) -> dict[str, np.ndarray]:
    """PR curve over the confidence sweep.

    Returns dict with ``conf``, ``precision``, ``recall``, ``tp``, ``fp``
    arrays (one entry per prediction, confidence descending) plus scalar
    ``num_gt``.
    """
    tp, _, pred_sorted = match_detections(pred, gt, dist_thresh)
    cum_tp = np.cumsum(tp.astype(np.float64))
    n = np.arange(1, len(tp) + 1, dtype=np.float64)
    n_gt = max(len(gt), 1)
    return {
        "conf": pred_sorted.conf.copy(),
        "precision": cum_tp / n,
        "recall": cum_tp / n_gt,
        "tp": cum_tp,
        "fp": n - cum_tp,
        "num_gt": np.float64(len(gt)),
    }


def obj_pr(
    pred: Tbars,
    gt: Tbars,
    dist_thresh: float = 10.0,
    conf_threshold: float | None = None,
) -> tuple[float, float]:
    """(precision, recall) at one operating point (all preds, or conf>=t)."""
    if conf_threshold is not None:
        keep = pred.conf >= conf_threshold
        pred = Tbars(locs=pred.locs[keep], conf=pred.conf[keep])
    tp, _, _ = match_detections(pred, gt, dist_thresh)
    n_tp = float(tp.sum())
    precision = n_tp / max(len(tp), 1)
    recall = n_tp / max(len(gt), 1)
    return precision, recall


def voxel_pr(
    prob: np.ndarray,
    labels: np.ndarray,
    mask: np.ndarray | None = None,
    thresholds: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Voxel-wise PR over a threshold sweep, restricted to the loss mask."""
    prob = np.asarray(prob, dtype=np.float32).reshape(-1)
    labels = np.asarray(labels).reshape(-1) > 0.5
    if mask is not None:
        keep = np.asarray(mask).reshape(-1) > 0.5
        prob, labels = prob[keep], labels[keep]
    if thresholds is None:
        thresholds = np.linspace(0.05, 0.95, 19)
    thresholds = np.asarray(thresholds, dtype=np.float32)
    n_pos = max(int(labels.sum()), 1)
    precision = np.zeros_like(thresholds, dtype=np.float64)
    recall = np.zeros_like(thresholds, dtype=np.float64)
    for k, t in enumerate(thresholds):
        p = prob >= t
        tp = float(np.sum(p & labels))
        precision[k] = tp / max(float(p.sum()), 1.0)
        recall[k] = tp / n_pos
    return {"thresholds": thresholds, "precision": precision, "recall": recall}


def evaluate(
    prob_or_pred,
    gt: Tbars,
    dist_thresh: float = 10.0,
    window=3,
    threshold: float = 0.5,
) -> dict[str, np.ndarray]:
    """Public `evaluate` verb: probability volume (or detection list) vs
    ground truth -> PR curve dict (parity: flypylib train/infer/nms/evaluate
    API, SURVEY.md section 1)."""
    if isinstance(prob_or_pred, Tbars):
        pred = prob_or_pred
    else:
        from flypylib_tpu.ops.nms import nms

        pred = nms(prob_or_pred, window=window, threshold=threshold)
    return obj_pr_curve(pred, gt, dist_thresh)
