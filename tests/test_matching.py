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


def test_kdtree_matches_dense_random():
    """The cKDTree matcher (pod-scale path) == dense matrix matcher,
    including ties (quantized coords force exact-equal distances)."""
    from flypylib_tpu.ops.matching import _match_dense, _match_kdtree

    rng = np.random.default_rng(11)
    n_pred, n_gt = 800, 600
    # integer coords in a small box -> many exact distance ties
    pred_locs = rng.integers(0, 25, (n_pred, 3)).astype(np.float64)
    gt_locs = rng.integers(0, 25, (n_gt, 3)).astype(np.float64)
    thresh = 4.0

    tp_a = np.zeros(n_pred, bool)
    mi_a = np.full(n_pred, -1, np.int64)
    _match_dense(pred_locs, gt_locs, thresh**2, tp_a, mi_a)

    tp_b = np.zeros(n_pred, bool)
    mi_b = np.full(n_pred, -1, np.int64)
    _match_kdtree(pred_locs, gt_locs, thresh, thresh**2, tp_b, mi_b)

    np.testing.assert_array_equal(tp_a, tp_b)
    np.testing.assert_array_equal(mi_a, mi_b)


def test_kdtree_boundary_distance():
    """Points exactly at the distance threshold match on both paths."""
    from flypylib_tpu.ops.matching import _match_dense, _match_kdtree

    pred_locs = np.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    gt_locs = np.asarray([[3.0, 4.0, 0.0], [10.0, 5.0, 0.0]])  # d = 5, 5
    for fn, args in [
        (_match_dense, (pred_locs, gt_locs, 25.0)),
        (_match_kdtree, (pred_locs, gt_locs, 5.0, 25.0)),
    ]:
        tp = np.zeros(2, bool)
        mi = np.full(2, -1, np.int64)
        fn(*args, tp, mi)
        assert tp.tolist() == [True, True]
        assert mi.tolist() == [0, 1]


def test_match_detections_large_uses_kdtree():
    """The public API transparently switches paths; results identical."""
    from flypylib_tpu.ops.matching import _match_dense

    rng = np.random.default_rng(5)
    n = 2500  # n*n > 4M -> kdtree path
    locs = rng.random((n, 3)) * 100
    pred = Tbars(locs=locs + rng.normal(0, 1, (n, 3)), conf=rng.random(n))
    gt = Tbars(locs=locs)
    tp, mi, pred_sorted = match_detections(pred, gt, dist_thresh=3.0)

    tp_ref = np.zeros(n, bool)
    mi_ref = np.full(n, -1, np.int64)
    _match_dense(pred_sorted.locs, gt.locs, 9.0, tp_ref, mi_ref)
    np.testing.assert_array_equal(tp, tp_ref)
    np.testing.assert_array_equal(mi, mi_ref)


def _vpr_equal(a, b):
    np.testing.assert_array_equal(a["thresholds"], b["thresholds"])
    np.testing.assert_array_equal(a["precision"], b["precision"])
    np.testing.assert_array_equal(a["recall"], b["recall"])


def test_voxel_pr_device_matches_host():
    """Device counting is integer-exact -> bitwise-equal PR dict."""
    from flypylib_tpu.ops.matching import voxel_pr_device

    rng = np.random.default_rng(7)
    shape = (20, 18, 17)
    prob = rng.random(shape).astype(np.float32)
    labels = (rng.random(shape) > 0.9).astype(np.float32)
    mask = (rng.random(shape) > 0.2).astype(np.float32)
    # inject exact-threshold ties: >= semantics must match
    prob.flat[::97] = np.float32(0.5)
    for m in (None, mask):
        _vpr_equal(voxel_pr(prob, labels, m),
                   voxel_pr_device(prob, labels, m))
    thr = np.asarray([0.25, 0.5, 0.75], np.float32)
    _vpr_equal(voxel_pr(prob, labels, mask, thresholds=thr),
               voxel_pr_device(prob, labels, mask, thresholds=thr))


def test_voxel_pr_streaming_matches_monolithic():
    """Slab-streamed voxel PR == voxel_pr over the monolithic forward
    (true-data halos, reflect only at faces, tail-slab overshoot)."""
    import jax

    from flypylib_tpu.infer.tiled import infer_volume
    from flypylib_tpu.models.zoo import baseline_model
    from flypylib_tpu.ops.matching import voxel_pr_streaming

    rng = np.random.default_rng(11)
    spec = baseline_model(features=(2, 3), dilations=(1, 2),
                          head_features=4)
    variables = spec.init(jax.random.PRNGKey(0))
    shape = (29, 22, 20)  # Z not a multiple of the slab -> shifted tail
    vol = rng.random(shape).astype(np.float32)
    labels = (rng.random(shape) > 0.9).astype(np.float32)
    mask = (rng.random(shape) > 0.1).astype(np.float32)
    ref = voxel_pr(infer_volume(spec, variables, vol), labels, mask)
    got = voxel_pr_streaming(spec, variables, vol, labels, mask, slab=8)
    _vpr_equal(ref, got)
    # unmasked + reader inputs
    from flypylib_tpu.infer.large import array_reader

    ref2 = voxel_pr(infer_volume(spec, variables, vol), labels)
    got2 = voxel_pr_streaming(
        spec, variables, array_reader(vol), array_reader(labels), slab=12
    )
    _vpr_equal(ref2, got2)


def test_voxel_pr_streaming_pooled_phase():
    """Pooled (U-Net) streaming keeps the monolithic pooling phase: slab
    windows are size_multiple-aligned windows of the padded volume and
    the engine adds no second pad (pad_mode='none')."""
    import jax

    from flypylib_tpu.infer.tiled import infer_volume
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.matching import voxel_pr_streaming

    rng = np.random.default_rng(13)
    spec = unet(base_features=2, levels=1, convs_per_stage=1)
    variables = spec.init(jax.random.PRNGKey(1))
    shape = (37, 30, 26)  # odd Z: tail slab overshoots past Z
    vol = rng.random(shape).astype(np.float32)
    labels = (rng.random(shape) > 0.92).astype(np.float32)
    ref = voxel_pr(infer_volume(spec, variables, vol), labels)
    got = voxel_pr_streaming(spec, variables, vol, labels, slab=16)
    _vpr_equal(ref, got)
