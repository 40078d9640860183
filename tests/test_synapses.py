import json

import numpy as np

from flypylib_tpu.io.synapses import (
    Tbars,
    load_from_json,
    make_training_volumes,
    save_to_json,
    tbars_to_volume,
)


def test_load_raveler_style(tmp_path):
    obj = {
        "data": [
            {"T-bar": {"location": [10, 20, 30], "confidence": 0.9},
             "partners": []},
            {"T-bar": {"location": [1, 2, 3]}, "partners": []},
        ]
    }
    p = tmp_path / "tbars.json"
    p.write_text(json.dumps(obj))
    tb = load_from_json(str(p))
    assert len(tb) == 2
    # JSON is [x,y,z]; internal is (z,y,x)
    np.testing.assert_array_equal(tb.locs[0], [30, 20, 10])
    assert tb.conf[0] == 0.9 and tb.conf[1] == 1.0


def test_load_dvid_style():
    obj = [
        {"Kind": "PreSyn", "Pos": [5, 6, 7], "Prop": {"conf": "0.8"}},
        {"Kind": "PostSyn", "Pos": [1, 1, 1]},
    ]
    tb = load_from_json(obj)
    assert len(tb) == 1
    np.testing.assert_array_equal(tb.locs[0], [7, 6, 5])
    assert tb.conf[0] == 0.8


def test_load_dvid_rels_partner_union():
    """Partners recovered from PreSynTo Rels, PostSynTo back-refs, or
    both — deduped by position (SURVEY.md section 2.2 row 4)."""
    obj = [
        # PreSyn listing one PSD itself; a second PSD points back only
        {"Kind": "PreSyn", "Pos": [5, 6, 7], "Prop": {"conf": "0.8"},
         "Rels": [{"Rel": "PreSynTo", "To": [10, 11, 12]}]},
        {"Kind": "PostSyn", "Pos": [10, 11, 12],
         "Rels": [{"Rel": "PostSynTo", "To": [5, 6, 7]}]},  # dup of above
        {"Kind": "PostSyn", "Pos": [20, 21, 22],
         "Rels": [{"Rel": "PostSynTo", "To": [5, 6, 7]}]},
        # PreSyn with no partners at all
        {"Kind": "PreSyn", "Pos": [1, 2, 3]},
    ]
    tb = load_from_json(obj)
    assert len(tb) == 2
    np.testing.assert_array_equal(
        tb.partners[0], [[12, 11, 10], [22, 21, 20]]  # zyx, deduped
    )
    assert tb.partners[1].shape == (0, 3)


def test_dvid_partner_roundtrip(tmp_path):
    """save(style=dvid) emits PreSyn+PostSyn with Rels on both sides and
    load recovers identical locs + partners."""
    tb = Tbars(
        locs=[[3, 2, 1], [9, 8, 7]],
        conf=[0.5, 0.25],
        partners=[[[4, 4, 4], [5, 5, 5]], np.zeros((0, 3))],
    )
    obj = save_to_json(tb, style="dvid")
    kinds = sorted(el["Kind"] for el in obj)
    assert kinds == ["PostSyn", "PostSyn", "PreSyn", "PreSyn"]
    pre = [el for el in obj if el["Kind"] == "PreSyn"]
    assert [r["Rel"] for r in pre[0]["Rels"]] == ["PreSynTo", "PreSynTo"]
    assert "Rels" not in pre[1]
    post = [el for el in obj if el["Kind"] == "PostSyn"]
    assert all(
        r["Rel"] == "PostSynTo" and r["To"] == pre[0]["Pos"]
        for el in post for r in el["Rels"]
    )
    back = load_from_json(obj)
    np.testing.assert_array_equal(back.locs, tb.locs)
    np.testing.assert_allclose(back.conf, tb.conf)
    np.testing.assert_array_equal(back.partners[0], tb.partners[0])
    assert back.partners[1].shape == (0, 3)


def test_save_roundtrip(tmp_path):
    tb = Tbars(locs=[[3, 2, 1], [9, 8, 7]], conf=[0.5, 0.25])
    for style in ("raveler", "dvid"):
        p = tmp_path / f"out_{style}.json"
        save_to_json(tb, str(p), style=style)
        back = load_from_json(str(p))
        np.testing.assert_array_equal(back.locs, tb.locs)
        np.testing.assert_allclose(back.conf, tb.conf)


def test_rasterize_ball():
    tb = Tbars(locs=[[10, 10, 10]])
    vol = tbars_to_volume(tb, 21, radius=3)
    assert vol[10, 10, 10] == 1
    assert vol[10, 10, 13] == 1  # distance exactly 3 (inclusive)
    assert vol[10, 10, 14] == 0
    assert vol[12, 12, 10] == 1  # sqrt(8) < 3 -> inside
    # volume matches analytic ball voxel count
    g = np.arange(-3, 4)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    expected = int(np.sum(zz**2 + yy**2 + xx**2 <= 9))
    assert vol.sum() == expected


def test_rasterize_clips_at_edges():
    tb = Tbars(locs=[[0, 0, 0]])
    vol = tbars_to_volume(tb, 10, radius=3)
    assert vol[0, 0, 0] == 1 and vol.sum() > 0


def test_training_volumes_mask_semantics():
    tb = Tbars(locs=[[16, 16, 16]])
    labels, mask = make_training_volumes(tb, 33, radius=3, radius_ign=6,
                                         border=2)
    assert labels[16, 16, 16] == 1
    assert mask[16, 16, 16] == 1  # positives stay in the mask
    assert mask[16, 16, 21] == 0  # annulus (d=5) ignored
    assert mask[16, 16, 25] == 1  # outside annulus
    assert mask[0, 16, 16] == 0 and mask[1, 16, 16] == 0  # border
    assert mask[2, 16, 16] == 1


def test_dvid_partner_roundtrip_fuzz():
    """Random partner graphs (incl. PSDs shared between T-bars) survive
    save(style=dvid) -> load exactly."""
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 8))
        locs = rng.integers(0, 100, (n, 3)).astype(np.float64)
        # unique T-bar positions (DVID keys elements by position)
        locs += np.arange(n)[:, None] * 100.0
        conf = rng.random(n)
        # PSD pool smaller than the partner count -> shared PSDs
        pool = rng.integers(0, 50, (max(1, n), 3)).astype(np.float64)
        partners = [
            pool[rng.integers(0, len(pool), int(rng.integers(0, 4)))]
            for _ in range(n)
        ]
        # dedup within each T-bar (the round-trip unions by position)
        partners = [np.unique(p, axis=0) if len(p) else np.zeros((0, 3))
                    for p in partners]
        tb = Tbars(locs=locs, conf=conf, partners=partners)
        back = load_from_json(save_to_json(tb, style="dvid"))
        np.testing.assert_array_equal(back.locs, tb.locs)
        np.testing.assert_allclose(back.conf, tb.conf)
        for a, b in zip(back.partners, tb.partners):
            # order-insensitive: compare as sorted rows
            np.testing.assert_array_equal(
                np.asarray(sorted(map(tuple, a))),
                np.asarray(sorted(map(tuple, b))),
            )
