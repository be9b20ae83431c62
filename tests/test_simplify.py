"""Simplification-kernel truth tables (reference: p3_functions.py; shapes
mirrored from the reference's tests/test_p3_functions.py)."""

import numpy as np
import pandas as pd
import pytest

from osmnetfusion_ray import geom
from osmnetfusion_ray.stages import simplify as S


def _line(*pts):
    return geom.wkb_linestring(np.asarray(pts, dtype=np.float64))


class TestHighwayRank:
    def test_rank_values(self):
        s = pd.Series(["trunk", "secondary", "residential", "cycleway", "footway", "unknown"])
        assert S.add_highway_rank(s).tolist() == [10, 9, 7, 6, 5, 0]

    def test_buffer_radii(self):
        s = pd.Series(["trunk", "residential", "steps", "unknown"])
        assert S.buffer_radii(s).tolist() == [18.0, 12.0, 6.0, 4.0]


class TestSplitCurves:
    def test_straight_edge_untouched(self):
        e = pd.DataFrame({"u": [1], "v": [2], "osmid": [10],
                          "length": [100.0], "geometry": [_line((0, 0), (0.001, 0))]})
        out, nodes = S.split_curves(e)
        assert len(out) == 1 and len(nodes) == 0
        assert out.iloc[0]["osmid"] == 10

    def test_l_shape_splits_once(self):
        # 90° turn at the midpoint: |Δangle| = 90 > 75 → one split
        e = pd.DataFrame({"u": [1], "v": [2], "osmid": [10], "length": [0.0],
                          "geometry": [_line((0, 0), (0.001, 0), (0.001, 0.001))]})
        out, nodes = S.split_curves(e)
        assert len(out) == 2
        assert len(nodes) == 1
        nid = S.SPLIT1_BASE + 10 * 100
        assert nodes.iloc[0]["osmid"] == nid
        assert out.iloc[0]["v"] == nid and out.iloc[1]["u"] == nid
        # endpoints preserved
        assert out.iloc[0]["u"] == 1 and out.iloc[1]["v"] == 2
        # geometry partitioned at the bend
        _, c0 = geom.wkb_parse(out.iloc[0]["geometry"])
        _, c1 = geom.wkb_parse(out.iloc[1]["geometry"])
        assert np.allclose(c0[-1], [0.001, 0]) and np.allclose(c1[0], [0.001, 0])

    def test_gentle_curve_untouched(self):
        pts = [(0.0001 * i, 0.00001 * i * i) for i in range(6)]
        e = pd.DataFrame({"u": [1], "v": [2], "osmid": [11], "length": [0.0],
                          "geometry": [_line(*pts)]})
        out, nodes = S.split_curves(e)
        assert len(out) == 1 and len(nodes) == 0

    def test_deterministic_ids_independent_of_batching(self):
        rows = []
        for i, oid in enumerate([20, 21]):
            rows.append({"u": 1 + i, "v": 2 + i, "osmid": oid, "length": 0.0,
                         "geometry": _line((0, 0), (0.001, 0), (0.001, 0.001))})
        both = pd.DataFrame(rows)
        out_all, nodes_all = S.split_curves(both)
        out_0, nodes_0 = S.split_curves(both.iloc[[0]])
        out_1, nodes_1 = S.split_curves(both.iloc[[1]])
        assert sorted(out_all["osmid"]) == sorted([*out_0["osmid"], *out_1["osmid"]])
        assert sorted(nodes_all["osmid"]) == sorted([*nodes_0["osmid"], *nodes_1["osmid"]])


class TestNodeImportance:
    def test_top2_mean_and_first_highway(self):
        nodes = pd.DataFrame({"osmid": [1, 2, 3]})
        edges = pd.DataFrame({
            "u": [1, 1, 2], "v": [2, 3, 3],
            "highway": ["trunk", "residential", "footway"],
            "highway_rank": [10.0, 7.0, 5.0],
        })
        out = S.node_importance(nodes, edges)
        # node 1: edges trunk(10), residential(7) -> mean 8.5, 'trunk'
        assert out.loc[0, "highway_rank"] == 8.5
        assert out.loc[0, "highway_conn"] == "trunk"
        # node 2: trunk(10), footway(5) -> 7.5
        assert out.loc[1, "highway_rank"] == 7.5
        # node 3: residential(7), footway(5) -> 6
        assert out.loc[2, "highway_rank"] == 6.0
        assert out.loc[2, "highway_conn"] == "residential"

    def test_isolated_node_nan(self):
        nodes = pd.DataFrame({"osmid": [9]})
        edges = pd.DataFrame({"u": [1], "v": [2], "highway": ["trunk"], "highway_rank": [10.0]})
        out = S.node_importance(nodes, edges)
        assert np.isnan(out.loc[0, "highway_rank"])


def _nodes_frame(xys, ranks=None, radii=12.0, ids=None):
    n = len(xys)
    return pd.DataFrame({
        "osmid": ids if ids is not None else np.arange(1, n + 1, dtype=np.int64),
        "x": [p[0] for p in xys],
        "y": [p[1] for p in xys],
        "highway_rank": ranks if ranks is not None else [7.0] * n,
        "buffer_r": [radii] * n if np.isscalar(radii) else radii,
    })


D20 = 20 / (111_132.0 * np.cos(np.radians(48.14)))  # ~20 m in deg lon at 48.14N


class TestClusterNodes:
    def test_two_close_nodes_merge(self):
        nodes = _nodes_frame([(11.55, 48.14), (11.55 + D20, 48.14), (11.58, 48.16)],
                             ranks=[7.0, 9.0, 7.0])
        mm = S.cluster_nodes(nodes)
        # representative = higher rank (node 2)
        assert mm.loc[0, "merged_by"] == 2
        assert mm.loc[1, "merged_by"] == 2
        assert mm.loc[2, "merged_by"] == 3  # singleton
        assert mm.loc[1, "merged"] == "k" and mm.loc[0, "merged"] == "r"
        # merged point = max-rank member position (node 2)
        assert mm.loc[0, "mx"] == pytest.approx(11.55 + D20)

    def test_far_nodes_stay(self):
        nodes = _nodes_frame([(11.55, 48.14), (11.56, 48.15)])
        mm = S.cluster_nodes(nodes)
        assert (mm["merged_by"] == mm["osmid"]).all()
        assert (mm["merged"] == "").all()

    def test_tie_rank_smallest_osmid_wins(self):
        nodes = _nodes_frame([(11.55, 48.14), (11.55 + D20, 48.14)], ids=np.array([5, 3]))
        mm = S.cluster_nodes(nodes)
        assert set(mm["merged_by"]) == {3}

    def test_chain_transitive_cluster(self):
        # a-b overlap, b-c overlap, a-c don't: one component of 3
        nodes = _nodes_frame([(11.55, 48.14), (11.55 + D20, 48.14), (11.55 + 2 * D20, 48.14)])
        mm = S.cluster_nodes(nodes)
        assert len(set(mm["merged_by"])) == 1

    def test_big_cluster_kmeans_split(self):
        # 60 coincident-ish nodes with threshold 50 → 2 subclusters
        rng = np.random.RandomState(0)
        xs = 11.55 + rng.rand(60) * D20 * 0.5
        ys = 48.14 + rng.rand(60) * D20 * 0.5
        nodes = _nodes_frame(list(zip(xs, ys)))
        mm = S.cluster_nodes(nodes, threshold=50)
        reps = set(mm["merged_by"])
        assert len(reps) == 2
        assert (mm["merged"] != "").all()


class TestClusterComponents:
    def test_components_min_label(self):
        ids = np.array([10, 20, 30, 40])
        a = np.array([10, 30])
        b = np.array([20, 40])
        lab = S.components_from_pairs(ids, a, b)
        assert lab.tolist() == [10, 10, 30, 30]


class TestClusterLocalVsDistributed:
    def test_paths_identical(self, ray_session):
        """The size-adaptive local union-find branch of cluster_labels_ds
        must produce EXACTLY the labels the distributed label-propagation
        rounds converge to, on the same node set."""
        import ray.data as rd

        from osmnetfusion_ray.pipelines import simplify as P

        rng = np.random.RandomState(3)
        n = 400
        nodes = pd.DataFrame({
            "osmid": np.arange(n, dtype=np.int64) + 100,
            "x": 11.55 + rng.rand(n) * 0.02,
            "y": 48.13 + rng.rand(n) * 0.02,
            "highway_rank": rng.randint(0, 9, n),
            "buffer_r": rng.choice([4.0, 8.0, 14.0, 18.0], n),
        })
        ds = rd.from_pandas(nodes)
        res = P.pair_gen_res({"primary": 18.0})
        old = P.LOCAL_CC_MAX_PAIRS
        try:
            loc = P.cluster_labels_ds(ds, res=res, ref_lat=48.14).to_pandas()
            P.LOCAL_CC_MAX_PAIRS = 0
            dist = P.cluster_labels_ds(ds, res=res, ref_lat=48.14).to_pandas()
        finally:
            P.LOCAL_CC_MAX_PAIRS = old
        loc = loc.sort_values("osmid").reset_index(drop=True)
        dist = dist.sort_values("osmid").reset_index(drop=True)
        assert loc.equals(dist)
        assert (loc["label"] <= loc["osmid"]).all()


class TestReassign:
    def test_linear_and_reassigned(self):
        e = pd.DataFrame({
            "u": [1], "v": [2], "osmid": [100], "length": [0.0],
            "geometry": [_line((11.55, 48.14), (11.551, 48.141), (11.552, 48.14))],
        })
        merged_by = {1: 9, 2: 2}
        mx = {1: 11.549, 2: 11.552}
        my = {1: 48.139, 2: 48.14}
        out = S.reassign_edges(e, merged_by, mx, my)
        assert out.loc[0, "new_u"] == 9 and out.loc[0, "new_v"] == 2
        _, lin = geom.wkb_parse(out.loc[0, "geom_linear"])
        assert np.allclose(lin, [[11.549, 48.139], [11.552, 48.14]])
        _, rea = geom.wkb_parse(out.loc[0, "geom_reassigned"])
        assert np.allclose(rea[0], [11.549, 48.139]) and np.allclose(rea[-1], [11.552, 48.14])
        assert out.loc[0, "length"] == pytest.approx(
            geom.haversine_m(11.549, 48.139, 11.552, 48.14), rel=1e-6)

    def test_unmerged_edge_keeps_uv(self):
        e = pd.DataFrame({"u": [1], "v": [2], "osmid": [100], "length": [0.0],
                          "geometry": [_line((11.55, 48.14), (11.551, 48.14))]})
        out = S.reassign_edges(e, {}, {}, {})
        assert out.loc[0, "new_u"] == 1 and out.loc[0, "new_v"] == 2


class TestMergeNodes:
    def test_merge_group(self):
        g = pd.DataFrame({
            "osmid": [1, 2], "merged_by": [1, 1], "mx": [11.55, 11.55], "my": [48.14, 48.14],
            "highway": ["traffic_signals", np.nan],
            "crossing": ["marked", "crossing"],
            "highway_conn": ["trunk", "residential"],
            "highway_rank": [10.0, 7.0],
        })
        out = S.merge_nodes_group(g)
        assert out.loc[0, "g_id"] == 1
        assert out.loc[0, "g_signals"] == True  # noqa: E712
        assert out.loc[0, "g_crossing"] == True  # noqa: E712
        assert out.loc[0, "l_id"] == [1, 2]
        assert out.loc[0, "l_hw_conn"] == ["residential", "trunk"]
        assert "traffic_signals" in out.loc[0, "g_infra"]


def _merge_edges_frame(n, **over):
    base = {
        "u": [1] * n, "v": [2] * n, "new_u": [1] * n, "new_v": [2] * n,
        "osmid": np.arange(100, 100 + n, dtype=np.int64),
        "highway": ["residential"] * n,
        "highway_rank": [7.0] * n,
        "length": [100.0] * n,
        "bearing": [0.0] * n,
        "oneway": [False] * n,
        "geometry": [_line((11.55, 48.14), (11.551, 48.14))] * n,
        "geom_linear": [_line((11.55, 48.14), (11.551, 48.14))] * n,
        "geom_reassigned": [_line((11.55, 48.14), (11.551, 48.14))] * n,
    }
    base.update(over)
    return pd.DataFrame(base)


class TestMergeEdges:
    def test_two_directions_one_link(self):
        g = _merge_edges_frame(2, bearing=[0.0, 180.0])
        out = S.merge_edges_group(g)
        # one Link with edgeUV and edgeVU
        assert len(out) == 2
        assert sorted(out["g_reversed"].tolist()) == [False, True]
        assert out["g_u"].tolist() == [1, 1]  # both carry main's u (orient later)
        assert set(out["access_wal"]) == {True}

    def test_same_direction_merged_single_row(self):
        g = _merge_edges_frame(2, bearing=[0.0, 5.0])
        out = S.merge_edges_group(g)
        assert len(out) == 1
        assert out.loc[0, "l_id"] == [100, 101]

    def test_length_ratio_guard(self):
        # lengths 100 vs 300: ratio 3 ≥ 1.5 → two separate links
        g = _merge_edges_frame(2, length=[100.0, 300.0], bearing=[0.0, 2.0])
        out = S.merge_edges_group(g)
        assert len(out) == 2
        assert all(len(x) == 1 for x in out["l_id"])

    def test_collapsed_self_loop_dropped(self):
        g = _merge_edges_frame(1, new_u=[5], new_v=[5])
        out = S.merge_edges_group(g)
        assert len(out) == 0

    def test_true_self_loop_kept(self):
        g = _merge_edges_frame(1, u=[5], v=[5], new_u=[5], new_v=[5])
        out = S.merge_edges_group(g)
        assert len(out) == 1

    def test_rank_priority_main(self):
        g = _merge_edges_frame(2, highway=["residential", "primary"],
                               highway_rank=[7.0, 9.25], bearing=[0.0, 1.0])
        out = S.merge_edges_group(g)
        assert len(out) == 1
        assert out.loc[0, "g_id"] == 101 * 2  # primary row is main (uv)
        assert out.loc[0, "l_highway"] == ["primary", "residential"]


class TestModeAccess:
    # truth tables mirrored from reference tests (TestAnEdgeClass:544-736)
    def test_walk_access_footway(self):
        df = _merge_edges_frame(1, highway=["footway"])
        df["direction"] = False
        assert S._check_mode_access(df, "walk") is True

    def test_walk_access_trunk_denied(self):
        df = _merge_edges_frame(1, highway=["trunk"])
        df["direction"] = False
        df["maxspeed"] = [80.0]
        assert bool(S._check_mode_access(df, "walk")) is False

    def test_walk_access_by_maxspeed(self):
        df = _merge_edges_frame(1, highway=["trunk"])
        df["direction"] = False
        df["maxspeed"] = [50.0]
        assert bool(S._check_mode_access(df, "walk")) is True

    def test_bike_access_bicycle_no_overrides(self):
        df = _merge_edges_frame(1, highway=["residential"])
        df["direction"] = False
        df["bicycle"] = ["no"]
        assert bool(S._check_mode_access(df, "bike")) is False

    def test_bike_access_cycleway_tag_wins(self):
        df = _merge_edges_frame(1, highway=["trunk"])
        df["direction"] = False
        df["bicycle"] = ["no"]
        df["cycleway"] = ["track"]
        assert bool(S._check_mode_access(df, "bike")) is True

    def test_motorized_access(self):
        df = _merge_edges_frame(1, highway=["residential"])
        df["direction"] = False
        assert bool(S._check_mode_access(df, "motorized")) is True
        df2 = _merge_edges_frame(1, highway=["footway"])
        df2["direction"] = False
        assert bool(S._check_mode_access(df2, "motorized")) is False

    def test_motorized_oneway_bike_only_denied(self):
        df = _merge_edges_frame(1, highway=["residential"], oneway=[True])
        df["direction"] = False
        df["bike_access"] = ["bike_only"]
        assert bool(S._check_mode_access(df, "motorized")) is False


class TestPrepareEdges:
    def test_clean_and_key(self):
        df = _merge_edges_frame(2)
        df["maxspeed"] = ["['30', '50']", ""]
        df["lanes"] = ["2", ""]
        df["width"] = ["['2', '3']", "1"]
        df["surface"] = ["['asphalt', 'gravel']", "asphalt"]
        out = S.prepare_edges_for_merge(df)
        assert out.loc[0, "maxspeed"] == 50.0
        assert out.loc[0, "lanes"] == 2.0
        assert out.loc[0, "width"] == 2.0
        assert out.loc[0, "surface"] == ["asphalt", "gravel"]
        assert np.isnan(out.loc[1, "maxspeed"])
        assert (out["uv_lo"] == 1).all() and (out["uv_hi"] == 2).all()


class TestOrient:
    def test_reversed_swapped_and_flipped(self):
        df = pd.DataFrame({
            "g_u": [1, 3], "g_v": [2, 4], "g_reversed": [False, True],
            "g_geo_lin": [_line((0, 0), (1, 1)), _line((0, 0), (1, 1))],
            "g_geo_rea": [_line((0, 0), (1, 1)), _line((0, 0), (0.5, 0), (1, 1))],
            "g_geometry": [_line((0, 0), (1, 1))] * 2,
        })
        out = S.orient_edges(df)
        assert out.loc[1, "g_u"] == 4 and out.loc[1, "g_v"] == 3
        _, c = geom.wkb_parse(out.loc[1, "g_geo_rea"])
        assert np.allclose(c[0], [1, 1]) and np.allclose(c[-1], [0, 0])
        assert not out["g_reversed"].any()
        assert "g_geometry" not in out.columns
        # row 0 untouched
        assert out.loc[0, "g_u"] == 1


class TestSplitAtClusters:
    def test_edge_through_cluster_split(self):
        # cluster of two nodes midway along a long edge; edge endpoints far away
        nodes = pd.DataFrame({
            "osmid": [1, 2], "x": [11.555, 11.555 + D20 / 2], "y": [48.14, 48.14],
            "buffer_r": [12.0, 12.0], "highway_rank": [7.0, 7.0],
        })
        mm = S.cluster_nodes(nodes)
        assert set(mm["merged_by"]) == {1}
        state = S.ClusterBufferState(mm, nodes)
        edges = pd.DataFrame({
            "u": [10], "v": [11], "osmid": [500], "length": [0.0],
            "geometry": [_line((11.55, 48.14), (11.56, 48.14))],
        })
        req = S.split_requests(edges, state)
        assert len(req) == 1
        assert req.iloc[0]["edge_osmid"] == 500
        assert req.iloc[0]["rep"] == 1
        out, new_nodes = S.apply_edge_splits(edges, req)
        assert len(out) == 2 and len(new_nodes) == 1
        nid = S.SPLIT2_BASE + 500 * 100
        assert new_nodes.iloc[0]["osmid"] == nid
        assert out.iloc[0]["v"] == nid and out.iloc[1]["u"] == nid
        # split point x ≈ cluster centroid x
        assert new_nodes.iloc[0]["x"] == pytest.approx(mm.loc[0, "mx"], abs=1e-9)

    def test_edge_ending_in_cluster_not_split(self):
        nodes = pd.DataFrame({
            "osmid": [1, 2], "x": [11.555, 11.555 + D20 / 2], "y": [48.14, 48.14],
            "buffer_r": [12.0, 12.0], "highway_rank": [7.0, 7.0],
        })
        mm = S.cluster_nodes(nodes)
        state = S.ClusterBufferState(mm, nodes)
        edges = pd.DataFrame({
            "u": [1], "v": [11], "osmid": [501], "length": [0.0],
            "geometry": [_line((11.555, 48.14), (11.56, 48.14))],  # starts inside buffer
        })
        req = S.split_requests(edges, state)
        assert len(req) == 0

    def test_no_clusters_no_requests(self):
        nodes = pd.DataFrame({"osmid": [1], "x": [11.55], "y": [48.14],
                              "buffer_r": [12.0], "highway_rank": [7.0]})
        mm = S.cluster_nodes(nodes)
        state = S.ClusterBufferState(mm, nodes)
        edges = pd.DataFrame({"u": [1], "v": [2], "osmid": [500], "length": [0.0],
                              "geometry": [_line((11.55, 48.14), (11.56, 48.14))]})
        assert len(S.split_requests(edges, state)) == 0
