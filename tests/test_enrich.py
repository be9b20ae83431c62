"""Enrichment-operator truth tables (reference: p2_enrichData.py; test
shapes mirrored from the reference's tests/test_p2_enrichData.py)."""

import numpy as np
import pandas as pd
import pytest

from osmnetfusion_ray import geom
from osmnetfusion_ray.stages import enrich


def _line(*pts):
    return geom.wkb_linestring(np.asarray(pts, dtype=np.float64))


def edges_frame(n=2, **over):
    base = {
        "u": np.arange(1, n + 1, dtype=np.int64),
        "v": np.arange(2, n + 2, dtype=np.int64),
        "osmid": np.arange(100, 100 + n, dtype=np.int64),
        "highway": ["residential"] * n,
        "oneway": [False] * n,
        "reversed": [False] * n,
        "length": [100.0] * n,
        "geometry": [_line((11.55 + 0.001 * i, 48.14), (11.551 + 0.001 * i, 48.14)) for i in range(n)],
    }
    base.update(over)
    return pd.DataFrame(base)


class TestBikeAccess:
    def test_labels(self):
        df = edges_frame(4, highway=["residential", "trunk", "path", "primary"],
                         bicycle=["yes", "no", "use_sidepath", ""])
        out = enrich.bike_access_label(df)
        assert out.tolist() == ["yes", "no", "no", "yes"]

    def test_trunk_always_no(self):
        df = edges_frame(1, highway=["trunk_link"], bicycle=["designated"])
        assert enrich.bike_access_label(df).tolist() == ["no"]


class TestReverseBikeEdges:
    def test_candidates_with_both_columns(self):
        df = edges_frame(3, oneway=[True, True, False])
        df["oneway:bicycle"] = ["no", "", ""]
        df["cycleway"] = ["", "opposite", "opposite"]
        assert enrich.reverse_bike_candidates(df).tolist() == [True, True, False]

    def test_candidates_fallback_no_tag_columns(self):
        df = edges_frame(2, oneway=[True, False])
        assert enrich.reverse_bike_candidates(df).tolist() == [True, False]

    def test_generate_reverse_row(self):
        df = edges_frame(1, oneway=[True])
        df["oneway:bicycle"] = ["no"]
        df["cycleway"] = [""]
        df["bike_access"] = ["yes"]
        new, fix = enrich.gen_reverse_bike_edges(df, {(1, 2)})
        assert len(new) == 1
        assert new.iloc[0]["u"] == 2 and new.iloc[0]["v"] == 1
        assert new.iloc[0]["bike_access"] == "bike_only"
        assert bool(new.iloc[0]["reversed"]) is True
        # geometry NOT reversed (reference keeps original coords)
        assert new.iloc[0]["geometry"] == df.iloc[0]["geometry"]
        assert not fix.any()

    def test_existing_opposite_marks_yes(self):
        df = edges_frame(2, u=[1, 2], v=[2, 1], oneway=[True, False])
        df["oneway:bicycle"] = ["no", ""]
        df["cycleway"] = ["", ""]
        df["bike_access"] = ["yes", "no"]
        new, fix = enrich.gen_reverse_bike_edges(df, {(1, 2), (2, 1)})
        assert len(new) == 0
        assert fix.tolist() == [False, True]


class TestCyclewayCategory:
    @pytest.mark.parametrize(
        "over,expected",
        [
            ({"cycleway": ["lane"]}, "advisory_lane"),
            ({"cycleway": ["lane"], "bicycle": ["designated"]}, "exclusive_lane"),
            ({"cycleway": ["shared_busway"]}, "shared_lane"),
            ({"bicycle_road": ["yes"]}, "bicycle_road"),
            ({"highway": ["cycleway"]}, "one_direction_cycle_path"),
            ({"highway": ["cycleway"], "oneway": [False]}, "two_direction_cycle_path"),
            ({"cycleway:right": ["track"], "cycleway:right:oneway": ["no"]}, "two_direction_cycle_path"),
            ({"highway": ["path"], "bicycle": ["designated"], "segregated": ["no"]}, "foot_and_cycle_path"),
            ({"highway": ["footway"], "bicycle": ["yes"]}, "foot_and_cycle_path"),
            ({"highway": ["pedestrian"], "bicycle": ["yes"]}, "pedestrian_street"),
            ({"highway": ["residential"]}, "residential"),  # fallback -> highway
        ],
    )
    def test_cascade(self, over, expected):
        n = len(next(iter(over.values())))
        df = edges_frame(n)
        if "oneway" not in over:
            df["oneway"] = True  # avoid accidental two_direction for cycleway rows
        for k, val in over.items():
            df[k] = val
        assert enrich.cycleway_category(df).tolist() == [expected]

    def test_track_or_lane_combination(self):
        df = edges_frame(1, oneway=[True])
        df["cycleway"] = ["lane"]
        df["cycleway:left"] = ["track"]
        assert enrich.cycleway_category(df).tolist() == ["track_or_lane"]


class TestMergeSimilarColumns:
    def test_second_column_wins(self):
        df = pd.DataFrame({"a": ["x", "y", ""], "b": ["", "z", ""]})
        out = enrich.merge_similar_columns(df, "a", "b", "m")
        assert out["m"].tolist() == ["x", "z", ""]
        assert "a" not in out.columns and "b" not in out.columns

    def test_missing_column(self):
        df = pd.DataFrame({"a": ["x"]})
        out = enrich.merge_similar_columns(df, "a", "nope", "m")
        assert out["m"].tolist() == ["x"]


class TestGradient:
    def test_gradient_and_severity(self):
        df = edges_frame(1, u=[1], v=[2], length=[100.0])
        out = enrich.add_gradient(df, {1: 500.0, 2: 510.0})
        assert out["height_difference"].iloc[0] == 10.0
        assert out["gradient"].iloc[0] == 0.1
        assert out["severity"].iloc[0] == 1.0  # 10^2/100


class TestCyclePathWidth:
    def test_groupby_min_then_map(self):
        edges = edges_frame(2, osmid=[100, 101])
        widths = pd.DataFrame({"osmid": [100, 100, 999], "width_cycle_path": [2.0, 1.5, 3.0]})
        out = enrich.add_cycle_path_width(edges, widths)
        assert out["width_cycle_path"].iloc[0] == 1.5
        assert np.isnan(out["width_cycle_path"].iloc[1])


class TestTrafficLights:
    def test_nearest_node_within_20m(self):
        nodes = pd.DataFrame({
            "osmid": [1, 2], "x": [11.55, 11.56], "y": [48.14, 48.14],
        })
        # signal 8 m east of node 1; signal 500 m from everything
        sig_lon = np.array([11.55 + 8 / (111132 * np.cos(np.radians(48.14))), 11.58])
        sig_lat = np.array([48.14, 48.14])
        out = enrich.add_traffic_lights(nodes, np.array(["node/9000", "node/9001"]), sig_lon, sig_lat)
        assert out["traffic_signals"].tolist() == ["node/9000", ""]


class TestPTStops:
    def test_stop_snaps_to_car_edge(self):
        df = edges_frame(2, highway=["residential", "footway"])
        # stop right on edge 0's midpoint
        stop_lon = np.array([11.5505])
        stop_lat = np.array([48.14])
        out = enrich.add_pt_stops(df, np.array(["Stop A"]), stop_lon, stop_lat)
        assert out["pt_stop_on"].tolist() == [1, 0]
        assert out["pt_stop_count"].tolist() == [1, 0]
        assert out["pt_stop_routes"].tolist() == ["Stop A", ""]


class TestBicycleParking:
    def test_on_and_nearby(self):
        df = edges_frame(2)
        df["bike_access"] = ["yes", "yes"]
        # amenity sits on edge 0; both edges within 200 m
        out = enrich.add_bicycle_parking(df, np.array(["bicycle_parking 10"]),
                                         np.array([11.5505]), np.array([48.14]))
        assert out["amenity_on"].tolist() == ["bicycle_parking 10", ""]
        assert out["amenity_nearby"].iloc[0] == "bicycle_parking 10"
        assert out["amenity_nearby"].iloc[1] == "bicycle_parking 10"

    def test_non_bike_edges_excluded(self):
        df = edges_frame(1)
        df["bike_access"] = ["no"]
        out = enrich.add_bicycle_parking(df, np.array(["p"]), np.array([11.5505]), np.array([48.14]))
        assert out["amenity_on"].tolist() == [""]


class TestLanduseRatio:
    def test_point_part(self):
        df = edges_frame(1, length=[74.0])  # ~74 m edge
        # 3 points within 10 m of the line
        lons = np.array([11.5502, 11.5505, 11.5508])
        lats = np.array([48.14001, 48.13999, 48.14])
        out = enrich.landuse_ratio(df, lons, lats, "green")
        assert out["green_points"].iloc[0] == 3
        assert out["green_ratio_point"].iloc[0] == pytest.approx(min(3 * 5 / 74.0, 1.0))
        assert out["green_ratio"].iloc[0] == out["green_ratio_point"].iloc[0]

    def test_poly_part_full_cover(self):
        df = edges_frame(1)
        # polygon ring covering the whole edge
        ring = np.array([[11.549, 48.139], [11.552, 48.139], [11.552, 48.141],
                         [11.549, 48.141], [11.549, 48.139]])
        out = enrich.landuse_ratio(df, np.zeros(0), np.zeros(0), "green", poly_rings=[ring])
        assert out["green_ratio_poly"].iloc[0] == pytest.approx(1.0, abs=0.05)

    def test_ratio_capped_at_one(self):
        df = edges_frame(1, length=[10.0])
        lons = np.full(10, 11.5505)
        lats = np.full(10, 48.14)
        out = enrich.landuse_ratio(df, lons, lats, "green")
        assert out["green_ratio"].iloc[0] == 1.0


class TestLandusePolygonPipeline:
    """J2 wired end-to-end: a polygon-covered edge gets ratio_poly > 0
    through the full add_landuse_ratios pipeline stage (the round-1 gap:
    the kernel existed but the pipeline flattened polygons to points)."""

    def test_polygon_contributes_through_pipeline(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from osmnetfusion_ray.pipelines import enrich as PE

        # one edge fully inside a big polygon, one far away; no points
        df = edges_frame(2)
        df.loc[1, "geometry"] = _line((11.60, 48.17), (11.601, 48.17))
        ring = np.array([[11.549, 48.135], [11.553, 48.135],
                         [11.553, 48.145], [11.549, 48.145], [11.549, 48.135]])
        dims = {"landuse_green": pa.table({
            "geometry": pa.array([geom.wkb_polygon(ring)], type=pa.binary()),
            "landuse": pa.array(["park"]),
            "geom_type": pa.array(["Polygon"]),
        })}
        ds = PE.add_landuse_ratios(rd.from_pandas(df), dims, ref_lat=48.15)
        out = ds.to_pandas().sort_values("osmid").reset_index(drop=True)
        assert out["green_ratio"].iloc[0] == pytest.approx(1.0)
        assert out["green_ratio"].iloc[1] == 0.0

    def test_synth_city_has_polygon_coverage(self, ray_session):
        """The default synth dims now include park polygons and the enrich
        chain picks them up: total green coverage strictly exceeds the
        point-only coverage."""
        import pyarrow.compute as pc
        import ray.data as rd

        from osmnetfusion_ray import synth
        from osmnetfusion_ray.pipelines import enrich as PE

        nodes_t, edges_t = synth.synth_city(n=8, seed=42, satellites=16)
        dims = synth.synth_dim_tables(nodes_t, seed=42)
        g = dims["landuse_green"]
        pts_only = {"landuse_green": g.filter(pc.equal(g["geom_type"], "Point"))}
        full = PE.add_landuse_ratios(rd.from_arrow(edges_t), dims, ref_lat=48.15)
        base = PE.add_landuse_ratios(rd.from_arrow(edges_t), pts_only, ref_lat=48.15)
        s_full = full.to_pandas()["green_ratio"].sum()
        s_base = base.to_pandas()["green_ratio"].sum()
        assert s_full > s_base


class TestLanduseMultiParity:
    def test_multi_matches_three_single_calls(self, ray_session):
        import numpy as np

        from osmnetfusion_ray import synth
        from osmnetfusion_ray.pipelines.enrich import _dim_geoms
        from osmnetfusion_ray.stages import enrich as E
        from osmnetfusion_ray.state.index import PolygonGridIndex

        nodes_t, edges_t = synth.synth_city(n=12, seed=7, satellites=30)
        dims = synth.synth_dim_tables(nodes_t, seed=7)
        edges = edges_t.to_pandas()
        kinds = [("green", "landuse_green"), ("retail", "landuse_retail"),
                 ("building", "buildings")]
        bundles = []
        singles = edges
        for kind, tab in kinds:
            t = dims.get(tab)
            lon, lat, rings = (_dim_geoms(t) if t is not None and t.num_rows
                               else (np.zeros(0), np.zeros(0), []))
            pidx = (PolygonGridIndex(rings, np.arange(len(rings), dtype=np.int64),
                                     max_radius_m=200.0) if rings else None)
            bundles.append((kind, lon, lat, pidx))
            singles = E.landuse_ratio(singles, lon, lat, kind, poly_rings=[],
                                      poly_index=pidx)
            singles = singles.drop(columns=[f"{kind}_ratio_point", f"{kind}_ratio_poly"])
        multi = E.landuse_ratio_multi(edges, bundles)
        for kind, _ in kinds:
            assert np.array_equal(singles[f"{kind}_points"].to_numpy(),
                                  multi[f"{kind}_points"].to_numpy())
            assert np.array_equal(singles[f"{kind}_ratio"].to_numpy(),
                                  multi[f"{kind}_ratio"].to_numpy())
        assert (multi["green_ratio"] > 0).any()
