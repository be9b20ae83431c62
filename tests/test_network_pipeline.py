"""End-to-end pipeline tests: enrichment + simplification on the synthetic
city, run on a real (session-scoped) Ray cluster."""

import numpy as np
import pandas as pd
import pytest

from osmnetfusion_ray import geom


@pytest.fixture(scope="module")
def enriched(ray_session):
    from osmnetfusion_ray.pipelines.network import enriched_city

    nodes_ds, edges_ds = enriched_city(n=8, seed=42)
    return nodes_ds.to_pandas(), edges_ds.to_pandas()


@pytest.fixture(scope="module")
def simplified(ray_session):
    from osmnetfusion_ray.pipelines.network import simplified_city

    out = simplified_city(n=8, seed=42)
    return out["nodes"].to_pandas(), out["edges"].to_pandas()


class TestEnrichPipeline:
    def test_edge_columns_added(self, enriched):
        _, edges = enriched
        for c in ["green_ratio", "retail_ratio", "building_ratio", "bike_access",
                  "cycleway_category", "gradient", "severity", "amenity_on",
                  "amenity_nearby", "pt_stop_on", "pt_stop_routes", "width_cycle_path"]:
            assert c in edges.columns, c

    def test_node_signals(self, enriched):
        nodes, _ = enriched
        assert "traffic_signals" in nodes.columns
        assert (nodes["traffic_signals"] != "").any()

    def test_ratios_in_unit_interval(self, enriched):
        _, edges = enriched
        for c in ["green_ratio", "retail_ratio", "building_ratio"]:
            v = edges[c].to_numpy(dtype=float)
            assert np.nanmin(v) >= 0 and np.nanmax(v) <= 1

    def test_reverse_bike_rows(self, enriched):
        _, edges = enriched
        assert (edges["bike_access"] == "bike_only").sum() >= 0
        # every bike_only row's opposite pair must NOT exist as a regular row
        bo = edges[edges["bike_access"] == "bike_only"]
        reg = edges[edges["bike_access"] != "bike_only"]
        pairs = set(zip(reg["u"].astype(int), reg["v"].astype(int)))
        for r in bo.itertuples(index=False):
            # the bike_only row itself is the (u,v)=(old v, old u) direction
            assert (int(r.u), int(r.v)) not in pairs

    def test_pt_stops_on_car_edges_only(self, enriched):
        _, edges = enriched
        from osmnetfusion_ray.stages.enrich import CAR_HIGHWAYS

        flagged = edges[edges["pt_stop_on"] == 1]
        assert len(flagged) > 0
        assert flagged["highway"].isin(CAR_HIGHWAYS).all()


class TestSimplifyPipeline:
    def test_network_contracts(self, simplified):
        nodes, edges = simplified
        # 8x8 grid + 16 satellite islands = 96 input nodes (+ split nodes);
        # clustering must contract below the input node count
        assert 0 < len(nodes) < 96
        assert 0 < len(edges)
        assert nodes["g_id"].is_unique
        assert edges["g_id"].is_unique

    def test_edges_reference_merged_nodes(self, simplified):
        nodes, edges = simplified
        ids = set(nodes["g_id"].astype(int))
        assert set(edges["g_u"].astype(int)).issubset(ids)
        assert set(edges["g_v"].astype(int)).issubset(ids)

    def test_no_collapsed_self_loops(self, simplified):
        _, edges = simplified
        assert (edges["g_u"] != edges["g_v"]).all()

    def test_oriented(self, simplified):
        _, edges = simplified
        assert not edges["g_reversed"].any()
        assert "g_geometry" not in edges.columns

    def test_geometries_valid(self, simplified):
        nodes, edges = simplified
        for w in edges["g_geo_lin"].head(20):
            t, c = geom.wkb_parse(w)
            assert t == 2 and len(c) == 2
        # linear geometry endpoints == merged node positions
        pos = {int(r.g_id): (r.g_x, r.g_y) for r in nodes.itertuples(index=False)}
        for r in edges.head(20).itertuples(index=False):
            _, c = geom.wkb_parse(r.g_geo_lin)
            assert np.allclose(c[0], pos[int(r.g_u)], atol=1e-9)
            assert np.allclose(c[-1], pos[int(r.g_v)], atol=1e-9)

    def test_access_flags_present(self, simplified):
        _, edges = simplified
        assert edges[["access_wal", "access_bik", "access_mot"]].notna().all().all()
        assert edges["access_wal"].any()
        assert edges["access_mot"].any()

    def test_mode_fields_gated_by_access(self, simplified):
        _, edges = simplified
        no_walk = edges[~edges["access_wal"].astype(bool)]
        if len(no_walk):
            assert no_walk["w_length"].isna().all()
        walk = edges[edges["access_wal"].astype(bool)]
        assert walk["w_length"].notna().all()

    def test_list_columns(self, simplified):
        _, edges = simplified
        row = edges.iloc[0]
        assert isinstance(row["l_id"], (list, np.ndarray))
        assert len(row["l_id"]) >= 1

    def test_deterministic_rerun(self, ray_session, simplified):
        from osmnetfusion_ray.pipelines.network import simplified_city

        nodes1, edges1 = simplified
        out2 = simplified_city(n=8, seed=42)
        edges2 = out2["edges"].to_pandas()
        e1 = edges1.sort_values("g_id").reset_index(drop=True)
        e2 = edges2.sort_values("g_id").reset_index(drop=True)
        assert len(e1) == len(e2)
        assert e1["g_u"].tolist() == e2["g_u"].tolist()
        assert e1["g_v"].tolist() == e2["g_v"].tolist()
        pd.testing.assert_series_equal(e1["m_maxspeed"], e2["m_maxspeed"])


class TestLanduseRaster:
    def test_burn_matches_geom_pip(self, ray_session):
        """The distributed vector→raster burn agrees with the library PIP
        kernel cell-for-cell, and the raster is non-trivial."""
        from osmnetfusion_ray import netfixture
        from osmnetfusion_ray.pipelines import enrich as PE
        from osmnetfusion_ray.pipelines.netqueries import (
            network_landuse_raster)

        out = network_landuse_raster("x").to_pandas().sort_values(
            ["iy", "ix"]).reset_index(drop=True)
        assert len(out) == 64 * 64
        assert out["covered"].sum() > 0
        assert (out["n_polys"] >= out["covered"]).all()

        netfixture.ensure_city_fixture()
        nodes_t, _, dims = netfixture.city_tables()
        _, _, rings = PE._dim_geoms(dims["landuse_green"])
        x = nodes_t["x"].to_numpy(); y = nodes_t["y"].to_numpy()
        x0, x1 = float(np.min(x)), float(np.max(x))
        y0, y1 = float(np.min(y)), float(np.max(y))
        ix = out["ix"].to_numpy(); iy = out["iy"].to_numpy()
        cx = x0 + (ix.astype(np.float64) + 0.5) * (x1 - x0) / 64
        cy = y0 + (iy.astype(np.float64) + 0.5) * (y1 - y0) / 64
        ref = geom.points_in_polygons_grid(cx, cy, rings)
        assert np.array_equal(out["n_polys"].to_numpy(),
                              ref.sum(axis=1).astype(np.int64))
        assert np.array_equal(out["covered"].to_numpy(),
                              ref.any(axis=1).astype(np.int64))


class TestPtRelationParse:
    """S4 scale path: the PBF-shaped relation parse + distributed J10."""

    @pytest.fixture(scope="class")
    def parsed(self, ray_session):
        import ray.data as rd

        from osmnetfusion_ray import synth
        from osmnetfusion_ray.pipelines import network as PN
        from osmnetfusion_ray.rayctx import ensure_tuned

        ensure_tuned()
        nodes, _ = synth.synth_city(6, 42, 4)
        rels = synth.synth_pt_relations(nodes)
        stops = PN.parse_pt_relations(
            rd.from_arrow(rels["rel_tags"]), rd.from_arrow(rels["rel_members"]),
            rd.from_arrow(rels["osm_nodes"]), rd.from_arrow(rels["osm_ways"]))
        return nodes, rels, stops.to_pandas(), PN

    def test_member_expansion_and_tags(self, parsed):
        nodes, rels, df, PN = parsed
        # one stop row per relation member (p1_getFurtherOSMData.py:121-149)
        assert len(df) == rels["rel_members"].num_rows
        assert set(df["mode"].unique()) == {"bus", "tram", "trolleybus"}
        # relation tags inherited by every member; NULL-name relations fall
        # back to str(relation_id) (documented deviation from the
        # reference's iteration-ordinal)
        tags = rels["rel_tags"].to_pandas().set_index("relation_id")
        for rid, g in df.groupby("relation_id"):
            want = tags.loc[rid, "name"]
            want = str(rid) if want is None else want
            assert (g["name"] == want).all()
            assert (g["operator"] == tags.loc[rid, "operator"]).all()

    def test_point_and_linestring_geometry(self, parsed):
        nodes, rels, df, PN = parsed
        onodes = rels["osm_nodes"].to_pandas().set_index("node_id")
        pts = df[df["geom_type"] == "Point"]
        assert len(pts) > 0
        for r in pts.head(20).itertuples():
            _, c = geom.wkb_parse(r.geometry)
            assert c[0, 0] == onodes.loc[r.member_ref, "lon"]
            assert c[0, 1] == onodes.loc[r.member_ref, "lat"]
        # way members: LineString of the way's node coords IN seq ORDER
        ways = rels["osm_ways"].to_pandas()
        ls = df[df["geom_type"] == "LineString"]
        assert len(ls) > 0
        for r in ls.drop_duplicates("member_ref").itertuples():
            wn = ways[ways["way_id"] == r.member_ref].sort_values("seq")
            _, c = geom.wkb_parse(r.geometry)
            assert len(c) == len(wn)
            assert np.array_equal(c[:, 0], onodes.loc[wn["node_id"], "lon"].to_numpy())
            assert np.array_equal(c[:, 1], onodes.loc[wn["node_id"], "lat"].to_numpy())

    def test_distributed_j10_matches_bruteforce(self, parsed, ray_session):
        import ray.data as rd

        nodes, rels, df, PN = parsed
        filt = PN.filter_pt_stops_ds(rd.from_pandas(df)).to_pandas()
        cnt = df["member_ref"].value_counts()
        want = (df[df["member_ref"].isin(cnt[cnt > 3].index)]
                .sort_values(["member_ref", "relation_id", "seq"],
                             kind="mergesort")
                .drop_duplicates("member_ref"))
        assert len(filt) == len(want) > 0
        assert (set(map(tuple, filt[["member_ref", "relation_id", "seq"]].values))
                == set(map(tuple, want[["member_ref", "relation_id", "seq"]].values)))
        # way platforms of the replicated routes survive the frequency cut
        assert (filt["geom_type"] == "LineString").any()


class TestSimplifyGolden:
    def test_matches_committed_golden(self, ray_session):
        """The end-to-end p2+p3 composite must reproduce the committed
        golden artifact (osmnetfusion_ray/golden/simplify_city_n8_s42
        .parquet) row-for-row — the same regression gate the reference
        publishes as p3_Munich_TEST_simplified.gpkg. Regenerate
        deliberately with tools/make_simplify_golden.py after an INTENDED
        semantic change; an unintended diff here means some stage of the
        chain drifted."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __ray_entry__ as entrymod
        from tools.make_simplify_golden import GOLDEN

        df = entrymod.queries()["network_simplify"]("unused").to_pandas()
        cols = sorted(df.columns)
        df = (df[cols].sort_values(cols, kind="mergesort")
              .reset_index(drop=True))
        golden = pd.read_parquet(GOLDEN)
        pd.testing.assert_frame_equal(df, golden)
