"""OSM-snapshot parquet ingest (sources/osm.py) — the engine's real-data
boundary (reference loaders: p2_enrichData.py:719-720,
p3_simplification.py:116-117). Verifies the snapshot path is semantically
identical to the in-memory synthetic path on the same inputs."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from osmnetfusion_ray import synth


@pytest.fixture(scope="module")
def snapshot_dir(tmp_path_factory):
    from osmnetfusion_ray.sources.osm import write_snapshot

    d = tmp_path_factory.mktemp("snap")
    nodes_t, edges_t = synth.synth_city(n=6, seed=42, satellites=8)
    dims = synth.synth_dim_tables(nodes_t, seed=42)
    write_snapshot(nodes_t, edges_t, str(d))
    for name, tab in dims.items():
        pq.write_table(tab, str(d / f"{name}.parquet"))
    return str(d), nodes_t, edges_t, dims


class TestSnapshotIngest:
    def test_roundtrip_schema_and_rows(self, ray_session, snapshot_dir):
        from osmnetfusion_ray.sources.osm import load_network_snapshot

        d, nodes_t, edges_t, _ = snapshot_dir
        nodes_ds, edges_ds = load_network_snapshot(f"{d}/nodes.parquet", f"{d}/edges.parquet")
        ndf = nodes_ds.to_pandas().sort_values("osmid").reset_index(drop=True)
        assert len(ndf) == nodes_t.num_rows
        assert (ndf["old_osmid"].to_numpy() == ndf["osmid"].to_numpy()).all()
        edf = edges_ds.to_pandas()
        assert len(edf) == edges_t.num_rows
        assert edf["oneway"].dtype == bool

    def test_missing_required_column_raises(self, ray_session, snapshot_dir, tmp_path):
        from osmnetfusion_ray.sources.osm import load_network_snapshot

        d, nodes_t, edges_t, _ = snapshot_dir
        bad = edges_t.drop_columns(["length"])
        pq.write_table(bad, str(tmp_path / "edges.parquet"))
        with pytest.raises(ValueError, match="length"):
            load_network_snapshot(f"{d}/nodes.parquet", str(tmp_path / "edges.parquet"))

    def test_bbox_filter_keeps_interior_edges_only(self, ray_session, snapshot_dir):
        from osmnetfusion_ray.sources.osm import load_network_snapshot

        d, nodes_t, edges_t, _ = snapshot_dir
        xs, ys = nodes_t["x"].to_numpy(), nodes_t["y"].to_numpy()
        bbox = (float(np.quantile(xs, 0.2)), float(np.quantile(ys, 0.2)),
                float(np.quantile(xs, 0.8)), float(np.quantile(ys, 0.8)))
        nodes_ds, edges_ds = load_network_snapshot(
            f"{d}/nodes.parquet", f"{d}/edges.parquet", bbox=bbox)
        ndf = nodes_ds.to_pandas()
        assert 0 < len(ndf) < nodes_t.num_rows
        kept = set(ndf["osmid"].astype(int))
        edf = edges_ds.to_pandas()
        assert len(edf) > 0
        assert set(edf["u"].astype(int)) <= kept and set(edf["v"].astype(int)) <= kept

    def test_enrich_identical_to_direct_path(self, ray_session, snapshot_dir):
        """Same inputs through parquet vs in-memory must enrich identically."""
        import ray.data as rd

        from osmnetfusion_ray.pipelines.enrich import enrich_network
        from osmnetfusion_ray.pipelines.network import filter_pt_stops
        from osmnetfusion_ray.sources.osm import load_dim_tables, load_network_snapshot

        d, nodes_t, edges_t, dims_direct = snapshot_dir
        node_osmids = nodes_t["osmid"].to_numpy()

        def _with_old(df):
            df = df.copy()
            df["old_osmid"] = df["osmid"].astype(np.int64)
            return df

        dims_a = dict(dims_direct)
        dims_a["pt_stops"] = filter_pt_stops(dims_a["pt_stops"])
        _, edges_a = enrich_network(
            rd.from_arrow(nodes_t).map_batches(_with_old, batch_format="pandas"),
            rd.from_arrow(edges_t).map_batches(_with_old, batch_format="pandas"),
            dims_a, node_osmids)

        nodes_ds, edges_ds = load_network_snapshot(f"{d}/nodes.parquet", f"{d}/edges.parquet")
        dims_b = load_dim_tables(d)
        dims_b["pt_stops"] = filter_pt_stops(dims_b["pt_stops"])
        _, edges_b = enrich_network(nodes_ds, edges_ds, dims_b, node_osmids)

        cols = ["osmid", "bike_access", "cycleway_category", "green_ratio",
                "gradient", "pt_stop_count", "amenity_on"]
        a = edges_a.select_columns(cols).to_pandas().sort_values("osmid").reset_index(drop=True)
        b = edges_b.select_columns(cols).to_pandas().sort_values("osmid").reset_index(drop=True)
        assert a.equals(b)

    def test_full_chain_from_snapshot(self, ray_session, snapshot_dir):
        from osmnetfusion_ray.pipelines.network import simplified_from_snapshot

        d, nodes_t, edges_t, _ = snapshot_dir
        out = simplified_from_snapshot(f"{d}/nodes.parquet", f"{d}/edges.parquet", d)
        edges = out["edges"].to_pandas()
        nodes = out["nodes"].to_pandas()
        assert len(edges) > 0 and len(nodes) > 0
        assert {"g_id", "g_u", "g_v", "access_bik"} <= set(edges.columns)


class TestGpkgNetworkRoundTrip:
    """GPKG write → read → pipeline schema: the reference user's existing
    GPKG artifacts ingest path (sources/osm.load_network_gpkg)."""

    def test_roundtrip_matches_parquet_path(self, ray_session, snapshot_dir, tmp_path):
        from osmnetfusion_ray.sources.osm import load_network_gpkg, load_network_snapshot
        from osmnetfusion_ray.state.gpkg import write_gpkg

        d, nodes_t, edges_t, _ = snapshot_dir
        path = str(tmp_path / "net.gpkg")
        write_gpkg({
            "nodes": (nodes_t.to_pandas(), "geometry", "POINT"),
            "edges": (edges_t.to_pandas(), "geometry", "LINESTRING"),
        }, path)
        n_g, e_g = load_network_gpkg(path)
        n_p, e_p = load_network_snapshot(f"{d}/nodes.parquet", f"{d}/edges.parquet")
        cols_n = ["osmid", "x", "y", "highway", "old_osmid"]
        a = n_g.select_columns(cols_n).to_pandas().sort_values("osmid").reset_index(drop=True)
        b = n_p.select_columns(cols_n).to_pandas().sort_values("osmid").reset_index(drop=True)
        assert a.equals(b)
        cols_e = ["osmid", "u", "v", "highway", "oneway", "length", "geometry"]
        ea = e_g.select_columns(cols_e).to_pandas().sort_values("osmid").reset_index(drop=True)
        eb = e_p.select_columns(cols_e).to_pandas().sort_values("osmid").reset_index(drop=True)
        assert ea.equals(eb)
