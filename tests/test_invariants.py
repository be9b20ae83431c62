"""Cross-cutting engine invariants (SURVEY.md §5 test plan): byte-identical
text per url, stable tile assignments across parallelism levels, and a
golden snapshot of the simplified network."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


class TestTextInvariant:
    def test_passes_on_untouched_text(self):
        from osmnetfusion_ray.stages.pages import geocode_cells_batch, verify_text_invariant

        t = pa.table({"url": ["https://a/1", "https://a/2"], "text": ["aa", "bb"]})
        out = verify_text_invariant(geocode_cells_batch(t))
        assert out.num_rows == 2

    def test_fails_loudly_on_mutated_text(self):
        from osmnetfusion_ray.stages.pages import geocode_cells_batch, verify_text_invariant

        t = geocode_cells_batch(pa.table({"url": ["https://a/1"], "text": ["aa"]}))
        mutated = t.set_column(t.schema.get_field_index("text"), "text", pa.array(["XX"]))
        with pytest.raises(AssertionError, match="text invariant violated"):
            verify_text_invariant(mutated)


class TestParallelismInvariance:
    def test_join_identical_across_block_counts(self, ray_session):
        """Same input at 1 block vs 8 blocks → identical join rows (cells,
        snapped edges, buffer hits) — the determinism contract the reference
        cannot make (its ids depend on scan order)."""
        import ray.data as rd

        from osmnetfusion_ray import synth
        from osmnetfusion_ray.pipelines import pagejoin
        from osmnetfusion_ray.sources import pages_from_documents

        nodes, edges = synth.synth_city(n=8, seed=42)

        def run(nblocks):
            pages = pages_from_documents(SF).repartition(nblocks)
            ds = pagejoin.join_pages_to_network(pages, nodes, edges)
            df = ds.select_columns(["url", "cell", "edge_id", "snap_dist_m",
                                    "node_buffer_id"]).to_pandas()
            return df.sort_values("url").reset_index(drop=True)

        a, b = run(1), run(8)
        pd.testing.assert_frame_equal(a, b)

    def test_simplify_identical_across_input_partitioning(self, ray_session):
        import ray.data as rd

        from osmnetfusion_ray.pipelines.enrich import enrich_network
        from osmnetfusion_ray.pipelines.network import build_network_inputs
        from osmnetfusion_ray.pipelines.simplify import simplify_network

        def run(nblocks):
            nodes_ds, edges_ds, dims, osmids = build_network_inputs(n=6, seed=42)
            edges_ds = edges_ds.repartition(nblocks)
            nodes_ds, edges_ds = enrich_network(nodes_ds, edges_ds, dims, osmids)
            out = simplify_network(nodes_ds, edges_ds)
            e = out["edges"].to_pandas().sort_values("g_id").reset_index(drop=True)
            return e[["g_id", "g_u", "g_v", "access_wal", "access_bik", "access_mot"]]

        pd.testing.assert_frame_equal(run(2), run(7))


class TestGoldenSnapshot:
    """Pinned output stats of the deterministic fixture pipeline — any
    semantic drift in enrichment or simplification trips this (the
    golden-diff test the reference lacks, SURVEY.md §5)."""

    @pytest.fixture(scope="class")
    def out(self, ray_session):
        from osmnetfusion_ray.pipelines.network import simplified_city

        res = simplified_city(n=8, seed=42)
        return res["nodes"].to_pandas(), res["edges"].to_pandas()

    def test_shape_snapshot(self, out):
        nodes, edges = out
        # pinned for (n=8, seed=42, satellites=16); update deliberately on
        # any intended semantic change
        assert len(nodes) == 84
        assert len(edges) == 237

    def test_id_checksum_snapshot(self, out):
        nodes, edges = out
        assert int(nodes["g_id"].astype(np.int64).sum()) == 11104000571697216
        assert int(edges["g_u"].astype(np.int64).sum()) % 10**9 == 611884607


class TestTiledJoin:
    """The tiled join (per-tile network shards, pages shuffled by tile) must
    produce EXACTLY the broadcast join's results — the halo replication and
    the shared global reference latitudes make tiling invisible."""

    def test_tiled_equals_broadcast(self, ray_session):
        from osmnetfusion_ray import synth
        from osmnetfusion_ray.pipelines import pagejoin
        from osmnetfusion_ray.sources import pages_from_documents

        nodes, edges = synth.synth_city(n=10, seed=42, satellites=12)
        pages = pages_from_documents("/root/testdata/sf0.001")
        cols = ["doc_id", "edge_id", "snap_dist_m", "node_buffer_id"]
        a = (pagejoin.join_pages_to_network(pages, nodes, edges, geocode_mode="doc_id")
             .select_columns(cols).to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (pagejoin.join_pages_to_network_tiled(pages, nodes, edges, geocode_mode="doc_id")
             .select_columns(cols).to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)

    def test_tiled_handles_empty_tiles(self, ray_session):
        """Pages landing in tiles with no network rows get -1 sentinels."""
        import pyarrow as pa

        from osmnetfusion_ray import geom as G
        from osmnetfusion_ray.pipelines import pagejoin
        import ray.data as rd

        # tiny network in one corner; pages all over the bbox
        nodes = pa.table({"osmid": pa.array([1, 2], pa.int64()),
                          "x": pa.array([11.541, 11.542]), "y": pa.array([48.121, 48.122])})
        edges = pa.table({
            "u": pa.array([1], pa.int64()), "v": pa.array([2], pa.int64()),
            "osmid": pa.array([10], pa.int64()),
            "geometry": pa.array([G.wkb_linestring(
                __import__("numpy").array([[11.541, 48.121], [11.542, 48.122]]))],
                pa.binary()),
        })
        from osmnetfusion_ray.sources import pages_from_documents

        pages = pages_from_documents("/root/testdata/sf0.001")
        out = pagejoin.join_pages_to_network_tiled(
            pages, nodes, edges, geocode_mode="doc_id").to_pandas()
        assert (out["edge_id"] == -1).any()          # far pages unsnapped
        assert set(out.columns) >= {"doc_id", "edge_id", "snap_dist_m", "node_buffer_id"}


class TestSimplifyPathEquality:
    def test_local_and_distributed_identical(self, ray_session, monkeypatch):
        """The driver-local small path and the distributed chain must yield
        identical simplified networks (data scale picks the path)."""
        from osmnetfusion_ray.pipelines import simplify as SIMP
        from osmnetfusion_ray.pipelines.enrich import enrich_network
        from osmnetfusion_ray.pipelines.network import build_network_inputs

        def run():
            nodes_ds, edges_ds, dims, osmids = build_network_inputs(n=6, seed=42)
            nodes_ds, edges_ds = enrich_network(nodes_ds, edges_ds, dims, osmids)
            out = SIMP.simplify_network(nodes_ds, edges_ds)
            e = out["edges"].to_pandas().sort_values("g_id").reset_index(drop=True)
            n = out["nodes"].to_pandas().sort_values("g_id").reset_index(drop=True)
            return n, e

        ln, le = run()                       # small path (default at this size)
        monkeypatch.setattr(SIMP, "SMALL_SIMPLIFY_MAX_EDGES", 0)
        dn, de = run()                       # forced distributed path
        # forced tiled-state path: cluster-buffer split requests built by
        # keyed exchanges and reassign by hash-join attachment — nothing
        # O(N_nodes) on the driver (round-2 scale flag)
        monkeypatch.setattr(SIMP, "P3_BROADCAST_STATE_MAX_NODES", 0)
        tn, te = run()
        monkeypatch.undo()
        assert sorted(le.columns) == sorted(de.columns)
        assert sorted(ln.columns) == sorted(dn.columns)
        pd.testing.assert_frame_equal(le, de[le.columns], check_dtype=False)
        pd.testing.assert_frame_equal(ln, dn[ln.columns], check_dtype=False)
        assert sorted(le.columns) == sorted(te.columns)
        assert sorted(ln.columns) == sorted(tn.columns)
        pd.testing.assert_frame_equal(le, te[le.columns], check_dtype=False)
        pd.testing.assert_frame_equal(ln, tn[ln.columns], check_dtype=False)
