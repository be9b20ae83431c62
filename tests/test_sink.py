"""Checkpointed-sink tests: partitioned layout, manifests, resume-skip."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmnetfusion_ray.state import checkpoint
from osmnetfusion_ray.state.sink import read_checkpointed, write_checkpointed


@pytest.fixture
def demo_ds(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "cell": np.repeat(np.array([10, 20, 30], dtype=np.uint64), 50),
        "value": np.arange(150, dtype=np.int64),
        "url": [f"u{i}" for i in range(150)],
    })
    return rd.from_pandas(df)


class TestCheckpointedSink:
    def test_write_layout_and_manifest(self, demo_ds, tmp_path):
        root = str(tmp_path)
        written = write_checkpointed(demo_ds, root, "join", "cell", checksum_col="url",
                                     lineage={"input": "pages"})
        assert sorted(written["partition"]) == ["10", "20", "30"]
        assert written["rows"].sum() == 150
        for k in ("10", "20", "30"):
            assert os.path.isdir(os.path.join(root, "join", f"part={k}"))
        assert checkpoint.stage_complete(root, "join")
        man = checkpoint.read_manifest(root, "join")
        assert len(man) == 3
        assert all(m["checksum"] for m in man)
        assert all(m["lineage"] == {"input": "pages"} for m in man)

    def test_resume_skips_completed(self, demo_ds, tmp_path):
        root = str(tmp_path)
        # pre-complete partition 20 with sentinel data
        pre = pa.table({"cell": pa.array([20], pa.uint64()), "value": pa.array([-1]),
                        "url": pa.array(["pre"])})
        checkpoint.write_partition(root, "join", "20", pre)
        written = write_checkpointed(demo_ds, root, "join", "cell")
        assert sorted(written["partition"]) == ["10", "30"]  # 20 skipped
        back = read_checkpointed(root, "join").to_pandas()
        # partition 20 keeps the pre-existing (sentinel) data — not rewritten
        assert (back[back["cell"] == 20]["url"] == "pre").all()
        assert len(back[back["cell"] == 10]) == 50

    def test_roundtrip(self, demo_ds, tmp_path):
        root = str(tmp_path)
        write_checkpointed(demo_ds, root, "join", "cell")
        back = read_checkpointed(root, "join").to_pandas()
        assert len(back) == 150
        assert set(back["cell"].astype(np.uint64)) == {10, 20, 30}


class TestGeoPackage:
    """From-scratch GPKG writer (state/gpkg.py) — the reference's output
    format (p3_simplification.py:435-436), verified structurally via
    sqlite3: required metadata tables, application_id magic, and geometry
    blobs that round-trip through the engine's WKB codec."""

    def test_write_simplified_gpkg(self, ray_session, tmp_path):
        import sqlite3
        import struct

        from osmnetfusion_ray import geom
        from osmnetfusion_ray.pipelines.network import simplified_city
        from osmnetfusion_ray.state.gpkg import write_simplified_gpkg

        out = simplified_city(n=6, seed=42)
        path = str(tmp_path / "net.gpkg")
        write_simplified_gpkg(out, path)

        con = sqlite3.connect(path)
        try:
            (app_id,) = con.execute("PRAGMA application_id").fetchone()
            assert app_id == 1196444487  # 'GPKG'
            tables = {r[0] for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'")}
            assert {"gpkg_contents", "gpkg_geometry_columns",
                    "gpkg_spatial_ref_sys", "nodes", "edges"} <= tables
            layers = dict(con.execute(
                "SELECT table_name, geometry_type_name FROM gpkg_geometry_columns"))
            assert layers == {"nodes": "POINT", "edges": "LINESTRING"}
            n_edges = con.execute('SELECT count(*) FROM "edges"').fetchone()[0]
            assert n_edges == out["edges"].count()
            blob, g_u = con.execute('SELECT geom, g_u FROM "edges" LIMIT 1').fetchone()
            assert blob[:2] == b"GP"
            (srs,) = struct.unpack("<i", blob[4:8])
            assert srs == 4326
            gtype, coords = geom.wkb_parse(blob[8:])
            assert gtype == 2 and len(coords) >= 2
            assert isinstance(g_u, int)
        finally:
            con.close()


class TestCorpusCleanExport:
    def test_export_content_resume_and_partial(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osmnetfusion_ray.functions import hashing
        from osmnetfusion_ray.pipelines.corpus import (corpus_clean_export,
                                                       quality_score_batch)
        from osmnetfusion_ray.state import checkpoint
        from osmnetfusion_ray.state.sink import read_checkpointed

        sf = "/root/testdata/sf0.001"
        root = str(tmp_path)
        written = corpus_clean_export(sf, root, n_shards=16)
        assert checkpoint.stage_complete(root, "corpus_clean")
        assert len(written) == 16

        # content == brute-force quality filter + exact dedup (min doc_id)
        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text", "lang"]).to_pandas()
        t = pa.Table.from_pandas(docs[["doc_id", "text"]],
                                 preserve_index=False)
        score = quality_score_batch(t)["quality_score"].to_numpy()
        q = docs[score >= 0.5].copy()
        q["text_h"] = hashing.hash64(q["text"].to_numpy())
        keep = q.groupby("text_h")["doc_id"].idxmin()
        ref = q.loc[keep.to_numpy()].sort_values("doc_id")
        back = (read_checkpointed(root, "corpus_clean").to_pandas()
                .sort_values("doc_id"))
        assert back["doc_id"].tolist() == ref["doc_id"].tolist()
        assert back["text"].tolist() == ref["text"].tolist()
        # shard assignment is the stated Knuth hash
        sh = ((back["doc_id"].to_numpy().astype(np.uint64)
               * np.uint64(2654435761)) % np.uint64(16))
        assert (back["shard"].to_numpy().astype(np.uint64) == sh).all()

        # full resume: nothing rewritten
        again = corpus_clean_export(sf, root, n_shards=16)
        assert len(again) == 0

        # partial resume: drop one partition from manifest + disk → only
        # that shard is recomputed
        man = checkpoint.read_manifest(root, "corpus_clean")
        victim = man[0]["partition"]
        checkpoint.remove_partition(root, "corpus_clean", victim)
        third = corpus_clean_export(sf, root, n_shards=16)
        assert sorted(third["partition"]) == [victim]
        back2 = (read_checkpointed(root, "corpus_clean").to_pandas()
                 .sort_values("doc_id"))
        assert back2["doc_id"].tolist() == ref["doc_id"].tolist()
