"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (web pages geocoded, cell-encoded,
PIP-joined to node-cluster buffers and kNN-snapped to network edges) on
sf0.001. ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from osmnetfusion_ray import synth
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources import pages_from_documents

    nodes, edges = synth.synth_city(n=16, seed=42)
    pages = pages_from_documents(SF0001)
    ds = pagejoin.join_pages_to_network(pages, nodes, edges)
    return ds.select_columns(["url", "doc_id", "lang", "cell", "edge_id", "snap_dist_m", "node_buffer_id", "text_hash"])


# ---------------------------------------------------------------------------


def _q_page_network_join(sf_dir: str):
    """Flagship join, fully oracle-checked: SQL-exact doc_id geocode, kNN
    snap to the fixture city's segments, exact node-buffer disks."""
    from osmnetfusion_ray import netfixture
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources import pages_from_documents

    netfixture.ensure_city_fixture()
    nodes, edges, _ = netfixture.city_tables()
    ds = pagejoin.join_pages_to_network(pages_from_documents(sf_dir), nodes, edges,
                                        geocode_mode="doc_id")
    return ds.select_columns(["doc_id", "edge_id", "snap_dist_m", "node_buffer_id"])


def _q_page_network_join_tiled(sf_dir: str):
    """TILED variant of the flagship join (per-tile network shards, pages
    hash-partitioned by coarse tile) — same oracle as the broadcast join
    because halo replication + shared global metric make tiling invisible."""
    from osmnetfusion_ray import netfixture
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources import pages_from_documents

    from osmnetfusion_ray.sources import table_rows

    netfixture.ensure_city_fixture()
    nodes, edges, _ = netfixture.city_tables()
    ds = pagejoin.join_pages_to_network_tiled(pages_from_documents(sf_dir), nodes, edges,
                                              geocode_mode="doc_id",
                                              rows_hint=table_rows(sf_dir, "documents"))
    return ds.select_columns(["doc_id", "edge_id", "snap_dist_m", "node_buffer_id"])


def _q_text_stats(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import text_stats_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        text_stats_batch, batch_format="pyarrow"
    )


def _q_quality(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import quality_score_batch
    from osmnetfusion_ray.sources import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "quality_score"])


def _q_langid(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import langid_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pyarrow"
    )


def _q_exact_dedup(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import exact_dedup

    return exact_dedup(sf_dir)


def _q_doc_geocode(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_geocode_batch
    from osmnetfusion_ray.sources import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        doc_geocode_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "lon", "lat", "ix", "iy"])


def _q_doc_cell_counts(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_cell_counts

    return doc_cell_counts(sf_dir)


def _q_ann_topk(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import ann_topk

    return ann_topk(sf_dir, k=10, query_vec_id=0)


def _q_minhash(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import minhash_near_dups

    return minhash_near_dups(sf_dir)


def _q_sample_bottomk(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import sample_bottomk

    return sample_bottomk(sf_dir)


def _q_user_trajectories(sf_dir: str):
    from osmnetfusion_ray.pipelines.pagejoin import user_trajectories

    return user_trajectories(sf_dir)


def _q_coverage_gaps(sf_dir: str):
    from osmnetfusion_ray.pipelines.pagejoin import coverage_gaps

    return coverage_gaps(sf_dir)


def _q_cell_lang_diversity(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import cell_lang_diversity

    return cell_lang_diversity(sf_dir)


def _q_vocab_by_lang(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import vocab_by_lang

    return vocab_by_lang(sf_dir)


def _q_link_bfs(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_bfs

    return link_bfs(sf_dir)


def _q_link_triangles(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_triangles

    return link_triangles(sf_dir)


def _q_link_label_prop(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_label_prop

    return link_label_prop(sf_dir)


def _q_link_greedy_walks(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_greedy_walks

    return link_greedy_walks(sf_dir)


def _q_link_sssp(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_sssp

    return link_sssp(sf_dir)


def _q_link_mis(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_mis

    return link_mis(sf_dir)


def _q_map_match_viterbi(sf_dir: str):
    from osmnetfusion_ray.pipelines.pagejoin import map_match_viterbi

    return map_match_viterbi(sf_dir)


def _q_link_adamic_adar(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_adamic_adar

    return link_adamic_adar(sf_dir)


def _q_bm25_topk(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import bm25_topk

    return bm25_topk(sf_dir)


def _q_doc_nn(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_nn

    return doc_nn(sf_dir)


def _q_corpus_prep(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import corpus_prep

    return corpus_prep(sf_dir)


def _q_doc_chunks(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_chunks

    return doc_chunks(sf_dir)


def _q_dup_passages(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import dup_passages

    return dup_passages(sf_dir)


def _q_cell_kde(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import cell_kde

    return cell_kde(sf_dir)


def _q_weighted_sample(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import weighted_sample

    return weighted_sample(sf_dir)


def _q_train_shuffle(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import train_shuffle

    return train_shuffle(sf_dir)


def _q_latest_page_per_site(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import latest_page_per_site

    return latest_page_per_site(sf_dir)


def _q_crawl_delta(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import crawl_delta

    return crawl_delta(sf_dir)


def _q_jaccard_prefix_pairs(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import jaccard_prefix_pairs

    return jaccard_prefix_pairs(sf_dir)


def _q_top_tokens(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import top_tokens

    return top_tokens(sf_dir, k=50)


def _q_heavy_hitters(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import heavy_hitters

    return heavy_hitters(sf_dir, k=100)


def _q_top_docs_per_lang(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import top_docs_per_lang

    return top_docs_per_lang(sf_dir, k=5)


def _q_inverted_index(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import inverted_index

    return inverted_index(sf_dir, max_postings=20)


def _q_customers_without_events(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import customers_without_events

    return customers_without_events(sf_dir)


def _q_doc_length_ntile(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_length_ntile

    return doc_length_ntile(sf_dir, tiles=4)


def _q_token_counts(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import token_counts_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        token_counts_batch, batch_format="pyarrow")


def _q_mixture_sample(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import mixture_sample

    return mixture_sample(sf_dir)


def _q_sequence_packing(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import sequence_packing

    return sequence_packing(sf_dir)


def _q_doc_global_rank(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_global_rank

    return doc_global_rank(sf_dir)


def _q_pii_redact(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import pii_redact_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        pii_redact_batch, batch_format="pyarrow")


def _q_link_graph(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import link_graph

    return link_graph(sf_dir)


def _q_pagerank(sf_dir: str):
    from osmnetfusion_ray.pipelines.graph import pagerank

    return pagerank(sf_dir)


def _q_repetition_stats(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import repetition_stats_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow")


def _q_pii_counts(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import pii_counts_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        pii_counts_batch, batch_format="pyarrow")


def _q_contamination(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import contamination_flags

    return contamination_flags(sf_dir)


def _q_extract_text(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import extract_page_text

    return extract_page_text(sf_dir)


def _q_boilerplate(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import boilerplate_stats

    return boilerplate_stats(sf_dir)


def _q_near_dup_clusters(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import near_dup_clusters

    return near_dup_clusters(sf_dir)


def _q_embedding_near_dups(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import embedding_near_dups

    return embedding_near_dups(sf_dir, threshold=0.35)


def _q_embedding_near_dups_lsh(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import embedding_near_dups_lsh

    return embedding_near_dups_lsh(sf_dir, threshold=0.35)


def _q_ngram_jaccard(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import ngram_jaccard_pairs

    return ngram_jaccard_pairs(sf_dir, threshold=0.5)


def _q_ann_ivf(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import ann_topk_ivf

    return ann_topk_ivf(sf_dir, k=10, query_vec_id=0)


def _q_ann_pq(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import ann_topk_pq

    return ann_topk_pq(sf_dir, k=10, query_vec_id=0)


def _q_ann_ivf_flat(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import ann_topk_ivf_flat

    return ann_topk_ivf_flat(sf_dir, k=10, query_vec_id=0)


def _q_fingerprints(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import rolling_fingerprint_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        rolling_fingerprint_batch, batch_format="pyarrow")


def _q_media_pipeline(sf_dir: str):
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import multimodal as MM

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        MM.media_from_documents_batch, batch_format="pyarrow")
    ds = ds.map_batches(MM.MediaDecoder, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    ds = ds.map_batches(MM.MediaResizer, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    return ds.select_columns(["media_id", "media_type", "media_bytes", "width",
                              "height", "n_frames", "duration_s", "resized_w", "resized_h"])


def _q_media_features(sf_dir: str):
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import multimodal as MM

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        MM.media_from_documents_batch, batch_format="pyarrow")
    return ds.map_batches(MM.FeatureExtractor, batch_format="pyarrow",
                          batch_size=256, concurrency=(1, 4))


def _q_image_pipeline_ppm(sf_dir: str):
    """REAL image decode path (no stub): deterministic P6 PPM payloads are
    actually ENCODED to bytes, an actor-pool decoder actually PARSES them
    (header + raw RGB buffer, numpy only — no image library needed for
    PPM), a second actor stage consumes the decoded pixel-buffer column for
    a nearest-neighbor thumbnail re-encoded as real P6, and the output is
    exact integer pixel statistics. The oracle recomputes the stats from
    the generation formula without ever seeing bytes, so a match proves the
    encode→decode→resize roundtrip lossless (stages/ppm.py docstring)."""
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import ppm as PPM

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        PPM.ppm_payloads_batch, batch_format="pyarrow", batch_size=512)
    ds = ds.map_batches(PPM.PpmDecoder, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    ds = ds.map_batches(PPM.PpmResizer, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    return ds.map_batches(PPM.ppm_stats_batch, batch_format="pyarrow")


def _q_audio_pipeline_wav(sf_dir: str):
    """REAL audio decode path (no stub): deterministic RIFF/WAVE PCM16
    payloads are actually ENCODED to bytes, an actor-pool decoder actually
    PARSES them (all header fields validated, numpy only — no audio
    library needed for canonical WAV), a second actor stage consumes the
    decoded PCM buffer column for a stride-4 downsample re-encoded as real
    WAV, and the output is exact integer sample statistics. The oracle
    recomputes the stats from the generation formula without ever seeing
    bytes, so a match proves the encode→decode→downsample roundtrip
    lossless (stages/wav.py docstring)."""
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import wav as WAV

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        WAV.wav_payloads_batch, batch_format="pyarrow", batch_size=512)
    ds = ds.map_batches(WAV.WavDecoder, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    ds = ds.map_batches(WAV.WavDownsampler, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    return ds.map_batches(WAV.wav_stats_batch, batch_format="pyarrow")


def _q_video_pipeline_y4m(sf_dir: str):
    """REAL video decode path (no stub): deterministic YUV4MPEG2 payloads
    are actually ENCODED to bytes, an actor-pool decoder actually PARSES
    them (header tokens + per-frame markers validated, numpy only — Y4M
    needs no video library), a second actor stage consumes the decoded
    plane buffer column for an every-2nd-frame sample re-encoded as real
    Y4M, and the output is exact integer plane statistics. The oracle
    recomputes the stats from the generation formula without ever seeing
    bytes, so a match proves the encode→decode→frame-sample roundtrip
    lossless (stages/y4m.py docstring)."""
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import y4m as Y4M

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        Y4M.y4m_payloads_batch, batch_format="pyarrow", batch_size=512)
    ds = ds.map_batches(Y4M.Y4mDecoder, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    ds = ds.map_batches(Y4M.Y4mFrameSampler, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    return ds.map_batches(Y4M.y4m_stats_batch, batch_format="pyarrow")


def _q_video_scene_cuts(sf_dir: str):
    """Scene-cut detection over REAL decoded Y4M planes: per-frame luma
    sums, consecutive deltas, cut iff |Δ| > 4·w·h (integer; oracle
    recomputes from the plane formula — stages/y4m.py)."""
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import y4m as Y4M

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        Y4M.y4m_payloads_batch, batch_format="pyarrow", batch_size=512)
    ds = ds.map_batches(Y4M.Y4mDecoder, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    return ds.map_batches(Y4M.y4m_scene_cuts_batch, batch_format="pyarrow")


def _q_audio_silence(sf_dir: str):
    """VAD-style silence windows over REAL decoded PCM: 16-sample window
    energies Σ|s|, silent below 131072 (integer; oracle recomputes from
    the sample formula — stages/wav.py)."""
    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import wav as WAV

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        WAV.wav_payloads_batch, batch_format="pyarrow", batch_size=512)
    ds = ds.map_batches(WAV.WavDecoder, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))
    return ds.map_batches(WAV.wav_silence_batch, batch_format="pyarrow")


def _q_media_feature_stats(sf_dir: str):
    """Per-media scalar summary of the FeatureExtractor CONTENT histogram
    — the oracle-checkable projection of the list<float> feature column.
    Features are exact integer bin counts over the REAL decoded units, so
    the stats are integer-exact; the only float op is one sqrt. The oracle
    recomputes the counts from the codec generation formulas without ever
    seeing bytes (corpusoracle.media_feature_stats_sql)."""
    import numpy as np
    import pyarrow as pa

    from osmnetfusion_ray.sources import read_table
    from osmnetfusion_ray.stages import multimodal as MM

    ds = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        MM.media_from_documents_batch, batch_format="pyarrow")
    ds = ds.map_batches(MM.FeatureExtractor, batch_format="pyarrow",
                        batch_size=256, concurrency=(1, 4))

    def stats(batch: pa.Table) -> pa.Table:
        feat = batch["feature"].combine_chunks()
        mat = feat.flatten().to_numpy(zero_copy_only=False).reshape(len(batch), -1)
        cnt = np.rint(mat).astype(np.int64)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "f_min": pa.array(cnt.min(axis=1).astype(np.float64)),
            "f_max": pa.array(cnt.max(axis=1).astype(np.float64)),
            "f_sum": pa.array(cnt.sum(axis=1).astype(np.float64)),
            "f_norm": pa.array(np.sqrt((cnt * cnt).sum(axis=1).astype(np.float64))),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


_SIMPLIFIED_CACHE: dict = {}


def _simplified(n: int = 8, seed: int = 42) -> dict:
    key = (n, seed)
    if key not in _SIMPLIFIED_CACHE:
        from osmnetfusion_ray.pipelines.network import simplified_city

        out = simplified_city(n=n, seed=seed)
        _SIMPLIFIED_CACHE[key] = {
            "nodes": out["nodes"].materialize(),
            "edges": out["edges"].materialize(),
        }
    return _SIMPLIFIED_CACHE[key]


def _q_network_enrich(sf_dir: str):
    """FULL p2 enrichment chain on the fixture city — oracle-checked end to
    end (the SQL recomposes landuse ratios, bike labels, reverse-edge
    generation, gradient, PT-stop and amenity snaps over the same fixture).
    Ratio floats are rounded to 6 on both sides (the polygon-clip part sums
    sample weights whose order differs between numpy and SQL)."""
    import pandas as pd

    from osmnetfusion_ray import netfixture
    from osmnetfusion_ray.pipelines.network import build_network_inputs
    from osmnetfusion_ray.pipelines.enrich import enrich_network

    netfixture.ensure_city_fixture()
    nodes_ds, edges_ds, dims, node_osmids = build_network_inputs(
        n=netfixture.CITY_N, seed=netfixture.CITY_SEED)
    _, edges = enrich_network(nodes_ds, edges_ds, dims, node_osmids)
    ds = edges.select_columns(
        ["osmid", "u", "v", "highway", "bike_access", "cycleway_category",
         "green_ratio", "retail_ratio", "building_ratio", "gradient", "severity",
         "pt_stop_on", "pt_stop_count", "amenity_on", "amenity_nearby"])

    def _round(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in ("green_ratio", "retail_ratio", "building_ratio"):
            df[c] = df[c].astype(float).round(6)
        return df

    return ds.map_batches(_round, batch_format="pandas")


def _q_network_simplify(sf_dir: str):
    """Full p2+p3 chain → contracted edges, checked against the COMMITTED
    golden artifact (``osmnetfusion_ray/golden/simplify_city_n8_s42.parquet``)
    — the same regression-gate role as the reference's published
    ``network_data/Munich_TEST/p3_Munich_TEST_simplified.gpkg``
    (p3_simplification.py:116,410-421): the chain's semantics are proven by
    the per-stage network_* oracles + the pytest truth tables / merge-kernel
    bit-identity tests, and the golden pins the end-to-end composite so ANY
    drift in any stage turns this driver row red. Floats are rounded to 6
    decimals on both sides (the chain itself is deterministic across
    cluster widths — asserted by tools/make_simplify_golden.py --check and
    test_simplify_golden). Regenerate deliberately with
    tools/make_simplify_golden.py after an intended semantic change."""
    import pandas as pd

    out = _simplified()
    ds = out["edges"].select_columns(
        ["g_id", "g_u", "g_v", "g_lit", "g_gradient", "g_severity",
         "access_wal", "access_bik", "access_mot", "w_length", "b_length", "m_length"])

    def _round(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in ("g_gradient", "g_severity", "w_length", "b_length", "m_length"):
            df[c] = df[c].astype(float).round(6)
        return df

    return ds.map_batches(_round, batch_format="pandas")


_SIMP_TABLES_CACHE: dict = {}


def _simplified_tables():
    """Adapted (nodes, edges) Arrow tables of the cached p3 output — cached
    so the query and its oracle fixture see the identical edge_row order."""
    if "t" not in _SIMP_TABLES_CACHE:
        from osmnetfusion_ray.pipelines import pagejoin

        _SIMP_TABLES_CACHE["t"] = pagejoin.simplified_to_network_tables(_simplified())
    return _SIMP_TABLES_CACHE["t"]


def _q_page_join_simplified(sf_dir: str):
    """north_star flagship: pages × CONTRACTED network (kNN snap to merged
    edges + exact-disk node buffers). Oracle checks the JOIN semantics on
    the contracted fixture (the contraction itself is covered by the
    per-stage network_* oracles + pytest)."""
    from osmnetfusion_ray.pipelines import pagejoin
    from osmnetfusion_ray.sources import pages_from_documents

    nodes, edges = _simplified_tables()
    ds = pagejoin.join_pages_to_network(pages_from_documents(sf_dir), nodes, edges,
                                        geocode_mode="doc_id")
    return ds.select_columns(["doc_id", "edge_id", "snap_dist_m", "node_buffer_id"])


def _q_simhash(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import simhash_batch
    from osmnetfusion_ray.sources import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


def _q_top_bigrams(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import top_bigrams

    return top_bigrams(sf_dir, k=50)


def _q_lm_perplexity(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import lm_perplexity

    return lm_perplexity(sf_dir)


def _q_embedding_centroids(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import embedding_centroids

    return embedding_centroids(sf_dir)


def _q_length_filter_p90(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import length_filter_p90

    return length_filter_p90(sf_dir)


def _q_simhash_near_dups(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import simhash_near_dups

    return simhash_near_dups(sf_dir)


def _q_tfidf_top_terms(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import tfidf_top_terms

    return tfidf_top_terms(sf_dir)


def _q_kmeans_embeddings(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import kmeans_embeddings

    return kmeans_embeddings(sf_dir)


def _q_cell_counts_salted(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_cell_counts_salted

    return doc_cell_counts_salted(sf_dir)


def _q_doc_cell_pyramid(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_cell_pyramid

    return doc_cell_pyramid(sf_dir)


def _q_doc_radius_pairs(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_radius_pairs

    return doc_radius_pairs(sf_dir)


def _q_contamination_bloom(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import contamination_flags_bloom

    return contamination_flags_bloom(sf_dir)


def _q_edit_distance_pairs(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import edit_distance_pairs

    return edit_distance_pairs(sf_dir)


def _q_doc_dbscan(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import doc_dbscan

    return doc_dbscan(sf_dir)


def _q_incremental_view(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import incremental_view_update

    return incremental_view_update(sf_dir)


def _q_docs_skyline(sf_dir: str):
    from osmnetfusion_ray.pipelines.corpus import docs_skyline

    return docs_skyline(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from osmnetfusion_ray.pipelines import analytics, corpus, netqueries

    # ORDERING IS LOAD-BEARING: the driver oracle-checks only the FIRST 50
    # entries of this dict (insertion order).  Round-5 rotation (verdict
    # items 1-3): six entries driver-green in BOTH r03 and r04
    # (simhash_fingerprints, ngram_jaccard_pairs, doc_fingerprints,
    # media_pipeline, image_pipeline_ppm, audio_pipeline_wav — their
    # families stay represented by simhash_near_dups/jaccard_prefix_pairs/
    # fingerprint_clusters and media_feature_stats/video_pipeline_y4m)
    # rotate OUT below the line; rotated IN are (a) the four round-4
    # additions that had never had a driver row (kcenter_coreset,
    # cell_morans_i, cell_getis_gi, doc_bbox_scan), (b) the NEW
    # storage-pruned bbox scan (doc_bbox_scan_pruned — same no-cell-logic
    # oracle as the full scan, so its green row proves the partition
    # pruning lossless), and (c) the NEW corpus_clean_export_manifest —
    # the pre-training artifact's projection, oracled against a pure-SQL
    # recomputation from the documents view.
    return {
        # --- 1-5: network stage samples (+ the S4 parse variant) -----------
        "network_pt_stops_rel": netqueries.network_pt_stops_rel,  # S4 parse path
        "network_split_curves": netqueries.network_split_curves,
        "network_cluster": netqueries.network_cluster,
        "network_reverse_bike": netqueries.network_reverse_bike,
        "network_widths": netqueries.network_widths,
        # --- 6-10: flagship composites + joins -----------------------------
        "network_enrich": _q_network_enrich,         # FULL p2 chain, SQL-oracled
        "network_simplify": _q_network_simplify,     # committed-golden oracle (round 4)
        "page_network_join": _q_page_network_join,
        "page_network_join_tiled": _q_page_network_join_tiled,
        "page_join_simplified": _q_page_join_simplified,  # join-only oracle (net side = p3 output)
        # --- 11-16: the iterative family (first driver rows, round 4) ------
        "doc_dbscan": _q_doc_dbscan,
        "link_sssp": _q_link_sssp,
        "map_match_viterbi": _q_map_match_viterbi,
        "viterbi_user_paths": analytics.viterbi_user_paths,
        "quadtree_leaves": corpus.quadtree_leaves,
        "link_mis": _q_link_mis,
        # --- 17-20: round-4 de-broadcast proofs ----------------------------
        "q20_promotion_suppliers": analytics.q20_promotion_suppliers,
        "q14_promo_revenue": analytics.q14_promo_revenue,
        "q19_discounted_revenue": analytics.q19_discounted_revenue,
        "supplier_part_stats": analytics.supplier_part_stats,
        # --- 21-30: dedup family (representatives) + text extraction -------
        "exact_dedup": _q_exact_dedup,
        "minhash_near_dups": _q_minhash,             # rows-only (hash not in SQL)
        "near_dup_clusters": _q_near_dup_clusters,
        "simhash_near_dups": _q_simhash_near_dups,
        "jaccard_prefix_pairs": _q_jaccard_prefix_pairs,
        "fingerprint_clusters": corpus.fingerprint_clusters,
        "extract_page_text": _q_extract_text,
        "boilerplate_stats": _q_boilerplate,
        "corpus_prep": _q_corpus_prep,
        "dup_passages": _q_dup_passages,
        # --- 31-34: chunking/packing + media codec representatives ---------
        "doc_chunks": _q_doc_chunks,
        "sequence_packing": _q_sequence_packing,
        "media_feature_stats": _q_media_feature_stats,
        "video_pipeline_y4m": _q_video_pipeline_y4m,
        # --- 35-40: round-4/5 additions, first driver rows (round 5) -------
        "kcenter_coreset": corpus.kcenter_coreset,
        "cell_morans_i": corpus.cell_morans_i,
        "cell_getis_gi": corpus.cell_getis_gi,
        "doc_bbox_scan": corpus.doc_bbox_scan,
        "doc_bbox_scan_pruned": corpus.doc_bbox_scan_pruned,
        "corpus_clean_export_manifest": corpus.corpus_clean_export_manifest,
        # --- 41-50: embeddings, ER, perf-reworked analytics, and the
        # --- round-3 paper-aligned sampling/AQP + data-selection ops -------
        "embedding_near_dups": _q_embedding_near_dups,
        "ann_topk": _q_ann_topk,
        "entity_resolution": corpus.entity_resolution,
        "join_sample": analytics.join_sample,
        "salted_enrich_events": analytics.salted_enrich_events,
        "union_join_sample": analytics.union_join_sample,
        "groupby_kmv_estimate": analytics.groupby_kmv_estimate,
        "agg_discovery": analytics.agg_discovery,
        "dsir_weights": corpus.dsir_weights,
        "ccnet_buckets": corpus.ccnet_buckets,
        # ------------------- end of driver check window --------------------
        "simhash_fingerprints": _q_simhash,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "doc_fingerprints": _q_fingerprints,
        "media_pipeline": _q_media_pipeline,
        "image_pipeline_ppm": _q_image_pipeline_ppm,
        "audio_pipeline_wav": _q_audio_pipeline_wav,
        "network_rank": netqueries.network_rank,
        "network_importance": netqueries.network_importance,
        "network_gradient": netqueries.network_gradient,
        "network_landuse_points": netqueries.network_landuse_points,
        "network_landuse_poly": netqueries.network_landuse_poly,
        "network_bike_labels": netqueries.network_bike_labels,
        "network_pt_stops": netqueries.network_pt_stops,
        "network_amenities": netqueries.network_amenities,
        "q12_priority_lines": analytics.q12_priority_lines,
        "revenue_by_nation": analytics.revenue_by_nation,
        "q18_large_orders": analytics.q18_large_orders,
        "media_features": _q_media_features,         # rows-only (list<float> output; media_feature_stats is the oracled projection)
        "text_stats": _q_text_stats,
        "quality_scores": _q_quality,
        "langid": _q_langid,
        "token_counts": _q_token_counts,
        "q1_pricing_summary": analytics.q1_pricing_summary,
        "top_parts_by_revenue": analytics.top_parts_by_revenue,
        "events_tumbling": analytics.events_tumbling,
        "events_sessionize": analytics.events_sessionize,
        "events_sliding": analytics.events_sliding,
        "events_asof_clicks": analytics.events_asof_clicks,
        "event_gaps": analytics.event_gaps,
        "event_zscore_outliers": analytics.event_zscore_outliers,
        "event_type_pivot": analytics.event_type_pivot,
        "docs_rollup": analytics.docs_rollup,
        "conversion_funnel": analytics.conversion_funnel,
        "q3_shipping_priority": analytics.q3_shipping_priority,
        "q4_order_priority": analytics.q4_order_priority,
        "lineitem_price_corr": analytics.lineitem_price_corr,
        # rows-only by design: HLL is approximate; its exact oracled twin
        # is daily_active_users (same day keys, exact distinct counts)
        "daily_active_users_hll": analytics.daily_active_users_hll,
        "dau_retention": analytics.dau_retention,
        "q5_local_supplier_volume": analytics.q5_local_supplier_volume,
        "q17_small_quantity_revenue": analytics.q17_small_quantity_revenue,
        "q10_returned_items": analytics.q10_returned_items,
        "q7_volume_shipping": analytics.q7_volume_shipping,
        "q13_customer_distribution": analytics.q13_customer_distribution,
        "q15_top_supplier": analytics.q15_top_supplier,
        "events_horizon_counts": analytics.events_horizon_counts,
        "heavy_hitters": _q_heavy_hitters,
        "nation_balance_full_outer": analytics.nation_balance_full_outer,
        "events_cube": analytics.events_cube,
        "q22_global_sales_opportunity": analytics.q22_global_sales_opportunity,
        "q6_forecast_revenue": analytics.q6_forecast_revenue,
        "q8_market_share": analytics.q8_market_share,
        "q21_waiting_suppliers": analytics.q21_waiting_suppliers,
        "q2_min_cost_supplier": analytics.q2_min_cost_supplier,
        "q9_product_type_profit": analytics.q9_product_type_profit,
        "q11_important_parts": analytics.q11_important_parts,
        "q16_parts_supplier_counts": analytics.q16_parts_supplier_counts,
        "table_profile": analytics.table_profile,
        "event_value_exact_quantiles": analytics.event_value_exact_quantiles,
        "event_type_transitions": analytics.event_type_transitions,
        "event_value_quantiles_hist": analytics.event_value_quantiles_hist,
        "doc_cell_pyramid": _q_doc_cell_pyramid,
        "doc_radius_pairs": _q_doc_radius_pairs,
        # rows-only by design: Bloom membership can over-count with prob
        # ~1.3e-5/shingle; exact oracled twin is contamination_check
        "contamination_check_bloom": _q_contamination_bloom,
        "event_running_stats": analytics.event_running_stats,
        "event_type_cooccurrence": analytics.event_type_cooccurrence,
        "embedding_norms_by_lang": analytics.embedding_norms_by_lang,
        "stratified_sample": analytics.stratified_sample,
        "lang_length_quantiles": analytics.lang_length_quantiles,
        "orders_by_month": analytics.orders_by_month,
        "daily_active_users": analytics.daily_active_users,
        "docs_by_lang": analytics.docs_by_lang,
        "doc_cell_counts_salted": _q_cell_counts_salted,
        "doc_geocode": _q_doc_geocode,
        "doc_cell_counts": _q_doc_cell_counts,
        "mixture_sample": _q_mixture_sample,
        "link_graph": _q_link_graph,
        "pagerank": _q_pagerank,
        "pii_redact": _q_pii_redact,
        "doc_global_rank": _q_doc_global_rank,
        "top_tokens": _q_top_tokens,
        "top_bigrams": _q_top_bigrams,
        "embedding_centroids": _q_embedding_centroids,
        "length_filter_p90": _q_length_filter_p90,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "lm_perplexity": _q_lm_perplexity,
        "kmeans_embeddings": _q_kmeans_embeddings,   # rows-only (iterative by design)
        "top_docs_per_lang": _q_top_docs_per_lang,
        "inverted_index": _q_inverted_index,
        "customers_without_events": _q_customers_without_events,
        "doc_length_ntile": _q_doc_length_ntile,
        "latest_page_per_site": _q_latest_page_per_site,
        "crawl_delta": _q_crawl_delta,
        "sample_bottomk": _q_sample_bottomk,
        "bm25_topk": _q_bm25_topk,
        "link_triangles": _q_link_triangles,
        "link_bfs": _q_link_bfs,
        "vocab_by_lang": _q_vocab_by_lang,
        "cell_lang_diversity": _q_cell_lang_diversity,
        "doc_nn": _q_doc_nn,
        "user_trajectories": _q_user_trajectories,
        "coverage_gaps": _q_coverage_gaps,
        "cell_kde": _q_cell_kde,
        "weighted_sample": _q_weighted_sample,
        "train_shuffle": _q_train_shuffle,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,  # rows-only (approximate by design)
        "ann_topk_ivf": _q_ann_ivf,                  # rows-only (kmeans-trained lists; ivf_flat is the oracled mechanism)
        "ann_topk_pq": _q_ann_pq,                    # rows-only (kmeans codebooks; recall-tested vs exact ann_topk)
        "ann_topk_ivf_flat": _q_ann_ivf_flat,
        "repetition_stats": _q_repetition_stats,
        "pii_counts": _q_pii_counts,
        "contamination_check": _q_contamination,
        "events_campaign_join": analytics.events_campaign_join,
        "docs_skyline": _q_docs_skyline,
        "incremental_view_update": _q_incremental_view,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "rolling_uniques_7d": analytics.rolling_uniques_7d,
        "users_all_event_types": analytics.users_all_event_types,
        "campaign_peak_concurrency": analytics.campaign_peak_concurrency,
        "user_daily_locf": analytics.user_daily_locf,
        "user_day_streaks": analytics.user_day_streaks,
        "event_twap": analytics.event_twap,
        "event_mad_by_type": analytics.event_mad_by_type,
        "event_throttle": analytics.event_throttle,
        "embedding_gram": corpus.embedding_gram,
        "doc_kcore": corpus.doc_kcore,
        "embedding_pca": corpus.embedding_pca,
        "doc_nn_mutual": corpus.doc_nn_mutual,
        "event_rising_triples": analytics.event_rising_triples,
        "length_gini_by_lang": analytics.length_gini_by_lang,
        "props_key_stats": analytics.props_key_stats,
        "user_value_kendall": analytics.user_value_kendall,
        "token_entropy_by_lang": corpus.token_entropy_by_lang,
        "pmi_bigrams": corpus.pmi_bigrams,
        "event_chain_scan": analytics.event_chain_scan,
        "network_landuse_raster": netqueries.network_landuse_raster,
        "link_greedy_walks": _q_link_greedy_walks,
        "lang_length_ks": corpus.lang_length_ks,
        "link_adamic_adar": _q_link_adamic_adar,
        "daily_balance_total": analytics.daily_balance_total,
        "user_session_coverage": analytics.user_session_coverage,
        "user_retention_cohorts": analytics.user_retention_cohorts,
        "scd2_history": analytics.scd2_history,
        "user_covisitation": analytics.user_covisitation,
        "events_watermark_late": analytics.events_watermark_late,
        "event_percentile_attach": analytics.event_percentile_attach,
        "video_scene_cuts": _q_video_scene_cuts,
        "audio_silence_windows": _q_audio_silence,
        "semdedup": corpus.semdedup,
        "ripley_k": corpus.ripley_k,
        "cell_join_counts": corpus.cell_join_counts,
        "cell_compact": corpus.cell_compact,
        "idw_grid": corpus.idw_grid,
        "link_label_prop": _q_link_label_prop,
        "variogram": corpus.variogram,
        "convex_hull": corpus.convex_hull,
        "bpe_first_merge": corpus.bpe_first_merge,
        # rows-only by design: iterative string rewriting; bpe_first_merge
        # is the oracled twin of round 1 (pytest asserts agreement)
        "bpe_merges": corpus.bpe_merges,
    }


# ---------------------------------------------------------------------------

_GEO = """
    SELECT doc_id,
           (doc_id * 2654435761) % 4294967296 AS h,
           CAST((doc_id * 2654435761) % 4294967296 % 65536 AS DOUBLE) / 65536.0 AS fx,
           CAST(((doc_id * 2654435761) % 4294967296) // 65536 AS DOUBLE) / 65536.0 AS fy
    FROM documents
"""

_RADIUS_PAIRS_SQL = f"""
    WITH g AS ({_GEO}),
    p AS (
        SELECT doc_id, fx, fy,
               CAST(floor(fx / 0.03) AS BIGINT) AS cx,
               CAST(floor(fy / 0.03) AS BIGINT) AS cy
        FROM g
    ),
    o AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                (0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(sqrt((a.fx - b.fx) * (a.fx - b.fx)
                    + (a.fy - b.fy) * (a.fy - b.fy)), 6) AS dist
    FROM p a
    CROSS JOIN o
    JOIN p b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
    WHERE a.doc_id < b.doc_id
      AND (a.fx - b.fx) * (a.fx - b.fx)
        + (a.fy - b.fy) * (a.fy - b.fy)
        < CAST(0.03 AS DOUBLE) * CAST(0.03 AS DOUBLE)
"""


_TEXT_STATS = """
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '\\S+')) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
             / CAST(CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS DOUBLE) AS punct_ratio,
           CAST(len(regexp_extract_all(text, '\\b(the|a|an|and|of|to|in|is|it|that)\\b')) AS DOUBLE)
             / CAST(CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
                         THEN len(regexp_extract_all(text, '\\S+')) ELSE 1 END AS DOUBLE) AS stopword_ratio,
           CAST(length(text) AS DOUBLE)
             / CAST(CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
                         THEN len(regexp_extract_all(text, '\\S+')) ELSE 1 END AS DOUBLE) AS avg_token_len
    FROM documents
"""


def oracle_sql() -> dict[str, str]:
    from osmnetfusion_ray import corpusoracle, netfixture, netoracle
    from osmnetfusion_ray.pipelines import analytics
    from osmnetfusion_ray.pipelines import corpus as corpusmod
    from osmnetfusion_ray.pipelines import graph as graphmod

    net = netoracle.network_oracles()
    d = netfixture.ensure_city_fixture()
    seg_ref, node_ref = netfixture.city_ref_lats()
    net["page_network_join"] = netoracle.page_join_oracle(
        f"{d}/edge_segs.parquet", f"{d}/nodes.parquet", seg_ref, node_ref)
    net["page_network_join_tiled"] = net["page_network_join"]
    net["user_trajectories"] = netoracle.trajectory_oracle(
        f"{d}/edge_segs.parquet", seg_ref)
    net["map_match_viterbi"] = netoracle.map_match_oracle(
        f"{d}/edge_segs.parquet", seg_ref)
    net["coverage_gaps"] = netoracle.coverage_gaps_oracle(
        f"{d}/edge_segs.parquet", f"{d}/nodes.parquet", seg_ref, node_ref)
    simp = netfixture.write_simplified_fixture(*_simplified_tables())
    net["page_join_simplified"] = netoracle.page_join_oracle(
        f"{simp['dir']}/edge_segs.parquet", f"{simp['dir']}/nodes.parquet",
        simp["seg_ref_lat"], simp["node_ref_lat"])
    # the committed end-to-end golden artifact — same regression-gate role
    # as the reference's published p3_Munich_TEST_simplified.gpkg
    # (p3_simplification.py:116,410-421); see tools/make_simplify_golden.py
    _golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "osmnetfusion_ray", "golden",
                           "simplify_city_n8_s42.parquet")
    net["network_simplify"] = f"""
        -- golden-artifact regression oracle: the p2+p3 composite's
        -- integer-exact projection, frozen at a verified state (per-stage
        -- SQL oracles + pytest truth tables + cross-width determinism
        -- check). Any drift in any stage of the chain breaks this row.
        SELECT * FROM read_parquet('{_golden}')
    """
    return {
        **net,
        "simhash_fingerprints": corpusoracle.simhash_sql(),
        "simhash_near_dups": corpusoracle.simhash_near_dups_sql(maxdist=3),
        "doc_fingerprints": corpusoracle.fingerprints_sql(),
        "minhash_near_dups": corpusoracle.minhash_near_dups_sql(threshold=0.6),
        "ngram_jaccard_pairs": corpusoracle.ngram_jaccard_sql(threshold=0.5),
        "media_pipeline": corpusoracle.media_pipeline_sql(),
        "media_feature_stats": corpusoracle.media_feature_stats_sql(),
        "image_pipeline_ppm": """
            -- expected stats recomputed from the pixel-generation formula
            -- (never from bytes): a bit-equal match proves the engine's
            -- real P6 encode -> parse -> nearest-neighbor-resize roundtrip
            -- lossless. All arithmetic integer.
            WITH dims AS (
                SELECT doc_id,
                       8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
                       least(8 + doc_id % 9, 8) AS rw,
                       least(8 + doc_id % 7, 8) AS rh
                FROM documents
            ),
            ys AS (SELECT doc_id, w, unnest(range(h)) AS y FROM dims),
            px AS (SELECT doc_id, y, unnest(range(w)) AS x FROM ys),
            sums AS (
                SELECT doc_id,
                       CAST(sum((doc_id*7919 + y*131 + x*31) % 256) AS BIGINT) AS sum_r,
                       CAST(sum((doc_id*7919 + y*131 + x*31 + 17) % 256) AS BIGINT) AS sum_g,
                       CAST(sum((doc_id*7919 + y*131 + x*31 + 34) % 256) AS BIGINT) AS sum_b
                FROM px GROUP BY doc_id
            ),
            rys AS (SELECT doc_id, w, h, rw, rh, unnest(range(rh)) AS i FROM dims),
            rpx AS (SELECT doc_id, w, h, rw, rh, i, unnest(range(rw)) AS j FROM rys),
            rsums AS (
                SELECT doc_id,
                       CAST(sum((
                           (doc_id*7919 + ((i*h)//rh)*131 + ((j*w)//rw)*31) % 256
                         + (doc_id*7919 + ((i*h)//rh)*131 + ((j*w)//rw)*31 + 17) % 256
                         + (doc_id*7919 + ((i*h)//rh)*131 + ((j*w)//rw)*31 + 34) % 256
                       ) // 3) AS BIGINT) AS rsum_gray
                FROM rpx GROUP BY doc_id
            )
            SELECT d.doc_id, d.w, d.h, s.sum_r, s.sum_g, s.sum_b,
                   d.rw, d.rh, r.rsum_gray
            FROM dims d
            JOIN sums s USING (doc_id)
            JOIN rsums r USING (doc_id)
        """,
        "audio_pipeline_wav": """
            -- expected stats recomputed from the sample-generation
            -- formula (never from bytes): a bit-equal match proves the
            -- engine's real WAV encode -> parse -> downsample roundtrip
            -- lossless. All arithmetic integer; zero crossings are the
            -- strict sign product s[t-1]*s[t] < 0.
            WITH lens AS (
                SELECT doc_id, 64 + doc_id % 97 AS n FROM documents
            ),
            ts AS (SELECT doc_id, n, unnest(range(n)) AS t FROM lens),
            sm AS (
                SELECT doc_id, n, t,
                       (doc_id*7919 + t*t*13 + t*101) % 65536 - 32768 AS s
                FROM ts
            ),
            lagged AS (
                SELECT doc_id, n, t, s,
                       lag(s) OVER (PARTITION BY doc_id ORDER BY t) AS sp
                FROM sm
            )
            SELECT doc_id,
                   CAST(max(n) AS BIGINT) AS n_samples,
                   CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
                   CAST(max(abs(s)) AS BIGINT) AS peak,
                   CAST(count(*) FILTER (
                       WHERE sp IS NOT NULL AND sp * s < 0) AS BIGINT)
                     AS zero_cross,
                   CAST(count(*) FILTER (WHERE t % 4 = 0) AS BIGINT) AS ds_n,
                   CAST(sum(abs(s)) FILTER (WHERE t % 4 = 0) AS BIGINT)
                     AS ds_sum_abs
            FROM lagged GROUP BY doc_id
        """,
        "video_pipeline_y4m": """
            -- expected stats recomputed from the plane-generation formula
            -- (never from bytes): a bit-equal match proves the engine's
            -- real Y4M encode -> parse -> frame-sample roundtrip
            -- lossless. All arithmetic integer.
            WITH dims AS (
                SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
                       3 + doc_id % 5 AS nf
                FROM documents
            ),
            fs AS (SELECT doc_id, w, h, nf, unnest(range(nf)) AS f FROM dims),
            ys AS (SELECT doc_id, w, nf, f, unnest(range(h)) AS y FROM fs),
            px AS (SELECT doc_id, nf, f, y, unnest(range(w)) AS x FROM ys),
            sums AS (
                SELECT doc_id,
                       CAST(sum((doc_id*7919 + f*251 + y*131 + x*31) % 256)
                         AS BIGINT) AS sum_y,
                       CAST(sum((doc_id*7919 + f*251 + y*131 + x*31 + 85) % 256)
                         AS BIGINT) AS sum_u,
                       CAST(sum((doc_id*7919 + f*251 + y*131 + x*31 + 170) % 256)
                         AS BIGINT) AS sum_v,
                       CAST(sum(CASE WHEN f % 2 = 0 THEN
                           (doc_id*7919 + f*251 + y*131 + x*31) % 256
                           ELSE 0 END) AS BIGINT) AS sampled_luma
                FROM px GROUP BY doc_id
            )
            SELECT d.doc_id, d.w, d.h, d.nf AS n_frames,
                   s.sum_y, s.sum_u, s.sum_v,
                   (d.nf + 1) // 2 AS sampled_frames,
                   s.sampled_luma
            FROM dims d JOIN sums s USING (doc_id)
        """,
        "ann_topk_ivf_flat": corpusoracle.ann_topk_ivf_flat_sql(),
        "repetition_stats": corpusoracle.repetition_stats_sql(),
        "pii_counts": corpusoracle.pii_counts_sql(),
        "pii_redact": corpusoracle.pii_redact_sql(),
        "contamination_check": corpusoracle.contamination_sql(),
        "near_dup_clusters": corpusoracle.near_dup_clusters_sql(threshold=0.6),
        "jaccard_prefix_pairs": corpusoracle.jaccard_prefix_sql(t_num=1, t_den=2),
        "event_value_exact_quantiles": """
            SELECT 0.25::DOUBLE AS q, quantile_disc(value, 0.25) AS value FROM events
            UNION ALL
            SELECT 0.5::DOUBLE, quantile_disc(value, 0.5) FROM events
            UNION ALL
            SELECT 0.75::DOUBLE, quantile_disc(value, 0.75) FROM events
            UNION ALL
            SELECT 0.9::DOUBLE, quantile_disc(value, 0.9) FROM events
            UNION ALL
            SELECT 0.99::DOUBLE, quantile_disc(value, 0.99) FROM events
            ORDER BY q
        """,
        "extract_page_text": corpusoracle.extract_text_sql(),
        "boilerplate_stats": corpusoracle.boilerplate_stats_sql(),
        "user_day_streaks": """
            -- the day - row_number() island trick, integer epoch days
            WITH du AS (
                SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events
            ),
            isl AS (
                SELECT user_id,
                       day - row_number() OVER (PARTITION BY user_id
                                                ORDER BY day) AS grp
                FROM du
            ),
            st AS (SELECT user_id, grp, count(*) AS len
                   FROM isl GROUP BY 1, 2)
            SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                   max(len) AS longest_streak, count(*) AS n_streaks
            FROM st GROUP BY user_id
        """,
        "event_throttle": """
            -- state-dependent keep filter t_{i+1} = min{t >= t_i + T}
            -- as a recursive CTE; distinct times make it tie-free
            WITH RECURSIVE dt AS (
                SELECT DISTINCT user_id, event_type, epoch_us(ts) AS t
                FROM events
            ),
            kept(user_id, event_type, t) AS (
                SELECT user_id, event_type, min(t)
                FROM dt GROUP BY user_id, event_type
                UNION ALL
                SELECT k.user_id, k.event_type,
                       (SELECT min(d.t) FROM dt d
                        WHERE d.user_id = k.user_id
                          AND d.event_type = k.event_type
                          AND d.t >= k.t + 3600000000)
                FROM kept k
                WHERE (SELECT min(d.t) FROM dt d
                       WHERE d.user_id = k.user_id
                         AND d.event_type = k.event_type
                         AND d.t >= k.t + 3600000000) IS NOT NULL
            ),
            nt AS (SELECT user_id, event_type,
                          CAST(count(*) AS BIGINT) AS n_times
                   FROM dt GROUP BY user_id, event_type),
            nk AS (SELECT user_id, event_type,
                          CAST(count(*) AS BIGINT) AS n_kept
                   FROM kept GROUP BY user_id, event_type)
            SELECT nt.user_id, nt.event_type, nt.n_times, nk.n_kept
            FROM nt JOIN nk USING (user_id, event_type)
        """,
        "event_mad_by_type": """
            -- dependent two-stage robust statistic: median, then median
            -- of |v - median|; exact cents, quantile_cont interpolation
            WITH c AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            ),
            m AS (
                SELECT event_type, median(cents) AS med,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM c GROUP BY event_type
            ),
            d AS (
                SELECT c.event_type,
                       abs(CAST(c.cents AS DOUBLE) - m.med) AS dev
                FROM c JOIN m USING (event_type)
            ),
            md AS (SELECT event_type, median(dev) AS mad
                   FROM d GROUP BY event_type)
            SELECT m.event_type, m.n_events,
                   m.med / 100.0 AS median_value,
                   md.mad / 100.0 AS mad_value
            FROM m JOIN md USING (event_type)
        """,
        "embedding_gram": """
            -- d x d Gram matrix, upper triangle, exact int64 at 2^20
            -- half-up quantization (floor(x*2^20 + 0.5) on both engines)
            WITH x AS (
                SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                           * 1048576.0 + 0.5) AS BIGINT) AS q
                FROM embeddings
            )
            SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
                   CAST(sum(a.q * b.q) AS BIGINT) AS s
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        """,
        "event_twap": """
            -- piecewise-constant time integral: exact cents x exact
            -- integer-ms intervals, one terminal double division
            WITH e AS (
                SELECT user_id,
                       epoch_us(ts) AS t,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS nt
                FROM events
            ),
            iv AS (
                SELECT user_id, cents, (nt - t) // 1000 AS dt_ms
                FROM e WHERE nt IS NOT NULL
            )
            SELECT user_id,
                   CAST(sum(dt_ms) AS BIGINT) AS active_ms,
                   CAST(CAST(sum(cents * dt_ms) AS BIGINT) AS DOUBLE)
                     / CAST(CAST(sum(dt_ms) AS BIGINT) AS DOUBLE) / 100.0
                     AS twap
            FROM iv GROUP BY user_id HAVING sum(dt_ms) > 0
        """,
        "event_rising_triples": """
            -- order-3 sequential pattern over (ts, event_id) order;
            -- comparisons only, every user reported (0 allowed)
            WITH e AS (
                SELECT user_id, value,
                       lead(value, 1) OVER w AS v1,
                       lead(value, 2) OVER w AS v2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   CAST(count(*) FILTER (
                       WHERE value < v1 AND v1 < v2) AS BIGINT) AS n_triples
            FROM e GROUP BY user_id
        """,
        "length_gini_by_lang": """
            -- sorted-rank identity sum((2r-n-1)x): tie-group coefficient
            -- sums are order-invariant, so it equals the engine's
            -- histogram pairwise form sum_{i<j}|xi-xj|; one division
            WITH r AS (
                SELECT lang, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars) AS rn,
                       count(*) OVER (PARTITION BY lang) AS n,
                       sum(n_chars) OVER (PARTITION BY lang) AS t
                FROM documents
            )
            SELECT lang,
                   CAST(max(n) AS BIGINT) AS n_docs,
                   CAST(max(t) AS BIGINT) AS total_chars,
                   CAST(CAST(sum((2 * rn - n - 1) * n_chars) AS BIGINT) AS DOUBLE)
                     / CAST(CAST(max(n) AS BIGINT) * CAST(max(t) AS BIGINT) AS DOUBLE)
                     AS gini
            FROM r GROUP BY lang
        """,
        "doc_kcore": """
            -- k-core by synchronous peeling to a fixpoint: same hash
            -- point field as doc_dbscan, density-scaled eps^2 = 0.125/n,
            -- recursive rounds keep a node iff >= k of its neighbors
            -- survived the previous round; 64 rounds safely exceeds the
            -- measured fixpoint depth and extra rounds are no-ops
            WITH RECURSIVE base AS (
                SELECT doc_id,
                       (doc_id * 2654435761) % 4294967296 AS h,
                       ((doc_id % 97) * 2654435761) % 4294967296 AS hk
                FROM documents
            ),
            pt AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 = 7
                            THEN CAST(h % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                            ELSE CAST(hk % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                 + (CAST(h % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                    - CAST(0.5 AS DOUBLE)) * CAST(0.02 AS DOUBLE)
                       END AS x,
                       CASE WHEN doc_id % 10 = 7
                            THEN CAST((h // 65536) % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                            ELSE CAST((hk // 65536) % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                 + (CAST((h // 65536) % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                    - CAST(0.5 AS DOUBLE)) * CAST(0.02 AS DOUBLE)
                       END AS y
                FROM base
            ),
            par AS (
                SELECT sqrt(0.125 / CAST(count(*) AS DOUBLE)) AS eps,
                       0.125 / CAST(count(*) AS DOUBLE) AS e2
                FROM documents
            ),
            cells AS (
                SELECT doc_id, x, y,
                       CAST(floor((x + CAST(1 AS DOUBLE)) / par.eps) AS BIGINT) AS cx,
                       CAST(floor((y + CAST(1 AS DOUBLE)) / par.eps) AS BIGINT) AS cy
                FROM pt, par
            ),
            o AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                        (0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy)),
            pairs AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM cells a CROSS JOIN o
                JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
                CROSS JOIN par
                WHERE a.doc_id < b.doc_id
                  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                      < par.e2
            ),
            sym AS (SELECT ia AS u, ib AS v FROM pairs
                    UNION ALL SELECT ib, ia FROM pairs),
            alive(node, r) AS (
                SELECT doc_id, 0 FROM documents
                UNION
                SELECT a.node, a.r + 1 FROM alive a
                WHERE a.r < 64
                  AND (SELECT count(*) FROM sym s
                       JOIN alive b ON b.node = s.v AND b.r = a.r
                       WHERE s.u = a.node) >= 4
            ),
            core AS (SELECT node FROM alive GROUP BY node
                     HAVING max(r) = 64)
            SELECT s.u AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
            FROM sym s
            JOIN core c1 ON c1.node = s.u
            JOIN core c2 ON c2.node = s.v
            GROUP BY s.u
        """,
        "doc_dbscan": """
            -- full DBSCAN recompute: same hash point field (one IEEE
            -- expression tree), eps-grid pair join, recursive min-label
            -- components over the core-core graph, min-core-label borders
            WITH base AS (
                SELECT doc_id,
                       (doc_id * 2654435761) % 4294967296 AS h,
                       ((doc_id % 97) * 2654435761) % 4294967296 AS hk
                FROM documents
            ),
            pt AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 = 7
                            THEN CAST(h % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                            ELSE CAST(hk % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                 + (CAST(h % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                    - CAST(0.5 AS DOUBLE)) * CAST(0.02 AS DOUBLE)
                       END AS x,
                       CASE WHEN doc_id % 10 = 7
                            THEN CAST((h // 65536) % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                            ELSE CAST((hk // 65536) % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                 + (CAST((h // 65536) % 65536 AS DOUBLE) / CAST(65536 AS DOUBLE)
                                    - CAST(0.5 AS DOUBLE)) * CAST(0.02 AS DOUBLE)
                       END AS y
                FROM base
            ),
            cells AS (
                SELECT doc_id, x, y,
                       CAST(floor((x + CAST(1 AS DOUBLE)) / CAST(0.005 AS DOUBLE)) AS BIGINT) AS cx,
                       CAST(floor((y + CAST(1 AS DOUBLE)) / CAST(0.005 AS DOUBLE)) AS BIGINT) AS cy
                FROM pt
            ),
            o AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                        (0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy)),
            pairs AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM cells a CROSS JOIN o
                JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
                WHERE a.doc_id < b.doc_id
                  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                      < CAST(0.005 AS DOUBLE) * CAST(0.005 AS DOUBLE)
            ),
            sym AS (SELECT ia AS u, ib AS v FROM pairs
                    UNION ALL SELECT ib, ia FROM pairs),
            core AS (SELECT u AS doc_id FROM sym GROUP BY u
                     HAVING count(*) + 1 >= 4),
            ce AS (SELECT s.u, s.v FROM sym s
                   JOIN core c1 ON c1.doc_id = s.u
                   JOIN core c2 ON c2.doc_id = s.v),
            comp AS (
                WITH RECURSIVE w(node, lab) AS (
                    SELECT doc_id, doc_id FROM core
                    UNION
                    SELECT e.v, w.lab FROM w JOIN ce e ON e.u = w.node
                )
                SELECT node, min(lab) AS label FROM w GROUP BY node
            ),
            border AS (
                SELECT s.u AS doc_id, min(c.label) AS label
                FROM sym s JOIN comp c ON c.node = s.v
                WHERE s.u NOT IN (SELECT doc_id FROM core)
                GROUP BY s.u
            )
            SELECT d.doc_id,
                   coalesce(cm.label, b.label, -1) AS label,
                   CASE WHEN cm.label IS NOT NULL THEN 'core'
                        WHEN b.label IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS kind
            FROM documents d
            LEFT JOIN comp cm ON cm.node = d.doc_id
            LEFT JOIN border b ON b.doc_id = d.doc_id
        """,
        "user_daily_locf": """
            -- calendar densification + IGNORE-NULLS window carry; same
            -- integer epoch-day / cents arithmetic as the engine
            WITH obs AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                            AS BIGINT) AS cents
                FROM events GROUP BY 1, 2
            ),
            span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                     FROM obs GROUP BY 1),
            grid AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day
                     FROM span)
            SELECT g.user_id, g.day,
                   last_value(o.cents IGNORE NULLS) OVER w AS cents,
                   o.day IS NOT NULL AS observed,
                   g.day - last_value(o.day IGNORE NULLS) OVER w AS stale_days
            FROM grid g LEFT JOIN obs o USING (user_id, day)
            WINDOW w AS (PARTITION BY g.user_id ORDER BY g.day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "users_all_event_types": """
            -- relational division: per-user distinct-type count equals the
            -- corpus-wide distinct-type count
            SELECT user_id, count(*) AS n_events
            FROM events
            GROUP BY user_id
            HAVING count(DISTINCT event_type)
                   = (SELECT count(DISTINCT event_type) FROM events)
        """,
        "campaign_peak_concurrency": """
            -- sweep-line mirror: -1 before +1 at equal t (half-open
            -- windows); peak_t is the earliest instant achieving the peak
            WITH c AS (
                SELECT 1704067200000000 + (o_orderkey % 43200) * 60000000 AS lo_us,
                       1704067200000000 + (o_orderkey % 43200) * 60000000
                         + (15 + (o_orderkey % 61)) * 60000000 AS hi_us
                FROM orders
            ),
            pts AS (
                SELECT lo_us AS t, 1 AS d FROM c
                UNION ALL
                SELECT hi_us AS t, -1 AS d FROM c
            ),
            cum AS (
                SELECT t, sum(d) OVER (ORDER BY t, d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
                FROM pts
            )
            SELECT CAST((SELECT max(s) FROM cum) AS BIGINT) AS peak,
                   (SELECT min(t) FROM cum
                     WHERE s = (SELECT max(s) FROM cum)) AS peak_t_us
        """,
        "rolling_uniques_7d": """
            -- trailing-7-day distinct users per existing day; same integer
            -- epoch-day arithmetic as the engine
            WITH du AS (
                SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
                FROM events
            ),
            days AS (SELECT DISTINCT day FROM du)
            SELECT d.day, count(DISTINCT u.user_id) AS uniques7
            FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        """,
        "edit_distance_pairs": """
            -- same (lang, n_chars) blocking + truncation; DuckDB's native
            -- levenshtein is unit-cost like the engine's batched DP
            WITH d AS (SELECT doc_id, lang, n_chars,
                              substr(text, 1, 256) AS t
                       FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
            FROM d a JOIN d b
              ON a.lang = b.lang AND a.n_chars = b.n_chars
             AND a.doc_id < b.doc_id
        """,
        "incremental_view_update": """
            -- the ORACLE recomputes the view from the NEW snapshot directly;
            -- the engine reaches the same state by applying only the delta
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars + CASE WHEN doc_id % 7 = 3
                                           THEN 1 ELSE 0 END) AS BIGINT)
                     AS total_chars
            FROM documents WHERE doc_id % 10 <> 1
            GROUP BY lang
        """,
        "docs_skyline": """
            -- same per-x min + strict running-min-over-larger-x formulation
            -- as the engine kernel (O(n log n), integer compares)
            WITH d AS (
                SELECT doc_id, n_chars,
                       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens
                FROM documents
            ),
            x AS (SELECT n_chars, min(n_ws_tokens) AS ymin
                  FROM d GROUP BY n_chars),
            f AS (SELECT n_chars, ymin,
                         min(ymin) OVER (ORDER BY n_chars DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS pm
                  FROM x)
            SELECT d.doc_id, d.n_chars, d.n_ws_tokens
            FROM d JOIN f USING (n_chars)
            WHERE d.n_ws_tokens = f.ymin AND (f.pm IS NULL OR f.ymin < f.pm)
        """,
        "events_campaign_join": """
            -- same integer epoch-us arithmetic as the engine; value summed
            -- in exact int64 cents, ONE terminal double division
            WITH c AS (
                SELECT o_orderkey AS campaign_id,
                       1704067200000000 + (o_orderkey % 43200) * 60000000 AS lo_us,
                       1704067200000000 + (o_orderkey % 43200) * 60000000
                         + (15 + (o_orderkey % 61)) * 60000000 AS hi_us
                FROM orders
            ),
            e AS (
                SELECT epoch_us(ts) AS ts_us,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT c.campaign_id,
                   count(*) AS n_events,
                   CAST(sum(e.cents) AS DOUBLE) / 100.0 AS total_value
            FROM c JOIN e ON e.ts_us >= c.lo_us AND e.ts_us < c.hi_us
            GROUP BY c.campaign_id
        """,
        "q1_pricing_summary": """
            -- exact int64 cents until one terminal double division: bit-equal
            -- to the engine under any reduction order (see q1_pricing_summary)
            WITH u AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(l_quantity AS BIGINT) AS qty_i,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS disc_tt
                FROM lineitem
                WHERE l_shipdate <= TIMESTAMP '2001-09-02'
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(qty_i) AS DOUBLE) AS sum_qty,
                   CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_base_price,
                   CAST(sum(disc_tt) AS DOUBLE) / 10000.0 AS sum_disc_price,
                   CAST(sum(qty_i) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(sum(cents) AS DOUBLE) / (count(*) * 100) AS avg_price,
                   count(*) AS count_order
            FROM u
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(o_totalprice), 4) AS total_revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_parts_by_revenue": """
            WITH per_part AS (
                SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS part_revenue
                FROM lineitem GROUP BY l_partkey
            )
            SELECT l_partkey, p_name, part_revenue
            FROM per_part JOIN part ON l_partkey = p_partkey
            ORDER BY part_revenue DESC, l_partkey
            LIMIT 10
        """,
        "events_tumbling": """
            SELECT user_id,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY user_id, (epoch_us(ts) // 3600000000) * 3600000000
        """,
        "events_sliding": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
            x AS (
                SELECT user_id, (us // 1800000000 - k.k) * 1800000000 AS window_start_us, value
                FROM e CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k
            )
            SELECT user_id, window_start_us,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM x GROUP BY user_id, window_start_us
        """,
        "stratified_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 % 10000
                  < CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 5000
                              WHEN 'fr' THEN 5000 WHEN 'es' THEN 7500
                              ELSE 10000 END
        """,
        "lang_length_quantiles": """
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(n_chars, 0.25), 4) AS p25,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90,
                   round(quantile_cont(n_chars, 0.99), 4) AS p99
            FROM documents GROUP BY lang
        """,
        "events_asof_clicks": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
                       FROM events),
            c AS (SELECT user_id, ts_us, max(event_id) AS click_id
                  FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
            SELECT e.event_id, e.user_id, e.ts_us,
                   coalesce(c.click_id, -1) AS last_click_id,
                   coalesce(e.ts_us - c.ts_us, -1) AS since_click_us
            FROM e ASOF LEFT JOIN c
              ON e.user_id = c.user_id AND e.ts_us >= c.ts_us
        """,
        "events_sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
            m AS (
                SELECT user_id, us, value,
                       CASE WHEN lag(us) OVER w IS NULL
                              OR us - lag(us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
            ),
            s AS (
                SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                                              ROWS UNBOUNDED PRECEDING) AS sid
                FROM m
            )
            SELECT user_id,
                   min(us) AS session_start_us,
                   max(us) AS session_end_us,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "text_stats": _TEXT_STATS,
        "quality_scores": f"""
            WITH t AS ({_TEXT_STATS})
            SELECT doc_id,
                   0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                 + 0.3 * least(stopword_ratio * 5.0, 1.0)
                 + 0.2 * (1.0 - least(punct_ratio * 10.0, 1.0)) AS quality_score
            FROM t
        """,
        "langid": """
            WITH c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\b(the|and|of|to|in)\\b')) AS c_en,
                       len(regexp_extract_all(text, '\\b(der|die|und|das|ist)\\b')) AS c_de,
                       len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')) AS c_fr,
                       len(regexp_extract_all(text, '\\b(el|los|las|una|es)\\b')) AS c_es
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'und'
                        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                        WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                        WHEN c_fr >= c_es THEN 'fr'
                        ELSE 'es' END AS lang_pred,
                   c_en, c_de, c_fr, c_es
            FROM c
        """,
        "exact_dedup": """
            SELECT doc_id, text, lang FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        """,
        "doc_geocode": f"""
            WITH g AS ({_GEO})
            SELECT doc_id,
                   CAST(11.54 AS DOUBLE) + fx * (CAST(11.62 AS DOUBLE) - CAST(11.54 AS DOUBLE)) AS lon,
                   CAST(48.12 AS DOUBLE) + fy * (CAST(48.18 AS DOUBLE) - CAST(48.12 AS DOUBLE)) AS lat,
                   CAST(floor(fx * 64) AS BIGINT) AS ix,
                   CAST(floor(fy * 64) AS BIGINT) AS iy
            FROM g
        """,
        "doc_cell_counts": f"""
            WITH g AS ({_GEO})
            SELECT CAST(floor(fx * 64) AS BIGINT) AS ix,
                   CAST(floor(fy * 64) AS BIGINT) AS iy,
                   count(*) AS n_docs
            FROM g GROUP BY 1, 2
        """,
        "ann_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       CAST((SELECT embedding FROM embeddings WHERE vec_id = 0) AS DOUBLE[])), 6) AS sim
            FROM embeddings
            ORDER BY list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       CAST((SELECT embedding FROM embeddings WHERE vec_id = 0) AS DOUBLE[])) DESC,
                     vec_id
            LIMIT 10
        """,
        "supplier_part_stats": """
            -- avg mirrored via exact int64 cents + integer half-up to 4dp
            -- (float partial-sum order differs between engines)
            SELECT n_name,
                   count(*) AS n_items,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty,
                   CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         * 200 + count(*)) // (2 * count(*)) AS BIGINT)
                       / 10000.0 AS avg_price
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "orders_by_month": """
            SELECT CAST(year(o_orderdate) AS BIGINT) * 100 + month(o_orderdate) AS order_month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS revenue
            FROM orders
            GROUP BY 1
        """,
        "docs_by_lang": """
            SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "daily_active_users": """
            WITH per AS (
                SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
                       user_id,
                       max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked
                FROM events GROUP BY 1, 2
            )
            SELECT day_us,
                   count(*) AS n_users,
                   count(*) FILTER (WHERE clicked = 1) AS n_clicking_users
            FROM per GROUP BY day_us
        """,
        "doc_cell_counts_salted": f"""
            WITH g AS ({_GEO})
            SELECT CAST(floor(fx * 64) AS BIGINT) AS ix,
                   CAST(floor(fy * 64) AS BIGINT) AS iy,
                   count(*) AS n_docs
            FROM g GROUP BY 1, 2
        """,
        "latest_page_per_site": """
            WITH p AS (
                SELECT doc_id, doc_id % 97 AS site,
                       'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
                       1600000000000000 + doc_id * 1000000 AS warc_ts_us
                FROM documents
            ),
            r AS (SELECT *, row_number() OVER (PARTITION BY site
                                               ORDER BY warc_ts_us DESC) AS rn FROM p)
            SELECT site, doc_id, url, warc_ts_us FROM r WHERE rn = 1
        """,
        "crawl_delta": f"""
            -- CDC snapshot diff: OLD/NEW derived from documents; NEW's
            -- changed docs continue the FNV hash one step (h ^ 126) * prime
            WITH h AS (
                SELECT doc_id, ({corpusoracle.fnv_expr('text')}) AS h0
                FROM documents
            ),
            old AS (SELECT doc_id, h0 AS h FROM h WHERE doc_id % 10 <> 0),
            new AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 3
                            THEN (xor(h0, 126::HUGEINT) * 1099511628211)
                                 % 18446744073709551616::HUGEINT
                            ELSE h0 END AS h
                FROM h WHERE doc_id % 10 <> 1
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.h <> n.h THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM old o FULL OUTER JOIN new n USING (doc_id)
        """,
        "top_tokens": """
            WITH toks AS (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                FROM documents WHERE length(trim(text)) > 0
            )
            SELECT token, count(*) AS n FROM toks WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token LIMIT 50
        """,
        "top_bigrams": """
            WITH toks AS (
                SELECT regexp_split_to_array(trim(text), '\\s+') AS l
                FROM documents WHERE length(trim(text)) > 0
            ),
            b AS (
                SELECT unnest(l[1:len(l)-1]) AS t1, unnest(l[2:len(l)]) AS t2
                FROM toks WHERE len(l) >= 2
            )
            SELECT t1 || ' ' || t2 AS bigram, count(*) AS n FROM b
            GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50
        """,
        "embedding_centroids": """
            SELECT label, dim, round(avg(e), 4) AS centroid
            FROM (SELECT label, unnest(embedding) AS e,
                         unnest(range(len(embedding))) AS dim
                  FROM embeddings)
            GROUP BY label, dim
        """,
        "length_filter_p90": """
            SELECT doc_id, n_chars FROM documents
            WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.9) FROM documents)
        """,
        "q3_shipping_priority": """
            -- exact int64 ten-thousandths, integer half-up cent rounding
            -- (same expression tree as the engine)
            SELECT o_orderkey,
                   CAST((CAST(sum(CAST(round(l_extendedprice
                           * (1 - l_discount) * 10000) AS BIGINT))
                         AS BIGINT) + 50) // 100 AS DOUBLE) / 100.0
                     AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                * 10000) AS BIGINT)) DESC, o_orderkey LIMIT 10
        """,
        "event_zscore_outliers": """
            WITH s AS (
                SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
                FROM events GROUP BY event_type
            )
            SELECT e.event_id, e.event_type,
                   round(e.value, 4) AS value,
                   round((e.value - s.m) / s.sd, 4) AS zscore
            FROM events e JOIN s USING (event_type)
            WHERE abs(e.value - s.m) > 3 * s.sd
        """,
        "tfidf_top_terms": """
            WITH tf AS (
                SELECT doc_id, token, count(*) AS tf
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                      FROM documents WHERE length(trim(text)) > 0)
                GROUP BY doc_id, token
            ),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT doc_id, token, tf,
                       count(*) OVER (PARTITION BY token) AS df,
                       round(tf * ln(n.n / (count(*) OVER (PARTITION BY token))), 4)
                           AS tfidf
                FROM tf, n
            )
            SELECT doc_id, token, tf, CAST(df AS BIGINT) AS df, tfidf FROM scored
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) = 1
        """,
        "lm_perplexity": """
            -- bigram-LM NLL; surprisal quantized to integer micro-nats
            -- (floor of one ln of one int/int division) so the per-doc sum
            -- is exact-integer and order-free on both engines
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
                FROM documents WHERE length(trim(text)) > 0
            ),
            b AS (
                SELECT doc_id, unnest(l[1:len(l)-1]) AS lhs,
                       unnest(l[1:len(l)-1]) || ' ' || unnest(l[2:len(l)]) AS bigram
                FROM toks WHERE len(l) >= 2
            ),
            tf AS (
                SELECT doc_id, lhs, bigram, count(*) AS tf
                FROM b GROUP BY doc_id, lhs, bigram
            ),
            scored AS (
                SELECT doc_id, tf,
                       CAST(floor(ln(
                           CAST(sum(tf) OVER (PARTITION BY bigram) AS DOUBLE)
                           / CAST(sum(tf) OVER (PARTITION BY lhs) AS DOUBLE)
                       ) * 1e6) AS BIGINT) AS q
                FROM tf
            )
            SELECT doc_id,
                   CAST(sum(tf) AS BIGINT) AS n_bigrams,
                   CAST(-sum(tf * q) AS BIGINT) AS nll_micro,
                   CAST(CAST(-sum(tf * q) AS BIGINT) AS DOUBLE)
                       / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) / 1e6 AS avg_nll
            FROM scored GROUP BY doc_id
        """,
        "q18_large_orders": """
            WITH big AS (
                SELECT l_orderkey, sum(l_quantity) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250.0
            )
            SELECT o.o_orderkey, c.c_name,
                   round(o.o_totalprice, 2) AS o_totalprice,
                   round(big.total_qty, 4) AS total_qty
            FROM orders o
            JOIN big ON o.o_orderkey = big.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "sample_bottomk": f"""
            SELECT doc_id, lang, n_chars
            FROM documents
            ORDER BY ({corpusoracle.fnv_expr(
                "lpad(CAST(doc_id AS VARCHAR), 12, '0')"
                " || reverse(lpad(CAST(doc_id AS VARCHAR), 12, '0'))")}), doc_id
            LIMIT 200
        """,
        "corpus_prep": f"""
            WITH t AS ({_TEXT_STATS}),
            q AS (
                SELECT d.doc_id, d.text, d.lang
                FROM documents d JOIN t ON t.doc_id = d.doc_id
                WHERE 0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                    + 0.3 * least(stopword_ratio * 5.0, 1.0)
                    + 0.2 * (1.0 - least(punct_ratio * 10.0, 1.0)) >= 0.5
            ),
            dd AS (
                SELECT doc_id, text, lang FROM q
                WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY text)
            ),
            mx AS (
                SELECT doc_id, text FROM dd
                WHERE ({corpusoracle.fnv_expr(
                    "lpad(CAST(doc_id AS VARCHAR), 12, '0')"
                    " || reverse(lpad(CAST(doc_id AS VARCHAR), 12, '0'))")}) % 4096
                      < CASE lang WHEN 'en' THEN 2048
                                  WHEN 'de' THEN 1024 ELSE 410 END
            ),
            tok AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS t
                FROM mx
            ),
            c AS (
                SELECT t,
                       sum(t) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - t AS excl
                FROM tok
            )
            -- CAST every aggregate-derived column to BIGINT: HUGEINT
            -- window/group sums render as float64 in pandas, and the
            -- driver's value-hash is representation-sensitive (the q12
            -- round-2 lesson)
            SELECT CAST(excl // 2048 AS BIGINT) AS pack_id,
                   count(*) AS n_docs,
                   CAST(sum(t) AS BIGINT) AS total_tokens
            FROM c GROUP BY 1
        """,
        "dup_passages": corpusoracle.dup_passages_sql(),
        "doc_chunks": f"""
            WITH base AS (
                SELECT doc_id, text, length(text) AS L,
                       (CASE WHEN length(text) > 200
                             THEN (length(text) - 200 + 150 - 1) // 150
                             ELSE 0 END) + 1 AS nc
                FROM documents
            ),
            ch AS (
                SELECT doc_id, nc, L, unnest(range(nc)) AS ci,
                       unnest([substring(text, i * 150 + 1, 200)
                               for i in range(nc)]) AS ct
                FROM base
            )
            SELECT doc_id, ci AS chunk_idx, nc AS n_chunks,
                   length(ct) AS chunk_len,
                   CAST(({corpusoracle.fnv_expr('ct')}) AS UBIGINT) AS chunk_hash
            FROM ch
        """,
        "train_shuffle": corpusoracle.train_shuffle_sql(),
        "weighted_sample": f"""
            SELECT doc_id, lang, n_chars,
                   CAST(({corpusoracle.fnv_expr(
                "lpad(CAST(doc_id AS VARCHAR), 12, '0')"
                " || reverse(lpad(CAST(doc_id AS VARCHAR), 12, '0'))")})
                        % 9007199254740992 AS DOUBLE) / n_chars AS wkey
            FROM documents
            ORDER BY wkey, doc_id
            LIMIT 200
        """,
        "cell_kde": f"""
            WITH g AS ({_GEO}),
            c AS (SELECT CAST(floor(fx * 64) AS BIGINT) AS ix,
                         CAST(floor(fy * 64) AS BIGINT) AS iy,
                         count(*) AS n_docs
                  FROM g GROUP BY 1, 2),
            contrib AS (
              SELECT c.ix + dx.d AS tx, c.iy + dy.d AS ty,
                     c.n_docs * (CASE WHEN dx.d = 0 AND dy.d = 0 THEN 4
                                      WHEN dx.d = 0 OR dy.d = 0 THEN 2
                                      ELSE 1 END) AS wv
              FROM c, (VALUES (-1), (0), (1)) dx(d),
                      (VALUES (-1), (0), (1)) dy(d)
            ),
            sm AS (SELECT tx, ty, CAST(sum(wv) AS BIGINT) AS kde16
                   FROM contrib GROUP BY tx, ty)
            SELECT c.ix, c.iy, c.n_docs, sm.kde16
            FROM c JOIN sm ON sm.tx = c.ix AND sm.ty = c.iy
        """,
        "dau_retention": """
            WITH inc AS (
                SELECT DISTINCT user_id,
                       (epoch_us(ts) // 86400000000) * 86400000000 AS day_us
                FROM events
            )
            SELECT a.day_us, count(*) AS n_active,
                   count(b.user_id) AS n_retained
            FROM inc a
            LEFT JOIN inc b ON a.user_id = b.user_id
                           AND b.day_us = a.day_us + 86400000000
            GROUP BY a.day_us
        """,
        "event_value_quantiles_hist": """
            WITH mm AS (SELECT event_type, min(value) AS lo, max(value) AS hi
                        FROM events GROUP BY 1),
            b AS (SELECT e.event_type,
                         LEAST(CAST(floor((e.value - mm.lo)
                               / ((mm.hi - mm.lo) / 64.0)) AS BIGINT), 63) AS bin,
                         count(*) AS n
                  FROM events e JOIN mm ON e.event_type = mm.event_type
                  GROUP BY 1, 2),
            c AS (SELECT event_type, bin, n,
                         sum(n) OVER (PARTITION BY event_type
                                      ORDER BY bin) AS cum,
                         sum(n) OVER (PARTITION BY event_type) AS tot
                  FROM b)
            SELECT c.event_type,
                   round(mm.lo + ((mm.hi - mm.lo) / 64.0)
                         * min(CASE WHEN cum >= 0.5 * tot THEN bin END), 6)
                       AS p50_est,
                   round(mm.lo + ((mm.hi - mm.lo) / 64.0)
                         * min(CASE WHEN cum >= 0.95 * tot THEN bin END), 6)
                       AS p95_est
            FROM c JOIN mm ON c.event_type = mm.event_type
            GROUP BY c.event_type, mm.lo, mm.hi
        """,
        "q10_returned_items": """
            -- exact int64 ten-thousandths (2dp price x 2dp discount), so
            -- sums are order-free; terminal cent rounding is integer
            -- half-up, the same expression tree as the engine
            WITH r AS (
                SELECT o_custkey AS ck,
                       CAST(sum(CAST(round(l_extendedprice
                           * (1 - l_discount) * 10000) AS BIGINT))
                         AS BIGINT) AS tt
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                GROUP BY o_custkey
            )
            SELECT c_custkey, c_name,
                   CAST((tt + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
                   c_acctbal
            FROM r JOIN customer ON ck = c_custkey
            ORDER BY tt DESC, c_custkey
            LIMIT 20
        """,
        "q14_promo_revenue": """
            -- revenue mirrored in exact int64 ten-thousandths (2dp price ×
            -- 2dp discount), same expression tree as the engine combiner
            SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN CAST(round(l_extendedprice * (1 - l_discount)
                                              * 10000) AS BIGINT)
                              ELSE 0 END)
                         / sum(CAST(round(l_extendedprice * (1 - l_discount)
                                          * 10000) AS BIGINT)), 4)
                       AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1995-09-01'
              AND l_shipdate < TIMESTAMP '1995-10-01'
        """,
        "q19_discounted_revenue": """
            -- revenue mirrored in exact int64 ten-thousandths with integer
            -- half-up cent rounding, same expression tree as the engine
            SELECT CAST((sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 10000) AS BIGINT)) + 50) // 100
                        AS BIGINT) / 100.0 AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q7_volume_shipping": """
            SELECT supp_region, cust_region, l_year,
                   CAST((sum(rev) + 50) // 100 AS BIGINT) / 100.0 AS revenue
            FROM (
                SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
                       year(l_shipdate) AS l_year,
                       CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT) AS rev
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
                JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                WHERE ((r1.r_name = 'AMERICA' AND r2.r_name = 'EUROPE')
                       OR (r1.r_name = 'EUROPE' AND r2.r_name = 'AMERICA'))
                  AND l_shipdate >= TIMESTAMP '1995-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
            ) GROUP BY supp_region, cust_region, l_year
            ORDER BY supp_region, cust_region, l_year
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT JOIN orders
                    ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
                  GROUP BY c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN r ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM r)
            ORDER BY s_suppkey
        """,
        "events_horizon_counts": """
            SELECT a.event_id, count(b.event_id) AS n_follow
            FROM events a LEFT JOIN events b
              ON b.user_id = a.user_id AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL 86400 SECOND
            GROUP BY a.event_id ORDER BY a.event_id
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(CAST(round(l_extendedprice * l_discount * 10000)
                                  AS BIGINT)) / 10000.0, 4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01'
              AND l_shipdate < DATE '1996-01-01'
              AND CAST(round(l_discount * 100) AS INTEGER) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "q8_market_share": """
            WITH vol AS (
                SELECT year(o_orderdate) AS o_year,
                       CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT) AS rev,
                       sn.n_name AS supp_nation
                FROM lineitem
                JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation sn ON sn.n_nationkey = s_nationkey
                JOIN orders ON o_orderkey = l_orderkey
                 AND o_orderdate >= DATE '1995-01-01'
                 AND o_orderdate < DATE '1997-01-01'
                JOIN customer ON c_custkey = o_custkey
                JOIN nation cn ON cn.n_nationkey = c_nationkey
                JOIN region ON r_regionkey = cn.n_regionkey
                 AND r_name = 'AMERICA'
            )
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'BRAZIL' THEN rev
                                  ELSE 0 END) / sum(rev), 6) AS mkt_share
            FROM vol GROUP BY o_year ORDER BY o_year
        """,
        "q21_waiting_suppliers": """
            SELECT s_name, count(*) AS numwait
            FROM supplier, lineitem l1, orders
            WHERE s_suppkey = l1.l_suppkey
              AND o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F'
              AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY s_name ORDER BY numwait DESC, s_name
        """,
        "q2_min_cost_supplier": """
            WITH pairs AS (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS unit_cost
                FROM lineitem
                JOIN part ON p_partkey = l_partkey AND p_size = 15
                GROUP BY 1, 2
            ), epairs AS (
                SELECT s_acctbal, s_name, n_name, l_partkey, unit_cost
                FROM pairs
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
            )
            SELECT s_acctbal, s_name, n_name, l_partkey, unit_cost
            FROM epairs e
            WHERE unit_cost = (SELECT min(unit_cost) FROM epairs e2
                               WHERE e2.l_partkey = e.l_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, l_partkey
            LIMIT 100
        """,
        "q9_product_type_profit": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 10000) AS BIGINT)) / 10000.0, 4)
                       AS sum_profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            GROUP BY 1, 2 ORDER BY nation, o_year DESC
        """,
        "q11_important_parts": """
            WITH val AS (
                SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 10000) AS BIGINT)) AS v
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
                GROUP BY 1
            )
            SELECT l_partkey, round(v / 10000.0, 4) AS value
            FROM val
            WHERE 2 * v * (SELECT count(*) FROM val)
                  > 3 * (SELECT sum(v) FROM val)
            ORDER BY value DESC, l_partkey
        """,
        "q16_parts_supplier_counts": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "salted_enrich_events": """
            SELECT event_id, user_id, event_type, c_mktsegment, value
            FROM events JOIN customer ON user_id = c_custkey
        """,
        "fingerprint_clusters": f"""
            -- OpenRefine key-collision method: sorted distinct lowercase
            -- tokens -> canonical string -> same codepoint-FNV
            WITH f AS (
                SELECT doc_id,
                       ({corpusoracle.fnv_expr(
                           "array_to_string(list_sort(list_distinct("
                           "string_split(lower(text), ' '))), ' ')")}) AS fp,
                       ({corpusoracle.fnv_expr('text')}) AS th
                FROM documents
            )
            SELECT CAST(fp AS UBIGINT) AS fp_h,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   min(doc_id) AS rep_doc_id,
                   CAST(count(DISTINCT th) AS BIGINT) AS n_texts
            FROM f GROUP BY fp HAVING count(*) >= 2
        """,
        "event_chain_scan": f"""
            -- closed-form evaluation of the chain recurrence
            -- h_i = (a·h_(i-1) + x_i) mod 2^64: h_i = a^i · (Σ_(j<=i)
            -- x_j·a^(-j)) mod 2^64, per-row powmods expanded by
            -- bit-decomposition into UHUGEINT mulmod chains — a genuinely
            -- different strategy than the engine's two-phase scan
            WITH e AS (
                SELECT event_id,
                       CAST(CAST(round(value * 100) AS BIGINT) AS UHUGEINT)
                         AS x,
                       row_number() OVER (ORDER BY ts, event_id) AS i
                FROM events
            ),
            t AS (
                SELECT event_id, i,
                       CAST({corpusoracle.mulmod_expr(
                           'x', corpusoracle.powmod_expr(13877824140714322085, 'i'))}
                            AS HUGEINT) AS term
                FROM e
            ),
            s AS (
                SELECT event_id, i,
                       sum(term) OVER (ORDER BY i
                                       ROWS UNBOUNDED PRECEDING) AS cs
                FROM t
            )
            SELECT i AS idx, event_id,
                   CAST({corpusoracle.mulmod_expr(
                       corpusoracle.powmod_expr(6364136223846793005, 'i'),
                       'CAST(cs AS UHUGEINT) % ' + "CAST('18446744073709551616' AS UHUGEINT)")}
                        AS UBIGINT) AS h
            FROM s
            WHERE i % 500 = 0 OR i = (SELECT count(*) FROM events)
        """,
        "daily_balance_total": """
            -- semi-additive: carry each user's last reading to the GLOBAL
            -- horizon, sum across users per day
            WITH e AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                       epoch_us(ts) AS t, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            ),
            lastr AS (
                SELECT user_id, day, cents FROM (
                    SELECT user_id, day, cents, row_number() OVER (
                        PARTITION BY user_id, day
                        ORDER BY t DESC, event_id DESC) AS rn
                    FROM e)
                WHERE rn = 1
            ),
            us AS (SELECT user_id, min(day) AS ud0 FROM e GROUP BY 1),
            grid AS (SELECT user_id,
                            unnest(range(ud0,
                                (SELECT max(day) FROM e) + 1)) AS day
                     FROM us),
            c AS (SELECT g.user_id, g.day,
                         last_value(l.cents IGNORE NULLS) OVER (
                             PARTITION BY g.user_id ORDER BY g.day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS bal
                  FROM grid g LEFT JOIN lastr l USING (user_id, day))
            SELECT day, CAST(sum(bal) AS BIGINT) AS total_cents,
                   count(*) AS n_users,
                   (CAST(sum(bal) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                     / 100.0 AS avg_balance
            FROM c GROUP BY day
        """,
        "lang_length_ks": """
            -- exact KS via the integer-numerator identity:
            -- D = max_v |cum_a*n_b - cum_b*n_a| / (n_a*n_b)
            WITH h AS (SELECT lang, n_chars AS v, count(*) AS c
                       FROM documents GROUP BY 1, 2),
            n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
            pairs AS (SELECT a.lang AS la, b.lang AS lb
                      FROM n a JOIN n b ON a.lang < b.lang),
            j AS (SELECT p.la, p.lb, h.v,
                         CASE WHEN h.lang = p.la THEN h.c ELSE 0 END AS ca,
                         CASE WHEN h.lang = p.lb THEN h.c ELSE 0 END AS cb
                  FROM pairs p JOIN h ON h.lang = p.la OR h.lang = p.lb),
            g AS (SELECT la, lb, v, sum(ca) AS ca, sum(cb) AS cb
                  FROM j GROUP BY 1, 2, 3),
            w AS (SELECT la, lb, v,
                         sum(ca) OVER (PARTITION BY la, lb ORDER BY v)
                           AS cum_a,
                         sum(cb) OVER (PARTITION BY la, lb ORDER BY v)
                           AS cum_b
                  FROM g),
            d AS (SELECT w.la, w.lb, v,
                         abs(cum_a * nb.n - cum_b * na.n) AS dn
                  FROM w JOIN n na ON na.lang = w.la
                         JOIN n nb ON nb.lang = w.lb),
            mx AS (SELECT la, lb, max(dn) AS d_num FROM d GROUP BY 1, 2),
            am AS (SELECT d.la, d.lb, min(v) AS v_at
                   FROM d JOIN mx ON mx.la = d.la AND mx.lb = d.lb
                                 AND d.dn = mx.d_num
                   GROUP BY 1, 2)
            SELECT mx.la, mx.lb, na.n AS n_a, nb.n AS n_b,
                   CAST(mx.d_num AS BIGINT) AS d_num, am.v_at,
                   CAST(mx.d_num AS DOUBLE)
                     / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS ks
            FROM mx
            JOIN am ON am.la = mx.la AND am.lb = mx.lb
            JOIN n na ON na.lang = mx.la
            JOIN n nb ON nb.lang = mx.lb
        """,
        "props_key_stats": """
            -- engine extracts with an anchored RE2; the oracle uses the
            -- real JSON parser — two different parsers must agree
            WITH e AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   min(k) AS min_k, max(k) AS max_k,
                   count(DISTINCT k) AS n_distinct_k
            FROM e GROUP BY event_type
        """,
        "user_value_kendall": """
            -- all ordered pairs i<j in (ts, event_id) order per user:
            -- concordant / discordant / tied, tau_a one terminal division
            WITH e AS (
                SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ),
            p AS (
                SELECT a.user_id,
                       CAST(sum(CASE WHEN b.c > a.c THEN 1 ELSE 0 END)
                            AS BIGINT) AS concordant,
                       CAST(sum(CASE WHEN b.c < a.c THEN 1 ELSE 0 END)
                            AS BIGINT) AS discordant,
                       CAST(sum(CASE WHEN b.c = a.c THEN 1 ELSE 0 END)
                            AS BIGINT) AS ties
                FROM e a JOIN e b
                  ON a.user_id = b.user_id AND a.rn < b.rn
                GROUP BY a.user_id
            ),
            n AS (SELECT user_id, count(*) AS n FROM e GROUP BY user_id)
            SELECT n.user_id, n.n, p.concordant, p.discordant, p.ties,
                   CAST(p.concordant - p.discordant AS DOUBLE)
                     / CAST(n.n * (n.n - 1) // 2 AS DOUBLE) AS tau_a
            FROM n JOIN p USING (user_id)
        """,
        "token_entropy_by_lang": """
            -- H = ln N - (S/1e6)/N with S = sum of integer micro-nat
            -- terms floor(1e6*(c*ln c)) — same IEEE tree as the engine
            WITH toks AS (
                SELECT lang,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
                FROM documents WHERE length(trim(text)) > 0
            ),
            c AS (SELECT lang, t, count(*) AS n FROM toks GROUP BY 1, 2),
            u AS (
                SELECT lang, n,
                       CAST(floor(1000000.0 * (CAST(n AS DOUBLE)
                            * ln(CAST(n AS DOUBLE)))) AS BIGINT) AS un
                FROM c
            )
            SELECT lang,
                   CAST(sum(n) AS BIGINT) AS n_tokens,
                   count(*) AS n_vocab,
                   CAST(CAST(floor(1000000.0 * (CAST(sum(n) AS DOUBLE)
                          * ln(CAST(sum(n) AS DOUBLE)))) AS BIGINT)
                        - CAST(sum(un) AS BIGINT) AS DOUBLE)
                     / (1000000.0 * CAST(sum(n) AS DOUBLE)) AS entropy
            FROM u GROUP BY lang
        """,
        "pmi_bigrams": """
            -- micro-nat PMI with the engine's exact expression tree:
            -- floor(1e6*(((((ln n + ln T) + ln T) - ln B) - ln cx) - ln cy))
            WITH toks AS (
                SELECT regexp_split_to_array(trim(text), '\\s+') AS l
                FROM documents WHERE length(trim(text)) > 0
            ),
            uni AS (SELECT unnest(l) AS t FROM toks),
            uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
            scal AS (
                SELECT (SELECT count(*) FROM uni) AS tot_t,
                       (SELECT count(*) FROM uni)
                         - (SELECT count(*) FROM toks) AS tot_b
            ),
            b AS (
                SELECT unnest(l[1:len(l)-1]) AS t1, unnest(l[2:len(l)]) AS t2
                FROM toks WHERE len(l) >= 2
            ),
            bc AS (SELECT t1, t2, count(*) AS n FROM b GROUP BY t1, t2),
            scored AS (
                SELECT t1 || ' ' || t2 AS bigram, n, u1.c AS cx, u2.c AS cy,
                       CAST(floor(1000000.0 * (((((ln(CAST(n AS DOUBLE))
                            + ln(CAST(tot_t AS DOUBLE)))
                            + ln(CAST(tot_t AS DOUBLE)))
                            - ln(CAST(tot_b AS DOUBLE)))
                            - ln(CAST(u1.c AS DOUBLE)))
                            - ln(CAST(u2.c AS DOUBLE)))) AS BIGINT)
                         AS pmi_unats
                FROM bc
                JOIN uc u1 ON bc.t1 = u1.t
                JOIN uc u2 ON bc.t2 = u2.t, scal
                WHERE n >= 5
            )
            SELECT bigram, n, cx, cy, pmi_unats,
                   CAST(pmi_unats AS DOUBLE) / 1000000.0 AS pmi
            FROM scored ORDER BY pmi_unats DESC, bigram LIMIT 50
        """,
        "table_profile": f"""
            WITH th AS (SELECT ({corpusoracle.fnv_expr('text')}) AS h, text
                        FROM documents)
            SELECT * FROM (
                SELECT 'doc_id' AS column_name, count(*) AS n_rows,
                       count(doc_id) AS n_nonnull,
                       count(DISTINCT doc_id) AS n_distinct,
                       CAST(min(doc_id) AS VARCHAR) AS min_v,
                       CAST(max(doc_id) AS VARCHAR) AS max_v
                FROM documents
                UNION ALL
                SELECT 'lang', count(*), count(lang), count(DISTINCT lang),
                       min(lang), max(lang) FROM documents
                UNION ALL
                SELECT 'n_chars', count(*), count(n_chars),
                       count(DISTINCT n_chars),
                       CAST(min(n_chars) AS VARCHAR),
                       CAST(max(n_chars) AS VARCHAR) FROM documents
                UNION ALL
                SELECT 'source', count(*), count(source),
                       count(DISTINCT source), min(source), max(source)
                FROM documents
                UNION ALL
                SELECT 'text', count(*), count(text), count(DISTINCT h),
                       CAST(min(h) AS VARCHAR), CAST(max(h) AS VARCHAR)
                FROM th
            ) ORDER BY column_name
        """,
        "q20_promotion_suppliers": """
            WITH q AS (
                SELECT l_partkey, l_suppkey,
                       sum(CAST(l_quantity AS BIGINT)) AS qty
                FROM lineitem
                JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
                WHERE l_shipdate >= DATE '1995-01-01'
                  AND l_shipdate < DATE '1996-01-01'
                GROUP BY 1, 2
            )
            SELECT DISTINCT s_name
            FROM q
            JOIN (SELECT l_partkey AS pk, sum(qty) AS tot FROM q GROUP BY 1)
              ON pk = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE 2 * qty > tot
            ORDER BY s_name
        """,
        "nation_balance_full_outer": """
            WITH c AS (SELECT c_nationkey AS nk,
                              sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cb,
                              count(*) AS n_cust
                       FROM customer GROUP BY 1),
                 s AS (SELECT s_nationkey AS nk,
                              sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS sb,
                              count(*) AS n_supp
                       FROM supplier GROUP BY 1)
            SELECT n_name,
                   coalesce(c.cb, 0) / 100.0 AS cust_bal,
                   coalesce(c.n_cust, 0) AS n_cust,
                   coalesce(s.sb, 0) / 100.0 AS supp_bal,
                   coalesce(s.n_supp, 0) AS n_supp
            FROM c FULL OUTER JOIN s ON c.nk = s.nk
            JOIN nation ON n_nationkey = coalesce(c.nk, s.nk)
            ORDER BY n_name
        """,
        "events_cube": """
            SELECT coalesce(event_type, '(all)') AS event_type,
                   coalesce(day, '(all)') AS day,
                   count(*) AS n,
                   round(sum(value), 4) AS total_value
            FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
                  FROM events)
            GROUP BY CUBE (event_type, day)
            ORDER BY event_type, day
        """,
        "heavy_hitters": """
            WITH toks AS (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                FROM documents WHERE length(trim(text)) > 0
            ),
            tot AS (SELECT count(*) AS total FROM toks WHERE token <> '')
            SELECT token, count(*) AS n
            FROM toks, tot
            WHERE token <> ''
            GROUP BY token, total
            HAVING count(*) > total / 100.0
            ORDER BY n DESC, token
        """,
        "q22_global_sales_opportunity": """
            WITH a AS (SELECT avg(c_acctbal) AS ab FROM customer
                       WHERE c_acctbal > 0.0)
            SELECT c_nationkey, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer, a
            WHERE c_acctbal > a.ab
              AND c_custkey NOT IN (SELECT user_id FROM events)
            GROUP BY c_nationkey
        """,
        "doc_radius_pairs": _RADIUS_PAIRS_SQL,
        "doc_nn": f"""
            WITH pr AS ({_RADIUS_PAIRS_SQL}),
            sym AS (
                SELECT id_a AS doc_id, id_b AS nn_id, dist FROM pr
                UNION ALL
                SELECT id_b AS doc_id, id_a AS nn_id, dist FROM pr
            ),
            rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                ORDER BY dist, nn_id) AS rn
                   FROM sym)
            SELECT doc_id, nn_id, dist FROM rk WHERE rn = 1
        """,
        "doc_nn_mutual": f"""
            -- reciprocal NN: the same window argmin as doc_nn, self-
            -- joined against its transpose (nn(a)=b AND nn(b)=a)
            WITH pr AS ({_RADIUS_PAIRS_SQL}),
            sym AS (
                SELECT id_a AS doc_id, id_b AS nn_id, dist FROM pr
                UNION ALL
                SELECT id_b AS doc_id, id_a AS nn_id, dist FROM pr
            ),
            rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                ORDER BY dist, nn_id) AS rn
                   FROM sym),
            nn AS (SELECT doc_id, nn_id, dist FROM rk WHERE rn = 1)
            SELECT x.doc_id AS a, x.nn_id AS b, x.dist
            FROM nn x JOIN nn y
              ON y.doc_id = x.nn_id AND y.nn_id = x.doc_id
            WHERE x.doc_id < x.nn_id
        """,
        "cell_lang_diversity": f"""
            WITH g AS ({_GEO}),
            d AS (
                SELECT CAST(floor(g.fx * 64) AS BIGINT) AS ix,
                       CAST(floor(g.fy * 64) AS BIGINT) AS iy,
                       doc.lang
                FROM g JOIN documents doc ON doc.doc_id = g.doc_id
            ),
            cl AS (SELECT ix, iy, lang, count(*) AS n FROM d GROUP BY 1, 2, 3)
            SELECT ix, iy,
                   CAST(sum(n) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_langs,
                   CAST(sum(n) * sum(n) - sum(n * n) AS BIGINT) AS gini_num,
                   CAST(sum(n) * sum(n) AS BIGINT) AS gini_den
            FROM cl GROUP BY ix, iy
        """,
        "link_bfs": """
            WITH RECURSIVE r(doc_id, hop) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION ALL
                SELECT (r.doc_id * 31 + t.j) % (SELECT count(*) FROM documents),
                       r.hop + 1
                FROM r CROSS JOIN range(1, 9) t(j)
                WHERE r.hop < 4
            )
            SELECT doc_id, CAST(min(hop) AS BIGINT) AS hop
            FROM r GROUP BY doc_id
        """,
        "link_triangles": """
            WITH lg AS (
                SELECT d.doc_id AS src,
                       (d.doc_id * 31 + t.j) % (SELECT count(*) FROM documents) AS dst
                FROM documents d CROSS JOIN range(1, 9) t(j)
            ),
            e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                  FROM lg WHERE src <> dst),
            adj AS (SELECT a AS x, b AS y FROM e
                    UNION ALL SELECT b AS x, a AS y FROM e),
            wedge AS (
                SELECT a1.x AS c, a1.y AS p, a2.y AS q
                FROM adj a1 JOIN adj a2 ON a1.x = a2.x AND a1.y < a2.y
            )
            SELECT w.c AS doc_id, CAST(count(*) AS BIGINT) AS n_tri
            FROM wedge w JOIN e ON e.a = w.p AND e.b = w.q
            GROUP BY w.c
        """,
        "vocab_by_lang": """
            WITH toks AS (
                SELECT lang, unnest(string_split(text, ' ')) AS token
                FROM documents
            )
            SELECT lang,
                   CAST(count(DISTINCT token) AS BIGINT) AS n_vocab,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM toks GROUP BY lang
        """,
        "bm25_topk": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS tl FROM documents
            ),
            st AS (
                SELECT count(*) AS n,
                       CAST(sum(len(tl)) AS BIGINT) AS dl_sum,
                       CAST(sum(CASE WHEN list_contains(tl, 'table') THEN 1 ELSE 0 END) AS BIGINT) AS dfa,
                       CAST(sum(CASE WHEN list_contains(tl, 'scan')  THEN 1 ELSE 0 END) AS BIGINT) AS dfb,
                       CAST(sum(CASE WHEN list_contains(tl, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS dfc
                FROM toks
            ),
            sc AS (
                SELECT doc_id, len(tl) AS dl,
                       len(list_filter(tl, x -> x = 'table')) AS tfa,
                       len(list_filter(tl, x -> x = 'scan'))  AS tfb,
                       len(list_filter(tl, x -> x = 'merge')) AS tfc
                FROM toks
            ),
            scored AS (
                SELECT doc_id,
                    (CASE WHEN tfa > 0 THEN
                        ((CAST(st.n - st.dfa AS DOUBLE) + 0.5) / (CAST(st.dfa AS DOUBLE) + 0.5))
                        * (tfa * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                        / (tfa + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / (CAST(st.dl_sum AS DOUBLE) / st.n)))
                     ELSE 0.0 END)
                  + (CASE WHEN tfb > 0 THEN
                        ((CAST(st.n - st.dfb AS DOUBLE) + 0.5) / (CAST(st.dfb AS DOUBLE) + 0.5))
                        * (tfb * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                        / (tfb + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / (CAST(st.dl_sum AS DOUBLE) / st.n)))
                     ELSE 0.0 END)
                  + (CASE WHEN tfc > 0 THEN
                        ((CAST(st.n - st.dfc AS DOUBLE) + 0.5) / (CAST(st.dfc AS DOUBLE) + 0.5))
                        * (tfc * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                        / (tfc + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / (CAST(st.dl_sum AS DOUBLE) / st.n)))
                     ELSE 0.0 END) AS score
                FROM sc CROSS JOIN st
            )
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 20
        """,
        "q5_local_supplier_volume": """
            -- exact int64 ten-thousandths, integer half-up cent rounding
            -- (same expression tree as the engine)
            SELECT n_name,
                   CAST((CAST(sum(CAST(round(l_extendedprice
                           * (1 - l_discount) * 10000) AS BIGINT))
                         AS BIGINT) + 50) // 100 AS DOUBLE) / 100.0
                     AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "q17_small_quantity_revenue": """
            -- exact int64 cents; /7 average is integer half-up
            -- floor((2s+7)/14), the same expression tree as the engine
            SELECT CAST((2 * CAST(sum(CAST(round(l_extendedprice * 100)
                       AS BIGINT)) AS BIGINT) + 7) // 14 AS DOUBLE) / 100.0
                     AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#23'
              AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)
        """,
        "event_type_transitions": """
            WITH seq AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS next_type
                FROM events
            )
            SELECT event_type AS from_type, next_type AS to_type,
                   count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "doc_cell_pyramid": f"""
            WITH g AS ({_GEO}), leaf AS (
                SELECT CAST(floor(fx * 64) AS BIGINT) AS ix,
                       CAST(floor(fy * 64) AS BIGINT) AS iy,
                       count(*) AS n_docs
                FROM g GROUP BY 1, 2
            )
            SELECT CAST(6 AS BIGINT) AS res, ix AS pix, iy AS piy, n_docs
            FROM leaf
            UNION ALL
            SELECT CAST(4 AS BIGINT), ix // 4, iy // 4,
                   CAST(sum(n_docs) AS BIGINT)
            FROM leaf GROUP BY 1, 2, 3
            UNION ALL
            SELECT CAST(2 AS BIGINT), ix // 16, iy // 16,
                   CAST(sum(n_docs) AS BIGINT)
            FROM leaf GROUP BY 1, 2, 3
        """,
        "lineitem_price_corr": """
            SELECT l_returnflag, count(*) AS n,
                   round(corr(l_quantity, l_extendedprice), 4)
                       AS corr_qty_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "q12_priority_lines": """
            WITH cnt AS (
                SELECT l_orderkey, l_returnflag, count(*) AS cnt
                FROM lineitem GROUP BY 1, 2
            )
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN cnt ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE cnt END) AS BIGINT) AS low_line_count
            FROM cnt JOIN orders o ON cnt.l_orderkey = o.o_orderkey
            GROUP BY l_returnflag
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity >= 45.0)
            GROUP BY o_orderpriority
        """,
        "event_running_stats": """
            SELECT event_id, user_id,
                   round(sum(value) OVER w, 4) AS run_sum,
                   round(avg(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS BETWEEN 3 PRECEDING
                                          AND CURRENT ROW), 4) AS mavg4
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "event_type_cooccurrence": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_users
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                              AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "embedding_norms_by_lang": """
            SELECT d.lang, count(*) AS n_vecs,
                   round(avg(n.norm), 4) AS avg_norm,
                   round(max(n.norm), 4) AS max_norm
            FROM documents d
            JOIN (SELECT vec_id,
                         sqrt(list_sum(list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                             AS norm
                  FROM embeddings) n
              ON d.doc_id = n.vec_id
            GROUP BY d.lang
        """,
        "docs_rollup": """
            SELECT coalesce(lang, '(all)') AS lang,
                   coalesce(source, '(all)') AS source,
                   count(*) AS n_docs,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "event_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click')    AS n_click,
                   count(*) FILTER (WHERE event_type = 'error')    AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view')     AS n_view,
                   count(*) AS n_total
            FROM events GROUP BY user_id
        """,
        "conversion_funnel": """
            WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t_click
                  FROM events e JOIN v USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts >= v.t_view
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t_purchase
                  FROM events e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
                  GROUP BY e.user_id)
            SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
                   v.user_id IS NOT NULL AS viewed,
                   c.user_id IS NOT NULL AS clicked,
                   p.user_id IS NOT NULL AS purchased
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN v USING (user_id)
            LEFT JOIN c USING (user_id)
            LEFT JOIN p USING (user_id)
        """,
        "event_gaps": """
            WITH g AS (
                SELECT user_id,
                       date_diff('microsecond',
                                 lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id),
                                 ts) AS gap_us
                FROM events
            )
            SELECT user_id,
                   count(*) AS n_events,
                   count(gap_us) AS n_gaps,
                   -- exact int64 µs until one terminal double division
                   -- (mirrors the engine; round(4) sat on .xxxx5 boundaries)
                   coalesce(CAST(sum(gap_us) AS DOUBLE)
                            / (count(gap_us) * 1000000), 0.0) AS avg_gap_s,
                   coalesce(max(gap_us) / 1000000.0, 0.0) AS max_gap_s
            FROM g GROUP BY user_id
        """,
        "customers_without_events": """
            SELECT c_custkey, c_name, c_nationkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        """,
        "doc_length_ntile": """
            SELECT doc_id, lang, n_chars,
                   CAST(row_number() OVER w AS BIGINT) AS lang_pos,
                   CAST(ntile(4) OVER w AS BIGINT) AS tile
            FROM documents WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
        """,
        "top_docs_per_lang": f"""
            WITH t AS ({_TEXT_STATS}),
            q AS (
                SELECT d.lang, t.doc_id,
                       0.5 * least(CAST(t.n_tokens AS DOUBLE) / 100.0, 1.0)
                     + 0.3 * least(t.stopword_ratio * 5.0, 1.0)
                     + 0.2 * (1.0 - least(t.punct_ratio * 10.0, 1.0)) AS quality_score
                FROM t JOIN documents d ON t.doc_id = d.doc_id
            ),
            r AS (
                SELECT lang, doc_id, quality_score,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY quality_score DESC, doc_id) AS rn
                FROM q
            )
            SELECT lang, doc_id, quality_score, CAST(rn AS BIGINT) AS lang_rank
            FROM r WHERE rn <= 5
        """,
        "inverted_index": """
            WITH inc AS (
                SELECT DISTINCT doc_id, token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                    FROM documents WHERE length(trim(text)) > 0
                ) WHERE token <> ''
            )
            SELECT token, count(*) AS df,
                   array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 20),
                                   ',') AS postings
            FROM inc GROUP BY token
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
                   len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS n_bpe_tokens
            FROM documents
        """,
        "mixture_sample": f"""
            SELECT doc_id, lang, n_chars
            FROM documents
            WHERE ({corpusoracle.fnv_expr(
                "lpad(CAST(doc_id AS VARCHAR), 12, '0')"
                " || reverse(lpad(CAST(doc_id AS VARCHAR), 12, '0'))")}) % 4096
                  < CASE lang WHEN 'en' THEN 2048
                              WHEN 'de' THEN 1024 ELSE 410 END
        """,
        "doc_global_rank": """
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
            FROM documents
        """,
        "link_graph": """
            SELECT d.doc_id AS src,
                   (d.doc_id * 31 + t.j) % (SELECT count(*) FROM documents) AS dst
            FROM documents d CROSS JOIN range(1, 9) t(j)
        """,
        "pagerank": graphmod.pagerank_sql(iters=5),
        "link_greedy_walks": graphmod.link_greedy_walks_sql(),
        "link_sssp": graphmod.link_sssp_sql(),
        "viterbi_user_paths": analytics.viterbi_sql(),
        "quadtree_leaves": corpusmod.quadtree_sql(),
        "kcenter_coreset": corpusmod.kcenter_sql(),
        "cell_morans_i": corpusmod.morans_i_sql(_GEO),
        "cell_getis_gi": corpusmod.getis_gi_sql(_GEO),
        "doc_bbox_scan": corpusmod.bbox_scan_sql(_GEO),
        # the pruned read is LOSSLESS by construction: same oracle, no
        # cell/partition logic — a bit-equal match through the
        # partition-pruned read proves the storage pruning discards only
        # rows the exact predicate would discard
        "doc_bbox_scan_pruned": corpusmod.bbox_scan_sql(_GEO),
        "corpus_clean_export_manifest": f"""
            -- pure-SQL recomputation of the cleaned-corpus export's
            -- per-shard projection from the documents view alone (the
            -- engine side reads back the WRITTEN parquet): C4-style
            -- quality filter >= 0.5 (the corpus_prep predicate), exact
            -- dedup winners (min doc_id per text), Knuth shard mod 64,
            -- wrapping-uint64 codepoint-FNV checksum per shard
            WITH t AS ({_TEXT_STATS}),
            q AS (
                SELECT d.doc_id, d.text
                FROM documents d JOIN t ON t.doc_id = d.doc_id
                WHERE 0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                    + 0.3 * least(stopword_ratio * 5.0, 1.0)
                    + 0.2 * (1.0 - least(punct_ratio * 10.0, 1.0)) >= 0.5
            ),
            dd AS (
                SELECT doc_id, text FROM q
                WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY text)
            ),
            sh AS (
                SELECT CAST((doc_id * 2654435761) % 64 AS BIGINT) AS shard,
                       doc_id,
                       ({corpusoracle.fnv_expr('text')}) AS h
                FROM dd
            )
            SELECT shard,
                   count(*) AS n_docs,
                   CAST(sum(h) % 18446744073709551616::HUGEINT AS UBIGINT)
                       AS text_checksum,
                   min(doc_id) AS min_doc_id,
                   max(doc_id) AS max_doc_id
            FROM sh GROUP BY shard
        """,
        "semdedup": corpusmod.semdedup_sql(),
        "ripley_k": corpusmod.ripley_k_sql(_GEO),
        "cell_join_counts": corpusmod.join_counts_sql(_GEO),
        "cell_compact": corpusmod.cell_compact_sql(_GEO),
        "idw_grid": corpusmod.idw_grid_sql(_GEO),
        "link_label_prop": graphmod.link_label_prop_sql(),
        "variogram": corpusmod.variogram_sql(_GEO),
        "convex_hull": corpusmod.convex_hull_sql(),
        "link_mis": graphmod.link_mis_sql(),
        "event_percentile_attach": """
            SELECT event_id, event_type, value,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value) AS pct
            FROM events
        """,
        "entity_resolution": """
            -- same derived universe (base + two single-char rotations),
            -- blocked levenshtein<=2 self-join, recursive reachability
            -- closure, window-argmax golden record (largest text, min id)
            WITH RECURSIVE uni AS (
                SELECT doc_id AS id, lang, n_chars,
                       substr(text, 1, 256) AS t
                FROM documents
                UNION ALL
                SELECT doc_id + 10000000, lang, n_chars,
                       chr(32 + (ascii(substr(text, 1, 1)) - 32 + 1) % 95)
                         || substr(substr(text, 1, 256), 2)
                FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 1
                UNION ALL
                SELECT doc_id + 20000000, lang, n_chars,
                       substr(text, 1, 1)
                         || chr(32 + (ascii(substr(text, 2, 1)) - 32 + 1)
                                % 95)
                         || substr(substr(text, 1, 256), 3)
                FROM documents WHERE doc_id % 6 = 0 AND length(text) >= 2
            ),
            -- per-block contributor cap (ER_BLOCK_CAP = 512 smallest ids):
            -- the same stated semantic as the engine's pairs_block — only
            -- capped members generate pairs; the rest stay in the universe
            capped AS (SELECT id, lang, n_chars, t FROM (
                       SELECT id, lang, n_chars, t,
                              row_number() OVER (PARTITION BY lang, n_chars
                                                 ORDER BY id) AS rn
                       FROM uni) WHERE rn <= 512),
            pr AS (SELECT a.id AS a, b.id AS b
                   FROM capped a JOIN capped b
                     ON a.lang = b.lang AND a.n_chars = b.n_chars
                    AND a.id < b.id
                    AND levenshtein(a.t, b.t) <= 2),
            sym AS (SELECT a AS s, b AS u FROM pr
                    UNION ALL SELECT b, a FROM pr),
            w(node, lab) AS (
                SELECT id, id FROM uni
                UNION
                SELECT s.u, w.lab FROM w JOIN sym s ON s.s = w.node
            ),
            comp AS (SELECT node, min(lab) AS label FROM w GROUP BY node),
            ranked AS (
                SELECT c.label, u.id, u.t,
                       row_number() OVER (PARTITION BY c.label
                                          ORDER BY u.t DESC, u.id) AS rn
                FROM comp c JOIN uni u ON u.id = c.node
            )
            SELECT label AS cluster_id,
                   count(*) AS n_members,
                   CAST(sum(CASE WHEN id < 10000000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_base,
                   CAST(max(CASE WHEN rn = 1 THEN id END) AS BIGINT)
                       AS golden_id
            FROM ranked
            GROUP BY label
            HAVING count(*) >= 2
        """,
        "join_sample": """
            -- degree-weighted two-phase sample over the unmaterialized
            -- lineitem self-join on partkey; same integer hash + ONE
            -- double division per (slot, row)
            WITH r AS (SELECT l_orderkey * 8 + l_linenumber AS rowid,
                              l_partkey AS pk
                       FROM lineitem),
            d AS (SELECT pk, count(*) AS d FROM r GROUP BY pk),
            s AS (SELECT unnest(range(1, 17)) AS s),
            pri AS (SELECT s.s, r.rowid, r.pk,
                           CAST((CAST(r.rowid AS HUGEINT) * 2654435761
                                 + s.s * 97003)
                                % 4294967296 AS DOUBLE) / d.d AS pri
                    FROM r JOIN d USING (pk) CROSS JOIN s),
            win AS (SELECT * FROM (
                        SELECT *, row_number() OVER (PARTITION BY s
                                   ORDER BY pri, rowid) AS rn
                        FROM pri) WHERE rn = 1),
            wr AS (SELECT w.s, w.rowid, w.pk,
                          CAST((CAST(w.rowid AS HUGEINT) * 40503
                                + w.s * 131) % d.d AS BIGINT) AS r
                   FROM win w JOIN d USING (pk)),
            rk AS (SELECT pk, rowid,
                          row_number() OVER (PARTITION BY pk
                                             ORDER BY rowid) - 1 AS rank
                   FROM r)
            SELECT wr.s AS slot, wr.rowid AS a_rowid, wr.pk AS l_partkey,
                   rk.rowid AS b_rowid
            FROM wr JOIN rk ON rk.pk = wr.pk AND rk.rank = wr.r
        """,
        "union_join_sample": """
            -- uniform sample over the BAG UNION of two unmaterialized
            -- self-joins (partkey / suppkey): branch pick is pure HUGEINT
            -- (g(s)*(n1+n2) < n1*2^32), within-branch selection mirrors
            -- join_sample's hash/degree idiom with ONE double division
            WITH r AS (SELECT l_orderkey * 8 + l_linenumber AS rowid,
                              l_partkey AS pk, l_suppkey AS sk
                       FROM lineitem),
            d1 AS (SELECT pk, count(*) AS d FROM r GROUP BY pk),
            d2 AS (SELECT sk, count(*) AS d FROM r GROUP BY sk),
            nn AS (SELECT
                     (SELECT sum(CAST(d AS HUGEINT) * d) FROM d1) AS n1,
                     (SELECT sum(CAST(d AS HUGEINT) * d) FROM d2) AS n2),
            s AS (SELECT unnest(range(1, 17)) AS s),
            sb AS (SELECT s.s,
                          CASE WHEN CAST((s.s * 1140671485 + 12820163)
                                         % 4294967296 AS HUGEINT)
                                    * (nn.n1 + nn.n2)
                                    < nn.n1 * CAST(4294967296 AS HUGEINT)
                               THEN 1 ELSE 2 END AS branch
                   FROM s, nn),
            pri AS (SELECT sb.s, sb.branch, r.rowid,
                           CASE WHEN sb.branch = 1 THEN r.pk
                                ELSE r.sk END AS key,
                           CAST((CAST(r.rowid AS HUGEINT) * 2654435761
                                 + sb.s * 97003)
                                % 4294967296 AS DOUBLE)
                           / (CASE WHEN sb.branch = 1 THEN dd1.d
                                   ELSE dd2.d END) AS pri
                    FROM r JOIN d1 dd1 USING (pk)
                    JOIN d2 dd2 USING (sk) CROSS JOIN sb),
            win AS (SELECT * FROM (
                        SELECT *, row_number() OVER (PARTITION BY s
                                   ORDER BY pri, rowid) AS rn
                        FROM pri) WHERE rn = 1),
            wr AS (SELECT w.s, w.branch, w.rowid, w.key,
                          CAST((CAST(w.rowid AS HUGEINT) * 40503
                                + w.s * 131) %
                          (CASE WHEN w.branch = 1
                                THEN (SELECT d FROM d1 WHERE pk = w.key)
                                ELSE (SELECT d FROM d2 WHERE sk = w.key)
                           END) AS BIGINT) AS rr
                   FROM win w),
            rk1 AS (SELECT pk AS key, rowid,
                           row_number() OVER (PARTITION BY pk
                                              ORDER BY rowid) - 1 AS rank
                    FROM r),
            rk2 AS (SELECT sk AS key, rowid,
                           row_number() OVER (PARTITION BY sk
                                              ORDER BY rowid) - 1 AS rank
                    FROM r)
            SELECT wr.s AS slot, wr.branch, wr.rowid AS a_rowid,
                   wr.key AS key, rk1.rowid AS b_rowid
            FROM wr JOIN rk1 ON wr.branch = 1 AND rk1.key = wr.key
                            AND rk1.rank = wr.rr
            UNION ALL
            SELECT wr.s, wr.branch, wr.rowid, wr.key, rk2.rowid
            FROM wr JOIN rk2 ON wr.branch = 2 AND rk2.key = wr.key
                            AND rk2.rank = wr.rr
        """,
        "dsir_weights": """
            -- DSIR hashed-bigram importance weights: add-one-smoothed
            -- target(en)/raw bucket models, micro-nat score = floor of
            -- ONE ln of ONE division of two exact int64 products
            -- (the lm_perplexity idiom); per-doc exact int64 sum
            WITH toks AS (
                SELECT doc_id, lang,
                       regexp_split_to_array(trim(text), '\\s+') AS l
                FROM documents WHERE length(trim(text)) > 0
            ),
            bg AS (
                SELECT doc_id, lang,
                       unnest(l[1:len(l)-1]) || ' ' || unnest(l[2:len(l)])
                           AS b
                FROM toks WHERE len(l) >= 2
            ),
            hb AS (SELECT doc_id, lang,
                          CAST(__FNV__ % 65536 AS BIGINT) AS bk
                   FROM bg),
            cnt AS (SELECT bk, count(*) AS r,
                           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t
                    FROM hb GROUP BY bk),
            tot AS (SELECT sum(r) AS tr, sum(t) AS tt FROM cnt),
            sc AS (SELECT c.bk,
                          CAST(floor(1000000.0 * ln(
                              CAST((c.t + 1) * (tot.tr + 65536) AS DOUBLE)
                              / CAST((c.r + 1) * (tot.tt + 65536)
                                     AS DOUBLE))) AS BIGINT) AS s
                   FROM cnt c, tot),
            dw AS (SELECT h.doc_id, count(*) AS nb, sum(sc.s) AS w
                   FROM hb h JOIN sc ON sc.bk = h.bk GROUP BY h.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(dw.nb, 0) AS BIGINT) AS n_bigrams,
                   CAST(coalesce(dw.w, 0) AS BIGINT) AS w_unats,
                   CAST(coalesce(dw.w, 0) AS DOUBLE) / 1000000.0 AS weight
            FROM documents d LEFT JOIN dw USING (doc_id)
        """.replace("__FNV__", corpusoracle.fnv_expr("b")),
        "ccnet_buckets": """
            -- CCNet head/middle/tail terciles of the bigram-LM NLL within
            -- each language: exact integer rank buckets over the same
            -- micro-nat scores as the lm_perplexity oracle
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
                FROM documents WHERE length(trim(text)) > 0
            ),
            b AS (
                SELECT doc_id, unnest(l[1:len(l)-1]) AS lhs,
                       unnest(l[1:len(l)-1]) || ' ' || unnest(l[2:len(l)])
                           AS bigram
                FROM toks WHERE len(l) >= 2
            ),
            tf AS (
                SELECT doc_id, lhs, bigram, count(*) AS tf
                FROM b GROUP BY doc_id, lhs, bigram
            ),
            scored AS (
                SELECT doc_id, tf,
                       CAST(floor(ln(
                           CAST(sum(tf) OVER (PARTITION BY bigram) AS DOUBLE)
                           / CAST(sum(tf) OVER (PARTITION BY lhs) AS DOUBLE)
                       ) * 1e6) AS BIGINT) AS q
                FROM tf
            ),
            nll AS (SELECT doc_id, CAST(-sum(tf * q) AS BIGINT) AS nll_micro
                    FROM scored GROUP BY doc_id)
            SELECT n.doc_id, d.lang, n.nll_micro,
                   CAST((row_number() OVER (PARTITION BY d.lang
                                            ORDER BY n.nll_micro, n.doc_id)
                         - 1) * 3
                        // count(*) OVER (PARTITION BY d.lang)
                        AS BIGINT) AS bucket
            FROM nll n JOIN documents d USING (doc_id)
        """,
        "bpe_first_merge": """
            -- BPE round-1 pair counts: adjacent character pairs over the
            -- word-frequency table ('\\S+' tokens), each in-word
            -- occurrence weighted by word frequency; top-10 by
            -- (count desc, pair asc)
            WITH toks AS (SELECT unnest(regexp_extract_all(text, '\\S+'))
                              AS w
                          FROM documents),
            wf AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
            ps AS (SELECT w, f, unnest(range(length(w) - 1)) AS i
                   FROM wf WHERE length(w) > 1),
            pc AS (SELECT substr(w, CAST(i + 1 AS INTEGER), 1) AS lhs,
                          substr(w, CAST(i + 2 AS INTEGER), 1) AS rhs,
                          sum(f) AS n
                   FROM ps GROUP BY 1, 2)
            SELECT lhs, rhs, CAST(n AS BIGINT) AS pair_freq
            FROM pc ORDER BY n DESC, lhs, rhs LIMIT 10
        """,
        "video_scene_cuts": """
            -- cuts recomputed from the plane formula (never from bytes):
            -- per-frame luma sums, lag deltas, cut iff |d| > 4*w*h
            WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w,
                                 4 + doc_id % 3 AS h, 3 + doc_id % 5 AS nf
                          FROM documents),
            vf AS (SELECT doc_id, w, h, unnest(range(nf)) AS f FROM dims),
            vy AS (SELECT doc_id, w, h, f, unnest(range(h)) AS y FROM vf),
            vx AS (SELECT doc_id, w, h, f, y, unnest(range(w)) AS x
                   FROM vy),
            fs AS (SELECT doc_id, w, h, f,
                          CAST(sum((doc_id*7919 + f*251 + y*131 + x*31)
                                   % 256) AS BIGINT) AS s
                   FROM vx GROUP BY doc_id, w, h, f),
            d AS (SELECT doc_id, w, h,
                         abs(s - lag(s) OVER (PARTITION BY doc_id
                                              ORDER BY f)) AS ad
                  FROM fs)
            SELECT x.doc_id AS media_id, CAST(x.nf AS BIGINT) AS n_frames,
                   CAST(coalesce(sum(CASE WHEN d.ad > 4 * x.w * x.h
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_cuts,
                   CAST(coalesce(max(d.ad), 0) AS BIGINT) AS max_abs_delta
            FROM dims x
            LEFT JOIN d ON d.doc_id = x.doc_id AND d.ad IS NOT NULL
            GROUP BY x.doc_id, x.nf
        """,
        "audio_silence_windows": """
            -- silence windows recomputed from the sample formula: full
            -- 16-sample windows, energy = sum |s|, silent below 131072
            WITH lens AS (SELECT doc_id, 64 + doc_id % 97 AS n
                          FROM documents),
            ts AS (SELECT doc_id, n, unnest(range((n // 16) * 16)) AS t
                   FROM lens),
            sv AS (SELECT doc_id, t // 16 AS wdw,
                          abs((doc_id*7919 + t*t*13 + t*101) % 65536
                              - 32768) AS a
                   FROM ts),
            en AS (SELECT doc_id, wdw, CAST(sum(a) AS BIGINT) AS e
                   FROM sv GROUP BY doc_id, wdw)
            SELECT l.doc_id AS media_id,
                   CAST(l.n // 16 AS BIGINT) AS n_windows,
                   CAST(sum(CASE WHEN e.e < 131072 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_silent,
                   CAST(min(e.e) AS BIGINT) AS min_energy,
                   CAST(max(e.e) AS BIGINT) AS max_energy
            FROM lens l JOIN en e USING (doc_id)
            GROUP BY l.doc_id, l.n
        """,
        "agg_discovery": """
            -- EDBT'19 aggregate discovery: rank candidate group-bys by
            -- the scale-free dispersion of per-group sums on the same
            -- deterministic 1-in-20 sample; all-HUGEINT rational score
            WITH samp AS (
                SELECT event_type, user_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       (event_id * 2654435761) % 4294967296 AS h
                FROM events
                WHERE ((event_id * 2654435761) % 4294967296) % 20 = 0
            ),
            r AS (SELECT event_type,
                         epoch_us(ts) // 86400000000 AS day,
                         user_id % 64 AS bucket,
                         ((h % 65536) // 1024) * 64
                           + ((h // 65536) // 1024) AS cell,
                         cents
                  FROM samp),
            g1 AS (SELECT CAST(sum(cents) AS HUGEINT) AS s, count(*) AS n
                   FROM r GROUP BY event_type),
            g2 AS (SELECT CAST(sum(cents) AS HUGEINT) AS s, count(*) AS n
                   FROM r GROUP BY day),
            g3 AS (SELECT CAST(sum(cents) AS HUGEINT) AS s, count(*) AS n
                   FROM r GROUP BY bucket),
            g4 AS (SELECT CAST(sum(cents) AS HUGEINT) AS s, count(*) AS n
                   FROM r GROUP BY cell),
            sc AS (
                SELECT 'event_type' AS grouping, count(*) AS n_groups,
                       sum(n) AS sr, sum(s) AS ts_, sum(s*s) AS ss FROM g1
                UNION ALL SELECT 'day', count(*), sum(n), sum(s), sum(s*s)
                          FROM g2
                UNION ALL SELECT 'user_bucket', count(*), sum(n), sum(s),
                          sum(s*s) FROM g3
                UNION ALL SELECT 'cell', count(*), sum(n), sum(s),
                          sum(s*s) FROM g4
            )
            SELECT grouping, CAST(n_groups AS BIGINT) AS n_groups,
                   CAST(coalesce(sr, 0) AS BIGINT) AS sample_rows,
                   CASE WHEN ts_ IS NULL OR ts_ = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST((n_groups * ss - ts_ * ts_) * 1000000
                                  // (ts_ * ts_) AS BIGINT) END AS score_ppm
            FROM sc
        """,
        "groupby_kmv_estimate": """
            -- CIDR'19 sample+sketch group-by estimate: 1-in-20 row sample
            -- for per-group masses, k-minimum-values sketch of the key
            -- column for the total-group correction — all integer, so the
            -- mirror is bit-equal (KMV exact below k distinct hashes)
            WITH h AS (SELECT user_id,
                              (event_id * 2654435761) % 4294967296 AS hh
                       FROM events),
            samp AS (SELECT user_id, count(*) AS n
                     FROM h WHERE hh % 20 = 0 GROUP BY user_id),
            uh AS (SELECT DISTINCT (user_id * 2654435761) % 4294967296
                       AS uh FROM events),
            kmin AS (SELECT uh FROM uh ORDER BY uh LIMIT 256),
            kk AS (SELECT count(*) AS kcnt, max(uh) AS hk FROM kmin)
            SELECT user_id, n AS n_sample,
                   CAST(n * 20 AS BIGINT) AS est_n
            FROM samp
            UNION ALL
            SELECT -1, (SELECT count(*) FROM samp),
                   CASE WHEN kk.kcnt < 256
                        THEN (SELECT count(*) FROM uh)
                        ELSE CAST((CAST(255 AS HUGEINT) * 4294967296)
                                  // kk.hk AS BIGINT) END
            FROM kk
        """,
        "user_session_coverage": """
            -- interval union per user: window-cummax island method
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                         + (1800 + (event_id % 7200)) * 1000000 AS e
                FROM events
            ),
            m AS (SELECT user_id, s, e,
                         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING) AS pm
                  FROM iv),
            g AS (SELECT *, CASE WHEN pm IS NULL OR s > pm
                                 THEN 1 ELSE 0 END AS st
                  FROM m),
            h AS (SELECT *, sum(st) OVER (PARTITION BY user_id
                                          ORDER BY s, e
                                          ROWS UNBOUNDED PRECEDING) AS isl
                  FROM g),
            i AS (SELECT user_id, isl, min(s) AS s0, max(e) AS e1
                  FROM h GROUP BY 1, 2)
            SELECT user_id, count(*) AS n_islands,
                   CAST(sum(e1 - s0) AS BIGINT) AS covered_us,
                   CAST(max(e1 - s0) AS BIGINT) AS max_island_us
            FROM i GROUP BY user_id
        """,
        "user_retention_cohorts": """
            -- cohort triangle: distinct (user, day) incidence, per-user
            -- min-day cohort, counts per (cohort, offset), share vs the
            -- cohort's own offset-0 size
            WITH inc AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events
            ),
            c AS (SELECT user_id, min(day) AS cohort FROM inc GROUP BY 1),
            j AS (SELECT c.cohort, i.day - c.cohort AS offset_days,
                         count(*) AS n
                  FROM inc i JOIN c USING (user_id) GROUP BY 1, 2)
            SELECT j.cohort AS cohort_day, j.offset_days,
                   CAST(j.n AS BIGINT) AS n_users,
                   CAST(j.n AS DOUBLE) / CAST(b.n AS DOUBLE) AS retention
            FROM j JOIN j b ON b.cohort = j.cohort AND b.offset_days = 0
        """,
        "scd2_history": """
            -- SCD2: lag-detected change points -> segment ids -> one row
            -- per run; valid_to = next run's valid_from (lead over the
            -- segment id, which is unique-ordered even when ts ties)
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS t, event_id,
                       CAST(round(value * 100) AS BIGINT) // 5000 AS tier
                FROM events
            ),
            m AS (SELECT *, lag(tier) OVER (PARTITION BY user_id
                                            ORDER BY t, event_id) AS pt
                  FROM e),
            g AS (SELECT *, CASE WHEN pt IS NULL OR tier <> pt
                                 THEN 1 ELSE 0 END AS chg
                  FROM m),
            h AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
                                           ORDER BY t, event_id
                                           ROWS UNBOUNDED PRECEDING) AS seg
                  FROM g),
            i AS (SELECT user_id, seg, min(tier) AS tier,
                         min(t) AS valid_from_us, count(*) AS n_obs
                  FROM h GROUP BY 1, 2)
            SELECT user_id, tier, valid_from_us,
                   COALESCE(lead(valid_from_us) OVER (
                       PARTITION BY user_id ORDER BY seg), -1)
                       AS valid_to_us,
                   CAST(n_obs AS BIGINT) AS n_obs
            FROM i
        """,
        "user_covisitation": """
            -- capped co-visitation: integer Knuth-hash tile, per-cell
            -- 16-smallest-users cap, pair self-join, n_shared >= 2
            WITH b AS (
                SELECT user_id,
                       CAST((CAST(event_id AS HUGEINT) * 2654435761)
                            % 4294967296 AS BIGINT) AS hh
                FROM events
            ),
            inc AS (SELECT DISTINCT user_id,
                           (hh % 65536) // 1024 AS ix,
                           (hh // 65536) // 1024 AS iy
                    FROM b),
            capped AS (SELECT * FROM (
                    SELECT ix, iy, user_id,
                           row_number() OVER (PARTITION BY ix, iy
                                              ORDER BY user_id) AS rn
                    FROM inc) WHERE rn <= 16),
            p AS (SELECT a.user_id AS u1, c.user_id AS u2
                  FROM capped a JOIN capped c
                    ON a.ix = c.ix AND a.iy = c.iy AND a.user_id < c.user_id)
            SELECT u1, u2, count(*) AS n_shared
            FROM p GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "events_watermark_late": """
            -- watermark = exclusive running max event-time over ARRIVAL
            -- (event_id) order, minus 10 min lateness; per 1-h window,
            -- on-time vs late counts
            WITH a AS (SELECT event_id, epoch_us(ts) AS t,
                              epoch_us(ts)
                                + CAST((CAST(event_id AS HUGEINT)
                                        * 2654435761) % 4294967296
                                       AS BIGINT) % 3600000000
                                - 1800000000 AS arr
                       FROM events),
            m AS (SELECT t, max(t) OVER (ORDER BY arr, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND 1 PRECEDING) AS wm
                  FROM a),
            f AS (SELECT t // 3600000000 AS win,
                         CASE WHEN wm IS NOT NULL
                                   AND t + 600000000 < wm
                              THEN 1 ELSE 0 END AS late
                  FROM m)
            SELECT win * 3600000000 AS window_start_us,
                   CAST(sum(1 - late) AS BIGINT) AS n_ontime,
                   CAST(sum(late) AS BIGINT) AS n_late
            FROM f GROUP BY win
        """,
        "link_adamic_adar": """
            -- symmetric derived adjacency, wedge self-join, NOT-EXISTS
            -- anti-join, floor-quantized micro-nat 1/ln(deg) weights
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e0 AS (SELECT d.doc_id AS u, (d.doc_id * 31 + t.j) % nn.n AS v
                   FROM documents d CROSS JOIN range(1, 9) t(j)
                   CROSS JOIN nn
                   WHERE d.doc_id <> (d.doc_id * 31 + t.j) % nn.n),
            adj AS (SELECT u AS w, v AS x FROM e0
                    UNION SELECT v, u FROM e0),
            deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w),
            wt AS (SELECT w, CAST(floor(1000000.0
                       * (1.0 / ln(CAST(d AS DOUBLE)))) AS BIGINT) AS wq
                   FROM deg),
            wed AS (SELECT a.w, a.x AS lo, b.x AS hi
                    FROM adj a JOIN adj b ON a.w = b.w AND a.x < b.x),
            sc AS (SELECT lo, hi, CAST(sum(wt.wq) AS BIGINT) AS aa_unats,
                          count(*) AS common_n
                   FROM wed JOIN wt ON wt.w = wed.w GROUP BY lo, hi),
            fin AS (SELECT * FROM sc WHERE NOT EXISTS (
                        SELECT 1 FROM adj
                        WHERE adj.w = sc.lo AND adj.x = sc.hi))
            SELECT lo, hi, aa_unats, common_n FROM fin
            ORDER BY aa_unats DESC, lo, hi LIMIT 100
        """,
        "sequence_packing": """
            WITH tok AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS t
                FROM documents
            ), c AS (
                SELECT t,
                       sum(t) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - t AS excl
                FROM tok
            )
            -- BIGINT casts: HUGEINT sums render float64 in pandas and the
            -- driver's value-hash is representation-sensitive (q12 lesson)
            SELECT CAST(excl // 2048 AS BIGINT) AS pack_id,
                   count(*) AS n_docs,
                   CAST(sum(t) AS BIGINT) AS total_tokens
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "embedding_near_dups": """
            SELECT e1.vec_id AS a, e2.vec_id AS b,
                   round(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                                CAST(e2.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                         CAST(e2.embedding AS DOUBLE[])) >= 0.35
            ORDER BY a, b
        """,
    }
