"""Parquet sources with column pruning, and adapters onto the driver's
testdata tables.

Replaces the reference's GPKG / osmnx IO boundary (p1_getOSMNetwork.py:123,
p2_enrichData.py:702-703): every logical table is a Parquet directory read
with ``ray.data.read_parquet(columns=[...])`` so only needed columns leave
storage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               filter=None) -> rd.Dataset:
    """Pruned read of one testdata table. ``filter`` (a pyarrow dataset
    expression) is pushed INTO the parquet scan — row groups whose
    statistics exclude the predicate never leave storage."""
    from ..rayctx import ensure_tuned

    ensure_tuned()
    kwargs = {"columns": columns}
    if filter is not None:
        kwargs["filter"] = filter
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), **kwargs)


def _docs_to_pages(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source, n_chars) → pages(url, warc_ts,
    html, text, lang): a deterministic adapter so the driver's corpus can
    stand in for the Common-Crawl-style input table (BASELINE.json
    input_hint). ``text`` passes through byte-identical — the per-row
    invariant the whole engine must preserve."""
    doc_id = batch["doc_id"]
    url = pc.binary_join_element_wise(
        pa.scalar("https://crawl.example/doc/"), pc.cast(doc_id, pa.string()), ""
    )
    ts = pc.cast(
        pc.add(pa.scalar(1_600_000_000_000_000, type=pa.int64()),
               pc.multiply(pc.cast(doc_id, pa.int64()), pa.scalar(1_000_000, type=pa.int64()))),
        pa.timestamp("us"),
    )
    from ..functions.htmltext import wrap_html

    html = wrap_html(batch["text"], pc.cast(doc_id, pa.string()))
    return pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": batch["text"],
            "lang": batch["lang"],
            "doc_id": pc.cast(doc_id, pa.int64()),
        }
    )


def pages_from_documents(sf_dir: str) -> rd.Dataset:
    """The graft input table built from the driver corpus, streamed."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return ds.map_batches(_docs_to_pages, batch_format="pyarrow")


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER METADATA — zero scan, zero Ray
    tasks. Use this (not ``Dataset.count()`` on a transformed dataset) to
    size join/shuffle pools: counting a filtered dataset executes its whole
    upstream pipeline once, and the join then executes it AGAIN."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows


def column_max(sf_dir: str, name: str, col: str):
    """Column max from parquet ROW-GROUP STATISTICS — zero scan. Falls back
    to a Ray aggregate only if the writer omitted stats."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata
    idx = md.schema.to_arrow_schema().get_field_index(col)
    vals = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        if st is None or not st.has_min_max:
            return read_table(sf_dir, name, columns=[col]).max(col)
        vals.append(st.max)
    return max(vals)
