"""Streaming synthetic page generator for benchmarks.

Produces the Common-Crawl-style table ``(url, warc_ts, html, text, lang)``
deterministically from row indexes, as a lazy ``ray.data.range(n)`` →
``map_batches`` pipeline — no driver-side materialization, so bench inputs
scale to any row count and stream with backpressure like a real corpus read.
All per-batch work is vectorized (numpy / pandas str ops — no row loops).
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa

import ray.data as rd

from ..synth import LANGS, _WORDS


_WORD_ARR = pa.array(_WORDS, type=pa.string())
_LANG_ARR = pa.array(LANGS, type=pa.string())


ALL_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def _gen_batch(batch: pa.Table, columns=ALL_COLUMNS) -> pa.Table:
    """Pure-Arrow generation: every column is built by pyarrow.compute
    kernels (dictionary takes + binary joins) — zero Python objects per row,
    which is what keeps this stage cheap on allocation-constrained hosts.
    ``columns`` models a pruned ``read_parquet(columns=...)``: unrequested
    columns (html is by far the largest) are never materialized."""
    import pyarrow.compute as pc

    idx = batch["id"].to_numpy().astype(np.int64)
    h = idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    cols: dict = {}
    if "url" in columns:
        host = pc.cast(pa.array(idx % 97), pa.string())
        ids = pc.cast(pa.array(idx), pa.string())
        cols["url"] = pc.binary_join_element_wise("https://site", host, ".example/page/", ids, "")
    if "warc_ts" in columns:
        cols["warc_ts"] = pa.array(
            np.int64(1_600_000_000_000_000) + (idx % 10**9) * 1000, type=pa.timestamp("us"))
    text = None
    if "text" in columns or "html" in columns:
        # deterministic pseudo-text: 12 dictionary words per row, joined in C
        parts = []
        for j in range(12):
            sel = ((h >> np.uint64((j * 5) % 48)) % np.uint64(len(_WORDS))).astype(np.int64)
            parts.append(_WORD_ARR.take(pa.array(sel)))
        text = pc.binary_join_element_wise(*parts, " ")
    if "html" in columns:
        from ..functions.htmltext import wrap_html

        cols["html"] = wrap_html(text, pc.cast(pa.array(idx), pa.string()))
    if "text" in columns:
        cols["text"] = text
    if "lang" in columns:
        cols["lang"] = _LANG_ARR.take(pa.array((h % np.uint64(len(LANGS))).astype(np.int64)))
    return pa.table({c: cols[c] for c in ALL_COLUMNS if c in cols})


def synth_pages_ds(n: int, parallelism: int = -1, columns=ALL_COLUMNS) -> rd.Dataset:
    from ..rayctx import ensure_tuned

    ensure_tuned()
    return rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        lambda b: _gen_batch(b, columns), batch_format="pyarrow", batch_size=65536
    )
