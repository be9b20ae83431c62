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


def _gen_batch(batch: pa.Table) -> pa.Table:
    """Pure-Arrow generation: every column is built by pyarrow.compute
    kernels (dictionary takes + binary joins) — zero Python objects per row,
    which is what keeps this stage cheap on allocation-constrained hosts."""
    import pyarrow.compute as pc

    idx = batch["id"].to_numpy().astype(np.int64)
    h = idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    host = pc.cast(pa.array(idx % 97), pa.string())
    ids = pc.cast(pa.array(idx), pa.string())
    url = pc.binary_join_element_wise("https://site", host, ".example/page/", ids, "")

    # deterministic pseudo-text: 12 dictionary words per row, joined in C
    parts = []
    for j in range(12):
        sel = ((h >> np.uint64((j * 5) % 48)) % np.uint64(len(_WORDS))).astype(np.int64)
        parts.append(_WORD_ARR.take(pa.array(sel)))
    text = pc.binary_join_element_wise(*parts, " ")

    ts = pa.array(np.int64(1_600_000_000_000_000) + (idx % 10**9) * 1000, type=pa.timestamp("us"))
    lang = _LANG_ARR.take(pa.array((h % np.uint64(len(LANGS))).astype(np.int64)))
    html = pc.cast(pc.binary_join_element_wise("<html><body>", text, "</body></html>", ""), pa.binary())
    return pa.table(
        {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}
    )


def synth_pages_ds(n: int, parallelism: int = -1) -> rd.Dataset:
    from ..rayctx import ensure_tuned

    ensure_tuned()
    return rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        _gen_batch, batch_format="pyarrow", batch_size=65536
    )
