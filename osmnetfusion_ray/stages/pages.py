"""Page-side stages: geocode → cell-encode → checksum (the "minimum slice"
of SURVEY.md §7.2), all zero-copy Arrow ``map_batches`` kernels.

The pages table is the 10^12-row side; these stages are stateless,
vectorized, and never shuffle it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cells
from ..functions import hashing


def geocode_cells_batch(batch: pa.Table, res: int = cells.RES_JOIN, bbox=hashing.DEFAULT_BBOX) -> pa.Table:
    """Add (lon, lat, cell, text_hash) to a pages batch.

    - lon/lat: deterministic url geocode (hashing.geocode)
    - cell: uint64 Morton cell id at ``res`` (cells.cell_of)
    - text_hash: uint64 checksum of ``text`` for the byte-identical invariant
    """
    lon, lat = hashing.geocode(batch["url"], bbox=bbox)
    cell = cells.cell_of(lon, lat, res)
    th = hashing.text_checksum(batch["text"])
    return (
        batch.append_column("lon", pa.array(lon))
        .append_column("lat", pa.array(lat))
        .append_column("cell", pa.array(cell, type=pa.uint64()))
        .append_column("text_hash", pa.array(th, type=pa.uint64()))
    )


def geocode_cells_batch_docid(batch: pa.Table, res: int = cells.RES_JOIN,
                              bbox=hashing.DEFAULT_BBOX) -> pa.Table:
    """SQL-mirrorable geocode variant: (lon, lat) from the Knuth hash of
    ``doc_id`` (same arithmetic as corpus.doc_geocode_batch — integer ops +
    IEEE doubles a DuckDB oracle reproduces bit-exactly), so the flagship
    page→network join can be hard-checked end-to-end. The url-hash variant
    (:func:`geocode_cells_batch`) stays the default for corpora without a
    numeric id."""
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    h = (doc_id.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    fx = (h % np.uint64(65536)).astype(np.float64) / 65536.0
    fy = (h // np.uint64(65536)).astype(np.float64) / 65536.0
    lon0, lat0, lon1, lat1 = bbox
    lon = lon0 + fx * (lon1 - lon0)
    lat = lat0 + fy * (lat1 - lat0)
    cell = cells.cell_of(lon, lat, res)
    th = hashing.text_checksum(batch["text"])
    return (
        batch.append_column("lon", pa.array(lon))
        .append_column("lat", pa.array(lat))
        .append_column("cell", pa.array(cell, type=pa.uint64()))
        .append_column("text_hash", pa.array(th, type=pa.uint64()))
    )


class GeocodeCells:
    """Actor-pool form of :func:`geocode_cells_batch` (state = bbox/res only;
    kept as a class so pipelines can pin ``concurrency``)."""

    def __init__(self, res: int = cells.RES_JOIN, bbox=hashing.DEFAULT_BBOX):
        self.res = res
        self.bbox = bbox

    def __call__(self, batch: pa.Table) -> pa.Table:
        return geocode_cells_batch(batch, res=self.res, bbox=self.bbox)


def verify_text_invariant(batch: pa.Table) -> pa.Table:
    """Re-hash ``text`` and compare to the carried ``text_hash`` — any stage
    that mutated a page's text fails loudly here (sink-side assert)."""
    th = hashing.text_checksum(batch["text"])
    carried = batch["text_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    if not (th == carried).all():
        bad = batch["url"].take(pa.array(np.flatnonzero(th != carried))).to_pylist()
        raise AssertionError(f"text invariant violated for urls: {bad[:5]}")
    return batch
