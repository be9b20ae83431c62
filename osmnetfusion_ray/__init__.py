"""osmnetfusion_ray — a Ray-Data-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query/transform semantics of the
reference OSMNetFusion pipeline (multimodal street-network simplification +
enrichment), re-expressed as ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow, actor pools for stateful stages, and explicit
groupby / repartition shuffles — plus the web-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
Common-Crawl-style corpus pipeline needs.

Layout
------
- ``cells``      hierarchical Morton/Z-order cell codec (H3/S2-style, uint64)
- ``geom``       numpy geometry kernels (haversine, PIP, buffers, WKB, kNN)
- ``schema``     pyarrow schemas for every logical table
- ``synth``      deterministic synthetic city + web-page generators
- ``sources``    parquet readers / writers with column pruning + manifests
- ``functions``  scalar/batch kernels (clean, listify, text stats, hashing)
- ``stages``     one module per operator family (rank, cycleway, cluster, ...)
- ``pipelines``  composed end-to-end pipelines (enrich, simplify, page join,
                 dedup, ann)
- ``state``      broadcast helpers, per-tile index state, checkpoint manifests

No module in this package calls ``ray.init()``; sessions are owned by the
caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
