"""Driver-side parquet fixtures for the network-chain DuckDB oracles.

The driver's correctness gate registers only the corpus tables (region …
embeddings) as DuckDB views; the street-network inputs are the engine's own
deterministic synthesis (BASELINE.json input_hint: no external data). To
oracle the network operators, the SAME synthetic inputs are written — pure
numpy/pyarrow, no Ray — to a content-versioned path under /tmp that the
oracle SQL reads via ``read_parquet``. Both ``queries()`` callables and
``oracle_sql()`` call :func:`ensure_city_fixture`, so the files exist no
matter which side the driver runs first.

Everything here is INPUT data (synth city + dim tables + derived flat
layouts like exploded segments); no engine pipeline output is involved —
the oracle recomputes the operator semantics independently in SQL. The one
exception is the simplified-network fixture for the contracted-join oracle
(:func:`write_simplified_fixture`), which is documented as a join-only
check at its call site.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import geom, synth

FIXTURE_VERSION = 6
CITY_N = 16
CITY_SEED = 42
REF_LAT = 48.15  # PipelineConfig.ref_lat — the enrich metric's latitude


def fixture_dir(tag: str = "city") -> str:
    return f"/tmp/osmnf_oracle_v{FIXTURE_VERSION}/{tag}_n{CITY_N}_s{CITY_SEED}"


def _write(path: str, table: pa.Table) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _dim_lonlat(tab: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    lons, lats = [], []
    for w in tab["geometry"].to_pylist():
        _, c = geom.wkb_parse(w)
        lons.append(float(c[0, 0]))
        lats.append(float(c[0, 1]))
    return np.asarray(lons), np.asarray(lats)


def filter_pt_stops_table(stops: pa.Table) -> pa.Table:
    """Same J10 prefilter as pipelines.network.filter_pt_stops."""
    df = stops.to_pandas()
    counts = df["member_ref"].value_counts()
    df = df[df["member_ref"].isin(counts[counts > 3].index)]
    df = df.drop_duplicates("member_ref").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def city_tables(n: int = CITY_N, seed: int = CITY_SEED, satellites: int | None = None):
    """The exact input tables of pipelines.network.build_network_inputs."""
    if satellites is None:
        satellites = max(4, n * n // 4)
    nodes_t, edges_t = synth.synth_city(n=n, seed=seed, satellites=satellites)
    dims = synth.synth_dim_tables(nodes_t, seed=seed)
    dims["pt_stops"] = filter_pt_stops_table(dims["pt_stops"])
    return nodes_t, edges_t, dims


def explode_segments(edges_t: pa.Table) -> dict[str, np.ndarray]:
    """Edge WKB polylines → flat segment arrays (same layout as
    stages.enrich._edge_segments / pagejoin.build_network_state)."""
    coords, offsets = geom.wkb_linestrings_to_flat(edges_t["geometry"].to_pylist())
    n_pts = np.diff(offsets)
    seg_edge = np.repeat(np.arange(edges_t.num_rows, dtype=np.int64), n_pts - 1)
    keep = np.ones(len(coords) - 1, dtype=bool) if len(coords) > 1 else np.zeros(0, bool)
    keep[offsets[1:-1] - 1] = False
    ax, ay = coords[:-1, 0][keep], coords[:-1, 1][keep]
    bx, by = coords[1:, 0][keep], coords[1:, 1][keep]
    return {"ax": ax, "ay": ay, "bx": bx, "by": by, "edge_row": seg_edge,
            "coords": coords, "offsets": offsets}


def ensure_city_fixture() -> str:
    """Write (once) every parquet table the network oracles read; returns
    the fixture directory."""
    d = fixture_dir("city")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    nodes_t, edges_t, dims = city_tables()

    # nodes: id + position (+ tag columns)
    _write(os.path.join(d, "nodes.parquet"), pa.table({
        "osmid": nodes_t["osmid"], "x": nodes_t["x"], "y": nodes_t["y"],
        "highway": nodes_t["highway"], "crossing": nodes_t["crossing"],
    }))

    # edges: every scalar column except the WKB geometry
    cols = {name: edges_t[name] for name in edges_t.schema.names if name != "geometry"}
    cols["edge_row"] = pa.array(np.arange(edges_t.num_rows, dtype=np.int64))
    _write(os.path.join(d, "edges.parquet"), pa.table(cols))

    # exploded segments (osmid + positional edge_row for the page join)
    seg = explode_segments(edges_t)
    osmids = edges_t["osmid"].to_numpy()
    _write(os.path.join(d, "edge_segs.parquet"), pa.table({
        "seg_id": pa.array(np.arange(len(seg["ax"]), dtype=np.int64)),
        "osmid": pa.array(osmids[seg["edge_row"]]),
        "edge_row": pa.array(seg["edge_row"]),
        "ax": pa.array(seg["ax"]), "ay": pa.array(seg["ay"]),
        "bx": pa.array(seg["bx"]), "by": pa.array(seg["by"]),
        "seg_len_m": pa.array(geom.haversine_m(seg["ax"], seg["ay"], seg["bx"], seg["by"])),
    }))

    # polyline vertices (split-curves oracle)
    coords, offsets = seg["coords"], seg["offsets"]
    n_pts = np.diff(offsets)
    edge_of_pt = np.repeat(np.arange(edges_t.num_rows, dtype=np.int64), n_pts)
    pt_idx = np.arange(len(coords), dtype=np.int64) - np.repeat(offsets[:-1], n_pts)
    _write(os.path.join(d, "edge_pts.parquet"), pa.table({
        "osmid": pa.array(osmids[edge_of_pt]),
        "pt_idx": pa.array(pt_idx),
        "x": pa.array(coords[:, 0]), "y": pa.array(coords[:, 1]),
        "n_pts": pa.array(n_pts[edge_of_pt]),
    }))

    # elevations keyed by osmid (the engine maps idx → osmid the same way)
    idx = dims["elevations"]["idx"].to_numpy()
    elev = dims["elevations"]["elevation"].to_numpy()
    node_osmids = nodes_t["osmid"].to_numpy()
    m = idx < len(node_osmids)
    _write(os.path.join(d, "elev.parquet"), pa.table({
        "osmid": pa.array(node_osmids[idx[m]]),
        "elevation": pa.array(elev[m]),
    }))

    # landuse POINT features, one row per point with its kind
    kinds = [("green", "landuse_green"), ("retail", "landuse_retail"),
             ("building", "buildings")]
    kk, rr, lo, la = [], [], [], []
    for kind, tname in kinds:
        tab = dims[tname]
        if "geom_type" in tab.schema.names:
            tab = tab.filter(pa.compute.equal(tab["geom_type"], "Point"))
        plon, plat = _dim_lonlat(tab)
        kk += [kind] * len(plon)
        rr += list(range(len(plon)))
        lo += plon.tolist()
        la += plat.tolist()
    _write(os.path.join(d, "landuse_pts.parquet"), pa.table({
        "kind": pa.array(kk), "pt_row": pa.array(rr, type=pa.int64()),
        "lon": pa.array(lo, type=pa.float64()), "lat": pa.array(la, type=pa.float64()),
    }))

    # landuse POLYGON rings (closed; one row per vertex)
    kk2, pr2, vi2, px2, py2 = [], [], [], [], []
    for kind, tname in kinds:
        tab = dims[tname]
        if "geom_type" not in tab.schema.names:
            continue
        ptab = tab.filter(pa.compute.equal(tab["geom_type"], "Polygon"))
        for j, w in enumerate(ptab["geometry"].to_pylist()):
            _, ring = geom.wkb_parse(w)
            kk2 += [kind] * len(ring)
            pr2 += [j] * len(ring)
            vi2 += list(range(len(ring)))
            px2 += ring[:, 0].tolist()
            py2 += ring[:, 1].tolist()
    _write(os.path.join(d, "landuse_polys.parquet"), pa.table({
        "kind": pa.array(kk2), "poly_row": pa.array(pr2, type=pa.int64()),
        "v_idx": pa.array(vi2, type=pa.int64()),
        "x": pa.array(px2, type=pa.float64()), "y": pa.array(py2, type=pa.float64()),
    }))

    # PT stops (post J10 filter, in engine order)
    st = dims["pt_stops"]
    slon, slat = _dim_lonlat(st)
    _write(os.path.join(d, "stops.parquet"), pa.table({
        "stop_row": pa.array(np.arange(len(slon), dtype=np.int64)),
        "name": st["name"], "lon": pa.array(slon), "lat": pa.array(slat),
    }))

    # S4 PBF-shaped relation tables (synth.synth_pt_relations over the same
    # city nodes) — RAW inputs of the parse_pt_relations oracle, which
    # mirrors the whole parse + J10 + kNN chain in SQL
    for rel_name, rel_tab in synth.synth_pt_relations(nodes_t, seed=CITY_SEED).items():
        _write(os.path.join(d, f"{rel_name}.parquet"), rel_tab)

    # bike amenities with the engine's display-name format
    am = dims["bike_amenities"]
    alon, alat = _dim_lonlat(am)
    names = [f"{a} {c}" for a, c in zip(am["amenity"].to_pylist(), am["capacity"].to_pylist())]
    _write(os.path.join(d, "amenities.parquet"), pa.table({
        "am_row": pa.array(np.arange(len(alon), dtype=np.int64)),
        "name": pa.array(names), "lon": pa.array(alon), "lat": pa.array(alat),
    }))

    # cycle path widths
    _write(os.path.join(d, "widths.parquet"), dims["cycle_path_widths"])

    with open(marker, "w") as f:
        f.write("ok")
    return d


# ---------------------------------------------------------------------------
# dense point cloud for the clustering (A1) oracle
# ---------------------------------------------------------------------------

def cluster_points(n_seeds: int = 40, seed: int = 77):
    """Deterministic dense node cloud: ``n_seeds`` cluster seeds, each with
    1-10 member points within ~25 m — chained overlapping buffer disks that
    exercise multi-node components, rep selection and centroid math."""
    rng = np.random.RandomState(seed)
    lon0, lat0, lon1, lat1 = synth.BBOX
    sx = lon0 + rng.rand(n_seeds) * (lon1 - lon0)
    sy = lat0 + rng.rand(n_seeds) * (lat1 - lat0)
    counts = 1 + rng.randint(0, 10, size=n_seeds)
    mlon = geom.M_PER_DEG_LAT * np.cos(np.radians(REF_LAT))
    xs, ys = [], []
    for i in range(n_seeds):
        off = (rng.rand(counts[i], 2) * 2 - 1) * 25.0
        xs.append(sx[i] + off[:, 0] / mlon)
        ys.append(sy[i] + off[:, 1] / geom.M_PER_DEG_LAT)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    n = len(x)
    ranks = np.asarray([10, 9.25, 9, 8, 7, 6, 5.5, 5, 4.5, 4, 3.5])
    radii = np.asarray([18.0, 18.0, 16.0, 14.0, 12.0, 12.0, 10.0, 10.0, 10.0, 6.0, 6.0])
    pick = rng.randint(0, len(ranks), size=n)
    return pa.table({
        "osmid": pa.array(np.arange(5000, 5000 + n, dtype=np.int64)),
        "x": pa.array(x), "y": pa.array(y),
        "highway_rank": pa.array(ranks[pick]),
        "buffer_r": pa.array(radii[pick]),
    })


def city_ref_lats() -> tuple[float, float]:
    """(segment-index, node-index) reference latitudes of the page-join
    state built from the city tables — the medians SegmentGridIndex derives
    (state/index.py:53), computed here from the same arrays so the oracle
    can embed them as literals."""
    nodes_t, edges_t, _ = city_tables()
    seg = explode_segments(edges_t)
    seg_ref = float(np.median(seg["ay"])) if len(seg["ay"]) else 0.0
    node_ref = float(np.median(nodes_t["y"].to_numpy()))
    return seg_ref, node_ref


def write_simplified_fixture(nodes_t: pa.Table, edges_t: pa.Table) -> dict:
    """Fixture for the contracted-network join oracle: the p3 output's
    (nodes, edges) adapted tables. NOTE this fixture IS engine output — the
    oracle built on it checks the JOIN semantics (geocode, kNN snap, buffer
    disks) independently, not the simplification chain itself (that chain is
    covered by the per-stage oracles + pytest)."""
    d = fixture_dir("simp")
    os.makedirs(d, exist_ok=True)
    _write(os.path.join(d, "nodes.parquet"), pa.table({
        "osmid": nodes_t["osmid"], "x": nodes_t["x"], "y": nodes_t["y"]}))
    seg = explode_segments(edges_t)
    _write(os.path.join(d, "edge_segs.parquet"), pa.table({
        "edge_row": pa.array(seg["edge_row"]),
        "ax": pa.array(seg["ax"]), "ay": pa.array(seg["ay"]),
        "bx": pa.array(seg["bx"]), "by": pa.array(seg["by"]),
    }))
    return {
        "dir": d,
        "seg_ref_lat": float(np.median(seg["ay"])) if len(seg["ay"]) else 0.0,
        "node_ref_lat": float(np.median(nodes_t["y"].to_numpy())),
    }


def ensure_cluster_fixture() -> str:
    d = fixture_dir("clust")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    _write(os.path.join(d, "cluster_nodes.parquet"), cluster_points())
    with open(marker, "w") as f:
        f.write("ok")
    return d
