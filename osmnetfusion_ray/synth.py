"""Deterministic synthetic inputs: a street network "city" + web-page table.

BASELINE.json input_hint mandates building over a Common-Crawl-style table
``(url, warc_ts, html, text, lang)`` synthesized deterministically at small
scale — no external data. The city generator mirrors the shape of the
reference's Munich_TEST fixture (nodes/edges GeoDataFrames with the OSM tag
universe of configFile.py:54-104): a jittered street grid with highway-type
hierarchy, curved edges (to exercise splitCurves, p3_functions.py:99-234),
oneway pairs, messy list-string tags (to exercise clean/listify,
p3_functions.py:1083-1219), plus the enrichment dim tables
(FIXTURES.md §4).

Everything is seeded; the same (seed, size) always produces byte-identical
tables. Generators return ``pyarrow.Table`` so callers can go straight to
``ray.data.from_arrow`` or write Parquet.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from . import geom

# Munich_TEST-like bbox (FIXTURES.md: lon∈[11.55,11.60], lat∈[48.12,48.16])
BBOX = (11.54, 48.12, 11.62, 48.18)  # lon_min, lat_min, lon_max, lat_max

HIGHWAY_TYPES = [
    "trunk", "primary", "secondary", "tertiary", "residential",
    "cycleway", "path", "footway", "pedestrian", "service", "steps",
]
LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "pl"]


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# street network
# ---------------------------------------------------------------------------

def synth_city(n: int = 12, seed: int = 42, satellites: int = 0) -> tuple[pa.Table, pa.Table]:
    """An ``n x n`` jittered street grid → (nodes, edges) Arrow tables.

    Nodes: osmid, x, y, street_count, highway, crossing, geometry(WKB).
    Edges: u, v, key, osmid, highway, oneway, reversed, length, geometry(WKB)
    + the tag columns the enrichment cascade reads.

    ``satellites`` > 0 adds that many two-node "islands" (bus-stop /
    traffic-island pairs ~8 m apart, offset ~10 m from an edge midpoint,
    joined by a short path edge). They make the node-buffer clustering and
    cluster-buffer edge splitting of the simplification pipeline meaningful
    — dense-city geometry the plain grid (~hundreds of meters spacing)
    doesn't produce.
    """
    rng = _rng(seed)
    lon0, lat0, lon1, lat1 = BBOX
    # constant street density: past n=150 the fixed bbox would pack
    # intersections closer than twice the largest node-buffer radius
    # (30 m spacing at n=200 vs 18 m trunk buffers), chaining every buffer
    # disk into ONE giant cluster — a geometry no real city has (a bigger
    # city is more AREA, not denser corners). Scaling the extent keeps
    # spacing at the n=150 level; n <= 150 (all tests, golden snapshots)
    # is bit-identical to before.
    s = max(1.0, n / 150.0)
    _cx, _cy = (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0
    lon0, lon1 = _cx + (lon0 - _cx) * s, _cx + (lon1 - _cx) * s
    lat0, lat1 = _cy + (lat0 - _cy) * s, _cy + (lat1 - _cy) * s
    xs = np.linspace(lon0 + 0.004, lon1 - 0.004, n)
    ys = np.linspace(lat0 + 0.004, lat1 - 0.004, n)
    gx, gy = np.meshgrid(xs, ys)
    jitter = (rng.rand(2, n, n) - 0.5) * (xs[1] - xs[0]) * 0.25
    node_x = (gx + jitter[0]).ravel()
    node_y = (gy + jitter[1]).ravel()
    n_nodes = n * n
    osmid = np.arange(1000, 1000 + n_nodes, dtype=np.int64)

    node_hw = np.where(rng.rand(n_nodes) < 0.15, "traffic_signals", "")
    node_crossing = np.where(rng.rand(n_nodes) < 0.1, "marked", "")

    # edges: 4-neighborhood grid; most streets bidirectional (two directed rows)
    def nid(i, j):
        return i * n + j

    u_list, v_list, hw_list, curved = [], [], [], []
    for i in range(n):
        for j in range(n):
            if j + 1 < n:
                u_list.append(nid(i, j)); v_list.append(nid(i, j + 1))
                hw_list.append(_row_highway(i, n)); curved.append(False)
            if i + 1 < n:
                u_list.append(nid(i, j)); v_list.append(nid(i + 1, j))
                hw_list.append(_col_highway(j, n)); curved.append((i + j) % 7 == 0)
    u = np.asarray(u_list, dtype=np.int64)
    v = np.asarray(v_list, dtype=np.int64)
    hw = np.asarray(hw_list, dtype=object)
    curved = np.asarray(curved)

    # satellite islands: two close nodes beside the midpoint of a host edge
    if satellites > 0:
        n_sat = min(satellites, len(u))
        step = max(1, len(u) // n_sat)
        host = np.arange(0, len(u), step)[:n_sat]
        hx0, hy0 = node_x[u[host]], node_y[u[host]]
        hx1, hy1 = node_x[v[host]], node_y[v[host]]
        mxv, myv = 0.5 * (hx0 + hx1), 0.5 * (hy0 + hy1)
        # unit vectors along / perpendicular to the host edge, in meters
        m_lon = 111_132.0 * np.cos(np.radians(myv))
        m_lat = 111_132.0
        dxm, dym = (hx1 - hx0) * m_lon, (hy1 - hy0) * m_lat
        norm = np.hypot(dxm, dym)
        norm[norm == 0] = 1.0
        tx, ty = dxm / norm, dym / norm
        px_, py_ = -ty, tx
        off = 7.0  # meters off the edge (inside the 10 m path-node buffer)
        half = 4.0  # half-distance between the island pair
        ax_ = mxv + (px_ * off - tx * half) / m_lon
        ay_ = myv + (py_ * off - ty * half) / m_lat
        bx_ = mxv + (px_ * off + tx * half) / m_lon
        by_ = myv + (py_ * off + ty * half) / m_lat
        sat_x = np.empty(2 * n_sat)
        sat_y = np.empty(2 * n_sat)
        sat_x[0::2], sat_x[1::2] = ax_, bx_
        sat_y[0::2], sat_y[1::2] = ay_, by_
        first = n_nodes
        node_x = np.concatenate([node_x, sat_x])
        node_y = np.concatenate([node_y, sat_y])
        sat_u = first + 2 * np.arange(n_sat)
        sat_v = sat_u + 1
        u = np.concatenate([u, sat_u])
        v = np.concatenate([v, sat_v])
        hw = np.concatenate([hw, np.asarray(["path"] * n_sat, dtype=object)])
        curved = np.concatenate([curved, np.zeros(n_sat, dtype=bool)])
        n_nodes = n_nodes + 2 * n_sat
        osmid = np.arange(1000, 1000 + n_nodes, dtype=np.int64)
        node_hw = np.concatenate([node_hw, np.asarray([""] * 2 * n_sat, dtype=object)])
        node_crossing = np.concatenate([node_crossing, np.asarray([""] * 2 * n_sat, dtype=object)])

    oneway_base = rng.rand(len(u)) < 0.2
    # bidirectional edges appear twice (u→v and v→u reversed), like osmnx output
    uu = np.concatenate([u, v[~oneway_base]])
    vv = np.concatenate([v, u[~oneway_base]])
    hh = np.concatenate([hw, hw[~oneway_base]])
    cc = np.concatenate([curved, curved[~oneway_base]])
    ow = np.concatenate([oneway_base, np.zeros((~oneway_base).sum(), dtype=bool)])
    rev = np.concatenate([np.zeros(len(u), dtype=bool), np.ones((~oneway_base).sum(), dtype=bool)])

    m = len(uu)
    erng = _rng(seed + 1)

    # geometry: straight or curved (sharp midpoint detour, angle > 75°)
    geoms, lengths = [], np.zeros(m)
    for e in range(m):
        ax, ay = node_x[uu[e]], node_y[uu[e]]
        bx, by = node_x[vv[e]], node_y[vv[e]]
        if cc[e]:
            # L-shaped detour → guaranteed sharp angle for splitCurves
            midx, midy = ax + (bx - ax) * 0.5, ay
            if abs(by - ay) < 1e-12:
                midx, midy = ax, ay + (bx - ax) * 0.5
            coords = np.array([[ax, ay], [midx, midy], [bx, by]])
        else:
            coords = np.array([[ax, ay], [bx, by]])
        geoms.append(geom.wkb_linestring(coords))
        lengths[e] = geom.polyline_lengths(coords, np.array([0, len(coords)]))[0]

    edge_osmid = np.arange(50_000, 50_000 + m, dtype=np.int64)

    def pick(vals, probs):
        return erng.choice(np.asarray(vals, dtype=object), size=m, p=probs)

    tags = {
        "bicycle": pick(["", "yes", "no", "designated", "use_sidepath"], [0.6, 0.15, 0.1, 0.1, 0.05]),
        "foot": pick(["", "yes", "no", "designated"], [0.6, 0.2, 0.1, 0.1]),
        "segregated": pick(["", "yes", "no"], [0.8, 0.1, 0.1]),
        "cycleway": pick(["", "lane", "track", "opposite", "shared_busway", "opposite_lane"], [0.7, 0.08, 0.08, 0.06, 0.04, 0.04]),
        "cycleway:left": pick(["", "lane", "track"], [0.85, 0.08, 0.07]),
        "cycleway:right": pick(["", "lane", "track"], [0.85, 0.08, 0.07]),
        "cycleway:both": pick(["", "lane"], [0.92, 0.08]),
        "cycleway:lane": pick(["", "advisory", "exclusive"], [0.85, 0.08, 0.07]),
        "cycleway:left:lane": pick(["", "advisory", "exclusive"], [0.9, 0.05, 0.05]),
        "cycleway:right:lane": pick(["", "advisory", "exclusive"], [0.9, 0.05, 0.05]),
        "cycleway:left:bicycle": pick(["", "designated"], [0.9, 0.1]),
        "cycleway:right:bicycle": pick(["", "designated"], [0.9, 0.1]),
        "cycleway:both:bicycle": pick(["", "designated"], [0.95, 0.05]),
        "cycleway:right:oneway": pick(["", "yes", "no", "-1"], [0.85, 0.05, 0.05, 0.05]),
        "cycleway:left:oneway": pick(["", "yes", "no"], [0.9, 0.05, 0.05]),
        "bicycle:backward": pick(["", "track"], [0.95, 0.05]),
        "bicycle:forward": pick(["", "track"], [0.95, 0.05]),
        "oneway:bicycle": pick(["", "no", "yes"], [0.8, 0.12, 0.08]),
        "bicycle_road": pick(["", "yes"], [0.95, 0.05]),
        "sidewalk": pick(["", "both", "left", "right", "no"], [0.6, 0.15, 0.08, 0.08, 0.09]),
        "lit": pick(["", "yes", "no"], [0.5, 0.35, 0.15]),
        "surface": pick(["", "asphalt", "paving_stones", "gravel", "['asphalt', 'gravel']"], [0.4, 0.3, 0.15, 0.1, 0.05]),
        "smoothness": pick(["", "good", "intermediate", "bad"], [0.7, 0.15, 0.1, 0.05]),
        "incline": pick(["", "up", "down", "5%"], [0.85, 0.05, 0.05, 0.05]),
        "width": pick(["", "2", "3.5", "['2', '3']"], [0.7, 0.12, 0.12, 0.06]),
        "lanes": pick(["", "1", "2", "3", "['1', '2']"], [0.5, 0.2, 0.18, 0.07, 0.05]),
        "maxspeed": pick(["", "30", "50", "['30', '50']"], [0.4, 0.3, 0.22, 0.08]),
        "parking:lane:left": pick(["", "parallel", "no_parking"], [0.85, 0.1, 0.05]),
        "parking:lane:right": pick(["", "parallel", "no_parking"], [0.85, 0.1, 0.05]),
        "parking:lane:both": pick(["", "parallel"], [0.93, 0.07]),
        "ramp:bicycle": pick(["", "yes"], [0.97, 0.03]),
        "cycleway:surface": pick(["", "asphalt"], [0.95, 0.05]),
        "cycleway:width": pick(["", "1.5"], [0.96, 0.04]),
        "access": pick(["", "yes", "private"], [0.85, 0.1, 0.05]),
        # osmnx artifact columns: duplicate surface/width/smoothness values
        # under positional names (reference coalesces them,
        # p2_enrichData.py:735-737 — the M5 merge_similar_columns path)
        "_30": pick(["", "asphalt", "sett"], [0.9, 0.06, 0.04]),
        "_36": pick(["", "2.5", "4"], [0.92, 0.05, 0.03]),
        "_40": pick(["", "excellent", "horrible"], [0.92, 0.05, 0.03]),
    }

    nodes = pa.table(
        {
            "osmid": pa.array(osmid),
            "x": pa.array(node_x),
            "y": pa.array(node_y),
            "street_count": pa.array(np.full(n_nodes, 4, dtype=np.int32)),
            "highway": pa.array(node_hw.tolist(), type=pa.string()),
            "crossing": pa.array(node_crossing.tolist(), type=pa.string()),
            "geometry": pa.array(geom.wkb_points(node_x, node_y), type=pa.binary()),
        }
    )
    edges_cols = {
        "u": pa.array(osmid[uu]),
        "v": pa.array(osmid[vv]),
        "key": pa.array(np.zeros(m, dtype=np.int32)),
        "osmid": pa.array(edge_osmid),
        "highway": pa.array(hh.tolist(), type=pa.string()),
        "oneway": pa.array(ow),
        "reversed": pa.array(rev),
        "length": pa.array(lengths),
        "geometry": pa.array(geoms, type=pa.binary()),
    }
    for k, val in tags.items():
        edges_cols[k] = pa.array(val.tolist(), type=pa.string())
    return nodes, pa.table(edges_cols)


def _row_highway(i: int, n: int) -> str:
    if i == n // 2:
        return "primary"
    if i % 4 == 0:
        return "secondary"
    if i % 2 == 0:
        return "residential"
    return "cycleway" if i % 5 == 1 else "footway"


def _col_highway(j: int, n: int) -> str:
    if j == n // 2:
        return "trunk"
    if j % 4 == 1:
        return "tertiary"
    if j % 3 == 0:
        return "residential"
    return "service" if j % 5 == 2 else "path"


# ---------------------------------------------------------------------------
# enrichment dim tables (FIXTURES.md §4)
# ---------------------------------------------------------------------------

def synth_dim_tables(nodes: pa.Table, seed: int = 42) -> dict[str, pa.Table]:
    rng = _rng(seed + 7)
    nx = nodes["x"].to_numpy()
    ny = nodes["y"].to_numpy()
    n_nodes = len(nx)

    def near_nodes(k, max_off_m):
        idx = rng.choice(n_nodes, size=k, replace=True)
        mx, my = geom.m_per_deg(ny[idx])
        dx = (rng.rand(k) * 2 - 1) * max_off_m / mx
        dy = (rng.rand(k) * 2 - 1) * max_off_m / my
        return nx[idx] + dx, ny[idx] + dy, idx

    # landuse point features (polygon park features are appended at the end
    # of this function so the rng draw order of every other dim is stable)
    glon, glat, _ = near_nodes(max(20, n_nodes // 3), 30)
    green_kinds = rng.choice(["grass", "forest", "meadow"], len(glon)).tolist()
    rlon, rlat, _ = near_nodes(max(10, n_nodes // 6), 40)
    landuse_retail = pa.table(
        {
            "geometry": pa.array(geom.wkb_points(rlon, rlat), type=pa.binary()),
            "shop": pa.array(rng.choice(["supermarket", "bakery", "kiosk"], len(rlon)).tolist()),
            "geom_type": pa.array(["Point"] * len(rlon)),
        }
    )
    blon, blat, _ = near_nodes(max(15, n_nodes // 4), 25)
    buildings = pa.table(
        {
            "geometry": pa.array(geom.wkb_points(blon, blat), type=pa.binary()),
            "building": pa.array(rng.choice(["yes", "apartments", "house"], len(blon)).tolist()),
            "geom_type": pa.array(["Point"] * len(blon)),
        }
    )

    # traffic signals within 20 m of some nodes; id format "node/123"
    sidx = rng.choice(n_nodes, size=max(5, n_nodes // 10), replace=False)
    smx, smy = geom.m_per_deg(ny[sidx])
    slon = nx[sidx] + (rng.rand(len(sidx)) * 2 - 1) * 8 / smx
    slat = ny[sidx] + (rng.rand(len(sidx)) * 2 - 1) * 8 / smy
    traffic_signals = pa.table(
        {
            "id": pa.array([f"node/{9000 + i}" for i in range(len(sidx))]),
            "highway": pa.array(["traffic_signals"] * len(sidx)),
            "geometry": pa.array(geom.wkb_points(slon, slat), type=pa.binary()),
        }
    )

    # PT stops: rows per (relation, member); ≥4 occurrences per kept member_ref
    n_routes = 6
    stops_per_route = 8
    rows = {"relation_id": [], "mode": [], "member_ref": [], "name": [], "lon": [], "lat": []}
    for r in range(n_routes):
        member_idx = rng.choice(n_nodes, size=stops_per_route, replace=False)
        for k, mi in enumerate(member_idx):
            for rep in range(5 if r < 3 else 1):  # first 3 routes pass frequency filter
                rows["relation_id"].append(100 + r * 10 + rep)
                rows["mode"].append(["bus", "tram", "trolleybus"][r % 3])
                rows["member_ref"].append(int(7000 + mi))
                rows["name"].append(f"Stop {mi}")
                rows["lon"].append(float(nx[mi]))
                rows["lat"].append(float(ny[mi]))
    pt_stops = pa.table(
        {
            "relation_id": pa.array(rows["relation_id"], type=pa.int64()),
            "mode": pa.array(rows["mode"]),
            "member_ref": pa.array(rows["member_ref"], type=pa.int64()),
            "name": pa.array(rows["name"]),
            "geometry": pa.array(
                geom.wkb_points(np.asarray(rows["lon"]), np.asarray(rows["lat"])), type=pa.binary()
            ),
        }
    )

    # bike amenities within 200 m of edges
    alon, alat, _ = near_nodes(max(8, n_nodes // 12), 120)
    bike_amenities = pa.table(
        {
            "amenity": pa.array(["bicycle_parking"] * len(alon)),
            "bicycle_parking": pa.array(rng.choice(["stands", "wall_loops", "shed"], len(alon)).tolist()),
            "capacity": pa.array(rng.choice(["4", "10", "20"], len(alon)).tolist()),
            "geometry": pa.array(geom.wkb_points(alon, alat), type=pa.binary()),
        }
    )

    # elevations: one row per node index (p1_getOtherData.py:79-80 format)
    elev = 500.0 + 30.0 * np.sin(nx * 40) * np.cos(ny * 40) + rng.rand(n_nodes) * 5
    elevations = pa.table(
        {"idx": pa.array(np.arange(n_nodes, dtype=np.int64)), "elevation": pa.array(np.round(elev, 2))}
    )

    # cycle path widths keyed by edge osmid, with duplicates (groupby-min)
    n_w = max(10, n_nodes // 5)
    wid_osmid = rng.randint(50_000, 50_000 + n_nodes * 2, size=n_w).astype(np.int64)
    wid_osmid = np.concatenate([wid_osmid, wid_osmid[: n_w // 3]])  # dups
    widths = np.round(1.0 + rng.rand(len(wid_osmid)) * 2.0, 2)
    cycle_path_widths = pa.table(
        {"osmid": pa.array(wid_osmid), "width_cycle_path": pa.array(widths)}
    )

    # landuse POLYGON features (parks — the J2 path, p2_enrichData.py:119-151:
    # buffered polygon ∩ edge ratio); drawn last to keep prior streams stable
    plon, plat, _ = near_nodes(max(6, n_nodes // 16), 40)
    half_w = 30.0 + rng.rand(len(plon)) * 60.0   # meters
    half_h = 30.0 + rng.rand(len(plon)) * 60.0
    pmx, pmy = geom.m_per_deg(plat)
    poly_wkb = []
    for i in range(len(plon)):
        dx, dy = half_w[i] / pmx[i], half_h[i] / pmy[i]
        ring = np.array([
            [plon[i] - dx, plat[i] - dy], [plon[i] + dx, plat[i] - dy],
            [plon[i] + dx, plat[i] + dy], [plon[i] - dx, plat[i] + dy],
            [plon[i] - dx, plat[i] - dy],
        ])
        poly_wkb.append(geom.wkb_polygon(ring))
    landuse_green = pa.table(
        {
            "geometry": pa.array(
                geom.wkb_points(glon, glat) + poly_wkb, type=pa.binary()),
            "landuse": pa.array(green_kinds + ["park"] * len(plon)),
            "geom_type": pa.array(["Point"] * len(glon) + ["Polygon"] * len(plon)),
        }
    )

    return {
        "landuse_green": landuse_green,
        "landuse_retail": landuse_retail,
        "buildings": buildings,
        "traffic_signals": traffic_signals,
        "pt_stops": pt_stops,
        "bike_amenities": bike_amenities,
        "elevations": elevations,
        "cycle_path_widths": cycle_path_widths,
    }


# ---------------------------------------------------------------------------
# web pages (input_hint table)
# ---------------------------------------------------------------------------

_WORDS = (
    "street map city network bicycle transit route urban open data page "
    "article news shop review travel guide local traffic park river bridge"
).split()


def page_text(i: int) -> str:
    """Deterministic pseudo-text for page i (stable across processes)."""
    h = int.from_bytes(hashlib.md5(f"text-{i}".encode()).digest()[:8], "big")
    k = 20 + h % 80
    words = [_WORDS[(h >> (j % 48)) % len(_WORDS)] for j in range(k)]
    return " ".join(words)


def geocode_url(urls) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic url → (lon, lat) in BBOX (delegates to the engine's
    vectorized geocode so synth fixtures and pipeline stages agree)."""
    from .functions import hashing

    return hashing.geocode(urls, bbox=BBOX)


def synth_pages(n_pages: int = 2000, seed: int = 42) -> pa.Table:
    """The Common-Crawl-style input table (url, warc_ts, html, text, lang)."""
    rng = _rng(seed + 13)
    urls = [f"https://site{i % 97}.example/page/{i}" for i in range(n_pages)]
    texts = [page_text(i) for i in range(n_pages)]
    from .functions.htmltext import wrap_html

    htmls = wrap_html(pa.array(texts), pa.array([str(i) for i in range(n_pages)]))
    ts = (1_600_000_000_000_000 + rng.randint(0, 10**9, size=n_pages).astype(np.int64) * 1000)
    langs = rng.choice(np.asarray(LANGS, dtype=object), size=n_pages, p=[0.4, 0.2, 0.1, 0.08, 0.07, 0.06, 0.05, 0.04])
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": htmls,
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def synth_pt_relations(nodes: pa.Table, seed: int = 42) -> dict[str, pa.Table]:
    """PBF-SHAPED pre-extracted relation rows (S4 scale path): the osmium
    ``SimpleHandler``'s node/way/relation dicts
    (p1_getFurtherOSMData.py:93-117) flattened into four Arrow tables —
    the form a PBF extract takes after a trivial streaming pre-pass, and
    the input contract of ``pipelines.network.parse_pt_relations``:

    - ``rel_tags``   (relation_id, route, name, operator, ref, network,
      rel_from, rel_to) — one row per route relation; some names NULL to
      exercise the fallback;
    - ``rel_members`` (relation_id, seq, member_type 'n'|'w', member_ref,
      role) — one row per relation member in relation order;
    - ``osm_nodes``  (node_id, lon, lat);
    - ``osm_ways``   (way_id, seq, node_id) — flattened way-node lists.

    Recipe mirrors ``synth_dim_tables``'s pt_stops stream (6 routes × 8
    node-member stops; the first 3 routes replicated 5× so their members
    pass the J10 frequency filter) plus one 3-node ``platform`` WAY member
    per route exercising the LineString assembly. Node ids reuse the
    7000+idx scheme; way ids are 9_000_000+route — disjoint from node ids
    for ANY city below ~9M nodes (the J10 dedup keys on member_ref across
    BOTH member kinds, so the ref spaces must never collide)."""
    rng = _rng(seed + 7)
    nx = nodes["x"].to_numpy()
    ny = nodes["y"].to_numpy()
    n_nodes = len(nx)

    modes = ["bus", "tram", "trolleybus"]
    t_rows: list[tuple] = []
    m_rows: list[tuple] = []
    w_rows: list[tuple] = []
    n_routes, stops_per_route = 6, 8
    for r in range(n_routes):
        member_idx = rng.choice(n_nodes, size=stops_per_route, replace=False)
        for rep in range(5 if r < 3 else 1):
            rid = 100 + r * 10 + rep
            t_rows.append((rid, modes[r % 3],
                           None if r % 4 == 0 else f"Route {r}",
                           f"Operator {r % 2}", str(10 + r), "CityNet",
                           "Terminal A", "Terminal B"))
            for k, mi in enumerate(member_idx):
                m_rows.append((rid, k, "n", int(7000 + mi), "stop"))
            m_rows.append((rid, stops_per_route, "w", 9_000_000 + r,
                           "platform"))
    for r in range(n_routes):
        base = (r * 11) % max(n_nodes - 3, 1)
        for s in range(3):
            w_rows.append((9_000_000 + r, s, int(7000 + base + s)))

    rel_tags = pa.table({
        "relation_id": pa.array([t[0] for t in t_rows], type=pa.int64()),
        "route": pa.array([t[1] for t in t_rows]),
        "name": pa.array([t[2] for t in t_rows], type=pa.string()),
        "operator": pa.array([t[3] for t in t_rows]),
        "ref": pa.array([t[4] for t in t_rows]),
        "network": pa.array([t[5] for t in t_rows]),
        "rel_from": pa.array([t[6] for t in t_rows]),
        "rel_to": pa.array([t[7] for t in t_rows]),
    })
    rel_members = pa.table({
        "relation_id": pa.array([m[0] for m in m_rows], type=pa.int64()),
        "seq": pa.array([m[1] for m in m_rows], type=pa.int64()),
        "member_type": pa.array([m[2] for m in m_rows]),
        "member_ref": pa.array([m[3] for m in m_rows], type=pa.int64()),
        "role": pa.array([m[4] for m in m_rows]),
    })
    osm_nodes = pa.table({
        "node_id": pa.array(7000 + np.arange(n_nodes, dtype=np.int64)),
        "lon": pa.array(nx.astype(np.float64)),
        "lat": pa.array(ny.astype(np.float64)),
    })
    osm_ways = pa.table({
        "way_id": pa.array([w[0] for w in w_rows], type=pa.int64()),
        "seq": pa.array([w[1] for w in w_rows], type=pa.int64()),
        "node_id": pa.array([w[2] for w in w_rows], type=pa.int64()),
    })
    return {"rel_tags": rel_tags, "rel_members": rel_members,
            "osm_nodes": osm_nodes, "osm_ways": osm_ways}
