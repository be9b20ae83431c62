"""DuckDB oracle SQL for the network-chain queries (netqueries.py).

Each SQL string recomputes one operator's semantics INDEPENDENTLY from the
parquet fixture written by netfixture — same arithmetic, same IEEE-754 op
order, with the equirectangular metric constants embedded as exact float
literals (repr round-trips doubles), so the driver's bit-equality value
compare holds. Threshold comparisons (dist <= r) tolerate the last-ulp
difference between numpy's SIMD sin/cos/hypot and libm because fixture
coordinates are jittered — a value landing within 1 ulp of a threshold has
measure zero.
"""

from __future__ import annotations

import numpy as np

from . import geom, netfixture

MY = geom.M_PER_DEG_LAT  # 111132.0
MXE = float(geom.M_PER_DEG_LAT * np.cos(np.radians(netfixture.REF_LAT)))  # enrich metric


def _r(v: float) -> str:
    return repr(float(v))


def _dist_cte(pt_cols: str, segs_table: str, mx: float,
              elem: str = "osmid", prefix: str = "", pts: str = "pts") -> str:
    """(point x segment) distance expansion mirroring
    geom.point_segment_dist_m: metricize each coordinate, project, clamp t,
    hypot. ``pt_cols`` are carried point columns (``p.``-qualified); the
    point CTE must be named ``pts`` with (lon, lat)."""
    out_cols = pt_cols.replace("p.", "")
    return f"""
    {prefix}raw AS (
        SELECT {pt_cols}, s.{elem},
               p.lon * {_r(mx)} AS pxm, p.lat * {MY} AS pym,
               s.ax * {_r(mx)} AS axm, s.ay * {MY} AS aym,
               s.bx * {_r(mx)} - s.ax * {_r(mx)} AS dx,
               s.by * {MY} - s.ay * {MY} AS dy
        FROM {pts} p CROSS JOIN {segs_table} s
    ),
    {prefix}tt AS (
        SELECT *, least(greatest(
                   CASE WHEN dx*dx + dy*dy > 0
                        THEN ((pxm - axm)*dx + (pym - aym)*dy) / (dx*dx + dy*dy)
                        ELSE 0.0 END, 0.0), 1.0) AS t
        FROM {prefix}raw
    ),
    {prefix}dd AS (
        SELECT {out_cols}, {elem},
               sqrt((pxm - (axm + t*dx))*(pxm - (axm + t*dx))
                  + (pym - (aym + t*dy))*(pym - (aym + t*dy))) AS dist
        FROM {prefix}tt
    )"""


_RANK_CASE = """CASE highway
    WHEN 'trunk' THEN 10.0 WHEN 'trunk_link' THEN 9.5
    WHEN 'primary' THEN 9.25 WHEN 'secondary' THEN 9.0
    WHEN 'secondary_link' THEN 8.5 WHEN 'tertiary' THEN 8.0
    WHEN 'residential' THEN 7.0 WHEN 'cycleway' THEN 6.0
    WHEN 'path' THEN 5.5 WHEN 'footway' THEN 5.0
    WHEN 'pedestrian' THEN 4.5 WHEN 'service' THEN 4.0
    WHEN 'steps' THEN 3.5 WHEN 'bridleway' THEN 3.0
    ELSE 0.0 END"""

_BUFFER_CASE = """CASE highway_conn
    WHEN 'trunk' THEN 18.0 WHEN 'trunk_link' THEN 18.0
    WHEN 'primary' THEN 18.0 WHEN 'secondary' THEN 16.0
    WHEN 'secondary_link' THEN 16.0 WHEN 'tertiary' THEN 14.0
    WHEN 'residential' THEN 12.0 WHEN 'cycleway' THEN 12.0
    WHEN 'path' THEN 10.0 WHEN 'footway' THEN 10.0
    WHEN 'pedestrian' THEN 10.0 WHEN 'service' THEN 6.0
    WHEN 'steps' THEN 6.0 WHEN 'bridleway' THEN 6.0
    ELSE 4.0 END"""


def _bike_flags(alias: str = "e") -> str:
    """Boolean columns of the M2/M3 cascade (p2_enrichData.py:159-324);
    regexp_matches == pandas str.contains (unanchored RE2 search)."""
    def re_(col, pat):
        return f"regexp_matches({alias}.\"{col}\", '{pat}')"

    adv = (f"({re_('cycleway','lane')} OR {re_('cycleway','opposite')} OR "
           f"{re_('cycleway:lane','advisory')} OR {re_('cycleway:left:lane','advisory')} OR "
           f"{re_('cycleway:right:lane','advisory')})")
    exc = (f"(({re_('cycleway','lane')} AND {re_('bicycle','designated')}) OR "
           f"{re_('cycleway:lane','exclusive')} OR {re_('cycleway:left:lane','exclusive')} OR "
           f"({re_('cycleway:left','lane')} AND {re_('cycleway:left:bicycle','designated')}) OR "
           f"({re_('cycleway:both','lane')} AND {re_('cycleway:both:bicycle','designated')}) OR "
           f"({re_('cycleway:right','lane')} AND {re_('cycleway:right:bicycle','designated')}) OR "
           f"{re_('cycleway:right:lane','exclusive')})")
    shared = re_("cycleway", "shared_busway")
    broad = re_("bicycle_road", "yes")
    one = (f"({re_('highway','cycleway')} OR {re_('cycleway','track')} OR "
           f"{re_('cycleway:left','track')} OR {re_('cycleway:right','track')} OR "
           f"{re_('cycleway:both','track')} OR {re_('bicycle:backward','track')} OR "
           f"{re_('bicycle:forward','track')} OR {re_('cycleway:right:oneway','yes|-1')} OR "
           f"{re_('cycleway:left:oneway','yes|-1')} OR "
           f"({re_('highway','path')} AND {re_('bicycle','designated')} AND {re_('segregated','yes')}))")
    two = (f"(({re_('cycleway:right','track')} AND ((NOT {alias}.oneway) OR {re_('cycleway:right:oneway','no')})) OR "
           f"({re_('cycleway:left','track')} AND ((NOT {alias}.oneway) OR {re_('cycleway:left:oneway','no')})) OR "
           f"{re_('cycleway:right:oneway','no')} OR {re_('cycleway:left:oneway','no')} OR "
           f"({re_('highway','cycleway')} AND (NOT {alias}.oneway)))")
    fac = (f"(({re_('highway','path')} AND {re_('bicycle','designated')} AND {re_('segregated','no')}) OR "
           f"({re_('highway','footway')} AND {re_('bicycle','yes')}))")
    ped = f"({re_('highway','pedestrian')} AND {re_('bicycle','yes')})"
    acc = (f"CASE WHEN {re_('highway','trunk')} OR {re_('bicycle','use_sidepath')} OR "
           f"{re_('bicycle','no')} THEN 'no' ELSE 'yes' END")
    return (f"SELECT {alias}.*, {adv} AS f_adv, {exc} AS f_exc, {shared} AS f_shared, "
            f"{broad} AS f_broad, {one} AS f_one, {two} AS f_two, "
            f"(({adv}) OR ({exc})) AND (({one}) OR ({two})) AS f_tl, "
            f"{fac} AS f_fac, {ped} AS f_ped, {acc} AS bike_access")


_CAT_CASE = """CASE
    WHEN f_ped THEN 'pedestrian_street'
    WHEN f_fac THEN 'foot_and_cycle_path'
    WHEN f_tl THEN 'track_or_lane'
    WHEN f_two THEN 'two_direction_cycle_path'
    WHEN f_one THEN 'one_direction_cycle_path'
    WHEN f_broad THEN 'bicycle_road'
    WHEN f_shared THEN 'shared_lane'
    WHEN f_exc THEN 'exclusive_lane'
    WHEN f_adv THEN 'advisory_lane'
    ELSE highway END"""


def network_oracles() -> dict[str, str]:
    d = netfixture.ensure_city_fixture()
    dc = netfixture.ensure_cluster_fixture()
    edges = f"read_parquet('{d}/edges.parquet')"
    nodes = f"read_parquet('{d}/nodes.parquet')"
    segs = f"read_parquet('{d}/edge_segs.parquet')"
    pts = f"read_parquet('{d}/edge_pts.parquet')"
    elev = f"read_parquet('{d}/elev.parquet')"

    out: dict[str, str] = {}

    out["network_rank"] = f"""
        SELECT osmid, highway, {_RANK_CASE} AS highway_rank FROM {edges}
    """

    out["network_importance"] = f"""
        WITH er AS (SELECT u, v, highway, {_RANK_CASE} AS rank FROM {edges}),
        pairs AS (SELECT u AS osmid, rank, highway FROM er
                  UNION ALL SELECT v AS osmid, rank, highway FROM er),
        rk AS (SELECT osmid, rank, highway,
                      row_number() OVER (PARTITION BY osmid ORDER BY rank DESC) AS rn
               FROM pairs),
        agg AS (SELECT osmid, avg(rank) AS highway_rank,
                       max(CASE WHEN rn = 1 THEN highway END) AS highway_conn
                FROM rk WHERE rn <= 2 GROUP BY osmid)
        SELECT n.osmid, a.highway_rank, a.highway_conn,
               {_BUFFER_CASE} AS buffer_r
        FROM {nodes} n LEFT JOIN agg a ON a.osmid = n.osmid
    """

    out["network_gradient"] = f"""
        SELECT e.osmid,
               abs(eu.elevation - ev.elevation) AS height_difference,
               round(abs(eu.elevation - ev.elevation) / e.length, 4) AS gradient,
               round(abs(eu.elevation - ev.elevation) * abs(eu.elevation - ev.elevation)
                     / e.length, 4) AS severity
        FROM {edges} e
        JOIN {elev} eu ON eu.osmid = e.u
        JOIN {elev} ev ON ev.osmid = e.v
    """

    out["network_landuse_points"] = f"""
        WITH pts AS (SELECT kind, pt_row, lon, lat FROM read_parquet('{d}/landuse_pts.parquet')),
        {_dist_cte("p.kind, p.pt_row", segs, MXE)},
        hits AS (SELECT DISTINCT kind, pt_row, osmid FROM dd WHERE dist <= 10.0),
        cnt AS (SELECT osmid, kind, count(*) AS c FROM hits GROUP BY osmid, kind)
        SELECT e.osmid,
               coalesce(g.c, 0) AS green_points,
               coalesce(r.c, 0) AS retail_points,
               coalesce(b.c, 0) AS building_points,
               least(coalesce(g.c, 0) * 5.0 / greatest(e.length, 1e-9), 1.0) AS green_ratio,
               least(coalesce(r.c, 0) * 5.0 / greatest(e.length, 1e-9), 1.0) AS retail_ratio,
               least(coalesce(b.c, 0) * 5.0 / greatest(e.length, 1e-9), 1.0) AS building_ratio
        FROM {edges} e
        LEFT JOIN cnt g ON g.osmid = e.osmid AND g.kind = 'green'
        LEFT JOIN cnt r ON r.osmid = e.osmid AND r.kind = 'retail'
        LEFT JOIN cnt b ON b.osmid = e.osmid AND b.kind = 'building'
    """

    # J2 — sampled polygon-clip ratio, mirrored op-by-op: n_samples from the
    # fixture's (numpy-identical) seg_len_m, t=(i+0.5)/n, crossing-number
    # parity per ring, OR over rings, length-weighted sum per edge.
    # (generate_series takes only constants → the sample-count ceiling is
    # computed here and embedded.)
    import pyarrow.parquet as _pq

    seg_len = _pq.read_table(f"{d}/edge_segs.parquet", columns=["seg_len_m"])
    ns_max = int(max(np.maximum((seg_len["seg_len_m"].to_numpy() / 2.0).astype(np.int64), 1))) if seg_len.num_rows else 1
    out["network_landuse_poly"] = f"""
        WITH segs AS (
            SELECT seg_id, osmid, ax, ay, bx, by, seg_len_m,
                   greatest(CAST(trunc(seg_len_m / 2.0) AS BIGINT), 1) AS ns
            FROM {segs}
        ),
        series AS (SELECT g.i FROM generate_series(0, {ns_max} - 1) AS g(i)),
        smp AS (
            SELECT s.seg_id, s.osmid, s.seg_len_m, s.ns, gs.i,
                   s.ax + ((CAST(gs.i AS DOUBLE) + 0.5) / CAST(s.ns AS DOUBLE)) * (s.bx - s.ax) AS sx,
                   s.ay + ((CAST(gs.i AS DOUBLE) + 0.5) / CAST(s.ns AS DOUBLE)) * (s.by - s.ay) AS sy
            FROM segs s JOIN series gs ON gs.i < s.ns
        ),
        re AS (
            SELECT r1.poly_row, r1.x AS x0, r1.y AS y0, r2.x AS x1, r2.y AS y1
            FROM read_parquet('{d}/landuse_polys.parquet') r1
            JOIN read_parquet('{d}/landuse_polys.parquet') r2
              ON r2.poly_row = r1.poly_row AND r2.v_idx = r1.v_idx + 1
             AND r2.kind = 'green'
            WHERE r1.kind = 'green'
        ),
        cr AS (
            SELECT m.seg_id, m.i, e.poly_row,
                   sum(CASE WHEN ((e.y0 <= m.sy) <> (e.y1 <= m.sy))
                             AND (m.sx < e.x0 + (m.sy - e.y0) * (e.x1 - e.x0)
                                  / (CASE WHEN e.y1 <> e.y0 THEN e.y1 - e.y0 ELSE 1.0 END))
                            THEN 1 ELSE 0 END) AS nc
            FROM smp m CROSS JOIN re e GROUP BY m.seg_id, m.i, e.poly_row
        ),
        ins AS (SELECT seg_id, i, max(CASE WHEN nc % 2 = 1 THEN 1.0 ELSE 0.0 END) AS inside
                FROM cr GROUP BY seg_id, i),
        num AS (SELECT m.osmid,
                       sum(i2.inside * (m.seg_len_m / CAST(m.ns AS DOUBLE))) AS covered
                FROM smp m JOIN ins i2 ON i2.seg_id = m.seg_id AND i2.i = m.i
                GROUP BY m.osmid),
        glen AS (SELECT osmid, sum(seg_len_m) AS gl FROM segs GROUP BY osmid),
        gpts AS (SELECT lon, lat, pt_row FROM read_parquet('{d}/landuse_pts.parquet')
                 WHERE kind = 'green'),
        pts AS (SELECT * FROM gpts),
        {_dist_cte("p.pt_row", segs, MXE)},
        hits AS (SELECT DISTINCT pt_row, osmid FROM dd WHERE dist <= 10.0),
        cnt AS (SELECT osmid, count(*) AS c FROM hits GROUP BY osmid)
        SELECT e.osmid,
               round(least(coalesce(n2.covered, 0.0) / greatest(g2.gl, 1e-9), 1.0), 6) AS green_poly_r,
               round(least(least(coalesce(c2.c, 0) * 5.0 / greatest(e.length, 1e-9), 1.0)
                           + least(coalesce(n2.covered, 0.0) / greatest(g2.gl, 1e-9), 1.0),
                           1.0), 6) AS green_ratio_r
        FROM {edges} e
        LEFT JOIN num n2 ON n2.osmid = e.osmid
        LEFT JOIN glen g2 ON g2.osmid = e.osmid
        LEFT JOIN cnt c2 ON c2.osmid = e.osmid
    """

    out["network_bike_labels"] = f"""
        WITH f AS ({_bike_flags('e')} FROM {edges} e)
        SELECT osmid, bike_access, {_CAT_CASE} AS cycleway_category FROM f
    """

    out["network_reverse_bike"] = f"""
        WITH f AS ({_bike_flags('e')} FROM {edges} e),
        cand AS (SELECT * FROM f
                 WHERE oneway AND (regexp_matches("oneway:bicycle", 'no')
                                   OR regexp_matches(cycleway, 'opposite'))),
        gen AS (SELECT 1000000000 + c.osmid AS osmid, c.v AS u, c.u AS v,
                       'bike_only' AS bike_access
                FROM cand c
                WHERE NOT EXISTS (SELECT 1 FROM f o WHERE o.u = c.v AND o.v = c.u)),
        fixed AS (SELECT f.osmid, f.u, f.v,
                         CASE WHEN EXISTS (SELECT 1 FROM cand c
                                           WHERE c.u = f.v AND c.v = f.u)
                              THEN 'yes' ELSE f.bike_access END AS bike_access
                  FROM f)
        SELECT osmid, u, v, bike_access FROM fixed
        UNION ALL SELECT osmid, u, v, bike_access FROM gen
    """

    car = "('residential','service','tertiary','secondary','primary','trunk','motorway')"
    out["network_pt_stops"] = f"""
        WITH pts AS (SELECT stop_row, name, lon, lat FROM read_parquet('{d}/stops.parquet')),
        carsegs AS (SELECT s.* FROM {segs} s JOIN {edges} e ON e.osmid = s.osmid
                    WHERE e.highway IN {car}),
        {_dist_cte("p.stop_row, p.name", "carsegs", MXE)},
        pe AS (SELECT stop_row, min(name) AS name, osmid, min(dist) AS dist
               FROM dd WHERE dist <= 30.0 GROUP BY stop_row, osmid),
        best AS (SELECT *, row_number() OVER (PARTITION BY stop_row
                                              ORDER BY dist, osmid) AS rn FROM pe),
        agg AS (SELECT osmid, count(*) AS cnt,
                       string_agg(name, ', ' ORDER BY stop_row) AS routes
                FROM best WHERE rn = 1 GROUP BY osmid)
        SELECT e.osmid,
               CASE WHEN a.osmid IS NULL THEN 0 ELSE 1 END AS pt_stop_on,
               coalesce(a.cnt, 0) AS pt_stop_count,
               coalesce(a.routes, '') AS pt_stop_routes
        FROM {edges} e LEFT JOIN agg a ON a.osmid = e.osmid
    """

    # S4 parse mirror: the ENTIRE chain — relation parse over the raw
    # PBF-shaped parquet (node members inherit relation tags; missing-name
    # fallback = str(relation_id), the engine's documented deviation from
    # the reference's iteration-ordinal), distributed J10 (count > 3 over
    # ALL member rows incl. way platforms, dedup to first (relation_id,
    # seq)), then the same kNN snap as network_pt_stops with stop_row =
    # (relation_id, seq) rank.
    out["network_pt_stops_rel"] = f"""
        WITH tags AS (SELECT * FROM read_parquet('{d}/rel_tags.parquet')),
        mem AS (SELECT * FROM read_parquet('{d}/rel_members.parquet')),
        onode AS (SELECT * FROM read_parquet('{d}/osm_nodes.parquet')),
        pstop AS (SELECT m.relation_id, m.seq, m.member_ref,
                         coalesce(t.name, CAST(m.relation_id AS VARCHAR))
                             AS name,
                         n.lon, n.lat
                  FROM mem m LEFT JOIN tags t USING (relation_id)
                  JOIN onode n ON n.node_id = m.member_ref
                  WHERE m.member_type = 'n'),
        cnt AS (SELECT member_ref, count(*) AS c FROM mem
                GROUP BY member_ref),
        keep AS (SELECT p.*, row_number() OVER (PARTITION BY p.member_ref
                            ORDER BY p.relation_id, p.seq) AS rn
                 FROM pstop p JOIN cnt c USING (member_ref) WHERE c.c > 3),
        pts AS (SELECT row_number() OVER (ORDER BY relation_id, seq) - 1
                       AS stop_row, name, lon, lat
                FROM keep WHERE rn = 1),
        carsegs AS (SELECT s.* FROM {segs} s JOIN {edges} e ON e.osmid = s.osmid
                    WHERE e.highway IN {car}),
        {_dist_cte("p.stop_row, p.name", "carsegs", MXE)},
        pe AS (SELECT stop_row, min(name) AS name, osmid, min(dist) AS dist
               FROM dd WHERE dist <= 30.0 GROUP BY stop_row, osmid),
        best AS (SELECT *, row_number() OVER (PARTITION BY stop_row
                                              ORDER BY dist, osmid) AS rn
                 FROM pe),
        agg AS (SELECT osmid, count(*) AS cnt,
                       string_agg(name, ', ' ORDER BY stop_row) AS routes
                FROM best WHERE rn = 1 GROUP BY osmid)
        SELECT e.osmid,
               CASE WHEN a.osmid IS NULL THEN 0 ELSE 1 END AS pt_stop_on,
               coalesce(a.cnt, 0) AS pt_stop_count,
               coalesce(a.routes, '') AS pt_stop_routes
        FROM {edges} e LEFT JOIN agg a ON a.osmid = e.osmid
    """

    out["network_amenities"] = f"""
        WITH f AS ({_bike_flags('e')} FROM {edges} e),
        pts AS (SELECT am_row, name, lon, lat FROM read_parquet('{d}/amenities.parquet')),
        bsegs AS (SELECT s.* FROM {segs} s JOIN f ON f.osmid = s.osmid
                  WHERE f.bike_access = 'yes'),
        {_dist_cte("p.am_row, p.name", "bsegs", MXE)},
        pe AS (SELECT am_row, min(name) AS name, osmid, min(dist) AS dist
               FROM dd WHERE dist <= 200.0 GROUP BY am_row, osmid),
        best AS (SELECT *, row_number() OVER (PARTITION BY am_row
                                              ORDER BY dist, osmid) AS rn FROM pe),
        onagg AS (SELECT osmid, string_agg(name, ', ' ORDER BY am_row) AS am_on
                  FROM best WHERE rn = 1 GROUP BY osmid),
        nearagg AS (SELECT osmid, string_agg(name, ', ' ORDER BY name) AS am_near
                    FROM pe GROUP BY osmid)
        SELECT e.osmid, coalesce(o.am_on, '') AS amenity_on,
               coalesce(nn.am_near, '') AS amenity_nearby
        FROM {edges} e
        LEFT JOIN onagg o ON o.osmid = e.osmid
        LEFT JOIN nearagg nn ON nn.osmid = e.osmid
    """

    out["network_widths"] = f"""
        SELECT e.osmid, w.width_cycle_path
        FROM {edges} e
        LEFT JOIN (SELECT osmid, min(width_cycle_path) AS width_cycle_path
                   FROM read_parquet('{d}/widths.parquet') GROUP BY osmid) w
        ON w.osmid = e.osmid
    """

    # M8 — haversine mirrored op-by-op (radians per endpoint, then deltas)
    hav = ("2.0 * 6371008.8 * asin(sqrt(least(greatest("
           "sin((radians({y1}) - radians({y0})) / 2.0) * sin((radians({y1}) - radians({y0})) / 2.0)"
           " + cos(radians({y0})) * cos(radians({y1}))"
           " * sin((radians({x1}) - radians({x0})) / 2.0) * sin((radians({x1}) - radians({x0})) / 2.0)"
           ", 0.0), 1.0)))")
    h01 = hav.format(x0="t.x0", y0="t.y0", x1="t.x1", y1="t.y1")
    h12 = hav.format(x0="t.x1", y0="t.y1", x1="t.x2", y1="t.y2")
    out["network_split_curves"] = f"""
        WITH tri AS (
            SELECT p0.osmid, p0.x AS x0, p0.y AS y0, p1.x AS x1, p1.y AS y1,
                   p2.x AS x2, p2.y AS y2,
                   degrees(atan2(p1.y - p0.y, p1.x - p0.x)) AS a0,
                   degrees(atan2(p2.y - p1.y, p2.x - p1.x)) AS a1
            FROM {pts} p0
            JOIN {pts} p1 ON p1.osmid = p0.osmid AND p1.pt_idx = 1
            JOIN {pts} p2 ON p2.osmid = p0.osmid AND p2.pt_idx = 2
            WHERE p0.pt_idx = 0 AND p0.n_pts = 3
        ),
        split AS (SELECT * FROM tri WHERE abs(a1 - a0) > 60.0)
        SELECT e.osmid, e.u, e.v, round(e.length, 6) AS length_r
        FROM {edges} e WHERE e.osmid NOT IN (SELECT osmid FROM split)
        UNION ALL
        SELECT 1000000000000 + t.osmid * 100 + 0 AS osmid, e.u AS u,
               1000000000000 + t.osmid * 100 + 0 AS v, round({h01}, 6) AS length_r
        FROM split t JOIN {edges} e ON e.osmid = t.osmid
        UNION ALL
        SELECT 1000000000000 + t.osmid * 100 + 1 AS osmid,
               1000000000000 + t.osmid * 100 + 0 AS u, e.v AS v,
               round({h12}, 6) AS length_r
        FROM split t JOIN {edges} e ON e.osmid = t.osmid
    """

    # full p2 chain composite (p2_enrichData.py:706-756): landuse ratios →
    # bike labels → reverse-edge generation (reverse rows copy the source's
    # pre-M4 columns incl. landuse and category; geometry stays unreversed,
    # p2_enrichData.py:195-202) → gradient on each row's own u/v → amenity
    # and PT-stop snaps over ALL rows (reverse rows included by highway /
    # excluded from the bike subset by their 'bike_only' access; exact
    # distance ties between a source edge and its identical-geometry
    # reverse copy resolve to the smaller osmid on both sides).
    out["network_enrich"] = f"""
        WITH f AS ({_bike_flags('e')} FROM {edges} e),
        cand AS (SELECT * FROM f
                 WHERE oneway AND (regexp_matches("oneway:bicycle", 'no')
                                   OR regexp_matches(cycleway, 'opposite'))),
        fixed AS (SELECT f.*, CASE WHEN EXISTS (SELECT 1 FROM cand c
                                                WHERE c.u = f.v AND c.v = f.u)
                                   THEN 'yes' ELSE f.bike_access END AS access2
                  FROM f),
        allr AS (
            SELECT osmid, u, v, highway, length, access2 AS bike_access,
                   {_CAT_CASE} AS cycleway_category, osmid AS src
            FROM fixed
            UNION ALL
            SELECT 1000000000 + c.osmid AS osmid, c.v AS u, c.u AS v,
                   c.highway, c.length, 'bike_only' AS bike_access,
                   {_CAT_CASE} AS cycleway_category, c.osmid AS src
            FROM cand c
            WHERE NOT EXISTS (SELECT 1 FROM f o WHERE o.u = c.v AND o.v = c.u)
        ),
        -- landuse (keyed by SOURCE osmid; reverse rows copy their source)
        pts AS (SELECT kind, pt_row, lon, lat FROM read_parquet('{d}/landuse_pts.parquet')),
        {_dist_cte("p.kind, p.pt_row", segs, MXE, prefix="lp")},
        luhits AS (SELECT DISTINCT kind, pt_row, osmid FROM lpdd WHERE dist <= 10.0),
        lucnt AS (SELECT osmid, kind, count(*) AS c FROM luhits GROUP BY osmid, kind),
        psegs AS (SELECT seg_id, osmid, ax, ay, bx, by, seg_len_m,
                         greatest(CAST(trunc(seg_len_m / 2.0) AS BIGINT), 1) AS ns
                  FROM {segs}),
        pser AS (SELECT g.i FROM generate_series(0, {ns_max} - 1) AS g(i)),
        psmp AS (SELECT s.seg_id, s.osmid, s.seg_len_m, s.ns, gs.i,
                        s.ax + ((CAST(gs.i AS DOUBLE) + 0.5) / CAST(s.ns AS DOUBLE)) * (s.bx - s.ax) AS sx,
                        s.ay + ((CAST(gs.i AS DOUBLE) + 0.5) / CAST(s.ns AS DOUBLE)) * (s.by - s.ay) AS sy
                 FROM psegs s JOIN pser gs ON gs.i < s.ns),
        pre AS (SELECT r1.poly_row, r1.x AS x0, r1.y AS y0, r2.x AS x1, r2.y AS y1
                FROM read_parquet('{d}/landuse_polys.parquet') r1
                JOIN read_parquet('{d}/landuse_polys.parquet') r2
                  ON r2.poly_row = r1.poly_row AND r2.v_idx = r1.v_idx + 1
                 AND r2.kind = 'green'
                WHERE r1.kind = 'green'),
        pcr AS (SELECT m.seg_id, m.i, e.poly_row,
                       sum(CASE WHEN ((e.y0 <= m.sy) <> (e.y1 <= m.sy))
                                 AND (m.sx < e.x0 + (m.sy - e.y0) * (e.x1 - e.x0)
                                      / (CASE WHEN e.y1 <> e.y0 THEN e.y1 - e.y0 ELSE 1.0 END))
                                THEN 1 ELSE 0 END) AS nc
                FROM psmp m CROSS JOIN pre e GROUP BY m.seg_id, m.i, e.poly_row),
        pins AS (SELECT seg_id, i, max(CASE WHEN nc % 2 = 1 THEN 1.0 ELSE 0.0 END) AS inside
                 FROM pcr GROUP BY seg_id, i),
        pnum AS (SELECT m.osmid,
                        sum(i2.inside * (m.seg_len_m / CAST(m.ns AS DOUBLE))) AS covered
                 FROM psmp m JOIN pins i2 ON i2.seg_id = m.seg_id AND i2.i = m.i
                 GROUP BY m.osmid),
        pglen AS (SELECT osmid, sum(seg_len_m) AS gl FROM psegs GROUP BY osmid),
        -- PT stops over ALL rows' car-highway subset
        stsegs AS (SELECT ar.osmid, s.ax, s.ay, s.bx, s.by
                   FROM {segs} s JOIN allr ar ON ar.src = s.osmid
                   WHERE ar.highway IN ('residential','service','tertiary','secondary','primary','trunk','motorway')),
        stpts AS (SELECT stop_row, name, lon, lat FROM read_parquet('{d}/stops.parquet')),
        {_dist_cte("p.stop_row", "stsegs", MXE, prefix="st", pts="stpts")},
        stpe AS (SELECT stop_row, osmid, min(dist) AS dist
                 FROM stdd WHERE dist <= 30.0 GROUP BY stop_row, osmid),
        stbest AS (SELECT *, row_number() OVER (PARTITION BY stop_row
                                                ORDER BY dist, osmid) AS rn FROM stpe),
        stagg AS (SELECT osmid, count(*) AS cnt FROM stbest WHERE rn = 1 GROUP BY osmid),
        -- amenities over the bike-accessible subset of ALL rows
        amsegs AS (SELECT ar.osmid, s.ax, s.ay, s.bx, s.by
                   FROM {segs} s JOIN allr ar ON ar.src = s.osmid
                   WHERE ar.bike_access = 'yes'),
        ampts AS (SELECT am_row, name, lon, lat FROM read_parquet('{d}/amenities.parquet')),
        {_dist_cte("p.am_row, p.name", "amsegs", MXE, prefix="am", pts="ampts")},
        ampe AS (SELECT am_row, min(name) AS name, osmid, min(dist) AS dist
                 FROM amdd WHERE dist <= 200.0 GROUP BY am_row, osmid),
        ambest AS (SELECT *, row_number() OVER (PARTITION BY am_row
                                                ORDER BY dist, osmid) AS rn FROM ampe),
        amon AS (SELECT osmid, string_agg(name, ', ' ORDER BY am_row) AS am_on
                 FROM ambest WHERE rn = 1 GROUP BY osmid),
        amnear AS (SELECT osmid, string_agg(name, ', ' ORDER BY name) AS am_near
                   FROM ampe GROUP BY osmid)
        SELECT ar.osmid, ar.u, ar.v, ar.highway, ar.bike_access, ar.cycleway_category,
               round(least(least(coalesce(g.c, 0) * 5.0 / greatest(ar.length, 1e-9), 1.0)
                           + least(coalesce(pn.covered, 0.0) / greatest(pg.gl, 1e-9), 1.0),
                           1.0), 6) AS green_ratio,
               round(least(coalesce(r.c, 0) * 5.0 / greatest(ar.length, 1e-9), 1.0), 6) AS retail_ratio,
               round(least(coalesce(b.c, 0) * 5.0 / greatest(ar.length, 1e-9), 1.0), 6) AS building_ratio,
               round(abs(eu.elevation - ev.elevation) / ar.length, 4) AS gradient,
               round(abs(eu.elevation - ev.elevation) * abs(eu.elevation - ev.elevation)
                     / ar.length, 4) AS severity,
               CASE WHEN sa.osmid IS NULL THEN 0 ELSE 1 END AS pt_stop_on,
               coalesce(sa.cnt, 0) AS pt_stop_count,
               coalesce(ao.am_on, '') AS amenity_on,
               coalesce(an.am_near, '') AS amenity_nearby
        FROM allr ar
        LEFT JOIN lucnt g ON g.osmid = ar.src AND g.kind = 'green'
        LEFT JOIN lucnt r ON r.osmid = ar.src AND r.kind = 'retail'
        LEFT JOIN lucnt b ON b.osmid = ar.src AND b.kind = 'building'
        LEFT JOIN pnum pn ON pn.osmid = ar.src
        LEFT JOIN pglen pg ON pg.osmid = ar.src
        JOIN {elev} eu ON eu.osmid = ar.u
        JOIN {elev} ev ON ev.osmid = ar.v
        LEFT JOIN stagg sa ON sa.osmid = ar.osmid
        LEFT JOIN amon ao ON ao.osmid = ar.osmid
        LEFT JOIN amnear an ON an.osmid = ar.osmid
    """

    out["network_cluster"] = f"""
        WITH n AS (SELECT * FROM read_parquet('{dc}/cluster_nodes.parquet')),
        pr AS (
            SELECT a.osmid AS ida, b.osmid AS idb
            FROM n a JOIN n b ON a.osmid < b.osmid
            WHERE sqrt((a.x * {_r(MXE)} - b.x * {_r(MXE)}) * (a.x * {_r(MXE)} - b.x * {_r(MXE)})
                     + (a.y * {MY} - b.y * {MY}) * (a.y * {MY} - b.y * {MY}))
                  < a.buffer_r + b.buffer_r
        ),
        sym AS (SELECT ida AS a, idb AS b FROM pr UNION ALL SELECT idb, ida FROM pr),
        comp AS (
            WITH RECURSIVE w(node, lab) AS (
                SELECT osmid, osmid FROM n
                UNION
                SELECT s.b, w.lab FROM w JOIN sym s ON s.a = w.node
            )
            SELECT node, min(lab) AS label FROM w GROUP BY node
        ),
        mem AS (SELECT n.*, c.label FROM n JOIN comp c ON c.node = n.osmid),
        gsz AS (SELECT label, count(*) AS sz, max(highway_rank) AS top_rank
                FROM mem GROUP BY label),
        rep AS (SELECT label, osmid AS rep_id FROM (
                    SELECT label, osmid, row_number() OVER (
                        PARTITION BY label ORDER BY highway_rank DESC, osmid) AS rn
                    FROM mem) WHERE rn = 1),
        cent AS (SELECT m.label, avg(m.x) AS cmx, avg(m.y) AS cmy
                 FROM mem m JOIN gsz g ON g.label = m.label
                 WHERE m.highway_rank = g.top_rank GROUP BY m.label)
        SELECT m.osmid,
               CASE WHEN g.sz < 2 THEN m.osmid ELSE r.rep_id END AS merged_by,
               round(CASE WHEN g.sz < 2 THEN m.x ELSE c.cmx END, 9) AS mx_r,
               round(CASE WHEN g.sz < 2 THEN m.y ELSE c.cmy END, 9) AS my_r,
               CASE WHEN g.sz < 2 THEN ''
                    WHEN m.osmid = r.rep_id THEN 'k' ELSE 'r' END AS merged
        FROM mem m
        JOIN gsz g USING (label) JOIN rep r USING (label) JOIN cent c USING (label)
    """

    # vector→raster burn: 64×64 grid over the node bbox, per-cell count of
    # green polygons containing the cell center (crossing-number parity —
    # the J2 predicate term-for-term, over cell centers instead of arc
    # samples)
    out["network_landuse_raster"] = f"""
        WITH bb AS (SELECT min(x) AS x0, max(x) AS x1,
                           min(y) AS y0, max(y) AS y1 FROM {nodes}),
        cells AS (SELECT g.i AS cid, g.i % 64 AS ix, g.i // 64 AS iy
                  FROM generate_series(0, 64 * 64 - 1) AS g(i)),
        cc AS (SELECT cid, ix, iy,
                      x0 + (CAST(ix AS DOUBLE) + 0.5) * (x1 - x0) / 64 AS cx,
                      y0 + (CAST(iy AS DOUBLE) + 0.5) * (y1 - y0) / 64 AS cy
               FROM cells, bb),
        re AS (
            SELECT r1.poly_row, r1.x AS x0e, r1.y AS y0e,
                   r2.x AS x1e, r2.y AS y1e
            FROM read_parquet('{d}/landuse_polys.parquet') r1
            JOIN read_parquet('{d}/landuse_polys.parquet') r2
              ON r2.poly_row = r1.poly_row AND r2.v_idx = r1.v_idx + 1
             AND r2.kind = 'green'
            WHERE r1.kind = 'green'
        ),
        cr AS (
            SELECT c.cid, e.poly_row,
                   sum(CASE WHEN ((e.y0e <= c.cy) <> (e.y1e <= c.cy))
                             AND (c.cx < e.x0e + (c.cy - e.y0e)
                                  * (e.x1e - e.x0e)
                                  / (CASE WHEN e.y1e <> e.y0e
                                     THEN e.y1e - e.y0e ELSE 1.0 END))
                            THEN 1 ELSE 0 END) AS nc
            FROM cc c CROSS JOIN re e GROUP BY c.cid, e.poly_row
        ),
        ins AS (SELECT cid,
                       CAST(sum(CASE WHEN nc % 2 = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_polys
                FROM cr GROUP BY cid)
        SELECT c.ix, c.iy, coalesce(i.n_polys, 0) AS n_polys,
               CAST(CASE WHEN coalesce(i.n_polys, 0) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS covered
        FROM cc c LEFT JOIN ins i USING (cid)
    """

    return out


# ---------------------------------------------------------------------------
# flagship page→network join oracles
# ---------------------------------------------------------------------------

_GEO_CTE = """
    g AS (
        SELECT doc_id,
               CAST(11.54 AS DOUBLE) + (CAST((doc_id * 2654435761) % 4294967296 % 65536 AS DOUBLE) / 65536.0)
                 * (CAST(11.62 AS DOUBLE) - CAST(11.54 AS DOUBLE)) AS lon,
               CAST(48.12 AS DOUBLE) + (CAST(((doc_id * 2654435761) % 4294967296) // 65536 AS DOUBLE) / 65536.0)
                 * (CAST(48.18 AS DOUBLE) - CAST(48.12 AS DOUBLE)) AS lat
        FROM documents
    )"""


def page_join_oracle(segs_path: str, nodes_path: str, seg_ref_lat: float,
                     node_ref_lat: float, buffer_m: float = 50.0,
                     max_snap_m: float = 500.0) -> str:
    """Join-semantics oracle: pages geocoded by the SQL-exact doc_id hash,
    kNN-snapped to the fixture's exploded segments (edge_id = edge row) and
    tested against exact node buffer disks — the same arithmetic as
    pagejoin.JoinToNetwork with the two index metrics' reference latitudes
    embedded as literals."""
    mxs = float(geom.M_PER_DEG_LAT * np.cos(np.radians(seg_ref_lat)))
    mxn = float(geom.M_PER_DEG_LAT * np.cos(np.radians(node_ref_lat)))
    return f"""
        WITH {_GEO_CTE},
        pts AS (SELECT doc_id, lon, lat FROM g),
        segs AS (SELECT edge_row, ax, ay, bx, by FROM read_parquet('{segs_path}')),
        {_dist_cte("p.doc_id", "segs", mxs, elem="edge_row")},
        pe AS (SELECT doc_id, edge_row, min(dist) AS dist FROM dd GROUP BY doc_id, edge_row),
        best AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                              ORDER BY dist, edge_row) AS rn FROM pe),
        snap AS (SELECT doc_id,
                        CASE WHEN dist <= {_r(max_snap_m)} THEN edge_row ELSE -1 END AS edge_id,
                        CASE WHEN dist <= {_r(max_snap_m)} THEN round(dist, 6) ELSE -1.0 END AS snap_dist_m
                 FROM best WHERE rn = 1),
        nb AS (SELECT p.doc_id, min(n.osmid) AS node_buffer_id
               FROM pts p CROSS JOIN read_parquet('{nodes_path}') n
               WHERE sqrt((p.lon * {_r(mxn)} - n.x * {_r(mxn)}) * (p.lon * {_r(mxn)} - n.x * {_r(mxn)})
                        + (p.lat * {MY} - n.y * {MY}) * (p.lat * {MY} - n.y * {MY}))
                     <= {_r(buffer_m)}
               GROUP BY p.doc_id)
        SELECT s.doc_id, s.edge_id, s.snap_dist_m,
               coalesce(nb.node_buffer_id, -1) AS node_buffer_id
        FROM snap s LEFT JOIN nb ON nb.doc_id = s.doc_id
    """


_EVENT_GEO_CTE = """
    ev AS (
        SELECT event_id, user_id, ts,
               CAST(11.54 AS DOUBLE) + (CAST((event_id * 2654435761) % 4294967296 % 65536 AS DOUBLE) / 65536.0)
                 * (CAST(11.62 AS DOUBLE) - CAST(11.54 AS DOUBLE)) AS lon,
               CAST(48.12 AS DOUBLE) + (CAST(((event_id * 2654435761) % 4294967296) // 65536 AS DOUBLE) / 65536.0)
                 * (CAST(48.18 AS DOUBLE) - CAST(48.12 AS DOUBLE)) AS lat
        FROM events
    )"""


def trajectory_oracle(segs_path: str, seg_ref_lat: float,
                      max_snap_m: float = 500.0) -> str:
    """Mirror of pagejoin.user_trajectories: events geocoded by the Knuth
    hash of event_id, nearest-segment snap with the same point-segment
    distance arithmetic as page_join_oracle, then a per-user window over
    (ts, event_id) collapses the edge sequence into path stats."""
    mxs = float(geom.M_PER_DEG_LAT * np.cos(np.radians(seg_ref_lat)))
    return f"""
        WITH {_EVENT_GEO_CTE},
        pts AS (SELECT event_id, lon, lat FROM ev),
        segs AS (SELECT edge_row, ax, ay, bx, by FROM read_parquet('{segs_path}')),
        {_dist_cte("p.event_id", "segs", mxs, elem="edge_row")},
        pe AS (SELECT event_id, edge_row, min(dist) AS dist FROM dd GROUP BY event_id, edge_row),
        best AS (SELECT *, row_number() OVER (PARTITION BY event_id
                                              ORDER BY dist, edge_row) AS rn FROM pe),
        snap AS (SELECT event_id,
                        CASE WHEN dist <= {_r(max_snap_m)} THEN edge_row ELSE -1 END AS edge_id
                 FROM best WHERE rn = 1),
        seq AS (
            SELECT e.user_id, s.edge_id,
                   lag(s.edge_id) OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts, e.event_id) AS prev_edge,
                   row_number() OVER (PARTITION BY e.user_id
                                      ORDER BY e.ts, e.event_id) AS rn,
                   count(*) OVER (PARTITION BY e.user_id) AS np
            FROM ev e JOIN snap s USING (event_id)
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CASE WHEN prev_edge IS NOT NULL AND edge_id <> prev_edge
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_moves,
               max(CASE WHEN rn = 1 THEN edge_id END) AS first_edge,
               max(CASE WHEN rn = np THEN edge_id END) AS last_edge
        FROM seq GROUP BY user_id
    """


def coverage_gaps_oracle(segs_path: str, nodes_path: str, seg_ref_lat: float,
                         node_ref_lat: float) -> str:
    """Mirror of pagejoin.coverage_gaps: the page_join oracle as a
    subquery, re-keyed to 64x64 tiles and aggregated into gap counts."""
    pj = page_join_oracle(segs_path, nodes_path, seg_ref_lat, node_ref_lat)
    return f"""
        WITH pj AS (SELECT * FROM ({pj}) t),
        {_GEO_CTE}
        SELECT CAST(floor(((CAST((g.doc_id * 2654435761) % 4294967296 % 65536 AS DOUBLE) / 65536.0)) * 64) AS BIGINT) AS ix,
               CAST(floor(((CAST(((g.doc_id * 2654435761) % 4294967296) // 65536 AS DOUBLE) / 65536.0)) * 64) AS BIGINT) AS iy,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN pj.node_buffer_id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nobuffer,
               CAST(sum(CASE WHEN pj.edge_id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nosnap
        FROM g JOIN pj ON pj.doc_id = g.doc_id
        GROUP BY 1, 2
    """


def map_match_oracle(segs_path: str, seg_ref_lat: float,
                     radius_m: float = 300.0, k: int = 3,
                     switch: int = 200_000, gap: int = 600_000) -> str:
    """Mirror of pagejoin.map_match_viterbi: candidate ranking by
    (dist, edge_row) within the radius over the same point-segment
    distance arithmetic, slots pivoted to columns, and the Viterbi dp
    vector carried as k columns of a recursive CTE (LEAST over the
    predecessor slots + switch penalty). Pads use edge −1 / the gap
    cost, so pad-to-pad transitions are free on both engines."""
    mxs = float(geom.M_PER_DEG_LAT * np.cos(np.radians(seg_ref_lat)))
    slot_cols = ", ".join(
        f"max(CASE WHEN rn = {j} THEN edge_row END) AS e{j}, "
        f"max(CASE WHEN rn = {j} THEN CAST(floor(dist * 1000.0) AS BIGINT)"
        f" END) AS d{j}" for j in range(1, k + 1))
    seq_cols = ", ".join(
        f"COALESCE(s.e{j}, -1) AS e{j}, COALESCE(s.d{j}, {gap}) AS d{j}"
        for j in range(1, k + 1))
    init_cols = ", ".join(f"e{j}" for j in range(1, k + 1)) + ", " + \
        ", ".join(f"d{j}" for j in range(1, k + 1))

    def trans(j):
        inner = ", ".join(
            f"dp.s{i} + CASE WHEN dp.e{i} = n.e{j} THEN 0 ELSE {switch} END"
            for i in range(1, k + 1))
        return f"LEAST({inner}) + n.d{j}"

    step_cols = ", ".join(f"n.e{j}" for j in range(1, k + 1)) + ", " + \
        ", ".join(trans(j) for j in range(1, k + 1))
    dp_sig = ", ".join(f"e{j}" for j in range(1, k + 1)) + ", " + \
        ", ".join(f"s{j}" for j in range(1, k + 1))
    best = "LEAST(" + ", ".join(f"s{j}" for j in range(1, k + 1)) + ")"
    # first slot attaining the min (smallest slot wins ties), any k
    end_edge = "CASE " + " ".join(
        f"WHEN s{j} = {best} THEN e{j}" for j in range(1, k + 1)) + " END"
    return f"""
        WITH RECURSIVE {_EVENT_GEO_CTE},
        pts AS (SELECT event_id, lon, lat FROM ev),
        segs AS (SELECT edge_row, ax, ay, bx, by
                 FROM read_parquet('{segs_path}')),
        {_dist_cte("p.event_id", "segs", mxs, elem="edge_row")},
        pe AS (SELECT event_id, edge_row, min(dist) AS dist
               FROM dd GROUP BY event_id, edge_row),
        cand AS (SELECT *, row_number() OVER (PARTITION BY event_id
                                              ORDER BY dist, edge_row) AS rn
                 FROM pe WHERE dist <= {_r(radius_m)}),
        slots AS (SELECT event_id, {slot_cols} FROM cand GROUP BY event_id),
        -- MATERIALIZED: the recursive dp term re-reads seq once per
        -- iteration; without it DuckDB re-evaluates the event x segment
        -- cross join every round
        seq AS MATERIALIZED (SELECT e.user_id, e.event_id,
                       row_number() OVER (PARTITION BY e.user_id
                                          ORDER BY e.ts, e.event_id) AS rn,
                       {seq_cols}
                FROM ev e LEFT JOIN slots s USING (event_id)),
        dp(user_id, rn, {dp_sig}) AS (
            SELECT user_id, rn, {init_cols} FROM seq WHERE rn = 1
            UNION ALL
            SELECT n.user_id, n.rn, {step_cols}
            FROM dp JOIN seq n ON n.user_id = dp.user_id
                              AND n.rn = dp.rn + 1
        ),
        fin AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                             ORDER BY rn DESC) AS rr
                FROM dp)
        SELECT user_id, CAST(rn AS BIGINT) AS n_pings,
               CAST({best} AS BIGINT) AS best_cost_unats,
               CAST({end_edge} AS BIGINT) AS end_edge
        FROM fin WHERE rr = 1
    """
