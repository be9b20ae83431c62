"""Minimal GeoPackage writer — stdlib sqlite3 + the engine's own WKB.

The reference persists its results as GPKG layers via geopandas
(p3_simplification.py:435-436: ``to_file(..., layer='edges', driver='GPKG')``;
p2_enrichData.py:703). This environment has no fiona/geopandas, so the
format is written directly against the OGC GeoPackage 1.2 spec: the three
required metadata tables (gpkg_spatial_ref_sys, gpkg_contents,
gpkg_geometry_columns), the magic ``application_id``/``user_version``
PRAGMAs, and one feature table per layer whose ``geom`` column holds
GeoPackageBinary blobs = the 8-byte GP header (magic 'GP', version 0,
little-endian envelope-less flags, srs_id) + standard WKB — exactly what
the engine's geom module already produces.

This is the SINK side only (enough for a reference user's downstream QGIS /
geopandas tooling to open the output); the engine's internal interchange
stays Parquet.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd

_GP_HEADER = b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", 4326)  # LE, no envelope, EPSG:4326


def _gpkg_blob(wkb: bytes | None) -> bytes | None:
    return None if wkb is None else _GP_HEADER + wkb


def _sql_type(series: pd.Series) -> str:
    dtype = series.dtype
    if np.issubdtype(dtype, np.integer) or np.issubdtype(dtype, np.bool_):
        return "INTEGER"
    if np.issubdtype(dtype, np.floating):
        return "REAL"
    if dtype == object:
        # object columns hold python scalars (ints/bools from the merge
        # kernels, bytes for extra geometries, lists, strings) — type from
        # the first non-null value so sqlite's affinity doesn't stringify
        for v in series:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            if isinstance(v, (bool, np.bool_, int, np.integer)):
                return "INTEGER"
            if isinstance(v, (float, np.floating)):
                return "REAL"
            if isinstance(v, (bytes, bytearray)):
                return "BLOB"
            break
    return "TEXT"


def write_gpkg(layers: dict[str, tuple[pd.DataFrame, str, str]], path: str) -> None:
    """Write ``{layer_name: (frame, geometry_column, geometry_type)}`` to a
    GeoPackage. ``geometry_type`` is 'POINT' / 'LINESTRING'. Non-geometry
    columns are stored as INTEGER/REAL/TEXT (lists are repr()'d like the
    reference's GPKG dumps of tag lists). Overwrites ``path``."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
        cur.execute("PRAGMA user_version = 10200")
        cur.execute("""
            CREATE TABLE gpkg_spatial_ref_sys (
                srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
                organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
                definition TEXT NOT NULL, description TEXT)""")
        cur.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
             ("WGS 84", 4326, "EPSG", 4326,
              'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]', None)])
        cur.execute("""
            CREATE TABLE gpkg_contents (
                table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
                identifier TEXT UNIQUE, description TEXT DEFAULT '',
                last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
                min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
                srs_id INTEGER)""")
        cur.execute("""
            CREATE TABLE gpkg_geometry_columns (
                table_name TEXT NOT NULL, column_name TEXT NOT NULL,
                geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
                z TINYINT NOT NULL, m TINYINT NOT NULL,
                CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")

        for name, (df, geom_col, geom_type) in layers.items():
            attrs = [c for c in df.columns if c != geom_col]
            cols_sql = ", ".join(
                f'"{c}" {_sql_type(df[c])}' for c in attrs)
            cur.execute(
                f'CREATE TABLE "{name}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
                f'geom BLOB{", " + cols_sql if cols_sql else ""})')
            cur.execute(
                "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id) "
                "VALUES (?, 'features', ?, 4326)", (name, name))
            cur.execute(
                "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, 4326, 0, 0)",
                (name, geom_type))

            def cell(v):
                if isinstance(v, (list, np.ndarray)):
                    return repr(list(v))
                if isinstance(v, (np.integer,)):
                    return int(v)
                if isinstance(v, (np.floating,)):
                    return float(v)
                if isinstance(v, (np.bool_, bool)):
                    return int(v)
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    return None
                return v

            rows = (
                (_gpkg_blob(g), *(cell(r[c]) for c in attrs))
                for g, r in zip(df[geom_col], df.to_dict("records"))
            )
            ph = ", ".join("?" for _ in range(len(attrs) + 1))
            cur.executemany(
                f'INSERT INTO "{name}" (geom{"".join(", " + chr(34) + c + chr(34) for c in attrs)}) '
                f"VALUES ({ph})", rows)
        con.commit()
    finally:
        con.close()


def read_gpkg(path: str, layer: str) -> pd.DataFrame:
    """Read one GPKG feature layer → DataFrame with a ``geometry`` column of
    plain WKB (GP header stripped) — the ingest side for a reference user's
    existing p1/p2/p3 GPKG artifacts (p2_enrichData.py:719-720 loads them
    with geopandas). Handles the envelope-bearing headers geopandas writes
    (flags bits 1-3 select one of the optional envelope layouts)."""
    con = sqlite3.connect(path)
    try:
        geom_col = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,)).fetchone()
        if geom_col is None:
            raise ValueError(f"layer {layer!r} not in {path}")
        geom_col = geom_col[0]
        df = pd.read_sql_query(f'SELECT * FROM "{layer}"', con)
    finally:
        con.close()

    _ENV_LEN = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}

    def strip(blob):
        if blob is None:
            return None
        b = bytes(blob)
        if b[:2] != b"GP":
            return b  # already bare WKB
        env = (b[3] >> 1) & 0b111
        return b[8 + _ENV_LEN.get(env, 0):]

    df["geometry"] = [strip(b) for b in df[geom_col]]
    if geom_col != "geometry":
        df = df.drop(columns=[geom_col])
    return df.drop(columns=["fid"], errors="ignore")


def write_simplified_gpkg(simplified: dict, path: str) -> None:
    """The p3 output ({'nodes','edges'} Datasets) → GPKG with the
    reference's two layers (p3_simplification.py:435-436). Geometry: merged
    node points; edge ``g_geo_rea`` linestrings."""
    from .. import geom

    nodes_pd = simplified["nodes"].to_pandas()
    edges_pd = simplified["edges"].to_pandas()
    nodes_pd = nodes_pd.copy()
    nodes_pd["geometry"] = [geom.wkb_point(x, y)
                            for x, y in zip(nodes_pd["g_x"], nodes_pd["g_y"])]
    write_gpkg({
        "nodes": (nodes_pd, "geometry", "POINT"),
        "edges": (edges_pd.rename(columns={"g_geo_rea": "geometry"}), "geometry", "LINESTRING"),
    }, path)
