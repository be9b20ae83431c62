from osmnetfusion_ray import synth


def test_city_deterministic():
    n1, e1 = synth.synth_city(n=8, seed=42)
    n2, e2 = synth.synth_city(n=8, seed=42)
    assert n1.equals(n2) and e1.equals(e2)
    assert n1.num_rows == 64
    assert e1.num_rows > 64
    assert set(["u", "v", "highway", "geometry", "length", "oneway"]).issubset(e1.schema.names)


def test_city_has_bidirectional_and_curved():
    nodes, edges = synth.synth_city(n=8, seed=42)
    import collections

    from osmnetfusion_ray import geom
    pairs = collections.Counter(zip(edges["u"].to_pylist(), edges["v"].to_pylist()))
    rev = sum(1 for (u, v) in pairs if (v, u) in pairs)
    assert rev > 0
    npts = [geom.wkb_parse(b)[1].shape[0] for b in edges["geometry"].to_pylist()]
    assert max(npts) == 3  # curved edges exist


def test_pages_deterministic_and_schema():
    p1 = synth.synth_pages(100, seed=42)
    p2 = synth.synth_pages(100, seed=42)
    assert p1.equals(p2)
    assert p1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    lon, lat = synth.geocode_url(p1["url"].to_pylist()[:10])
    lon0, lat0, lon1, lat1 = synth.BBOX
    assert (lon >= lon0).all() and (lon <= lon1).all()
    assert (lat >= lat0).all() and (lat <= lat1).all()


def test_dim_tables():
    nodes, edges = synth.synth_city(n=8, seed=42)
    dims = synth.synth_dim_tables(nodes, seed=42)
    assert set(dims) == {
        "landuse_green", "landuse_retail", "buildings", "traffic_signals",
        "pt_stops", "bike_amenities", "elevations", "cycle_path_widths",
    }
    assert dims["elevations"].num_rows == nodes.num_rows
    # widths table has duplicate osmids (exercises groupby-min)
    osm = dims["cycle_path_widths"]["osmid"].to_pylist()
    assert len(osm) > len(set(osm))
