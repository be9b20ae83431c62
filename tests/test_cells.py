import numpy as np

from osmnetfusion_ray import cells


def test_roundtrip_encode_decode():
    rng = np.random.RandomState(0)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 5, 15, 29):
        c = cells.cell_of(lon, lat, res)
        ix, iy, r = cells.decode(c)
        assert (r == res).all()
        ex, ey = cells.xy_index(lon, lat, res)
        assert (ix == ex).all() and (iy == ey).all()


def test_cell_contains_its_point():
    rng = np.random.RandomState(1)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-89, 89, 200)
    c = cells.cell_of(lon, lat, 12)
    lo, la, hi, ha = cells.cell_bounds(c)
    assert (lon >= lo).all() and (lon < hi).all()
    assert (lat >= la).all() and (lat < ha).all()


def test_parent_children():
    c = cells.cell_of(np.array([11.57]), np.array([48.14]), 15)
    p = cells.parent(c)
    assert cells.cell_res(p)[0] == 14
    kids = cells.children(int(p[0]))
    assert len(kids) == 4
    assert int(c[0]) in set(int(k) for k in kids)
    # parent of every child is p
    assert set(int(x) for x in cells.parent(kids)) == {int(p[0])}


def test_neighbors_are_adjacent():
    c = cells.cell_of(np.array([11.57]), np.array([48.14]), 15)
    nb = cells.neighbors(c)
    assert nb.shape == (1, 8)
    ix, iy, _ = cells.decode(c)
    for x in nb[0]:
        jx, jy, jr = cells.decode(np.array([x], dtype=np.uint64))
        assert jr[0] == 15
        assert max(abs(int(jx[0]) - int(ix[0])), abs(int(jy[0]) - int(iy[0]))) == 1


def test_neighbors_cover_radius():
    # a point's 1-ring at res_for_radius covers every point within the radius
    r = cells.res_for_radius(200, lat=48.1)
    w, h = cells.cell_size_m(r, 48.1)
    assert min(w, h) >= 200


def test_salt_hot_cells_deterministic_and_splits():
    rng = np.random.RandomState(3)
    # 500 points in one tiny area (hot), 20 spread out
    lon = np.concatenate([np.full(500, 11.5701) + rng.rand(500) * 1e-4, np.linspace(11.0, 12.0, 20)])
    lat = np.concatenate([np.full(500, 48.1401) + rng.rand(500) * 1e-4, np.linspace(48.0, 49.0, 20)])
    c = cells.cell_of(lon, lat, 10)
    salted = cells.salt_hot_cells(c, lon, lat, threshold=100)
    assert (cells.cell_res(salted[:500]) == 11).all()  # hot rows got finer cells
    assert (salted[500:] == c[500:]).all()  # cold rows untouched
    again = cells.salt_hot_cells(c, lon, lat, threshold=100)
    assert (salted == again).all()


def test_covering_cells_bbox():
    cc = cells.covering_cells_bbox(11.54, 48.12, 11.62, 48.18, 12)
    assert len(cc) >= 1
    assert len(set(int(x) for x in cc)) == len(cc)
