import numpy as np

from osmnetfusion_ray import geom


def test_haversine_known_distance():
    # one degree of latitude ≈ 111.2 km
    d = geom.haversine_m(11.0, 48.0, 11.0, 49.0)
    assert abs(d - 111_195) < 300
    assert geom.haversine_m(11.0, 48.0, 11.0, 48.0) == 0.0


def test_polyline_lengths_multi():
    coords = np.array([[11.0, 48.0], [11.0, 48.001], [11.0, 48.002],  # line 1: ~222m
                       [12.0, 50.0], [12.0, 50.001]])                  # line 2: ~111m
    offsets = np.array([0, 3, 5])
    l = geom.polyline_lengths(coords, offsets)
    assert abs(l[0] - 222.4) < 1.0
    assert abs(l[1] - 111.2) < 1.0


def test_bearing():
    assert abs(geom.bearing_deg(11.0, 48.0, 11.0, 48.01) - 90.0) < 0.1   # north
    assert abs(geom.bearing_deg(11.0, 48.0, 11.01, 48.0) - 0.0) < 0.1    # east
    assert abs(abs(geom.bearing_deg(11.0, 48.0, 10.99, 48.0)) - 180.0) < 0.1


def test_angle_diff():
    assert geom.angle_diff_deg(10, 350) == 20
    assert geom.angle_diff_deg(-170, 170) == 20
    assert geom.angle_diff_deg(90, 90) == 0


def test_points_in_polygon_square():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    px = np.array([0.5, 1.5, -0.1, 0.99])
    py = np.array([0.5, 0.5, 0.5, 0.01])
    inside = geom.points_in_polygon(px, py, poly)
    assert inside.tolist() == [True, False, False, True]


def test_disk_polygon_contains_center_radius():
    poly = geom.disk_polygon(11.57, 48.14, 50.0, n=24)
    # center inside
    assert geom.points_in_polygon(np.array([11.57]), np.array([48.14]), poly)[0]
    # a point 40 m north inside, 60 m north outside
    dlat40 = 40.0 / geom.M_PER_DEG_LAT
    dlat60 = 60.0 / geom.M_PER_DEG_LAT
    assert geom.points_in_polygon(np.array([11.57]), np.array([48.14 + dlat40]), poly)[0]
    assert not geom.points_in_polygon(np.array([11.57]), np.array([48.14 + dlat60]), poly)[0]


def test_point_segment_dist():
    d, t = geom.point_segment_dist_m(
        np.array([0.0]), np.array([48.0 + 10 / geom.M_PER_DEG_LAT]),
        np.array([-0.001]), np.array([48.0]), np.array([0.001]), np.array([48.0]), 48.0)
    assert abs(d[0] - 10.0) < 0.1
    assert abs(t[0] - 0.5) < 0.01


def test_wkb_roundtrip():
    pt = geom.wkb_point(11.5, 48.2)
    gt, c = geom.wkb_parse(pt)
    assert gt == 1 and c[0, 0] == 11.5 and c[0, 1] == 48.2

    coords = np.array([[11.0, 48.0], [11.1, 48.1], [11.2, 48.05]])
    ls = geom.wkb_linestring(coords)
    gt, c = geom.wkb_parse(ls)
    assert gt == 2 and np.allclose(c, coords)

    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 0]], dtype=float)
    pg = geom.wkb_polygon(ring)
    gt, c = geom.wkb_parse(pg)
    assert gt == 3 and np.allclose(c, ring)


def test_wkb_flat_roundtrip():
    lines = [np.array([[0.0, 0.0], [1.0, 1.0]]), np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 4.0]])]
    blobs = [geom.wkb_linestring(l) for l in lines]
    coords, offsets = geom.wkb_linestrings_to_flat(blobs)
    assert offsets.tolist() == [0, 2, 5]
    back = geom.flat_to_wkb_linestrings(coords, offsets)
    assert back == blobs


def test_union_find_deterministic():
    uf = geom.UnionFind(6)
    uf.union(0, 1); uf.union(1, 2); uf.union(4, 5)
    lab = uf.labels()
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[3] == 3
    assert lab[4] == lab[5] == 4


def test_kmeans_deterministic():
    rng = np.random.RandomState(0)
    xy = np.concatenate([rng.randn(50, 2), rng.randn(50, 2) + 10])
    l1 = geom.kmeans_lloyd(xy, 2, seed=42)
    l2 = geom.kmeans_lloyd(xy, 2, seed=42)
    assert (l1 == l2).all()
    # the two blobs are separated
    assert len(set(l1[:50])) == 1 and len(set(l1[50:])) == 1 and l1[0] != l1[-1]
