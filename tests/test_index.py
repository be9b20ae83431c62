import numpy as np

from osmnetfusion_ray import geom
from osmnetfusion_ray.state.index import PolygonGridIndex, SegmentGridIndex


def test_segment_index_nearest_matches_bruteforce():
    rng = np.random.RandomState(7)
    n_seg = 200
    ax = 11.55 + rng.rand(n_seg) * 0.05
    ay = 48.12 + rng.rand(n_seg) * 0.04
    ang = rng.rand(n_seg) * 2 * np.pi
    bx = ax + np.cos(ang) * 0.001
    by = ay + np.sin(ang) * 0.001
    ids = np.arange(n_seg, dtype=np.int64)
    idx = SegmentGridIndex(ax, ay, bx, by, ids, max_radius_m=300)

    px = 11.55 + rng.rand(100) * 0.05
    py = 48.12 + rng.rand(100) * 0.04
    got_id, got_d = idx.nearest(px, py, max_dist_m=300)

    ref_lat = idx.ref_lat
    for i in range(len(px)):
        d, _ = geom.point_segment_dist_m(px[i], py[i], ax, ay, bx, by, ref_lat)
        j = np.lexsort((ids, d))[0]
        if d[j] <= 300:
            assert got_id[i] == ids[j], (i, got_id[i], ids[j], d[j], got_d[i])
            assert abs(got_d[i] - d[j]) < 1e-9
        else:
            assert got_id[i] == -1


def test_segment_index_within_matches_bruteforce():
    rng = np.random.RandomState(8)
    n_seg = 50
    ax = 11.56 + rng.rand(n_seg) * 0.01
    ay = 48.13 + rng.rand(n_seg) * 0.01
    bx = ax + 0.0005
    by = ay
    ids = np.arange(n_seg, dtype=np.int64)
    idx = SegmentGridIndex(ax, ay, bx, by, ids, max_radius_m=150)
    px = 11.56 + rng.rand(30) * 0.01
    py = 48.13 + rng.rand(30) * 0.01
    pt, sid, d = idx.within(px, py, 150)
    got = set(zip(pt.tolist(), sid.tolist()))
    for i in range(len(px)):
        dd, _ = geom.point_segment_dist_m(px[i], py[i], ax, ay, bx, by, idx.ref_lat)
        for j in np.flatnonzero(dd <= 150):
            assert (i, j) in got


def test_point_index_nearest():
    x = np.array([11.55, 11.56, 11.57])
    y = np.array([48.13, 48.13, 48.13])
    ids = np.array([10, 20, 30], dtype=np.int64)
    idx = SegmentGridIndex.from_points(x, y, ids, max_radius_m=2000)
    got_id, got_d = idx.nearest(np.array([11.5601]), np.array([48.1301]))
    assert got_id[0] == 20
    assert got_d[0] < 20


def test_polygon_index_contains():
    rings = [geom.disk_polygon(11.55, 48.13, 100), geom.disk_polygon(11.58, 48.15, 100)]
    idx = PolygonGridIndex(rings, np.array([1, 2]), max_radius_m=200)
    pts, ids = idx.contains(np.array([11.55, 11.58, 11.50]), np.array([48.13, 48.15, 48.10]))
    assert set(zip(pts.tolist(), ids.tolist())) == {(0, 1), (1, 2)}
