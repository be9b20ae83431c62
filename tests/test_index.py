import numpy as np
import pandas as pd

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


class TestUserTrajectories:
    def test_per_user_kernel_and_invariants(self, ray_session):
        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.pagejoin import user_trajectories

        sf = "/root/testdata/sf0.001"
        out = (user_trajectories(sf).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id"]).to_pandas()
        # every event lands in exactly one user's path
        assert out["n_points"].sum() == len(ev)
        assert set(out["user_id"]) == set(ev["user_id"].unique())
        # moves are bounded by points-1 and some user actually moves
        assert (out["n_moves"] <= out["n_points"] - 1).all()
        assert out["n_moves"].sum() > 0
        # deterministic across runs
        again = (user_trajectories(sf).to_pandas()
                 .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, again)

    def test_sequence_reduce_semantics(self, ray_session):
        # crafted: user 7 path a->a->b->a (2 moves), user 9 single point
        import pandas as pd_

        from osmnetfusion_ray.pipelines import pagejoin
        from osmnetfusion_ray.rayctx import grouped

        import ray.data as rd

        df = pd_.DataFrame({
            "event_id": [4, 3, 2, 1, 5],
            "user_id": [7, 7, 7, 7, 9],
            "ts": pd_.to_datetime([4, 3, 2, 1, 1], unit="s"),
            "edge_id": [10, 20, 10, 10, 30],
        })
        # reuse the grouped per-user reduce through the public pipeline path:
        # emulate by calling the same block function via grouped()
        snapped = rd.from_pandas(df)

        def per_user(b):
            import numpy as np_
            b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            uid = b["user_id"].to_numpy(); edge = b["edge_id"].to_numpy()
            new_user = np_.empty(len(b), dtype=bool); new_user[0:1] = True
            new_user[1:] = uid[1:] != uid[:-1]
            moved = np_.empty(len(b), dtype=bool); moved[0:1] = False
            moved[1:] = edge[1:] != edge[:-1]; moved &= ~new_user
            g = pd_.DataFrame({"user_id": uid, "moved": moved.astype("int64"),
                               "edge_id": edge})
            return g.groupby("user_id", sort=False, as_index=False).agg(
                n_points=("edge_id", "size"), n_moves=("moved", "sum"),
                first_edge=("edge_id", "first"), last_edge=("edge_id", "last"))

        out = grouped(snapped, ["user_id"], per_user).to_pandas().sort_values("user_id")
        u7 = out[out.user_id == 7].iloc[0]
        assert (u7.n_points, u7.n_moves, u7.first_edge, u7.last_edge) == (4, 2, 10, 10)
        u9 = out[out.user_id == 9].iloc[0]
        assert (u9.n_points, u9.n_moves, u9.first_edge, u9.last_edge) == (1, 0, 30, 30)


class TestCoverageGaps:
    def test_consistent_with_flagship_join(self, ray_session):
        from osmnetfusion_ray import netfixture
        from osmnetfusion_ray.pipelines.pagejoin import coverage_gaps, join_pages_to_network
        from osmnetfusion_ray.sources import pages_from_documents

        sf = "/root/testdata/sf0.001"
        out = coverage_gaps(sf).to_pandas()
        netfixture.ensure_city_fixture()
        nodes, edges, _ = netfixture.city_tables()
        j = join_pages_to_network(pages_from_documents(sf), nodes, edges,
                                  geocode_mode="doc_id").to_pandas()
        assert out["n_docs"].sum() == len(j)
        assert out["n_nobuffer"].sum() == int((j["node_buffer_id"] == -1).sum())
        assert out["n_nosnap"].sum() == int((j["edge_id"] == -1).sum())
        assert (out["n_nobuffer"] <= out["n_docs"]).all()
