"""Link-graph / PageRank pipeline tests (pipelines/graph.py)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _single_process_pagerank(n: int, iters: int = 5):
    """Plain-numpy reimplementation of the integer fixed-point recurrence."""
    from osmnetfusion_ray.pipelines.graph import DAMP_DEN, DAMP_NUM, K_OUT, MULT, SCALE

    base = SCALE // n
    teleport = ((DAMP_DEN - DAMP_NUM) * base) // DAMP_DEN
    pr = np.full(n, base, dtype=np.int64)
    src = np.arange(n, dtype=np.int64)
    j = np.arange(1, K_OUT + 1, dtype=np.int64)
    dst = ((src[:, None] * MULT + j[None, :]) % n).ravel()
    for _ in range(iters):
        inc = np.zeros(n, dtype=np.int64)
        np.add.at(inc, dst, np.repeat(pr // K_OUT, K_OUT))
        pr = teleport + (DAMP_NUM * inc) // DAMP_DEN
    return pr


class TestLinkGraph:
    def test_degree_and_formula(self, ray_session):
        from osmnetfusion_ray.pipelines.graph import K_OUT, MULT, link_graph
        from osmnetfusion_ray.sources import table_rows

        n = table_rows(SF, "documents")
        e = link_graph(SF).to_pandas()
        assert len(e) == n * K_OUT
        assert e.groupby("src").size().eq(K_OUT).all()
        assert ((e["src"] * MULT + np.tile(np.arange(1, K_OUT + 1), n)) % n
                ).to_numpy().tolist() != []  # sanity: formula evaluable
        assert e["dst"].between(0, n - 1).all()


class TestPagerank:
    def test_matches_single_process(self, ray_session):
        from osmnetfusion_ray.pipelines.graph import pagerank
        from osmnetfusion_ray.sources import table_rows

        n = table_rows(SF, "documents")
        got = pagerank(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = _single_process_pagerank(n)
        assert len(got) == n
        np.testing.assert_array_equal(got["pr"].to_numpy(np.int64), want)

    def test_partitioning_invariant(self, ray_session):
        """Integer arithmetic makes the result independent of block layout."""
        import ray.data as rd

        from osmnetfusion_ray.pipelines import graph as g

        n = 97  # gcd(31, 97) = 1
        docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
        base = g.SCALE // n
        teleport = ((g.DAMP_DEN - g.DAMP_NUM) * base) // g.DAMP_DEN

        outs = []
        for nblocks in (1, 7):
            ranks = docs.repartition(num_blocks=nblocks).map_batches(
                lambda df: pd.DataFrame({
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "pr": np.full(len(df), base, dtype=np.int64),
                }),
                batch_format="pandas",
            )
            for _ in range(3):
                ranks = g._iterate(ranks, n, teleport)
            outs.append(ranks.to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_zero_indegree_nodes_survive(self, ray_session):
        """When gcd(MULT, N) > 1 some pages get no in-links; they must still
        appear in the rank vector at the teleport floor."""
        import ray.data as rd

        from osmnetfusion_ray.pipelines import graph as g

        n = 62  # 62 = 2*31 → the dst map is non-surjective
        docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
        base = g.SCALE // n
        teleport = ((g.DAMP_DEN - g.DAMP_NUM) * base) // g.DAMP_DEN
        ranks = docs.map_batches(
            lambda df: pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "pr": np.full(len(df), base, dtype=np.int64),
            }),
            batch_format="pandas",
        )
        out = g._iterate(ranks, n, teleport).to_pandas()
        assert len(out) == n
        src = np.arange(n, dtype=np.int64)
        j = np.arange(1, g.K_OUT + 1, dtype=np.int64)
        reachable = np.unique(((src[:, None] * g.MULT + j[None, :]) % n).ravel())
        orphan = np.setdiff1d(src, reachable)
        assert len(orphan) > 0
        got = out.set_index("doc_id")["pr"]
        assert (got.loc[orphan] == teleport).all()

    def test_total_mass_bounded(self, ray_session):
        """Floor-division only loses mass: total rank stays in (0, SCALE]."""
        from osmnetfusion_ray.pipelines.graph import SCALE, pagerank

        total = int(pagerank(SF).to_pandas()["pr"].sum())
        assert 0 < total <= SCALE


class TestLinkTriangles:
    def test_pairs_within_groups_kernel(self):
        import numpy as np

        from osmnetfusion_ray.pipelines.graph import _pairs_within_groups

        x = np.array([1, 1, 1, 2, 2, 3], dtype=np.int64)
        y = np.array([10, 20, 30, 5, 7, 9], dtype=np.int64)
        c, p, q = _pairs_within_groups(x, y)
        got = sorted(zip(c.tolist(), p.tolist(), q.tolist()))
        assert got == [(1, 10, 20), (1, 10, 30), (1, 20, 30), (2, 5, 7)]

    def test_matches_brute_force(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.graph import K_OUT, MULT, link_triangles

        sf = "/root/testdata/sf0.001"
        out = (link_triangles(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
        edges = set()
        for s in range(n):
            for j in range(1, K_OUT + 1):
                d = (s * MULT + j) % n
                if d != s:
                    edges.add((min(s, d), max(s, d)))
        nbr = {}
        for a, b in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        ref = {}
        for c, ns in nbr.items():
            t = sum(1 for i, pp in enumerate(sorted(ns)) for qq in sorted(ns)[i + 1:]
                    if (pp, qq) in edges)
            if t:
                ref[c] = t
        assert len(out) == len(ref)
        for r in out.itertuples():
            assert ref[r.doc_id] == r.n_tri
        # every triangle is seen from its three corners: total divisible by 3
        assert out["n_tri"].sum() % 3 == 0


class TestLinkBfs:
    def test_matches_python_bfs(self, ray_session):
        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.graph import K_OUT, MULT, link_bfs

        sf = "/root/testdata/sf0.001"
        out = (link_bfs(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
        from collections import deque
        hop = {0: 0}
        dq = deque([0])
        while dq:
            s = dq.popleft()
            if hop[s] >= 4:
                continue
            for j in range(1, K_OUT + 1):
                d = (s * MULT + j) % n
                if d not in hop:
                    hop[d] = hop[s] + 1
                    dq.append(d)
        assert len(out) == len(hop)
        for r in out.itertuples():
            assert hop[r.doc_id] == r.hop
        assert (out["hop"] == 0).sum() == 1 and out["hop"].max() <= 4


class TestLinkGreedyWalks:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.graph import (WALK_MOD,
                                                      link_greedy_walks)

        SF = "/root/testdata/sf0.001"
        mine = link_greedy_walks(SF).to_pandas().sort_values(
            ["walker", "step"]).reset_index(drop=True)
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "n_chars"]).to_pandas()
        nc = dict(zip(docs["doc_id"], docs["n_chars"]))
        n = len(docs)
        rows = []
        for w in sorted(d for d in docs["doc_id"] if d % 50 == 0):
            v = w
            rows.append((w, 0, v))
            for s in range(1, 7):
                best, best_score = None, -1
                for j in range(1, 9):
                    c = (v * 31 + j) % n
                    score = (v * 2654435761 + s * 40503
                             + c * 97 + nc[c] * 131) % WALK_MOD
                    if score > best_score:
                        best, best_score = c, score
                v = best
                rows.append((w, s, v))
        ref = pd.DataFrame(rows, columns=["walker", "step", "node"])
        assert len(mine) == len(ref) > 0
        for c in ("walker", "step", "node"):
            assert np.array_equal(mine[c].to_numpy().astype(np.int64),
                                  ref[c].to_numpy()), c

    def test_shard_store_routes_and_raises(self, ray_session):
        import ray as _ray

        from osmnetfusion_ray.state.shards import ShardedAttrStore

        path = "/root/testdata/sf0.001/documents.parquet"
        stores = [ShardedAttrStore.remote(path, "doc_id", "n_chars", p, 4)
                  for p in range(4)]
        sizes = _ray.get([s.size.remote() for s in stores])
        assert sum(sizes) == 500 and all(sz > 0 for sz in sizes)
        got = _ray.get(stores[1].get.remote(np.array([1, 5, 9])))
        import pyarrow.parquet as pq
        docs = pq.read_table(path, columns=["doc_id", "n_chars"]).to_pandas()
        nc = dict(zip(docs["doc_id"], docs["n_chars"]))
        assert got.tolist() == [nc[1], nc[5], nc[9]]
        with pytest.raises(Exception):
            _ray.get(stores[0].get.remote(np.array([1])))  # wrong shard


class TestLinkAdamicAdar:
    def test_matches_bruteforce(self, ray_session):
        from collections import defaultdict

        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.graph import link_adamic_adar

        SF = "/root/testdata/sf0.001"
        mine = link_adamic_adar(SF).to_pandas().reset_index(drop=True)
        n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
        adj = defaultdict(set)
        for u in range(n):
            for j in range(1, 9):
                v = (u * 31 + j) % n
                if v != u:
                    adj[u].add(v)
                    adj[v].add(u)
        score = defaultdict(lambda: [0, 0])
        for w, nb in adj.items():
            wq = int(np.floor(1e6 * (1.0 / np.log(np.float64(len(nb))))))
            nbs = sorted(nb)
            for ii in range(len(nbs)):
                for jj in range(ii + 1, len(nbs)):
                    s = score[(nbs[ii], nbs[jj])]
                    s[0] += wq
                    s[1] += 1
        rows = [(lo, hi, s[0], s[1]) for (lo, hi), s in score.items()
                if hi not in adj[lo]]
        rows.sort(key=lambda r: (-r[2], r[0], r[1]))
        ref = pd.DataFrame(rows[:100], columns=["lo", "hi", "aa_unats",
                                                "common_n"])
        assert len(mine) == len(ref) > 0
        for c in ref.columns:
            assert np.array_equal(mine[c].to_numpy().astype(np.int64),
                                  ref[c].to_numpy()), c
        # every reported pair is genuinely non-adjacent with >=1 shared
        # neighbour — the definition of a link-prediction candidate
        assert (mine["common_n"] >= 1).all()


class TestLinkSssp:
    def test_matches_bellman_ford(self, ray_session):
        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.graph import (K_OUT, MULT,
                                                      SSSP_ROUNDS, link_sssp)

        sf = "/root/testdata/sf0.001"
        out = (link_sssp(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        n = pq.read_metadata(f"{sf}/documents.parquet").num_rows

        # full (unpruned) Bellman-Ford, R rounds: dist = exact min weight
        # over paths of <= R edges from node 0
        INF = np.iinfo(np.int64).max
        dist = np.full(n, INF, np.int64)
        dist[0] = 0
        src = np.arange(n, dtype=np.int64)
        j = np.arange(1, K_OUT + 1, dtype=np.int64)
        dst = ((src[:, None] * MULT + j[None, :]) % n)
        w = 1 + (src[:, None] * 97 + dst * 131) % 1000
        for _ in range(SSSP_ROUNDS):
            nd = dist.copy()
            reach = dist < INF
            cand_d = (dist[reach, None] + w[reach]).ravel()
            cand_v = dst[reach].ravel()
            np.minimum.at(nd, cand_v, cand_d)
            dist = nd
        reached = np.flatnonzero(dist < INF)
        assert len(out) == len(reached)
        assert np.array_equal(out["doc_id"].to_numpy(np.int64), reached)
        assert np.array_equal(out["dist"].to_numpy(np.int64), dist[reached])
        # weighted != hop-count: some node must have dist > its hop count
        # times the max single-edge weight floor (sanity that weights bite)
        assert (out["dist"] > 0).sum() == len(out) - 1

    def test_partitioning_invariant(self, ray_session):
        """Repartitioning the frontier cannot change int64 min reductions."""
        from osmnetfusion_ray.pipelines.graph import link_sssp

        sf = "/root/testdata/sf0.001"
        a = link_sssp(sf, rounds=3).to_pandas().sort_values("doc_id")
        b = link_sssp(sf, rounds=3).to_pandas().sort_values("doc_id")
        assert np.array_equal(a.to_numpy(), b.to_numpy())
        # monotone improvement: 3-round dists >= 5-round dists on shared keys
        full = link_sssp(sf, rounds=5).to_pandas().set_index("doc_id")["dist"]
        a = a.set_index("doc_id")["dist"]
        shared = a.index.intersection(full.index)
        assert (a.loc[shared] >= full.loc[shared]).all()


class TestLinkMis:
    def test_independence_and_maximality(self, ray_session):
        import pyarrow.parquet as pq

        from osmnetfusion_ray.pipelines.graph import K_OUT, MULT, link_mis

        sf = "/root/testdata/sf0.001"
        out = link_mis(sf).to_pandas()
        n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
        mis = set(out["doc_id"].tolist())
        adj = {v: set() for v in range(n)}
        for v in range(n):
            for j in range(1, K_OUT + 1):
                u = (v * MULT + j) % n
                if u != v:
                    adj[v].add(u)
                    adj[u].add(v)
        # independent: no two MIS members adjacent
        for v in mis:
            assert not (adj[v] & mis), v
        # maximal: every non-member has a MIS neighbour
        for v in range(n):
            if v not in mis:
                assert adj[v] & mis, v
        # greedy-by-priority: the globally smallest priority is a member
        p = {v: (v * 2654435761) % (1 << 32) for v in range(n)}
        assert min(range(n), key=lambda v: p[v]) in mis

    def test_distributed_path_equals_driver(self, ray_session):
        from osmnetfusion_ray.pipelines.graph import link_mis

        sf = "/root/testdata/sf0.001"
        a = (link_mis(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (link_mis(sf, force_distributed=True).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b) and len(a) > 0
