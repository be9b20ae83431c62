"""Link-graph pipelines over the Common-Crawl-style page corpus.

A real crawl's pages link to each other; the driver corpus has no
inter-document anchors, so the graph is DERIVED deterministically from
``doc_id`` — page ``d`` links to ``(d*31 + j) mod N`` for ``j = 1..K`` —
which both the engine and the DuckDB oracle can compute independently.
That keeps the interesting part (the distributed iteration) honest: the
oracle is a full unrolled recomputation, not a copy of our output.

PageRank here is EXACT, not approximately-equal-modulo-float-order:
ranks are int64 fixed-point (``SCALE = 1e12``) and every step is integer
arithmetic (``//`` floor-division, ``%``), so per-node incoming sums are
order-independent and the engine output is bit-equal to the SQL oracle
no matter how blocks are partitioned. The float version of the same
algorithm could never be driver-checkable this way — summation order
differs between engines.

Scale shape (the part that must survive 10^12 pages):

- The edge list is never materialized: each iteration re-derives a
  block's out-edges from its (doc_id, pr) rows inside ``map_batches``
  (K integers of arithmetic per row), so the only persistent state per
  iteration is the N-row rank vector.
- Contributions are pre-summed per destination INSIDE each block
  (np.unique + add.at) before the shuffle, so a block of B rows ships
  at most ``min(B*K, distinct dst)`` rows into the one hash exchange
  per iteration — the textbook combiner-before-groupby layout.
- Zero-in-degree pages survive because every block also emits a zero
  contribution for each of its own source ids (each id appears as a
  source exactly once corpus-wide, so this adds one row per node, not
  one per edge).
- Iterations chain lazily; nothing lands on the driver until the caller
  consumes the final rank vector.

Reference parity note: the reference engine has no link analysis (it is
a street-network tool); this family is part of the LLM-training-data
operator set the engine adds on top (SURVEY.md §2, corpus ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..rayctx import grouped
from ..sources import read_table, table_rows

SCALE = 10**12  # fixed-point denominator for integer PageRank
MULT = 31       # link-graph multiplier: dst = (src*MULT + j) % N
K_OUT = 8       # out-degree per page
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact integer ratio


def link_graph(sf_dir: str) -> rd.Dataset:
    """The derived out-link edge list (src, dst) — the fan-out kernel the
    PageRank iterations apply implicitly, exposed as its own query so the
    graph derivation itself is oracle-checked."""
    n = table_rows(sf_dir, "documents")
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        src = df["doc_id"].to_numpy(np.int64)
        j = np.arange(1, K_OUT + 1, dtype=np.int64)
        dst = (src[:, None] * MULT + j[None, :]) % n
        return pd.DataFrame({
            "src": np.repeat(src, K_OUT),
            "dst": dst.ravel(),
        })

    return docs.map_batches(edges, batch_format="pandas")


def _iterate(ranks: rd.Dataset, n: int, teleport: int) -> rd.Dataset:
    """One PageRank round: derive out-edges per block, combine contributions
    per destination block-locally, one hash exchange, finalize ranks."""

    def contrib_partials(df: pd.DataFrame) -> pd.DataFrame:
        src = df["doc_id"].to_numpy(np.int64)
        share = df["pr"].to_numpy(np.int64) // K_OUT
        j = np.arange(1, K_OUT + 1, dtype=np.int64)
        dst = ((src[:, None] * MULT + j[None, :]) % n).ravel()
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, np.repeat(share, K_OUT))
        # zero-seed this block's own sources so no node drops out of the
        # rank vector even with zero in-degree (gcd(MULT, N) > 1 cases)
        return pd.DataFrame({
            "doc_id": np.concatenate([uniq, src]),
            "inc": np.concatenate([sums, np.zeros(len(src), dtype=np.int64)]),
        })

    partials = ranks.map_batches(contrib_partials, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)["inc"].sum()
        return pd.DataFrame({
            "doc_id": g.index.to_numpy(np.int64),
            "pr": teleport + (DAMP_NUM * g.to_numpy(np.int64)) // DAMP_DEN,
        })

    return grouped(partials, ["doc_id"], finalize, rows=n)


def pagerank(sf_dir: str, iters: int = 5) -> rd.Dataset:
    """Integer fixed-point PageRank over the derived link graph.

    r0(v) = SCALE // N;   r'(v) = teleport + (85 * Σ_in r(u)//K) // 100
    with teleport = (15 * (SCALE // N)) // 100. All arithmetic is int64
    floor-division, so the result is partitioning-invariant and bit-equal
    to the unrolled DuckDB oracle.
    """
    n = table_rows(sf_dir, "documents")
    base = SCALE // n
    teleport = ((DAMP_DEN - DAMP_NUM) * base) // DAMP_DEN

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    ranks = docs.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "pr": np.full(len(df), base, dtype=np.int64),
        }),
        batch_format="pandas",
    )
    for _ in range(iters):
        ranks = _iterate(ranks, n, teleport)
    return ranks


def pagerank_sql(iters: int = 5) -> str:
    """The unrolled DuckDB mirror: same graph formula, same integer
    arithmetic, ``iters`` LEFT-JOIN rounds over the documents view."""
    base = f"({SCALE} // (SELECT count(*) FROM documents))"
    tele = f"(({DAMP_DEN - DAMP_NUM} * {base}) // {DAMP_DEN})"
    nn = "(SELECT count(*) FROM documents)"
    sql = [
        f"WITH e AS (SELECT d.doc_id AS src, (d.doc_id * {MULT} + t.j) % {nn} AS dst "
        f"FROM documents d CROSS JOIN range(1, {K_OUT + 1}) t(j)),",
        f"r0 AS (SELECT doc_id, {base}::BIGINT AS pr FROM documents),",
    ]
    for i in range(1, iters + 1):
        sql.append(
            f"r{i} AS (SELECT d.doc_id, ({tele} + ({DAMP_NUM} * COALESCE(s.inc, 0)) // {DAMP_DEN})::BIGINT AS pr "
            f"FROM documents d LEFT JOIN "
            f"(SELECT e.dst, SUM(r.pr // {K_OUT}) AS inc FROM e JOIN r{i - 1} r ON r.doc_id = e.src GROUP BY e.dst) s "
            f"ON s.dst = d.doc_id),"
        )
    sql.append(f"fin AS (SELECT doc_id, pr FROM r{iters}) SELECT * FROM fin")
    return "\n".join(sql)


def _pairs_within_groups(x: np.ndarray, y: np.ndarray):
    """All unordered within-group pairs, fully vectorized: rows (x, y)
    lexsorted, each element pairs with every LATER element of its group,
    generated by one repeat/offset expansion (no per-group Python loop).
    Returns (center, p, q) with p < q (y is sorted within each group)."""
    order = np.lexsort((y, x))
    x, y = x[order], y[order]
    if len(x) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    new = np.concatenate([[True], x[1:] != x[:-1]])
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    loc = np.arange(len(x)) - starts[gid]
    k = sizes[gid] - loc - 1
    total = int(k.sum())
    first = np.repeat(np.arange(len(x)), k)
    cnt = np.concatenate([[0], np.cumsum(k)])
    off = np.arange(total) - cnt[first] + 1
    second = first + off
    return x[first], y[first], y[second]


def link_triangles(sf_dir: str) -> rd.Dataset:
    """Per-node triangle counts on the undirected link graph — the
    wedge-check shape of distributed triangle counting: (1) the directed
    derived edges collapse to canonical distinct undirected edges (one
    keyed dedup exchange); (2) adjacency co-located per CENTER generates
    each node's neighbor pairs (wedges) with a vectorized repeat/offset
    expansion; (3) ONE (p, q)-keyed exchange joins wedges against the edge
    set — edge rows ride the same shuffle as wedge-probe rows (co-location
    join, no broadcast) — and (4) a center-keyed rollup counts closed
    wedges. Exchange sizes: edges O(N·K), wedges O(N·deg²) with deg
    bounded by the derived graph's constant out-degree. Nodes on no
    triangle are absent (the SQL mirror groups the same way)."""
    n = table_rows(sf_dir, "documents")
    edges = link_graph(sf_dir)

    # NO global edge-dedup exchange: duplicate undirected edges are
    # harmless everywhere downstream — the wedge stage dedups each
    # center's neighbor LIST block-locally (the center co-location it
    # needs anyway), and the closing test is an ANY over edge-tagged rows,
    # which duplicate probes cannot change. One exchange saved.
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pd.DataFrame({"x": np.concatenate([src, dst]),
                             "y": np.concatenate([dst, src])})

    adj = edges.map_batches(sym, batch_format="pandas")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # per-center neighbor-set dedup (local)
        c, p, q = _pairs_within_groups(df["x"].to_numpy(np.int64),
                                       df["y"].to_numpy(np.int64))
        return pd.DataFrame({"p": p, "q": q, "c": c, "is_edge": np.zeros(len(c), np.int8)})

    wd = grouped(adj, ["x"], wedges, small=True,
                 rows=2 * n * K_OUT if n else None)

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pd.DataFrame({"p": np.minimum(src, dst),
                             "q": np.maximum(src, dst),
                             "c": np.full(keep.sum(), -1, np.int64),
                             "is_edge": np.ones(keep.sum(), np.int8)})

    probe = wd.union(edges.map_batches(tag_edges, batch_format="pandas"))

    def close(df: pd.DataFrame) -> pd.DataFrame:
        has = df.groupby(["p", "q"], sort=False)["is_edge"].transform("max") == 1
        out = df[has & (df["is_edge"] == 0)]
        return out[["c"]].rename(columns={"c": "doc_id"})

    closed = grouped(probe, ["p", "q"], close, small=True,
                     rows=n * K_OUT * (2 * K_OUT) if n else None)

    def count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False, as_index=False).size()
        g = g.rename(columns={"size": "n_tri"})
        g["n_tri"] = g["n_tri"].astype(np.int64)
        return g

    return grouped(closed, ["doc_id"], count, small=True, rows=n)


def link_bfs(sf_dir: str, source: int = 0, max_hops: int = 4) -> rd.Dataset:
    """Single-source BFS hop distances over the derived link graph — the
    iterative frontier-expansion shape: each round derives the current
    frontier's out-neighbors inside ``map_batches`` (block-local dedup
    bounds the exchange), unions them into the visited table, and ONE
    doc-keyed min-hop reduce both dedups across rounds and yields the next
    frontier (rows whose min hop equals the new round). State per round is
    the O(V) hop table — at web scale the union would switch to a
    delta-only anti-join, the per-round exchange key and kernel are
    unchanged. Output: (doc_id, hop <= max_hops) for reached nodes, exact
    min-hop (DuckDB recursive-CTE oracle, bit-equal)."""
    n = table_rows(sf_dir, "documents")

    best = rd.from_pandas(pd.DataFrame({"doc_id": [int(source) % n],
                                        "hop": np.array([0], np.int64)}))
    frontier = best

    def min_hop(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False, as_index=False)["hop"].min()
        g["hop"] = g["hop"].astype(np.int64)
        return g

    for h in range(1, max_hops + 1):

        def expand(df: pd.DataFrame, h=h) -> pd.DataFrame:
            src = df["doc_id"].to_numpy(np.int64)
            j = np.arange(1, K_OUT + 1, dtype=np.int64)
            dst = np.unique(((src[:, None] * MULT + j[None, :]) % n).ravel())
            return pd.DataFrame({"doc_id": dst,
                                 "hop": np.full(len(dst), h, np.int64)})

        cand = frontier.map_batches(expand, batch_format="pandas")
        best = grouped(best.union(cand), ["doc_id"], min_hop, rows=n).materialize()
        frontier = best.filter(lambda r, h=h: r["hop"] == h)

    return best


WALK_HOPS = 6
WALK_STRIDE = 50
WALK_MOD = 1_000_003


def link_greedy_walks(sf_dir: str, hops: int = WALK_HOPS,
                      stride: int = WALK_STRIDE) -> rd.Dataset:
    """ATTRIBUTE-DEPENDENT GRAPH WALKS over SHARDED ACTOR STATE (the
    node2vec-style sampling prep): every stride-th page starts a walker;
    at each hop the walker scores its 8 arithmetic out-neighbours by a
    deterministic integer mix of (current node, step, candidate,
    candidate's n_chars) and moves to the argmax (ties → smallest j).
    The candidate ATTRIBUTE is what makes this a distributed shape BFS
    doesn't cover: the choice needs data that lives with the
    *destination*, so a keyed-exchange layout would re-ship the attr
    table once per hop. Here the (doc_id → n_chars) map lives in a
    ``ShardedAttrStore`` actor pool (state/shards.py — partitioned ONCE,
    never reshipped), walkers stay put in their blocks, and each hop is
    one map_batches whose kernel batches its probes per shard (one actor
    round-trip per (batch, shard), never per row).

    Exactness: scores are pure int64 arithmetic ((v·2654435761 +
    step·40503 + c·97 + nc·131) mod 1000003 — overflow-free for
    v, c < 3.4e9; the 10^12-doc swap is the uint64 wrap of
    event_chain_scan), so trajectories are bit-equal to the DuckDB
    recursive-CTE oracle, which re-runs the whole walk with window-rank
    argmax per step — a genuinely different evaluation strategy.
    Output: the full (walker, step, node) trajectories."""
    import ray

    from ..rayctx import pool_width
    from ..state.shards import ShardedAttrStore

    n = table_rows(sf_dir, "documents")
    n_shards = max(2, min(8, pool_width()))
    path = f"{sf_dir}/documents.parquet"
    stores = [ShardedAttrStore.remote(path, "doc_id", "n_chars", p, n_shards)
              for p in range(n_shards)]

    starts = read_table(sf_dir, "documents", columns=["doc_id"])

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        w = df["doc_id"].to_numpy().astype(np.int64)
        w = w[w % stride == 0]
        return pd.DataFrame({"walker": w,
                             "step": np.zeros(len(w), np.int64),
                             "node": w})

    cur = starts.map_batches(seed, batch_format="pandas")
    outs = [cur]
    J = np.arange(1, 9, dtype=np.int64)

    def make_hop(s: int):
        def hop(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            w = df["walker"].to_numpy()
            v = df["node"].to_numpy()
            cand = (v[:, None] * 31 + J[None, :]) % n        # (B, 8)
            flat = cand.ravel()
            shard = flat % n_shards
            nc = np.empty(len(flat), np.int64)
            futs = [(shard == p, stores[p].get.remote(flat[shard == p]))
                    for p in range(n_shards)]
            for m, f in futs:
                nc[m] = ray.get(f)
            score = ((np.repeat(v, 8) * 2654435761
                      + (s + 1) * 40503 + flat * 97 + nc * 131)
                     % WALK_MOD).reshape(-1, 8)
            # argmax takes the FIRST maximum — j ascending == smallest j
            pick = score.argmax(axis=1)
            return pd.DataFrame({
                "walker": w,
                "step": np.full(len(w), s + 1, np.int64),
                "node": cand[np.arange(len(w)), pick],
            })
        return hop

    for s in range(hops):
        cur = cur.map_batches(make_hop(s), batch_format="pandas")
        outs.append(cur)
    return outs[0].union(*outs[1:])


def link_greedy_walks_sql(hops: int = WALK_HOPS,
                          stride: int = WALK_STRIDE) -> str:
    """Recursive-CTE oracle for :func:`link_greedy_walks`: re-runs the
    whole walk with a window-rank argmax per step — same integer score
    arithmetic, different evaluation strategy."""
    return f"""
        WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        walks(walker, step, node) AS (
            SELECT doc_id, 0, doc_id FROM documents
            WHERE doc_id % {stride} = 0
            UNION ALL
            SELECT walker, step + 1, c FROM (
                SELECT w.walker, w.step, (w.node * 31 + j.j) % nn.n AS c,
                       row_number() OVER (
                           PARTITION BY w.walker, w.step
                           ORDER BY (w.node * 2654435761
                                     + (w.step + 1) * 40503
                                     + ((w.node * 31 + j.j) % nn.n) * 97
                                     + d.n_chars * 131) % {WALK_MOD} DESC,
                                    j.j) AS rn
                FROM walks w
                CROSS JOIN (SELECT unnest(range(1, 9)) AS j) j
                CROSS JOIN nn
                JOIN documents d ON d.doc_id = (w.node * 31 + j.j) % nn.n
                WHERE w.step < {hops}
            ) WHERE rn = 1
        )
        SELECT walker, step, node FROM walks
    """


SSSP_ROUNDS = 5


def link_sssp(sf_dir: str, source: int = 0,
              rounds: int = SSSP_ROUNDS) -> rd.Dataset:
    """WEIGHTED single-source shortest paths (frontier-pruned distributed
    Bellman–Ford) over the derived link graph — the iterative
    MONOTONE-RELAXATION shape none of the other iterative ops cover:
    BFS (link_bfs) settles a node the first time it is reached (hop
    counts are level-monotone), but with per-edge weights
    ``w(u,v) = 1 + (u*97 + v*131) mod 1000`` a node's distance keeps
    IMPROVING across rounds, so each round must (a) re-expand exactly
    the nodes whose value changed and (b) merge candidates against the
    running best table.

    Per round: the frontier re-derives its 8 arithmetic out-edges
    in-block (the pagerank trick — no edge list materialized),
    pre-reduces candidates per destination inside the block
    (np.minimum.at — the min-combiner), and ONE doc-keyed exchange
    merges candidates with the previous best, emitting the new best
    plus an ``improved`` flag that becomes the next frontier. State per
    round is the O(V) distance table; at web scale the old-best union
    switches to a delta-only anti-join exactly like link_bfs.

    Exactness: after R rounds the table holds the exact min weight over
    all paths of ≤ R edges (frontier pruning never loses a relaxation:
    a value only skips re-expansion if it did not change, and unchanged
    values were already expanded when they first appeared). All
    arithmetic is int64, so the result is partitioning-invariant and
    bit-equal to the DuckDB recursive-CTE oracle, which enumerates every
    ≤R-edge path (8^R rows) and takes the group-wise min — a genuinely
    different evaluation strategy. Output: (doc_id, dist) for nodes
    reachable in ≤ R edges."""
    n = table_rows(sf_dir, "documents")
    J = np.arange(1, K_OUT + 1, dtype=np.int64)
    src0 = int(source) % n

    best = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([src0], np.int64),
        "dist": np.zeros(1, np.int64),
        "is_cand": np.zeros(1, np.int8),
    }))
    frontier = best

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        d = df["dist"].to_numpy(np.int64)
        cand = (v[:, None] * MULT + J[None, :]) % n
        w = 1 + (v[:, None] * 97 + cand * 131) % 1000
        nd = (d[:, None] + w).ravel()
        flat = cand.ravel()
        # block-local min per destination — the combiner before the shuffle
        uniq, inv = np.unique(flat, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, nd)
        return pd.DataFrame({"doc_id": uniq, "dist": mins,
                             "is_cand": np.ones(len(uniq), np.int8)})

    def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)["dist"].min()
        old = (df[df["is_cand"] == 0]
               .groupby("doc_id", sort=False)["dist"].min())
        od = old.reindex(g.index)
        improved = od.isna().to_numpy() | (g.to_numpy() < od.to_numpy())
        return pd.DataFrame({
            "doc_id": g.index.to_numpy(np.int64),
            "dist": g.to_numpy(np.int64),
            "is_cand": improved.astype(np.int8),  # doubles as the new-frontier flag
        })

    def as_old(df: pd.DataFrame) -> pd.DataFrame:
        # re-tag the running best as OLD rows: its is_cand column is the
        # last round's frontier flag, not a candidate marker
        return df.assign(is_cand=np.zeros(len(df), np.int8))

    for _ in range(rounds):
        cand = frontier.map_batches(expand, batch_format="pandas")
        old = best.map_batches(as_old, batch_format="pandas")
        best = grouped(old.union(cand), ["doc_id"], reduce_min,
                       rows=n).materialize()
        frontier = best.map_batches(
            lambda df: df[df["is_cand"] == 1], batch_format="pandas")

    return best.map_batches(lambda df: df[["doc_id", "dist"]],
                            batch_format="pandas")


def link_sssp_sql(rounds: int = SSSP_ROUNDS) -> str:
    """Recursive-CTE oracle for :func:`link_sssp`: enumerate every path of
    ≤ ``rounds`` edges from node 0 (8^R rows — bounded by the round cap,
    not the corpus) and take the per-node min. Same int64 weight formula,
    opposite plan shape (path enumeration vs relaxation)."""
    return f"""
        WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        p(node, dist, hop) AS (
            SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
            UNION ALL
            SELECT (p.node * {MULT} + j.j) % nn.n,
                   p.dist + 1 + (p.node * 97
                                 + ((p.node * {MULT} + j.j) % nn.n) * 131)
                              % 1000,
                   p.hop + 1
            FROM p
            CROSS JOIN (SELECT unnest(range(1, {K_OUT + 1})) AS j) j
            CROSS JOIN nn
            WHERE p.hop < {rounds}
        )
        SELECT node AS doc_id, min(dist) AS dist FROM p GROUP BY node
    """


def link_adamic_adar(sf_dir: str, k: int = 100) -> rd.Dataset:
    """LINK PREDICTION — top-k NON-adjacent page pairs by Adamic–Adar
    score AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w): the negative-space
    join (score pairs that DON'T exist yet, generated through shared
    structure) that triangle counting (closed wedges) and BFS never
    produce, and the classic recommender/citation-inference primitive.

    Shape: in-neighbours co-locate at their endpoint via ONE dst-keyed
    exchange (out-neighbours are re-derived arithmetically in the block
    — the pagerank trick, so the edge list is never materialized
    twice); each node's ≤16-neighbour set expands to its wedge pairs
    (fan-out bounded by deg² ≤ 256, never corpus size) carrying the
    micro-nat weight floor(1e6·(1/ln deg)); a pair-keyed exchange sums
    scores, and the EXISTING-edge test is pure arithmetic membership
    ((u·31+j) mod N, 16 candidates) — the anti-join costs zero shuffle.
    Per-block top-k then a tiny driver reduce; ties (aa_unats desc, lo,
    hi) ascending.

    The DuckDB oracle materializes the symmetric adjacency, self-joins
    wedges, anti-joins with NOT EXISTS and mirrors the floor-quantized
    weight — same integers, different plan shape."""
    from ..rayctx import grouped

    n = table_rows(sf_dir, "documents")
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    J = np.arange(1, K_OUT + 1, dtype=np.int64)

    def in_edges(df: pd.DataFrame) -> pd.DataFrame:
        src = df["doc_id"].to_numpy(np.int64)
        dst = ((src[:, None] * MULT + J[None, :]) % n).ravel()
        srcr = np.repeat(src, K_OUT)
        m = srcr != dst
        return pd.DataFrame({"w": dst[m], "x": srcr[m]})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # block holds ALL in-edges of its w keys; out-neighbours are
        # re-derived arithmetically, then per-w dedup + wedge expansion
        w_in = df["w"].to_numpy(np.int64)
        x_in = df["x"].to_numpy(np.int64)
        uw = np.unique(w_in)
        out_w = np.repeat(uw, K_OUT)
        out_x = ((uw[:, None] * MULT + J[None, :]) % n).ravel()
        m = out_w != out_x
        aw = np.concatenate([w_in, out_w[m]])
        ax = np.concatenate([x_in, out_x[m]])
        # dedup (w, x)
        key = aw * n + ax
        _, first = np.unique(key, return_index=True)
        aw, ax = aw[first], ax[first]
        ww, p, q = _pairs_within_groups(aw, ax)
        if len(ww) == 0:
            return pd.DataFrame({"lo": np.zeros(0, np.int64),
                                 "hi": np.zeros(0, np.int64),
                                 "wq": np.zeros(0, np.int64)})
        deg = np.bincount(np.searchsorted(np.unique(aw), aw))
        degmap_ids = np.unique(aw)
        wq_all = np.floor(1000000.0 * (1.0 / np.log(
            deg.astype(np.float64)))).astype(np.int64)
        wq = wq_all[np.searchsorted(degmap_ids, ww)]
        return pd.DataFrame({"lo": p, "hi": q, "wq": wq})

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lo", "hi"], sort=False, as_index=False).agg(
            aa_unats=("wq", "sum"), common_n=("wq", "size"))
        lo = g["lo"].to_numpy(np.int64)
        hi = g["hi"].to_numpy(np.int64)
        # arithmetic adjacency test — the zero-shuffle anti-join
        lo_out = (lo[:, None] * MULT + J[None, :]) % n
        hi_out = (hi[:, None] * MULT + J[None, :]) % n
        is_edge = ((lo_out == hi[:, None]).any(axis=1)
                   | (hi_out == lo[:, None]).any(axis=1))
        g = g[~is_edge]
        g["aa_unats"] = g["aa_unats"].astype(np.int64)
        g["common_n"] = g["common_n"].astype(np.int64)
        return g.sort_values(["aa_unats", "lo", "hi"],
                             ascending=[False, True, True]).head(k)

    inn = docs.map_batches(in_edges, batch_format="pandas")
    wed = grouped(inn, ["w"], wedges, rows=n)
    per_block = grouped(wed, ["lo", "hi"], score_topk, rows=n * 16)
    top = per_block.to_pandas().sort_values(
        ["aa_unats", "lo", "hi"], ascending=[False, True, True]).head(k)
    import pyarrow as pa
    return rd.from_arrow(pa.Table.from_pandas(top.reset_index(drop=True),
                                              preserve_index=False))


MIS_ROUNDS = 32


def link_mis(sf_dir: str, max_rounds: int = MIS_ROUNDS,
             force_distributed: bool = False,
             driver_threshold: int = 200_000) -> rd.Dataset:
    """Deterministic LUBY MAXIMAL INDEPENDENT SET over the symmetrized
    derived link graph — the SYMMETRY-BREAKING SELECTION fixpoint no
    other iterative shape covers (relaxation improves values, peeling
    removes, label-prop spreads; MIS must pick mutually non-adjacent
    winners in parallel): fixed unique priorities p(v) = Knuth hash of
    v, and the synchronous automaton per round — an alive node with a
    MIS neighbour (as of the previous round) becomes EXCLUDED; an alive
    node whose priority beats every alive neighbour's becomes MIS; else
    it stays alive. The globally-min-priority alive node always enters,
    so the fixpoint is reached (both paths RAISE past ``max_rounds`` —
    no silent cap); with fixed priorities the result is the greedy
    (lexicographic-by-priority) MIS, independent of partitioning.

    Distribution (the >= ``driver_threshold`` path; below it a
    vectorized driver automaton runs the identical transition — the
    doc_kcore size-adaptive pattern, asserted path-equal in pytest):
    because the affine graph's MULT is invertible mod N, a node's
    IN-neighbours are as arithmetic as its out-neighbours
    (``(v − j)·MULT⁻¹ mod N``), so each round is ONE node-keyed
    co-location — every alive/MIS node emits its (state, priority)
    along BOTH edge directions (16 skinny rows) and the transition
    kernel folds own state + neighbour infos. Per-round traffic is
    O(E); state per round is the O(V) status table.

    Output: (doc_id, prio) of MIS members. The DuckDB oracle re-runs
    the same automaton as a recursive CTE over materialized symmetric
    adjacency (EXISTS / NOT-EXISTS per round — a different evaluation
    strategy), bit-equal at three scales."""
    n = table_rows(sf_dir, "documents")
    if n % MULT == 0:
        raise ValueError("derived-graph MULT shares a factor with N; "
                         "in-neighbour arithmetic needs gcd(MULT, N) = 1")
    inv = pow(MULT, -1, n)
    J = np.arange(1, K_OUT + 1, dtype=np.int64)
    INT_MAX = np.iinfo(np.int64).max

    def prio(v: np.ndarray) -> np.ndarray:
        return ((v.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(1 << 32)).astype(np.int64)

    if n <= driver_threshold and not force_distributed:
        v = np.arange(n, dtype=np.int64)
        p = prio(v)
        out_nb = (v[:, None] * MULT + J[None, :]) % n          # (n, 8)
        in_nb = ((v[:, None] - J[None, :]) * inv) % n          # (n, 8)
        nbr = np.concatenate([out_nb, in_nb], axis=1)          # (n, 16)
        self_loop = nbr == v[:, None]
        s = np.zeros(n, np.int64)
        for _ in range(max_rounds):
            sn = s[nbr]
            sn = np.where(self_loop, 3, sn)  # self rows never count
            has_mis = (sn == 1).any(axis=1)
            pn = np.where(sn == 0, p[nbr], INT_MAX)
            min_alive = pn.min(axis=1)
            alive = s == 0
            s = s.copy()
            s[alive & has_mis] = 2
            s[alive & ~has_mis & (p < min_alive)] = 1
            if not (s == 0).any():
                break
        else:
            raise RuntimeError(
                f"link_mis did not converge in {max_rounds} rounds")
        keep = s == 1
        import pyarrow as pa
        return rd.from_arrow(pa.table({"doc_id": v[keep], "prio": p[keep]}))

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    state = docs.map_batches(
        lambda df: pd.DataFrame({
            "node": df["doc_id"].to_numpy(np.int64),
            "s": np.zeros(len(df), np.int64),
            "p": prio(df["doc_id"].to_numpy(np.int64)),
            "tag": np.zeros(len(df), np.int64),   # 0 = state row
        }), batch_format="pandas").materialize()

    def msgs(df: pd.DataFrame) -> pd.DataFrame:
        st = df[(df["tag"] == 0) & (df["s"] <= 1)]  # alive or MIS speak
        v = st["node"].to_numpy(np.int64)
        out_dst = ((v[:, None] * MULT + J[None, :]) % n)
        in_dst = ((v[:, None] - J[None, :]) * inv) % n
        dst = np.concatenate([out_dst, in_dst], axis=1).ravel()
        vr = np.repeat(v, 2 * K_OUT)
        keep = dst != vr
        return pd.DataFrame({
            "node": dst[keep],
            "s": np.repeat(st["s"].to_numpy(np.int64), 2 * K_OUT)[keep],
            "p": np.repeat(st["p"].to_numpy(np.int64), 2 * K_OUT)[keep],
            "tag": np.ones(int(keep.sum()), np.int64),  # 1 = neighbour info
        })

    def transition(df: pd.DataFrame) -> pd.DataFrame:
        st = df[df["tag"] == 0]
        info = df[df["tag"] == 1]
        nodes = st["node"].to_numpy(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        s = st["s"].to_numpy(np.int64)[order].copy()
        p = st["p"].to_numpy(np.int64)[order]
        pos = np.searchsorted(nodes, info["node"].to_numpy(np.int64))
        i_s = info["s"].to_numpy(np.int64)
        i_p = info["p"].to_numpy(np.int64)
        has_mis = np.zeros(len(nodes), bool)
        np.logical_or.at(has_mis, pos, i_s == 1)
        min_alive = np.full(len(nodes), INT_MAX, np.int64)
        al = i_s == 0
        np.minimum.at(min_alive, pos[al], i_p[al])
        alive = s == 0
        s[alive & has_mis] = 2
        s[alive & ~has_mis & (p < min_alive)] = 1
        return pd.DataFrame({"node": nodes, "s": s, "p": p,
                             "tag": np.zeros(len(nodes), np.int64)})

    for _ in range(max_rounds):
        m = state.map_batches(msgs, batch_format="pandas")
        state = grouped(state.union(m), ["node"], transition,
                        rows=n * (2 * K_OUT + 1)).materialize()
        n_alive = state.map_batches(
            lambda df: pd.DataFrame({"a": [int((df["s"] == 0).sum())]}),
            batch_format="pandas").to_pandas()["a"].sum()
        if n_alive == 0:
            break
    else:
        raise RuntimeError(
            f"link_mis did not converge in {max_rounds} rounds")

    return state.map_batches(
        lambda df: df[df["s"] == 1][["node", "p"]].rename(
            columns={"node": "doc_id", "p": "prio"}),
        batch_format="pandas")


LP_ROUNDS = 4  # synchronous label-propagation rounds (fixed snapshot)


def link_label_prop(sf_dir: str, rounds: int = LP_ROUNDS,
                    force_distributed: bool = False,
                    driver_threshold: int = 200_000) -> rd.Dataset:
    """SYNCHRONOUS MAJORITY-VOTE LABEL PROPAGATION (Raghavan et al. 2007
    community detection) over the symmetrized derived link graph — the
    MODE-update iterative shape the repo's other fixpoints don't cover
    (CC/SSSP propagate a MIN, k-core REMOVES, MIS SELECTS; label prop
    takes the PLURALITY of neighbour labels). Every node starts with its
    own id; each round every node adopts the most frequent label among
    its per-directed-edge neighbour votes (one vote per direction per
    edge, self-loops excluded; ties → smallest label; an isolated node
    keeps its previous label). A FIXED ``rounds`` snapshot — majority
    dynamics need not converge (2-cycles exist), so the contract is the
    synchronous state after exactly R rounds, deterministic and
    partitioning-invariant because labels and tie rules are integers.

    Distribution (>= ``driver_threshold``; below it a vectorized driver
    automaton runs the identical transition — the link_mis size-adaptive
    pattern, path-equality tested): MULT is invertible mod N so both
    edge directions are arithmetic; each round every node emits its
    label along both directions (≤16 skinny rows, block-local
    (dst, label) pre-count as the combiner) plus a count-0 self row
    (the keep-own-label fallback rides the same exchange), and ONE
    node-keyed co-location resolves the plurality. Per-round traffic
    O(E); state O(V).

    Output: (doc_id, label) after R rounds. Oracle: R unrolled
    majority-CTE rounds (count DESC, label ASC row_number) over the
    same directed edge list, bit-equal at three scales."""
    n = table_rows(sf_dir, "documents")
    if n % MULT == 0:
        raise ValueError("derived-graph MULT shares a factor with N; "
                         "in-neighbour arithmetic needs gcd(MULT, N) = 1")
    # the distributed combiner packs (node, label) into one int64 key
    # (dst * n + lab, both < n) — exact only while n^2 < 2^63. Beyond
    # ~3.03e9 nodes the key must widen (two-column groupby or uint128
    # split) — fail loudly instead of wrapping silently.
    if n > 3_037_000_499:
        raise ValueError("link_label_prop's int64 composite vote key "
                         "requires n^2 < 2^63; widen the key for larger "
                         "corpora")
    inv = pow(MULT, -1, n)
    J = np.arange(1, K_OUT + 1, dtype=np.int64)

    if n <= driver_threshold and not force_distributed:
        v = np.arange(n, dtype=np.int64)
        lab = v.copy()
        out_nb = (v[:, None] * MULT + J[None, :]) % n
        in_nb = ((v[:, None] - J[None, :]) * inv) % n
        nbr = np.concatenate([out_nb, in_nb], axis=1)      # (n, 16)
        valid = nbr != v[:, None]
        src = np.repeat(v, 2 * K_OUT)[valid.ravel()]
        dst = nbr.ravel()[valid.ravel()]
        for _ in range(rounds):
            # votes: src receives dst's label AND dst receives src's —
            # both directions are already in (src, dst) because nbr
            # holds out- and in-neighbours
            votes_v = src
            votes_l = lab[dst]
            # own-label 0-count fallback handled implicitly: every node
            # has >= K_OUT - 1 votes here (distinct out-neighbours), so
            # the fallback never fires on the derived graph — kept in
            # the distributed path for generality
            key = votes_v * np.int64(n) + votes_l
            uk, cnt = np.unique(key, return_counts=True)
            kv = uk // n
            kl = uk % n
            o = np.lexsort((kl, -cnt, kv))  # per node: count desc, lab asc
            kv_s, kl_s = kv[o], kl[o]
            first = np.unique(kv_s, return_index=True)[1]
            new = lab.copy()
            new[kv_s[first]] = kl_s[first]
            lab = new
        import pyarrow as pa
        return rd.from_arrow(pa.table({"doc_id": v, "label": lab}))

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    state = docs.map_batches(
        lambda df: pd.DataFrame({
            "node": df["doc_id"].to_numpy(np.int64),
            "lab": df["doc_id"].to_numpy(np.int64),
            "c": np.zeros(len(df), np.int64)}),  # count-0 self rows
        batch_format="pandas").materialize()

    def votes(df: pd.DataFrame) -> pd.DataFrame:
        v = df["node"].to_numpy(np.int64)
        lb = df["lab"].to_numpy(np.int64)
        out_dst = (v[:, None] * MULT + J[None, :]) % n
        in_dst = ((v[:, None] - J[None, :]) * inv) % n
        dst = np.concatenate([out_dst, in_dst], axis=1).ravel()
        vr = np.repeat(v, 2 * K_OUT)
        lr = np.repeat(lb, 2 * K_OUT)
        keep = dst != vr
        dst, lr = dst[keep], lr[keep]
        # block-local combiner: pre-count (dst, lab)
        key = dst * np.int64(n) + lr
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"node": (uk // n).astype(np.int64),
                             "lab": (uk % n).astype(np.int64),
                             "c": cnt.astype(np.int64)})

    def plurality(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["node", "lab"], sort=False)["c"].sum()
             .reset_index())
        g = g.sort_values(["node", "c", "lab"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates("node")
        return pd.DataFrame({"node": g["node"].to_numpy(np.int64),
                             "lab": g["lab"].to_numpy(np.int64),
                             "c": np.zeros(len(g), np.int64)})

    for _ in range(rounds):
        m = state.map_batches(votes, batch_format="pandas")
        state = grouped(state.union(m), ["node"], plurality,
                        rows=n * (2 * K_OUT + 1)).materialize()

    return state.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["node"].to_numpy(np.int64),
            "label": df["lab"].to_numpy(np.int64)}),
        batch_format="pandas")


def link_label_prop_sql(rounds: int = LP_ROUNDS) -> str:
    """DuckDB mirror of :func:`link_label_prop`: R unrolled majority
    rounds over the directed edge list (one vote per direction per
    edge), row_number (count DESC, label ASC), LEFT-JOIN coalesce for
    the isolated-node fallback."""
    parts = [f"""WITH nn AS (SELECT count(*) AS n FROM documents),
    e AS MATERIALIZED (
        SELECT d.doc_id AS src, (d.doc_id * {MULT} + t.j) % nn.n AS dst
        FROM documents d CROSS JOIN range(1, {K_OUT + 1}) t(j) CROSS JOIN nn
        WHERE d.doc_id <> (d.doc_id * {MULT} + t.j) % nn.n),
    l0 AS (SELECT doc_id AS v, doc_id AS lab FROM documents)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    v{r} AS (SELECT e.dst AS v, l.lab FROM e
             JOIN l{r - 1} l ON l.v = e.src
             UNION ALL
             SELECT e.src, l.lab FROM e JOIN l{r - 1} l ON l.v = e.dst),
    c{r} AS (SELECT v, lab, count(*) AS c FROM v{r} GROUP BY v, lab),
    m{r} AS (SELECT v, lab FROM (
                 SELECT v, lab, row_number() OVER (
                     PARTITION BY v ORDER BY c DESC, lab) AS rn
                 FROM c{r}) WHERE rn = 1),
    l{r} AS MATERIALIZED (
        SELECT p.v, coalesce(m{r}.lab, p.lab) AS lab
        FROM l{r - 1} p LEFT JOIN m{r} ON m{r}.v = p.v)""")
    parts.append(f"""
    SELECT v AS doc_id, lab AS label FROM l{rounds}""")
    return "".join(parts)


def link_mis_sql(max_rounds: int = MIS_ROUNDS) -> str:
    """Recursive-CTE oracle for :func:`link_mis`: the same synchronous
    automaton over materialized symmetric adjacency; extra rounds after
    the fixpoint are no-ops, so a fixed round count matches the engine's
    converge-then-stop loop."""
    return f"""
        WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        e0 AS (SELECT d.doc_id AS u, (d.doc_id * {MULT} + t.j) % nn.n AS v
               FROM documents d CROSS JOIN range(1, {K_OUT + 1}) t(j)
               CROSS JOIN nn
               WHERE d.doc_id <> (d.doc_id * {MULT} + t.j) % nn.n),
        sym AS (SELECT DISTINCT u AS w, v AS x FROM e0
                UNION SELECT v, u FROM e0),
        pr AS (SELECT doc_id AS v,
                      CAST((CAST(doc_id AS HUGEINT) * 2654435761)
                           % 4294967296 AS BIGINT) AS p
               FROM documents),
        st(node, r, s) AS (
            SELECT doc_id, 0, 0 FROM documents
            UNION ALL
            SELECT a.node, a.r + 1,
                   CASE WHEN a.s <> 0 THEN a.s
                        WHEN EXISTS (SELECT 1 FROM sym
                                     JOIN st b ON b.node = sym.x
                                              AND b.r = a.r
                                     WHERE sym.w = a.node AND b.s = 1)
                            THEN 2
                        WHEN NOT EXISTS (SELECT 1 FROM sym
                                     JOIN st b ON b.node = sym.x
                                              AND b.r = a.r
                                     JOIN pr pw ON pw.v = sym.x
                                     WHERE sym.w = a.node AND b.s = 0
                                       AND pw.p < (SELECT p FROM pr
                                                   WHERE pr.v = a.node))
                            THEN 1
                        ELSE 0 END
            FROM st a WHERE a.r < {max_rounds}
        )
        SELECT st.node AS doc_id, pr.p AS prio
        FROM st JOIN pr ON pr.v = st.node
        WHERE st.r = {max_rounds} AND st.s = 1
    """
