"""Relational / windowed pipelines over the driver corpus tables —
exercising the engine's partial-aggregation, broadcast-join, and
map_groups-window patterns with DuckDB-oracle-checkable semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..sources import read_table, table_rows
from ..stages.agg import AggSpec, groupby_agg
from ..stages.join import colocated_attach


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: filtered lineitem → grouped sums/means (partial-agg).

    All money stays in exact int64 cents (prices in the corpus are exact
    cents, discounts exact hundredths) until ONE terminal double division,
    so the result is bit-equal to the SQL mirror regardless of the order
    blocks reduce in — float sums of 6e5+ addends drift by ulps between
    partitionings, and round(4) can't hide a .xxxx5 boundary (numpy
    banker's vs DuckDB half-away)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def exact_units(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= pd.Timestamp("2001-09-02")]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        disc_h = np.rint(df["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "l_linestatus": df["l_linestatus"].to_numpy(),
            "qty_i": df["l_quantity"].to_numpy().astype(np.int64),
            "cents": cents,
            "disc_tt": cents * (100 - disc_h),  # ten-thousandths
        })

    ds = ds.map_batches(exact_units, batch_format="pandas")
    out = groupby_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            AggSpec("qty_sum", "qty_i", "sum"),
            AggSpec("cents_sum", "cents", "sum"),
            AggSpec("tt_sum", "disc_tt", "sum"),
            AggSpec("count_order", None, "count"),
        ],
        small=True,  # 6 (returnflag, linestatus) groups — a full-size
        # hash-shuffle pool would cost more in actor startup than the agg
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["count_order"].to_numpy().astype(np.int64)
        qty = df["qty_sum"].to_numpy().astype(np.int64)
        cents = df["cents_sum"].to_numpy().astype(np.int64)
        tt = df["tt_sum"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": qty.astype(np.float64),
            "sum_base_price": cents / 100.0,
            "sum_disc_price": tt / 10000.0,
            "avg_qty": qty / n,
            "avg_price": cents / (n * 100),
            "count_order": n,
        })

    return out.map_batches(finalize, batch_format="pandas")


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer ⋈ nation → revenue per nation.  Scale layout
    (q7/q21 marker co-location, NOT a customer broadcast — customer scales
    linearly with SF, so shipping it whole to the driver and every task is
    the round-2 perf-weak finding): orders reduce to ≤1 revenue partial per
    (block, custkey) by a combiner, customer's (custkey, nationkey) rides
    the SAME custkey-keyed exchange as tagged marker rows, and each block
    resolves custkey→nationkey locally and re-reduces to ≤25 nation
    partials — so the terminal aggregate sees #blocks × #nations rows, and
    the only broadcast is the constant 25-row nation table."""
    from ..rayctx import grouped

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def order_partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False, as_index=False).agg(
            rev=("o_totalprice", "sum"), n=("o_totalprice", "size"))
        return pd.DataFrame({
            "c_custkey": g["o_custkey"].to_numpy().astype(np.int64),
            "rev": g["rev"].to_numpy(),
            "n": g["n"].to_numpy().astype(np.int64),
            "c_nationkey": np.int64(-1)})

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy().astype(np.int64),
            "rev": np.float64(0.0), "n": np.int64(0),
            "c_nationkey": df["c_nationkey"].to_numpy().astype(np.int64)})

    def nation_partials(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["c_nationkey"] >= 0
        nk = df.loc[mark].set_index("c_custkey")["c_nationkey"]
        d = df[~mark]
        g = d.groupby("c_custkey", sort=False, as_index=False)[["rev", "n"]].sum()
        g["c_nationkey"] = g["c_custkey"].map(nk)
        g = g.dropna(subset=["c_nationkey"])
        out = g.groupby("c_nationkey", sort=False, as_index=False)[["rev", "n"]].sum()
        return pd.DataFrame({
            "n_nationkey": out["c_nationkey"].to_numpy().astype(np.int64),
            "rev": out["rev"].to_numpy(),
            "n": out["n"].to_numpy().astype(np.int64)})

    per_block = grouped(
        orders.map_batches(order_partials, batch_format="pandas").union(
            customer.map_batches(cust_markers, batch_format="pandas")),
        ["c_custkey"], nation_partials, small=True)

    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = nation.set_index("n_nationkey")["n_name"]

    # terminal fold on the driver: per_block is ≤ #blocks × 25 rows, so a
    # second aggregator-pool exchange would cost more in actor spawn than
    # the whole 25-key reduce (measured +0.85 s at sf0.1)
    pdf = per_block.to_pandas()
    g = pdf.groupby("n_nationkey", sort=False, as_index=False)[["rev", "n"]].sum()
    out = pd.DataFrame({
        "n_name": g["n_nationkey"].map(names).to_numpy(),
        "total_revenue": np.round(g["rev"].to_numpy(), 4),
        "n_orders": g["n"].to_numpy().astype(np.int64)})
    return rd.from_pandas(out.reset_index(drop=True))


def q3_shipping_priority(sf_dir: str, k: int = 10,
                         segment: str = "BUILDING",
                         cutoff: str = "1998-06-01") -> pa.Table:
    """TPC-H Q3 shape: customer(segment) ⋈ orders(date<cutoff) ⋈
    lineitem(shipdate>cutoff) → revenue per order → global top-k. The
    multiway-join layout fused into TWO co-location exchanges (the
    q7/q21 layout): the segment-filtered customer keys ride the
    custkey-keyed exchange as markers semi-filtering orders, the
    surviving order rows ride the orderkey-keyed exchange as markers
    over the combiner-reduced lineitem revenue partials, each block
    emits only its local top-k, and the driver folds ≤ k·blocks rows.
    Money stays in exact int64 ten-thousandths (order-free sums) with
    integer half-up cent rounding, mirrored by the SQL."""
    from ..rayctx import grouped

    cut = pd.Timestamp(cutoff)
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    # exchange A (custkey): date-filtered orders + segment-key markers
    def cust_markers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], pa.scalar(segment)))
        n = t.num_rows
        return pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "o_orderkey": np.full(n, -1, np.int64),
            "o_orderdate": pa.array([None] * n, pa.timestamp("us")),
            "o_orderpriority": pa.array([""] * n, pa.string())})

    def order_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
        return pa.table({
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"]})

    def semi_orders(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["o_orderkey"] < 0
        keys = df.loc[mark, "o_custkey"].unique()
        d = df[~mark]
        d = d[d["o_custkey"].isin(keys)]
        return pd.DataFrame({
            "l_orderkey": d["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": d["o_orderdate"].to_numpy(),
            "o_orderpriority": d["o_orderpriority"].to_numpy(),
            "tt": np.int64(0)})

    sized = grouped(orders.map_batches(order_rows, batch_format="pyarrow").union(
        cust.map_batches(cust_markers, batch_format="pyarrow")),
        ["o_custkey"], semi_orders, small=True)

    # exchange B (orderkey): lineitem revenue partials + surviving orders
    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cut]
        rev = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        g = pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy().astype(np.int64),
            "tt": np.round(rev * 10000.0).astype(np.int64),
        }).groupby("l_orderkey", sort=False, as_index=False)["tt"].sum()
        g["o_orderdate"] = pd.NaT
        g["o_orderpriority"] = ""
        return g[["l_orderkey", "o_orderdate", "o_orderpriority", "tt"]]

    def finalize_topk(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["o_orderpriority"] != ""
        o = df.loc[mark].set_index("l_orderkey")
        d = df[~mark]
        g = d.groupby("l_orderkey", sort=False, as_index=False)["tt"].sum()
        prio = g["l_orderkey"].map(o["o_orderpriority"])
        g = g.assign(o_orderpriority=prio,
                     o_orderdate=g["l_orderkey"].map(o["o_orderdate"]))
        g = g.dropna(subset=["o_orderpriority"])
        if len(g) > k:
            idx = np.lexsort((g["l_orderkey"].to_numpy(), -g["tt"].to_numpy()))[:k]
            g = g.iloc[idx]
        return pd.DataFrame({
            "o_orderkey": g["l_orderkey"].to_numpy(np.int64),
            "tt": g["tt"].to_numpy(np.int64),
            "o_orderdate": g["o_orderdate"].to_numpy(),
            "o_orderpriority": g["o_orderpriority"].to_numpy()})

    per_block = grouped(
        li.map_batches(li_partial, batch_format="pandas").union(sized),
        ["l_orderkey"], finalize_topk, small=True)
    pdf = per_block.to_pandas().sort_values(
        ["tt", "o_orderkey"], ascending=[False, True], kind="stable").head(k)
    pdf["revenue"] = ((pdf["tt"].to_numpy() + 50) // 100).astype(np.float64) / 100.0
    pdf = pdf[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


def event_zscore_outliers(sf_dir: str, z: float = 3.0) -> rd.Dataset:
    """Per-event-type z-score outlier flagging — the two-pass
    global-statistic pattern: pass 1 reduces every block to (type, n, Σv,
    Σv²) partials (shuffle-free driver reduce over #types × #blocks rows),
    the per-type mean/σ_pop pair is broadcast as a tiny closure dict, and
    pass 2 streams the |v−μ| > z·σ filter with no shuffle at all."""
    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)["value"]
        return pd.DataFrame({
            "event_type": g.sum().index,
            "n": g.size().to_numpy().astype(np.int64),
            "s": g.sum().to_numpy(),
            "ss": df.assign(v2=df["value"] ** 2)
                    .groupby("event_type", sort=False)["v2"].sum().to_numpy(),
        })

    m = ev.map_batches(moments, batch_format="pandas").to_pandas()
    m = m.groupby("event_type", as_index=False)[["n", "s", "ss"]].sum()
    mu = m["s"] / m["n"]
    sd = np.sqrt(np.maximum(m["ss"] / m["n"] - mu**2, 0.0))
    stats = {t: (float(a), float(b)) for t, a, b in zip(m["event_type"], mu, sd)}

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        ms = df["event_type"].map({k: v[0] for k, v in stats.items()}).to_numpy()
        sds = df["event_type"].map({k: v[1] for k, v in stats.items()}).to_numpy()
        v = df["value"].to_numpy()
        keep = np.abs(v - ms) > z * sds
        out = df.loc[keep, ["event_id", "event_type"]].copy()
        out["value"] = np.round(v[keep], 4)
        out["zscore"] = np.round((v[keep] - ms[keep]) / sds[keep], 4)
        return out

    return ev.map_batches(flag, batch_format="pandas")


def top_parts_by_revenue(sf_dir: str, k: int = 10) -> pa.Table:
    """Global top-k: partial agg per part → small sort on aggregates."""
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        return t.append_column(
            "revenue", pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        )

    per_part = groupby_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["l_partkey"],
        [AggSpec("part_revenue", "revenue", "sum")],
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        """Per-block top-k on the rounded revenue (each partkey is fully
        contained in one post-shuffle block) — the global sort then touches
        only (#blocks x k) rows, same pattern as ann_topk."""
        df = df.copy()
        df["part_revenue"] = df["part_revenue"].round(4)
        return df.sort_values(["part_revenue", "l_partkey"],
                              ascending=[False, True]).head(k)

    pdf = per_part.map_batches(local_topk, batch_format="pandas").to_pandas()
    pdf = pdf.sort_values(["part_revenue", "l_partkey"], ascending=[False, True]).head(k)
    # winner-only pushdown read: only the k winners' part rows leave
    # storage (part scales with SF — round-4 de-broadcast)
    import os as _os

    import pyarrow.parquet as _pq

    part = _pq.read_table(
        _os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
        filters=[("p_partkey", "in", pdf["l_partkey"].tolist())]).to_pandas()
    pdf = pdf.merge(part, left_on="l_partkey", right_on="p_partkey", how="left")
    return pa.Table.from_pandas(pdf[["l_partkey", "p_name", "part_revenue"]].reset_index(drop=True))


def supplier_part_stats(sf_dir: str) -> rd.Dataset:
    """lineitem ⋈ supplier ⋈ nation → per-nation lineitem stats with
    min/max aggregates. Scale layout (q7/q21 marker co-location, NOT a
    supplier broadcast — supplier scales linearly with SF, so shipping it
    whole to the driver and every task was the round-3 perf-weak finding):
    lineitem reduces to ≤1 (n, min, max, price-sum) partial per (block,
    suppkey) in a combiner, supplier's (suppkey, nationkey) rides the SAME
    suppkey-keyed exchange as tagged marker rows, each block resolves
    suppkey→nationkey locally and re-reduces to ≤25 nation partials, and
    the driver folds ≤ #blocks × 25 rows. The only broadcast is the
    constant 25-row nation name table."""
    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_quantity", "l_extendedprice"])
    supplier = read_table(sf_dir, "supplier",
                          columns=["s_suppkey", "s_nationkey"])

    def li_partials(df: pd.DataFrame) -> pd.DataFrame:
        # price sums in exact int64 cents (prices are 2dp): partial-sum
        # ORDER differs between the engine's fold tree and DuckDB's
        # single-pass avg, and float sums land ON 4th-decimal rounding
        # boundaries at larger SF (the q7 hazard) — integer sums are
        # order-free, and the oracle mirrors the same cents expression
        d = df.assign(cents=np.rint(df["l_extendedprice"].to_numpy()
                                    * 100.0).astype(np.int64))
        g = d.groupby("l_suppkey", sort=False, as_index=False).agg(
            n=("l_quantity", "size"), mn=("l_quantity", "min"),
            mx=("l_quantity", "max"), ps=("cents", "sum"))
        return pd.DataFrame({
            "l_suppkey": g["l_suppkey"].to_numpy().astype(np.int64),
            "n": g["n"].to_numpy().astype(np.int64),
            "mn": g["mn"].to_numpy().astype(np.float64),
            "mx": g["mx"].to_numpy().astype(np.float64),
            "ps": g["ps"].to_numpy().astype(np.int64),
            "nk": np.int64(-1)})

    def supp_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": df["s_suppkey"].to_numpy().astype(np.int64),
            "n": np.int64(0), "mn": np.float64(0.0), "mx": np.float64(0.0),
            "ps": np.int64(0),
            "nk": df["s_nationkey"].to_numpy().astype(np.int64)})

    def nation_partials(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["nk"] >= 0
        nk = df.loc[mark].set_index("l_suppkey")["nk"]
        d = df[~mark]
        g = d.groupby("l_suppkey", sort=False, as_index=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"),
            ps=("ps", "sum"))
        g["nk"] = g["l_suppkey"].map(nk)
        g = g.dropna(subset=["nk"])
        out = g.groupby("nk", sort=False, as_index=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"),
            ps=("ps", "sum"))
        return pd.DataFrame({
            "nk": out["nk"].to_numpy().astype(np.int64),
            "n": out["n"].to_numpy().astype(np.int64),
            "mn": out["mn"].to_numpy(), "mx": out["mx"].to_numpy(),
            "ps": out["ps"].to_numpy()})

    per_block = grouped(
        li.map_batches(li_partials, batch_format="pandas").union(
            supplier.map_batches(supp_markers, batch_format="pandas")),
        ["l_suppkey"], nation_partials, small=True)

    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    names = nation.set_index("n_nationkey")["n_name"]

    # terminal fold on the driver: ≤ #blocks × 25 rows
    pdf = per_block.to_pandas()
    g = pdf.groupby("nk", sort=False, as_index=False).agg(
        n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"), ps=("ps", "sum"))
    # avg to 4dp via integer half-up on the exact cents sum:
    # round(cents/(100n), 4) = ⌊(cents·200 + n) / (2n)⌋ / 10⁴ — one
    # integer expression both engines share (no float-sum order, no
    # banker's-rounding divergence)
    cents = g["ps"].to_numpy().astype(np.int64)
    n = g["n"].to_numpy().astype(np.int64)
    micro = (cents * 200 + n) // (2 * n)
    out = pd.DataFrame({
        "n_name": g["nk"].map(names).to_numpy(),
        "n_items": n,
        "min_qty": g["mn"].to_numpy(),
        "max_qty": g["mx"].to_numpy(),
        "avg_price": micro.astype(np.float64) / 10000.0})
    return rd.from_pandas(out.reset_index(drop=True))


def orders_by_month(sf_dir: str) -> rd.Dataset:
    """Orders per calendar month (event-time truncation on the big table)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def bucket(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        y = pc.year(d)
        m = pc.month(d)
        ym = pc.add(pc.multiply(pc.cast(y, pa.int64()), pa.scalar(100, type=pa.int64())),
                    pc.cast(m, pa.int64()))
        return t.append_column("order_month", ym)

    ds = orders.map_batches(bucket, batch_format="pyarrow")
    out = groupby_agg(ds, ["order_month"],
                      [AggSpec("n_orders", None, "count"),
                       AggSpec("revenue", "o_totalprice", "sum")],
                      small=True)  # ~80 calendar months

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(4)
        return df

    return out.map_batches(rounded, batch_format="pandas")


def docs_by_lang(sf_dir: str) -> rd.Dataset:
    """documents per language with mean length — trivial shape, broad oracle."""
    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    out = groupby_agg(docs, ["lang"],
                      [AggSpec("n_docs", None, "count"),
                       AggSpec("avg_chars", "n_chars", "mean")], small=True)

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_chars"] = df["avg_chars"].round(4)
        return df

    return out.map_batches(rounded, batch_format="pandas")


WINDOW_US = 3_600_000_000  # 1 hour


def events_tumbling(sf_dir: str) -> rd.Dataset:
    """Tumbling 1 h event-time windows per user: count + sum(value).

    Ray Data has no native windows (SURVEY.md §2.9: none in the reference
    either); a window here = integer bucket of the event-time microseconds,
    then a partial-agg groupby — fully parallel, no ordering requirement.
    """
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, pa.scalar(WINDOW_US, type=pa.int64())), pa.scalar(WINDOW_US, type=pa.int64()))
        return t.append_column("window_start_us", win)

    ds = ev.map_batches(bucket, batch_format="pyarrow")
    out = groupby_agg(
        ds,
        ["user_id", "window_start_us"],
        [AggSpec("n_events", None, "count"), AggSpec("sum_value", "value", "sum")],
    )

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(4)
        return df

    return out.map_batches(rounded, batch_format="pandas")


DAY_US = 86_400_000_000


def daily_active_users(sf_dir: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT user_id) per day — the distributed exact-distinct
    pattern: each block first reduces to its LOCAL distinct (day, user)
    incidence pairs (the combiner: repeated events of a user within a block
    never enter the shuffle), then ONE hash shuffle co-locates each day and
    the final block dedups across blocks and counts. Payload entering the
    exchange is bounded by |distinct pairs|, not event count."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def local_pairs(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(DAY_US, type=pa.int64())),
                          pa.scalar(DAY_US, type=pa.int64()))
        df = pd.DataFrame({"day_us": day.to_numpy(),
                           "user_id": t["user_id"].to_numpy(),
                           "is_click": pc.equal(t["event_type"], pa.scalar("click")).to_numpy()})
        # local distinct per (day,user) + per-user-day click flag (any)
        g = df.groupby(["day_us", "user_id"], sort=False)["is_click"].any().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = ev.map_batches(local_pairs, batch_format="pyarrow")

    def final_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["day_us", "user_id"], sort=False)["is_click"].any().reset_index()
        out = g.groupby("day_us", sort=False).agg(
            n_users=("user_id", "size"), n_clicking_users=("is_click", "sum"))
        out["n_clicking_users"] = out["n_clicking_users"].astype(np.int64)
        return out.reset_index()

    return grouped(pairs, ["day_us"], final_block, small=True)


HOP_US = 1_800_000_000  # 30 min hop


def events_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding (hopping) 1 h windows every 30 min per user: each event lands
    in exactly ``size/hop`` = 2 windows — a flat-map duplication inside
    ``map_batches`` followed by the same partial-agg groupby as the tumbling
    op. The duplication factor is the window overlap — constant — so the
    shuffle stays linear in the input."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def expand(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        parts = []
        for k in (0, 1):
            ws = pc.multiply(
                pc.subtract(pc.divide(us, pa.scalar(HOP_US, type=pa.int64())),
                            pa.scalar(k, type=pa.int64())),
                pa.scalar(HOP_US, type=pa.int64()))
            parts.append(pa.table({
                "user_id": t["user_id"],
                "window_start_us": ws,
                "value": t["value"],
            }))
        return pa.concat_tables(parts)

    ds = ev.map_batches(expand, batch_format="pyarrow")
    out = groupby_agg(
        ds, ["user_id", "window_start_us"],
        [AggSpec("n_events", None, "count"), AggSpec("sum_value", "value", "sum")],
    )

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(4)
        return df

    return out.map_batches(rounded, batch_format="pandas")


SESSION_GAP_US = 1_800_000_000  # 30 min


def events_sessionize(sf_dir: str) -> rd.Dataset:
    """Session windows per user (gap > 30 min starts a new session):
    groupby(user).map_groups over ts-sorted events — the engine's
    stream-shaped pattern (ordered log partitioned by key)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def sessions_block(df: pd.DataFrame) -> pd.DataFrame:
        """Hash-partitioned block (each user fully local): sessionize every
        user at once — one vectorized pass, no per-group Python."""
        if len(df) == 0:
            return pd.DataFrame(columns=["user_id", "session_start_us", "session_end_us",
                                         "n_events", "sum_value"])
        df = df.sort_values(["user_id", "ts"], kind="stable")
        us = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        new_sess = np.ones(len(df), dtype=bool)
        new_sess[1:] = (uid[1:] != uid[:-1]) | ((us[1:] - us[:-1]) > SESSION_GAP_US)
        sess_id = np.cumsum(new_sess) - 1
        out = (
            pd.DataFrame({"sid": sess_id, "user_id": uid, "us": us,
                          "value": df["value"].to_numpy()})
            .groupby("sid", sort=False)
            .agg(user_id=("user_id", "first"),
                 session_start_us=("us", "min"), session_end_us=("us", "max"),
                 n_events=("us", "size"), sum_value=("value", "sum"))
            .reset_index(drop=True)
        )
        out["sum_value"] = out["sum_value"].round(4)
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from ..rayctx import grouped

    return grouped(ev, ["user_id"], sessions_block, rows=table_rows(sf_dir, "events"))


def event_gaps(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event-gap statistics (lag-window shape): one hash
    shuffle on user_id, then a single vectorized diff over the
    (user, ts, event_id)-sorted block — consecutive-event time deltas with
    user boundaries masked, reduced to per-user n_events / n_gaps /
    avg / max gap seconds. The SQL mirror is lag() OVER (PARTITION BY
    user_id ORDER BY ts, event_id)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def gaps_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_events", "n_gaps", "avg_gap_s", "max_gap_s"]
        if len(df) == 0:
            return pd.DataFrame(columns=cols)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        same = uid[1:] == uid[:-1]
        gap_s = (us[1:] - us[:-1]).astype(np.float64) / 1e6
        # gaps stay exact int64 microseconds until ONE terminal double
        # division (round(4) sat on .xxxx5 boundaries where numpy banker's
        # and DuckDB half-away disagree)
        g = pd.DataFrame({"user_id": uid[1:][same], "gap_us": (us[1:] - us[:-1])[same]})
        stats = g.groupby("user_id", sort=False).agg(
            n_gaps=("gap_us", "size"), sum_us=("gap_us", "sum"), max_us=("gap_us", "max"))
        counts = pd.Series(uid).value_counts().rename("n_events")
        out = counts.to_frame().join(stats, how="left").reset_index(names="user_id")
        out["n_gaps"] = out["n_gaps"].fillna(0).astype("int64")
        n_gaps = out["n_gaps"].to_numpy()
        sum_us = out["sum_us"].fillna(0).to_numpy().astype(np.int64)
        max_us = out["max_us"].fillna(0).to_numpy().astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = sum_us.astype(np.float64) / (n_gaps * 1_000_000)
        out["avg_gap_s"] = np.where(n_gaps > 0, avg, 0.0)
        out["max_gap_s"] = max_us / 1_000_000.0
        out["n_events"] = out["n_events"].astype("int64")
        return out[cols]

    from ..rayctx import grouped

    return grouped(ev, ["user_id"], gaps_block, small=True)


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def docs_rollup(sf_dir: str) -> rd.Dataset:
    """ROLLUP(lang, source) document stats — every level (leaf, per-lang
    subtotal, grand total) derived from ONE set of (lang, source, n, Σchars)
    leaf partials: the combiner reduces each block to its distinct
    (lang, source) pairs, one small shuffle co-locates them, and the rollup
    levels are re-aggregations of the tiny leaf table (never a second scan
    of the corpus). Subtotal rows carry the ``(all)`` sentinel in the
    rolled-up key (SQL mirror: coalesce over GROUP BY ROLLUP)."""
    docs = read_table(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def leaf_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], sort=False)["n_chars"]
        out = g.agg(n="size", s="sum").reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["s"] = out["s"].astype(np.int64)
        return out

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        leaf = df.groupby(["lang", "source"], sort=False, as_index=False)[["n", "s"]].sum()
        per_lang = leaf.groupby("lang", sort=False, as_index=False)[["n", "s"]].sum()
        per_lang["source"] = "(all)"
        total = pd.DataFrame({"lang": ["(all)"], "source": ["(all)"],
                              "n": [leaf["n"].sum()], "s": [leaf["s"].sum()]})
        out = pd.concat([leaf, per_lang, total], ignore_index=True)
        out["n_docs"] = out["n"].astype(np.int64)
        out["avg_chars"] = (out["s"] / out["n"]).round(4)
        return out[["lang", "source", "n_docs", "avg_chars"]]

    part = docs.map_batches(leaf_partial, batch_format="pandas")
    # single terminal block: the rollup needs ALL leaves together and the
    # leaf table is tiny (langs × sources) by construction
    return part.repartition(1).map_batches(rollup, batch_format="pandas")


def event_type_pivot(sf_dir: str) -> rd.Dataset:
    """Crosstab: one wide row per user with a count column per event type.
    The pivot happens INSIDE the combiner (each block emits ≤1 wide partial
    row per user), so the shuffle carries users × blocks wide rows instead
    of raw events, and the final pass just sums co-located partials."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in _PIVOT_TYPES]

    def pivot_partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for t in _PIVOT_TYPES:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[list(_PIVOT_TYPES)].astype(np.int64)
        ct.columns = cols
        ct["n_total"] = ct.sum(axis=1)
        return ct.reset_index()

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", sort=False, as_index=False)[
            cols + ["n_total"]].sum()

    from ..rayctx import grouped

    part = ev.map_batches(pivot_partial, batch_format="pandas")
    return grouped(part, ["user_id"], final_sum, small=True)


def conversion_funnel(sf_dir: str) -> rd.Dataset:
    """Staged-sequence funnel: per user, the first ``view``, the first
    ``click`` at-or-after it, and the first ``purchase`` at-or-after that —
    the classic in-order conversion chain. One hash shuffle on user_id puts
    every user's history in one block; inside it each stage is a masked
    groupby-min gated by the previous stage's time (three vectorized
    passes, no per-user loop)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def funnel_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "t_view", "t_click", "t_purchase",
                "viewed", "clicked", "purchased"]
        if len(df) == 0:
            return pd.DataFrame(columns=cols)
        # three masked groupby-mins — each stage gates the next via a map
        t_view = df.loc[df["event_type"] == "view"].groupby("user_id")["ts"].min()
        tv = df["user_id"].map(t_view)
        t_click = df.loc[(df["event_type"] == "click") & (df["ts"] >= tv)] \
                    .groupby("user_id")["ts"].min()
        tc = df["user_id"].map(t_click)
        t_purchase = df.loc[(df["event_type"] == "purchase") & (df["ts"] >= tc)] \
                       .groupby("user_id")["ts"].min()
        users = np.sort(df["user_id"].unique())
        res = pd.DataFrame({"user_id": users})
        res["t_view"] = res["user_id"].map(t_view)
        res["t_click"] = res["user_id"].map(t_click)
        res["t_purchase"] = res["user_id"].map(t_purchase)
        res["viewed"] = res["t_view"].notna()
        res["clicked"] = res["t_click"].notna()
        res["purchased"] = res["t_purchase"].notna()
        return res

    from ..rayctx import grouped

    return grouped(ev, ["user_id"], funnel_block, small=True)


def events_asof_clicks(sf_dir: str) -> rd.Dataset:
    """Distributed AS-OF join: each event matched to the latest ``click``
    event of the same user at-or-before its timestamp (the classic
    attribution lookup; reference has no equivalent — this is one of the
    engine's training-data-pipeline additions).

    Ray Data has no as-of join, so it is expressed as ONE hash shuffle on
    the join key + a vectorized block kernel: sort the block by
    (user, ts, clicks-first), forward-fill the last-seen click index with
    ``np.maximum.accumulate``, reset at user boundaries. No per-row Python.

    Partitioning assumption: all rows of one user land in one block (hash
    partition on user_id); skew is bounded by the hottest single key, the
    same bound any keyed window operator has.

    Tie rules (mirrored by the DuckDB ASOF JOIN oracle): clicks are deduped
    per (user, ts) keeping the max event_id; an event that is itself a
    click matches itself (at-or-before is inclusive).
    """
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "is_click": pc.equal(t["event_type"], pa.scalar("click")),
        })

    ds = ev.map_batches(to_us, batch_format="pyarrow")

    def asof_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_id": np.zeros(0, np.int64),
                                 "user_id": np.zeros(0, np.int64),
                                 "ts_us": np.zeros(0, np.int64),
                                 "last_click_id": np.zeros(0, np.int64),
                                 "since_click_us": np.zeros(0, np.int64)})
        eid = df["event_id"].to_numpy().astype(np.int64)
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts_us"].to_numpy().astype(np.int64)
        isc = df["is_click"].to_numpy().astype(bool)
        # clicks before events at equal (user, ts); same-ts clicks by
        # event_id ASC so the fill keeps the max id
        order = np.lexsort((eid, (~isc).astype(np.int8), ts, uid))
        eid, uid, ts, isc = eid[order], uid[order], ts[order], isc[order]
        n = len(eid)
        pos = np.arange(n, dtype=np.int64)
        ff = np.maximum.accumulate(np.where(isc, pos, -1))
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        seg_len = np.diff(np.concatenate([starts, [n]]))
        user_start = np.repeat(starts, seg_len)
        valid = ff >= user_start
        ffc = np.clip(ff, 0, n - 1)
        last_click_id = np.where(valid, eid[ffc], np.int64(-1))
        since = np.where(valid, ts - ts[ffc], np.int64(-1))
        return pd.DataFrame({"event_id": eid, "user_id": uid, "ts_us": ts,
                             "last_click_id": last_click_id, "since_click_us": since})

    from ..rayctx import grouped

    return grouped(ds, ["user_id"], asof_block, small=True)


# deterministic per-stratum sampling rates for stratified_sample (a
# training-data curation primitive: balance languages by down-sampling the
# dominant ones; any stratum absent here keeps rate 1.0)
STRATA_RATES = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.75}


def stratified_sample(sf_dir: str, rates: dict | None = None) -> rd.Dataset:
    """Deterministic stratified Bernoulli sampling: keep a document iff
    ``knuth_hash(doc_id) % 10^4 < rate[lang] * 10^4``. Hash-derived, so the
    sample is reproducible at any parallelism / partitioning and needs NO
    shuffle — one streaming ``map_batches`` filter over a pruned read (the
    way a 100 TB corpus gets subsampled; a random() filter would be neither
    reproducible nor oracle-checkable). Integer arithmetic only; the DuckDB
    oracle replays it exactly."""
    rates = STRATA_RATES if rates is None else rates
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"].to_numpy().astype(np.int64)
        h = (doc_id.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        thr = np.asarray(
            [int(rates.get(l, 1.0) * 10_000) for l in t["lang"].to_pylist()],
            dtype=np.uint64)
        return t.filter(pa.array((h % np.uint64(10_000)) < thr))

    return docs.map_batches(keep, batch_format="pyarrow")


def lang_length_quantiles(sf_dir: str) -> rd.Dataset:
    """Per-language EXACT length quantiles (p25/p50/p90/p99 of n_chars) —
    the length-distribution audit every corpus curation run needs. One hash
    shuffle on lang (each language fully local to a block), then vectorized
    ``np.quantile`` per group. Values rounded to 4 on both sides: numpy and
    DuckDB use the same linear-interpolation definition but different fma
    orderings (last-ulp differences measured on this data)."""
    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def qblock(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            x = g["n_chars"].to_numpy()
            p25, p50, p90, p99 = (np.quantile(x, q) for q in (0.25, 0.5, 0.9, 0.99))
            rows.append((lang, len(x), round(float(p25), 4), round(float(p50), 4),
                         round(float(p90), 4), round(float(p99), 4)))
        return pd.DataFrame(rows, columns=["lang", "n_docs", "p25", "p50", "p90", "p99"])

    from ..rayctx import grouped

    return grouped(docs, ["lang"], qblock, small=True)


def event_running_stats(sf_dir: str) -> rd.Dataset:
    """Running-aggregate windows per user: cumulative sum of ``value``
    (UNBOUNDED PRECEDING) and a 4-row moving average (ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW), ordered by (ts, event_id). One hash shuffle
    on user_id puts every user's rows in one block; inside the block a
    single global cumsum + prefix-difference computes BOTH windows for all
    users at once (user boundaries via repeated segment starts) — no
    per-user loop, no per-row Python. The SQL mirror is SUM/AVG() OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN ...)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def win_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_id": np.zeros(0, np.int64),
                                 "user_id": np.zeros(0, np.int64),
                                 "run_sum": np.zeros(0), "mavg4": np.zeros(0)})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        val = df["value"].to_numpy().astype(np.float64)
        n = len(uid)
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        seg_len = np.diff(np.concatenate([starts, [n]]))
        user_start = np.repeat(starts, seg_len)
        cs = np.cumsum(val)
        # prefix sum BEFORE each user's first row (0 for the first user)
        base = np.where(user_start > 0, cs[np.maximum(user_start - 1, 0)], 0.0)
        run_sum = cs - base
        idx = np.arange(n)
        lo = np.maximum(user_start, idx - 3)          # window start (≥ user start)
        prev = lo - 1
        win_sum = cs - np.where(prev >= 0, cs[np.maximum(prev, 0)], 0.0)
        cnt = (idx - lo + 1).astype(np.float64)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": uid,
            "run_sum": np.round(run_sum, 4),
            "mavg4": np.round(win_sum / cnt, 4),
        })

    from ..rayctx import grouped

    return grouped(ev, ["user_id"], win_block, rows=table_rows(sf_dir, "events"))


def event_type_cooccurrence(sf_dir: str) -> rd.Dataset:
    """Co-occurrence graph over event types: for every unordered pair of
    types (a < b), how many users performed both. The 100 TB layout: a
    per-block DISTINCT (user, type) combiner bounds the exchange by the
    incidence (≤ users × |types| rows, never raw events), one hash shuffle
    on user_id co-locates each user's incidence rows, the block self-merge
    explodes each user's k types into k(k-1)/2 pair rows (k ≤ |types|, a
    constant), and per-block pair counts are re-summed in a tiny terminal
    block — the pair key space is |types|² regardless of corpus size."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    inc = ev.map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["type_a", "type_b", "n_users"]
        if len(df) == 0:
            return pd.DataFrame({"type_a": [], "type_b": [], "n_users": np.zeros(0, np.int64)})
        df = df.drop_duplicates()  # cross-block dups (each user now fully local)
        m = df.merge(df, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = (m.groupby(["event_type_x", "event_type_y"], sort=False)
                .size().rename("n_users").reset_index())
        out.columns = cols
        return out

    from ..rayctx import grouped

    part = grouped(inc, ["user_id"], pairs_block)
    return groupby_agg(part, ["type_a", "type_b"],
                       [AggSpec("n_users", "n_users", "sum")], small=True)


def q18_large_orders(sf_dir: str, threshold: float = 250.0) -> rd.Dataset:
    """TPC-H Q18 shape (large-volume customers): orders whose lineitems sum
    to > threshold quantity, decorated with customer name. The
    groupby-HAVING layout fused into ONE co-location exchange: lineitem
    reduces to ≤1 qty-partial row per (block, orderkey) by a combiner,
    orders' (custkey, totalprice, date) rides the SAME orderkey-keyed
    exchange as tagged marker rows, and the block finishes the per-order
    sum, the HAVING filter (drops ~99% of orders), and the join attach in
    one pass; customer is a broadcast dim applied in-stream."""
    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False, as_index=False)["l_quantity"].sum()
        return pd.DataFrame({
            "l_orderkey": g["l_orderkey"].to_numpy().astype(np.int64),
            "total_qty": g["l_quantity"].to_numpy(),
            "o_custkey": np.int64(-1), "o_totalprice": np.float64(0.0),
            "o_orderdate": pd.Timestamp(0)})

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def order_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
            "total_qty": np.float64(0.0),
            "o_custkey": df["o_custkey"].to_numpy().astype(np.int64),
            "o_totalprice": df["o_totalprice"].to_numpy(),
            "o_orderdate": df["o_orderdate"].to_numpy()})

    def having_attach(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["o_custkey"] >= 0
        o = df.loc[mark].set_index("l_orderkey")
        d = df[~mark]
        g = d.groupby("l_orderkey", sort=False, as_index=False)["total_qty"].sum()
        g = g[g["total_qty"] > threshold]
        k = g["l_orderkey"]
        out = pd.DataFrame({
            "o_orderkey": k.to_numpy(np.int64),
            "total_qty": g["total_qty"].to_numpy(),
            "o_custkey": k.map(o["o_custkey"]).to_numpy(),
            "o_totalprice": k.map(o["o_totalprice"]).to_numpy(),
            "o_orderdate": k.map(o["o_orderdate"]).to_numpy()})
        out = out.dropna(subset=["o_custkey"])
        out["o_custkey"] = out["o_custkey"].astype(np.int64)
        return out

    joined = grouped(li.map_batches(li_partial, batch_format="pandas").union(
        orders.map_batches(order_markers, batch_format="pandas")),
        ["l_orderkey"], having_attach, small=True)

    # exchange B (custkey): customer scales with SF, so the name attach is a
    # SECOND marker co-location (the q3 layout) rather than a broadcast —
    # survivors (~1% of orders post-HAVING) and customer's (custkey, name)
    # ride the same custkey-keyed exchange and the block joins locally.
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["c_custkey"].to_numpy().astype(np.int64),
            "o_orderkey": np.int64(-1),
            "total_qty": np.float64(0.0), "o_totalprice": np.float64(0.0),
            "c_name": df["c_name"].to_numpy()})

    def survivor_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "total_qty": df["total_qty"].to_numpy(),
            "o_totalprice": df["o_totalprice"].to_numpy(),
            "c_name": ""})

    def attach_name(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["o_orderkey"] < 0
        names = df.loc[mark].set_index("o_custkey")["c_name"]
        d = df[~mark]
        out = pd.DataFrame({
            "o_orderkey": d["o_orderkey"].to_numpy(np.int64),
            "c_name": d["o_custkey"].map(names).to_numpy(),
            "o_totalprice": np.round(d["o_totalprice"].to_numpy(), 2),
            "total_qty": np.round(d["total_qty"].to_numpy(), 4),
        })
        return out.dropna(subset=["c_name"])

    return grouped(joined.map_batches(survivor_rows, batch_format="pandas").union(
        cust.map_batches(cust_markers, batch_format="pandas")),
        ["o_custkey"], attach_name, small=True)


def q4_order_priority(sf_dir: str, min_qty: float = 45.0) -> rd.Dataset:
    """TPC-H Q4 shape (order-priority checking): count orders BY priority
    that have at least one qualifying lineitem — a distributed SEMI-join.
    Scale layout (co-location semi): the EXISTS side is reduced to
    DISTINCT orderkeys by a per-block combiner, and orders' priority rows
    ride the SAME orderkey-keyed exchange as tagged markers — the block
    resolves membership locally (the key set is fully co-located), so the
    semi-join costs ONE exchange and the terminal aggregate is 5 keys."""
    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def keys_block(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["l_quantity"], pa.scalar(min_qty)))
        k = np.unique(t["l_orderkey"].to_numpy())
        return pa.table({"l_orderkey": k,
                         "prio": np.full(len(k), "", dtype=object)})

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def order_rows(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "prio": t["o_orderpriority"]})

    def semi_count(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["prio"] != ""
        keys = df.loc[~mark, "l_orderkey"].unique()
        d = df[mark]
        d = d[d["l_orderkey"].isin(keys)]
        g = d.groupby("prio", sort=False).size().reset_index(name="n_orders")
        return pd.DataFrame({"o_orderpriority": g["prio"].to_numpy(),
                             "n_orders": g["n_orders"].to_numpy().astype(np.int64)})

    partial = grouped(li.map_batches(keys_block, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")),
        ["l_orderkey"], semi_count, small=True)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", sort=False, as_index=False)["n_orders"].sum()
        g["n_orders"] = g["n_orders"].astype(np.int64)
        return g

    return grouped(partial, ["o_orderpriority"], total, small=True)


def embedding_norms_by_lang(sf_dir: str) -> rd.Dataset:
    """documents ⋈ embeddings (big×big, Ray-native hash join on
    doc_id = vec_id) → per-language L2-norm statistics of the embedding
    vectors. The vector payload NEVER enters the shuffle: each embedding
    batch is reduced to (vec_id, norm) scalars by a vectorized einsum
    BEFORE the exchange (Arrow hash joins can't carry list payloads, and at
    100 TB shipping vectors through an all-to-all would dominate the job);
    the metadata side is pruned to (doc_id, lang) at the read."""
    from ..pipelines.simplify import _num_partitions

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": np.zeros(0, np.int64), "norm": np.zeros(0)})
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(),
                             "norm": np.sqrt(np.einsum("ij,ij->i", m, m))})

    emb_norms = emb.map_batches(norms, batch_format="pandas")
    n = table_rows(sf_dir, "documents")
    per_vec = docs.join(emb_norms, join_type="inner",
                        num_partitions=_num_partitions(rows=n),
                        on=("doc_id",), right_on=("vec_id",))
    out = groupby_agg(per_vec, ["lang"], [
        AggSpec("n_vecs", None, "count"),
        AggSpec("avg_norm", "norm", "mean"),
        AggSpec("max_norm", "norm", "max"),
    ], small=True)

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_norm"] = df["avg_norm"].round(4)
        df["max_norm"] = df["max_norm"].round(4)
        return df

    return out.map_batches(rounded, batch_format="pandas")


def q12_priority_lines(sf_dir: str) -> rd.Dataset:
    """TPC-H Q12 shape (shipping-mode priority split, l_returnflag standing
    in for shipmode): per flag, how many lineitems belong to high-priority
    (1-URGENT/2-HIGH) vs lower-priority orders. Scale layout (co-location
    join): lineitem reduces to per-block (orderkey, flag) count partials
    — the combiner bounds the exchange by distinct keys — and orders'
    priority rides the SAME orderkey-keyed exchange as tagged marker
    rows; the block finishes the count sums, the priority attach, and
    the hi/lo split in one pass, feeding a 3-key terminal aggregate."""
    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "l_returnflag"], sort=False).size(
            ).reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        g["prio"] = ""
        return g

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def order_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
            "l_returnflag": "", "cnt": np.int64(0),
            "prio": df["o_orderpriority"].to_numpy()})

    def split(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["prio"] != ""
        pr = df.loc[mark, ["l_orderkey", "prio"]].set_index("l_orderkey")["prio"]
        d = df[~mark]
        g = d.groupby(["l_orderkey", "l_returnflag"], sort=False,
                      as_index=False)["cnt"].sum()
        prio = g["l_orderkey"].map(pr)
        g = g.assign(prio=prio).dropna(subset=["prio"])
        hi = g["prio"].isin(("1-URGENT", "2-HIGH")).to_numpy()
        c = g["cnt"].to_numpy().astype(np.int64)
        part = pd.DataFrame({
            "l_returnflag": g["l_returnflag"].to_numpy(),
            "high_line_count": np.where(hi, c, 0),
            "low_line_count": np.where(hi, 0, c),
        })
        return part.groupby("l_returnflag", sort=False, as_index=False)[
            ["high_line_count", "low_line_count"]].sum()

    partial = grouped(li.map_batches(li_partial, batch_format="pandas").union(
        orders.map_batches(order_markers, batch_format="pandas")),
        ["l_orderkey"], split, small=True)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", sort=False, as_index=False)[
            ["high_line_count", "low_line_count"]].sum()
        for c in ("high_line_count", "low_line_count"):
            g[c] = g[c].astype(np.int64)
        return g

    return grouped(partial, ["l_returnflag"], total, small=True)


def lineitem_price_corr(sf_dir: str) -> rd.Dataset:
    """Per-returnflag Pearson correlation of quantity vs extended price —
    the one-pass sufficient-statistics shape: each batch appends x·y, x²,
    y² columns (pure Arrow kernels), the combiner reduces to five sums +
    a count per (block, flag), ONE tiny hash shuffle re-sums them, and the
    closed-form corr is computed in the terminal block. The corpus is
    scanned once and the exchange carries 6 numbers per block per group —
    the same layout computes covariance/regression slopes at 100 TB."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        x, y = t["l_quantity"], t["l_extendedprice"]
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "x": x, "y": y,
            "xy": pc.multiply(x, y),
            "xx": pc.multiply(x, x),
            "yy": pc.multiply(y, y),
        })

    sums = groupby_agg(ds.map_batches(moments, batch_format="pyarrow"),
                       ["l_returnflag"],
                       [AggSpec("sx", "x", "sum"), AggSpec("sy", "y", "sum"),
                        AggSpec("sxy", "xy", "sum"), AggSpec("sxx", "xx", "sum"),
                        AggSpec("syy", "yy", "sum"),
                        AggSpec("n", None, "count")],
                       small=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy().astype(np.float64)
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        cov = df["sxy"].to_numpy() - sx * sy / n
        vx = df["sxx"].to_numpy() - sx * sx / n
        vy = df["syy"].to_numpy() - sy * sy / n
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "n": df["n"].to_numpy().astype(np.int64),
            "corr_qty_price": np.round(cov / np.sqrt(vx * vy), 4),
        })

    return sums.map_batches(finish, batch_format="pandas")


# ---- HyperLogLog daily-distinct sketch (approximate twin of
# ---- daily_active_users, which is the exact DuckDB-oracled counterpart)

HLL_P = 12  # 2^12 = 4096 registers → ~1.04/√4096 ≈ 1.6% relative std error


def _hll_registers(user_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (register, rank) pairs: splitmix64 the ids, top P bits
    pick the register, rank = leading-zero count of the remaining 52 bits
    + 1, computed EXACTLY via frexp (a 52-bit value converts to float64
    exactly; the frexp exponent is its bit length — no log2 rounding)."""
    x = user_id.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    reg = (x >> np.uint64(64 - HLL_P)).astype(np.int64)
    rem = x & np.uint64((1 << (64 - HLL_P)) - 1)
    _, exp = np.frexp(rem.astype(np.float64))  # exact: rem < 2^52 ≤ 2^53
    rank = np.where(rem == 0, 64 - HLL_P + 1, 64 - HLL_P - exp + 1)
    return reg, rank.astype(np.int64)


def _hll_estimate(reg: np.ndarray, mx: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction; reg/mx are the NON-ZERO registers (others implicitly 0)."""
    m = float(1 << HLL_P)
    s = np.sum(np.ldexp(1.0, -mx)) + (m - len(reg))  # zero regs add 2^0
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    v = m - len(reg)
    if e <= 2.5 * m and v > 0:
        e = m * np.log(m / v)
    return float(e)


def daily_active_users_hll(sf_dir: str) -> rd.Dataset:
    """Approximate COUNT(DISTINCT user_id) per day via HyperLogLog — the
    sketch that replaces the exact-distinct shuffle when |distinct users|
    per day is itself too big to exchange: each block reduces its events to
    per-(day, register) max ranks (≤ days × 4096 rows per block, INDEPENDENT
    of user count — the whole point), one hash shuffle on day merges
    register maxima, and the estimator runs in the terminal block. Exact
    oracled twin: daily_active_users. Deterministic (splitmix64, fixed P),
    parity-tested against a numpy reference and accuracy-tested vs exact."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def local_regs(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(DAY_US, type=pa.int64())),
                          pa.scalar(DAY_US, type=pa.int64()))
        reg, rank = _hll_registers(t["user_id"].to_numpy())
        df = pd.DataFrame({"day_us": day.to_numpy(), "reg": reg, "rank": rank})
        g = df.groupby(["day_us", "reg"], sort=False)["rank"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    regs = ev.map_batches(local_regs, batch_format="pyarrow")

    def est_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day_us": np.zeros(0, np.int64),
                                 "n_users_hll": np.zeros(0, np.int64)})
        g = df.groupby(["day_us", "reg"], sort=False)["rank"].max().reset_index()
        days, ests = [], []
        for day, sub in g.groupby("day_us", sort=False):
            days.append(day)
            ests.append(round(_hll_estimate(sub["reg"].to_numpy(),
                                            sub["rank"].to_numpy())))
        return pd.DataFrame({"day_us": np.asarray(days, np.int64),
                             "n_users_hll": np.asarray(ests, np.int64)})

    return grouped(regs, ["day_us"], est_block)


def dau_retention(sf_dir: str) -> rd.Dataset:
    """Day-over-day retention: of the users active on day d, how many were
    also active on day d+1. Classically an incidence self-join; the
    distributed layout avoids joining two full copies: the per-block
    DISTINCT (day, user) combiner bounds the exchange by the incidence,
    ONE hash shuffle on user_id co-locates each user's active days, and a
    sorted-diff inside the block emits exactly the (day, retained-user)
    pairs (next active day == day + 1) plus (day, active-user) markers —
    both re-summed in a tiny per-day terminal aggregate. No day×day join,
    no second pass over events."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def local_pairs(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(DAY_US, type=pa.int64())),
                          pa.scalar(DAY_US, type=pa.int64()))
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "day_us": day.to_numpy()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    inc = ev.map_batches(local_pairs, batch_format="pyarrow")

    def retain_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day_us": np.zeros(0, np.int64),
                                 "n_active": np.zeros(0, np.int64),
                                 "n_retained": np.zeros(0, np.int64)})
        df = df.drop_duplicates()  # cross-block dups (user now fully local)
        df = df.sort_values(["user_id", "day_us"], kind="stable")
        uid = df["user_id"].to_numpy()
        day = df["day_us"].to_numpy()
        same_user = np.concatenate([uid[1:] == uid[:-1], [False]])
        nxt = np.concatenate([day[1:], [0]])
        retained = same_user & (nxt == day + DAY_US)
        act = pd.DataFrame({"day_us": day}).groupby("day_us").size().rename("n_active")
        ret = (pd.DataFrame({"day_us": day[retained]})
                 .groupby("day_us").size().rename("n_retained"))
        out = pd.concat([act, ret], axis=1).fillna(0).reset_index()
        out["n_active"] = out["n_active"].astype(np.int64)
        out["n_retained"] = out["n_retained"].astype(np.int64)
        return out

    part = grouped(inc, ["user_id"], retain_block)
    return groupby_agg(part, ["day_us"],
                       [AggSpec("n_active", "n_active", "sum"),
                        AggSpec("n_retained", "n_retained", "sum")],
                       small=True)


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA") -> rd.Dataset:
    """TPC-H Q5 shape (local supplier volume): revenue per nation from
    orders where the CUSTOMER and the SUPPLIER sit in the same nation of
    one region (reference parity target: the multi-dim star join,
    p2_enrichData-style dim chaining). Scale layout for 100 TB:

    - region -> nation stays a constant driver-side dim (5 + 25 rows);
      supplier SCALES with SF, so its region-filtered (suppkey, natk)
      rows ride a suppkey co-location over the fact's combiner partials
      (attach + region semi in one exchange — round-4 de-broadcast).
    - lineitem combiner-reduces to one partial-revenue row per (block,
      suppkey, orderkey) BEFORE that exchange; the per-(orderkey,
      nationkey) revenue then flows into the orderkey co-location.
    - orders and customer are BIG tables: both arrive via Ray-native hash
      joins (never broadcast), and the same-nation predicate
      (c_nationkey = s_nationkey) is a streamed filter between them.
    - terminal aggregate has |nations| keys.
    """
    import pyarrow.parquet as pq_mod
    import os

    from ..pipelines.simplify import _num_partitions

    # constant dims driver-side: region 5 rows, nation 25
    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_mod.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    nat = nat[nat["n_regionkey"].isin(set(rkey))]
    nkeys = set(nat["n_nationkey"])

    # supplier scales with SF (round-4 de-broadcast): the region's
    # supplier→nation decode rides a suppkey co-location over the fact's
    # combiner partials (attach + region semi in one exchange)
    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"])

    def sup_region(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"].isin(nkeys)]
        return pd.DataFrame({
            "s_suppkey": df["s_suppkey"].to_numpy().astype(np.int64),
            "natk": df["s_nationkey"].to_numpy().astype(np.int64)})

    # co-location exchanges replace groupby + native join + native
    # join (the q7/q21 fusion layout): orders' custkey rides the orderkey
    # shuffle as tagged marker rows, customer's nationkey rides the
    # custkey shuffle, and money stays in exact int64 ten-thousandths so
    # the partial-sum order is free
    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
            "l_orderkey": df["l_orderkey"].to_numpy().astype(np.int64),
            "tt": np.round(rev * 10000.0).astype(np.int64),
        }).groupby(["l_suppkey", "l_orderkey"], sort=False,
                   as_index=False)["tt"].sum()

    dec = colocated_attach(
        li.map_batches(li_partial, batch_format="pandas"),
        "l_suppkey", sup.map_batches(sup_region, batch_format="pandas"),
        "s_suppkey", {"natk": np.int64},
        left_fill={"l_orderkey": np.int64(-1), "tt": np.int64(0)})

    def revenue(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_orderkey", "natk"], sort=False,
                         as_index=False)["tt"].sum()
        out["cust"] = np.int64(-1)
        return out

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
            "natk": np.int64(0), "tt": np.int64(0),
            "cust": df["o_custkey"].to_numpy().astype(np.int64)})

    def attach_cust(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cust"] >= 0
        o = df.loc[mark, ["l_orderkey", "cust"]].set_index("l_orderkey")["cust"]
        d = df[~mark]
        cust = d["l_orderkey"].map(o)
        d = d.assign(cust=cust).dropna(subset=["cust"])
        g = d.groupby(["cust", "natk"], sort=False, as_index=False)["tt"].sum()
        g["cust"] = g["cust"].astype(np.int64)
        return g

    by_cust = grouped(
        dec.map_batches(revenue, batch_format="pandas").union(
            orders.map_batches(order_markers, batch_format="pandas")),
        ["l_orderkey"], attach_cust, small=True)

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": df["c_custkey"].to_numpy().astype(np.int64),
            "natk": np.int64(0), "tt": np.int64(0),
            "cnat": df["c_nationkey"].to_numpy().astype(np.int64)})

    def same_nation(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cnat"] >= 0
        cn = df.loc[mark, ["cust", "cnat"]].set_index("cust")["cnat"]
        d = df[~mark]
        cnat = d["cust"].map(cn)
        d = d.assign(cnat=cnat).dropna(subset=["cnat"])
        d = d[d["cnat"].astype(np.int64) == d["natk"]]
        return d.groupby("natk", sort=False, as_index=False)["tt"].sum()

    total = grouped(
        by_cust.map_batches(lambda df: df.assign(cnat=np.int64(-1)),
                            batch_format="pandas").union(
            cust.map_batches(cust_markers, batch_format="pandas")),
        ["cust"], same_nation, small=True)

    name_of = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("natk", sort=False, as_index=False)["tt"].sum()
        return pd.DataFrame({
            "n_name": g["natk"].map(name_of).to_numpy(),
            "revenue": ((g["tt"].to_numpy() + 50) // 100).astype(np.float64) / 100.0,
        })

    return grouped(total, ["natk"], finish, small=True)


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#23") -> pd.DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly
    revenue lost if small orders (below 20% of the part's mean quantity)
    were not filled, for one brand. The aggregate-then-rejoin-the-fact
    layout fused to ONE partkey co-location: the brand's partkeys ride
    the exchange as key-only marker rows (round-4 de-broadcast — part
    scales with SF), and the (partkey, qty, cents) rows share that ONE
    partkey-keyed exchange; with every row of a part co-located,
    the block computes the part's mean-quantity threshold AND the sum of
    its small-order prices in the same pass — one scan, one exchange,
    nothing broadcast back. Money stays in exact int64 cents; the /7
    average is integer half-up (floor((2s+7)/14)) so both engines share
    one expression tree."""
    from ..rayctx import grouped

    # round-4 de-broadcast: part scales with SF, so the brand's partkeys
    # ride the correlated-subquery exchange as key-only markers instead of
    # a broadcast key set
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def brand_markers(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["p_brand"] == brand, "p_partkey"].to_numpy()
        return pd.DataFrame({
            "l_partkey": k.astype(np.int64),
            "qty": np.zeros(len(k), np.float64),
            "cents": np.full(len(k), -1, np.int64)})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
            "qty": df["l_quantity"].to_numpy(),
            "cents": np.rint(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64),
        })

    def small_qty_sum(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cents"].to_numpy() == -1
        qual = df.loc[mark, "l_partkey"].unique()
        df = df[~mark]
        df = df[df["l_partkey"].isin(qual)]
        if len(df) == 0:
            return pd.DataFrame({"s": np.zeros(0, np.int64)})
        g = df.groupby("l_partkey", sort=False)["qty"]
        # 0.2 * (sum/n), matching the SQL's 0.2 * avg() association
        thr = (0.2 * (g.transform("sum") / g.transform("size"))).to_numpy()
        ok = df["qty"].to_numpy() < thr
        return pd.DataFrame({"s": [np.int64(df["cents"].to_numpy()[ok].sum())]})

    parts = grouped(
        li.map_batches(skinny, batch_format="pandas").union(
            part.map_batches(brand_markers, batch_format="pandas")),
        ["l_partkey"], small_qty_sum, small=True).to_pandas()
    s = int(parts["s"].sum())
    return pd.DataFrame({"avg_yearly": [((2 * s + 7) // 14) / 100.0]})


def event_type_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition counts over per-user event sequences: for every
    consecutive (by ts, event_id) pair of events of one user, count
    (from_type, to_type) occurrences — the sequence-mining primitive
    (n-gram over event streams; reference parity: order-dependent tag
    cascades, p2_enrichData.py:333-378 are the same consecutive-scan
    shape). One hash shuffle on user_id co-locates each user's events;
    inside the block a single vectorized sort + shift computes ALL users'
    transitions at once (user boundaries masked), and per-block pair
    counts — at most |types|^2 rows — feed a tiny terminal aggregate."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def trans_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"from_type": pd.Series([], dtype=str),
                                 "to_type": pd.Series([], dtype=str),
                                 "n": np.zeros(0, np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        out = pairs.groupby(["from_type", "to_type"], sort=False).size().rename("n")
        return out.reset_index()

    part = grouped(ev, ["user_id"], trans_block)
    return groupby_agg(part, ["from_type", "to_type"], [AggSpec("n", "n", "sum")],
                       small=True)


def q10_returned_items(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-k customers by
    revenue from returned lineitems. Scale layout (the q7/q21 fusion):
    the returnflag predicate is pushed INTO the parquet scan (row groups
    whose statistics exclude 'R' never leave storage), per-row revenue is
    quantized to exact int64 ten-thousandths in the scan (order-free
    sums — the float path's partial-sum order was the only thing keeping
    round(2) honest), and orders' custkey rides the ONE orderkey-keyed
    exchange as tagged marker rows so the block finishes the per-order
    reduce AND the join attach in one pass; a second custkey-keyed
    exchange reduces per customer and emits only its block-local top-k,
    the driver folds ≤ k·blocks rows, and the k winners are decorated
    from the customer table by a keyed parquet point-read — the customer
    dim is never broadcast or shuffled. Terminal cent rounding is
    integer half-up ((tt+50)//100), mirrored by the SQL."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"],
                    filter=(pads.field("l_returnflag") == "R"))

    def revenue(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        out = pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy().astype(np.int64),
            "tt": np.round(rev * 10000.0).astype(np.int64),
        }).groupby("l_orderkey", sort=False, as_index=False)["tt"].sum()
        out["cust"] = np.int64(-1)
        return out

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
            "tt": np.int64(0),
            "cust": df["o_custkey"].to_numpy().astype(np.int64)})

    def attach_cust(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cust"] >= 0
        o = df.loc[mark, ["l_orderkey", "cust"]].set_index("l_orderkey")["cust"]
        d = df[~mark]
        cust = d["l_orderkey"].map(o)
        d = d.assign(cust=cust).dropna(subset=["cust"])
        g = d.groupby("cust", sort=False, as_index=False)["tt"].sum()
        g["cust"] = g["cust"].astype(np.int64)
        return g

    by_cust = grouped(
        li.map_batches(revenue, batch_format="pandas").union(
            orders.map_batches(order_markers, batch_format="pandas")),
        ["l_orderkey"], attach_cust, small=True)

    def cust_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cust", sort=False, as_index=False)["tt"].sum()
        if len(g) > k:
            idx = np.lexsort((g["cust"].to_numpy(), -g["tt"].to_numpy()))[:k]
            g = g.iloc[idx]
        return g

    cand = grouped(by_cust, ["cust"], cust_topk, small=True).to_pandas()
    cand = cand.sort_values(["tt", "cust"], ascending=[False, True],
                            kind="stable").head(k)

    names = pq_mod.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
        filters=[("c_custkey", "in", cand["cust"].tolist())]).to_pandas()
    out = cand.merge(names, left_on="cust", right_on="c_custkey")
    return pd.DataFrame({
        "c_custkey": out["c_custkey"].to_numpy(),
        "c_name": out["c_name"].to_numpy(),
        "revenue": ((out["tt"].to_numpy() + 50) // 100).astype(np.float64) / 100.0,
        "c_acctbal": out["c_acctbal"].to_numpy(),
    })


def q22_global_sales_opportunity(sf_dir: str) -> rd.Dataset:
    """TPC-H Q22 shape (global sales opportunity): per nation, count and
    total balance of customers whose balance exceeds the positive-balance
    average AND who show no event activity (the anti side is the events
    table — every synthetic customer has orders, so the classic orders
    anti-join is vacuously empty at all scales). Three primitives composed
    at scale: a streamed one-pass global scalar (per-block partial
    sum/count of positive balances, tiny reduce, scalar broadcast — never
    a second scan), a Ray-native hash-shuffle ANTI join against events
    reduced to per-block distinct user ids by a combiner, and a
    |nations|-key terminal aggregate."""
    from ..pipelines.simplify import _num_partitions

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        bal = df["c_acctbal"].to_numpy()
        pos = bal[bal > 0.0]
        return pd.DataFrame({"s": [pos.sum()], "n": [len(pos)]})

    parts = cust.map_batches(pos_partial, batch_format="pandas").to_pandas()
    avg_bal = float(parts["s"].sum()) / max(int(parts["n"].sum()), 1)

    rich = cust.map_batches(
        lambda df, t=avg_bal: df[df["c_acctbal"].to_numpy() > t],
        batch_format="pandas")
    active = read_table(sf_dir, "events", columns=["user_id"]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas")
    n_cust = table_rows(sf_dir, "customer")
    no_orders = rich.join(active, join_type="left_anti",
                          num_partitions=_num_partitions(rows=n_cust),
                          on=("c_custkey",), right_on=("user_id",))
    out = groupby_agg(no_orders, ["c_nationkey"],
                      [AggSpec("numcust", None, "count"),
                       AggSpec("totacctbal", "c_acctbal", "sum")], small=True)
    return out.map_batches(
        lambda df: df.assign(totacctbal=df["totacctbal"].round(2)),
        batch_format="pandas")


def event_value_quantiles_hist(sf_dir: str, nbins: int = 64) -> rd.Dataset:
    """Per-event-type p50/p95 via a MERGEABLE fixed-width histogram — the
    quantile layout that scales where exact per-group sort cannot: at
    100 TB a type's values never co-locate, but per-block bin counts merge
    associatively, so the exchange carries at most |types|·nbins rows per
    block. Two passes: (1) per-type min/max (tiny aggregate, broadcast as
    scalars), (2) per-block (type, bin) counts → one small shuffle → the
    estimate is the lower edge of the first bin whose cumulative count
    crosses the quantile. Every arithmetic step (bin width, floor, clamp,
    cumsum crossing) is mirrored verbatim by the DuckDB oracle, so the
    sketch itself is bit-checkable — unlike HLL/KMV it trades resolution,
    not determinism."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    mm = groupby_agg(ev, ["event_type"],
                     [AggSpec("lo", "value", "min"), AggSpec("hi", "value", "max")],
                     small=True).to_pandas().sort_values("event_type")
    types = mm["event_type"].to_numpy()
    lo = mm["lo"].to_numpy()
    w = (mm["hi"].to_numpy() - lo) / float(nbins)
    tref = ray.put((types, lo, w))

    class _Bins:
        def __init__(self):
            self.types, self.lo, self.w = ray.get(tref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ti = np.searchsorted(self.types, df["event_type"].to_numpy())
            v = df["value"].to_numpy()
            b = np.floor((v - self.lo[ti]) / self.w[ti]).astype(np.int64)
            b = np.minimum(b, nbins - 1)
            out = pd.DataFrame({"event_type": df["event_type"].to_numpy(), "bin": b})
            return (out.groupby(["event_type", "bin"], sort=False)
                    .size().rename("n").reset_index())

    counts = groupby_agg(ev.map_batches(_Bins, batch_format="pandas",
                                        concurrency=(1, 8)),
                         ["event_type", "bin"], [AggSpec("n", "n", "sum")],
                         small=True)

    def _round_half_away(x: float, nd: int = 6) -> float:
        # DuckDB round() is half-away-from-zero; Python round() is
        # banker's, and bin edges (span/64 multiples) land EXACTLY on
        # decimal halves often enough to flip the last digit
        s = 10.0 ** nd
        return float(np.sign(x) * np.floor(abs(x) * s + 0.5) / s)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "bin"], kind="stable")
        outs = []
        for t, g in df.groupby("event_type", sort=False):
            cum = g["n"].to_numpy().cumsum()
            tot = cum[-1]
            i = np.searchsorted(types, t)
            p50b = g["bin"].to_numpy()[np.argmax(cum >= 0.5 * tot)]
            p95b = g["bin"].to_numpy()[np.argmax(cum >= 0.95 * tot)]
            outs.append({"event_type": t,
                         "p50_est": _round_half_away(float(lo[i] + w[i] * p50b)),
                         "p95_est": _round_half_away(float(lo[i] + w[i] * p95b))})
        return pd.DataFrame(outs)

    return counts.repartition(1).map_batches(finish, batch_format="pandas")


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape (promotion effect): share of revenue from promo-type
    parts in one ship-month. Layout: the month predicate prunes row groups
    AT THE SCAN (timestamp filter expression), part's (partkey → is-promo)
    flag is a broadcast dim lookup inside map_batches, and the two
    conditional sums reduce per block to ONE scalar row each — the only
    thing that ever reaches the driver is n_blocks rows."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    from ..rayctx import grouped

    lo = pd.Timestamp("1995-09-01")
    hi = pd.Timestamp("1995-10-01")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice", "l_discount"],
                    filter=((pads.field("l_shipdate") >= lo)
                            & (pads.field("l_shipdate") < hi)))
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])

    # q7/q21 marker co-location, NOT a promo-key broadcast (part scales
    # linearly with SF — the round-3 perf-weak finding): lineitem revenue
    # reduces to ≤1 exact-int-ten-thousandths partial per (block, partkey),
    # part's is-promo flag rides the SAME partkey-keyed exchange as tagged
    # markers, and each block emits ONE (promo, total) scalar row.
    def li_partials(df: pd.DataFrame) -> pd.DataFrame:
        tt = np.rint(df["l_extendedprice"].to_numpy()
                     * (1.0 - df["l_discount"].to_numpy()) * 10000.0).astype(np.int64)
        g = (pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
                           "tt": tt})
             .groupby("l_partkey", sort=False, as_index=False)["tt"].sum())
        g["promo"] = np.int64(-1)
        return g

    def part_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["p_partkey"].to_numpy().astype(np.int64),
            "tt": np.int64(0),
            "promo": df["p_type"].str.startswith("PROMO").to_numpy().astype(np.int64)})

    def block_sums(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["promo"] >= 0
        flag = df.loc[mark].set_index("l_partkey")["promo"]
        d = df[~mark]
        g = d.groupby("l_partkey", sort=False, as_index=False)["tt"].sum()
        pf = g["l_partkey"].map(flag)
        ok = pf.notna().to_numpy()
        tt = g["tt"].to_numpy()[ok]
        promo = pf.to_numpy()[ok].astype(np.int64) == 1
        return pd.DataFrame({"promo_tt": [np.int64(tt[promo].sum())],
                             "total_tt": [np.int64(tt.sum())]})

    per_block = grouped(
        li.map_batches(li_partials, batch_format="pandas").union(
            part.map_batches(part_markers, batch_format="pandas")),
        ["l_partkey"], block_sums, small=True).to_pandas()
    total = int(per_block["total_tt"].sum())
    promo = int(per_block["promo_tt"].sum())
    return pd.DataFrame({"promo_revenue_pct":
                         [round(100.0 * promo / total if total else 0.0, 4)]})


def q19_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): revenue from
    lineitems matching ANY of three (brand, size-range, quantity-range)
    clauses.

    Scale layout (q7/q21 marker co-location, NOT a part broadcast — part
    scales linearly with SF, the round-3 perf-weak finding): the
    quantity half of each clause is decided row-side in the streamed
    lineitem combiner, which reduces revenue to ≤1 exact-int partial per
    (block, partkey, quantity-range bitmask); part's (brand, size) rides
    the SAME partkey-keyed exchange as tagged markers, and the block
    finishes the OR-of-ANDs test (clause i fires iff brand/size matches
    AND bit i is set) emitting ONE scalar row. Money stays in exact int64
    ten-thousandths with integer half-up cent rounding, mirrored by the
    SQL."""
    from ..rayctx import grouped

    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_brand", "p_size"])
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice",
                             "l_discount"])

    def li_partials(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy()
        qmask = (((q >= 1) & (q <= 11)).astype(np.int64)
                 | (((q >= 10) & (q <= 20)).astype(np.int64) << 1)
                 | (((q >= 20) & (q <= 30)).astype(np.int64) << 2))
        tt = np.rint(df["l_extendedprice"].to_numpy()
                     * (1.0 - df["l_discount"].to_numpy()) * 10000.0).astype(np.int64)
        d = pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
                          "qmask": qmask, "tt": tt})
        g = (d[d["qmask"] > 0]
             .groupby(["l_partkey", "qmask"], sort=False, as_index=False)["tt"].sum())
        g["p_brand"] = ""
        g["p_size"] = np.int64(-1)
        return g

    def part_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["p_partkey"].to_numpy().astype(np.int64),
            "qmask": np.int64(-1), "tt": np.int64(0),
            "p_brand": df["p_brand"].to_numpy(),
            "p_size": df["p_size"].to_numpy().astype(np.int64)})

    def block_sum(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["qmask"] < 0
        attrs = df.loc[mark].set_index("l_partkey")
        d = df[~mark]
        b = d["l_partkey"].map(attrs["p_brand"])
        s = pd.to_numeric(d["l_partkey"].map(attrs["p_size"]),
                          errors="coerce").fillna(-1).to_numpy().astype(np.int64)
        bm = b.fillna("").to_numpy()
        qm = d["qmask"].to_numpy()
        c1 = (bm == "Brand#12") & (s >= 1) & (s <= 15) & ((qm & 1) != 0)
        c2 = (bm == "Brand#23") & (s >= 1) & (s <= 30) & ((qm & 2) != 0)
        c3 = (bm == "Brand#34") & (s >= 1) & (s <= 45) & ((qm & 4) != 0)
        keep = c1 | c2 | c3
        return pd.DataFrame({"s": [np.int64(d["tt"].to_numpy()[keep].sum())]})

    per_block = grouped(
        li.map_batches(li_partials, batch_format="pandas").union(
            part.map_batches(part_markers, batch_format="pandas")),
        ["l_partkey"], block_sum, small=True).to_pandas()
    tt = int(per_block["s"].sum())
    return pd.DataFrame({"revenue": [((tt + 50) // 100) / 100.0]})


def q7_volume_shipping(sf_dir: str, r1: str = "AMERICA",
                       r2: str = "EUROPE") -> rd.Dataset:
    """TPC-H Q7 shape (volume shipping): revenue flowing BETWEEN two
    regions (supplier region ↔ customer region, both directions) by ship
    year. Distinguishing distributed feature vs the Q5 star: the pair
    predicate is BIDIRECTIONAL, so neither side can be pre-filtered to one
    region — both region labels must travel to the final filter.

    Scale layout (round-4 de-broadcast — supplier scales with SF):
    region→nation stays the constant driver-side dim chain (5 + 25
    rows); the r1∪r2 suppliers' region labels ride a suppkey
    co-location over the fact's combiner partials (attach + semi in one
    exchange); lineitem is combiner-reduced to one partial-revenue row
    per (suppkey, orderkey, year) BEFORE that exchange; orders' custkey
    and customer's nationkey ride the subsequent orderkey/custkey
    co-locations as markers; customer's nation → region decode is a
    25-row broadcast applied in-stream; the terminal aggregate has
    |2 regions|² × |years| keys."""
    import os

    import pyarrow.parquet as pq_mod

    from ..pipelines.simplify import _num_partitions

    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_mod.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nat = nat[nat["r_name"].isin([r1, r2])]
    nat_region = dict(zip(nat["n_nationkey"], nat["r_name"]))
    sup_ds = read_table(sf_dir, "supplier",
                        columns=["s_suppkey", "s_nationkey"])

    def sup_region(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"].isin(nat_region)]
        return pd.DataFrame({
            "s_suppkey": df["s_suppkey"].to_numpy().astype(np.int64),
            "supp_region": df["s_nationkey"].map(nat_region).to_numpy()})

    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        df = df[m]
        rev = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        # exact integer ten-thousandths: per-row revenue is mathematically a
        # multiple of 1e-4 (2dp price × 2dp discount), so int64 sums are
        # order-independent — the ~1.6e8 float sums here land ON the cent-
        # rounding boundary and differ from the oracle's sum order otherwise
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
            "l_orderkey": df["l_orderkey"].to_numpy().astype(np.int64),
            "l_year": df["l_shipdate"].dt.year.to_numpy().astype(np.int64),
            "rev": np.round(rev * 10000.0).astype(np.int64),
        }).groupby(["l_suppkey", "l_orderkey", "l_year"], sort=False,
                   as_index=False)["rev"].sum()

    # supplier scales with SF (round-4 de-broadcast): the r1∪r2 supplier
    # region decode rides a suppkey co-location over the combiner
    # partials (attach + semi in one exchange); then two co-location
    # exchanges replace groupby + native join + native join (the q21
    # fusion layout): orders' custkey rides the orderkey shuffle as
    # marker rows, customer's nationkey rides the custkey shuffle —
    # each block finishes the partial-revenue sums AND the join attach
    # in one pass, so no separate aggregator pool per stage
    from ..rayctx import grouped

    partials = colocated_attach(
        li.map_batches(li_partial, batch_format="pandas"),
        "l_suppkey", sup_ds.map_batches(sup_region, batch_format="pandas"),
        "s_suppkey", {"supp_region": None},
        left_fill={"l_orderkey": np.int64(-1), "l_year": np.int64(0),
                   "rev": np.int64(0)})

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
            "supp_region": "", "l_year": np.int64(0), "rev": np.int64(0),
            "cust": df["o_custkey"].to_numpy().astype(np.int64)})

    li_side = partials.map_batches(
        lambda df: df.drop(columns=["l_suppkey"]).assign(cust=np.int64(-1)),
        batch_format="pandas")

    def attach_cust(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cust"] >= 0
        o = df.loc[mark, ["l_orderkey", "cust"]].set_index("l_orderkey")["cust"]
        d = df[~mark]
        cust = d["l_orderkey"].map(o)
        d = d.assign(cust=cust).dropna(subset=["cust"])
        g = d.groupby(["cust", "supp_region", "l_year"], sort=False,
                      as_index=False)["rev"].sum()
        g["cust"] = g["cust"].astype(np.int64)
        return g

    by_cust = grouped(li_side.union(orders.map_batches(
        order_markers, batch_format="pandas")), ["l_orderkey"], attach_cust,
        small=True)

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": df["c_custkey"].to_numpy().astype(np.int64),
            "supp_region": "", "l_year": np.int64(0), "rev": np.int64(0),
            "natk": df["c_nationkey"].to_numpy().astype(np.int64)})

    cu_side = by_cust.map_batches(
        lambda df: df.assign(natk=np.int64(-1)), batch_format="pandas")

    def pair_filter(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["natk"] >= 0
        nk = df.loc[mark, ["cust", "natk"]].set_index("cust")["natk"]
        d = df[~mark]
        cr = d["cust"].map(nk).map(nat_region)
        sr = d["supp_region"]
        keep = ((sr == r1) & (cr == r2)) | ((sr == r2) & (cr == r1))
        out = d.loc[keep, ["supp_region", "l_year", "rev"]].copy()
        out["cust_region"] = cr[keep].to_numpy()
        return out.groupby(["supp_region", "cust_region", "l_year"],
                           sort=False, as_index=False)["rev"].sum()

    paired = grouped(cu_side.union(cust.map_batches(
        cust_markers, batch_format="pandas")), ["cust"], pair_filter,
        small=True)
    out = groupby_agg(paired, ["supp_region", "cust_region", "l_year"],
                      [AggSpec("revenue", "rev", "sum")], small=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # final cent-rounding in INTEGER space (half away from zero): the
        # 1.6e8 sums here land exactly on half-cent boundaries where float
        # round(x, 2) is rounding-mode- and representation-dependent
        cents = (df["revenue"].to_numpy(np.int64) + 50) // 100
        df["revenue"] = cents / 100.0
        return df

    return out.map_batches(finish, batch_format="pandas")


def q13_customer_distribution(sf_dir: str,
                              exclude_priority: str = "1-URGENT") -> pd.DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): how many
    customers placed exactly c_count qualifying orders — INCLUDING the
    zero-order customers the reference SQL gets from a left outer join.

    Scale layout: the customer table is never joined at all. Per-custkey
    order counts come out of one combiner-bounded hash shuffle of orders
    (exchange ≤ |custkeys| rows); the histogram-of-counts is a second,
    tiny aggregate (key space = max orders per customer); the zero row is
    arithmetic — |customers| − |custkeys that ordered| — needing only the
    customer table's row COUNT (a metadata read), not its rows. The
    left-outer join the SQL writes is thus O(orders) total, no big-big
    exchange anywhere."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def qualifying(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["o_orderpriority"],
                                     pa.scalar(exclude_priority))).select(["o_custkey"])

    per_cust = groupby_agg(orders.map_batches(qualifying, batch_format="pyarrow"),
                           ["o_custkey"], [AggSpec("c_count", None, "count")])
    hist = groupby_agg(per_cust, ["c_count"],
                       [AggSpec("custdist", None, "count")], small=True).to_pandas()

    n_customers = table_rows(sf_dir, "customer")
    n_with = int(hist["custdist"].sum())
    zero = pd.DataFrame({"c_count": [0], "custdist": [n_customers - n_with]})
    out = pd.concat([hist, zero], ignore_index=True)
    out = out[out["custdist"] > 0]
    out = out.sort_values(["custdist", "c_count"], ascending=[False, False])
    return out.reset_index(drop=True).astype({"c_count": np.int64, "custdist": np.int64})


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier): supplier(s) with the maximum
    revenue in one quarter — an aggregate whose RESULT feeds a scalar
    subquery (max) that filters the same aggregate.

    Scale layout: lineitem reduces to ≤|suppliers| rows through one
    combiner-bounded shuffle; the max + equality filter then runs
    PER-BLOCK over that per-supplier table (each block emits only its own
    max-revenue rows), so the driver folds ≤ winners-per-block rows —
    never the |suppliers|-cardinality aggregate itself, which scales with
    SF (round-4 review fix). Winner names come from a pushdown
    ``filters=`` read (only winner rows leave storage). Revenue is
    rounded to cents on BOTH sides before the equality compare
    (float-sum order differs between engines)."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice", "l_discount"],
                    filter=((pads.field("l_shipdate") >= lo)
                            & (pads.field("l_shipdate") < hi)))

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(),
            "rev": df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy()),
        })

    per_supp = groupby_agg(li.map_batches(rev, batch_format="pandas"),
                           ["l_suppkey"], [AggSpec("total_revenue", "rev", "sum")],
                           small=True)

    def block_max(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"l_suppkey": np.zeros(0, np.int64),
                                 "total_revenue": np.zeros(0, np.float64)})
        df = df.assign(total_revenue=df["total_revenue"].round(2))
        return df[df["total_revenue"] == df["total_revenue"].max()][
            ["l_suppkey", "total_revenue"]]

    cand = per_supp.map_batches(block_max, batch_format="pandas").to_pandas()
    best = cand[cand["total_revenue"] == cand["total_revenue"].max()]
    # winner-only pushdown read (the q10 idiom): only the ≤handful of
    # winning suppliers' rows leave storage — supplier scales with SF, so
    # reading it whole to the driver is the round-4 de-broadcast target
    names = pq_mod.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", best["l_suppkey"].tolist())]).to_pandas()
    out = best.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "total_revenue"]].sort_values("s_suppkey")
    return out.reset_index(drop=True)


def events_horizon_counts(sf_dir: str, horizon_s: int = 86_400) -> rd.Dataset:
    """Temporal RANGE self-join: for every event, how many events of the
    SAME user fall strictly after it but within ``horizon_s`` seconds
    (inclusive end) — the "activity in the following day" interval join.

    Ray Data has no range join; the shape here is ONE hash shuffle on the
    equi-key (user_id) + a per-block sorted searchsorted window count —
    never a pairwise expansion, so the exchange is O(events) regardless of
    how dense the windows are (a naive join materializes every matched
    pair). Per-user segments are scanned with two vectorized searchsorted
    calls per segment; cost O(n log n) per block. Partitioning assumption:
    one user's rows share a block (same bound as every keyed window op
    here)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    hz = np.int64(horizon_s) * 1_000_000

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    def window_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_id": np.zeros(0, np.int64),
                                 "n_follow": np.zeros(0, np.int64)})
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        n = len(ts)
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1, [n]])
        cnt = np.empty(n, np.int64)
        for a, b in zip(starts[:-1], starts[1:]):
            seg = ts[a:b]
            # strictly-after → side='right' at ts; inclusive end → 'right'
            # at ts+hz; both clamp to the segment by construction
            cnt[a:b] = (np.searchsorted(seg, seg + hz, side="right")
                        - np.searchsorted(seg, seg, side="right"))
        return pd.DataFrame({"event_id": eid, "n_follow": cnt})

    from ..rayctx import grouped

    return grouped(ev.map_batches(to_us, batch_format="pyarrow"),
                   ["user_id"], window_counts, small=True)


def nation_balance_full_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join demo over two independently-aggregated sides:
    per-nation customer account balance vs per-nation supplier account
    balance — nations appearing on EITHER side survive, the missing side
    zero-filled (at sf0.001 only 10 suppliers exist, so several nations are
    customer-only: the outer semantics are actually exercised).

    Scale layout: each side reduces through its own combiner-bounded
    shuffle to ≤|nations| rows BEFORE the Ray-native full_outer exchange
    (the join moves dimension-bounded tables, never fact rows); balances
    are exact int64 cents (acctbal is 2dp) so the sums are
    order-independent; nation names decorate via a 25-row broadcast."""
    from ..pipelines.simplify import _num_partitions
    import os

    import pyarrow.parquet as pq_mod

    def cents_agg(table: str, key: str, bal: str, nk: str, n_out: str, b_out: str):
        ds = read_table(sf_dir, table, columns=[key, bal])

        def to_cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                nk: df[key].to_numpy(np.int64),
                b_out: np.round(df[bal].to_numpy() * 100.0).astype(np.int64),
            })

        return groupby_agg(ds.map_batches(to_cents, batch_format="pandas"),
                           [nk], [AggSpec(b_out, b_out, "sum"),
                                  AggSpec(n_out, None, "count")], small=True)

    cust = cents_agg("customer", "c_nationkey", "c_acctbal", "nk_c", "n_cust", "cb")
    supp = cents_agg("supplier", "s_nationkey", "s_acctbal", "nk_s", "n_supp", "sb")
    joined = cust.join(supp, join_type="full_outer", num_partitions=4,
                       on=("nk_c",), right_on=("nk_s",))

    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nref = ray.put(names)

    class _Finish:
        def __init__(self):
            self.names = ray.get(nref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            # Ray's full_outer coalesces the key pair into the left column
            nk = df["nk_c"].astype(np.int64)
            return pd.DataFrame({
                "n_name": nk.map(self.names).to_numpy(),
                "cust_bal": df["cb"].fillna(0).astype(np.int64).to_numpy() / 100.0,
                "n_cust": df["n_cust"].fillna(0).astype(np.int64).to_numpy(),
                "supp_bal": df["sb"].fillna(0).astype(np.int64).to_numpy() / 100.0,
                "n_supp": df["n_supp"].fillna(0).astype(np.int64).to_numpy(),
            })

    return joined.map_batches(_Finish, batch_format="pandas", concurrency=(1, 4))


def events_cube(sf_dir: str) -> rd.Dataset:
    """CUBE(event_type, day) over events — all four grouping sets (leaf,
    per-type, per-day, grand total) derived from ONE pass of leaf partials:
    each block reduces to its distinct (type, day) pairs, one small shuffle
    co-locates them, and the three coarser levels re-aggregate the tiny
    leaf table (|types| × |days|) — the corpus is never re-scanned per
    grouping set, which is the whole point of cube-from-leaves at scale.
    Rolled-up keys carry the ``(all)`` sentinel (SQL mirror: coalesce over
    GROUP BY CUBE)."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def leaf_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.strftime("%Y-%m-%d")
        g = pd.DataFrame({"event_type": df["event_type"], "day": day,
                          "value": df["value"]}).groupby(
            ["event_type", "day"], sort=False)["value"]
        out = g.agg(n="size", s="sum").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        leaf = df.groupby(["event_type", "day"], sort=False, as_index=False)[["n", "s"]].sum()
        per_type = leaf.groupby("event_type", sort=False, as_index=False)[["n", "s"]].sum()
        per_type["day"] = "(all)"
        per_day = leaf.groupby("day", sort=False, as_index=False)[["n", "s"]].sum()
        per_day["event_type"] = "(all)"
        total = pd.DataFrame({"event_type": ["(all)"], "day": ["(all)"],
                              "n": [leaf["n"].sum()], "s": [leaf["s"].sum()]})
        out = pd.concat([leaf, per_type, per_day, total], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        out["total_value"] = out["s"].round(4)
        return out[["event_type", "day", "n", "total_value"]]

    part = ev.map_batches(leaf_partial, batch_format="pandas")
    # single terminal block: every grouping set needs ALL leaves and the
    # leaf table is |types| × |days| by construction
    return part.repartition(1).map_batches(cube, batch_format="pandas")


def q6_forecast_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q6 shape (forecasting revenue change): triple-predicate scan
    → one global scalar. The 100 TB layout is the degenerate-but-important
    case: NO shuffle at all — every block reduces to a single int64
    partial (revenue is exact in ten-thousandths: 2dp price × 2dp
    discount), and the terminal add runs over #blocks rows. The discount
    band compares round(d*100) integers so the float boundary (0.05 stored
    as 0.0500000001) cannot flip membership — the SQL mirror does the
    same cast."""
    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1996-01-01")
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_shipdate", "l_discount", "l_quantity",
                             "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d100 = np.round(df["l_discount"].to_numpy() * 100.0).astype(np.int64)
        m = ((df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
             & (d100 >= 5) & (d100 <= 7)
             & (df["l_quantity"].to_numpy() < 24))
        rev = (df.loc[m, "l_extendedprice"].to_numpy()
               * df.loc[m, "l_discount"].to_numpy())
        return pd.DataFrame({"r": [np.round(rev * 10000.0).astype(np.int64).sum()]})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": [round(df["r"].sum() / 10000.0, 4)]})

    return (ds.map_batches(partial, batch_format="pandas")
              .repartition(1).map_batches(total, batch_format="pandas"))


def q8_market_share(sf_dir: str, region: str = "AMERICA",
                    nation_name: str = "BRAZIL",
                    ptype: str = "ECONOMY") -> rd.Dataset:
    """TPC-H Q8 shape (national market share): of all revenue for parts of
    one type sold to customers in one region during 1995–1996, the share
    supplied from one nation, per order year.

    Scale layout (round-4 de-broadcast — part AND supplier scale with
    SF): the part-type keys ride the fact's FIRST keyed exchange as
    markers (semi-filter in the partkey co-location, which reduces to
    per-(orderkey, suppkey) int64 partials); supplier→nation attaches
    through a suppkey co-location (nation×region stays the constant
    driver-side map); orders (year-filtered in-scan) and customer arrive
    via Ray-native hash joins; customer nation→region is a 25-entry
    broadcast decode; the numerator is a masked copy of the same revenue
    column so ONE terminal |years|-row aggregate yields both sides of
    the ratio."""
    import os

    import pyarrow.parquet as pq_mod

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])

    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_mod.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nat_region = dict(zip(nat["n_nationkey"], nat["r_name"]))
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))

    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"])

    def sup_nation(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "s_suppkey": df["s_suppkey"].to_numpy().astype(np.int64),
            "supp_nation": df["s_nationkey"].map(nat_name).to_numpy()})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        out = pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
            "l_orderkey": df["l_orderkey"].to_numpy().astype(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
            "rev": np.round(rev * 10000.0).astype(np.int64)})
        return out.groupby(["l_partkey", "l_orderkey", "l_suppkey"],
                           sort=False, as_index=False)["rev"].sum()

    def type_keys(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["p_type"] == ptype, "p_partkey"].to_numpy()
        return pd.DataFrame({"p_partkey": k.astype(np.int64)})

    # size-adaptive semi (the helper's broadcast↔exchange contract):
    # downstream sums are additive, so per-block partials suffice and
    # each later stage completes its own reduction — the below-cap path
    # therefore needs ZERO extra exchanges here
    semi = colocated_attach(
        li.map_batches(li_partial, batch_format="pandas"),
        "l_partkey", part.map_batches(type_keys, batch_format="pandas"),
        "p_partkey", {}, semi_only=True,
        left_fill={"l_orderkey": np.int64(-1), "l_suppkey": np.int64(-1),
                   "rev": np.int64(0)})
    pairs = semi.map_batches(
        lambda df: df.groupby(["l_orderkey", "l_suppkey"], sort=False,
                              as_index=False)["rev"].sum(),
        batch_format="pandas")

    dec = colocated_attach(
        pairs, "l_suppkey", sup.map_batches(sup_nation, batch_format="pandas"),
        "s_suppkey", {"supp_nation": None},
        left_fill={"l_orderkey": np.int64(-1), "rev": np.int64(0)})

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(),
            "supp_nation": df["supp_nation"].to_numpy(),
            "rev": df["rev"].to_numpy().astype(np.int64),
        })
        return out.groupby(["l_orderkey", "supp_nation"], sort=False,
                           as_index=False)["rev"].sum()

    # two co-location exchanges replace groupby + native join + native
    # join (the q7/q21 fusion layout): orders' (custkey, year) rides the
    # orderkey shuffle as tagged marker rows, customer's nationkey rides
    # the custkey shuffle — each block finishes the partial sums and the
    # join attach in one pass
    from ..rayctx import grouped

    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_markers(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                             pc.less(t["o_orderdate"], pa.scalar(hi))))
        return pd.DataFrame({
            "l_orderkey": t["o_orderkey"].to_numpy().astype(np.int64),
            "supp_nation": "", "rev": np.int64(0),
            "cust": t["o_custkey"].to_numpy().astype(np.int64),
            "o_year": t["o_orderdate"].to_pandas().dt.year.to_numpy().astype(np.int64)})

    li_side = dec.map_batches(rev_partial, batch_format="pandas").map_batches(
        lambda df: df.assign(cust=np.int64(-1), o_year=np.int64(0)),
        batch_format="pandas")

    def attach_order(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cust"] >= 0
        o = df.loc[mark].set_index("l_orderkey")
        d = df[~mark]
        cust = d["l_orderkey"].map(o["cust"])
        d = d.assign(cust=cust, o_year=d["l_orderkey"].map(o["o_year"]))
        d = d.dropna(subset=["cust"])
        g = d.groupby(["cust", "o_year", "supp_nation"], sort=False,
                      as_index=False)["rev"].sum()
        g["cust"] = g["cust"].astype(np.int64)
        g["o_year"] = g["o_year"].astype(np.int64)
        return g

    by_cust = grouped(li_side.union(orders.map_batches(
        order_markers, batch_format="pyarrow")), ["l_orderkey"],
        attach_order, small=True)

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    region_keys = np.array(sorted(k for k, v in nat_region.items() if v == region),
                           dtype=np.int64)

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": df["c_custkey"].to_numpy().astype(np.int64),
            "o_year": np.int64(0), "supp_nation": "", "rev": np.int64(0),
            "cnat": df["c_nationkey"].to_numpy().astype(np.int64)})

    def region_filter(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["cnat"] >= 0
        cn = df.loc[mark, ["cust", "cnat"]].set_index("cust")["cnat"]
        d = df[~mark]
        cnat = d["cust"].map(cn)
        d = d.assign(cnat=cnat).dropna(subset=["cnat"])
        d = d[np.isin(d["cnat"].to_numpy(np.int64), region_keys)]
        part = pd.DataFrame({
            "o_year": d["o_year"].to_numpy(np.int64),
            "vol": d["rev"].to_numpy(),
            "nat_vol": np.where(d["supp_nation"].to_numpy() == nation_name,
                                d["rev"].to_numpy(), 0),
        })
        return part.groupby("o_year", sort=False, as_index=False)[
            ["nat_vol", "vol"]].sum()

    dec2 = grouped(
        by_cust.map_batches(lambda df: df.assign(cnat=np.int64(-1)),
                            batch_format="pandas").union(
            cust.map_batches(cust_markers, batch_format="pandas")),
        ["cust"], region_filter, small=True)

    def year_total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_year", sort=False, as_index=False)[
            ["nat_vol", "vol"]].sum()

    out = grouped(dec2, ["o_year"], year_total, small=True)

    def share(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_year": df["o_year"].to_numpy(),
            "mkt_share": np.round(df["nat_vol"].to_numpy() / df["vol"].to_numpy(), 6),
        })

    return out.map_batches(share, batch_format="pandas")


def q21_waiting_suppliers(sf_dir: str) -> rd.Dataset:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to the
    available columns: count, per supplier, the returned ('R') lineitems
    on finalized ('F') orders where ANOTHER supplier is on the order
    (EXISTS) but no OTHER supplier returned (NOT EXISTS) — the classic
    double fact-self-semi-join.

    Scale layout: neither EXISTS clause becomes a self-join — lineitem
    combiner-reduces to one row per (orderkey, suppkey) carrying (any_R,
    n_R_lines), the F-order semi-filter is a Ray-native hash join against
    the key-only filtered orders scan, ONE orderkey shuffle co-locates
    each order's supplier set, and both EXISTS predicates collapse to two
    group-level counts (distinct suppliers, distinct R-suppliers) read off
    the co-located block. The per-supplier terminal aggregate is
    dimension-bounded. (No l_commitdate/l_receiptdate in this corpus —
    'R' returnflag stands in for 'late'; the SQL mirror uses the same
    predicate so the check is exact.)"""
    import os

    import pyarrow.parquet as pq_mod

    from ..pipelines.simplify import _num_partitions
    from ..rayctx import grouped

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        isr = (df["l_returnflag"].to_numpy() == "R").astype(np.int64)
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"].to_numpy(),
                            "l_suppkey": df["l_suppkey"].to_numpy(),
                            "n_r": isr})
        g = out.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False)
        return g["n_r"].sum()

    partials = li.map_batches(pair_partial, batch_format="pandas")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    # F-order markers ride the SAME orderkey exchange as the lineitem pair
    # partials (co-location join: suppkey = -1 tags a marker row), so the
    # pair-sum completion, the F semi-filter, and both EXISTS counts all
    # happen in ONE shuffle instead of groupby + join + groupby
    def f_markers(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["o_orderstatus"] == "F", "o_orderkey"].to_numpy()
        return pd.DataFrame({"l_orderkey": k.astype(np.int64),
                             "l_suppkey": np.full(len(k), -1, np.int64),
                             "n_r": np.zeros(len(k), np.int64)})

    okeys = orders.map_batches(f_markers, batch_format="pandas")

    def exists_block(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["l_suppkey"].to_numpy() == -1
        forder = df.loc[mark, "l_orderkey"].unique()
        df = df[~mark]
        # finish the (orderkey, suppkey) pair sums across blocks' partials
        df = df.groupby(["l_orderkey", "l_suppkey"], sort=False,
                        as_index=False)["n_r"].sum()
        df = df[df["l_orderkey"].isin(forder)]
        df = df.assign(is_r=(df["n_r"] > 0).astype(np.int64))
        g = df.groupby("l_orderkey", sort=False)
        n_supp = g["l_suppkey"].transform("size")  # pairs are distinct
        n_supp_r = g["is_r"].transform("sum")      # cythonized, no per-group lambda
        keep = (df["n_r"].to_numpy() > 0) & (n_supp.to_numpy() > 1) \
            & (n_supp_r.to_numpy() == 1)
        return pd.DataFrame({"l_suppkey": df.loc[keep, "l_suppkey"].to_numpy(),
                             "numwait": df.loc[keep, "n_r"].to_numpy()})

    # the per-partition reduce is ~tens of ms on <=100k skinny rows — on
    # this host 32 fresh aggregator actors cost far more to spawn than the
    # whole reduce, so the one exchange runs on a small pool
    waits = grouped(partials.union(okeys), ["l_orderkey"], exists_block,
                    small=True)
    per_supp = groupby_agg(waits, ["l_suppkey"],
                           [AggSpec("numwait", "numwait", "sum")], small=True)

    # supplier scales with SF — name decode rides a suppkey co-location
    # (round-4 de-broadcast), never a dim broadcast
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = colocated_attach(per_supp, "l_suppkey", sup, "s_suppkey",
                           {"s_name": None},
                           left_fill={"numwait": np.int64(0)})
    return out.map_batches(
        lambda df: pd.DataFrame({"s_name": df["s_name"].to_numpy(),
                                 "numwait": df["numwait"].to_numpy()}),
        batch_format="pandas")


def q2_min_cost_supplier(sf_dir: str, size: int = 15,
                         region: str = "EUROPE") -> rd.Dataset:
    """TPC-H Q2 shape (minimum-cost supplier), adapted to this corpus:
    lineitem stands in for partsupp — a supplier's "cost" for a part is its
    minimum observed unit price (l_extendedprice / l_quantity). For parts
    of one size, find the region's suppliers matching the per-part global
    minimum cost; top-100 by (s_acctbal desc, n_name, s_name, p_partkey).

    Scale layout (round-4 de-broadcast — part AND supplier scale with
    SF): the fact combiner-reduces to one min-cost row per (partkey,
    suppkey); the region's supplier attrs attach + semi-filter through a
    suppkey co-location; the size filter rides the partkey exchange as
    key-only markers; the correlated per-part MIN never becomes a self-join —
    one partkey co-location computes the group min and keeps the matching
    pairs in the same block pass; LIMIT is per-block top-100 → one tiny
    terminal reduce (the ordering key is total on (part, supplier) rows so
    the cut is deterministic)."""
    import os

    import pyarrow.parquet as pq_mod

    from ..rayctx import grouped

    # nation×region is CONSTANT-size (25/5 rows) — the only driver-side dim
    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_mod.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nat = nat[nat["r_name"] == region]
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))

    # supplier scales with SF (round-4 de-broadcast): region-filtered
    # supplier attrs ride a suppkey co-location over the combiner-reduced
    # pair partials (attach + region semi in one exchange)
    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_name", "s_acctbal",
                              "s_nationkey"])

    def sup_region(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"].isin(nat_name)].copy()
        df["n_name"] = df["s_nationkey"].map(nat_name)
        return df[["s_suppkey", "s_name", "s_acctbal", "n_name"]]

    sup_q = sup.map_batches(sup_region, batch_format="pandas")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice",
                             "l_quantity"])

    def cost_partial(df: pd.DataFrame) -> pd.DataFrame:
        uc = df["l_extendedprice"].to_numpy() / df["l_quantity"].to_numpy()
        out = pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
                            "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
                            "unit_cost": uc})
        return out.groupby(["l_partkey", "l_suppkey"], sort=False,
                           as_index=False)["unit_cost"].min()

    dec = colocated_attach(
        li.map_batches(cost_partial, batch_format="pandas"),
        "l_suppkey", sup_q, "s_suppkey",
        {"s_name": None, "s_acctbal": np.float64, "n_name": None},
        left_fill={"l_partkey": np.int64(-1), "unit_cost": np.float64(0.0)})

    # part scales with SF too: the size filter rides the partkey exchange
    # the correlated per-part MIN already needs, as key-only markers
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])

    def part_markers(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["p_size"] == size, "p_partkey"].to_numpy()
        n = len(k)
        return pd.DataFrame({"l_partkey": k.astype(np.int64),
                             "l_suppkey": np.full(n, -1, np.int64),
                             "unit_cost": np.float64(0.0),
                             "s_name": "", "s_acctbal": np.float64(0.0),
                             "n_name": ""})

    def per_part_min(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["l_suppkey"].to_numpy() == -1
        qual = df.loc[mark, "l_partkey"].unique()
        df = df[~mark]
        df = df[df["l_partkey"].isin(qual)]
        df = df.groupby(
            ["l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name"],
            sort=False, as_index=False)["unit_cost"].min()
        gmin = df.groupby("l_partkey", sort=False)["unit_cost"].transform("min")
        df = df[df["unit_cost"].to_numpy() == gmin.to_numpy()]
        return df[["s_acctbal", "s_name", "n_name", "l_partkey", "unit_cost"]]

    winners = grouped(
        dec.union(part.map_batches(part_markers, batch_format="pandas")),
        ["l_partkey"], per_part_min, small=True)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        # unit_cost stays the raw IEEE quotient: both engines compute the
        # same divide, so it is bit-equal without a rounding convention
        df = df.sort_values(["s_acctbal", "n_name", "s_name", "l_partkey"],
                            ascending=[False, True, True, True]).head(100)
        return df.reset_index(drop=True)

    return (winners.map_batches(topk, batch_format="pandas")
                   .repartition(1).map_batches(topk, batch_format="pandas"))


def q9_product_type_profit(sf_dir: str, name_like: str = "bolt") -> rd.Dataset:
    """TPC-H Q9 shape (product-type profit), adapted: no partsupp table, so
    profit is l_extendedprice*(1-l_discount) (no supplycost term) for parts
    whose name contains a substring, grouped by supplier nation × order
    year.

    Scale layout (round-4 de-broadcast — part AND supplier scale with SF):
    the name-qualifying partkeys ride the fact's FIRST keyed exchange as
    markers (semi-filter in the partkey co-location, which also reduces to
    per-(orderkey, suppkey) int64 partials); supplier→nation attaches
    through a suppkey co-location over those partials (nation itself is
    the constant 25-row map applied in-stream); orders' year rides the
    final orderkey exchange as markers; the terminal aggregate is
    |nations|×|years|."""
    import os

    import pyarrow.parquet as pq_mod

    from ..rayctx import grouped

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])

    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"])

    def sup_nation(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "s_suppkey": df["s_suppkey"].to_numpy().astype(np.int64),
            "nation": df["s_nationkey"].map(nat_name).to_numpy()})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        amt = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        out = pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
            "l_orderkey": df["l_orderkey"].to_numpy().astype(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
            "amt": np.round(amt * 10000.0).astype(np.int64)})
        return out.groupby(["l_partkey", "l_orderkey", "l_suppkey"],
                           sort=False, as_index=False)["amt"].sum()

    def name_keys(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["p_name"].str.contains(name_like), "p_partkey"].to_numpy()
        return pd.DataFrame({"p_partkey": k.astype(np.int64)})

    # size-adaptive semi: downstream sums are additive, so per-block
    # partials suffice (the orderkey co-location completes them) — the
    # below-cap path needs no extra exchange
    semi = colocated_attach(
        li.map_batches(li_partial, batch_format="pandas"),
        "l_partkey", part.map_batches(name_keys, batch_format="pandas"),
        "p_partkey", {}, semi_only=True,
        left_fill={"l_orderkey": np.int64(-1), "l_suppkey": np.int64(-1),
                   "amt": np.int64(0)})
    pairs = semi.map_batches(
        lambda df: df.groupby(["l_orderkey", "l_suppkey"], sort=False,
                              as_index=False)["amt"].sum(),
        batch_format="pandas")

    dec = colocated_attach(
        pairs, "l_suppkey", sup.map_batches(sup_nation, batch_format="pandas"),
        "s_suppkey", {"nation": None},
        left_fill={"l_orderkey": np.int64(-1), "amt": np.int64(0)})

    # co-location fusion (the q7/q21 layout): orders' year rides the one
    # orderkey-keyed exchange as tagged marker rows; the block finishes
    # the per-(orderkey, nation) sums, the year attach, and the
    # (nation, year) partial reduce in one pass
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def order_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
            "nation": "", "amt": np.int64(0),
            "o_year": df["o_orderdate"].dt.year.to_numpy().astype(np.int64)})

    def profit_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_orderkey", "nation"], sort=False,
                         as_index=False)["amt"].sum()
        return out.assign(o_year=np.int64(-1))

    li_side = dec.map_batches(profit_partial, batch_format="pandas")

    def attach_year(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["o_year"] >= 0
        yr = df.loc[mark, ["l_orderkey", "o_year"]].set_index("l_orderkey")["o_year"]
        d = df[~mark]
        g = d.groupby(["l_orderkey", "nation"], sort=False, as_index=False)["amt"].sum()
        y = g["l_orderkey"].map(yr)
        g = g.assign(o_year=y).dropna(subset=["o_year"])
        g["o_year"] = g["o_year"].astype(np.int64)
        return g.groupby(["nation", "o_year"], sort=False, as_index=False)["amt"].sum()

    partial = grouped(li_side.union(orders.map_batches(
        order_markers, batch_format="pandas")), ["l_orderkey"],
        attach_year, small=True)

    def nation_year(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["nation", "o_year"], sort=False, as_index=False)["amt"].sum()

    out = grouped(partial, ["nation", "o_year"], nation_year, small=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["nation", "o_year"],
                            ascending=[True, False]).reset_index(drop=True)
        return pd.DataFrame({"nation": df["nation"].to_numpy(),
                             "o_year": df["o_year"].to_numpy(),
                             "sum_profit": np.round(df["amt"].to_numpy() / 10000.0, 4)})

    return out.repartition(1).map_batches(finish, batch_format="pandas")


def q11_important_parts(sf_dir: str, region: str = "EUROPE") -> rd.Dataset:
    """TPC-H Q11 shape (important stock identification), adapted: a part's
    "value" is its total discounted revenue via suppliers of one region;
    keep parts whose value exceeds 2× the mean part value — the global
    scalar HAVING threshold, computed exactly in integers
    (value·count > 2·total avoids any float mean at the boundary).

    Scale layout (round-4 de-broadcast — supplier scales with SF): the
    region's supplier keys ride a suppkey co-location over the fact's
    per-(suppkey, partkey) combiner partials (semi-filter in the
    exchange; nation×region stays the constant driver-side dim); per-part
    int64 partials bound the second exchange; the global (total, count)
    reduces the already-dimension-bounded per-part table, and the HAVING
    filter streams with two scalar broadcasts. Only survivors (a
    fraction of |parts|) hit the terminal sort block."""
    import os

    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_mod.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nkeys = set(nat.loc[nat["r_name"] == region, "n_nationkey"])
    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey"])

    def region_sup(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["s_nationkey"].isin(nkeys), "s_suppkey"].to_numpy()
        return pd.DataFrame({"s_suppkey": k.astype(np.int64)})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])

    def value_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        out = pd.DataFrame({"l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
                            "l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
                            "v": np.round(v * 10000.0).astype(np.int64)})
        return out.groupby(["l_suppkey", "l_partkey"], sort=False,
                           as_index=False)["v"].sum()

    semi = colocated_attach(
        li.map_batches(value_partial, batch_format="pandas"),
        "l_suppkey", sup.map_batches(region_sup, batch_format="pandas"),
        "s_suppkey", {}, semi_only=True,
        left_fill={"l_partkey": np.int64(-1), "v": np.int64(0)})

    # consumed twice (global scalar + HAVING pass): materialize the
    # dimension-bounded per-part table once or the full fact scan +
    # exchange re-executes for the second consumer
    per_part = groupby_agg(semi, ["l_partkey"],
                           [AggSpec("v", "v", "sum")]).materialize()

    # global scalar: one tiny reduce over the per-part aggregate
    def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [df["v"].sum()], "c": [len(df)]})

    tot = (per_part.map_batches(tot_partial, batch_format="pandas")
                   .repartition(1)
                   .map_batches(lambda df: pd.DataFrame(
                       {"t": [df["t"].sum()], "c": [df["c"].sum()]}),
                       batch_format="pandas")
                   .take_all())
    total, count = int(tot[0]["t"]), int(tot[0]["c"])

    # 2·v·count > 3·total ⇔ v > floor(3·total / (2·count)) for ints (both
    # the divisible and non-divisible cases reduce to strict >): the exact
    # integer HAVING collapses to one overflow-free vectorized compare
    thr = (3 * total) // (2 * count)

    def having(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["v"].to_numpy() > thr]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["v", "l_partkey"],
                            ascending=[False, True]).reset_index(drop=True)
        return pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(),
                             "value": np.round(df["v"].to_numpy() / 10000.0, 4)})

    return (per_part.map_batches(having, batch_format="pandas")
                    .repartition(1).map_batches(finish, batch_format="pandas"))


def q16_parts_supplier_counts(sf_dir: str, excl_brand: str = "Brand#1",
                              sizes: tuple = (1, 5, 10, 15, 20, 25, 30, 35)
                              ) -> rd.Dataset:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    counts per (brand, type, size) for qualifying parts, excluding
    complaint suppliers (stand-in: negative account balance).

    Scale layout (round-4 de-broadcast — part AND supplier both scale
    with SF, so neither is broadcast): COUNT(DISTINCT) never sees raw
    fact rows. The fact combiner reduces to distinct (partkey, suppkey)
    pairs per block; qualifying part attrs ride the partkey-keyed
    exchange as markers (attach + semi-filter in one co-location); the
    complaint-supplier exclusion is the GOOD-supplier marker set on a
    second, suppkey-keyed co-location — within which every (attr-triple,
    suppkey) quad of one supplier is co-located, so the global quad
    dedup AND the per-attr partial counts finish in-block; the terminal
    attr-keyed sum is dimension-bounded."""
    from ..rayctx import grouped

    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_brand", "p_type", "p_size"])

    def qual_parts(df: pd.DataFrame) -> pd.DataFrame:
        return df[(df["p_brand"] != excl_brand)
                  & df["p_size"].isin(list(sizes))]

    part_q = part.map_batches(qual_parts, batch_format="pandas")
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_partkey", "l_suppkey"])

    dec = colocated_attach(
        li.map_batches(pair_distinct, batch_format="pandas"),
        "l_partkey", part_q, "p_partkey",
        {"p_brand": None, "p_type": None, "p_size": np.int64},
        left_fill={"l_suppkey": np.int64(-1)})

    def good_keys(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["s_acctbal"] >= 0, "s_suppkey"].to_numpy()
        return pd.DataFrame({"s_suppkey": k.astype(np.int64)})

    # size-adaptive complaint-supplier exclusion; the global quad dedup +
    # distinct count then rides ONE attr-keyed exchange (every quad of an
    # attr triple co-locates there — bounded by that triple's supplier
    # count, so skew-safe)
    good = colocated_attach(
        dec, "l_suppkey", sup.map_batches(good_keys, batch_format="pandas"),
        "s_suppkey", {}, semi_only=True,
        left_fill={"l_partkey": np.int64(-1), "p_brand": "", "p_type": "",
                   "p_size": np.int64(-1)})

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates(["p_brand", "p_type", "p_size",
                                    "l_suppkey"])
                .groupby(["p_brand", "p_type", "p_size"], sort=False)
                ["l_suppkey"].size().rename("supplier_cnt").reset_index())

    counts = grouped(good, ["p_brand", "p_type", "p_size"], count_block,
                     small=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                              ascending=[False, True, True, True]
                              ).reset_index(drop=True)

    return counts.repartition(1).map_batches(finish, batch_format="pandas")


def q20_promotion_suppliers(sf_dir: str, name_like: str = "bolt",
                            year: int = 1995) -> rd.Dataset:
    """TPC-H Q20 shape (potential part promotion), adapted: suppliers who
    shipped a MAJORITY (2·qty > part total) of some qualifying part's
    shipped quantity in one year. The nested per-part aggregate never
    self-joins: one partkey co-location computes each part's total and
    filters its supplier rows in the same block pass (quantities are
    integral so the majority test is exact).

    Scale (round-4 de-broadcast — part AND supplier both scale linearly
    with SF, so neither is broadcast): the year predicate lives inside the
    fact's streamed pass, whose combiner bounds the ONE partkey-keyed
    exchange at one row per (block, partkey, suppkey); part's qualifying
    keys ride that SAME exchange as tagged marker rows semi-filtering
    inside the reduce block, which finishes both the exact (partkey,
    suppkey) sums and the majority test (everything of a part is
    co-located). Winner suppkeys — a tiny set — are name-decoded through a
    SECOND marker co-location on suppkey (supplier's (key, name) rows ride
    the exchange; no dim broadcast), and the driver folds only the winner
    names."""
    from ..rayctx import grouped

    lo, hi = pd.Timestamp(f"{year}-01-01"), pd.Timestamp(f"{year + 1}-01-01")
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity",
                             "l_shipdate"])

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        df = df[m]
        out = pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy().astype(np.int64),
                            "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
                            "qty": df["l_quantity"].to_numpy().astype(np.int64)})
        return out.groupby(["l_partkey", "l_suppkey"], sort=False,
                           as_index=False)["qty"].sum()

    def part_markers(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["p_name"].str.contains(name_like), "p_partkey"]
        return pd.DataFrame({"l_partkey": keys.to_numpy().astype(np.int64),
                             "l_suppkey": np.int64(-1), "qty": np.int64(0)})

    def majority(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["l_suppkey"] < 0
        qual = df.loc[mark, "l_partkey"].unique()
        d = df[~mark]
        d = d[d["l_partkey"].isin(qual)]
        g = d.groupby(["l_partkey", "l_suppkey"], sort=False,
                      as_index=False)["qty"].sum()
        tot = g.groupby("l_partkey", sort=False)["qty"].transform("sum")
        keep = 2 * g["qty"].to_numpy() > tot.to_numpy()
        return g.loc[keep, ["l_suppkey"]]

    winners = grouped(
        li.map_batches(qty_partial, batch_format="pandas").union(
            part.map_batches(part_markers, batch_format="pandas")),
        ["l_partkey"], majority, small=True)

    # suppkey co-location decodes winner names without a supplier broadcast
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])

    def win_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
                             "s_name": "", "is_dim": np.int64(0)})

    def sup_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s_suppkey": df["s_suppkey"].to_numpy().astype(np.int64),
                             "s_name": df["s_name"].to_numpy(),
                             "is_dim": np.int64(1)})

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        dim = df[df["is_dim"] == 1].set_index("s_suppkey")["s_name"]
        won = df.loc[df["is_dim"] == 0, "s_suppkey"].unique()
        return pd.DataFrame({"s_name": pd.Series(won).map(dim).dropna().to_numpy()})

    named = grouped(
        winners.map_batches(win_rows, batch_format="pandas").union(
            sup.map_batches(sup_markers, batch_format="pandas")),
        ["s_suppkey"], decode, small=True)

    out = (named.to_pandas().drop_duplicates(["s_name"])[["s_name"]]
           .sort_values("s_name").reset_index(drop=True))
    return rd.from_pandas(out)


def salted_enrich_events(sf_dir: str,
                         target_rows_per_key: int = 50) -> rd.Dataset:
    """Row-level fact×dim enrichment through the skew-safe ``salted_join``:
    events join customer on user_id (the corpus's deliberately hot key —
    tens of thousands of events share each user), with hot keys split
    across ceil(count/target) salt shards so no join partition owns a
    whole hot key. The tiny ``target_rows_per_key`` here forces EVERY key
    hot at test scale, exercising the replication path end-to-end; the
    output is row-identical to the plain SQL join, which is the oracle."""
    from ..stages.join import salted_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "value"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    out = salted_join(ev, cust, "user_id", "c_custkey", salt_src="event_id",
                      target_rows_per_key=target_rows_per_key)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "event_type": df["event_type"].to_numpy(),
            "c_mktsegment": df["c_mktsegment"].to_numpy(),
            "value": df["value"].to_numpy(),  # passthrough → bit-equal raw
        })

    return out.map_batches(project, batch_format="pandas")


def table_profile(sf_dir: str) -> pd.DataFrame:
    """Warehouse ANALYZE shape: exact per-column statistics — row count,
    non-null count, exact NDV, min/max — for the documents table.

    Pass A reduces each block to its DISTINCT (column, value) pairs before
    the one hash exchange, so the exchange carries Σ per-column block-NDV
    rows — the exact-NDV lower bound — never raw occurrences; ``text`` is
    represented by its codepoint-FNV hash (texts never shuffle). min/max
    ride the same exchange for free because extrema over distinct values
    equal extrema over all values. Pass B is a per-block (n, n_nonnull)
    combiner — O(columns) rows per block. The driver only ever sees
    O(columns × partitions) rollup rows. At 10^12 rows the exact-NDV
    exchange for a unique-key column is inherently row-scale (that IS the
    lower bound); the approximate path is the HLL twin
    (daily_active_users_hll).
    """
    from ..functions.hashing import fnv1a64
    from ..rayctx import grouped

    _STR_COLS = ("lang", "source")
    _NUM_COLS = ("doc_id", "n_chars")  # + text-as-hash

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang", "source", "n_chars"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in _NUM_COLS + ("text",):
            if col == "text":
                vnum = fnv1a64(df["text"].tolist())
            else:
                vnum = df[col].to_numpy().astype(np.uint64)
            vnum = pd.unique(vnum)
            frames.append(pd.DataFrame({
                "column_name": col,
                "v_str": vnum.astype("U20"),     # decimal digits, vectorized
                "v_num": vnum.astype(np.uint64),
                "is_num": True,
            }))
        for col in _STR_COLS:
            vals = pd.unique(df[col].to_numpy(object))
            frames.append(pd.DataFrame({
                "column_name": col,
                "v_str": vals,
                "v_num": np.zeros(len(vals), np.uint64),
                "is_num": False,
            }))
        return pd.concat(frames, ignore_index=True)

    pairs = docs.map_batches(pairs_block, batch_format="pandas")

    def ndv_rollup(df: pd.DataFrame) -> pd.DataFrame:
        # global dedup: every (column, v_str) pair is fully in this block
        df = df.drop_duplicates(["column_name", "v_str"])
        rows = []
        for col, g in df.groupby("column_name", sort=False):
            if bool(g["is_num"].iloc[0]):
                vn = g["v_num"].to_numpy().astype(np.uint64)
                lo, hi = str(vn.min()), str(vn.max())
            else:
                vs = g["v_str"].to_numpy(object)
                lo, hi = vs.min(), vs.max()
            rows.append({"column_name": col, "nd": len(g), "lo": lo, "hi": hi})
        return pd.DataFrame(rows, columns=["column_name", "nd", "lo", "hi"])

    nd_parts = grouped(pairs, ["column_name", "v_str"], ndv_rollup).to_pandas()

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        rows = [{"column_name": c, "n": len(df), "nn": int(df[c].notna().sum())}
                for c in _NUM_COLS + ("text",) + _STR_COLS]
        return pd.DataFrame(rows, columns=["column_name", "n", "nn"])

    cnt_parts = docs.map_batches(count_block, batch_format="pandas").to_pandas()

    # terminal assembly over O(columns × partitions) rollup rows
    nd = nd_parts.groupby("column_name").agg(
        n_distinct=("nd", "sum"), min_v=("lo", "min"), max_v=("hi", "max"))
    # numeric columns carry fixed-width zero-padded?? no — '9' < '10' fails
    # lexicographically, so numeric extrema must re-compare as integers:
    for col in _NUM_COLS + ("text",):
        g = nd_parts[nd_parts["column_name"] == col]
        vals = g[["lo", "hi"]].to_numpy(object).ravel().astype(np.uint64)
        nd.loc[col, "min_v"] = str(vals.min())
        nd.loc[col, "max_v"] = str(vals.max())
    cnt = cnt_parts.groupby("column_name").agg(n_rows=("n", "sum"), n_nonnull=("nn", "sum"))
    out = nd.join(cnt).reset_index().sort_values("column_name")
    out = out[["column_name", "n_rows", "n_nonnull", "n_distinct", "min_v", "max_v"]]
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_nonnull"] = out["n_nonnull"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.reset_index(drop=True)


def event_value_exact_quantiles(
        sf_dir: str,
        qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
        nbins: int = 1024,
        terminal_max: int = 2048) -> pd.DataFrame:
    """EXACT global order statistics without a global sort — the
    distributed-selection shape: "the exact median of 10^12 rows in a few
    streamed scans". The mergeable-histogram twin
    (event_value_quantiles_hist) trades resolution; this op refines until
    the answer is exact.

    Per round, ONE streamed scan histograms every still-active quantile's
    candidate range (per-block partials bounded by |qs|·nbins rows — no
    row-scale exchange, no shuffle at all), the driver's O(|qs|·nbins)
    reduce narrows each rank to the bin containing it, and recursion ends
    when a rank's bin holds ≤ ``terminal_max`` values — those are fetched
    by a filtered scan and the exact k-th is a driver np.partition over a
    bounded buffer. Uniform data converges in one round
    (n/nbins per bin); worst case O(log_nbins(range)) scans. The returned
    value is an actual data element, so the DuckDB ``quantile_disc``
    oracle (rank = ceil(q·n), 1-based — probed semantics) matches
    bit-for-bit with no arithmetic mirroring needed.
    """
    import math

    ev = read_table(sf_dir, "events", columns=["value"])
    n = table_rows(sf_dir, "events")
    ranks = [int(math.ceil(q * n)) for q in qs]  # 1-based, same IEEE product

    def mm_part(t: pa.Table) -> pa.Table:
        v = t["value"]
        return pa.table({"lo": [pc.min(v).as_py()], "hi": [pc.max(v).as_py()]})

    mm = ev.map_batches(mm_part, batch_format="pyarrow").to_pandas()
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())

    # state per rank: (lo, hi_incl, below, done_value)
    state = [{"lo": glo, "hi": ghi, "below": 0, "val": None} for _ in ranks]

    def _active():
        return [i for i, s in enumerate(state) if s["val"] is None]

    for _round in range(64):
        act = _active()
        if not act:
            break
        # terminal fetch for ranges that are single-valued or small enough
        ranges = [(i, state[i]["lo"], state[i]["hi"]) for i in act]

        def count_in(df: pd.DataFrame) -> pd.DataFrame:
            v = df["value"].to_numpy()
            rows = [{"i": i, "n_in": int(((v >= lo) & (v <= hi)).sum())}
                    for i, lo, hi in ranges]
            return pd.DataFrame(rows)

        cnt = (ev.map_batches(count_in, batch_format="pandas")
                 .to_pandas().groupby("i")["n_in"].sum())
        small = [i for i, lo, hi in ranges
                 if cnt.get(i, 0) <= terminal_max or lo == hi]
        if small:
            sr = [(i, state[i]["lo"], state[i]["hi"]) for i in small]

            def fetch(df: pd.DataFrame) -> pd.DataFrame:
                v = df["value"].to_numpy()
                out = []
                for i, lo, hi in sr:
                    m = (v >= lo) & (v <= hi)
                    out.append(pd.DataFrame({"i": i, "value": v[m]}))
                return pd.concat(out, ignore_index=True)

            vals = ev.map_batches(fetch, batch_format="pandas").to_pandas()
            for i in small:
                sub = vals.loc[vals["i"] == i, "value"].to_numpy()
                kth = ranks[i] - state[i]["below"] - 1  # 0-based within buffer
                state[i]["val"] = float(np.partition(sub, kth)[kth])
        act = _active()
        if not act:
            break
        # one shared scan: per-block histogram partials for every active rank
        hr = [(i, state[i]["lo"], state[i]["hi"]) for i in act]

        def hist_part(df: pd.DataFrame) -> pd.DataFrame:
            v = df["value"].to_numpy()
            frames = []
            for i, lo, hi in hr:
                edges = np.linspace(lo, hi, nbins + 1)
                m = (v >= lo) & (v <= hi)
                b = np.clip(np.searchsorted(edges, v[m], side="right") - 1,
                            0, nbins - 1)
                c = np.bincount(b, minlength=nbins)
                nz = np.flatnonzero(c)
                frames.append(pd.DataFrame(
                    {"i": i, "bin": nz, "c": c[nz].astype(np.int64)}))
            return pd.concat(frames, ignore_index=True) if frames else \
                pd.DataFrame({"i": [], "bin": [], "c": []})

        hist = (ev.map_batches(hist_part, batch_format="pandas")
                  .to_pandas().groupby(["i", "bin"])["c"].sum())
        for i in act:
            lo, hi = state[i]["lo"], state[i]["hi"]
            edges = np.linspace(lo, hi, nbins + 1)
            c = np.zeros(nbins, np.int64)
            sub = hist.loc[i] if i in hist.index.get_level_values(0) else None
            if sub is not None:
                c[sub.index.to_numpy()] = sub.to_numpy()
            cum = state[i]["below"] + np.cumsum(c)
            j = int(np.searchsorted(cum, ranks[i]))  # first cum >= rank
            state[i]["below"] = int(cum[j - 1]) if j > 0 else state[i]["below"]
            new_lo, new_hi = float(edges[j]), float(edges[j + 1])
            if new_lo == lo and new_hi == hi:  # no progress → terminal next
                state[i]["hi"] = new_hi
            else:
                state[i]["lo"], state[i]["hi"] = new_lo, new_hi
            # interior bins are half-open [e_j, e_{j+1}) except the last —
            # shrink hi just below the edge so the count/fetch filters
            # (which are <= hi) match the bin membership used above;
            # degenerate-width bins (new_hi == new_lo) stay closed so the
            # lo == hi equal-value run terminates via the fetch path
            if j < nbins - 1 and new_hi > new_lo:
                state[i]["hi"] = np.nextafter(new_hi, -np.inf)
    assert not _active(), "quantile refinement did not converge"
    return pd.DataFrame({"q": np.asarray(qs, np.float64),
                         "value": [state[i]["val"] for i in range(len(qs))]})


# 2024-01-01 00:00:00 UTC in microseconds — the campaign window anchor;
# the synthetic events table spans January 2024
_CAMPAIGN_EPOCH_US = 1_704_067_200_000_000
_CAMPAIGN_BIN_US = 3_600_000_000  # 1-hour co-location bins


def events_campaign_join(sf_dir: str, chunk_pairs: int = 4_000_000) -> rd.Dataset:
    """Big-big TEMPORAL INTERVAL JOIN (no equality key): every event is
    matched to every campaign whose [start, end) window contains its
    timestamp, aggregated to per-campaign (n_events, total_value).

    Neither side is broadcastable at scale (10^12 events x 10^8 concurrent
    campaign windows) and there is no equality key, so neither a hash join
    nor the as-of kernel applies. The distributed shape is BIN REPLICATION:
    time is cut into fixed bins (1 h), each event keys to exactly ONE bin
    (ts // bin), each campaign replicates to every bin its window overlaps
    (bounded: windows are 15-75 min, so <= 2 bins each — replication factor
    is 1 + duration/bin, never data-dependent), and one bin-keyed
    co-location exchange brings every possibly-matching (event, campaign)
    pair into the same block. Because an event lives in exactly one bin, a
    pair can only meet once — no cross-bin dedup is needed. Inside the
    block no pair ever materializes: each campaign replica's window is
    clipped to its bin (a contiguous ts range only that bin's events can
    occupy), so one block-wide ts sort + exact int64 prefix-sum answers
    every campaign with two binary searches — O((E+C)·log E). Matches
    reduce to per-(block, campaign) partials, so the second,
    campaign-keyed exchange carries at most (#bins-touched x #campaigns)
    partial rows, never pairs.

    Campaign windows are derived deterministically from ``orders`` (no
    external data): campaign o_orderkey starts at
    epoch + (key % 43200) minutes and lasts 15 + (key % 61) minutes.
    Event values stay exact int64 cents until ONE terminal division, so
    the DuckDB mirror (same integer epoch-us arithmetic, same range
    predicate) is bit-equal. INNER semantics: campaigns with zero matching
    events don't emit.
    """
    from ..rayctx import grouped
    from ..sources import table_rows

    orders = read_table(sf_dir, "orders", columns=["o_orderkey"])
    ev = read_table(sf_dir, "events", columns=["ts", "value"])
    n_orders = table_rows(sf_dir, "orders")

    def campaign_bins(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy().astype(np.int64)
        start = _CAMPAIGN_EPOCH_US + (k % 43_200) * 60_000_000
        end = start + (15 + (k % 61)) * 60_000_000
        b0 = start // _CAMPAIGN_BIN_US
        reps = ((end - 1) // _CAMPAIGN_BIN_US - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(k)), reps)
        off = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        return pd.DataFrame({
            "bin": b0[idx] + off, "side": np.int64(0), "cid": k[idx],
            "lo_us": start[idx], "hi_us": end[idx], "cents": np.int64(0)})

    def event_bins(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("int64").to_numpy()
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame({
            "bin": ts // _CAMPAIGN_BIN_US, "side": np.int64(1),
            "cid": np.int64(0), "lo_us": ts, "hi_us": np.int64(0),
            "cents": cents})

    sides = orders.map_batches(campaign_bins, batch_format="pandas").union(
        ev.map_batches(event_bins, batch_format="pandas"))

    def join_block(df: pd.DataFrame) -> pd.DataFrame:
        # an event's bin is ts // BIN, so a campaign replica in bin b can
        # only match events with ts in [max(lo, b·BIN), min(hi, (b+1)·BIN))
        # — a contiguous ts range that no other bin's events intersect.
        # One block-wide ts sort + exact int64 prefix-sum answers every
        # campaign with two binary searches: O((E+C)·log E), never the
        # event×campaign pair expansion (the former repeat/offset kernel
        # touched ~E·C/bins candidate pairs through np.add.at).
        c = df[df["side"] == 0]
        e = df[df["side"] == 1]
        if len(c) == 0 or len(e) == 0:
            return pd.DataFrame({"cid": np.zeros(0, np.int64),
                                 "n": np.zeros(0, np.int64),
                                 "cents": np.zeros(0, np.int64)})
        ets = e["lo_us"].to_numpy()
        eo = np.argsort(ets, kind="stable")
        ets = ets[eo]
        pcum = np.concatenate([[0], np.cumsum(e["cents"].to_numpy()[eo])])
        cb = c["bin"].to_numpy()
        lo_c = np.maximum(c["lo_us"].to_numpy(), cb * _CAMPAIGN_BIN_US)
        hi_c = np.minimum(c["hi_us"].to_numpy(), (cb + 1) * _CAMPAIGN_BIN_US)
        i0 = np.searchsorted(ets, lo_c, side="left")
        i1 = np.searchsorted(ets, hi_c, side="left")
        n = i1 - i0
        nz = np.flatnonzero(n)
        return pd.DataFrame({"cid": c["cid"].to_numpy()[nz],
                             "n": n[nz],
                             "cents": pcum[i1[nz]] - pcum[i0[nz]]})

    partials = grouped(sides, ["bin"], join_block)

    def final_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cid", sort=False, as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"))
        return pd.DataFrame({
            "campaign_id": g["cid"].to_numpy().astype(np.int64),
            "n_events": g["n"].to_numpy().astype(np.int64),
            "total_value": g["cents"].to_numpy().astype(np.int64) / 100.0})

    return grouped(partials, ["cid"], final_block, rows=n_orders)


def rolling_uniques_7d(sf_dir: str) -> rd.Dataset:
    """Trailing-7-day ROLLING DISTINCT users per day — windowed COUNT
    DISTINCT, the ad-tech "rolling uniques" shape that neither the per-day
    exact distinct (daily_active_users) nor the sliding SUM windows cover:
    distinctness must hold across OVERLAPPING windows, so a user active on
    3 days still counts once in every window containing any of them.

    Shape: (1) per-block local distinct (day, user) incidence — the
    combiner, repeated events never enter a shuffle; (2) ONE user-keyed
    exchange co-locates each user's whole day set, so the <=7-anchor
    window replication AND the overlap dedup (the step that makes it
    COUNT DISTINCT rather than SUM) both happen block-locally — the
    replicated rows never enter a shuffle, and the block reduces to
    per-(block, anchor-day) partial counts; (3) a final tiny day-keyed
    exchange sums partials. Anchor days with no event of their own (pure
    spillover) are dropped via marker rows emitted for each real day —
    matching the oracle's "days that exist" semantics. All integer; the
    user exchange carries distinct incidences, the day exchange carries
    days x blocks.
    """
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def local_pairs(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        df = pd.DataFrame({
            "day": (us.to_numpy() // DAY_US),
            "user_id": t["user_id"].to_numpy()})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    def window_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["day", "user_id"])
        uid = df["user_id"].to_numpy().astype(np.int64)
        day = df["day"].to_numpy().astype(np.int64)
        n = len(uid)
        # anchor replication stays in this block: dedup (user, anchor)
        # with one lexsort (a user's overlapping windows collapse here)
        ukey = np.repeat(uid, 7)
        aday = np.repeat(day, 7) + np.tile(np.arange(7, dtype=np.int64), n)
        order = np.lexsort((aday, ukey))
        uk, ad = ukey[order], aday[order]
        first = np.ones(len(uk), bool)
        first[1:] = (uk[1:] != uk[:-1]) | (ad[1:] != ad[:-1])
        days, cnts = np.unique(ad[first], return_counts=True)
        real_days = np.unique(day)
        return pd.DataFrame({
            "aday": np.concatenate([days, real_days]),
            "n": np.concatenate([cnts.astype(np.int64),
                                 np.zeros(len(real_days), np.int64)]),
            "real": np.concatenate([np.zeros(len(days), bool),
                                    np.ones(len(real_days), bool)])})

    partials = grouped(ev.map_batches(local_pairs, batch_format="pyarrow"),
                       ["user_id"], window_partials)

    def final_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("aday", sort=False).agg(
            n=("n", "sum"), real=("real", "any")).reset_index()
        g = g[g["real"]]
        return pd.DataFrame({"day": g["aday"].to_numpy().astype(np.int64),
                             "uniques7": g["n"].to_numpy().astype(np.int64)})

    return grouped(partials, ["aday"], final_block, small=True)


def users_all_event_types(sf_dir: str) -> rd.Dataset:
    """RELATIONAL DIVISION (the FOR-ALL quantifier): users who emitted
    every event type present in the corpus — the division shape
    (fact ÷ dimension) that anti-joins and EXISTS queries don't cover.

    Shape: division decomposes to exact distinct-counting — a user
    qualifies iff |distinct(own types)| == |distinct(all types)|. Blocks
    emit DISTINCT (user, type) partials (the combiner; repeated events
    never shuffle), one user-keyed exchange finishes the dedup and counts,
    and the divisor |all types| is a vocabulary-bounded scalar computed
    from tiny per-block type sets and carried in the closure — never a
    row-scale side. Output: qualifying users with their event count.
    """
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def type_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"].unique()})

    all_types = ev.map_batches(type_partial, batch_format="pandas").to_pandas()
    n_types = int(all_types["event_type"].nunique())

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False).size()
        return g.rename(columns={"size": "n"})

    def final_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False)["n"].sum()
        out = g.groupby("user_id", sort=False).agg(
            n_types=("event_type", "size"), n_events=("n", "sum")).reset_index()
        out = out[out["n_types"] == n_types]
        return pd.DataFrame({"user_id": out["user_id"].to_numpy().astype(np.int64),
                             "n_events": out["n_events"].to_numpy().astype(np.int64)})

    return grouped(ev.map_batches(local_pairs, batch_format="pandas"),
                   ["user_id"], final_block, small=True)


def campaign_peak_concurrency(sf_dir: str, n_ranges: int = 64) -> pa.Table:
    """Distributed SWEEP-LINE: the global PEAK number of concurrently
    active campaign windows (the max-interval-overlap / gantt shape) plus
    the earliest instant it is reached — an ordered global prefix-sum
    problem with NO global sort.

    Every interval emits (+1 at lo, -1 at hi); half-open [lo, hi)
    semantics order a -1 before a +1 at the same instant, so touching
    windows never count as overlapping. The sweep decomposes exactly like
    the engine's other two-phase prefix scans (sequence_packing,
    doc_global_rank): time is cut into ``n_ranges`` fixed buckets, ONE
    bucket-keyed exchange co-locates each bucket's endpoints, every
    bucket reduces to the 3-scalar summary (sum of deltas, running max,
    earliest argmax instant), and the driver folds the O(n_ranges)
    summaries with the sweep identity max(a ++ b) = max(max_a,
    total_a + max_b) — so the only row-scale movement is the endpoint
    shuffle and the driver holds 64 summary rows. Bit-exact: all
    integers; equal-(t, delta) rows carry identical deltas, so the
    running max and its earliest instant are invariant to their
    within-tie order.
    """
    from ..rayctx import grouped

    orders = read_table(sf_dir, "orders", columns=["o_orderkey"])

    span_lo = _CAMPAIGN_EPOCH_US
    span_hi = _CAMPAIGN_EPOCH_US + 43_200 * 60_000_000 + 76 * 60_000_000
    width = (span_hi - span_lo + n_ranges - 1) // n_ranges

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy().astype(np.int64)
        lo = _CAMPAIGN_EPOCH_US + (k % 43_200) * 60_000_000
        hi = lo + (15 + (k % 61)) * 60_000_000
        t = np.concatenate([lo, hi])
        d = np.concatenate([np.ones(len(k), np.int64),
                            np.full(len(k), -1, np.int64)])
        return pd.DataFrame({"rng": (t - span_lo) // width, "t": t, "d": d})

    def bucket_summary(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rng, g in df.groupby("rng", sort=False):
            t = g["t"].to_numpy()
            d = g["d"].to_numpy()
            o = np.lexsort((d, t))   # -1 sorts before +1 at equal t
            cum = np.cumsum(d[o])
            j = int(np.argmax(cum))  # first index achieving the max
            out.append({"rng": int(rng), "total": int(cum[-1]),
                        "mx": int(cum[j]), "mx_t": int(t[o][j])})
        return pd.DataFrame(out, columns=["rng", "total", "mx", "mx_t"])

    summaries = grouped(orders.map_batches(endpoints, batch_format="pandas"),
                        ["rng"], bucket_summary, small=True
                        ).to_pandas().sort_values("rng")

    base = 0
    peak, peak_t = np.iinfo(np.int64).min, -1
    for _, r in summaries.iterrows():
        cand = base + int(r["mx"])
        if cand > peak:            # strictly greater → EARLIEST instant wins
            peak, peak_t = cand, int(r["mx_t"])
        base += int(r["total"])
    return pa.table({"peak": pa.array([peak], pa.int64()),
                     "peak_t_us": pa.array([peak_t], pa.int64())})


def user_daily_locf(sf_dir: str) -> rd.Dataset:
    """Time-series GAP FILL + LOCF (last observation carried forward): each
    user's per-day spend series is DENSIFIED to every calendar day between
    their first and last observation, with missing days forward-filled
    from the most recent observed day — the warehouse
    calendar-densification shape (running stats and windows assume rows
    exist; this op manufactures the missing ones).

    Shape: per-block (user, day, cents) combiner partials, ONE user-keyed
    exchange, and a fully-vectorized block kernel — per-user day grids are
    built with one repeat/offset expansion and each grid day finds its
    carry-source row by a single searchsorted on the (user, day) composite
    key (valid because grid days never precede their user's first
    observation), so no Python touches a user. Output size is bounded by
    users x span days; all values exact int64 cents. The DuckDB mirror is
    unnest(range) densification + IGNORE-NULLS window carry.
    """
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def day_partials(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "day": df["ts"].astype("int64").to_numpy() // DAY_US,
            "cents": np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)})
        return out.groupby(["user_id", "day"], sort=False,
                           as_index=False)["cents"].sum()

    def locf_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": np.zeros(0, np.int64),
                                 "day": np.zeros(0, np.int64),
                                 "cents": np.zeros(0, np.int64),
                                 "observed": np.zeros(0, bool),
                                 "stale_days": np.zeros(0, np.int64)})
        g = df.groupby(["user_id", "day"], sort=False,
                       as_index=False)["cents"].sum()
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        c = g["cents"].to_numpy()
        o = np.lexsort((d, u))
        u, d, c = u[o], d[o], c[o]
        # per-user [first, last] spans via boundary detection
        newu = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(newu)
        ends = np.concatenate([starts[1:], [len(u)]]) - 1
        span = d[ends] - d[starts] + 1
        total = int(span.sum())
        uid = np.repeat(u[starts], span)
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(span) - span, span)
        day = np.repeat(d[starts], span) + off
        # carry source: last observed row at-or-before (uid, day); the
        # composite key is collision-free because epoch days fit well
        # inside the 32-bit slot
        KEY = np.int64(1) << np.int64(32)
        idx = np.searchsorted(u * KEY + d, uid * KEY + day, side="right") - 1
        return pd.DataFrame({
            "user_id": uid, "day": day, "cents": c[idx],
            "observed": d[idx] == day, "stale_days": day - d[idx]})

    return grouped(ev.map_batches(day_partials, batch_format="pandas"),
                   ["user_id"], locf_block)


def user_day_streaks(sf_dir: str) -> rd.Dataset:
    """GAPS-AND-ISLANDS: per-user consecutive-active-day streak statistics
    (n_active_days, longest_streak, n_streaks) — the calendar-run shape
    that sessionization (time-gap over raw events) doesn't cover, because
    islands are defined on the DEDUPLICATED day grid.

    Shape: per-block distinct (user, day) partials (the combiner), ONE
    user-keyed exchange, and a vectorized block kernel — days lexsort per
    user, island boundaries are one diff (new user OR day gap > 1), and
    per-island lengths reduce via boundary arithmetic, never a per-user
    loop. Mirrors SQL's day - row_number() island trick, which the DuckDB
    oracle uses verbatim; all integers.
    """
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "day": df["ts"].astype("int64").to_numpy() // DAY_US})
        return out.drop_duplicates()

    def streak_block(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day"])
        if len(d) == 0:
            return pd.DataFrame({"user_id": np.zeros(0, np.int64),
                                 "n_active_days": np.zeros(0, np.int64),
                                 "longest_streak": np.zeros(0, np.int64),
                                 "n_streaks": np.zeros(0, np.int64)})
        u = d["user_id"].to_numpy()
        day = d["day"].to_numpy()
        o = np.lexsort((day, u))
        u, day = u[o], day[o]
        n = len(u)
        new_island = np.concatenate([[True],
                                     (u[1:] != u[:-1]) | (day[1:] - day[:-1] > 1)])
        starts = np.flatnonzero(new_island)
        lens = np.diff(np.concatenate([starts, [n]]))
        iu = u[starts]
        isl = pd.DataFrame({"user_id": iu, "len": lens})
        g = isl.groupby("user_id", sort=False).agg(
            n_active_days=("len", "sum"), longest_streak=("len", "max"),
            n_streaks=("len", "size")).reset_index()
        for c in ("n_active_days", "longest_streak", "n_streaks"):
            g[c] = g[c].astype(np.int64)
        return g

    return grouped(ev.map_batches(local_pairs, batch_format="pandas"),
                   ["user_id"], streak_block, small=True)


def event_twap(sf_dir: str) -> rd.Dataset:
    """TIME-WEIGHTED AVERAGE (the piecewise-constant time integral): per
    user, the mean of `value` weighted by how long each observation was
    "current" — the TWAP/telemetry-billing reduction that plain AVG and
    the LOCF gap-fill both miss (LOCF densifies to a day grid; TWAP
    integrates the raw irregular series exactly).

    Shape: skinny (user, ts, cents) rows ride ONE user-keyed exchange;
    the block kernel lexsorts (user, ts, event_id), takes consecutive
    diffs, and reduces per user via reduceat — no per-user loop. A tie on
    ts contributes a zero-length interval, so the (ts, event_id) order is
    pinned only to make "which value spans the next gap" deterministic
    across engines.

    Exactness: value is exact cents; intervals are exact integer
    milliseconds (µs diff // 1000, mirrored by the SQL); the per-user
    sums Σ cents·dt_ms and Σ dt_ms are order-free int64 (bound: span_ms ×
    max_cents ≈ 2.6e9 × 5e4 ≈ 1.3e14 per user at a 30-day span — at a
    decades-long 100 TB span the numerator needs a two-limb split, noted
    here), and ONE terminal double division produces twap. Users whose
    events all share one timestamp (Σdt = 0) are excluded on both sides.
    """
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "t": df["ts"].astype("int64").to_numpy(),
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "cents": np.rint(df["value"].to_numpy() * 100.0).astype(np.int64),
        })

    def twap_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": np.zeros(0, np.int64),
                                 "active_ms": np.zeros(0, np.int64),
                                 "twap": np.zeros(0, np.float64)})
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        c = df["cents"].to_numpy()
        o = np.lexsort((e, t, u))
        u, t, c = u[o], t[o], c[o]
        same = u[1:] == u[:-1]
        dt_ms = (t[1:] - t[:-1]) // 1000
        dt_ms = np.where(same, dt_ms, 0)
        w = c[:-1] * dt_ms  # int64-exact (see docstring bound)
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        # per-user sums over the interval arrays (length n-1, aligned to
        # the LEFT endpoint); the boundary-crossing interval is zeroed by
        # `same`, and one zero pad covers a start at index n-1 (a user
        # whose only row is the block's last)
        seg = np.minimum(starts, len(dt_ms))
        den = np.add.reduceat(np.concatenate([dt_ms, [0]]), seg)
        num = np.add.reduceat(np.concatenate([w, [0]]), seg)
        keep = den > 0
        uid = u[starts]
        return pd.DataFrame({
            "user_id": uid[keep].astype(np.int64),
            "active_ms": den[keep].astype(np.int64),
            "twap": (num[keep].astype(np.float64)
                     / den[keep].astype(np.float64)) / 100.0,
        })

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id"], twap_block, small=True)


def event_rising_triples(sf_dir: str) -> rd.Dataset:
    """SEQUENTIAL PATTERN DETECTION (MATCH_RECOGNIZE-lite): per user, the
    count of length-3 strictly-increasing runs over consecutive events in
    (ts, event_id) order — the order-3 windowed predicate that adjacent-
    pair shapes (event_type_transitions' Markov counts, event_gaps) don't
    cover. Comparisons only, no float arithmetic, so exactness is free.

    Shape: skinny (user, ts, eid, value) rows, ONE user-keyed exchange,
    and a block kernel that evaluates the triple predicate with two
    shifted vector compares; per-user counts come from np.add.at over the
    block's unique-user inverse — every user is co-located so zero counts
    are emitted too (a user with < 3 events reports 0, like the SQL).
    """
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "t": df["ts"].astype("int64").to_numpy(),
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "v": df["value"].to_numpy(),
        })

    def triples_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": np.zeros(0, np.int64),
                                 "n_triples": np.zeros(0, np.int64)})
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        v = df["v"].to_numpy()
        o = np.lexsort((e, t, u))
        u, v = u[o], v[o]
        uu, inv = np.unique(u, return_inverse=True)
        cnt = np.zeros(len(uu), dtype=np.int64)
        if len(u) >= 3:
            ok = ((u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
                  & (v[:-2] < v[1:-1]) & (v[1:-1] < v[2:]))
            np.add.at(cnt, inv[:-2][ok], 1)
        return pd.DataFrame({"user_id": uu.astype(np.int64), "n_triples": cnt})

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id"], triples_block, small=True)


def length_gini_by_lang(sf_dir: str) -> rd.Dataset:
    """RANK STATISTIC WITHOUT A SORT SHUFFLE: per-language Gini
    coefficient of document lengths, computed from the VALUE HISTOGRAM —
    blocks emit (lang, n_chars) → count partials (the combiner), so the
    one lang-keyed exchange carries at most |langs| × |distinct lengths|
    rows per block regardless of corpus size, and the block kernel
    resolves the whole rank structure from cumulative counts over sorted
    distinct values (ties are handled by construction: the pairwise-
    difference form Σᵢⱼ|xᵢ−xⱼ| never needs a tie-break). This is the
    counting-sort dual of doc_global_rank's two-phase ranking — no global
    sort, no per-row rank materialization.

    Exactness: with distinct values v_k (asc), counts c_k, prefix counts
    C and prefix sums P, S = Σ_k c_k (v_k·C_{k−1} − P_{k−1}) equals the
    over-pairs sum Σ_{i<j}|xᵢ−xⱼ|, all int64; G = S / (n·T) in ONE double
    division (the SQL mirrors via the sorted-rank identity Σ(2r−n−1)x,
    whose tie-group coefficient sums make it order-independent).
    """
    from ..rayctx import grouped

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def local_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], sort=False).size().reset_index(name="cnt")
        g["n_chars"] = g["n_chars"].astype(np.int64)
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def gini_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lang": pd.array([], dtype=object),
                                 "n_docs": np.zeros(0, np.int64),
                                 "total_chars": np.zeros(0, np.int64),
                                 "gini": np.zeros(0, np.float64)})
        g = df.groupby(["lang", "n_chars"], sort=True)["cnt"].sum().reset_index()
        langs, n_docs, totals, ginis = [], [], [], []
        for lang, h in g.groupby("lang", sort=True):
            v = h["n_chars"].to_numpy()  # sorted asc within lang
            c = h["cnt"].to_numpy()
            n = int(c.sum())
            t = int((c * v).sum())
            cum_c = np.concatenate([[0], np.cumsum(c)[:-1]])
            cum_s = np.concatenate([[0], np.cumsum(c * v)[:-1]])
            s = int((c * (v * cum_c - cum_s)).sum())
            langs.append(lang)
            n_docs.append(n)
            totals.append(t)
            ginis.append(float(s) / float(n * t))
        return pd.DataFrame({"lang": langs,
                             "n_docs": np.asarray(n_docs, np.int64),
                             "total_chars": np.asarray(totals, np.int64),
                             "gini": np.asarray(ginis, np.float64)})

    return grouped(docs.map_batches(local_hist, batch_format="pandas"),
                   ["lang"], gini_block, small=True)


def event_mad_by_type(sf_dir: str) -> rd.Dataset:
    """DEPENDENT TWO-STAGE ROBUST STATISTIC: per event type, the median
    AND the median absolute deviation (MAD) — the second median is taken
    over |v − median|, a statistic that depends on the first pass's
    result, which the independent-quantile shapes (lang_length_quantiles,
    exact_quantiles) never exercise.

    Shape: the counting-sort dual again — blocks emit (type, cents) →
    count partials, so the ONE type-keyed exchange is bounded by
    |types| × |distinct cents| regardless of event count, and the block
    kernel resolves BOTH medians from the same histogram (the deviation
    histogram is derived in-block by folding the value histogram around
    the first median — no second pass over the data).

    Exactness: values are exact int64 cents; median interpolation for
    even counts is (lo+hi)/2.0 of exact ints (DuckDB's quantile_cont
    convention), deviations |cents − med| are exact multiples of 0.5,
    their interpolated median an exact multiple of 0.25, and the terminal
    /100.0 is the same IEEE division on both engines."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def local_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "cents": np.rint(df["value"].to_numpy() * 100.0).astype(np.int64),
        }).groupby(["event_type", "cents"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def _median_from_hist(v: np.ndarray, c: np.ndarray) -> float:
        # v sorted asc, c counts; quantile_cont(0.5): pos = 0.5*(n-1)
        n = int(c.sum())
        cum = np.cumsum(c)
        lo_r, hi_r = (n - 1) // 2, n // 2
        lo = v[np.searchsorted(cum, lo_r + 1)]
        hi = v[np.searchsorted(cum, hi_r + 1)]
        return (float(lo) + float(hi)) / 2.0

    def mad_block(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        g = df.groupby(["event_type", "cents"], sort=True)["cnt"].sum().reset_index()
        for et, h in g.groupby("event_type", sort=True):
            v = h["cents"].to_numpy()
            c = h["cnt"].to_numpy()
            med = _median_from_hist(v.astype(np.float64), c)
            dev = np.abs(v.astype(np.float64) - med)
            o = np.argsort(dev, kind="stable")
            dmad = _median_from_hist(dev[o], c[o])
            rows.append((et, int(c.sum()), med / 100.0, dmad / 100.0))
        out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                          "median_value", "mad_value"])
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return grouped(ev.map_batches(local_hist, batch_format="pandas"),
                   ["event_type"], mad_block, small=True)


def event_throttle(sf_dir: str, cooldown_us: int = 3_600_000_000) -> rd.Dataset:
    """DATA-DEPENDENT SEQUENTIAL RECURRENCE (throttle / debounce-keep):
    per (user, event_type), an event time is KEPT iff it is ≥ cooldown
    after the last KEPT time — the state-dependent filter that NO
    window/lag shape can express (sessionize compares to the previous RAW
    event; here the predicate depends on the output so far, t_{i+1} =
    min{t ≥ t_i + T}). Defined on distinct TIMES, which makes the kept
    set tie-free by construction (same-instant duplicates collapse into
    one kept slot).

    Shape: per-block distinct (user, type, t) partials (the combiner),
    ONE (user, type)-keyed exchange, and a block kernel whose inner walk
    advances ONCE PER KEPT SLOT via searchsorted (total work = output
    size + one lexsort — never a per-input-row loop). Output per (user,
    type): total distinct times and kept count, both exact ints.

    The DuckDB oracle runs the recurrence as a recursive CTE whose step
    is the correlated min DuckDB decorrelates into a join — a genuinely
    different evaluation strategy, same integer arithmetic."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "event_type": df["event_type"].to_numpy(),
            "t": df["ts"].astype("int64").to_numpy(),
        })
        return out.drop_duplicates()

    def throttle_block(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "event_type", "t"])
        if len(d) == 0:
            return pd.DataFrame({"user_id": np.zeros(0, np.int64),
                                 "event_type": pd.array([], dtype=object),
                                 "n_times": np.zeros(0, np.int64),
                                 "n_kept": np.zeros(0, np.int64)})
        u = d["user_id"].to_numpy()
        ty = d["event_type"].to_numpy()
        t = d["t"].to_numpy()
        o = np.lexsort((t, ty, u))
        u, ty, t = u[o], ty[o], t[o]
        new_g = np.concatenate([[True], (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])])
        starts = np.flatnonzero(new_g)
        ends = np.concatenate([starts[1:], [len(u)]])
        rows = []
        for s, e in zip(starts, ends):
            ts_g = t[s:e]
            kept, i = 0, 0
            while i < len(ts_g):
                kept += 1
                # next kept slot: first time >= current + cooldown
                i = int(np.searchsorted(ts_g, ts_g[i] + cooldown_us))
            rows.append((u[s], ty[s], e - s, kept))
        out = pd.DataFrame(rows, columns=["user_id", "event_type",
                                          "n_times", "n_kept"])
        for c in ("user_id", "n_times", "n_kept"):
            out[c] = out[c].astype(np.int64)
        return out

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id", "event_type"], throttle_block, small=True)


def props_key_stats(sf_dir: str) -> rd.Dataset:
    """SEMI-STRUCTURED EXTRACTION: parse the JSON `props` payload column
    (the Common-Crawl-style metadata blob, reference analog: the raw OSM
    tag dicts p1_getOSMNetwork.py:32-76 parses per element) and aggregate
    the extracted integer field per event type — the schema-on-read shape
    none of the typed-column queries exercise.

    Shape: extraction happens IN THE SCAN (one vectorized regex over the
    batch — the payload string never rides an exchange), the per-block
    combiner collapses to (event_type, k) pair counts bounded by
    |types| x |k-domain|, and ONE type-keyed exchange finishes n / sum /
    min / max / distinct-k, all exact int64.

    The DuckDB oracle extracts with its real JSON parser
    (json_extract_string) while the engine uses an anchored RE2 pattern —
    two genuinely different parsers agreeing bit-for-bit."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        out = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "k": k.to_numpy().astype(np.int64),
        })
        g = out.groupby(["event_type", "k"], sort=False, as_index=False).size()
        g["cnt"] = g.pop("size").astype(np.int64)
        return g

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "k"], sort=False, as_index=False)["cnt"].sum()
        out = g.groupby("event_type", sort=False).apply(
            lambda s: pd.Series({
                "n_events": np.int64(s["cnt"].sum()),
                "sum_k": np.int64((s["k"].to_numpy() * s["cnt"].to_numpy()).sum()),
                "min_k": np.int64(s["k"].min()),
                "max_k": np.int64(s["k"].max()),
                "n_distinct_k": np.int64(len(s)),
            }), include_groups=False).reset_index()
        for c in ("n_events", "sum_k", "min_k", "max_k", "n_distinct_k"):
            out[c] = out[c].astype(np.int64)
        return out

    return grouped(ev.map_batches(pair_counts, batch_format="pandas"),
                   ["event_type"], finish, small=True)


def user_value_kendall(sf_dir: str) -> rd.Dataset:
    """RANK CORRELATION / DISCORDANT-PAIR COUNTING (Kendall tau-a between
    time order and value order, per user): over each user's events in
    (ts, event_id) order, count ordered pairs i<j that are concordant
    (later value strictly larger), discordant (strictly smaller), or tied
    — the ORDER-STATISTIC PAIR shape (trend detection / monotonicity
    audit) that neither the adjacent-pair queries (transitions, gaps,
    rising triples — order 2/3 windows) nor the moment statistics cover:
    every one of the n(n-1)/2 pairs contributes, not just neighbours.

    Shape: skinny (user, t, eid, cents) rows ride ONE user-keyed
    exchange; the block kernel lexsorts once and expands all same-user
    (i<j) pairs with the repeat/offset kernel (the edit_distance_pairs
    layout) under a chunk budget, reducing per user via np.add.at — work
    is Σ n_u², bounded by the per-user event count (document cadence,
    not corpus size); the O(n log n) merge-count kernel is the swap-in
    for pathological single-user fan-in. Counts are exact int64; tau_a =
    (C - D) / (n(n-1)/2) is ONE terminal double division mirrored by the
    SQL. Users with a single event are excluded on both sides."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "t": df["ts"].astype("int64").to_numpy(),
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "cents": np.rint(df["value"].to_numpy() * 100.0).astype(np.int64),
        })

    def kendall_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": np.zeros(0, np.int64), "n": np.zeros(0, np.int64),
            "concordant": np.zeros(0, np.int64),
            "discordant": np.zeros(0, np.int64),
            "ties": np.zeros(0, np.int64), "tau_a": np.zeros(0, np.float64)})
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        c = df["cents"].to_numpy()
        o = np.lexsort((e, t, u))
        u, c = u[o], c[o]
        new_g = np.concatenate([[True], u[1:] != u[:-1]])
        gid = np.cumsum(new_g) - 1            # dense group index per row
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.concatenate([starts, [len(u)]]))
        keep = sizes >= 2
        if not keep.any():
            return empty
        # following-pair fanout per row: rows after me in my group
        ends = np.concatenate([starts[1:], [len(u)]])
        lens = ends[gid] - np.arange(len(u)) - 1
        ngroups = len(starts)
        conc = np.zeros(ngroups, np.int64)
        disc = np.zeros(ngroups, np.int64)
        ties = np.zeros(ngroups, np.int64)
        # chunked repeat/offset triu expansion (budget ~4M pairs a pass)
        offs = np.concatenate([[0], np.cumsum(lens)])
        total = int(offs[-1])
        budget = 4_000_000
        row_chunks = np.searchsorted(offs, np.arange(0, total + budget, budget), side="left")
        row_chunks = np.unique(np.concatenate(
            [np.minimum(row_chunks, len(u)), [len(u)]]))
        for a, b in zip(row_chunks[:-1], row_chunks[1:]):
            ln = lens[a:b]
            if ln.sum() == 0:
                continue
            i_idx = np.repeat(np.arange(a, b), ln)
            local = np.arange(len(i_idx)) - np.repeat(
                np.concatenate([[0], np.cumsum(ln)[:-1]]), ln)
            j_idx = i_idx + 1 + local
            d = c[j_idx] - c[i_idx]
            g = gid[i_idx]
            np.add.at(conc, g, (d > 0).astype(np.int64))
            np.add.at(disc, g, (d < 0).astype(np.int64))
            np.add.at(ties, g, (d == 0).astype(np.int64))
        n = sizes[keep].astype(np.int64)
        npairs = n * (n - 1) // 2
        return pd.DataFrame({
            "user_id": u[starts[keep]].astype(np.int64),
            "n": n,
            "concordant": conc[keep],
            "discordant": disc[keep],
            "ties": ties[keep],
            "tau_a": ((conc[keep] - disc[keep]).astype(np.float64)
                      / npairs.astype(np.float64)),
        })

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id"], kendall_block, small=True)


# modular-affine chain-scan constants: a Knuth LCG multiplier (odd, hence
# invertible mod 2^64) and its modular inverse; both engines embed the
# same literals
CHAIN_A = 6364136223846793005
CHAIN_AINV = 13877824140714322085          # pow(CHAIN_A, -1, 2**64)
CHAIN_CKPT = 500


def event_chain_scan(sf_dir: str, ckpt: int = CHAIN_CKPT) -> rd.Dataset:
    """EXACT DISTRIBUTED ASSOCIATIVE SCAN (prefix recurrence): the running
    chain hash h_i = (a·h_{i-1} + x_i) mod 2^64 over ALL events in global
    (ts, event_id) order — the audit-log / ledger-checkpoint shape where
    every prefix state depends on every earlier element, which no keyed
    co-location covers (throttle/LOCF/streaks are per-key; this is ONE
    global sequential recurrence). It parallelizes because the step is an
    ASSOCIATIVE affine map (Blelloch scan): a block folds to (A, B) with
    h_out = A·h_in + B, the driver composes the per-bucket summaries in
    time order (scalars — never rows), and a second pass materializes
    per-element states; modular arithmetic makes the decomposition
    BIT-exact, not approximately-reassociated.

    Shape: skinny (bucket, t, eid, x) rows hash-partition ONCE by
    time-bucket (hour bins — buckets are order-contiguous by
    construction) and the bucketed table is materialized so both passes
    reuse the same blocks: pass 1 reduces each bucket to (n, B) — A =
    a^n needs only n, computed driver-side via pow(a, n, M) — and pass 2
    applies the composed offsets. The per-element kernel is fully
    vectorized via the inverse-power identity a^{i-j} = a^i·a^{-j}:
    wrapping uint64 cumprod/cumsum (C semantics ARE mod-2^64), h_i =
    apow_i·h_in + apow_i·Σ_{j≤i} x_j·ainv^j — no Python touches an
    element. Output: every ckpt-th global position plus the final state.

    The DuckDB oracle evaluates the same closed form h_i = a^i·(Σ_{j≤i}
    x_j·a^{-j} mod M) directly — per-row powmods expanded by
    bit-decomposition into UHUGEINT mulmod chains (corpusoracle.
    powmod_expr), the window sum kept exact in uint128 — a genuinely
    different evaluation strategy (closed form vs two-phase scan)."""
    from ..rayctx import ensure_tuned, n_shuffle_blocks

    M = 1 << 64
    ev = read_table(sf_dir, "events", columns=["ts", "event_id", "value"])
    n_total = table_rows(sf_dir, "events")

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("int64").to_numpy()
        return pd.DataFrame({
            "bucket": (t // 3_600_000_000).astype(np.int64),
            "t": t,
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "x": np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
                   .astype(np.uint64),
        })

    ensure_tuned()
    nb = n_shuffle_blocks(rows=n_total)
    part = (ev.map_batches(skinny, batch_format="pandas")
              .repartition(num_blocks=nb, keys=["bucket"])
              .materialize())

    a_u = np.uint64(CHAIN_A)
    ainv_u = np.uint64(CHAIN_AINV)

    def _bucket_chains(df: pd.DataFrame):
        """Sorted arrays + per-bucket segmentation + local chain values
        (h with h_in = 0), shared by both passes."""
        b = df["bucket"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        x = df["x"].to_numpy().astype(np.uint64)
        o = np.lexsort((e, t, b))
        b, e, x = b[o], e[o], x[o]
        new_g = np.concatenate([[True], b[1:] != b[:-1]])
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.concatenate([starts, [len(b)]]))
        # global power chains a^(i+1), ainv^(i+1) (wrapping uint64 cumprod
        # IS mod-2^64), rebased per bucket segment: for an element at
        # global i in a segment starting at st, a^li = a^(i+1)·ainv^st and
        # ainv^li = ainv^(i+1)·a^st — one multiply instead of restarting
        # the cumprod per segment
        gA = np.cumprod(np.full(len(b), a_u, np.uint64))
        gI = np.cumprod(np.full(len(b), ainv_u, np.uint64))
        base_a = np.ones(len(starts), np.uint64)
        base_i = np.ones(len(starts), np.uint64)
        nz = starts > 0
        base_a[nz] = gI[starts[nz] - 1]
        base_i[nz] = gA[starts[nz] - 1]
        apow = gA * np.repeat(base_a, sizes)
        ainvpow = gI * np.repeat(base_i, sizes)
        cs = np.cumsum(x * ainvpow)
        pre = np.zeros(len(starts), np.uint64)
        pre[1:] = cs[starts[1:] - 1]
        s = cs - np.repeat(pre, sizes)
        h_local = apow * s
        li = (np.arange(len(b)) - np.repeat(starts, sizes) + 1).astype(np.int64)
        return b, e, li, starts, sizes, apow, h_local

    def fold_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bucket": np.zeros(0, np.int64),
                                 "n": np.zeros(0, np.int64),
                                 "bsum": np.zeros(0, np.uint64)})
        b, e, li, starts, sizes, apow, h_local = _bucket_chains(df)
        ends = np.concatenate([starts[1:], [len(b)]]) - 1
        return pd.DataFrame({
            "bucket": b[starts].astype(np.int64),
            "n": sizes.astype(np.int64),
            "bsum": h_local[ends],
        })

    ph1 = part.map_batches(fold_block, batch_format="pandas").to_pandas()
    ph1 = ph1.sort_values("bucket").reset_index(drop=True)
    # driver composition over ordered bucket summaries — scalar work only
    offsets = {}
    h = 0
    idx0 = 0
    for r in ph1.itertuples(index=False):
        offsets[int(r.bucket)] = (np.uint64(h), int(idx0))
        h = (pow(CHAIN_A, int(r.n), M) * h + int(r.bsum)) % M
        idx0 += int(r.n)
    final_h, final_n = h, idx0

    def emit_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"idx": np.zeros(0, np.int64),
                                 "event_id": np.zeros(0, np.int64),
                                 "h": np.zeros(0, np.uint64)})
        b, e, li, starts, sizes, apow, h_local = _bucket_chains(df)
        h_in = np.empty(len(starts), np.uint64)
        i_off = np.empty(len(starts), np.int64)
        for k, sidx in enumerate(starts):
            hin, io = offsets[int(b[sidx])]
            h_in[k], i_off[k] = hin, io
        h_all = apow * np.repeat(h_in, sizes) + h_local
        gidx = np.repeat(i_off, sizes) + li.astype(np.int64)
        keep = (gidx % ckpt == 0) | (gidx == final_n)
        return pd.DataFrame({"idx": gidx[keep],
                             "event_id": e[keep],
                             "h": h_all[keep]})

    return part.map_batches(emit_block, batch_format="pandas")


def daily_balance_total(sf_dir: str) -> rd.Dataset:
    """SEMI-ADDITIVE MEASURE (the OLAP balance/inventory shape): per
    calendar day, the corpus-wide SUM over users of each user's LAST-SEEN
    value carried forward to the GLOBAL horizon — additive across users,
    NON-additive across time (you carry, never sum, along the time axis),
    which is why plain groupby-day and per-user LOCF (user-local horizon)
    both get it wrong.

    Shape: a two-scalar day-span pre-pass (per-block 1-row min/max
    partials), per-block last-reading-per-(user, day) combiner partials
    (latest (ts, event_id) wins — max-combinable across blocks), ONE
    user-keyed exchange whose block kernel finishes the per-(user, day)
    argmax, carries each user to the global end day via one searchsorted
    per block, and PRE-SUMS per day (bounded by days × blocks), then a
    tiny day-keyed exchange finishes totals. Exact int64 cents; avg is
    ONE terminal division mirrored by the SQL."""
    from ..rayctx import grouped

    mm = read_table(sf_dir, "events", columns=["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "lo": [df["ts"].astype("int64").min() // DAY_US],
            "hi": [df["ts"].astype("int64").max() // DAY_US]}),
        batch_format="pandas").to_pandas()
    d_end = int(mm["hi"].max())

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])

    def last_partials(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("int64").to_numpy()
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "day": t // DAY_US,
            "t": t,
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "cents": np.rint(df["value"].to_numpy() * 100.0).astype(np.int64),
        })
        out = out.sort_values(["user_id", "day", "t", "eid"],
                              kind="mergesort")
        return out.groupby(["user_id", "day"], sort=False,
                           as_index=False).last()

    def carry_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day": np.zeros(0, np.int64),
                                 "cents": np.zeros(0, np.int64),
                                 "n_users": np.zeros(0, np.int64)})
        d = df.sort_values(["user_id", "day", "t", "eid"], kind="mergesort")
        d = d.groupby(["user_id", "day"], sort=False, as_index=False).last()
        u = d["user_id"].to_numpy()
        day = d["day"].to_numpy()
        cents = d["cents"].to_numpy()
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(new_u)
        first_day = day[starts]
        spans = (d_end - first_day + 1).astype(np.int64)
        # per-user day grid first_obs..global end (repeat/offset expansion)
        offs = np.concatenate([[0], np.cumsum(spans)])
        gi = np.arange(int(offs[-1]), dtype=np.int64)
        urow = np.searchsorted(offs, gi, side="right") - 1
        gday = first_day[urow] + (gi - offs[urow])
        # carry source: last reading <= grid day, via the (user, day)
        # composite key (valid: grid never precedes the user's first day)
        ukey = u * np.int64(1 << 20) + (day - day.min())
        gkey = (u[starts][urow] * np.int64(1 << 20)
                + (gday - day.min()))
        src = np.searchsorted(ukey, gkey, side="right") - 1
        bal = cents[src]
        lo = int(gday.min())
        tot = np.zeros(d_end - lo + 1, np.int64)
        cnt = np.zeros(d_end - lo + 1, np.int64)
        np.add.at(tot, gday - lo, bal)
        np.add.at(cnt, gday - lo, 1)
        nz = cnt > 0
        return pd.DataFrame({"day": (lo + np.flatnonzero(nz)).astype(np.int64),
                             "cents": tot[nz], "n_users": cnt[nz]})

    def day_total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", sort=False, as_index=False).agg(
            total_cents=("cents", "sum"), n_users=("n_users", "sum"))
        g["total_cents"] = g["total_cents"].astype(np.int64)
        g["n_users"] = g["n_users"].astype(np.int64)
        g["avg_balance"] = (g["total_cents"].to_numpy().astype(np.float64)
                            / g["n_users"].to_numpy().astype(np.float64)
                            ) / 100.0
        return g

    partial = ev.map_batches(last_partials, batch_format="pandas")
    per_user = grouped(partial, ["user_id"], carry_block, small=True)
    return grouped(per_user, ["day"], day_total, small=True)


def user_session_coverage(sf_dir: str) -> rd.Dataset:
    """INTERVAL UNION (merge-overlapping-intervals) per user — the
    set-measure reduction the sweep-line (campaign_peak_concurrency: MAX
    overlap) and TWAP (piecewise integral of a VALUE) shapes don't cover:
    each event opens a deterministic session interval
    ``[ts, ts + (1800 + event_id mod 7200) s)`` and the answer is the
    measure of the per-user UNION — overlaps must collapse, so no plain
    sum/groupby expresses it.

    Shape: skinny (user, s, e) int64-µs rows ride ONE user-keyed
    exchange; the block kernel lexsorts (user, s, e), takes the per-user
    running max of interval ends (pandas C-level groupby cummax — no
    Python loop), detects island starts where ``s > prev running max``
    (exact int64 compare; the previous user's garbage at group heads is
    masked by the new-user flag), and reduces islands per user via
    reduceat. A tie on start is order-safe: a tied row's start can never
    exceed the other's end (e > s always), so both orders land in one
    island — the union is a set measure and stays partitioning-invariant.

    Exactness: everything is int64 µs until the terminal output (still
    integers), so the result is bit-equal to the DuckDB window-cummax
    island oracle at every scale. Output per user: island count, covered
    µs, longest island µs."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("int64").to_numpy()
        eid = df["event_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "s": t,
            "e": t + (1800 + (eid % 7200)) * 1_000_000,
        })

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.zeros(0, np.int64),
                "n_islands": np.zeros(0, np.int64),
                "covered_us": np.zeros(0, np.int64),
                "max_island_us": np.zeros(0, np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        u = df["user_id"].to_numpy()
        s = df["s"].to_numpy()
        e = df["e"].to_numpy()
        o = np.lexsort((e, s, u))
        u, s, e = u[o], s[o], e[o]
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        uidx = np.cumsum(new_u) - 1
        cm = pd.Series(e).groupby(uidx).cummax().to_numpy()  # int64, C-level
        prev = np.concatenate([[np.int64(0)], cm[:-1]])
        start = new_u | (s > prev)
        st = np.flatnonzero(start)
        last = np.concatenate([st[1:] - 1, [len(u) - 1]])
        # island end = user-so-far cummax at the island's last row: every
        # earlier island's end is < this island's first start, so the
        # running max equals the island-local max
        lens = cm[last] - s[st]
        iu = u[st]
        iu_new = np.concatenate([[True], iu[1:] != iu[:-1]])
        seg = np.flatnonzero(iu_new)
        n_isl = np.diff(np.concatenate([seg, [len(iu)]]))
        return pd.DataFrame({
            "user_id": iu[seg].astype(np.int64),
            "n_islands": n_isl.astype(np.int64),
            "covered_us": np.add.reduceat(lens, seg).astype(np.int64),
            "max_island_us": np.maximum.reduceat(lens, seg).astype(np.int64),
        })

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id"], islands, small=True)


def user_retention_cohorts(sf_dir: str) -> rd.Dataset:
    """COHORT RETENTION TRIANGLE — the self-join-against-a-derived-
    per-entity-attribute shape (each activity row must meet its user's
    FIRST-day cohort) that dau_retention's fixed day-over-day lag never
    produces: output is (cohort_day, offset_days) → distinct active
    users, plus the retention share against the cohort's own size.

    Shape: the scan emits block-deduped (user, day) incidence partials
    (the distinct-combiner, so the first exchange carries at most
    users × days rows); ONE user-keyed exchange finds each user's min
    day AND pre-aggregates (cohort, offset) counts inside the block;
    ONE cohort-keyed exchange (bounded by days² pairs, corpus-size-
    independent) finishes the counts and divides by the cohort's
    offset-0 size — offset 0 always exists because the min day is
    itself active. Counts are exact int64; the single terminal division
    is the same IEEE op DuckDB runs, so the oracle matches bit-for-bit."""
    from ..rayctx import grouped

    DAY = 86_400_000_000
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def inc(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "day": df["ts"].astype("int64").to_numpy() // DAY,
        })
        return out.drop_duplicates()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # finish the cross-block incidence dedup
        cohort = df.groupby("user_id", sort=False)["day"].transform("min")
        pairs = pd.DataFrame({"cohort": cohort.to_numpy(np.int64),
                              "offset_days": df["day"].to_numpy(np.int64)
                              - cohort.to_numpy(np.int64)})
        g = pairs.groupby(["cohort", "offset_days"], sort=False,
                          as_index=False).size()
        return g.rename(columns={"size": "n"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cohort", "offset_days"], sort=False,
                       as_index=False)["n"].sum()
        base = g[g["offset_days"] == 0][["cohort", "n"]].rename(
            columns={"n": "n0"})
        g = g.merge(base, on="cohort", how="left")
        return pd.DataFrame({
            "cohort_day": g["cohort"].to_numpy(np.int64),
            "offset_days": g["offset_days"].to_numpy(np.int64),
            "n_users": g["n"].to_numpy(np.int64),
            "retention": g["n"].to_numpy(np.float64)
            / g["n0"].to_numpy(np.float64),
        })

    partial = ev.map_batches(inc, batch_format="pandas")
    per_u = grouped(partial, ["user_id"], per_user, small=True)
    return grouped(per_u, ["cohort"], finish, small=True)


def scd2_history(sf_dir: str) -> rd.Dataset:
    """SCD TYPE-2 HISTORY BUILD (change-point compression) — the
    warehouse dimension-versioning shape: each user's event stream
    carries a derived attribute (tier = cents // 5000), and the output
    is one row per ATTRIBUTE RUN with its validity interval
    ``[valid_from_us, valid_to_us)`` — ``valid_to`` comes from the NEXT
    change, the last run is open (sentinel -1). Neither the transition
    counts (event_type_transitions) nor the throttle recurrence produce
    interval RECORDS; this is the compress-consecutive-equal-values
    run-length shape every CDC/dimension pipeline needs.

    Shape: skinny (user, t, eid, tier) rows ride ONE user-keyed
    exchange; the block kernel lexsorts (user, t, eid), detects change
    points with one shifted compare, and emits per-run records via
    index arithmetic (valid_to = next run's valid_from while the next
    run is the same user — a vector shift, no per-user loop). Ties on
    ts are pinned by event_id on both engines. All int64; bit-equal to
    the DuckDB lag/segment-sum/lead window oracle."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "t": df["ts"].astype("int64").to_numpy(),
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "tier": cents // 5000,
        })

    def runs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.zeros(0, np.int64),
                "tier": np.zeros(0, np.int64),
                "valid_from_us": np.zeros(0, np.int64),
                "valid_to_us": np.zeros(0, np.int64),
                "n_obs": np.zeros(0, np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        tier = df["tier"].to_numpy()
        o = np.lexsort((e, t, u))
        u, t, tier = u[o], t[o], tier[o]
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        chg = new_u | np.concatenate([[True], tier[1:] != tier[:-1]])
        st = np.flatnonzero(chg)
        iu = u[st]
        vf = t[st]
        nxt_same = np.concatenate([iu[1:] == iu[:-1], [False]])
        vt = np.where(nxt_same,
                      np.concatenate([vf[1:], [np.int64(-1)]]),
                      np.int64(-1))
        n_obs = np.diff(np.concatenate([st, [len(u)]]))
        return pd.DataFrame({
            "user_id": iu.astype(np.int64),
            "tier": tier[st].astype(np.int64),
            "valid_from_us": vf.astype(np.int64),
            "valid_to_us": vt.astype(np.int64),
            "n_obs": n_obs.astype(np.int64),
        })

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id"], runs, small=True)


COVISIT_CAP = 16  # deterministic per-cell contributor cap (smallest user ids)


def user_covisitation(sf_dir: str) -> pa.Table:
    """CO-VISITATION PAIR MINING (users sharing >= 2 grid cells) — the
    UNBOUNDED-pair-space self-join: unlike event_type_cooccurrence
    (vocabulary × vocabulary) the user × user pair space grows with the
    corpus, so the operator's scale contract is an EXPLICIT per-cell
    contributor cap (the ``COVISIT_CAP`` smallest user ids per cell —
    the hub-capping every production co-visitation/FoF job applies,
    here a deterministic SEMANTIC both engines state, not a silent
    truncation). Events geocode by the SQL-exact Knuth hash of
    event_id, reduced to the 64×64 tile in PURE INTEGER arithmetic
    (h%65536)//1024 — no float anywhere.

    Shape: the scan emits block-deduped (cell, user) incidence; ONE
    cell-keyed exchange finishes the dedup, ranks users within the cell
    (lexsort + in-group position — vectorized), keeps the cap, expands
    the ≤ cap·(cap−1)/2 pairs per cell (repeat/offset, no Python loop)
    and pre-counts pairs in-block; ONE pair-keyed exchange sums and
    filters n_shared >= 2. uint64 wrap-multiply == the oracle's HUGEINT
    mod-2^32, so results are bit-equal at all scales."""
    from ..rayctx import grouped
    from .graph import _pairs_within_groups

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def inc(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy().astype(np.uint64)
        h = (eid * np.uint64(2654435761)) % np.uint64(1 << 32)
        ix = ((h % np.uint64(65536)) // np.uint64(1024)).astype(np.int64)
        iy = ((h // np.uint64(65536)) // np.uint64(1024)).astype(np.int64)
        out = pd.DataFrame({
            "cell": ix * 64 + iy,
            "user_id": df["user_id"].to_numpy().astype(np.int64),
        })
        return out.drop_duplicates()

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        c = df["cell"].to_numpy(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        o = np.lexsort((u, c))
        c, u = c[o], u[o]
        from ..rayctx import group_positions
        _, _, _, loc = group_positions(c)
        keep = loc < COVISIT_CAP  # smallest user ids win (u sorted in-cell)
        _, p, q = _pairs_within_groups(c[keep], u[keep])
        g = (pd.DataFrame({"u1": p, "u2": q})
             .groupby(["u1", "u2"], sort=False, as_index=False).size())
        return g.rename(columns={"size": "n"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u1", "u2"], sort=False, as_index=False)["n"].sum()
        g = g[g["n"] >= 2]
        return pd.DataFrame({"u1": g["u1"].to_numpy(np.int64),
                             "u2": g["u2"].to_numpy(np.int64),
                             "n_shared": g["n"].to_numpy(np.int64)})

    partial = ev.map_batches(inc, batch_format="pandas")
    per_cell = grouped(partial, ["cell"], pairs, small=True)
    out = grouped(per_cell, ["u1", "u2"], finish, small=True)
    # the HAVING filter can legitimately empty the result at tiny scale,
    # and Ray Data drops empty blocks (schema None); the output is bounded
    # by cap²·cells/2 rows regardless of corpus size, so pin the schema
    # with a driver-side typed table
    df = out.to_pandas()
    if df.empty:
        df = pd.DataFrame({"u1": np.zeros(0, np.int64),
                           "u2": np.zeros(0, np.int64),
                           "n_shared": np.zeros(0, np.int64)})
    # a bare pyarrow Table (allowed by the driver contract) rather than
    # rd.from_arrow: Ray drops empty blocks even from from_arrow, so a
    # Dataset CANNOT carry an empty result's schema
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


WM_LATENESS_US = 600_000_000      # 10-minute allowed lateness
WM_WINDOW_US = 3_600_000_000      # 1-hour tumbling windows
WM_JITTER_US = 1_800_000_000      # ±30-minute arrival disorder
WM_BUCKET_US = 6 * 3_600_000_000  # 6-hour arrival-time bucket ranges


def events_watermark_late(sf_dir: str) -> rd.Dataset:
    """STREAMING WATERMARK / LATE-DATA routing — the one streaming-only
    semantic the reference has none of (SURVEY §2.9) and no batch window
    shape expresses: events ARRIVE in a bounded-disorder order (arrival
    time = event time + a deterministic Knuth-hash jitter in ±30 min —
    the realistic out-of-order stream; event_id order alone is already
    time-sorted in this corpus, which would make lateness trivially
    zero), the watermark after each arrival is the running max EVENT
    time seen so far minus a 10-minute allowed lateness, and an event is
    LATE iff its own event time is below the watermark at its arrival
    (exclusive prefix, so the first arrival is never late). Output: per
    1-hour tumbling window, on-time and late counts — a beam/flink
    pipeline's main vs side output.

    The running exclusive prefix-max over the GLOBAL arrival order is
    the sequential dependency; it distributes as a two-phase associative
    scan (the max-monoid sibling of event_chain_scan's affine fold):
    buckets are CONTIGUOUS arrival-time ranges (``arr // 6 h`` —
    monotone in arrival order, ~120 buckets per month of data), pass 1
    reduces each bucket to one max-event-time scalar, the driver folds
    the sorted bucket summaries into exclusive carries, and pass 2 is
    ONE bucket-keyed exchange whose kernel sorts its buckets by
    (arr, event_id), runs the carry-seeded exclusive cummax, flags
    lateness, and pre-aggregates per (window, flag) so the terminal
    window-keyed exchange is bounded by windows × blocks. All int64 µs;
    bit-equal to the DuckDB window-max oracle."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy().astype(np.int64)
        t = df["ts"].astype("int64").to_numpy()
        h = ((eid.astype(np.uint64) * np.uint64(2654435761))
             % np.uint64(1 << 32)).astype(np.int64)
        arr = t + h % (2 * WM_JITTER_US) - WM_JITTER_US
        return pd.DataFrame({
            "bucket": arr // WM_BUCKET_US,
            "arr": arr,
            "eid": eid,
            "t": t,
        })

    sk = ev.map_batches(skinny, batch_format="pandas").materialize()

    # pass 1: one max scalar per bucket (tiny; driver fold is O(#buckets))
    part = sk.map_batches(
        lambda df: df.groupby("bucket", sort=False, as_index=False)["t"].max(),
        batch_format="pandas").to_pandas()
    bmax = part.groupby("bucket")["t"].max().sort_index()
    bids = bmax.index.to_numpy(np.int64)
    # exclusive prefix max over the sorted bucket summaries
    carries = np.concatenate([[np.iinfo(np.int64).min],
                              np.maximum.accumulate(
                                  bmax.to_numpy(np.int64))[:-1]])
    state_ref = ray.put((bids, carries))

    def late_flags(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"win": np.zeros(0, np.int64),
                                 "ontime": np.zeros(0, np.int64),
                                 "late": np.zeros(0, np.int64)})
        bids_, carries_ = ray.get(state_ref)
        b = df["bucket"].to_numpy(np.int64)
        a = df["arr"].to_numpy(np.int64)
        e = df["eid"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        o = np.lexsort((e, a, b))
        b, t = b[o], t[o]
        cr = carries_[np.searchsorted(bids_, b)]
        new_b = np.concatenate([[True], b[1:] != b[:-1]])
        # carry-seeded EXCLUSIVE running max: heads carry their bucket's
        # carry-in, other rows carry the previous row's t, then one plain
        # cummax. No per-bucket reset is needed: the value leaking across
        # a bucket boundary is bounded by that bucket's full max, which is
        # folded into every later bucket's carry (carries are the global
        # prefix maxes), so the head's seed always dominates the leak.
        wm = np.maximum.accumulate(
            np.where(new_b, cr,
                     np.concatenate([[np.int64(0)], t[:-1]])))
        # t < wm - L rewritten overflow-safe (the first bucket's carry is
        # int64.min; t + L stays far inside int64)
        late = (t + WM_LATENESS_US < wm).astype(np.int64)
        win = t // WM_WINDOW_US
        g = pd.DataFrame({"win": win, "late": late}).groupby(
            "win", sort=False)["late"].agg(["count", "sum"])
        return pd.DataFrame({
            "win": g.index.to_numpy(np.int64),
            "ontime": (g["count"] - g["sum"]).to_numpy(np.int64),
            "late": g["sum"].to_numpy(np.int64),
        })

    per_bucket = grouped(sk, ["bucket"], late_flags, small=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("win", sort=False, as_index=False)[["ontime", "late"]].sum()
        return pd.DataFrame({
            "window_start_us": g["win"].to_numpy(np.int64) * WM_WINDOW_US,
            "n_ontime": g["ontime"].to_numpy(np.int64),
            "n_late": g["late"].to_numpy(np.int64),
        })

    return grouped(per_bucket, ["win"], finish, small=True)


VIT_STATES = 3
# integer score tables, derived arithmetically so both engines share them:
# transition T[i][j] = (7i + 13j) mod 10, emission E[s][o] = (11s + 17o) mod 10
VIT_T = [[(7 * i + 13 * j) % 10 for j in range(3)] for i in range(3)]
VIT_E = [[(11 * s + 17 * o) % 10 for o in range(4)] for s in range(3)]


def viterbi_user_paths(sf_dir: str) -> rd.Dataset:
    """PER-ENTITY SEQUENTIAL DYNAMIC PROGRAMMING (Viterbi / HMM decoding,
    the MATCH_RECOGNIZE-decoder shape): each user's event sequence in
    (ts, event_id) order is scored against a 3-state max-plus chain —
    dp[k][s] = max_p(dp[k-1][p] + T[p][s]) + E[s][o_k] with integer
    score tables and observation o = (cents // 100) mod 4 — and the
    output is each user's best terminal score, arg-best end state
    (smallest state wins ties) and path length. Unlike the one-step
    recurrences (throttle's kept-slot walk, rising triples' shifted
    compares), the DP state is a VECTOR that every step recombines over
    all predecessors — the sequence-labeling primitive under HMM/CRF
    decoding and MATCH_RECOGNIZE pattern engines.

    Shape: skinny rows ride ONE user-keyed exchange; the block kernel
    sorts by (user, ts, eid) and runs the DP as max_len VECTORIZED
    steps — step k updates an (active_users × 3) int64 matrix via one
    (m,3,3) broadcast max, so the Python loop is over SEQUENCE DEPTH
    (≈ max events/user), never over rows or users. Work is O(rows · S²)
    total, the theoretical DP cost.

    The DuckDB oracle carries the dp VECTOR as three columns of a
    recursive CTE (sc0..sc2, one GREATEST expression per state) — the
    single-recursive-reference restriction is satisfied by pivoting
    states into columns, exactly mirroring the engine's vectorization.
    Integer scores make it bit-equal at all scales."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    T = np.asarray(VIT_T, np.int64)
    E = np.asarray(VIT_E, np.int64)

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy().astype(np.int64),
            "t": df["ts"].astype("int64").to_numpy(),
            "eid": df["event_id"].to_numpy().astype(np.int64),
            "o": (cents // 100) % 4,
        })

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.zeros(0, np.int64),
                "n_steps": np.zeros(0, np.int64),
                "best_score": np.zeros(0, np.int64),
                "end_state": np.zeros(0, np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        e = df["eid"].to_numpy()
        o = df["o"].to_numpy()
        srt = np.lexsort((e, t, u))
        u, o = u[srt], o[srt]
        from ..rayctx import depth_slices, group_positions
        uidx, sizes, starts, loc = group_positions(u)
        n_users = len(sizes)
        # rows regrouped by DEPTH: one vectorized dp update per step k
        by_depth, kstarts = depth_slices(uidx, loc)
        kk = loc[by_depth]
        dp = np.zeros((n_users, VIT_STATES), np.int64)
        for s in range(len(kstarts) - 1):
            rows = by_depth[kstarts[s]:kstarts[s + 1]]
            uu = uidx[rows]
            oo = o[rows]
            if kk[kstarts[s]] == 0:
                dp[uu] = E[:, oo].T
            else:
                prev = dp[uu]                              # (m, S)
                best = (prev[:, :, None] + T[None]).max(1)  # (m, S)
                dp[uu] = best + E[:, oo].T
        best = dp.max(axis=1)
        end_state = dp.argmax(axis=1)  # first max == smallest state
        return pd.DataFrame({
            "user_id": u[starts].astype(np.int64),
            "n_steps": sizes.astype(np.int64),
            "best_score": best.astype(np.int64),
            "end_state": end_state.astype(np.int64),
        })

    return grouped(ev.map_batches(skinny, batch_format="pandas"),
                   ["user_id"], decode, small=True)


def viterbi_sql() -> str:
    """Recursive-CTE oracle for :func:`viterbi_user_paths`: the dp vector
    rides as three columns (sc0..sc2), each step one GREATEST per state —
    the states-as-columns pivot that satisfies the single-recursive-
    reference rule. Score tables are inlined from the same formulas."""
    t = VIT_T

    def emit(s):
        return ("CASE o " + " ".join(
            f"WHEN {o} THEN {VIT_E[s][o]}" for o in range(4)) + " END")

    def step(j):
        return ("GREATEST(" + ", ".join(
            f"dp.sc{i} + {t[i][j]}" for i in range(3)) + f") + ({emit(j)})")

    return f"""
        WITH RECURSIVE e AS (
            SELECT user_id,
                   ((CAST(round(value * 100) AS BIGINT) // 100) % 4) AS o,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        dp(user_id, rn, sc0, sc1, sc2) AS (
            SELECT user_id, rn, {emit(0)}, {emit(1)}, {emit(2)}
            FROM e WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn, {step(0)}, {step(1)}, {step(2)}
            FROM dp JOIN e ON e.user_id = dp.user_id AND e.rn = dp.rn + 1
        ),
        fin AS (
            SELECT user_id, rn, sc0, sc1, sc2,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY rn DESC) AS rr
            FROM dp
        )
        SELECT user_id, CAST(rn AS BIGINT) AS n_steps,
               CAST(GREATEST(sc0, sc1, sc2) AS BIGINT) AS best_score,
               CAST(CASE WHEN sc0 >= sc1 AND sc0 >= sc2 THEN 0
                         WHEN sc1 >= sc2 THEN 1 ELSE 2 END AS BIGINT)
                   AS end_state
        FROM fin WHERE rr = 1
    """


def event_percentile_attach(sf_dir: str) -> rd.Dataset:
    """WINDOW FUNCTION AT SCALE — attach each event's PERCENT_RANK within
    its type back onto EVERY ROW, with no global sort: the quantile/gini/
    MAD family reduces groups to scalars, but the attach shape must
    return the full stream enriched with an order statistic — the
    normalize-against-your-cohort step of feature pipelines, and the
    textbook case for histogram-broadcast instead of a sort shuffle.

    Shape: per-(type, cents) count partials bound the one exchange by
    the VALUE DOMAIN (types × distinct cents), the finished histogram
    lands on the driver (domain-bounded, corpus-size-independent) as
    one sorted composite-key array (type_idx·2³² + cents) with
    exclusive within-type cumulative counts, broadcast once via
    ray.put; a stateless second pass attaches
    pct = (#strictly-smaller) / (n_type − 1) via one searchsorted probe
    per row — every probed key exists because the histogram was built
    from these very rows — so the stream itself NEVER shuffles. Exact
    integers until the one terminal division DuckDB's percent_rank
    performs identically (single-value groups → 0.0 on both engines)."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])

    def hist_partials(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        g = (pd.DataFrame({"event_type": df["event_type"], "cents": cents})
             .groupby(["event_type", "cents"], sort=False, as_index=False)
             .size())
        return g.rename(columns={"size": "n"})

    def hist_finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "cents"], sort=False,
                       as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = (grouped(ev.map_batches(hist_partials, batch_format="pandas"),
                    ["event_type", "cents"], hist_finish, small=True)
            .to_pandas().sort_values(["event_type", "cents"]))
    types = hist["event_type"].to_numpy()
    vals = hist["cents"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    tkeys = np.unique(types)                       # sorted type vocabulary
    tidx = np.searchsorted(tkeys, types)           # nondecreasing
    tstarts = np.searchsorted(tidx, np.arange(len(tkeys)))
    tends = np.searchsorted(tidx, np.arange(len(tkeys)) + 1)
    cum = np.zeros(len(vals) + 1, np.int64)
    np.cumsum(cnts, out=cum[1:])
    excl = cum[:-1] - cum[tstarts][tidx]           # smaller-in-type counts
    ntot = cum[tends] - cum[tstarts]               # rows per type
    key_arr = tidx * (np.int64(1) << 32) + vals    # sorted composite key
    state = ray.put((tkeys, key_arr, excl, ntot))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        tk, ka, ex, nt = ray.get(state)
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        ti = np.searchsorted(tk, df["event_type"].to_numpy())
        p = np.searchsorted(ka, ti * (np.int64(1) << 32) + cents)
        less = ex[p]
        denom = (nt[ti] - 1).astype(np.float64)
        pct = np.where(denom > 0, less.astype(np.float64) / denom, 0.0)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy().astype(np.int64),
            "event_type": df["event_type"],
            "value": df["value"].to_numpy(),
            "pct": pct,
        })

    return ev.map_batches(attach, batch_format="pandas")


JS_K = 16          # sample slots drawn from the unmaterialized join
JS_MOD = 1 << 32


def join_sample(sf_dir: str) -> rd.Dataset:
    """SAMPLING OVER AN UNMATERIALIZED JOIN (the retrieved-papers shape:
    Reservoir Sampling over Joins, SIGMOD'24 / weighted sampling over
    join queries): draw ``JS_K`` rows from the M:N self-join
    ``lineitem ⋈ lineitem ON l_partkey`` — Σ d_p² pairs, far too many to
    materialize — WITHOUT producing the join: phase 1 picks the LEFT row
    of each sample by degree-weighted selection (weight = its key's
    right-side multiplicity, the exact condition that makes the pair
    uniform over the join result), phase 2 resolves the partner as the
    hash-ranked row within the key group. Determinism stands in for
    randomness (the engine's weighted_sample idiom): slot priorities are
    ``h(slot, rowid) / degree`` with an integer hash and ONE IEEE
    division, so both engines pick identical samples and the oracle is
    bit-equal rather than statistical.

    Shapes: ONE vocab-bounded key exchange builds the degree table
    (broadcast back as sorted arrays); phase 1 streams the fact side
    once with per-block (slot → argmin) partials — k rows per block, a
    driver fold of block winners; phase 2 rides ONE partkey-keyed
    exchange where `group_positions` ranks each key group and the k
    broadcast requests select their ranked partner. Output: k rows
    (slot, a_rowid, l_partkey, b_rowid), self-pairs allowed (the join
    contains them).

    Scale bound (closed, round 4): the slot-priority hash
    ``rid * 2654435761 + s * 97003 (mod 2^32)`` runs in uint64 on the
    engine side — wrap mod 2^64 commutes with the final mod 2^32 because
    2^32 | 2^64, so the wrap is EXACT at any rowid — and the oracle
    mirrors it in HUGEINT (no 128-bit overflow below rowid 2^95). The
    phase-2 rank hash ``rowid * 40503 + s * 131 (mod degree)`` does NOT
    commute with a 2^64 wrap (degree is not a power of two), so it is
    computed in arbitrary-precision Python ints — it only ever touches
    the k driver-side winners — with the same HUGEINT mirror in SQL."""
    from ..rayctx import group_positions, grouped

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "rowid": df["l_orderkey"].to_numpy().astype(np.int64) * 8
            + df["l_linenumber"].to_numpy().astype(np.int64),
            "pk": df["l_partkey"].to_numpy().astype(np.int64),
        })

    rows = li.map_batches(skinny, batch_format="pandas").materialize()

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pk", sort=False, as_index=False).size()
        return g.rename(columns={"size": "d"})

    deg = grouped(rows.map_batches(deg_part, batch_format="pandas"),
                  ["pk"], lambda df: df.groupby("pk", sort=False,
                                                as_index=False)["d"].sum(),
                  small=True).to_pandas().sort_values("pk")
    dkeys = deg["pk"].to_numpy(np.int64)
    dvals = deg["d"].to_numpy(np.int64)
    deg_ref = ray.put((dkeys, dvals))

    S = np.arange(1, JS_K + 1, dtype=np.int64)

    def phase1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # argmin over a (k, 0) array raises
            return pd.DataFrame({"s": np.zeros(0, np.int64),
                                 "rowid": np.zeros(0, np.int64),
                                 "pk": np.zeros(0, np.int64),
                                 "pri": np.zeros(0, np.float64)})
        dk, dv = ray.get(deg_ref)
        rid = df["rowid"].to_numpy(np.int64)
        pk = df["pk"].to_numpy(np.int64)
        d = dv[np.searchsorted(dk, pk)].astype(np.float64)
        # (slots, rows) priorities in uint64: the 2^64 wrap commutes with
        # the mod-2^32 reduction, so this is exact at ANY rowid (HUGEINT-
        # mirrored in the oracle)
        h = ((rid.astype(np.uint64)[None, :] * np.uint64(2654435761)
              + S.astype(np.uint64)[:, None] * np.uint64(97003))
             % np.uint64(JS_MOD))
        pri = h.astype(np.float64) / d[None, :]
        # per-slot argmin with (priority, rowid) ties
        best = np.argmin(pri, axis=1)
        # strict tie handling: re-scan candidates equal to the min
        out_s, out_r, out_p, out_pri = [], [], [], []
        for i in range(JS_K):
            m = pri[i] == pri[i, best[i]]
            cand = rid[m]
            j = np.argmin(cand)
            out_s.append(i + 1)
            out_r.append(cand[j])
            out_p.append(pk[m][j])
            out_pri.append(pri[i, best[i]])
        return pd.DataFrame({"s": np.array(out_s, np.int64),
                             "rowid": np.array(out_r, np.int64),
                             "pk": np.array(out_p, np.int64),
                             "pri": np.array(out_pri, np.float64)})

    part1 = rows.map_batches(phase1, batch_format="pandas").to_pandas()
    win = (part1.sort_values(["s", "pri", "rowid"], kind="mergesort")
           .groupby("s", sort=True).first().reset_index())
    wd = dvals[np.searchsorted(dkeys, win["pk"].to_numpy(np.int64))]
    # arbitrary-precision Python ints (k driver rows only): a 2^64 wrap
    # would NOT commute with mod-degree
    win["r"] = np.array([(int(r) * 40503 + int(s) * 131) % int(d)
                         for r, s, d in zip(win["rowid"], win["s"], wd)],
                        np.int64)
    req_ref = ray.put((win["s"].to_numpy(np.int64),
                       win["pk"].to_numpy(np.int64),
                       win["r"].to_numpy(np.int64)))

    def phase2(df: pd.DataFrame) -> pd.DataFrame:
        rs, rpk, rr = ray.get(req_ref)
        pk = df["pk"].to_numpy(np.int64)
        rid = df["rowid"].to_numpy(np.int64)
        o = np.lexsort((rid, pk))
        pk, rid = pk[o], rid[o]
        _, _, _, rank = group_positions(pk)
        # match (pk, rank) against the k requests
        out_s, out_b = [], []
        for s, p, r in zip(rs, rpk, rr):
            m = (pk == p) & (rank == r)
            if m.any():
                out_s.append(s)
                out_b.append(rid[np.flatnonzero(m)[0]])
        return pd.DataFrame({"s": np.array(out_s, np.int64),
                             "b_rowid": np.array(out_b, np.int64)})

    partners = grouped(rows, ["pk"], phase2).to_pandas()
    out = win.merge(partners, on="s")[["s", "rowid", "pk", "b_rowid"]]
    out = out.rename(columns={"s": "slot", "rowid": "a_rowid",
                              "pk": "l_partkey"}).sort_values("slot")
    return rd.from_pandas(out.reset_index(drop=True))


UJS_K = 16
UJS_MOD = 1 << 32


def union_join_sample(sf_dir: str):
    """SAMPLING OVER A UNION OF JOINS (the retrieved-papers shape:
    Sampling over Union of Joins, SIGMOD'23): draw ``UJS_K`` rows
    uniformly from the BAG union of two unmaterialized M:N self-joins —
    J₁ = lineitem ⋈ lineitem ON l_partkey (|J₁| = Σₚ dₚ²) and
    J₂ = lineitem ⋈ lineitem ON l_suppkey (|J₂| = Σₛ dₛ²) — without
    producing either join. Uniformity over the union decomposes exactly
    as the paper's: each slot first picks its BRANCH with probability
    |J_b| / (|J₁|+|J₂|), then samples within the branch by the
    degree-weighted two-phase selection of :func:`join_sample` (left row
    weighted by its key's right multiplicity; partner = hash-ranked row
    within the key group).

    Determinism stands in for randomness end-to-end so the oracle is
    bit-equal rather than statistical: the branch pick is PURE INTEGER —
    branch 1 iff ``g(s)·(|J₁|+|J₂|) < |J₁|·2³²`` with
    ``g(s) = (s·1140671485 + 12820163) mod 2³²``, evaluated in Python
    ints / HUGEINT (no float at all); slot priorities reuse join_sample's
    ``h(slot,rowid)/d`` idiom with the slot's OWN branch key's degree.

    Shapes: TWO vocab-bounded degree exchanges (partkey + suppkey, both
    broadcast back as sorted arrays); the join sizes are driver-side
    int64 sums of the degree vectors (Σd² ≤ rows·max_deg — fits int64
    through ~sf1000); ONE streamed fact pass computes per-block per-slot
    argmin partials for ALL slots at once (each slot reads the degree of
    its branch's key column); partner resolution rides one keyed exchange
    PER BRANCH over skinny (key, rowid) rows. Output: UJS_K rows (slot,
    branch, a_rowid, key, b_rowid) as a Dataset — or a typed empty
    pa.Table when the fact table is empty (a Dataset cannot carry an
    empty schema; the driver contract allows Table returns). Hash scale
    bounds closed the same way as :func:`join_sample` (round 4): the
    slot-priority hash wraps exactly in uint64 (2^32 | 2^64), the rank
    hash runs in Python ints over the k winners, both HUGEINT-mirrored
    in the oracle."""
    from ..rayctx import group_positions, grouped

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_partkey",
                             "l_suppkey"])

    def skinny(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "rowid": df["l_orderkey"].to_numpy().astype(np.int64) * 8
            + df["l_linenumber"].to_numpy().astype(np.int64),
            "pk": df["l_partkey"].to_numpy().astype(np.int64),
            "sk": df["l_suppkey"].to_numpy().astype(np.int64),
        })

    rows = li.map_batches(skinny, batch_format="pandas").materialize()

    # BOTH degree tables ride ONE tagged-key exchange (key*2 for partkey,
    # key*2+1 for suppkey — the domains overlap numerically, the tag keeps
    # them disjoint); split back driver-side. One pool spawn instead of two.
    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        tk = np.concatenate([df["pk"].to_numpy(np.int64) * 2,
                             df["sk"].to_numpy(np.int64) * 2 + 1])
        g = (pd.DataFrame({"k": tk})
             .groupby("k", sort=False, as_index=False).size())
        return pd.DataFrame({"k": g["k"].to_numpy(np.int64),
                             "d": g["size"].to_numpy().astype(np.int64)})

    deg = grouped(rows.map_batches(deg_part, batch_format="pandas"),
                  ["k"], lambda df: df.groupby("k", sort=False,
                                               as_index=False)["d"].sum(),
                  small=True).to_pandas()
    if "k" not in deg.columns:   # empty fact: Ray drops the schema with
        deg = pd.DataFrame({"k": [], "d": []})  # the empty blocks
    deg = deg.sort_values("k")
    tk = deg["k"].to_numpy(np.int64)
    dv = deg["d"].to_numpy(np.int64)
    pm = (tk % 2) == 0
    pkeys, pdeg = tk[pm] // 2, dv[pm]
    skeys, sdeg = tk[~pm] // 2, dv[~pm]
    if len(pkeys) == 0 or len(skeys) == 0:
        # empty fact table: both joins are empty. A Dataset cannot carry an
        # empty result's schema (Ray drops empty blocks even from
        # from_pandas — the user_covisitation gotcha), so pin a typed
        # Arrow table; the driver contract accepts Table returns.
        return pa.table({
            "slot": pa.array([], pa.int64()),
            "branch": pa.array([], pa.int64()),
            "a_rowid": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "b_rowid": pa.array([], pa.int64())})
    n1 = int((pdeg.astype(object) ** 2).sum())   # python ints: exact
    n2 = int((sdeg.astype(object) ** 2).sum())

    # branch pick per slot — pure integer, mirrored by HUGEINT in SQL
    S = np.arange(1, UJS_K + 1, dtype=np.int64)
    g = [(int(s) * 1140671485 + 12820163) % UJS_MOD for s in S]
    branch = np.asarray([1 if gv * (n1 + n2) < n1 * UJS_MOD else 2
                         for gv in g], np.int64)
    deg_ref = ray.put((pkeys, pdeg, skeys, sdeg, branch))

    def phase1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"s": np.zeros(0, np.int64),
                                 "rowid": np.zeros(0, np.int64),
                                 "key": np.zeros(0, np.int64),
                                 "pri": np.zeros(0, np.float64)})
        pk_, pd_, sk_, sd_, br = ray.get(deg_ref)
        rid = df["rowid"].to_numpy(np.int64)
        pk = df["pk"].to_numpy(np.int64)
        sk = df["sk"].to_numpy(np.int64)
        d1 = pd_[np.searchsorted(pk_, pk)].astype(np.float64)
        d2 = sd_[np.searchsorted(sk_, sk)].astype(np.float64)
        h = ((rid.astype(np.uint64)[None, :] * np.uint64(2654435761)
              + S.astype(np.uint64)[:, None] * np.uint64(97003))
             % np.uint64(UJS_MOD))
        d_of = np.where(br[:, None] == 1, d1[None, :], d2[None, :])
        key_of = np.where(br[:, None] == 1, pk[None, :], sk[None, :])
        pri = h.astype(np.float64) / d_of
        best = np.argmin(pri, axis=1)
        out_s, out_r, out_k, out_pri = [], [], [], []
        for i in range(UJS_K):
            m = pri[i] == pri[i, best[i]]
            cand = rid[m]
            j = np.argmin(cand)
            out_s.append(i + 1)
            out_r.append(cand[j])
            out_k.append(key_of[i][m][j])
            out_pri.append(pri[i, best[i]])
        return pd.DataFrame({"s": np.array(out_s, np.int64),
                             "rowid": np.array(out_r, np.int64),
                             "key": np.array(out_k, np.int64),
                             "pri": np.array(out_pri, np.float64)})

    part1 = rows.map_batches(phase1, batch_format="pandas").to_pandas()
    win = (part1.sort_values(["s", "pri", "rowid"], kind="mergesort")
           .groupby("s", sort=True).first().reset_index())
    wbr = branch[win["s"].to_numpy(np.int64) - 1]
    wd = np.where(
        wbr == 1,
        pdeg[np.searchsorted(pkeys,
                             np.where(wbr == 1, win["key"].to_numpy(np.int64),
                                      pkeys[0]))],
        sdeg[np.searchsorted(skeys,
                             np.where(wbr == 2, win["key"].to_numpy(np.int64),
                                      skeys[0]))])
    # Python ints over the k winners: a 2^64 wrap would not commute with
    # mod-degree
    win["r"] = np.array([(int(r) * 40503 + int(s) * 131) % int(d)
                         for r, s, d in zip(win["rowid"], win["s"], wd)],
                        np.int64)
    win["branch"] = wbr

    def _partners(col: str, b: int) -> pd.DataFrame:
        sub = win[win["branch"] == b]
        if len(sub) == 0:
            return pd.DataFrame({"s": np.zeros(0, np.int64),
                                 "b_rowid": np.zeros(0, np.int64)})
        req_ref = ray.put((sub["s"].to_numpy(np.int64),
                           sub["key"].to_numpy(np.int64),
                           sub["r"].to_numpy(np.int64)))

        def phase2(df: pd.DataFrame) -> pd.DataFrame:
            rs, rk, rr = ray.get(req_ref)
            k = df[col].to_numpy(np.int64)
            rid = df["rowid"].to_numpy(np.int64)
            o = np.lexsort((rid, k))
            k, rid = k[o], rid[o]
            _, _, _, rank = group_positions(k)
            out_s, out_b = [], []
            for s, kk, r in zip(rs, rk, rr):
                m = (k == kk) & (rank == r)
                if m.any():
                    out_s.append(s)
                    out_b.append(rid[np.flatnonzero(m)[0]])
            return pd.DataFrame({"s": np.array(out_s, np.int64),
                                 "b_rowid": np.array(out_b, np.int64)})

        return grouped(rows, [col], phase2).to_pandas()

    partners = pd.concat([_partners("pk", 1), _partners("sk", 2)],
                         ignore_index=True)
    out = win.merge(partners, on="s")[["s", "branch", "rowid", "key",
                                      "b_rowid"]]
    out = out.rename(columns={"s": "slot", "rowid": "a_rowid"}) \
        .sort_values("slot")
    return rd.from_pandas(out.reset_index(drop=True))


GKE_P = 20     # deterministic 1-in-20 row sample
GKE_K = 256    # KMV sketch size (k minimum hashes)


def groupby_kmv_estimate(sf_dir: str, p_mod: int = GKE_P,
                         k: int = GKE_K) -> rd.Dataset:
    """GROUP-BY RESULT ESTIMATION BY SAMPLE + SKETCH (the retrieved-papers
    shape: Every Row Counts — Combining Sketches and Sampling for Accurate
    Group-By Result Estimates, CIDR'19): estimate the per-user event
    counts AND the total group count of ``events GROUP BY user_id`` from
    one cheap pass — a deterministic 1-in-``p_mod`` row sample for the
    per-group masses (est = n_sample · p_mod, exact for the Zipf head the
    sample sees) combined with a ``k``-minimum-values DISTINCT sketch of
    the full key column for the group-count correction (the unseen-group
    mass the sample alone cannot see). Everything is INTEGER-EXACT — the
    KMV estimate is ``⌊(k−1)·2³² / h_k⌋`` with ``h_k`` the k-th smallest
    distinct key hash, and the sketch degenerates to the exact distinct
    count when fewer than k distinct hashes exist (the standard KMV
    rule) — so the DuckDB mirror is bit-equal, not statistical.

    Shapes: ONE streamed pass emits (a) per-block sampled-group count
    partials (finished by a user-keyed exchange, vocab-bounded) and (b)
    per-block k-smallest distinct key hashes (#blocks × k ints folded on
    the driver — KMV partials are mergeable by union+truncate). Output:
    one row per SAMPLED group (user_id, n_sample, est_n = n_sample·p_mod)
    plus the sentinel row user_id = −1 carrying (seen_group_count,
    kmv_estimated_total_groups)."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    M = np.uint64(1 << 32)
    KN = np.uint64(2654435761)

    # ONE streamed pass emits BOTH partial kinds as tagged skinny rows
    # (kind 0: per-block sampled-group counts; kind 1: the block's
    # k-smallest distinct key hashes); the MATERIALIZED intermediate is
    # the reduced partials, never the events table, so the corpus is
    # scanned exactly once.
    def part(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy().astype(np.uint64)
        hh = (eid * KN) % M
        uid = df["user_id"].to_numpy().astype(np.int64)
        mask = (hh % np.uint64(p_mod)) == 0
        g = (pd.DataFrame({"user_id": uid[mask]})
             .groupby("user_id", sort=False, as_index=False).size())
        uh = np.unique((uid.astype(np.uint64) * KN) % M)[:k]
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(g), np.int64),
                                    np.ones(len(uh), np.int64)]),
            "key": np.concatenate([g["user_id"].to_numpy(np.int64),
                                   uh.astype(np.int64)]),
            "n": np.concatenate([g["size"].to_numpy().astype(np.int64),
                                 np.ones(len(uh), np.int64)])})

    partials = ev.map_batches(part, batch_format="pandas").materialize()

    def samp_final(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["kind"] == 0]
        g = d.groupby("key", sort=False, as_index=False)["n"].sum()
        return pd.DataFrame({
            "user_id": g["key"].to_numpy(np.int64),
            "n_sample": g["n"].to_numpy(np.int64),
            "est_n": (g["n"].to_numpy(np.int64) * p_mod)})

    seen = grouped(
        partials.map_batches(lambda df: df[df["kind"] == 0],
                             batch_format="pandas"),
        ["key"], samp_final, small=True).to_pandas()
    if "user_id" not in seen.columns:   # no sampled rows: Ray drops schema
        seen = pd.DataFrame({"user_id": np.zeros(0, np.int64),
                             "n_sample": np.zeros(0, np.int64),
                             "est_n": np.zeros(0, np.int64)})

    kmv = partials.map_batches(
        lambda df: df[df["kind"] == 1][["key"]],
        batch_format="pandas").to_pandas()
    uh = (np.unique(kmv["key"].to_numpy(np.int64))
          if "key" in kmv.columns else np.zeros(0, np.int64))
    if len(uh) < k:
        est_total = int(len(uh))                # sketch is exact below k
    else:
        hk = int(uh[k - 1])
        est_total = ((k - 1) * (1 << 32)) // hk
    sent = pd.DataFrame({"user_id": [np.int64(-1)],
                         "n_sample": [np.int64(len(seen))],
                         "est_n": [np.int64(est_total)]})
    out = pd.concat([seen, sent], ignore_index=True)
    return rd.from_pandas(out.reset_index(drop=True))


AGD_P = 20     # deterministic 1-in-20 row sample (same hash as KMV op)


def agg_discovery(sf_dir: str, p_mod: int = AGD_P) -> rd.Dataset:
    """AGGREGATE DISCOVERY THROUGH SAMPLING (the retrieved-papers shape:
    Speeding up RDF Aggregate Discovery through Sampling, EDBT'19): rank
    CANDIDATE group-by aggregates of the events table by how interesting
    they look on a cheap deterministic sample, without computing any of
    them exactly. Candidates (all vocab-bounded key spaces): GROUP BY
    event_type / utc-day / user_id%64 / 64×64 geocell (the Knuth-hash
    cell of user_covisitation), measure = sum(value) in exact cents.
    Interestingness = the scale-free dispersion of the per-group sample
    sums, kept RATIONAL: score_ppm = ⌊10⁶·(G·Σs² − S²) / S²⌋ evaluated in
    arbitrary-precision Python ints / HUGEINT (Σs² exceeds int64), so the
    DuckDB mirror is bit-equal, not statistical — a uniform aggregate
    scores ~0, a skewed one large.

    Shapes: ONE streamed pass over the sampled rows emits per-block
    (candidate, group, cents, n) partials for ALL four candidates at
    once; one (candidate, group)-keyed exchange finishes the ≤ ~4.3k
    group sums (64×64 cells dominate); the scoring fold is driver-side
    over that vocab-bounded table. Output: 4 rows (grouping, n_groups,
    sample_rows, score_ppm)."""
    from ..rayctx import grouped

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "ts",
                             "value"])
    M = np.uint64(1 << 32)
    KN = np.uint64(2654435761)
    DAY_US = np.int64(86400000000)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy().astype(np.uint64)
        hh = (eid * KN) % M
        m = (hh % np.uint64(p_mod)) == 0
        d = df[m]
        if len(d) == 0:
            return pd.DataFrame({"cand": np.zeros(0, object),
                                 "gkey": np.zeros(0, np.int64),
                                 "cents": np.zeros(0, np.int64),
                                 "n": np.zeros(0, np.int64)})
        cents = np.rint(d["value"].to_numpy() * 100.0).astype(np.int64)
        h = hh[m]                       # same hash — no recompute
        ix = (h % np.uint64(65536)) // np.uint64(1024)
        iy = (h // np.uint64(65536)) // np.uint64(1024)
        frames = []
        et = d["event_type"].to_numpy(object)
        # event_type keys the int64 exchange via its FNV (collision-free
        # over the tiny vocab; the key VALUE never reaches the output, so
        # the oracle just groups by the string itself)
        from ..functions.hashing import fnv1a64
        etk = (fnv1a64(et) % np.uint64(1 << 62)).astype(np.int64)
        day = (d["ts"].to_numpy("datetime64[us]").astype(np.int64)
               // DAY_US)
        bucket = d["user_id"].to_numpy().astype(np.int64) % 64
        cell = (ix * np.uint64(64) + iy).astype(np.int64)
        for cand, gk in (("event_type", etk), ("day", day),
                         ("user_bucket", bucket), ("cell", cell)):
            g = (pd.DataFrame({"gkey": gk, "cents": cents})
                 .groupby("gkey", sort=False, as_index=False)
                 .agg(cents=("cents", "sum"), n=("cents", "size")))
            g.insert(0, "cand", cand)
            frames.append(g)
        return pd.concat(frames, ignore_index=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cand", "gkey"], sort=False, as_index=False)[
            ["cents", "n"]].sum()
        return g

    sums = grouped(ev.map_batches(partials, batch_format="pandas"),
                   ["cand", "gkey"], fin, small=True).to_pandas()
    if "cand" not in sums.columns:      # every block sampled empty — Ray
        sums = pd.DataFrame({"cand": [], "gkey": [],  # drops the schema
                             "cents": [], "n": []})

    rows = []
    cands = ["cell", "day", "event_type", "user_bucket"]
    by_cand = dict(iter(sums.groupby("cand", sort=True)))
    for cand in cands:
        if cand not in by_cand:
            rows.append((cand, np.int64(0), np.int64(0), np.int64(0)))
            continue
        g = by_cand[cand]
        s = [int(v) for v in g["cents"]]
        G = len(s)
        S = sum(s)
        ss = sum(v * v for v in s)          # python ints: exact, no wrap
        score = ((G * ss - S * S) * 1_000_000) // (S * S) if S != 0 else 0
        rows.append((cand, np.int64(G), np.int64(int(g["n"].sum())),
                     np.int64(score)))
    out = pd.DataFrame(rows, columns=["grouping", "n_groups",
                                      "sample_rows", "score_ppm"])
    return rd.from_pandas(out)
