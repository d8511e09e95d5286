"""The engine's query registry: every operator from SURVEY.md §2 (and the
engine-new training-data ops) exposed as a named pipeline over the driver's
testdata, each with a DuckDB oracle where ANSI SQL can express it.

Contract (driver: __ray_entry__.py): each callable takes ``sf_dir`` and
returns a Dataset / pandas DataFrame / pyarrow Table; the matching entry in
ORACLE_SQL is run by DuckDB over the same parquet files (views: region nation
customer supplier part orders lineitem events documents embeddings). Column
names match exactly; float aggregates are rounded identically on both sides.

None of these call ray.init() — the driver owns the session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..frontier.canon import canonicalize
from ..functions import (audioops, clustering, corpusstats, dedup, imageops,
                         multimodal, pii, sampling, similarity, textstats)
from .flagship import run_flagship


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _rmtree(path: str) -> None:
    """Best-effort cleanup of a query's scratch index dir (the gate runs
    every entry repeatedly; leaked per-run dirs accumulate in /tmp).
    Callers must be EAGER before calling this — a lazy Dataset still
    referencing the files would break on consumption."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _sorted_table(ds_or_table, sort_keys: list[str]):
    if hasattr(ds_or_table, "to_pandas") and not isinstance(ds_or_table, pa.Table):
        df = ds_or_table.to_pandas()
        return df.sort_values(sort_keys).reset_index(drop=True)
    return ds_or_table.sort_by([(k, "ascending") for k in sort_keys])


def _mod(array, m: int) -> pa.Array:
    """Elementwise modulo (pyarrow.compute ships no modulo kernel; numpy view
    is zero-copy for non-null int columns)."""
    if isinstance(array, pa.ChunkedArray):
        array = array.combine_chunks()
    return pa.array(array.to_numpy(zero_copy_only=False) % m)



def _lit(value: str, n: int) -> pa.Array:
    # typed even when n == 0 (a bare [] becomes a null array and breaks joins)
    return pa.array([value] * n, pa.string())


def _round(column, digits: int) -> pa.Array:
    """Round like DuckDB's ROUND(DOUBLE, d) — see functions/rounding.py."""
    from ..functions.rounding import round_half_away

    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    values = column.to_numpy(zero_copy_only=False)
    return pa.array(round_half_away(values, digits), pa.float64())


# ---------------------------------------------------------------------------
# extraction family (the reference kernel end-to-end, SURVEY.md §2.2-2.3)


def q_extract_text(sf_dir: str):
    """Full MIME+DOM extraction: documents → MHTML → parse+convert →
    (url, title, text_out). The oracle reconstructs all three from SQL —
    the pipeline is correct only if extraction round-trips byte-identically."""
    out = run_flagship(sf_dir, keep_html=False).select_columns(["url", "title", "text_out"])
    return _sorted_table(out, ["url"])


def q_extract_page_stats(sf_dir: str):
    """Extraction output aggregated per lang: n_pages + total_chars of the
    extracted text (groupby after the extraction stage)."""
    from ray.data.aggregate import Count, Sum

    out = run_flagship(sf_dir, keep_html=False)

    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "chars": pc.utf8_length(batch.column("text_out")).cast(pa.int64()),
            }
        )

    stats = (
        out.map_batches(lengths, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_pages"), Sum("chars", alias_name="total_chars"))
    )

    # DuckDB SUM(BIGINT) → HUGEINT → pandas float64; match the dtype
    def widen(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("total_chars"),
            "total_chars",
            pc.cast(batch.column("total_chars"), pa.float64()),
        )

    return _sorted_table(stats.map_batches(widen, batch_format="pyarrow"), ["lang"])


def q_extract_charset_title(sf_dir: str):
    """The charset cascade under oracle check: every document becomes a
    koi8-r-ENCODED page (meta http-equiv declaration) whose non-ASCII title
    is derived from doc_id; the pipeline must detect the declaration,
    re-decode the raw bytes (parse.js:423-473) and return the exact title
    the oracle reconstructs in SQL."""
    import ray.data

    from ..kernel.charsets import encode_single_byte_charset
    from ..stages.extract import ExtractBatch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def build(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        htmls = []
        for doc_id in doc_ids:
            title = f"Привет-{doc_id}"
            document = (
                b"<html><head>"
                b'<meta http-equiv="Content-Type" content="text/html; charset=koi8-r">'
                b"<title>" + encode_single_byte_charset(title, "koi8-r") + b"</title>"
                b"</head><body><p>body</p></body></html>"
            )
            htmls.append(
                b"MIME-Version: 1.0\r\n"
                b'Content-Type: multipart/related; boundary="----=_C"\r\n\r\n'
                b"------=_C\r\nContent-Type: text/html\r\n"
                b"Content-Transfer-Encoding: 8bit\r\n"
                b"Content-Location: https://charset.fixture.invalid/"
                + str(doc_id).encode() + b"\r\n\r\n" + document + b"\r\n------=_C--\r\n"
            )
        return pa.table(
            {
                "url": pa.array(
                    [f"https://charset.fixture.invalid/{d}" for d in doc_ids], pa.string()
                ),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    out = ds.map_batches(build, batch_format="pyarrow").map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=128
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("url"), "title": batch.column("title")})

    return _sorted_table(out.map_batches(project, batch_format="pyarrow"), ["url"])


def q_extract_anomaly_stats(sf_dir: str):
    """Recovery-anomaly distribution over the deterministic fixture corpus
    (the reference's anomaly taxonomy as a pipeline: parse.js:49-52,
    convert.js:113). sf-independent input by design; rows-only check."""
    import ray.data
    from ray.data.aggregate import Count

    from ..sources.fixtures import corpus_pages_table
    from ..stages.extract import ExtractBatch

    table = corpus_pages_table(500, n_hosts=8, seed=42)
    out = ray.data.from_arrow(table).map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=64
    )

    def explode(batch: pa.Table) -> pa.Table:
        types = []
        for anomaly_list in batch.column("anomalies").to_pylist():
            for anomaly in anomaly_list or []:
                types.append(anomaly["type"])
        return pa.table({"anomaly_type": pa.array(types, pa.string())})

    agg = out.map_batches(explode, batch_format="pyarrow").groupby("anomaly_type").aggregate(
        Count(alias_name="n")
    )
    return _sorted_table(agg, ["anomaly_type"])


# ---------------------------------------------------------------------------
# crawl-shaped family (frontier operators over a synthetic web derived from
# the orders/lineitem tables — deterministic, so SQL can predict everything)


def _orders_url_expr(batch: pa.Table) -> pa.Table:
    custkey = batch.column("o_custkey")
    orderkey = batch.column("o_orderkey")
    host = pc.binary_join_element_wise(
        _lit("host-", batch.num_rows),
        pc.cast(_mod(custkey, 20), pa.string()),
        _lit(".example.com", batch.num_rows),
        "",
    )
    url = pc.binary_join_element_wise(
        _lit("https://", batch.num_rows),
        host,
        _lit("/order/", batch.num_rows),
        pc.cast(orderkey, pa.string()),
        "",
    )
    return pa.table(
        {
            "url": url,
            "host": host,
            "priority": _round(batch.column("o_totalprice"), 2),
            "orderkey": orderkey,
        }
    )


def q_frontier_seed(sf_dir: str):
    """Frontier admission projection: orders → (url, host, priority)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = ds.map_batches(_orders_url_expr, batch_format="pyarrow").drop_columns(["orderkey"])
    return _sorted_table(out, ["url"])


def q_frontier_host_budget(sf_dir: str):
    """Per-host politeness budgeting: groupby(host) → url count, total
    priority, budget = min(n_urls, 10) — the per-wave host aggregate that
    feeds the scheduler (SURVEY.md §2.6 aggregations).

    Priorities are 2-dp dollar values; summing them as float64 flaps by ±1
    unit with block order when the true sum lands on an x.5 boundary, so the
    sum is carried as EXACT integer cents (int64) end-to-end and only the
    dtype is widened to float64 at the edge to match DuckDB's
    SUM(BIGINT)→HUGEINT→pandas-float64 conversion."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    frontier = ds.map_batches(_orders_url_expr, batch_format="pyarrow")

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = _round(pc.multiply(batch.column("priority"), pa.scalar(100.0)), 0)
        return pa.table(
            {
                "host": batch.column("host"),
                "priority_cents": pc.cast(cents, pa.int64()),
            }
        )

    agg = frontier.map_batches(to_cents, batch_format="pyarrow").groupby("host").aggregate(
        Count(alias_name="n_urls"), Sum("priority_cents", alias_name="sum_priority_cents")
    )

    def budget(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "n_urls": batch.column("n_urls"),
                "sum_priority_cents": pc.cast(
                    batch.column("sum_priority_cents"), pa.float64()
                ),
                "budget": pc.min_element_wise(
                    batch.column("n_urls"), pa.scalar(10, pa.int64())
                ),
            }
        )

    return _sorted_table(agg.map_batches(budget, batch_format="pyarrow"), ["host"])


def q_frontier_topk(sf_dir: str):
    """Wave prioritization: global top-100 by (priority desc, url asc) —
    sort + limit (SURVEY.md §2.6 sort/top-k)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    frontier = ds.map_batches(_orders_url_expr, batch_format="pyarrow").drop_columns(["orderkey"])
    top = frontier.sort(["priority", "url"], descending=[True, False]).limit(100)
    return top.to_pandas()


def q_recrawl_schedule(sf_dir: str):
    """Revisit scheduling (the re-crawl side of the frontier, cf. the
    reference's fetch loop replaying stale archives): events replay as a
    fetch log — url u<event_id%2000> on host h<user_id%32>, observed at ts —
    and the schedule picks, per host, the 5 longest-unvisited URLs. Shape:
    one (host, url) groupby for the last-fetch table (partial max inside
    the shuffle), then a per-host top-k via the window machinery — the same
    two-exchange plan a 10^10-URL revisit pass needs; the last-fetch table
    is the only state and it is host-hash partitioned."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def fetch_log(batch: pa.Table) -> pa.Table:
        event_id = batch.column("event_id")
        user_id = batch.column("user_id")
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        host = pc.binary_join_element_wise(
            "h", pc.cast(_mod(user_id, 32), pa.string()), "")
        url_id = _mod(event_id, 2000)
        return pa.table({"host": host, "url_id": url_id, "ts_us": ts_us})

    last = (
        ds.map_batches(fetch_log, batch_format="pyarrow")
        .groupby(["host", "url_id"])
        .max("ts_us")
    )

    def per_host(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["max(ts_us)", "url_id"]).head(5)
        group = group.reset_index(drop=True)
        group["revisit_rank"] = group.index.astype("int64") + 1
        return group.rename(columns={"max(ts_us)": "last_ts_us"})

    out = last.groupby("host").map_groups(per_host, batch_format="pandas")
    return _sorted_table(out, ["host", "revisit_rank"])


def q_url_seen_antijoin(sf_dir: str):
    """URL-seen anti-join through the engine's real sharded seen set
    (frontier/seen.py): seen urls (every third order) are inserted into the
    cuckoo+exact shard actors from worker tasks, then the frontier is
    anti-joined by per-batch membership calls against the same shards — the
    urls never aggregate on the driver (SURVEY.md §2.6 semi/anti-join)."""
    from ..frontier.seen import ShardedSeenSet

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    frontier = ds.map_batches(_orders_url_expr, batch_format="pyarrow")
    seen = ShardedSeenSet(n_shards=4)

    def mark_seen(batch: pa.Table) -> pa.Table:
        crawled = batch.filter(pc.equal(_mod(batch.column("orderkey"), 3), 0))
        urls = crawled.column("url").to_pylist()
        if urls:
            seen.check_and_add(urls)
        return pa.table({"n": pa.array([len(urls)], pa.int64())})

    # populate the shards (consumed for effect; each worker task routes its
    # batch straight to the shard actors)
    frontier.map_batches(mark_seen, batch_format="pyarrow").count()

    def not_seen(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        mask = pa.array([not flag for flag in seen.contains(urls)])
        return pa.table({"url": batch.filter(mask).column("url")})

    out = frontier.map_batches(not_seen, batch_format="pyarrow")
    result = _sorted_table(out, ["url"])
    # sanity: the shard actors actually served the membership traffic
    assert seen.total_seen() > 0
    return result


def q_crawl_bfs_wave1(sf_dir: str):
    """One BSP crawl wave: seed orders (o_orderkey % 100 == 1) at wave 0,
    their lineitem children discovered at wave 1, exact-deduped."""
    import ray

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def seeds(batch: pa.Table) -> pa.Table:
        mask = pc.equal(_mod(batch.column("o_orderkey"), 100), 1)
        filtered = batch.filter(mask)
        t = _orders_url_expr(filtered)
        return pa.table(
            {
                "url": t.column("url"),
                "wave": pa.array([0] * t.num_rows, pa.int32()),
                "orderkey": t.column("orderkey"),
            }
        )

    seed_ds = orders.map_batches(seeds, batch_format="pyarrow")
    # wave seeds are the genuinely small side (1% of orders): broadcast the
    # keyset once as an Arrow array for a vectorized pc.is_in child filter
    seed_keys = pa.concat_arrays(
        [
            batch["orderkey"].combine_chunks()
            for batch in seed_ds.select_columns(["orderkey"]).iter_batches(
                batch_format="pyarrow", batch_size=65536
            )
        ]
    )
    keys_ref = ray.put(seed_keys)

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def children(batch: pa.Table) -> pa.Table:
        filtered = batch.filter(
            pc.is_in(batch.column("l_orderkey"), value_set=ray.get(keys_ref))
        )
        url = pc.binary_join_element_wise(
            _lit("https://items.example.com/item/", filtered.num_rows),
            pc.cast(filtered.column("l_orderkey"), pa.string()),
            _lit("/", filtered.num_rows),
            pc.cast(filtered.column("l_linenumber"), pa.string()),
            "",
        )
        return pa.table({"url": url, "wave": pa.array([1] * filtered.num_rows, pa.int32())})

    child_ds = lineitem.map_batches(children, batch_format="pyarrow")
    # distributed dedup: union both waves and groupby(url) — the visited set
    # never lands on the driver (the round-1 pandas drop_duplicates did)
    from ray.data.aggregate import Min

    visited = (
        seed_ds.drop_columns(["orderkey"])
        .union(child_ds)
        .groupby("url")
        .aggregate(Min("wave", alias_name="wave"))
    )

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "wave": pc.cast(batch.column("wave"), pa.int32()),
            }
        )

    return _sorted_table(visited.map_batches(narrow, batch_format="pyarrow"), ["url"])


def q_canonicalize_urls(sf_dir: str):
    """The WHATWG canonicalizer (util.js:518-525 / frontier seen keys) over
    messy synthesized URLs: uppercase scheme+host, default port, dot
    segments — the oracle writes the expected canonical form directly."""
    ds = _read(sf_dir, "customer", ["c_custkey"])

    def canon_batch(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_pylist()
        raw = [
            f"HTTPS://Host-{k}.Example.COM:443/a/./b/../c%2Fd?q={k}" for k in keys
        ]
        canon = [canonicalize(u).canon_url for u in raw]
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "canon_url": pa.array(canon, pa.string()),
            }
        )

    return _sorted_table(ds.map_batches(canon_batch, batch_format="pyarrow"), ["c_custkey"])


# ---------------------------------------------------------------------------
# relational family (generic operator coverage: filter/groupby/join/sort/
# window/distinct — the §2.6 relational view)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan → computed columns → grouped aggregate
    (partial sums combine per batch under the hood)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        disc_price = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": batch.column("l_quantity"),
                "base_price": batch.column("l_extendedprice"),
                "disc_price": disc_price,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_price", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                # whole units, not cents: engine-vs-oracle summation-order
                # drift on 10^5-row sums at 1e9 magnitude exceeds 0.005
                "sum_qty": _round(batch.column("sum_qty"), 0),
                "sum_base_price": _round(batch.column("sum_base_price"), 0),
                "sum_disc_price": _round(batch.column("sum_disc_price"), 0),
                "count_order": batch.column("count_order"),
            }
        )

    out = agg.map_batches(finalize, batch_format="pyarrow")
    return _sorted_table(out, ["l_returnflag", "l_linestatus"])


def _lineitem_revenue_by_orderkey(sf_dir: str):
    """Fact-side pre-aggregate: lineitem → Sum(rev) per l_orderkey. The
    per-batch projection computes rev vectorized; the groupby shuffles only
    (orderkey, rev) pairs — the aggregate is far smaller than the join input,
    so it runs BEFORE any join with orders (VERDICT round-1 item 5)."""
    from ray.data.aggregate import Sum

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table({"l_orderkey": batch.column("l_orderkey"), "rev": rev})

    return (
        lineitem.map_batches(revenue, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )


def q_top_orders_by_revenue(sf_dir: str):
    """Dimension-broadcast semi-join + fact pre-aggregate + top-k: the
    BUILDING custkey set (customer IS a dimension table) is broadcast once
    via ray.put; orders is filtered distributed with pc.is_in — never
    materialized on the driver; lineitem revenue is pre-aggregated per
    orderkey and hash-joined with the surviving orders."""
    import ray

    from ..functions.joins import hash_join

    customers = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def building_keys(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("c_mktsegment"), pa.scalar("BUILDING"))
        return pa.table({"c_custkey": batch.filter(mask).column("c_custkey")})

    building = customers.map_batches(
        building_keys, batch_format="pyarrow"
    ).to_pandas()
    building_ref = ray.put(pa.array(building["c_custkey"], pa.int64()))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def building_orders(batch: pa.Table) -> pa.Table:
        keys = ray.get(building_ref)
        mask = pc.is_in(batch.column("o_custkey"), value_set=keys)
        return pa.table({"l_orderkey": batch.filter(mask).column("o_orderkey")})

    survivors = orders.map_batches(building_orders, batch_format="pyarrow")
    joined = hash_join(
        _lineitem_revenue_by_orderkey(sf_dir), survivors, key="l_orderkey",
        num_buckets=32,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64())})
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue": _round(batch.column("revenue"), 2),
            }
        )

    top = (
        joined.map_batches(finalize, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )
    return top.to_pandas()


def q_revenue_by_nation(sf_dir: str):
    """Fact⋈fact shuffle joins with dimension broadcast, 100-TB shaped:
    lineitem revenue is pre-aggregated per orderkey (combiner before any
    wide step); customer — a FACT at scale, never broadcast or collected —
    is tagged with n_name by a vectorized np.searchsorted lookup against
    the broadcast 25-row nation table; orders⋈customer and
    revenue⋈tagged-orders each run as one distributed hash_join (see
    functions/joins.py — union + groupby(bucket).map_groups, not
    Dataset.join); the final groupby is 25 rows."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation = nation.sort_values("n_nationkey").reset_index(drop=True)
    nation_ref = ray.put(
        (nation["n_nationkey"].to_numpy(), nation["n_name"].to_numpy())
    )

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def tag_customer(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(nation_ref)
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        positions = np.searchsorted(keys, nk)
        # guard absent nation keys: clip, then verify the looked-up key
        # actually matches — an unmatched customer DROPS (inner-join
        # semantics) instead of indexing out of bounds or silently taking
        # the insertion point's wrong nation
        positions = np.clip(positions, 0, len(keys) - 1)
        matched = keys[positions] == nk
        return pa.table(
            {
                "o_custkey": pa.array(
                    batch.column("c_custkey").to_numpy(zero_copy_only=False)[matched],
                    pa.int64(),
                ),
                "n_name": pa.array(names[positions][matched], pa.string()),
            }
        )

    cust_nation = customer.map_batches(tag_customer, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    tagged = hash_join(orders, cust_nation, key="o_custkey", num_buckets=32)
    tagged = tagged.map_batches(
        lambda b: pa.table({"l_orderkey": b.column("o_orderkey"),
                            "n_name": b.column("n_name")})
        if b.num_rows else pa.table({"l_orderkey": pa.array([], pa.int64()),
                                     "n_name": pa.array([], pa.string())}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        _lineitem_revenue_by_orderkey(sf_dir), tagged, key="l_orderkey",
        num_buckets=32,
    )
    agg = joined.groupby("n_name").aggregate(Sum("revenue", alias_name="revenue"))

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64())})
        return pa.table(
            {
                "n_name": batch.column("n_name"),
                "revenue": _round(batch.column("revenue"), 0),
            }
        )

    return _sorted_table(agg.map_batches(finalize, batch_format="pyarrow"), ["n_name"])


def _big_order_custkeys(sf_dir: str):
    """Orders with o_totalprice > 400k, projected down to the customer key
    (renamed so the join key matches the left side). The semi/anti join
    dedups these per batch — only distinct keys ever shuffle."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def keys(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater(batch.column("o_totalprice"), 400_000.0))
        return pa.table({"c_custkey": kept.column("o_custkey")})

    return orders.map_batches(keys, batch_format="pyarrow")


def q_customer_big_order_semi(sf_dir: str):
    """Distributed SEMI join (WHERE EXISTS): customers with at least one
    order above 400k. hash_join(how="semi") ships only DISTINCT right keys
    through the one bucket shuffle — the right table's width and duplicate
    count never hit the exchange (the 100-TB EXISTS shape)."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    out = hash_join(cust, _big_order_custkeys(sf_dir), key="c_custkey",
                    num_buckets=32, how="semi")
    return _sorted_table(out, ["c_custkey"])


def q_customer_no_big_order_anti(sf_dir: str):
    """Distributed ANTI join (WHERE NOT EXISTS): customers with NO order
    above 400k — same physical plan as the semi, Acero "left anti" per
    bucket, null-key left rows kept per SQL NOT EXISTS semantics."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    out = hash_join(cust, _big_order_custkeys(sf_dir), key="c_custkey",
                    num_buckets=32, how="anti")
    return _sorted_table(out, ["c_custkey"])


def q_customer_order_full_audit(sf_dir: str):
    """Distributed FULL OUTER join (hash_join how="full"): high-balance
    customers ⟗ big-order counts — matched rows, customers with no big
    order (null count) and big-order customers below the balance bar (null
    name) all survive, null-key rows of either side included per SQL FULL
    JOIN. Same one-shuffle bucket plan as every other mode."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def hi(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater(batch.column("c_acctbal"), 9_000.0))
        return pa.table({"c_custkey": kept.column("c_custkey"),
                         "c_name": kept.column("c_name")})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater(batch.column("o_totalprice"), 400_000.0))
        counts = kept.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table({"c_custkey": counts.column("o_custkey"),
                         "n_big": counts.column("o_custkey_count")})

    big = (
        orders.map_batches(partials, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n_big", alias_name="n_big"))
    )
    out = hash_join(cust.map_batches(hi, batch_format="pyarrow"), big,
                    key="c_custkey", num_buckets=32, how="full")
    return _sorted_table(out, ["c_custkey"])


def q_customer_big_order_counts(sf_dir: str):
    """LEFT OUTER join + COALESCE: every customer with their count of >400k
    orders, zero included. Fact side pre-aggregates per batch (one row per
    distinct custkey per block) before the one count groupby, then a
    distributed hash_join(how="left") against the dimension and a
    vectorized null→0 fill — no driver lookup table, no broadcast of a
    table that grows with SF."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater(batch.column("o_totalprice"), 400_000.0))
        counts = kept.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table({"c_custkey": counts.column("o_custkey"),
                         "n_partial": counts.column("o_custkey_count")})

    counts = (
        orders.map_batches(partials, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n_partial", alias_name="n_big_orders"))
    )
    joined = hash_join(cust, counts, key="c_custkey", num_buckets=32, how="left")

    def fill_zero(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "c_name": pa.array([], pa.string()),
                             "n_big_orders": pa.array([], pa.int64())})
        n = pc.coalesce(batch.column("n_big_orders"), pa.scalar(0, pa.int64()))
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "c_name": batch.column("c_name"),
                         "n_big_orders": pc.cast(n, pa.int64())})

    return _sorted_table(joined.map_batches(fill_zero, batch_format="pyarrow"),
                         ["c_custkey"])


def _value_moment_partials(batch: pa.Table) -> pa.Table:
    """Per-block (n, Σx, Σx²) combiner rows per event_type — the shared
    first pass of events_value_stats and events_value_outliers."""
    v = batch.column("value").to_numpy(zero_copy_only=False)
    keys = batch.column("event_type")
    t = pa.table({
        "event_type": keys,
        "n_part": pa.array(np.where(np.isnan(v), 0, 1), pa.int64()),
        "sum_part": pa.array(np.nan_to_num(v), pa.float64()),
        "sumsq_part": pa.array(np.nan_to_num(v * v), pa.float64()),
    })
    g = t.group_by("event_type").aggregate(
        [("n_part", "sum"), ("sum_part", "sum"), ("sumsq_part", "sum")]
    )
    return pa.table({
        "event_type": g.column("event_type"),
        "n_part": g.column("n_part_sum"),
        "sum_part": g.column("sum_part_sum"),
        "sumsq_part": g.column("sumsq_part_sum"),
    })


def _value_moments_agg(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return (
        ds.map_batches(_value_moment_partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_part", alias_name="n"),
                   Sum("sum_part", alias_name="s"),
                   Sum("sumsq_part", alias_name="ss"))
    )


def q_events_value_stats(sf_dir: str):
    """Numeric-moments combiner: per event_type n / mean / sample variance
    from ONE pass of per-block (n, Σx, Σx²) partials + one k-row groupby —
    the classic distributed-statistics shape (no second scan for the
    variance). Rounding absorbs the sum-order drift vs the oracle's
    streaming VAR_SAMP."""
    agg = _value_moments_agg(sf_dir)

    def finalize(batch: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "mean_value": pa.array([], pa.float64()),
                             "var_value": pa.array([], pa.float64())})
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        ss = batch.column("ss").to_numpy(zero_copy_only=False)
        mean = s / n
        var = (ss - n * mean * mean) / np.maximum(n - 1, 1.0)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "mean_value": pa.array(round_half_away(mean, 6), pa.float64()),
            "var_value": pa.array(round_half_away(var, 6), pa.float64()),
        })

    return _sorted_table(agg.map_batches(finalize, batch_format="pyarrow"),
                         ["event_type"])


def q_events_value_outliers(sf_dir: str):
    """Broadcast-aggregate composition: the k-row moments result feeds back
    as a broadcast lookup (k × 3 floats — never a join shuffle) and one
    vectorized filter pass keeps |z| > 2.5 rows. The two-phase
    aggregate-then-filter shape of every anomaly scrub at 100 TB."""
    from ..functions.rounding import round_half_away

    stats = _value_moments_agg(sf_dir).to_pandas()
    n = stats["n"].to_numpy(dtype="float64")
    s = stats["s"].to_numpy(dtype="float64")
    ss = stats["ss"].to_numpy(dtype="float64")
    mean = s / n
    sd = np.sqrt((ss - n * mean * mean) / np.maximum(n - 1.0, 1.0))
    type_keys = pa.array(stats["event_type"].tolist(), pa.string())

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def keep_outliers(batch: pa.Table) -> pa.Table:
        # vectorized gather: dictionary-encode the type column against the
        # broadcast key list, then numpy-take the per-type moments
        idx = pc.index_in(batch.column("event_type"), value_set=type_keys) \
            .to_numpy(zero_copy_only=False)
        m = mean[idx]
        d = sd[idx]
        v = batch.column("value").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - m) / d
        # a degenerate group (n==1 or zero variance) has no meaningful z —
        # the oracle's NULL/zero stddev drops those rows too
        mask = (d > 0) & (np.abs(z) > 2.5)
        kept = batch.filter(pa.array(mask))
        return pa.table({
            "event_id": kept.column("event_id"),
            "event_type": kept.column("event_type"),
            "value": kept.column("value"),
            "z": pa.array(round_half_away(z[mask], 6), pa.float64()),
        })

    out = ds.map_batches(keep_outliers, batch_format="pyarrow")
    return _sorted_table(out, ["event_id"])


def q_events_running_total(sf_dir: str):
    """Cumulative window (ROWS UNBOUNDED PRECEDING): per-user running total
    of ``value`` in (ts, event_id) order — one hash shuffle on user_id,
    np.cumsum per sorted group (the strict left-to-right order the oracle's
    frame walk uses)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def running(group: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        group = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        total = np.cumsum(group["value"].to_numpy(dtype="float64"))
        return pd.DataFrame({
            "event_id": group["event_id"],
            "user_id": group["user_id"],
            "running_value": round_half_away(total, 6),
        })

    out = ds.groupby("user_id").map_groups(running, batch_format="pandas")
    return _sorted_table(out, ["event_id"])


def q_length_quantiles_by_lang(sf_dir: str):
    """Grouped exact quantiles (functions/quantiles.exact_quantiles_by):
    per-block (lang, value, n) partials → one groupby over DISTINCT pairs →
    per-group driver CDF walk. Driver footprint = groups × distinct values,
    never rows."""
    from ..functions.quantiles import exact_quantiles_by

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = exact_quantiles_by(ds, "lang", "n_chars", [0.25, 0.5, 0.75, 0.9],
                             key_name="lang")
    return _sorted_table(out, ["lang", "q"])


def q_events_first_last(sf_dir: str):
    """argmin/argmax aggregate: each user's FIRST and LAST event value in
    (ts, event_id) order, computed as a per-block combiner (one candidate
    first/last row per user per block) + a tiny per-user reduce — the
    shuffle carries ≤ 2 × n_blocks rows per user, never the event log."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        df = df.assign(ts_us=ts_us)
        first = df.groupby("user_id", as_index=False).head(1)
        last = df.groupby("user_id", as_index=False).tail(1)
        return pd.DataFrame({
            "user_id": pd.concat([first["user_id"], last["user_id"]]),
            "ts_us": pd.concat([first["ts_us"], last["ts_us"]]),
            "event_id": pd.concat([first["event_id"], last["event_id"]]),
            "value": pd.concat([first["value"], last["value"]]),
        }).reset_index(drop=True)

    def reduce_group(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        return pd.DataFrame({
            "user_id": [group["user_id"].iloc[0]],
            "first_value": [group["value"].iloc[0]],
            "last_value": [group["value"].iloc[-1]],
        })

    out = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("user_id")
        .map_groups(reduce_group, batch_format="pandas")
    )
    return _sorted_table(out, ["user_id"])


def q_normalize_text(sf_dir: str):
    """Unicode + whitespace normalization kernel: NFC-normalize, strip C0/C1
    control chars, collapse whitespace runs, trim — the canonical first
    transform of a web-text pipeline. The input is deterministically
    DIRTIED first (combining accent + tabs + a control char derived the
    same way in the SQL oracle), so the hash match proves the
    normalization arithmetic, not an identity pass."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # U+0065 U+0301 must fuse to é under NFC; \x0b must strip as a control
    prefix = " éx\t"
    suffix = " \x0b\t"

    def norm(batch: pa.Table) -> pa.Table:
        import unicodedata

        n = batch.num_rows
        dirty = pc.binary_join_element_wise(
            pa.array([prefix] * n, pa.string()),
            batch.column("text"),
            pa.array([suffix] * n, pa.string()),
            "",
        )
        # NOT pc.utf8_normalize: Arrow 16's NFC does not COMPOSE (e+U+0301
        # stays decomposed — verified), so it can't match DuckDB's
        # nfc_normalize. unicodedata is C-implemented and is_normalized
        # fast-paths the (typical) already-NFC rows without a copy.
        t = pa.array(
            [s if unicodedata.is_normalized("NFC", s)
             else unicodedata.normalize("NFC", s)
             for s in dirty.to_pylist()],
            pa.string(),
        )
        t = pc.replace_substring_regex(
            t, r"[\x00-\x08\x0b\x0e-\x1f\x7f]", "")
        t = pc.replace_substring_regex(t, r"[\t\n\f\r ]+", " ")
        t = pc.utf8_trim(t, " ")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text_norm": t,
            "n_chars_norm": pc.utf8_length(t).cast(pa.int64()),
        })

    return _sorted_table(ds.map_batches(norm, batch_format="pyarrow"),
                         ["doc_id"])


def q_domain_sample(sf_dir: str):
    """Uniform k-per-group sampling WITHOUT RNG: order by md5(text) (a
    uniform hash) and keep the 5 smallest per source via the per_key_cap
    combiner — layout-independent, reproducible, and the shuffle carries at
    most cap × n_blocks rows per key."""
    import hashlib

    from ..functions.sampling import per_key_cap

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def hash_key(batch: pa.Table) -> pa.Table:
        keys = [hashlib.md5(t.encode()).hexdigest()
                for t in batch.column("text").to_pylist()]
        return pa.table({
            "source": batch.column("source"),
            "sample_key": pa.array(keys, pa.string()),
            "doc_id": batch.column("doc_id"),
        })

    keyed = ds.map_batches(hash_key, batch_format="pyarrow")
    out = per_key_cap(keyed, key="source", max_per_key=5,
                      order_col="sample_key", columns=["doc_id"])
    return _sorted_table(out, ["source", "sample_key"])


def q_value_quantiles_tdigest(sf_dir: str):
    """Approximate quantiles of the CONTINUOUS events.value column via the
    mergeable t-digest (functions/sketches.TDigest): one O(compression)
    partial per block, tree-merged — the scale path for unbounded domains
    where exact value-counts quantiles would shuffle every distinct double.
    Deliberately oracle-free (approximate); accuracy pinned in tests
    against numpy on the same data."""
    from ..functions.rounding import round_half_away
    from ..functions.sketches import tdigest_quantiles

    ds = _read(sf_dir, "events", ["value"])
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = tdigest_quantiles(ds, "value", qs, compression=200)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value_est": pa.array(
            round_half_away(np.array([est[q] for q in qs]), 4), pa.float64()),
    })


def q_length_percentile_rank(sf_dir: str):
    """Global rank WITHOUT a global sort: CUME_DIST of every document's
    length via a broadcast CDF — one distinct-value counts pass (bounded by
    |distinct lengths|), cumsum on the driver, then a vectorized
    searchsorted gather per batch. The 100-TB way to percentile-normalize a
    feature column."""
    from ..functions.quantiles import value_counts_ds
    from ..functions.rounding import round_half_away

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    counts = value_counts_ds(docs, "n_chars").to_pandas().sort_values("value")
    values = counts["value"].to_numpy(dtype="int64")
    cum = np.cumsum(counts["n"].to_numpy(dtype="int64"))
    total = float(cum[-1]) if len(cum) else 1.0

    def rank(batch: pa.Table) -> pa.Table:
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(values, n_chars, side="right") - 1
        cd = cum[pos] / total
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": batch.column("n_chars"),
            "cume_dist": pa.array(round_half_away(cd, 6), pa.float64()),
        })

    return _sorted_table(docs.map_batches(rank, batch_format="pyarrow"),
                         ["doc_id"])


def q_orders_pushdown_count(sf_dir: str):
    """Predicate pushdown AT THE READ: the date+price filter ships into
    read_parquet as a pyarrow dataset expression, so row groups that can't
    match never leave storage — only the two projected columns of the
    surviving rows enter the pipeline. One count groupby after."""
    import pyarrow.dataset as pads
    import ray.data

    from ray.data.aggregate import Count

    cutoff = np.datetime64("2000-01-01", "us")
    expr = (pads.field("o_orderdate") >= pa.scalar(cutoff)) & (
        pads.field("o_totalprice") > 300_000.0
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
        filter=expr,
    )
    agg = (
        ds.select_columns(["o_orderpriority"])
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )
    return _sorted_table(agg, ["o_orderpriority"])


def q_length_histogram(sf_dir: str):
    """Binned aggregation: documents histogrammed by 50-char n_chars bucket.
    The bucket id is derived vectorized per batch and pre-counted per block
    (combiner), so the one groupby shuffles (bucket, n) partial rows only."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False)
        bucket = (n_chars // 50).astype(np.int64)
        t = pa.table({"bucket": pa.array(bucket, pa.int64()),
                      "n_part": pa.array(np.ones(len(bucket), np.int64))})
        g = t.group_by("bucket").aggregate([("n_part", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "n_part": g.column("n_part_sum")})

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
    return _sorted_table(agg, ["bucket"])


def q_supplier_count_by_region(sf_dir: str):
    """Dimension-chain broadcast join: supplier ⋈ nation ⋈ region →
    suppliers per region."""
    import pandas as pd

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    merged = supplier.merge(nation, left_on="s_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    out = (
        merged.groupby("r_name", as_index=False)
        .agg(n_suppliers=("s_suppkey", "count"))
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    return out


def q_part_type_stats(sf_dir: str):
    """Groupby over part: count + mean retail price per type."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])
    agg = ds.groupby("p_type").aggregate(
        Count(alias_name="n_parts"), Sum("p_retailprice", alias_name="sum_price")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        mean = pc.divide(batch.column("sum_price"),
                         pc.cast(batch.column("n_parts"), pa.float64()))
        return pa.table(
            {
                "p_type": batch.column("p_type"),
                "n_parts": batch.column("n_parts"),
                "avg_price": _round(mean, 2),
            }
        )

    return _sorted_table(agg.map_batches(finalize, batch_format="pyarrow"), ["p_type"])


def q_events_tumbling(sf_dir: str):
    """Tumbling one-hour windows per event_type: count + sum(value) — the
    streaming-shaped workload as groupby over (type, window)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def window(batch: pa.Table) -> pa.Table:
        epoch_us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        # FLOOR division (np.floor_divide), not pc.divide's truncation toward
        # zero: the oracle's FLOOR(EPOCH(ts)/3600) floors pre-1970 timestamps
        # to the EARLIER window
        hour = np.floor_divide(epoch_us, 3_600_000_000)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": pa.array(hour, pa.int64()),
                "value": batch.column("value"),
            }
        )

    agg = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": batch.column("hour"),
                "n": batch.column("n"),
                "sum_value": _round(batch.column("sum_value"), 4),
            }
        )

    return _sorted_table(agg.map_batches(finalize, batch_format="pyarrow"), ["event_type", "hour"])


def q_events_hopping(sf_dir: str):
    """Hopping (sliding) windows: 1-hour windows every 15 minutes — each
    event lands in exactly 4 windows. The streaming-engine op Ray Data
    lacks, expressed as a vectorized ×4 explode (np.repeat/tile — no
    per-row loop, output stays 4× the narrow projection) + one groupby;
    window id = floor(epoch/900s) − k, floored like the oracle pre-1970."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        epoch_us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        slot = np.floor_divide(epoch_us, 900_000_000)
        n = len(slot)
        k = np.tile(np.arange(4, dtype=np.int64), n)
        idx = pa.array(np.repeat(np.arange(n), 4))
        return pa.table({
            "event_type": batch.column("event_type").take(idx),
            "win": pa.array(np.repeat(slot, 4) - k, pa.int64()),
            "value": batch.column("value").take(idx),
        })

    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "win": batch.column("win"),
            "n": batch.column("n"),
            "sum_value": _round(batch.column("sum_value"), 4),
        })

    return _sorted_table(
        agg.map_batches(finalize, batch_format="pyarrow"),
        ["event_type", "win"])


def _props_k(batch: pa.Table) -> list:
    """The ONE home of the events.props '$.k' extraction contract: None for
    a null props or a missing key — exactly what the oracles'
    CAST(json_extract_string(props, '$.k') AS BIGINT) yields."""
    import json as _json

    return [
        _json.loads(props).get("k") if props else None
        for props in batch.column("props").to_pylist()
    ]


def q_pagerank(sf_dir: str):
    """Iterative graph computation (functions/graph.py pagerank_units):
    2 supersteps of integer fixed-point PageRank over the user → props.k
    bipartite event graph (k-nodes offset by 100000). Each superstep is one
    distributed hash_join + one groupby; int64 arithmetic makes the
    ITERATIVE algorithm bit-exactly oracled — integer sums commute, so the
    result is identical across any shuffle order."""
    from ..functions import graph

    ds = _read(sf_dir, "events", ["user_id", "props"])

    def edges(batch: pa.Table) -> pa.Table:
        # null props / missing k drop the edge, matching the oracle's
        # NULL-propagating CAST + join semantics
        ks = _props_k(batch)
        keep = [i for i, k in enumerate(ks) if k is not None]
        return pa.table({
            # typed index array: a bare [] is null-typed and array_take has
            # no (int64, null) kernel — an all-null-props batch would crash
            "src": batch.column("user_id").take(
                pa.array(keep, pa.int64())).cast(pa.int64()),
            "dst": pa.array([100000 + ks[i] for i in keep], pa.int64()),
        })

    ranks = graph.pagerank_units(
        ds.map_batches(edges, batch_format="pyarrow"), n_iter=2)
    return _sorted_table(ranks, ["node"])


def q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank (functions/graph.personalized_pagerank_units):
    restart mass concentrated on a seed trust list (user ids divisible by
    50 — driver-small, the shape of every real reputation seed list) over
    the same user → props.k bipartite event graph as pagerank. Same
    integer fixed-point contract, seed-aware base/init; the oracle unrolls
    both supersteps with a seeds CTE."""
    from ..functions import graph

    ds = _read(sf_dir, "events", ["user_id", "props"])

    def edges(batch: pa.Table) -> pa.Table:
        ks = _props_k(batch)
        keep = [i for i, k in enumerate(ks) if k is not None]
        return pa.table({
            "src": batch.column("user_id").take(
                pa.array(keep, pa.int64())).cast(pa.int64()),
            "dst": pa.array([100000 + ks[i] for i in keep], pa.int64()),
        })

    def seed_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 50 == 0))

    seed_rows = (
        ds.select_columns(["user_id"])
        .map_batches(seed_filter, batch_format="pyarrow")
        .groupby("user_id").count().take_all()
    )
    seeds = sorted(int(r["user_id"]) for r in seed_rows)
    ranks = graph.personalized_pagerank_units(
        ds.map_batches(edges, batch_format="pyarrow"), seeds, n_iter=2)
    return _sorted_table(ranks, ["node"])


def q_hits(sf_dir: str):
    """HITS hubs/authorities (functions/graph.py hits_units): 2 full
    iterations of integer fixed-point sum-normalized HITS over the same
    user → props.k bipartite event graph as pagerank. Each superstep is
    two distributed hash_joins + two node groupbys; the T=10**12 mass
    rescale makes every value an exact integer the SQL restates with
    HUGEINT widening."""
    from ..functions import graph

    ds = _read(sf_dir, "events", ["user_id", "props"])

    def edges(batch: pa.Table) -> pa.Table:
        ks = _props_k(batch)
        keep = [i for i, k in enumerate(ks) if k is not None]
        return pa.table({
            # typed index array: a bare [] is null-typed and array_take has
            # no (int64, null) kernel — an all-null-props batch would crash
            "src": batch.column("user_id").take(
                pa.array(keep, pa.int64())).cast(pa.int64()),
            "dst": pa.array([100000 + ks[i] for i in keep], pa.int64()),
        })

    scores = graph.hits_units(
        ds.map_batches(edges, batch_format="pyarrow"), n_iter=2)
    return _sorted_table(scores, ["node"])


def q_connected_components(sf_dir: str):
    """The engine's distributed min-label/pointer-doubling connected
    components (functions/dedup.py connected_components_ds), DIRECTLY
    oracled for the first time: the user ↔ props.k bipartite graph filtered
    to matching residues mod 5 splits into exactly five components, and the
    DuckDB side reproduces the min-reachable-label fixpoint with a
    recursive CTE."""
    from ..functions import dedup

    ds = _read(sf_dir, "events", ["user_id", "props"])

    def edges(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        raw = _props_k(batch)
        ks = np.array([-1 if k is None else k for k in raw], dtype=np.int64)
        # numpy % is floor-mod; the oracle forces the same with
        # ((x % 5) + 5) % 5 so negative ids agree. k=None rows never match
        # (sentinel -1 % 5 == 4 vs the oracle's NULL comparison dropping
        # the row) — except k≡4 users, so mask Nones explicitly.
        valid = np.array([k is not None for k in raw], dtype=bool)
        mask = valid & ((users % 5) == (ks % 5))
        return pa.table({
            "a": pa.array(users[mask].astype(np.int64), pa.int64()),
            "b": pa.array(100000 + ks[mask], pa.int64()),
        })

    labels = dedup.connected_components_ds(
        ds.map_batches(edges, batch_format="pyarrow"))
    return _sorted_table(labels, ["node"])


def q_events_props_extract(sf_dir: str):
    """Semi-structured extraction: pull ``k`` out of the JSON ``props``
    column (vectorized json parse per batch) and aggregate it per event
    type — the nested-field path of a log pipeline."""
    import json as _json

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_id", "event_type", "props"])

    def extract_k(batch: pa.Table) -> pa.Table:
        ks = [0 if k is None else k for k in _props_k(batch)]
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": pa.array(ks, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(extract_k, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
    )

    # DuckDB SUM(BIGINT) → HUGEINT → pandas float64; match the dtype
    def widen(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("sum_k"),
            "sum_k",
            pc.cast(batch.column("sum_k"), pa.float64()),
        )

    return _sorted_table(agg.map_batches(widen, batch_format="pyarrow"), ["event_type"])


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_type_pivot(sf_dir: str):
    """PIVOT via conditional aggregation: per user, one wide count column
    per event type. Per batch: 0/1 indicator columns + an Arrow group_by
    combiner (one row per distinct user per block), then ONE groupby Sum
    over the wide columns — the classic crosstab without ever shuffling
    raw events or enumerating types on the driver."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    wide = [f"n_{ty}" for ty in _EVENT_TYPES]

    def partials(batch: pa.Table) -> pa.Table:
        cols = {"user_id": batch.column("user_id")}
        for ty, name in zip(_EVENT_TYPES, wide):
            cols[name] = pc.cast(
                pc.equal(batch.column("event_type"), ty), pa.int64()
            )
        combined = pa.table(cols).group_by("user_id").aggregate(
            [(name, "sum") for name in wide]
        )
        # rebuild by name: pyarrow's group_by output column order (keys
        # first vs last) is a version detail we must not depend on
        return pa.table({
            "user_id": combined.column("user_id"),
            **{name: combined.column(f"{name}_sum") for name in wide},
        })

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(name, alias_name=name) for name in wide])
    )
    return _sorted_table(agg, ["user_id"])


def q_events_moving_avg(sf_dir: str):
    """Frame window (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW): per-user
    moving average of ``value`` over the last three events. One hash
    shuffle on user_id, then a vectorized shifted-sum per sorted group —
    the frame never materializes row-by-row. Sum order matches the
    oracle's left-to-right frame walk; ROUND(6) absorbs residual FP
    association drift."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def moving(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = group["value"].to_numpy(dtype="float64")
        n = len(v)
        prev1 = np.concatenate(([0.0], v[:-1]))
        prev2 = np.concatenate(([0.0, 0.0], v[:-2]))
        sum3 = (prev2 + prev1) + v
        cnt = np.minimum(np.arange(n) + 1, 3).astype("float64")
        from ..functions.rounding import round_half_away

        return pd.DataFrame({
            "event_id": group["event_id"],
            "user_id": group["user_id"],
            "avg3": round_half_away(sum3 / cnt, 6),
        })

    out = ds.groupby("user_id").map_groups(moving, batch_format="pandas")
    return _sorted_table(out, ["event_id"])


def q_sales_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): hierarchical totals
    derived by RE-AGGREGATING the finest-grain result (≤ |flag|×|status|
    rows) instead of rescanning lineitem once per level — the one big
    groupby runs exactly once; the coarser levels fold k rows on the
    driver. NULL marks a rolled-up dimension, as in SQL."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    finest = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                   Count(alias_name="n_rows"))
        .to_pandas()
    )
    by_flag = (
        finest.groupby("l_returnflag", as_index=False)
        .agg(sum_qty=("sum_qty", "sum"), n_rows=("n_rows", "sum"))
    )
    by_flag["l_linestatus"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "sum_qty": [finest["sum_qty"].sum()],
        "n_rows": [finest["n_rows"].sum()],
    })
    out = pd.concat([finest, by_flag, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
    ]
    from ..functions.rounding import round_half_away

    # quantities are integral doubles — every level's sum is exact; round
    # like the oracle's ROUND(SUM(...), 0)
    out["sum_qty"] = round_half_away(out["sum_qty"].to_numpy(), 0)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    ).reset_index(drop=True)


def q_events_lag_gap(sf_dir: str):
    """Partition-sorted window function: per user, the gap (µs) since their
    previous event — ``groupby(user).map_groups`` over ts-sorted groups, the
    guide's streaming-shaped pattern (events = an ordered, partitioned log).
    Deterministic tie-break by event_id; first event per user → -1."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def lag_gap(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # exact integer microseconds, unit-pinned (float total_seconds()
        # loses µs on multi-day gaps; a bare int64 view depends on the
        # datetime64 unit pandas happened to choose)
        ts_us = group["ts"].astype("datetime64[us]").astype("int64")
        gap = (ts_us - ts_us.shift(1)).fillna(-1).astype("int64")
        return pd.DataFrame(
            {"event_id": group["event_id"], "user_id": group["user_id"], "gap_us": gap}
        )

    out = ds.groupby("user_id").map_groups(lag_gap, batch_format="pandas")
    return _sorted_table(out, ["event_id"])


def q_events_sessionize(sf_dir: str):
    """Gap-based sessionization per user (session break when > 30 min since
    the previous event): per-user sorted map_groups assigns session ids by
    cumulative gap flags; output = events per (user, session). The session-
    window analogue of the tumbling query, oracle via SQL window functions."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts_us = group["ts"].astype("datetime64[us]").astype("int64")
        new_session = (ts_us - ts_us.shift(1)).fillna(gap_us + 1) > gap_us
        # float64: DuckDB's windowed SUM(CASE...) is HUGEINT → pandas float64
        session_id = (new_session.cumsum() - 1).astype("float64")
        out = (
            pd.DataFrame({"user_id": group["user_id"], "session_id": session_id})
            .groupby(["user_id", "session_id"], as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")
    return _sorted_table(out, ["user_id", "session_id"])


def q_events_asof_join(sf_dir: str):
    """As-of join (the temporal operator Ray Data lacks, built per SURVEY §2:
    one hash shuffle on the by-key + vectorized searchsorted merge per
    group): every purchase matched to the user's LATEST view at-or-before
    it; oracled by DuckDB's native ASOF JOIN."""
    from ..functions.joins import asof_join

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def purchases(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        return pa.table(
            {
                "event_id": kept.column("event_id"),
                "user_id": kept.column("user_id"),
                "ts": kept.column("ts"),
            }
        )

    def views(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("event_type"), "view"))
        # the right side's join time must ALSO travel as payload (view_ts)
        # so the gap is computable after the merge
        return pa.table(
            {
                "user_id": kept.column("user_id"),
                "ts": kept.column("ts"),
                "view_event_id": kept.column("event_id"),
                "view_ts": kept.column("ts"),
            }
        )

    joined = asof_join(
        ds.map_batches(purchases, batch_format="pyarrow"),
        ds.map_batches(views, batch_format="pyarrow"),
        by="user_id",
        on="ts",
        right_suffix="",
    )

    def finalize(batch: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(batch.column("ts"), pa.int64()),
            pc.cast(batch.column("view_ts"), pa.int64()),
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "view_event_id": batch.column("view_event_id"),
                "gap_us": gap,
            }
        )

    return _sorted_table(joined.map_batches(finalize, batch_format="pyarrow"), ["event_id"])


def q_events_range_count(sf_dir: str):
    """Range (band) join as a count: per purchase, the user's clicks within
    ±30 minutes — same shuffle-once searchsorted plan; oracled by an explicit
    interval-predicate LEFT JOIN."""
    import numpy as np

    from ..functions.joins import range_join_count

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def purchases(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        return pa.table(
            {
                "event_id": kept.column("event_id"),
                "user_id": kept.column("user_id"),
                "ts": kept.column("ts"),
            }
        )

    def clicks(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("event_type"), "click"))
        return pa.table(
            {"user_id": kept.column("user_id"), "ts": kept.column("ts")}
        )

    window = np.timedelta64(30, "m")
    joined = range_join_count(
        ds.map_batches(purchases, batch_format="pyarrow"),
        ds.map_batches(clicks, batch_format="pyarrow"),
        by="user_id", on="ts", before=window, after=window,
        count_name="n_clicks",
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": batch.column("event_id"), "n_clicks": batch.column("n_clicks")}
        )

    return _sorted_table(joined.map_batches(finalize, batch_format="pyarrow"), ["event_id"])


def q_winnow_pairs(sf_dir: str):
    """Rolling-hash (winnowing) passage-overlap pairs, exactly oracled
    since round 4's final session: the oracle rebuilds the Rabin-Karp
    char-8-gram hash mod 2^64 in HUGEINT (base 257 — the engine's
    inverse-power prefix trick is algebraically the direct sum, so the SQL
    computes the plain Σ code·257^(7-j)), window-4 minima (the rightmost
    tie RULE affects only which position is picked, never the picked VALUE
    set), the 63-bit mask, the per-fingerprint 64-doc cap via ROW_NUMBER,
    and the shared-count threshold."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.winnow_overlap_pairs(ds, min_shared=25)


def q_top_users(sf_dir: str):
    """Grouped count + deterministic top-k (sort desc with tie-break)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id"])
    agg = ds.groupby("user_id").aggregate(Count(alias_name="n"))
    top = agg.sort(["n", "user_id"], descending=[True, False]).limit(20)
    return top.to_pandas()


def q_distinct_segments(sf_dir: str):
    """Distinct values (shuffle-dedup)."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    values = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(values, pa.string())})


# ---------------------------------------------------------------------------
# training-data ops (documents / embeddings)


def q_top_tokens(sf_dir: str):
    """Heavy hitters, exactly: explode text to tokens with PARTIAL per-batch
    counts (the combiner pattern — the groupby shuffles (token, count) rows,
    never raw tokens), then a small groupby + deterministic top-20."""
    import collections

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts: collections.Counter = collections.Counter()
        for text in batch.column("text").to_pylist():
            counts.update(text.split())
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = agg.sort(["n", "token"], descending=[True, False]).limit(20)
    return top.to_pandas()


def q_bpe_pair_counts(sf_dir: str):
    """BPE tokenizer training, first census: corpus-wide counts of adjacent
    character pairs inside words (functions/textstats.bpe_pair_count_partials
    — utf-32 codepoint-array vectorization, one distinct-pair row per block),
    one vocabulary-sized groupby, deterministic top-50 merge candidates."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])
    agg = (
        ds.map_batches(textstats.bpe_pair_count_partials, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    top = agg.sort(["n", "pair"], descending=[True, False]).limit(50)
    return top.to_pandas()


def q_top_tokens_per_lang(sf_dir: str):
    """GROUPED heavy hitters: top-5 tokens per language. Per-batch (lang,
    token, n) partial counts (vectorized polars explode+group — the RE2
    whitespace class [\\t\\n\\f\\r ] spelled explicitly so rust-regex and
    RE2 agree on non-ASCII spaces), one groupby over partial rows (never
    raw tokens), then a per-lang map_groups top-k with the deterministic
    (n desc, token asc) order the oracle's ROW_NUMBER states."""
    import pandas as pd
    import polars as pl
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        frame = pl.from_arrow(batch)
        out = (
            frame.with_columns(
                pl.col("text").str.extract_all(r"[^\t\n\f\r ]+")
                .alias("token"))
            .explode("token")
            .drop_nulls("token")
            .group_by(["lang", "token"]).len(name="n")
        )
        return pa.table({
            "lang": pa.array(out["lang"].to_list(), pa.string()),
            "token": pa.array(out["token"].to_list(), pa.string()),
            "n": pa.array(out["n"].to_list(), pa.int64()),
        })

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(["n", "token"], ascending=[False, True],
                                kind="mergesort").head(5)
        out = out.reset_index(drop=True)
        out["rank"] = out.index + 1
        return out[["lang", "token", "n", "rank"]]

    result = agg.groupby("lang").map_groups(topk, batch_format="pandas")
    return _sorted_table(result, ["lang", "rank"])


def q_approx_top_tokens(sf_dir: str):
    """Count-Min-sketch heavy hitters: approximate top-20 tokens — the
    sketch-shuffle variant of top_tokens (d×w counters per batch instead of
    per-token rows). Accuracy vs the exact top-k is pinned in tests;
    rows-only here (approximate by design)."""
    from ..functions.sketches import cms_heavy_hitters

    ds = _read(sf_dir, "documents", ["text"])

    def tokens(batch: pa.Table):
        for text in batch.column("text").to_pylist():
            yield from text.split()

    top = cms_heavy_hitters(ds, tokens, k=20)
    return pa.table(
        {
            "token": pa.array([k for k, _ in top], pa.string()),
            "approx_n": pa.array([n for _, n in top], pa.int64()),
        }
    )


def q_approx_distinct_tokens(sf_dir: str):
    """HyperLogLog distinct-token count: one 4 KB sketch per batch merged on
    the driver (approximate by design — accuracy vs exact COUNT DISTINCT is
    pinned in tests; rows-only here)."""
    from ..functions.sketches import hll_distinct

    ds = _read(sf_dir, "documents", ["text"])

    def tokens(batch: pa.Table):
        for text in batch.column("text").to_pylist():
            yield from text.split()

    estimate = hll_distinct(ds, tokens, b=12)
    return pa.table({"approx_distinct_tokens": pa.array([int(round(estimate))], pa.int64())})


def q_dedup_exact(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(dedup.exact_dedup(ds), ["content_hash"])


def q_doc_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.fingerprint_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_token_count(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.token_count_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_token_count_bpe(sf_dir: str):
    """BPE-ish pretokenizer counts (same RE2-compatible regex as the oracle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.bpe_token_count_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_train_prep(sf_dir: str):
    """The composed end-to-end pipeline (pipelines/train_prep): extract →
    C4 gate → exact dedup (semi join) → MinHash near-dedup (anti join) →
    packed-sequence assignment. Fully oracled (VERDICT round 3 #6): the
    extraction stage round-trips text verbatim on this fixture (pinned by
    extract_text's hash-green oracle), the gate/dedup/pack stages are each
    SQL-expressible, and the near-dedup stage provably equals all-pairs
    exact Jaccard + transitive closure here because LSH is candidate
    generation ahead of an exact verify (parity asserted in
    tests/test_queries_oracle_parity.py)."""
    from .train_prep import train_prep

    out = train_prep(sf_dir, seq_len=128)
    return _sorted_table(out, ["doc_id"])


def q_pack_sequences(sf_dir: str):
    """Fixed-length training-sequence packing (functions/packing.py): token
    counts via the shared tokenizer, then a distributed prefix-sum in
    doc_id order (range-bucketed two-level scan — driver holds n_buckets
    rows, never corpus rows) assigns each doc its slice of the packed
    seq_len=512 stream (1 separator token per doc)."""
    from ..functions import packing

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counted = ds.map_batches(textstats.token_count_batch,
                             batch_format="pyarrow").drop_columns(["n_chars"])
    packed = packing.pack_sequences(counted, "doc_id", "n_tokens",
                                    seq_len=512, doc_sep=1, n_buckets=64)
    return _sorted_table(packed, ["doc_id"])


def q_bigram_lm_score(sf_dir: str):
    """Conditional bigram-LM quality scoring (functions/textstats.py
    bigram_lm_scores): Laplace-smoothed p(w2|w1) under the corpus's own
    bigram counts, mean log-prob per doc. Join-only plan — a bigram
    vocabulary is never broadcastable, so counts stay distributed through
    two union-equijoins; only the distinct-token count V reaches the
    driver."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(textstats.bigram_lm_scores(ds), ["doc_id"])


def q_shard_manifest(sf_dir: str):
    """Size-balanced output-shard planning (functions/packing.py
    shard_manifest): docs concatenated in doc_id order open a new 16 KiB
    shard whenever the running n_chars total crosses the boundary —
    the manifest a resumable partitioned writer consults. Same two-level
    scan as pack_sequences plus one shard-keyed groupby; the oracle
    restates the running total with SUM() OVER."""
    from ..functions import packing

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    manifest = packing.shard_manifest(ds, "doc_id", "n_chars",
                                      shard_size=16384, n_buckets=64)
    return _sorted_table(manifest, ["shard"])


def q_token_offsets(sf_dir: str):
    """The distributed prefix-sum scan by itself (functions/packing.py
    prefix_offsets, no separator): each doc's exclusive cumulative token
    offset in doc_id order — oracled against a SUM() OVER window."""
    from ..functions import packing

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counted = ds.map_batches(textstats.token_count_batch,
                             batch_format="pyarrow").drop_columns(["n_chars"])
    out = packing.prefix_offsets(counted, "doc_id", "n_tokens", n_buckets=64)
    return _sorted_table(out, ["doc_id"])


def q_chunk_spans(sf_dir: str):
    """Sliding-window chunking (functions/packing.py chunk_spans): 32-token
    chunks advancing 24 tokens (8-token overlap — sized so the synthetic
    docs produce real multi-chunk overlap chains) — the RAG /
    context-window op. One streaming pass, no shuffle; oracled against a
    per-doc generate-series expansion."""
    from ..functions import packing

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counted = ds.map_batches(textstats.token_count_batch,
                             batch_format="pyarrow").drop_columns(["n_chars"])
    out = packing.chunk_spans(counted, "doc_id", "n_tokens",
                              chunk_len=32, overlap=8)
    return _sorted_table(out, ["doc_id", "chunk_id"])


def q_source_quality_filter(sf_dir: str):
    """Source-level curation (functions/sampling.py group_mean_filter):
    per-source MEAN alpha-ratio (summed as integer micros so the group sum
    is shuffle-order-free), sources below 0.822 dropped wholesale — the
    RefinedWeb-style domain-quality gate. Fully oracled."""
    from ..functions import sampling

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def micros(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).cast(pa.float64())
        n_alpha = pc.count_substring_regex(text, "[A-Za-z]").cast(pa.float64())
        safe = pc.max_element_wise(n_chars, pa.scalar(1.0))
        alpha6 = _round(pc.divide(n_alpha, safe), 6).to_numpy(
            zero_copy_only=False)
        from ..functions.rounding import round_half_away

        am = round_half_away(alpha6 * 1000000.0, 0).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "alpha_micros": pa.array(am, pa.int64()),
        })

    tagged = sampling.group_mean_filter(
        ds.map_batches(micros, batch_format="pyarrow"),
        "source", "alpha_micros", threshold=0.822)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "source_mean_alpha": batch.column("group_mean"),
            "keep": batch.column("keep"),
        })

    return _sorted_table(tagged.map_batches(finalize, batch_format="pyarrow"),
                         ["doc_id"])


def q_stopword_stats(sf_dir: str):
    """Stopword-ratio quality signal (fixed 10-word list, oracled)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.stopword_stats_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_quality_score(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.quality_score_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_repetition_stats(sf_dir: str):
    """Gopher-style duplicate-bigram fraction per document — the repetition
    quality filter of a web-text pipeline."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.repetition_stats_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_length_filter(sf_dir: str):
    """Length-window quality filter: documents kept per lang when their char
    count lies in [200, 1500] — the simplest C4-ish cut, as filter+groupby."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def keep(batch: pa.Table) -> pa.Table:
        length = pc.utf8_length(batch.column("text"))
        mask = pc.and_(
            pc.greater_equal(length, pa.scalar(200)),
            pc.less_equal(length, pa.scalar(1500)),
        )
        return pa.table({"lang": batch.filter(mask).column("lang")})

    agg = ds.map_batches(keep, batch_format="pyarrow").groupby("lang").aggregate(
        Count(alias_name="n_kept")
    )
    return _sorted_table(agg, ["lang"])


def q_lang_distribution(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang"])
    agg = ds.groupby("lang").aggregate(Count(alias_name="n"))
    return _sorted_table(agg, ["lang"])


def q_langid(sf_dir: str):
    """Heuristic language ID (stopword profiles). Oracled: the scorer is
    integer substring counts ÷ token count with a deterministic argmax, so
    ORACLE_SQL restates it exactly (generated from the same profiles)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(textstats.langid_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_more_like_this(sf_dir: str):
    """Sparse tf-idf retrieval with documents as queries
    (functions/corpusstats.more_like_this): for probes {0, 100, 250}, the
    top-10 other docs by the tf-idf dot product over shared tokens —
    integer-micros per-term contributions (bm25 convention) so sums are
    order-free and the oracle's ROW_NUMBER ranking is bit-equal."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = corpusstats.more_like_this(ds, probe_ids=[0, 100, 250], k=10)
    return _sorted_table(out, ["probe_doc", "rank"])


def q_phrase_search(sf_dir: str):
    """Positional phrase query (functions/corpusstats.phrase_search): exact
    occurrence counts of the token phrase "batch batch" per document via
    anchor-vote decomposition — overlapping matches count, hit-sized
    shuffles only. The duplicated token exercises the multi-slot vote path
    (one scan emits both slots' anchors)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = corpusstats.phrase_search(ds, ["batch", "batch"])
    return _sorted_table(out, ["doc_id"])


def q_pmi_collocations(sf_dir: str):
    """PMI collocations (functions/corpusstats.pmi_collocations): combiner
    partials → two corpus groupbys → min_count filter → hash-partitioned
    unigram equijoins → integer-quantized PMI, deterministic top-50. The
    oracle restates the bigram/unigram exploding and the exact FLOOR(1e6·LN)
    arithmetic."""
    from ..functions.corpusstats import pmi_collocations

    ds = _read(sf_dir, "documents", ["text"])
    out = pmi_collocations(ds, min_count=5, k=50)
    return out.select_columns(["w1", "w2", "n_pair", "pmi_q"])


def q_ngram_novelty(sf_dir: str):
    """WiMBD-style per-document 3-gram novelty
    (functions/corpusstats.ngram_novelty): fraction of each doc's distinct
    word 3-grams that appear in no other document. Distinct gram rows →
    vectorized df aggregate → bucketed hash_join → per-doc fold."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = corpusstats.ngram_novelty(ds, n=3)
    return _sorted_table(out, ["doc_id"])


def q_cdx_index(sf_dir: str):
    """CDX capture index (sources/warc.cdx_index): SURT key via the real
    WHATWG canonicalizer + host reversal (frontier/canon.surt_key), MD5
    payload digest, byte length, globally sorted by (surt, ts). URLs and
    timestamps are synthesized deterministically from doc_id/source/lang,
    so the oracle predicts the SURT from the page construction — the
    generative-oracle style of boilerplate/extract_text."""
    from ..sources.warc import cdx_index

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        urls = [f"https://{s}.{l}.example.org/doc/{d}?v=1"
                for d, l, s in zip(doc_ids, langs, sources)]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts": pa.array([1700000000 + int(d) for d in doc_ids],
                               pa.int64()),
                "html": batch.column("text"),
            }
        )

    out = cdx_index(ds.map_batches(pages, batch_format="pyarrow"),
                    url_col="url", ts_col="ts", payload_col="html")
    return _sorted_table(out, ["surt", "ts"])


def q_data_split(sf_dir: str):
    """Deterministic train/val/test assignment
    (functions/sampling.split_assign): md5(salt || doc_id) fraction lands
    in cumulative 80/10/10 thresholds — stable under corpus growth, zero
    shuffle. The oracle recomputes the identical integer thresholds
    (3435973836 / 3865470566 = floor(0.8·16^8) / floor(0.9·16^8))."""
    from ..functions import sampling

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = sampling.split_assign(
        ds, key="doc_id",
        fractions=[("train", 0.8), ("val", 0.1), ("test", 0.1)],
        salt="split1")
    return _sorted_table(out.select_columns(["doc_id", "split"]), ["doc_id"])


def q_capture_dedup(sf_dir: str):
    """Capture-dedup audit (sources/warc.cdx_dedup_stats) over a CDX index
    built by cdx_index: two synthesized captures per document (the second
    100 s later, with changed payload for doc_id % 3 == 0) → per-SURT
    capture count, DISTINCT payload versions and latest timestamp —
    aggregate-only, no per-group Python."""
    from ..sources.warc import cdx_dedup_stats, cdx_index

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def captures(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        urls, ts, payloads = [], [], []
        for d, l, s, t in zip(doc_ids, langs, sources, texts):
            url = f"https://{s}.{l}.example.org/doc/{d}?v=1"
            urls += [url, url]
            ts += [1700000000 + int(d), 1700000000 + int(d) + 100]
            payloads += [t, t + " v2" if int(d) % 3 == 0 else t]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts": pa.array(ts, pa.int64()),
                "html": pa.array(payloads, pa.string()),
            }
        )

    cdx = cdx_index(ds.map_batches(captures, batch_format="pyarrow"),
                    url_col="url", ts_col="ts", payload_col="html")
    return _sorted_table(cdx_dedup_stats(cdx), ["surt"])


def q_robots_gate(sf_dir: str):
    """Offline robots-compliance audit (frontier/robots.robots_gate): the
    production RFC 9309 + Google-semantics matcher evaluates synthesized
    URLs against per-host robots.txt — longest-match precedence, Allow on
    ties, group selection past a decoy user-agent group. Rules are kept
    prefix-only so the oracle can restate precedence with LIKE prefixes."""
    from ..frontier.robots import robots_gate

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    paths = ["/private/x", "/private/ok/x", "/tmp", "/pub/x"]
    robots = (
        "User-agent: decoy-bot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
        "Disallow: /tmp\n"
    )

    def pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        urls = [
            f"https://{s}.{l}.example.org{paths[int(d) % 4]}{d}"
            for d, l, s in zip(doc_ids, langs, sources)
        ]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    # per-origin robots map from the corpus's own (source, lang) dimension
    # — ~100 origins, the small broadcast side every robots cache is
    host_rows = (ds.select_columns(["source", "lang"])
                 .groupby(["source", "lang"]).count().take_all())
    hosts = {f"https://{r['source']}.{r['lang']}.example.org"
             for r in host_rows}
    out = robots_gate(ds.map_batches(pages, batch_format="pyarrow"),
                      {h: robots for h in hosts})
    return _sorted_table(out.select_columns(["doc_id", "url", "allowed"]),
                         ["doc_id"])


def q_dom_stats(sf_dir: str):
    """DOM tree-shape stats (functions/domstats.dom_tree_stats) computed by
    the production HTML5 tree builder over generatively-constructed pages:
    doc_id % 4 + 1 nav links, doc_id % 3 nested divs, the document text in
    one <pre>. The oracle predicts element count / depth / link count from
    the construction and pre_chars from LENGTH(text) (minus the HTML5
    pre-leading-newline drop) — parser bugs break the prediction."""
    import html as _html

    from ..functions.domstats import dom_tree_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pages(batch: pa.Table) -> pa.Table:
        out_ids, htmls = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            k = int(d) % 4 + 1
            e = int(d) % 3
            links = "".join(f'<a href="/l{i}">l</a>' for i in range(k))
            nested = "<div>" * e + "<span>x</span>" + "</div>" * e
            htmls.append(
                f"<html><head><title>doc-{d}</title></head><body>"
                f"<nav>{links}</nav>{nested}"
                f"<pre>{_html.escape(t, quote=False)}</pre></body></html>")
            out_ids.append(int(d))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "html": pa.array(htmls, pa.string())})

    out = dom_tree_stats(ds.map_batches(pages, batch_format="pyarrow"))
    return _sorted_table(out, ["doc_id"])


def q_warc_extract(sf_dir: str):
    """WARC round trip through the archive format itself: synthesized MHTML
    pages → write_warc response shards (gzip members, deterministic
    record ids) → read_warc → the full extraction stage. The oracle is the
    extract_text contract (url/title/text byte round trip), so a hash
    match pins the WARC writer, the record walk, the HTTP envelope strip
    AND extraction end to end."""
    import glob
    import hashlib
    import shutil

    from ..sources.warc import read_warc, write_warc
    from .flagship import extract_pages, pages_from_documents

    import os

    # pid in the path: concurrent gate processes must not rmtree each
    # other's shards mid-read (the result Dataset is lazy — files must
    # outlive this function)
    out_dir = "/tmp/mhtml_ray_gate_warc_" + hashlib.sha1(
        f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)
    pages = pages_from_documents(f"{sf_dir}/documents.parquet")
    write_warc(pages, out_dir, ts_col="warc_ts",
               content_type="multipart/related")
    archive = read_warc(sorted(glob.glob(f"{out_dir}/*.warc.gz")))
    ds = extract_pages(archive, keep_html=False).select_columns(
        ["url", "title", "text_out"])
    out = _sorted_table(ds, ["url"])  # eager (to_pandas) — shards now dead
    shutil.rmtree(out_dir, ignore_errors=True)
    return out


def q_url_strip_tracking(sf_dir: str):
    """Tracking-parameter stripping (frontier/canon.strip_tracking): the
    crawl-dedup canonicalization that collapses URLs differing only in
    utm_*/click ids. Even doc_ids carry two tracking params around a real
    one; doc_id % 4 == 1 rows are ALL-tracking (the '?' must drop); the
    rest have a clean query that must survive untouched."""
    from ..frontier.canon import strip_tracking

    ds = _read(sf_dir, "documents", ["doc_id"])

    def rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = []
        for d in ids:
            d = int(d)
            if d % 4 == 0:
                urls.append(f"https://t.example.org/p/{d}"
                            f"?utm_source=news&page={d}&gclid=g{d}")
            elif d % 4 == 1:
                urls.append(f"https://t.example.org/p/{d}?fbclid=f{d}")
            else:
                urls.append(f"https://t.example.org/p/{d}?page={d}")
        out = [strip_tracking(u) for u in urls]
        return pa.table({"doc_id": pa.array([int(i) for i in ids], pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "canon": pa.array(out, pa.string())})

    return _sorted_table(ds.map_batches(rows, batch_format="pyarrow"),
                         ["doc_id"])


def q_token_budget_sample(sf_dir: str):
    """Token-budget mixture selection (functions/sampling.
    token_budget_sample): per source, documents admit in deterministic
    md5 order until 20k tokens are reached — mixtures specified in tokens,
    the way training runs actually consume them. The oracle restates the
    running sum with a 1-PRECEDING window frame."""
    from ..functions import sampling

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = sampling.token_budget_sample(ds, budget_tokens=20000)
    return _sorted_table(out, ["key"])


def q_simhash_blocks(sf_dir: str):
    """SimHash values, exactly oracled (functions/dedup.SimHashBatch): the
    64-bit signature emitted as its four 16-bit blocking quarters — the
    first exact SQL pin of the simhash kernel (dedup_simhash's PAIR output
    stays rows-only). The oracle rebuilds the little-endian md5 token
    hash in HUGEINT, per-bit majority counts, the byte-internal bit
    permutation, and the quarter packing."""
    from ..functions.dedup import SimHashBatch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def blocks(batch: pa.Table) -> pa.Table:
        out = SimHashBatch()(batch)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "block0": out.column("block0").cast(pa.int64()),
                "block1": out.column("block1").cast(pa.int64()),
                "block2": out.column("block2").cast(pa.int64()),
                "block3": out.column("block3").cast(pa.int64()),
            }
        )

    return _sorted_table(ds.map_batches(blocks, batch_format="pyarrow"),
                         ["doc_id"])


def q_langid_confusion(sf_dir: str):
    """Language-ID evaluation matrix: labeled lang × predicted lang counts —
    the standard agreement/confusion audit a curation pipeline runs before
    trusting a language filter. One scorer pass (lang rides along the
    batch), one groupby; the oracle wraps the generated langid restatement
    in a GROUP BY against the labels."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        out = textstats.langid_batch(batch)
        return out.append_column("lang", batch.column("lang"))

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Count(alias_name="n"))
    )
    return _sorted_table(out, ["lang", "pred_lang"])


def q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup clusters. Oracled: the keep decision is exact
    Jaccard over the LSH candidates, so (at these band settings) the result
    equals the oracle's all-pairs Jaccard + transitive closure — parity
    pinned in tests/test_queries_oracle_parity.py."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.minhash_dedup(ds, threshold=0.8)


def q_dedup_cluster_sizes(sf_dir: str):
    """Dedup audit: the cluster-size distribution of the minhash near-dup
    clustering — the first thing an operator checks after a dedup run (a
    giant component means the threshold or shingling is wrong). Two
    count-groupbys over the (doc_id, cluster_id) Dataset; the oracle wraps
    the dedup_minhash closure in the same double aggregation."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    clusters = dedup.minhash_dedup(ds, threshold=0.8)

    from ray.data.aggregate import Count

    sizes = (
        clusters.groupby("cluster_id").aggregate(Count(alias_name="size"))
        .groupby("size").aggregate(Count(alias_name="n_clusters"))
    )

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table({
            "size": batch.column("size").cast(pa.int64()),
            "n_clusters": batch.column("n_clusters").cast(pa.int64()),
        })

    return _sorted_table(
        sizes.map_batches(widen, batch_format="pyarrow"), ["size"])


def q_dedup_simhash(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_pairs(ds, max_hamming=3)


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard over LSH candidates. Oracled against all-pairs
    Jaccard in SQL (same exactness argument as dedup_minhash)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.ngram_jaccard_pairs(ds, threshold=0.5)


def _first_embedding(sf_dir: str):
    import pyarrow.parquet as pq

    table = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = pc.index(table.column("vec_id"), pa.scalar(0, pa.int64())).as_py()
    idx = idx if idx >= 0 else 0
    return table.column("embedding")[idx].as_py()


def q_embedding_topk(sf_dir: str):
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.brute_force_topk(ds, _first_embedding(sf_dir), k=10)


def q_embedding_ann(sf_dir: str):
    """LSH-bucketed ANN top-10 (the scale path; recall vs brute force is
    asserted in tests — approximate by design, so no SQL oracle)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.lsh_topk(ds, _first_embedding(sf_dir), k=10, bits=6)


def q_embedding_ivf(sf_dir: str):
    """IVF ANN top-10 (coarse-quantizer scale path; approximate by design —
    recall vs brute force asserted in tests, rows-only here)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.ivf_topk(ds, _first_embedding(sf_dir), k=10, n_centroids=16, nprobe=4)


def q_embedding_ivf_indexed(sf_dir: str):
    """Persisted partitioned IVF: build the index (one Parquet partition per
    inverted list under /tmp), then query it reading ONLY the nprobe matching
    partitions — the 10^10-vector path where a query must not rescan the
    corpus. Equality with the scan-based ivf_topk is pinned in tests;
    rows-only here (approximate by design)."""
    import tempfile

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    similarity.ivf_build(ds, index_dir, n_centroids=16)
    out = similarity.ivf_query(index_dir, _first_embedding(sf_dir), k=10,
                               nprobe=4)
    if hasattr(out, "to_pandas") and not isinstance(out, pa.Table):
        out = out.to_pandas()  # eager before the index dir disappears
    _rmtree(index_dir)
    return out


def q_embedding_label_stats(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    agg = similarity.label_norm_stats(ds)

    def finalize(batch: pa.Table) -> pa.Table:
        mean = pc.divide(batch.column("sum_norm"), pc.cast(batch.column("n"), pa.float64()))
        return pa.table(
            {
                # int32 like the parquet column (the groupby shuffle widens)
                "label": pc.cast(batch.column("label"), pa.int32()),
                "n": batch.column("n"),
                "mean_norm": _round(mean, 4),
            }
        )

    return _sorted_table(agg.map_batches(finalize, batch_format="pyarrow"), ["label"])


def q_dedup_embedding(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return similarity.cosine_near_dup_pairs(ds, threshold=0.95)


def q_c4_filter(sf_dir: str):
    """Composed C4-style keep/drop pipeline: length window + stopword-ratio
    floor + duplicate-bigram ceiling, with the FIRST failing rule as the
    drop reason. Reuses the vectorized stopword/repetition kernels (whose
    component queries already hash-match their oracles), so the composition
    itself is the only new logic under test."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        sw = textstats.stopword_stats_batch(batch)
        rep = textstats.repetition_stats_batch(batch)
        n_chars = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)
        ratio = sw.column("stopword_ratio").to_numpy(zero_copy_only=False)
        dup = rep.column("dup_bigram_frac").to_numpy(zero_copy_only=False)
        ok_length = (n_chars >= 150) & (n_chars <= 450)
        ok_stop = ratio >= 0.03
        ok_rep = dup <= 0.06
        keep = ok_length & ok_stop & ok_rep
        reasons = np.where(
            ~ok_length, "length", np.where(~ok_stop, "stopwords",
                                           np.where(~ok_rep, "repetition", "")),
        )
        reason_col = pa.array(
            [r if r else None for r in reasons.tolist()], pa.string()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(n_chars, pa.int64()),
                "stopword_ratio": sw.column("stopword_ratio"),
                "dup_bigram_frac": rep.column("dup_bigram_frac"),
                "keep": pa.array(keep, pa.bool_()),
                "drop_reason": reason_col,
            }
        )

    return _sorted_table(ds.map_batches(batch_fn, batch_format="pyarrow"), ["doc_id"])


def q_compression_ratio(sf_dir: str):
    """zlib-ratio redundancy signal (textstats.compression_stats_batch):
    one map_batches pass, zero shuffle. Deliberately oracle-free — DuckDB
    has no zlib — semantics pinned in tests (repetitive ≪ prose)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(
        ds.map_batches(textstats.compression_stats_batch,
                       batch_format="pyarrow"),
        ["doc_id"],
    )


def q_gopher_filter(sf_dir: str):
    """Gopher-rule quality gate (functions/textstats.gopher_stats_batch):
    word-count window + mean-word-length window + symbol-ratio ceiling +
    distinct-stopword floor, first-failing-rule drop reasons — one
    map_batches pass, zero shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(
        ds.map_batches(textstats.gopher_stats_batch, batch_format="pyarrow"),
        ["doc_id"],
    )


def q_lm_score(sf_dir: str):
    """Unigram LM quality scores (functions/textstats.unigram_lm_scores):
    the oracle recomputes the same corpus-unigram mean log-probability in
    SQL — both sides tokenize on ASCII \s+ and take LN of exact n/total."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(textstats.unigram_lm_scores(ds), ["doc_id"])


def q_tfidf_topk(sf_dir: str):
    """Top-5 terms per document by TF-IDF (functions/corpusstats.tfidf_topk):
    distributed df partials → one groupby, df/idf broadcast once, per-batch
    factorize + numpy scoring. The oracle recomputes tf, df and
    ROUND(tf * LN(N/df), 6) with the same ROW_NUMBER tie order
    (tfidf desc, token asc)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(corpusstats.tfidf_topk(ds, k=5), ["doc_id", "rank"])


def q_inverted_index_stats(sf_dir: str):
    """Build the persisted hash-partitioned inverted index under /tmp, then
    audit it: per-token document frequency and total term frequency read
    back OFF THE INDEX (so a hash match proves build round-trips)."""
    import tempfile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="inv_index_")
    corpusstats.build_inverted_index(ds, index_dir, n_partitions=8)
    out = _sorted_table(corpusstats.index_stats(index_dir), ["token"])
    _rmtree(index_dir)  # _sorted_table is eager for Datasets
    return out


def q_token_postings(sf_dir: str):
    """Partition-pruned postings lookup on the persisted inverted index:
    three probe tokens read only their crc32-owning part= dirs; the oracle
    recomputes the same (token, doc_id, tf) rows from the raw text."""
    import tempfile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="inv_index_")
    corpusstats.build_inverted_index(ds, index_dir, n_partitions=8)
    probe = corpusstats.index_lookup(index_dir, ["table", "spark", "window"])
    out = _sorted_table(probe, ["token", "doc_id"])
    _rmtree(index_dir)
    return out


def q_bm25_topk(sf_dir: str):
    """BM25 top-10 docs for a 3-token query, ranked OFF the persisted
    inverted index (functions/corpusstats.bm25_topk): partition-pruned
    postings probe, distributed doc-length hash_join, integer-micros term
    sums (order-independent), deterministic (score desc, doc_id asc) ties.
    The oracle recomputes tf/df/dl/avgdl from raw text with the identical
    float expression tree — a hash match proves index build + pruned probe
    + join + ranking all round-trip."""
    import tempfile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="inv_index_")
    corpusstats.build_inverted_index(ds, index_dir, n_partitions=8)
    out = corpusstats.bm25_topk(index_dir, ["table", "spark", "window"], k=10)
    _rmtree(index_dir)  # bm25_topk returns an eager pyarrow table
    return out


def q_sample_docs(sf_dir: str):
    """Deterministic 10% Bernoulli sample (functions/sampling.py): keep iff
    md5(doc_id)[:8] < hex(0.1 * 16^8) — a pure per-row function, so the
    sample is identical across runs, retries, and engines. No shuffle.
    The oracle evaluates the same md5-prefix predicate in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return _sorted_table(
        sampling.bernoulli_sample(ds, key="doc_id", rate=0.1), ["doc_id"])


def q_sample_stratified(sf_dir: str):
    """Per-language deterministic sampling (corpus rebalancing): en 5%,
    zh 40%, others 20% — one broadcast threshold per stratum, each batch
    filters locally, embarrassingly parallel."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = sampling.stratified_sample(
        ds, key="doc_id", strata_col="lang",
        rates={"en": 0.05, "zh": 0.4}, default_rate=0.2)
    return _sorted_table(out, ["doc_id"])


def q_mixture_sample(sf_dir: str):
    """Target-mixture rebalancing (functions/sampling.py mixture_sample):
    derive per-language acceptance rates from the observed counts so the
    survivors hit weights en .4 / de .2 / es .2 / zh .2 (fr dropped) with
    the binding stratum kept whole, then hash-filter locally. The oracle
    recomputes the identical IEEE-double rate expressions in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = sampling.mixture_sample(
        ds, key="doc_id", strata_col="lang",
        weights={"en": 0.4, "de": 0.2, "es": 0.2, "zh": 0.2}, salt="mix")
    return _sorted_table(out, ["doc_id"])


def q_pii_redact(sf_dir: str):
    """PII scrub over text augmented with deterministic synthetic contact
    strings (the corpus itself is clean, so — like media_decode_real — the
    fixture arithmetic is mirrored in the oracle): docs get an email /
    phone / IPv4 by doc_id residue, the vectorized RE2 kernels
    (functions/pii.py) redact and count them, and the oracle re-runs the
    identical RE2 patterns via DuckDB regexp_* on the same augmented text."""
    import pyarrow.compute as pc2

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        extras = []
        for doc_id in doc_ids:
            parts = []
            if doc_id % 3 == 0:
                parts.append(f" mail user{doc_id}@host{doc_id % 7}.example.com")
            if doc_id % 4 == 0:
                parts.append(
                    f" call {doc_id % 1000:03d}-{doc_id % 100:03d}-"
                    f"{doc_id % 10000:04d}")
            if doc_id % 5 == 0:
                parts.append(f" from 10.{doc_id % 256}.0.{doc_id % 256}")
            extras.append("".join(parts))
        text = pc2.binary_join_element_wise(
            pc2.cast(batch.column("text"), pa.string()),
            pa.array(extras, pa.string()), "")
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text)

    return _sorted_table(
        pii.redact_pii(ds.map_batches(augment, batch_format="pyarrow")),
        ["doc_id"],
    )


def q_media_decode(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(multimodal.decode_media(ds), ["doc_id"])


def q_media_decode_real(sf_dir: str):
    """Synthesized VALID PNG/WAV payloads decoded by the REAL stdlib metadata
    decoder (PNG IHDR / wave module); the oracle recomputes the metadata from
    the synthesis arithmetic, so a hash match proves the decoder round-trips."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = multimodal.decode_media_real(ds)
    return _sorted_table(
        out.select_columns(
            ["doc_id", "media_type", "width", "height", "frames", "channels",
             "sample_rate_hz", "duration_ms"]
        ),
        ["doc_id"],
    )


def q_image_features(sf_dir: str):
    """Synthesized gradient PNGs (real zlib-compressed pixel data) decoded by
    the from-scratch PNG codec, then per-image feature extraction; the oracle
    recomputes channel-0 means from the synthesis arithmetic, so a hash match
    proves the full decode→unfilter→aggregate path (functions/imageops.py)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = imageops.image_features(ds)
    return _sorted_table(
        out.select_columns(
            ["doc_id", "width", "height", "channels", "n_px", "mean_c0"]
        ),
        ["doc_id"],
    )


def q_image_resize(sf_dir: str):
    """Decode + nearest-neighbor resize to 8×6 over the gradient PNGs; the
    oracle recomputes the resampled channel-0 checksum with the same integer
    index math ((dst·src)//out), pinning the resize kernel end to end."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = imageops.image_resize(ds, out_w=8, out_h=6)
    return _sorted_table(
        out.select_columns(
            ["doc_id", "out_w", "out_h", "channels", "n_bytes", "checksum_c0"]
        ),
        ["doc_id"],
    )


def q_image_phash(sf_dir: str):
    """64-bit perceptual average-hash (aHash) over the gradient PNGs: real
    decode → 8×8 nearest-neighbor downsample of channel 0 → bit i set iff
    pixel_i·64 > Σ pixels (integer mean threshold, no float division). The
    oracle rebuilds the whole hash from the synthesis arithmetic, so a hash
    match proves decode → resize → threshold → bit packing end to end."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = imageops.image_phash(ds)
    return _sorted_table(
        out.select_columns(["doc_id", "hash_lo", "hash_hi"]), ["doc_id"])


def q_phash_dedup(sf_dir: str):
    """Perceptual-hash duplicate clusters: hash every image (q_image_phash's
    kernel), groupby the 64-bit hash, keep MIN(doc_id) — the multimodal
    counterpart of dedup_exact. The shuffle moves 16-byte hash rows only;
    pixels never leave the hashing stage."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    return _sorted_table(imageops.phash_dedup(ds), ["hash_hi", "hash_lo"])


def q_phash_neardup(sf_dir: str):
    """Perceptual NEAR-duplicate pairs (hamming ≤ 3 between distinct
    aHashes, reported between cluster keepers): unique hashes first (the
    mega-cluster guard), then 4×16-bit banding — exact candidate generation
    by pigeonhole at this threshold — with vectorized XOR/popcount verify
    inside each band group. The oracle is the literal all-pairs
    bit_count(xor) restatement over the arithmetically rebuilt hashes."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    return _sorted_table(imageops.phash_neardup(ds, max_hamming=3),
                         ["doc_a", "doc_b"])


def q_frame_sample(sf_dir: str):
    """Multi-frame GIF payloads (frames = doc_id%5+1, each the canonical
    minimal LZW unit) → block-walk frame count → every-2nd-frame sampling;
    one output row per (doc, sampled frame)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = imageops.frame_sample(ds, stride=2)
    return _sorted_table(out, ["doc_id", "frame_idx"])


def q_video_meta(sf_dir: str):
    """Real ISO BMFF (mp4) containers synthesized from doc_id and decoded by
    the box-structure walk (mvhd/tkhd/hdlr/stsz — ISO 14496-12); the oracle
    recomputes width/height/frames/duration from the synthesis arithmetic,
    proving the container parser round-trips."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = multimodal.decode_video_meta(ds)
    return _sorted_table(
        out.select_columns(["doc_id", "width", "height", "frames", "duration_ms"]),
        ["doc_id"],
    )


def q_webp_meta(sf_dir: str):
    """Real WebP payloads cycling all three container variants (VP8X / VP8
    lossy / VP8L lossless) decoded through the sniffing dispatcher; the
    oracle recomputes dimensions from the synthesis arithmetic — variant
    coverage of RFC 9649's three headers in one hash."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = multimodal.decode_webp(ds)
    return _sorted_table(
        out.select_columns(["doc_id", "width", "height", "frames"]),
        ["doc_id"],
    )


def q_audio_features(sf_dir: str):
    """Real 16-bit PCM WAV payloads (sawtooth samples closed-form in doc_id)
    decoded with the stdlib wave module and windowed into integer features
    (sum|s|, max|s|, zero crossings); the oracle regenerates every sample
    with generate_series and aggregates the same windows."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = audioops.audio_features(ds, window=40)
    return _sorted_table(
        out.select_columns(
            ["doc_id", "window_idx", "sum_abs", "max_abs", "zero_crossings"]
        ),
        ["doc_id", "window_idx"],
    )


def q_line_dedup(sf_dir: str):
    """CCNet-style duplicated-line scrub over synthesized multi-line pages:
    deterministic boilerplate (nav/footer lines shared across documents)
    wrapped around the unique body line; every line occurring more than once
    corpus-wide is removed, survivor order preserved (functions/dedup.py
    line_dedup — the boilerplate filter of a web-text pipeline)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        n = len(batch)
        nav = pc.binary_join_element_wise(
            _lit("nav menu ", n), pc.cast(_mod(did, 5), pa.string()), "")
        contact = pc.binary_join_element_wise(
            _lit("contact us ", n), pc.cast(_mod(did, 3), pa.string()), "")
        ref = pc.binary_join_element_wise(
            _lit("ref ", n), pc.cast(did, pa.string()), "")
        raw = pc.binary_join_element_wise(
            nav, batch.column("text"), contact, ref, "\n")
        return pa.table({"doc_id": did, "text": raw})

    pages = ds.map_batches(synth, batch_format="pyarrow")
    return _sorted_table(dedup.line_dedup(pages, max_count=1), ["doc_id"])


def q_self_dedup_lines(sf_dir: str):
    """Within-document duplicate-line removal (functions/dedup.py
    self_dedup_lines — C4's intra-page cleanup, the per-document complement
    of line_dedup): pages synthesized with an internal repeat of the nav
    line and the whole body; the first occurrence of each line survives,
    order preserved. Zero shuffle; the oracle restates keep-first with
    MIN(pos) + ordered string_agg."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        n = len(batch)
        nav = pc.binary_join_element_wise(
            _lit("nav menu ", n), pc.cast(_mod(did, 5), pa.string()), "")
        ref = pc.binary_join_element_wise(
            _lit("ref ", n), pc.cast(did, pa.string()), "")
        raw = pc.binary_join_element_wise(
            nav, batch.column("text"), nav, ref, batch.column("text"), "\n")
        return pa.table({"doc_id": did, "text": raw})

    pages = ds.map_batches(synth, batch_format="pyarrow")
    return _sorted_table(dedup.self_dedup_lines(pages), ["doc_id"])


def q_fineweb_filter(sf_dir: str):
    """FineWeb line-shape quality gate (functions/textstats.fineweb_stats_batch
    — Penedo et al. 2024): terminal-punctuation line ratio + short-line ratio
    + within-page duplicated-line char fraction, first-failing-rule drop
    reasons, all comparisons in integer cross-multiplied form so the DuckDB
    oracle hash-matches exactly. Pages synthesized deterministically from
    doc_id: a headline (punctuated except doc_id%5==4), the body, a nav
    line, a promo slot that duplicates the body (doc_id%7==0 → dup_lines
    drops) or degenerates to 'OK' (doc_id%7==1 → short_lines drops), and a
    footer. One map_batches pass, zero shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        n = len(batch)
        did_s = pc.cast(did, pa.string())
        m5 = _mod(did, 5)
        m7 = _mod(did, 7)
        head = pc.binary_join_element_wise(
            _lit("Welcome to page ", n), did_s,
            pc.if_else(pc.equal(m5, 4), _lit("", n), _lit(".", n)), "")
        nav = pc.binary_join_element_wise(
            _lit("nav menu ", n), pc.cast(m5, pa.string()), "")
        promo = pc.if_else(
            pc.equal(m7, 0), batch.column("text"),
            pc.if_else(
                pc.equal(m7, 1), _lit("OK", n),
                pc.binary_join_element_wise(
                    _lit("Read the full article about topic ", n),
                    pc.cast(m7, pa.string()), _lit(".", n), "")))
        tail = pc.if_else(pc.equal(_mod(did, 4), 0),
                          _lit("Buy now", n), _lit("All rights reserved.", n))
        raw = pc.binary_join_element_wise(
            head, batch.column("text"), nav, promo, tail, "\n")
        return pa.table({"doc_id": did, "text": raw})

    pages = ds.map_batches(synth, batch_format="pyarrow")
    return _sorted_table(
        pages.map_batches(textstats.fineweb_stats_batch, batch_format="pyarrow"),
        ["doc_id"],
    )


def q_epoch_shuffle(sf_dir: str):
    """Deterministic training-order shuffle (functions/packing.epoch_shuffle):
    md5('epoch:0::' || doc_id) is the permutation — shard = first-8-hex mod 8,
    pos = rank within the shard by (shuffle_key, doc_id). Reproducible on any
    layout with no RNG; the within-shard rank runs through order-preserving
    3-hex-prefix range buckets (≤ n_shards·4096 driver rows), never a
    whole-shard sort in one task. The oracle restates the same md5 arithmetic
    with ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key)."""
    from ..functions import packing

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = packing.epoch_shuffle(ds, key="doc_id", epoch=0, n_shards=8)
    return _sorted_table(out, ["shard", "pos"])


def q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's over the full embeddings table (k partial rows per
    block per round; functions/clustering.py). Iterative float refit is not
    ANSI-SQL-expressible — deliberately oracle-free; invariants (blob
    recovery, layout-independence of labels, partial-fold exactness) are
    pinned in tests/test_clustering.py."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return clustering.kmeans_summary(ds, k=8, n_iter=5)


def _fixed_centroids(ds) -> np.ndarray:
    """The oracle-comparable FIXED centroid set both kmeans_assign-style
    queries share: the embeddings of vec_id < 8, ordered by vec_id (the
    SQL's cid order)."""
    import ray

    cent_tbl = pa.concat_tables(
        ray.get(
            ds.map_batches(
                lambda b: b.filter(pc.less(b.column("vec_id"), 8)),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
    )
    order = np.argsort(cent_tbl.column("vec_id").to_numpy(zero_copy_only=False))
    return similarity._matrix(cent_tbl)[order]


def q_embedding_kmeans_assign(sf_dir: str):
    """Voronoi labeling against FIXED centroids (the vectors of vec_id < 8):
    per-row float64 squared distances rounded like DuckDB ROUND(·, 4), ties
    to the lower centroid id — deterministic, batch-layout-independent, and
    fully oracled (the SQL recomputes the same rounded-distance argmin)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = clustering.kmeans_assign(ds, _fixed_centroids(ds), digits=4).select_columns(
        ["vec_id", "cluster_id"]
    )
    return _sorted_table(out, ["vec_id"])


def q_embedding_pq_topk(sf_dir: str):
    """Product-quantization ANN (functions/similarity.py pq_topk): 64-dim
    embeddings split into 4×16-dim subspaces, codebooks = the FIXED
    vec_id<8 subvectors, rounded-distance argmin codes, ADC top-10 against
    the vec_id=0 query. Unlike the recall-pinned LSH/IVF paths this ANN
    variant is FULLY oracled — every distance is rounded and ties are
    deterministic, so the SQL recomputes codes, table and ranking
    exactly."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = _fixed_centroids(ds)                     # (8, 64), cid order
    codebooks = cents.reshape(8, 4, 16).transpose(1, 0, 2)
    return similarity.pq_topk(ds, _first_embedding(sf_dir), codebooks,
                              k=10, digits=4)


def q_semdedup(sf_dir: str):
    """SemDedup (Abbas et al. 2023): nearest-centroid clustering against the
    FIXED vec_id<8 centroids (rounded-distance argmin, the oracle-comparable
    kmeans_assign contract), then within-cluster cosine pruning — a vector
    is dropped when any lower-id cluster member has rounded cosine ≥ 0.3
    (threshold picked where the synthetic embeddings actually produce a
    keep/drop mix; real corpora use ~0.95). Fully oracled: the SQL restates
    the EXISTS rule with the same two rounding contracts."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = clustering.semdedup(ds, _fixed_centroids(ds), threshold=0.3,
                              digits=4, sim_digits=6)
    return _sorted_table(out, ["vec_id"])


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup of a NEW shard against a PERSISTED corpus
    hash index (functions/dedup.py build_hash_index / dedup_against_index):
    texts truncated to 12 chars so duplicates exist across the even-id
    "existing corpus" and odd-id "new shard"; the probe reads only the
    index partitions the new hashes route to (partition-pruned)."""
    import tempfile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.utf8_slice_codeunits(batch.column("text"), 0, 12),
            }
        )

    pages = ds.map_batches(synth, batch_format="pyarrow")
    existing = pages.map_batches(
        lambda b: b.filter(pc.equal(_mod(b.column("doc_id"), 2), 0)),
        batch_format="pyarrow",
    )
    new = pages.map_batches(
        lambda b: b.filter(pc.equal(_mod(b.column("doc_id"), 2), 1)),
        batch_format="pyarrow",
    )
    index_dir = tempfile.mkdtemp(prefix="hash_index_")
    dedup.build_hash_index(existing, index_dir, n_partitions=8)
    out = _sorted_table(dedup.dedup_against_index(new, index_dir), ["doc_id"])
    _rmtree(index_dir)
    return out


def q_substring_dedup(sf_dir: str):
    """Exact substring (5-token window) duplication audit, Lee-et-al style
    (functions/dedup.py substring_dup_stats): a window duplicated ANYWHERE
    in the corpus marks its covering tokens; per doc, the token mass a
    substring-dedup pass would remove. Two signature-sized shuffles (gram
    rows, then dup occurrences), no broadcast."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(dedup.substring_dup_stats(ds, k=5), ["doc_id"])


def q_neardup_incremental(sf_dir: str):
    """Incremental NEAR-dup of a synthesized new shard against a persisted
    MinHash-LSH index of the corpus (functions/dedup.py build_minhash_index /
    neardup_against_index). Planted per doc_id%3: exact copy (est 1.0),
    one-token append (near), fully novel (no match). Deliberately
    oracle-free — seeded minhash permutations are not ANSI-SQL-expressible;
    estimates are pinned against driver-computed signature agreement in
    tests/test_scaleops.py."""
    import tempfile

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth_new(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        text = batch.column("text")
        n = len(batch)
        mod = _mod(did, 3)
        ids = pc.cast(did, pa.string())
        near = pc.binary_join_element_wise(text, _lit("qqq", n), " ")
        novel = pc.binary_join_element_wise(
            _lit("u", n), ids, _lit(" v", n), ids, _lit(" w", n), ids,
            _lit(" x", n), ids, "")
        out = pc.if_else(pc.equal(mod, 0), text,
                         pc.if_else(pc.equal(mod, 1), near, novel))
        return pa.table({"doc_id": pc.add(did, pa.scalar(100000, pa.int64())),
                         "text": out})

    new = ds.map_batches(synth_new, batch_format="pyarrow")
    index_dir = tempfile.mkdtemp(prefix="mh_index_")
    dedup.build_minhash_index(ds, index_dir, n_partitions=8)
    out = _sorted_table(
        dedup.neardup_against_index(new, index_dir, threshold=0.8),
        ["new_doc_id", "match_doc_id"],
    )
    _rmtree(index_dir)
    return out


def q_length_quantiles(sf_dir: str):
    """Exact distributed quantiles of n_chars (functions/quantiles.py):
    per-block value_counts partials -> one groupby over (value, n) rows ->
    driver CDF walk. quantile_disc parity with the oracle."""
    from ..functions import quantiles

    ds = _read(sf_dir, "documents", ["n_chars"])
    return quantiles.exact_quantiles(
        ds, "n_chars", [0.25, 0.5, 0.75, 0.9, 0.99]
    )


def q_domain_cap(sf_dir: str):
    """Docs-per-domain cap (functions/sampling.py per_key_cap): keep the 7
    lowest doc_ids per source. Per-block combiner bounds the shuffle to
    cap × n_blocks rows per key."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    capped = sampling.per_key_cap(ds, key="source", max_per_key=7,
                                  order_col="doc_id")
    return _sorted_table(capped.select_columns(["doc_id", "source"]), ["doc_id"])


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (functions/decontam.py): the eval set is
    documents with doc_id < 10; training docs with doc_id % 7 == 3 get the
    first 8-gram of eval doc (doc_id % 10) appended, so contamination is
    deterministic and nonzero. Marks every training doc with the count of
    DISTINCT eval 8-grams it contains (vectorized rolling-hash n-grams vs a
    broadcast eval hash set — no shuffle, no Python token loop)."""
    import ray

    from ..functions import decontam

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    eval_blocks = [
        b
        for b in ray.get(
            ds.map_batches(
                lambda b: b.filter(pc.less(b.column("doc_id"), 10)),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        if b.num_columns > 0
    ]
    eval_tbl = pa.concat_tables(eval_blocks)
    first_gram = {}
    for did, text in zip(
        eval_tbl.column("doc_id").to_pylist(), eval_tbl.column("text").to_pylist()
    ):
        toks = text.split()
        if len(toks) >= 8:
            first_gram[did] = " ".join(toks[:8])
    grams_by_eid = np.array([first_gram.get(i, "") for i in range(10)], dtype=object)

    def synth(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        chosen = grams_by_eid[did % 10]
        mask = did % 7 == 3
        suffix = np.where(
            mask & (chosen != ""), np.array([" "], object) + chosen, ""
        )
        text = pc.binary_join_element_wise(
            batch.column("text"), pa.array(suffix.astype(str), pa.string()), ""
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": text})

    train = ds.map_batches(synth, batch_format="pyarrow")
    marked = decontam.decontaminate(
        train, ray.data.from_arrow(eval_tbl), n=8, mode="mark"
    )
    return _sorted_table(marked, ["doc_id"])


def q_bpe_train_merges(sf_dir: str):
    """Distributed BPE tokenizer training (functions/textstats.bpe_train):
    8 iterative merge rounds over the vocabulary-sized distinct-word table —
    weighted pair census → per-block top-1 combiner → global argmax →
    vectorized merge rewrite, materialized between supersteps. Iterative,
    so no SQL oracle; single-process-reference parity is pinned in
    tests/test_functions.py."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return textstats.bpe_train(ds, n_merges=8)


def q_anchor_texts(sf_dir: str):
    """Anchor-text corpus off the REAL MIME+DOM walk: each document
    synthesizes into an MHTML page carrying two deterministic hyperlinks
    (next: doc_id+1; hub: (doc_id*7+3) mod 1000); the engine parses every
    archive with the production kernel (frontier/discovery.py
    discover_anchor_texts — the same walk crawl discovery uses), flattens
    (target, anchor) pairs and folds them per target with an ordered join.
    The oracle predicts the link relation arithmetically — a hash match
    proves archive synthesis, MIME parse, DOM walk, href extraction and
    text-node capture all round-trip."""
    from ..frontier.discovery import discover_anchor_texts
    from .flagship import PAGE_URL_PREFIX, wrap_mhtml

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synthesize(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        pages = []
        for d in doc_ids:
            nxt, hub = d + 1, (d * 7 + 3) % 1000
            body = (
                f"<html><head><title>doc-{d}</title></head><body>"
                f'<p><a href="{PAGE_URL_PREFIX}{nxt}">next doc-{nxt}</a></p>'
                f'<p><a href="{PAGE_URL_PREFIX}{hub}">hub doc-{hub}</a></p>'
                f"</body></html>"
            )
            pages.append(wrap_mhtml(d, body))
        return pa.table({"html": pa.array(pages, pa.binary())})

    def links(batch: pa.Table) -> pa.Table:
        targets, anchors = [], []
        for body in batch.column("html").to_pylist():
            for href, text in discover_anchor_texts(body):
                targets.append(href)
                anchors.append(text)
        return pa.table({"target_url": pa.array(targets, pa.string()),
                         "anchor": pa.array(anchors, pa.string())})

    out = (
        ds.map_batches(synthesize, batch_format="pyarrow")
        .map_batches(links, batch_format="pyarrow")
        .groupby("target_url")
        .map_groups(_fold_anchor_group, batch_format="pyarrow")
    )
    return _sorted_table(out, ["target_url"])


def _fold_anchor_group(group: pa.Table, cap: int = 64) -> pa.Table:
    """Per-target anchor fold: n_anchors counts every inlink; the joined
    sample keeps the first ``cap`` in anchor order — web-scale hubs have
    millions of inlinks and an uncapped join column would be row-sized in
    them (the oracle restates the cap with ROW_NUMBER() <= 64)."""
    anchors = sorted(group.column("anchor").to_pylist())
    return pa.table(
        {
            "target_url": group.column("target_url")[:1],
            "n_anchors": pa.array([len(anchors)], pa.int64()),
            "anchors": pa.array(["|".join(anchors[:cap])], pa.string()),
        }
    )


def q_curation_prep(sf_dir: str):
    """Composed round-4 curation pipeline, fully oracled end to end:
    CCNet perplexity gate (drop the tail third of each language) →
    hashed-bigram classifier gate (keep positive scores) → Lee-et-al
    substring scrub over the SURVIVORS (duplication is judged within the
    curated corpus, matching the oracle's CTE chain). Each stage is an
    already-verified operator; the gates compose as distributed semi
    joins on doc_id — no driver-side id sets."""
    from ..functions import joins

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    buckets = textstats.ccnet_bucket_scores(ds)
    keep1 = buckets.filter(expr="bucket != 'tail'").select_columns(["doc_id"])
    docs1 = joins.hash_join(ds, keep1, key="doc_id", how="semi")
    cls = textstats.hashed_bigram_classifier(docs1)
    keep2 = cls.filter(expr="keep == True").select_columns(["doc_id"])
    # substring_scrub consumes its input twice (gram census + doc rebuild);
    # materialize the survivors so the gate lineage — ccnet scoring, the
    # classifier, two hash joins — executes once, not twice
    docs2 = joins.hash_join(docs1, keep2, key="doc_id", how="semi").materialize()
    return _sorted_table(dedup.substring_scrub(docs2, k=5), ["doc_id"])


def q_substring_scrub(sf_dir: str):
    """Exact substring-duplication removal (functions/dedup.substring_scrub):
    every occurrence of a corpus-duplicated 5-token window is dropped except
    the canonical (min doc_id, pos) copy, whose span protects its tokens;
    docs rebuild from kept tokens. The oracle restates gram extraction,
    canonical ROW_NUMBER flagging, span coverage and the string_agg rebuild
    in SQL — a hash match checks the rewritten text byte for byte."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(dedup.substring_scrub(ds, k=5), ["doc_id"])


def q_bpe_encode_counts(sf_dir: str):
    """Train-then-encode tokenizer round trip: 8 BPE merges learned from the
    corpus (functions/textstats.bpe_train), then applied back to it
    (bpe_encode) — per-doc BPE token counts vs whitespace word counts, the
    compression the learned vocabulary buys. Iterative training has no SQL
    restatement (rows-only driver check); single-process encode parity is
    pinned in tests."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = textstats.bpe_train(ds, n_merges=8)
    return _sorted_table(textstats.bpe_encode(ds, merges), ["doc_id"])


def q_ccnet_buckets(sf_dir: str):
    """CCNet perplexity bucketing (functions/textstats.ccnet_bucket_scores):
    per-language unigram-LM scores, then head/middle/tail thirds by exact
    per-language discrete quantiles. The oracle recomputes the per-language
    LN(n/t) scores and quantile_disc(1/3, 2/3) thresholds in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return _sorted_table(textstats.ccnet_bucket_scores(ds), ["doc_id"])


def q_hash_classifier(sf_dir: str):
    """fastText-shaped hashed-bigram linear classifier
    (functions/textstats.hashed_bigram_classifier): word bigrams → md5-prefix
    hash buckets → deterministic integer weights → per-doc sum + keep gate,
    one pass, zero shuffle. The oracle recomputes the identical bucket
    arithmetic with list comprehensions and md5 in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(textstats.hashed_bigram_classifier(ds), ["doc_id"])


def _curation_page_batch(batch: pa.Table) -> pa.Table:
    """THE nav/article/footer MHTML page construction q_boilerplate and
    q_web_curation share — their oracles both predict the boilerplate
    outcome from exactly this layout (nav density 0.9, footer 0.92, the
    escaped document text alone in the <pre> article), so the construction
    must live in one place."""
    import html as _html

    from .flagship import PAGE_URL_PREFIX, wrap_mhtml

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    pages, urls = [], []
    for d, t in zip(doc_ids, texts):
        esc = _html.escape(t, quote=False)
        body = (
            f"<html><head><title>doc-{d}</title></head><body>"
            f'<nav><a href="/a">Home</a> <a href="/b">About</a></nav>'
            f"<article><pre>{esc}</pre></article>"
            f'<footer><a href="/c">Contact</a> <a href="/d">Terms</a>'
            f"</footer></body></html>"
        )
        pages.append(wrap_mhtml(d, body))
        urls.append(f"{PAGE_URL_PREFIX}{d}")
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(pages, pa.binary())})


def q_boilerplate(sf_dir: str):
    """Boilerplate removal (functions/boilerplate.py): each document
    synthesizes into an MHTML page whose <pre> article sits between a
    link-dense nav and footer (_curation_page_batch); the engine runs the
    production MIME+convert kernel then the leaf-block link-density walk.
    The oracle predicts the outcome from the construction — nav (density
    0.9) and footer (0.92) drop, the article keeps iff the document has
    non-whitespace text — so a hash match proves segmentation, density
    arithmetic and the text round-trip all at once."""
    from ..functions import boilerplate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = boilerplate.extract_main_content(
        ds.map_batches(_curation_page_batch, batch_format="pyarrow"))
    return _sorted_table(
        out.select_columns(["url", "n_blocks", "n_kept", "main_text"]),
        ["url"])


def q_web_curation(sf_dir: str):
    """Composed web-curation pipeline — this session's three operators
    chained end to end, every stage the production kernel:

    1. documents → MHTML pages (nav/article/footer) → MIME+convert+DOM →
       leaf-block link-density boilerplate removal (main_text);
    2. word-blocklist gate over the recovered main text (≤10% blocked
       tokens);
    3. DSIR importance resampling over the SURVIVING corpus (target
       lang='en', ratios fit on the filtered docs), top-20.

    The lang column rejoins by doc_id through the engine hash_join (it
    does not survive the page round-trip). The oracle restates the whole
    composition in one statement: the boilerplate outcome is predicted
    from the construction, the gate and the DSIR arithmetic are recomputed
    over the same filtered base — a hash match pins every stage AND the
    stage boundaries."""
    from ..functions import blocklist, boilerplate, dsir
    from ..functions.joins import hash_join
    from .flagship import PAGE_URL_PREFIX

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    extracted = boilerplate.extract_main_content(
        ds.map_batches(_curation_page_batch, batch_format="pyarrow"))

    def recover(batch: pa.Table) -> pa.Table:
        # url suffix → doc_id; drop pages whose article didn't survive
        import pyarrow.compute as _pc

        ids = _pc.utf8_slice_codeunits(
            batch.column("url"), len(PAGE_URL_PREFIX), 1 << 30)
        keep = _pc.greater(batch.column("n_kept"), 0)
        return pa.table({
            "doc_id": _pc.cast(ids, pa.int64()),
            "text": batch.column("main_text"),
        }).filter(keep)

    curated = extracted.map_batches(recover, batch_format="pyarrow")
    gated = blocklist.word_blocklist_gate(curated, _BLOCK_WORDS,
                                          max_frac=0.1)

    def keep_only(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch.column("keep"))
        return pa.table({"doc_id": kept.column("doc_id"),
                         "text": kept.column("text")})

    survivors = gated.map_batches(keep_only, batch_format="pyarrow")
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    # materialize: dsir_select consumes its input TWICE (ratio fit +
    # scoring); without this the dominant MIME+convert+DOM lineage would
    # re-execute end to end for each pass
    with_lang = hash_join(survivors, langs, key="doc_id",
                          num_buckets=32).materialize()
    return dsir.dsir_select(with_lang, n_buckets=64, top_k=20,
                            target_col="lang",
                            target_value="en").to_pandas()


_BLOCK_SUFFIXES = ("ads.example", "tracker.net")
_BLOCK_WORDS = ("the", "le", "der")


def q_url_blocklist(sf_dir: str):
    """Host-suffix blocklist gate (functions/blocklist.py
    host_blocklist_gate) over messy synthesized URLs: the engine runs the
    real WHATWG canonicalizer then the suffix walk; the oracle reconstructs
    the canonical host per key and restates the suffix rule with LIKE —
    agreement requires both the parse and the match to be right."""
    from ..functions import blocklist

    ds = _read(sf_dir, "customer", ["c_custkey"])
    domains = ["good.org", "news.example.com", "ads.example",
               "cdn.ads.example", "tracker.net"]

    def urls(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_pylist()
        return pa.table({
            "c_custkey": pa.array(keys, pa.int64()),
            "url": pa.array(
                [f"HTTPS://Sub{k}.{domains[k % 5]}:443/p/{k}" for k in keys],
                pa.string()),
        })

    gated = blocklist.host_blocklist_gate(
        ds.map_batches(urls, batch_format="pyarrow"), _BLOCK_SUFFIXES)
    return _sorted_table(
        gated.select_columns(["c_custkey", "host", "blocked"]),
        ["c_custkey"])


def q_word_blocklist(sf_dir: str):
    """Blocked-token fraction gate (functions/blocklist.py
    word_blocklist_gate): case-insensitive exact-token matches over the
    shared _lm_tokens contract, keep iff the rounded fraction ≤ 0.1.
    Zero shuffle; the word set broadcasts once."""
    from ..functions import blocklist

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    gated = blocklist.word_blocklist_gate(ds, _BLOCK_WORDS, max_frac=0.1)
    return _sorted_table(
        gated.select_columns(
            ["doc_id", "n_tokens", "n_blocked", "blocked_frac", "keep"]),
        ["doc_id"])


def q_dsir_select(sf_dir: str):
    """DSIR importance resampling (functions/dsir.py, Xie et al. 2023):
    hashed-bigram bag models for target (lang='en') vs raw corpus, add-1
    smoothed log-ratio quantized to integer micros, per-doc integer weight,
    top-50 by (weight desc, doc_id). Two corpus passes; the learned state
    is 64 int64 ratios broadcast via ray.put. The oracle recomputes the
    identical md5-bucket + FLOOR(1e6·LN-ratio) arithmetic in SQL."""
    from ..functions import dsir

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir.dsir_select(ds, n_buckets=64, top_k=50,
                            target_col="lang", target_value="en").to_pandas()


# ---------------------------------------------------------------------------
# web-archive round trips + converter report surfaces (round 4 batch)


def q_wet_extract(sf_dir: str):
    """WET round trip (sources/warc.write_wet → read_wet): synthesized
    pages → full extraction → WET conversion shards (gzip members,
    deterministic record ids, ISO 28500 headers) → read back. The oracle is
    the extract_text text contract plus the FIXED epoch stamp — warc_ts is
    2026-01-01T00:00:00.00000<d>Z UTC, so after the format's whole-second
    truncation every record must read back exactly 1767225600000000 µs; a
    local-timezone reinterpretation anywhere in the write or read path
    (ADVICE round 3) shifts it by hours and breaks the hash."""
    import glob
    import hashlib
    import os
    import shutil

    from ..sources.warc import read_wet, write_wet
    from .flagship import extract_pages, pages_from_documents

    out_dir = "/tmp/mhtml_ray_gate_wet_" + hashlib.sha1(
        f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)
    pages = pages_from_documents(f"{sf_dir}/documents.parquet")
    extracted = extract_pages(pages, keep_html=False)
    write_wet(extracted, out_dir, ts_col="warc_ts")
    wet = read_wet(sorted(glob.glob(f"{out_dir}/*.warc.wet.gz")))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "wet_ts_us": batch.column("wet_ts").cast(pa.int64()),
            "text": batch.column("text"),
        })

    out = _sorted_table(
        wet.map_batches(project, batch_format="pyarrow"), ["url"])
    _rmtree(out_dir)  # eager (to_pandas) above — shards now dead
    return out


_CONVERT_URL_PREFIX = "https://convert.fixture.invalid/"


def _convert_report_pages(batch: pa.Table) -> pa.Table:
    """Per-doc MHTML archive exercising the CSS chain + favicon surfaces:
    root links style{d}.css (present iff d%5!=0) which @imports
    imp{d}.css (present iff d%3!=0) and url()-refs img{d}.png (present iff
    d%2==0); the root also carries <link rel=icon href=fav{d}.png>
    (resource present iff d%4!=0, payload chr(65+d%26) × (3+d%5)) with
    sizes/type attributes on d%3==0 rows only."""
    doc_ids = batch.column("doc_id").to_pylist()
    pages = []
    for d in doc_ids:
        d = int(d)
        url = f"{_CONVERT_URL_PREFIX}{d}"
        attrs = ' sizes="16x16" type="image/png"' if d % 3 == 0 else ""
        root = (
            f"<html><head><title>doc-{d}</title>"
            f'<link rel="icon" href="fav{d}.png"{attrs}>'
            f'<link rel="stylesheet" href="style{d}.css">'
            f"</head><body><p>hi</p></body></html>"
        )
        parts = [
            f"------=_B\r\nContent-Type: text/html\r\n"
            f"Content-Location: {url}\r\n\r\n{root}\r\n"
        ]
        if d % 5 != 0:
            css = f'@import "imp{d}.css";\nbody{{background:url("img{d}.png");}}'
            parts.append(
                f"------=_B\r\nContent-Type: text/css\r\n"
                f"Content-Location: {_CONVERT_URL_PREFIX}style{d}.css\r\n\r\n{css}\r\n"
            )
        if d % 3 != 0:
            parts.append(
                f"------=_B\r\nContent-Type: text/css\r\n"
                f"Content-Location: {_CONVERT_URL_PREFIX}imp{d}.css\r\n\r\n"
                f"p{{color:red}}\r\n"
            )
        if d % 2 == 0:
            parts.append(
                f"------=_B\r\nContent-Type: image/png\r\n"
                f"Content-Location: {_CONVERT_URL_PREFIX}img{d}.png\r\n\r\nPNG\r\n"
            )
        if d % 4 != 0:
            fav = chr(65 + d % 26) * (3 + d % 5)
            parts.append(
                f"------=_B\r\nContent-Type: image/png\r\n"
                f"Content-Location: {_CONVERT_URL_PREFIX}fav{d}.png\r\n\r\n{fav}\r\n"
            )
        archive = (
            "MIME-Version: 1.0\r\n"
            'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
            + "".join(parts) + "------=_B--\r\n"
        ).encode()
        pages.append(archive)
    return pa.table({
        "doc_id": pa.array([int(d) for d in doc_ids], pa.int64()),
        "url": pa.array([f"{_CONVERT_URL_PREFIX}{d}" for d in doc_ids],
                        pa.string()),
        "html": pa.array(pages, pa.binary()),
    })


def q_unfound_report(sf_dir: str):
    """Unfound-resource reporting (C14) through the FULL convert walk over
    archives with a missing-resource lattice (stylesheet / @import chain /
    css url() / favicon, each present on a different doc_id residue): the
    engine returns the converter's canonical unfound URL list per page and
    the archive's parsed resource count; the oracle reconstructs both
    arithmetically. A hash match pins link-walk order, CSS @import+url()
    descent (C9), resolver canonicalization (P22) and the unfound set."""
    from ..stages.extract import ExtractBatch

    ds = _read(sf_dir, "documents", ["doc_id"])
    pages = ds.map_batches(_convert_report_pages, batch_format="pyarrow")
    extracted = pages.map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=128)

    def report(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        unfound = batch.column("unfound_resources").to_pylist()
        counts = batch.column("resources_count").to_pylist()
        doc_ids = [int(u.rsplit("/", 1)[1]) for u in urls]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_resources": pa.array([int(c) for c in counts], pa.int64()),
            "n_unfound": pa.array([len(u) for u in unfound], pa.int64()),
            "unfound": pa.array(["|".join(sorted(u)) for u in unfound],
                                pa.string()),
        })

    out = extracted.map_batches(report, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_favicon_report(sf_dir: str):
    """Favicon collection (C13) through the full convert walk: found icons
    inline to data URIs (href = base64 of the deterministic payload,
    originalHref = the canonical resource URL), missing icons keep their
    canonical URL; sizes/type attributes round-trip verbatim on the rows
    that carry them. The oracle rebuilds every field with to_base64 over
    the same payload arithmetic."""
    from ..stages.extract import ExtractBatch

    ds = _read(sf_dir, "documents", ["doc_id"])
    pages = ds.map_batches(_convert_report_pages, batch_format="pyarrow")
    extracted = pages.map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=128)

    def report(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        favicons = batch.column("favicons").to_pylist()
        doc_ids, hrefs, origs, sizes, types = [], [], [], [], []
        for u, favs in zip(urls, favicons):
            doc_ids.append(int(u.rsplit("/", 1)[1]))
            fav = favs[0] if favs else {}
            hrefs.append(fav.get("href"))
            origs.append(fav.get("originalHref"))
            sizes.append(fav.get("sizes"))
            types.append(fav.get("type"))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "original_href": pa.array(origs, pa.string()),
            "sizes": pa.array(sizes, pa.string()),
            "icon_type": pa.array(types, pa.string()),
        })

    out = extracted.map_batches(report, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_host_graph(sf_dir: str):
    """Host-level web graph (the Common Crawl webgraph product shape):
    every doc becomes a page on host h{d%7} carrying two cross-host anchors
    (to h{(d+1)%7} and h{(d*3+1)%7}); the engine walks each archive with the
    production MIME+DOM hyperlink discovery, maps src/dst through the
    shared canonicalizer's host extraction, and folds the edge list with
    one groupby — the exact aggregation that turns a page-level crawl into
    a host graph. The oracle predicts every edge count arithmetically."""
    from ray.data.aggregate import Count

    from ..frontier.canon import canonicalize as _canon, host_of
    from ..frontier.discovery import discover_hyperlinks

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synthesize(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        pages = []
        for d in doc_ids:
            d = int(d)
            src = f"https://h{d % 7}.fixture.invalid/{d}"
            a = f"https://h{(d + 1) % 7}.fixture.invalid/x{d}"
            b = f"https://h{(d * 3 + 1) % 7}.fixture.invalid/y{d}"
            body = (
                f"<html><body><a href=\"{a}\">a</a>"
                f"<a href=\"{b}\">b</a></body></html>"
            )
            pages.append((
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                "------=_B\r\nContent-Type: text/html\r\n"
                f"Content-Location: {src}\r\n\r\n{body}\r\n------=_B--\r\n"
            ).encode())
        return pa.table({"html": pa.array(pages, pa.binary())})

    def edges(batch: pa.Table) -> pa.Table:
        src_hosts, dst_hosts = [], []
        for blob in batch.column("html").to_pylist():
            from ..kernel.mime import parse as _parse

            mhtml = _parse(blob)
            base = mhtml.index
            src_host = host_of(_canon(base).canon_url) if base else ""
            for href in discover_hyperlinks(blob, base):
                src_hosts.append(src_host)
                dst_hosts.append(host_of(_canon(href).canon_url))
        return pa.table({
            "src_host": pa.array(src_hosts, pa.string()),
            "dst_host": pa.array(dst_hosts, pa.string()),
        })

    out = (
        ds.map_batches(synthesize, batch_format="pyarrow")
        .map_batches(edges, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Count(alias_name="n_links"))
    )
    return _sorted_table(out, ["src_host", "dst_host"])


def q_meta_extract(sf_dir: str):
    """Head-metadata extraction (the WAT-style product) by the production
    HTML5 parser (functions/domstats.head_meta): title text and
    description/og:title meta content over generatively-constructed heads
    carrying numeric (&#N;) and named (&amp;) entities — a hash match pins
    tokenizer entity decoding in BOTH text and attribute-value states plus
    head tree placement, all reconstructed by the oracle in SQL."""
    from ..functions.domstats import head_meta

    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        htmls = []
        for d in ids:
            og = (f'<meta property="og:title" content="OG doc-{d}">'
                  if d % 2 == 0 else "")
            htmls.append(
                f'<html><head><meta charset="utf-8">'
                f"<title>T&#{65 + d % 26};{d}</title>"
                f'<meta name="description" content="Desc &amp; d{d}">{og}'
                f"</head><body><p>x</p></body></html>")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "html": pa.array(htmls, pa.string())})

    out = head_meta(ds.map_batches(pages, batch_format="pyarrow"))
    return _sorted_table(out, ["doc_id"])


def q_script_gate_report(sf_dir: str):
    """The --enable-scripts policy (S1) under the oracle gate: the same
    archive converted BOTH ways in one kernel pass; scripts-off output
    contains exactly one <script (the injected ld+json metadata block),
    scripts-on keeps the page's d%3+1 inline scripts and its external
    script tag too. Counting serialized occurrences pins strip-vs-keep,
    the injection, and the serializer."""
    from ..stages.extract import ExtractBatch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        htmls, urls = [], []
        for d in ids:
            inline = "".join(
                f"<script>var v{i}={d};</script>" for i in range(d % 3 + 1))
            url = f"https://script.fixture.invalid/{d}"
            body = (
                f"<html><head><title>doc-{d}</title></head>"
                f'<body><p>x</p>{inline}<script src="s{d}.js"></script>'
                f"</body></html>")
            htmls.append((
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                "------=_B\r\nContent-Type: text/html\r\n"
                f"Content-Location: {url}\r\n\r\n{body}\r\n------=_B--\r\n"
            ).encode())
            urls.append(url)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    kernel_off = ExtractBatch(enable_scripts=False, keep_html=True)
    kernel_on = ExtractBatch(enable_scripts=True, keep_html=True)

    def report(batch: pa.Table) -> pa.Table:
        out_off = kernel_off(batch)
        out_on = kernel_on(batch)
        doc_ids = [int(u.rsplit("/", 1)[1])
                   for u in batch.column("url").to_pylist()]
        n_off = pc.count_substring(
            out_off.column("html_out").cast(pa.large_string()), "<script")
        n_on = pc.count_substring(
            out_on.column("html_out").cast(pa.large_string()), "<script")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_script_off": n_off.cast(pa.int64()).combine_chunks(),
            "n_script_on": n_on.cast(pa.int64()).combine_chunks(),
        })

    pages_ds = ds.map_batches(pages, batch_format="pyarrow")
    out = pages_ds.map_batches(report, batch_format="pyarrow", batch_size=128)
    return _sorted_table(out, ["doc_id"])


def q_srcset_report(sf_dir: str):
    """srcset rewriting (C8, the WHATWG candidate parser) under the oracle
    gate: an <img srcset="a 1x, b 2x" src="c"> whose three targets are
    present on different doc_id residues; found candidates must inline to
    data URIs, missing ones must resolve to canonical absolute URLs, and
    the data-original-* attributes must preserve the raw values verbatim.
    The converted img's attributes are read back by the production HTML5
    parser and every field is rebuilt by the oracle."""
    from ..kernel.dom import Element, parse_html
    from ..stages.extract import ExtractBatch

    prefix = "https://srcset.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        htmls, urls = [], []
        for d in ids:
            url = f"{prefix}{d}"
            body = (
                f"<html><head><title>doc-{d}</title></head><body>"
                f'<img srcset="a{d}.png 1x, b{d}.png 2x" src="c{d}.png">'
                f"</body></html>")
            parts = [
                f"------=_B\r\nContent-Type: text/html\r\n"
                f"Content-Location: {url}\r\n\r\n{body}\r\n"
            ]
            for name, present in ((f"a{d}.png", d % 2 == 0),
                                  (f"b{d}.png", d % 3 == 0),
                                  (f"c{d}.png", d % 5 == 0)):
                if present:
                    parts.append(
                        f"------=_B\r\nContent-Type: image/png\r\n"
                        f"Content-Location: {prefix}{name}\r\n\r\n"
                        f"P{name[0]}{d}\r\n")
            htmls.append((
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                + "".join(parts) + "------=_B--\r\n").encode())
            urls.append(url)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    kernel = ExtractBatch(keep_html=True)

    def report(batch: pa.Table) -> pa.Table:
        out = kernel(batch)
        doc_ids, srcsets, srcs, origs = [], [], [], []
        for u, html in zip(batch.column("url").to_pylist(),
                           out.column("html_out").to_pylist()):
            doc_ids.append(int(u.rsplit("/", 1)[1]))
            img = None
            stack = list(parse_html(html.decode("utf-8")).child_nodes)
            while stack:
                node = stack.pop()
                if isinstance(node, Element):
                    if node.tag_name.lower() == "img":
                        img = node
                        break
                    stack.extend(node.child_nodes)
            srcsets.append(img.get_attribute("srcset") if img else None)
            srcs.append(img.get_attribute("src") if img else None)
            origs.append(img.get_attribute("data-original-srcset")
                         if img else None)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "srcset": pa.array(srcsets, pa.string()),
            "src": pa.array(srcs, pa.string()),
            "orig_srcset": pa.array(origs, pa.string()),
        })

    pages_ds = ds.map_batches(pages, batch_format="pyarrow")
    out = pages_ds.map_batches(report, batch_format="pyarrow", batch_size=128)
    return _sorted_table(out, ["doc_id"])


def q_char_entropy(sf_dir: str):
    """Character-distribution entropy (functions/textstats.char_entropy_batch):
    the integer-quantized contract (count × FLOOR(1e6 × −ln(count/n)) per
    DISTINCT character, then an integer sum) makes a float-log quality
    signal exactly SQL-restatable — the dsir log-ratio discipline applied
    to an entropy score."""
    from ..functions.textstats import char_entropy_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(char_entropy_batch, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_base_href_links(sf_dir: str):
    """<base href> resolution (P23 + the convert walk's base handling, now
    shared by crawl discovery): even doc_ids carry a <base> pointing at a
    DIFFERENT origin, odd ones none — both the parent-hop (../) and the
    root-absolute (/) reference must resolve against the right base. The
    production MIME+DOM hyperlink discovery produces the URLs; the oracle
    rebuilds RFC 3986 resolution arithmetically."""
    from ..frontier.discovery import discover_hyperlinks

    prefix = "https://links.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def rows(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        out_ids, up_urls, root_urls = [], [], []
        for d in ids:
            base_tag = (f'<base href="https://base{d % 5}.example/sub/dir/">'
                        if d % 2 == 0 else "")
            body = (
                f"<html><head>{base_tag}</head><body>"
                f'<a href="../up{d}.html">u</a>'
                f'<a href="/root{d}.html">r</a></body></html>')
            blob = (
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                "------=_B\r\nContent-Type: text/html\r\n"
                f"Content-Location: {prefix}{d}\r\n\r\n{body}\r\n"
                "------=_B--\r\n").encode()
            links = discover_hyperlinks(blob)
            out_ids.append(d)
            up_urls.append(links[0] if len(links) > 0 else None)
            root_urls.append(links[1] if len(links) > 1 else None)
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "up_url": pa.array(up_urls, pa.string()),
            "root_url": pa.array(root_urls, pa.string()),
        })

    out = ds.map_batches(rows, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_transfer_decode(sf_dir: str):
    """Content-Transfer-Encoding decoders (P12 quoted-printable, P13
    forgiving base64) in the gate: each document's page body ships
    QP-encoded (odd doc_ids) or base64-encoded (even), and extraction must
    return the extract_text contract byte-identically — titles and the full
    pre-block text — through the decode + charset cascade."""
    import base64 as _b64
    import quopri as _quopri

    import html as _html

    from ..stages.extract import ExtractBatch

    prefix = "https://td.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        urls, blobs = [], []
        for d, t in zip(ids, texts):
            escaped = _html.escape(t or "", quote=False)
            doc = (f"<html><head><title>doc-{d}</title></head>"
                   f"<body><pre>{escaped}</pre></body></html>").encode("utf-8")
            if d % 2 == 1:
                enc, body = b"quoted-printable", _quopri.encodestring(doc)
            else:
                enc, body = b"base64", _b64.encodebytes(doc)
            blobs.append(
                b"MIME-Version: 1.0\r\n"
                b'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                b"------=_B\r\nContent-Type: text/html; charset=utf-8\r\n"
                b"Content-Transfer-Encoding: " + enc + b"\r\n"
                b"Content-Location: " + f"{prefix}{d}".encode() + b"\r\n\r\n"
                + body + b"\r\n------=_B--\r\n")
            urls.append(f"{prefix}{d}")
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(blobs, pa.binary())})

    extracted = ds.map_batches(pages, batch_format="pyarrow").map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=128)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("url"),
                         "title": batch.column("title"),
                         "text_out": batch.column("text_out")})

    return _sorted_table(
        extracted.map_batches(project, batch_format="pyarrow"), ["url"])


def q_frame_report(sf_dir: str):
    """Frame recursion (C10) in the gate: each page embeds an iframe whose
    child page exists on d%3!=0 rows. A found child must convert
    RECURSIVELY and inline as srcdoc (carrying the child's own <title> —
    the recursion proof), dropping src for data-original-src; a missing
    child keeps the canonical absolute src and lands in unfound."""
    from ..kernel.dom import Element, parse_html
    from ..stages.extract import ExtractBatch

    prefix = "https://frame.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        urls, blobs = [], []
        for d in ids:
            url = f"{prefix}{d}"
            body = (f"<html><head><title>doc-{d}</title></head><body>"
                    f'<iframe src="child{d}.html"></iframe></body></html>')
            parts = [
                f"------=_B\r\nContent-Type: text/html\r\n"
                f"Content-Location: {url}\r\n\r\n{body}\r\n"
            ]
            if d % 3 != 0:
                child = (f"<html><head><title>child-{d}</title></head>"
                         f"<body>c</body></html>")
                parts.append(
                    f"------=_B\r\nContent-Type: text/html\r\n"
                    f"Content-Location: {prefix}child{d}.html\r\n\r\n{child}\r\n")
            blobs.append((
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                + "".join(parts) + "------=_B--\r\n").encode())
            urls.append(url)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(blobs, pa.binary())})

    kernel = ExtractBatch(keep_html=True)

    def report(batch: pa.Table) -> pa.Table:
        out = kernel(batch)
        doc_ids, srcs, has_title, n_unfound = [], [], [], []
        for u, html, unfound in zip(batch.column("url").to_pylist(),
                                    out.column("html_out").to_pylist(),
                                    out.column("unfound_resources").to_pylist()):
            d = int(u.rsplit("/", 1)[1])
            doc_ids.append(d)
            n_unfound.append(len(unfound))
            frame = None
            stack = list(parse_html(html.decode("utf-8")).child_nodes)
            while stack:
                node = stack.pop()
                if isinstance(node, Element):
                    if node.tag_name.lower() == "iframe":
                        frame = node
                        break
                    stack.extend(node.child_nodes)
            srcs.append(frame.get_attribute("src") if frame else None)
            srcdoc = frame.get_attribute("srcdoc") if frame else None
            has_title.append(
                bool(srcdoc) and f"<title>child-{d}</title>" in srcdoc)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame_src": pa.array(srcs, pa.string()),
            "has_child_title": pa.array(has_title, pa.bool_()),
            "n_unfound": pa.array(n_unfound, pa.int64()),
        })

    pages_ds = ds.map_batches(pages, batch_format="pyarrow")
    out = pages_ds.map_batches(report, batch_format="pyarrow", batch_size=128)
    return _sorted_table(out, ["doc_id"])


def q_synth_index(sf_dir: str):
    """Synthesized-index conversion (C2 + the index-synthesized anomaly,
    convert.js:663-679 parity): archives holding NO html page must render
    the way a browser would — doc_id%3==0 rows ship only an image (the
    synthesized page is one <img> whose src inlines to a data URI),
    %3==1 rows only text/plain (one <pre>, extracted text round-trips),
    %3==2 rows a normal page (control). Title, text, anomaly type and the
    img data URI are all rebuilt by the oracle."""
    from ..kernel.dom import Element, parse_html
    from ..stages.extract import ExtractBatch

    prefix = "https://synth.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        urls, blobs = [], []
        for d in ids:
            r = d % 3
            if r == 0:
                part = (f"------=_B\r\nContent-Type: image/png\r\n"
                        f"Content-Location: {prefix}img{d}.png\r\n\r\nPi{d}\r\n")
            elif r == 1:
                part = (f"------=_B\r\nContent-Type: text/plain\r\n"
                        f"Content-Location: {prefix}t{d}.txt\r\n\r\n"
                        f"plain {d} x\r\n")
            else:
                part = (f"------=_B\r\nContent-Type: text/html\r\n"
                        f"Content-Location: {prefix}{d}\r\n\r\n"
                        f"<html><head><title>doc-{d}</title></head>"
                        f"<body><pre>body {d}</pre></body></html>\r\n")
            blobs.append((
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                + part + "------=_B--\r\n").encode())
            urls.append(f"{prefix}{d}")
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(blobs, pa.binary())})

    kernel = ExtractBatch(keep_html=True)

    def report(batch: pa.Table) -> pa.Table:
        out = kernel(batch)
        doc_ids, titles, texts, anomaly_types, img_srcs = [], [], [], [], []
        for u, title, text, anoms, html in zip(
                batch.column("url").to_pylist(),
                out.column("title").to_pylist(),
                out.column("text_out").to_pylist(),
                out.column("anomalies").to_pylist(),
                out.column("html_out").to_pylist()):
            doc_ids.append(int(u.rsplit("/", 1)[1]))
            titles.append(title)
            texts.append(text)
            anomaly_types.append(anoms[0]["type"] if anoms else None)
            img = None
            stack = list(parse_html(html.decode("utf-8")).child_nodes)
            while stack:
                node = stack.pop()
                if isinstance(node, Element):
                    if node.tag_name.lower() == "img":
                        img = node
                        break
                    stack.extend(node.child_nodes)
            img_srcs.append(img.get_attribute("src") if img else None)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "text_out": pa.array(texts, pa.string()),
            "anomaly_type": pa.array(anomaly_types, pa.string()),
            "img_src": pa.array(img_srcs, pa.string()),
        })

    pages_ds = ds.map_batches(pages, batch_format="pyarrow")
    out = pages_ds.map_batches(report, batch_format="pyarrow", batch_size=128)
    return _sorted_table(out, ["doc_id"])


def q_mhtml_recursion(sf_dir: str):
    """Embedded-MHTML recursion (P21): the outer archive's iframe points at
    a multipart/related resource — ITSELF a complete MHTML archive — which
    must parse and convert recursively so the inner page's title lands
    inside the outer srcdoc. Present on d%4!=0 rows; missing nested
    archives report unfound."""
    from ..stages.extract import ExtractBatch

    prefix = "https://nest.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        urls, blobs = [], []
        for d in ids:
            url = f"{prefix}{d}"
            root = (f"<html><head><title>doc-{d}</title></head><body>"
                    f'<iframe src="nested{d}.mht"></iframe></body></html>')
            parts = [
                f"------=_B\r\nContent-Type: text/html\r\n"
                f"Content-Location: {url}\r\n\r\n{root}\r\n"
            ]
            if d % 4 != 0:
                inner_page = (f"<html><head><title>inner-{d}</title></head>"
                              f"<body>in</body></html>")
                inner = (
                    "MIME-Version: 1.0\r\n"
                    'Content-Type: multipart/related; boundary="----=_I"\r\n'
                    "\r\n------=_I\r\nContent-Type: text/html\r\n"
                    f"Content-Location: https://inner.example/{d}\r\n\r\n"
                    f"{inner_page}\r\n------=_I--\r\n")
                parts.append(
                    f"------=_B\r\nContent-Type: multipart/related\r\n"
                    f"Content-Location: {prefix}nested{d}.mht\r\n\r\n"
                    f"{inner}\r\n")
            blobs.append((
                "MIME-Version: 1.0\r\n"
                'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                + "".join(parts) + "------=_B--\r\n").encode())
            urls.append(url)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(blobs, pa.binary())})

    kernel = ExtractBatch(keep_html=True)

    def report(batch: pa.Table) -> pa.Table:
        out = kernel(batch)
        doc_ids, has_inner, n_unfound = [], [], []
        for u, html, unfound in zip(batch.column("url").to_pylist(),
                                    out.column("html_out").to_pylist(),
                                    out.column("unfound_resources").to_pylist()):
            d = int(u.rsplit("/", 1)[1])
            doc_ids.append(d)
            has_inner.append(f"&lt;title&gt;inner-{d}&lt;/title&gt;".encode()
                             in html
                             or f"<title>inner-{d}</title>".encode() in html)
            n_unfound.append(len(unfound))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "has_inner_title": pa.array(has_inner, pa.bool_()),
            "n_unfound": pa.array(n_unfound, pa.int64()),
        })

    pages_ds = ds.map_batches(pages, batch_format="pyarrow")
    out = pages_ds.map_batches(report, batch_format="pyarrow", batch_size=128)
    return _sorted_table(out, ["doc_id"])


def q_quality_ensemble(sf_dir: str):
    """Stacked quality gate the way real curation pipelines run them
    (FineWeb's own recipe stacks URL → line-shape → token-shape filters):
    C4 rules, then Gopher rules, then the FineWeb line-shape rules over the
    SAME raw text, first-failing STAGE:rule as the drop reason — computed
    in ONE fused map_batches pass (each kernel is already independently
    oracle-green; the ensemble pins the composition and precedence). Zero
    shuffle; the oracle is generated from the committed c4/gopher SQL so
    the stages can never drift."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        sw = textstats.stopword_stats_batch(batch)
        rep = textstats.repetition_stats_batch(batch)
        gop = textstats.gopher_stats_batch(batch)
        fw = textstats.fineweb_stats_batch(batch)
        n_chars = pc.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False)
        ratio = sw.column("stopword_ratio").to_numpy(zero_copy_only=False)
        dup = rep.column("dup_bigram_frac").to_numpy(zero_copy_only=False)
        ok_length = (n_chars >= 150) & (n_chars <= 450)
        ok_stop = ratio >= 0.03
        ok_rep = dup <= 0.06
        c4_keep = ok_length & ok_stop & ok_rep
        c4_reason = np.where(
            ~ok_length, "length",
            np.where(~ok_stop, "stopwords",
                     np.where(~ok_rep, "repetition", "")))
        g_keep = gop.column("keep").to_numpy(zero_copy_only=False)
        g_reason = gop.column("drop_reason").to_pylist()
        f_keep = fw.column("keep").to_numpy(zero_copy_only=False)
        f_reason = fw.column("drop_reason").to_pylist()
        keep = c4_keep & g_keep & f_keep
        reasons = []
        for i in range(len(batch)):
            if not c4_keep[i]:
                reasons.append("c4:" + str(c4_reason[i]))
            elif not g_keep[i]:
                reasons.append("gopher:" + str(g_reason[i]))
            elif not f_keep[i]:
                reasons.append("fineweb:" + str(f_reason[i]))
            else:
                reasons.append(None)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "keep": pa.array(keep, pa.bool_()),
            "drop_reason": pa.array(reasons, pa.string()),
        })

    return _sorted_table(
        ds.map_batches(batch_fn, batch_format="pyarrow"), ["doc_id"])


def q_sitemap_extract(sf_dir: str):
    """robots.txt → Sitemap expansion (frontier/scheduler._sitemap_seed_urls
    — RFC 9309 global Sitemap lines + sitemaps.org <loc>, one level of
    <sitemapindex> indirection): ten fixture origins derived from the
    documents table each serve a robots.txt and sitemap tree over a scripted
    DictTransport; origins with k%3==0 publish a sitemapindex (two child
    sitemaps), the rest a plain two-loc sitemap. Seed-list expansion is
    DRIVER-SIDE BY DESIGN (bounded by seed-host count, the documented
    shape); the per-URL output table is what the oracle rebuilds."""
    from ..frontier.scheduler import _sitemap_seed_urls
    from ..frontier.transports import DictTransport

    ds = _read(sf_dir, "documents", ["doc_id"])

    def residue(batch: pa.Table) -> pa.Table:
        # project to ≤10 distinct values per block BEFORE anything moves —
        # a groupby on raw doc_id would shuffle one row per document just
        # to take % 10 on the driver
        values = sorted(set(
            (batch.column("doc_id").to_numpy(zero_copy_only=False)
             % 10).tolist()))
        return pa.table({"k": pa.array(values, pa.int64())})

    residues = sorted({
        int(r["k"])
        for r in ds.map_batches(residue, batch_format="pyarrow")
        .groupby("k").count().take_all()
    })

    routes: dict = {}
    seeds = []
    for k in residues:
        origin = f"https://s{k}.fixture.invalid"
        seeds.append(f"{origin}/")
        routes[f"{origin}/robots.txt"] = (
            "text/plain",
            f"User-agent: *\nAllow: /\nSitemap: {origin}/sitemap.xml\n")
        if k % 3 == 0:
            routes[f"{origin}/sitemap.xml"] = (
                "application/xml",
                "<sitemapindex>"
                f"<sitemap><loc>{origin}/sm1.xml</loc></sitemap>"
                f"<sitemap><loc>{origin}/sm2.xml</loc></sitemap>"
                "</sitemapindex>")
            routes[f"{origin}/sm1.xml"] = (
                "application/xml",
                f"<urlset><url><loc>{origin}/p{k}1</loc></url>"
                f"<url><loc>{origin}/p{k}2</loc></url></urlset>")
            routes[f"{origin}/sm2.xml"] = (
                "application/xml",
                f"<urlset><url><loc>{origin}/q{k}1</loc></url></urlset>")
        else:
            routes[f"{origin}/sitemap.xml"] = (
                "application/xml",
                f"<urlset><url><loc>{origin}/p{k}1</loc></url>"
                f"<url><loc>{origin}/p{k}2</loc></url></urlset>")

    urls = _sitemap_seed_urls(DictTransport(routes), seeds)
    table = pa.table({"url": pa.array(sorted(urls), pa.string())})
    return table


def q_wat_roundtrip(sf_dir: str):
    """WAT round trip (sources/warc.write_wat → read_wat — the metadata
    member of the WARC/WET/WAT/CDX quartet): anchor-bearing pages → WAT
    'metadata' records (production-parser head metadata + discovery-walk
    outlinks as sorted-key JSON, deterministic record ids) → read back and
    flatten. Title, link list (walk order), counts and the UTC stamp are
    all rebuilt by the oracle."""
    import glob
    import hashlib
    import os
    import shutil

    from ..sources.warc import read_wat, write_wat
    from .flagship import PAGE_URL_PREFIX, wrap_mhtml

    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        blobs, urls = [], []
        for d in ids:
            nxt, hub = d + 1, (d * 7 + 3) % 1000
            body = (
                f"<html><head><title>doc-{d}</title></head><body>"
                f'<p><a href="{PAGE_URL_PREFIX}{nxt}">n</a></p>'
                f'<p><a href="{PAGE_URL_PREFIX}{hub}">h</a></p>'
                f"</body></html>")
            blobs.append(wrap_mhtml(d, body))
            urls.append(f"{PAGE_URL_PREFIX}{d}")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [1_767_225_600_000_000 + d for d in ids],
                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(blobs, pa.binary()),
        })

    out_dir = "/tmp/mhtml_ray_gate_wat_" + hashlib.sha1(
        f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)
    write_wat(ds.map_batches(pages, batch_format="pyarrow"), out_dir,
              ts_col="warc_ts")
    wat = read_wat(sorted(glob.glob(f"{out_dir}/*.warc.wat.gz")))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "wat_ts_us": batch.column("wat_ts").cast(pa.int64()),
            "title": batch.column("title"),
            "n_links": batch.column("n_links"),
            "links": batch.column("links"),
        })

    out = _sorted_table(
        wat.map_batches(project, batch_format="pyarrow"), ["url"])
    _rmtree(out_dir)  # eager above — shards now dead
    return out


def q_cdx_lookup(sf_dir: str):
    """The CDX READ path (sources/warc.cdx_lookup): build the capture index
    over the same synthesized captures as cdx_index, write it as CDXJ
    shards + secondary index, then point-look-up every doc_id%97==0 key
    through the two-level binary search. A hash match proves the sink's
    20-digit stamp framing, shard ranges and bisection all round-trip; the
    oracle is GENERATED from the committed cdx_index SQL filtered to the
    probed keys (ts encodes doc_id)."""
    import hashlib
    import os
    import shutil

    from ..frontier.canon import surt_key
    from ..sources.warc import cdx_index, cdx_lookup, write_cdx

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        urls = [f"https://{s}.{l}.example.org/doc/{d}?v=1"
                for d, l, s in zip(doc_ids, langs, sources)]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "ts": pa.array([1700000000 + int(d) for d in doc_ids], pa.int64()),
            "html": batch.column("text"),
        })

    out_dir = "/tmp/mhtml_ray_gate_cdxl_" + hashlib.sha1(
        f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)
    cdx = cdx_index(ds.map_batches(pages, batch_format="pyarrow"),
                    url_col="url", ts_col="ts", payload_col="html")
    write_cdx(cdx, out_dir)

    probes = (
        ds.select_columns(["doc_id", "lang", "source"])
        .map_batches(
            lambda b: b.filter(pa.array(
                (b.column("doc_id").to_numpy(zero_copy_only=False) % 97) == 0)),
            batch_format="pyarrow")
        .take_all()
    )
    rows: list[dict] = []
    for probe in probes:
        url = (f"https://{probe['source']}.{probe['lang']}.example.org/doc/"
               f"{probe['doc_id']}?v=1")
        rows.extend(cdx_lookup(out_dir, surt_key(url)))
    _rmtree(out_dir)
    table = pa.Table.from_pylist(rows) if rows else pa.table(
        {"surt": pa.array([], pa.string())})
    return table.sort_by([("surt", "ascending"), ("ts", "ascending")])


def q_host_pagerank(sf_dir: str):
    """PageRank over the HOST graph (the Common Crawl host-level ranking
    product): the same deterministic host edges as host_graph (k → (k+1)%7
    and k → (k*3+1)%7, one edge per page per link — multi-edges weight the
    walk naturally) through functions/graph.pagerank_units' integer
    fixed-point contract. The oracle is GENERATED from the committed
    pagerank SQL with the events edge table swapped for the host edges, so
    the superstep arithmetic can never drift between the two entries."""
    from ..functions import graph

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        k = (d % 7).astype(np.int64)
        src = np.concatenate([k, k])
        dst = np.concatenate([((d + 1) % 7).astype(np.int64),
                              ((d * 3 + 1) % 7).astype(np.int64)])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    ranks = graph.pagerank_units(
        ds.map_batches(edges, batch_format="pyarrow"), n_iter=2)
    return _sorted_table(ranks, ["node"])


def q_extract_errors(sf_dir: str):
    """Per-row error isolation (mod.js:67-74 parity, stages/extract.py
    _error_row): doc_id%3==0 rows ship unconvertible bytes (no archive, no
    markup) MIXED into batches with valid pages — the bad rows must land
    with the exact 'Index page not found' error and empty outputs while
    their batch neighbors extract normally; a task-level failure or an
    error bleeding across rows breaks the hash."""
    from ..stages.extract import ExtractBatch

    prefix = "https://err.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        urls, blobs = [], []
        for d in ids:
            if d % 3 == 0:
                # fixed \x00\xff prefix: never MIME, never sniffs as markup
                # (a doc_id-derived first byte hit 0x3C='<' and turned one
                # row into a valid sniffed page)
                blob = b"\x00\xff not an archive " + str(d).encode()
            else:
                body = (f"<html><head><title>doc-{d}</title></head>"
                        f"<body><pre>ok {d}</pre></body></html>")
                blob = (
                    "MIME-Version: 1.0\r\n"
                    'Content-Type: multipart/related; boundary="----=_B"\r\n'
                    "\r\n------=_B\r\nContent-Type: text/html\r\n"
                    f"Content-Location: {prefix}{d}\r\n\r\n{body}\r\n"
                    "------=_B--\r\n").encode()
            urls.append(f"{prefix}{d}")
            blobs.append(blob)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(blobs, pa.binary())})

    extracted = ds.map_batches(pages, batch_format="pyarrow").map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=128)

    def report(batch: pa.Table) -> pa.Table:
        doc_ids = [int(u.rsplit("/", 1)[1])
                   for u in batch.column("url").to_pylist()]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "error": batch.column("error"),
            "title": batch.column("title"),
            "text_out": batch.column("text_out"),
        })

    out = extracted.map_batches(report, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_charset_bom_report(sf_dir: str):
    """BOM precedence (P15: util.js BOM sniff outranks every declaration):
    each page carries a WRONG meta charset (koi8-r) while the actual bytes
    are UTF-16LE (even doc_ids, FF FE BOM) or UTF-8 (odd, EF BB BF BOM);
    the non-ASCII title round-trips only if the BOM wins the cascade."""
    from ..stages.extract import ExtractBatch

    prefix = "https://bom.fixture.invalid/"
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pages(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        urls, blobs = [], []
        for d in ids:
            doc = (
                '<html><head><meta http-equiv="Content-Type" '
                'content="text/html; charset=koi8-r">'
                f"<title>Бом-{d}</title></head><body><p>b</p></body></html>")
            if d % 2 == 0:
                payload = b"\xff\xfe" + doc.encode("utf-16-le")
            else:
                payload = b"\xef\xbb\xbf" + doc.encode("utf-8")
            blobs.append(
                b"MIME-Version: 1.0\r\n"
                b'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
                b"------=_B\r\nContent-Type: text/html\r\n"
                b"Content-Location: " + f"{prefix}{d}".encode() + b"\r\n\r\n"
                + payload + b"\r\n------=_B--\r\n")
            urls.append(f"{prefix}{d}")
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(blobs, pa.binary())})

    extracted = ds.map_batches(pages, batch_format="pyarrow").map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=128)

    def report(batch: pa.Table) -> pa.Table:
        doc_ids = [int(u.rsplit("/", 1)[1])
                   for u in batch.column("url").to_pylist()]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "title": batch.column("title"),
        })

    out = extracted.map_batches(report, batch_format="pyarrow")
    return _sorted_table(out, ["doc_id"])


def q_sft_format(sf_dir: str):
    """SFT example formatting — the last hop before a fine-tuning data
    loader: each document renders into a prompt/completion template and the
    loss-mask character offsets (loss applies to the completion only) are
    emitted alongside. Pure per-batch string assembly, zero shuffle; every
    byte and offset is rebuilt by the oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def fmt(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        sft, starts, ends = [], [], []
        for d, t, lang in zip(ids, texts, langs):
            t = t or ""
            prompt = f"Summarize document doc-{d}:\n{t}\n"
            completion = f"Summary: lang={lang} chars={len(t)}"
            sft.append(prompt + completion)
            starts.append(len(prompt))
            ends.append(len(prompt) + len(completion))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sft_text": pa.array(sft, pa.string()),
            "loss_start": pa.array(starts, pa.int64()),
            "loss_end": pa.array(ends, pa.int64()),
        })

    return _sorted_table(ds.map_batches(fmt, batch_format="pyarrow"),
                         ["doc_id"])


def q_span_corruption(sf_dir: str):
    """T5-style span-corruption mask selection, made deterministic the
    engine way (no RNG: token i of doc d is masked iff the first md5 byte
    of 'span1:<d>:<i>' < 38, ≈15%): per doc the mask positions, their
    count and the number of CONTIGUOUS spans (adjacent masked tokens merge
    into one sentinel at training time). The oracle recomputes the
    identical md5-byte threshold and the run-starts window count."""
    import hashlib

    from ..functions.textstats import _lm_tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def spans(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        n_tok, n_masked, n_spans, positions = [], [], [], []
        for d, t in zip(ids, texts):
            toks = _lm_tokens(t or "")  # RE2-parity whitespace contract
            masked = [
                i for i in range(1, len(toks) + 1)
                if hashlib.md5(f"span1:{d}:{i}".encode()).digest()[0] < 38
            ]
            runs = sum(1 for j, p in enumerate(masked)
                       if j == 0 or masked[j - 1] != p - 1)
            n_tok.append(len(toks))
            n_masked.append(len(masked))
            n_spans.append(runs)
            positions.append(",".join(str(p) for p in masked))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_masked": pa.array(n_masked, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
            "masked_positions": pa.array(positions, pa.string()),
        })

    return _sorted_table(ds.map_batches(spans, batch_format="pyarrow"),
                         ["doc_id"])


def q_meta_robots_gate(sf_dir: str):
    """Page-level robots directives (the crawl-side complement of
    robots.txt): <meta name=robots> noindex/nofollow tokens and per-anchor
    rel=nofollow, read by the production HTML5 parser — the gate an index
    builder runs before adding a page, and the link filter a polite crawler
    applies before expanding it. Residue lattice: d%4==0 noindex,nofollow;
    1 noindex; 2 nofollow; 3 no directive. Every page carries one plain
    link and one rel=nofollow link."""
    from ..kernel.dom import Element, parse_html

    ds = _read(sf_dir, "documents", ["doc_id"])

    def report(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        indexable, followable = [], []
        for d in ids:
            directive = {0: "noindex, nofollow", 1: "noindex",
                         2: "nofollow", 3: ""}[d % 4]
            meta = (f'<meta name="robots" content="{directive}">'
                    if directive else "")
            html = (
                f"<html><head>{meta}<title>doc-{d}</title></head><body>"
                f'<a href="/plain{d}">p</a>'
                f'<a href="/tracked{d}" rel="nofollow">t</a>'
                f"</body></html>")
            tokens: set[str] = set()
            n_follow = 0
            stack = list(parse_html(html).child_nodes)
            while stack:
                node = stack.pop()
                if not isinstance(node, Element):
                    continue
                tag = node.tag_name.lower()
                if tag == "meta" and \
                        (node.get_attribute("name") or "").lower() == "robots":
                    content = node.get_attribute("content") or ""
                    tokens |= {t.strip().lower()
                               for t in content.split(",") if t.strip()}
                elif tag == "a" and node.get_attribute("href"):
                    rels = (node.get_attribute("rel") or "").lower().split()
                    if "nofollow" not in rels:
                        n_follow += 1
                stack.extend(node.child_nodes)
            page_nofollow = "nofollow" in tokens or "none" in tokens
            indexable.append(
                not ("noindex" in tokens or "none" in tokens))
            followable.append(0 if page_nofollow else n_follow)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "indexable": pa.array(indexable, pa.bool_()),
            "n_followable_links": pa.array(followable, pa.int64()),
        })

    return _sorted_table(ds.map_batches(report, batch_format="pyarrow"),
                         ["doc_id"])


# ---------------------------------------------------------------------------
# registry


QUERIES = {
    # --- driver correctness window (first 50, validated per round at
    # sf0.01 against ORACLE_SQL). Standing rotation policy: order the
    # registry by driver-evidence age — never-driver-checked oracled
    # entries first, then the stalest previously-checked entries — so no
    # entry ages out of evidence. Round 5 puts the 43 never-checked
    # oracled round-4 additions in the window, plus 7 refresh slots for
    # the stalest (last checked r02) rows. ---
    "bigram_lm_score": q_bigram_lm_score,
    "fineweb_filter": q_fineweb_filter,
    "epoch_shuffle": q_epoch_shuffle,
    "token_offsets": q_token_offsets,
    "token_postings": q_token_postings,
    "sample_docs": q_sample_docs,
    "phrase_search": q_phrase_search,
    "ngram_novelty": q_ngram_novelty,
    "pmi_collocations": q_pmi_collocations,
    "cdx_index": q_cdx_index,
    "data_split": q_data_split,
    "capture_dedup": q_capture_dedup,
    "robots_gate": q_robots_gate,
    "dom_stats": q_dom_stats,
    "warc_extract": q_warc_extract,
    "url_strip_tracking": q_url_strip_tracking,
    "pagerank_personalized": q_pagerank_personalized,
    "token_budget_sample": q_token_budget_sample,
    "simhash_blocks": q_simhash_blocks,
    "recrawl_schedule": q_recrawl_schedule,
    "wet_extract": q_wet_extract,
    "unfound_report": q_unfound_report,
    "favicon_report": q_favicon_report,
    "host_graph": q_host_graph,
    "meta_extract": q_meta_extract,
    "script_gate_report": q_script_gate_report,
    "srcset_report": q_srcset_report,
    "char_entropy": q_char_entropy,
    "base_href_links": q_base_href_links,
    "transfer_decode": q_transfer_decode,
    "frame_report": q_frame_report,
    "synth_index": q_synth_index,
    "mhtml_recursion": q_mhtml_recursion,
    "quality_ensemble": q_quality_ensemble,
    "sitemap_extract": q_sitemap_extract,
    "wat_roundtrip": q_wat_roundtrip,
    "cdx_lookup": q_cdx_lookup,
    "host_pagerank": q_host_pagerank,
    "extract_errors": q_extract_errors,
    "charset_bom_report": q_charset_bom_report,
    "sft_format": q_sft_format,
    "span_corruption": q_span_corruption,
    "meta_robots_gate": q_meta_robots_gate,
    # --- refresh slots: oracled entries last driver-checked in r02,
    # re-validated at HEAD ---
    "langid": q_langid,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "embedding_topk": q_embedding_topk,
    "doc_fingerprint": q_doc_fingerprint,
    "media_decode": q_media_decode,
    "lang_distribution": q_lang_distribution,
    # --- below the 50-entry window. First: the never-driver-checked
    # no_oracle entries (rows-only evidence lives in
    # scripts/check_correctness.py + tests/; the judge ran them 5/5 OK
    # in round 4). Then all remaining entries ordered by the round of
    # their most recent green driver CORRECTNESS row (r02 → r03 → r04),
    # i.e. first in line for future rotations. ---
    "neardup_incremental": q_neardup_incremental,
    "compression_ratio": q_compression_ratio,
    "embedding_kmeans": q_embedding_kmeans,
    "bpe_train_merges": q_bpe_train_merges,
    "bpe_encode_counts": q_bpe_encode_counts,
    # --- last driver-checked r02 ---
    "embedding_label_stats": q_embedding_label_stats,
    "token_count_bpe": q_token_count_bpe,
    "stopword_stats": q_stopword_stats,
    "quality_score": q_quality_score,
    "repetition_stats": q_repetition_stats,
    "length_filter": q_length_filter,
    "dedup_simhash": q_dedup_simhash,
    "embedding_ann": q_embedding_ann,
    "embedding_ivf": q_embedding_ivf,
    "embedding_ivf_indexed": q_embedding_ivf_indexed,
    "dedup_embedding": q_dedup_embedding,
    "crawl_bfs_wave1": q_crawl_bfs_wave1,
    "extract_charset_title": q_extract_charset_title,
    "canonicalize_urls": q_canonicalize_urls,
    "url_seen_antijoin": q_url_seen_antijoin,
    "extract_text": q_extract_text,
    "q1_pricing_summary": q1_pricing_summary,
    "connected_components": q_connected_components,
    "pagerank": q_pagerank,
    "extract_page_stats": q_extract_page_stats,
    "extract_anomaly_stats": q_extract_anomaly_stats,
    "frontier_seed": q_frontier_seed,
    "frontier_host_budget": q_frontier_host_budget,
    "frontier_topk": q_frontier_topk,
    "top_orders_by_revenue": q_top_orders_by_revenue,
    "revenue_by_nation": q_revenue_by_nation,
    "customer_big_order_semi": q_customer_big_order_semi,
    "events_value_stats": q_events_value_stats,
    "events_value_outliers": q_events_value_outliers,
    "events_running_total": q_events_running_total,
    "events_first_last": q_events_first_last,
    "length_quantiles_by_lang": q_length_quantiles_by_lang,
    "length_percentile_rank": q_length_percentile_rank,
    "orders_pushdown_count": q_orders_pushdown_count,
    "value_quantiles_tdigest": q_value_quantiles_tdigest,
    "normalize_text": q_normalize_text,
    "domain_sample": q_domain_sample,
    "length_histogram": q_length_histogram,
    "customer_no_big_order_anti": q_customer_no_big_order_anti,
    "customer_big_order_counts": q_customer_big_order_counts,
    "customer_order_full_audit": q_customer_order_full_audit,
    "supplier_count_by_region": q_supplier_count_by_region,
    "part_type_stats": q_part_type_stats,
    "events_tumbling": q_events_tumbling,
    "events_hopping": q_events_hopping,
    "events_props_extract": q_events_props_extract,
    "event_type_pivot": q_event_type_pivot,
    "events_moving_avg": q_events_moving_avg,
    "sales_rollup": q_sales_rollup,
    "events_lag_gap": q_events_lag_gap,
    "events_sessionize": q_events_sessionize,
    "events_asof_join": q_events_asof_join,
    "events_range_count": q_events_range_count,
    "winnow_pairs": q_winnow_pairs,
    "top_users": q_top_users,
    "distinct_segments": q_distinct_segments,
    "top_tokens": q_top_tokens,
    "approx_distinct_tokens": q_approx_distinct_tokens,
    "approx_top_tokens": q_approx_top_tokens,
    "top_tokens_per_lang": q_top_tokens_per_lang,
    "bpe_pair_counts": q_bpe_pair_counts,
    "pack_sequences": q_pack_sequences,
    "train_prep": q_train_prep,
    "chunk_spans": q_chunk_spans,
    "source_quality_filter": q_source_quality_filter,
    "c4_filter": q_c4_filter,
    "gopher_filter": q_gopher_filter,
    "lm_score": q_lm_score,
    "tfidf_topk": q_tfidf_topk,
    "inverted_index_stats": q_inverted_index_stats,
    "bm25_topk": q_bm25_topk,
    "sample_stratified": q_sample_stratified,
    "mixture_sample": q_mixture_sample,
    "pii_redact": q_pii_redact,
    "media_decode_real": q_media_decode_real,
    "line_dedup": q_line_dedup,
    "substring_dedup": q_substring_dedup,
    "decontaminate": q_decontaminate,
    "domain_cap": q_domain_cap,
    "length_quantiles": q_length_quantiles,
    "dedup_incremental": q_dedup_incremental,
    "semdedup": q_semdedup,
    "embedding_kmeans_assign": q_embedding_kmeans_assign,
    "shard_manifest": q_shard_manifest,
    "web_curation": q_web_curation,
    "ccnet_buckets": q_ccnet_buckets,
    "hash_classifier": q_hash_classifier,
    "substring_scrub": q_substring_scrub,
    "curation_prep": q_curation_prep,
    "anchor_texts": q_anchor_texts,
    "image_features": q_image_features,
    "image_resize": q_image_resize,
    "image_phash": q_image_phash,
    "phash_dedup": q_phash_dedup,
    "phash_neardup": q_phash_neardup,
    "frame_sample": q_frame_sample,
    "audio_features": q_audio_features,
    "video_meta": q_video_meta,
    "webp_meta": q_webp_meta,
    "dedup_minhash": q_dedup_minhash,
    "ngram_jaccard": q_ngram_jaccard,
    "hits": q_hits,
    "dsir_select": q_dsir_select,
    "url_blocklist": q_url_blocklist,
    "word_blocklist": q_word_blocklist,
    "boilerplate": q_boilerplate,
    "langid_confusion": q_langid_confusion,
    "more_like_this": q_more_like_this,
    "self_dedup_lines": q_self_dedup_lines,
    "embedding_pq_topk": q_embedding_pq_topk,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
}


ORACLE_SQL = {
    "phrase_search": r"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS l
            FROM documents),
        flat AS (
            SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
            FROM toks),
        phrase(slot, ptok) AS (SELECT * FROM (VALUES (0, 'batch'), (1, 'batch'))),
        anchors AS (
            SELECT f.doc_id, f.pos - p.slot AS anchor
            FROM flat f JOIN phrase p ON f.tok = p.ptok
            GROUP BY f.doc_id, f.pos - p.slot
            HAVING COUNT(*) = 2)
        SELECT doc_id, COUNT(*) AS n_matches, MIN(anchor) AS first_pos
        FROM anchors GROUP BY doc_id ORDER BY doc_id
    """,
    "ngram_novelty": r"""
        WITH arr AS (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS l
            FROM documents),
        grams AS (
            SELECT DISTINCT doc_id,
                   unnest([array_to_string(l[i:i+2], ' ')
                           FOR i IN generate_series(1, len(l)-2)]) AS gram
            FROM arr WHERE len(l) >= 3),
        dfs AS (SELECT gram, COUNT(*) AS df FROM grams GROUP BY gram)
        SELECT g.doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
        FROM grams g JOIN dfs d USING (gram)
        GROUP BY g.doc_id ORDER BY g.doc_id
    """,
    "cdx_index": """
        SELECT 'org,example,' || lang || ',' || source || ')/doc/'
                   || CAST(doc_id AS VARCHAR) || '?v=1' AS surt,
               1700000000 + doc_id AS ts,
               'https://' || source || '.' || lang || '.example.org/doc/'
                   || CAST(doc_id AS VARCHAR) || '?v=1' AS url,
               md5(text) AS digest,
               octet_length(encode(text)) AS n_bytes
        FROM documents ORDER BY surt, ts
    """,
    "data_split": """
        WITH h AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5('split1'
                       || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
            FROM documents)
        SELECT doc_id,
               CASE WHEN hv < 3435973836 THEN 'train'
                    WHEN hv < 3865470566 THEN 'val'
                    ELSE 'test' END AS split
        FROM h ORDER BY doc_id
    """,
    "capture_dedup": """
        WITH caps AS (
            SELECT 'org,example,' || lang || ',' || source || ')/doc/'
                       || CAST(doc_id AS VARCHAR) || '?v=1' AS surt,
                   1700000000 + doc_id AS ts, md5(text) AS digest
            FROM documents
            UNION ALL
            SELECT 'org,example,' || lang || ',' || source || ')/doc/'
                       || CAST(doc_id AS VARCHAR) || '?v=1' AS surt,
                   1700000000 + doc_id + 100 AS ts,
                   md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                            ELSE text END) AS digest
            FROM documents)
        SELECT surt, COUNT(*) AS n_captures,
               COUNT(DISTINCT digest) AS n_versions, MAX(ts) AS last_ts
        FROM caps GROUP BY surt ORDER BY surt
    """,
    "robots_gate": """
        WITH pages AS (
            SELECT doc_id,
                   'https://' || source || '.' || lang || '.example.org'
                       AS origin,
                   CASE doc_id % 4
                        WHEN 0 THEN '/private/x' WHEN 1 THEN '/private/ok/x'
                        WHEN 2 THEN '/tmp' ELSE '/pub/x' END
                       || CAST(doc_id AS VARCHAR) AS path
            FROM documents)
        SELECT doc_id, origin || path AS url,
               CASE WHEN path LIKE '/private/ok/%' THEN TRUE
                    WHEN path LIKE '/private/%' THEN FALSE
                    WHEN path LIKE '/tmp%' THEN FALSE
                    ELSE TRUE END AS allowed
        FROM pages ORDER BY doc_id
    """,
    "dom_stats": """
        SELECT doc_id,
               7 + (doc_id % 4 + 1) + (doc_id % 3) AS n_elements,
               GREATEST(4, 3 + doc_id % 3) AS max_depth,
               doc_id % 4 + 1 AS n_links,
               LENGTH(text)
                   - CASE WHEN text LIKE chr(10) || '%' THEN 1 ELSE 0 END
                   AS pre_chars
        FROM documents ORDER BY doc_id
    """,
    # winnowing restated exactly (see q_winnow_pairs docstring); docs
    # shorter than k=8 chars fingerprint as the little-endian md5 u64 of
    # the whole text (none exist in the fixtures, branch kept for parity)
    "winnow_pairs": r"""
        WITH RECURSIVE pow(i, w) AS (
            SELECT 0, CAST(1 AS HUGEINT)
            UNION ALL
            SELECT i + 1, (w * 257) % 18446744073709551616
            FROM pow WHERE i < 7),
        chars AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch,
                   generate_subscripts(regexp_extract_all(text, '(?s).'), 1)
                       AS pos
            FROM documents),
        codes AS (SELECT doc_id, pos, unicode(ch) AS code FROM chars),
        doclen AS (SELECT doc_id, LENGTH(text) AS n FROM documents),
        starts AS (
            SELECT doc_id, unnest(range(1, n - 8 + 2)) AS i
            FROM doclen WHERE n >= 8),
        hash AS (
            SELECT s.doc_id, s.i,
                CAST(SUM(CAST(c.code AS HUGEINT) * p.w)
                     % 18446744073709551616 AS HUGEINT) AS h
            FROM starts s
            JOIN codes c ON c.doc_id = s.doc_id
                AND c.pos BETWEEN s.i AND s.i + 7
            JOIN pow p ON p.i = 7 - (c.pos - s.i)
            GROUP BY s.doc_id, s.i),
        nh AS (SELECT doc_id, COUNT(*) AS m FROM hash GROUP BY doc_id),
        wstarts AS (
            SELECT n2.doc_id, unnest(range(1, n2.m - 4 + 2)) AS s
            FROM nh n2 WHERE n2.m > 4),
        wmins AS (
            SELECT w.doc_id, w.s, MIN(h.h) AS mn
            FROM wstarts w JOIN hash h ON h.doc_id = w.doc_id
                AND h.i BETWEEN w.s AND w.s + 3
            GROUP BY w.doc_id, w.s),
        fps_long AS (SELECT DISTINCT doc_id, mn AS h FROM wmins),
        fps_short AS (
            SELECT h.doc_id, MIN(h.h) AS h FROM hash h JOIN nh USING (doc_id)
            WHERE nh.m <= 4 GROUP BY h.doc_id),
        fps_tiny AS (
            SELECT doc_id,
                   CAST(CAST(concat('0x', substr(md5(text), 1, 2)) AS BIGINT)
                        AS HUGEINT)
                 + CAST(concat('0x', substr(md5(text), 3, 2)) AS BIGINT) * 256
                 + CAST(concat('0x', substr(md5(text), 5, 2)) AS BIGINT) * 65536
                 + CAST(concat('0x', substr(md5(text), 7, 2)) AS BIGINT) * 16777216
                 + CAST(concat('0x', substr(md5(text), 9, 2)) AS BIGINT) * 4294967296
                 + CAST(concat('0x', substr(md5(text), 11, 2)) AS BIGINT) * 1099511627776
                 + CAST(concat('0x', substr(md5(text), 13, 2)) AS BIGINT) * 281474976710656
                 + CAST(CAST(concat('0x', substr(md5(text), 15, 2)) AS BIGINT)
                        AS HUGEINT) * 72057594037927936 AS h
            FROM documents WHERE LENGTH(text) BETWEEN 1 AND 7),
        fps AS (
            SELECT DISTINCT doc_id,
                   CAST(h % 9223372036854775808 AS BIGINT) AS fingerprint
            FROM (SELECT * FROM fps_long
                  UNION ALL SELECT * FROM fps_short
                  UNION ALL SELECT * FROM fps_tiny)),
        capped AS (
            SELECT fingerprint, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY fingerprint
                                      ORDER BY doc_id) AS rn
            FROM fps)
        SELECT x.doc_id AS a, y.doc_id AS b,
               COUNT(*) AS shared_fingerprints
        FROM (SELECT * FROM capped WHERE rn <= 64) x
        JOIN (SELECT * FROM capped WHERE rn <= 64) y
            ON x.fingerprint = y.fingerprint AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
        HAVING COUNT(*) >= 25
        ORDER BY a, b
    """,
    # simhash restated exactly (shared CTE chain _SIMHASH_CTE below):
    # token hash = little-endian u64 of md5(token)[:8] (byte k weighted
    # 256^k, bytes 0 and 7 forced through HUGEINT so no term overflows
    # BIGINT); per-bit majority count over ALL tokens (multiplicity kept);
    # output bit j reads count at the byte-internal permutation
    # 8*(j//8)+7-(j%8) (numpy unpackbits order); quarters pack 16 bits
    # each. Tokenless docs are all-zero blocks. The entry strings are
    # composed right after this dict literal.
    "simhash_blocks": "",  # filled from _SIMHASH_CTE below
    "token_budget_sample": r"""
        WITH t AS (
            SELECT doc_id, source,
                   LENGTH(regexp_extract_all(text, '\S+')) AS n_tokens,
                   substr(md5('budget' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS order_hex
            FROM documents)
        SELECT doc_id AS key, source AS stratum,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY order_hex, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before,
               COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY order_hex, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   < 20000 AS keep
        FROM t ORDER BY key
    """,
    "url_strip_tracking": """
        SELECT doc_id,
               CASE doc_id % 4
                    WHEN 0 THEN 'https://t.example.org/p/' || CAST(doc_id AS VARCHAR)
                        || '?utm_source=news&page=' || CAST(doc_id AS VARCHAR)
                        || '&gclid=g' || CAST(doc_id AS VARCHAR)
                    WHEN 1 THEN 'https://t.example.org/p/' || CAST(doc_id AS VARCHAR)
                        || '?fbclid=f' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://t.example.org/p/' || CAST(doc_id AS VARCHAR)
                        || '?page=' || CAST(doc_id AS VARCHAR) END AS url,
               CASE doc_id % 4
                    WHEN 0 THEN 'https://t.example.org/p/' || CAST(doc_id AS VARCHAR)
                        || '?page=' || CAST(doc_id AS VARCHAR)
                    WHEN 1 THEN 'https://t.example.org/p/' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://t.example.org/p/' || CAST(doc_id AS VARCHAR)
                        || '?page=' || CAST(doc_id AS VARCHAR) END AS canon
        FROM documents ORDER BY doc_id
    """,
    "warc_extract": """
        SELECT 'https://docs.fixture.invalid/' || CAST(doc_id AS VARCHAR) AS url,
               'doc-' || CAST(doc_id AS VARCHAR) AS title,
               text AS text_out
        FROM documents ORDER BY url
    """,
    "extract_text": """
        SELECT 'https://docs.fixture.invalid/' || CAST(doc_id AS VARCHAR) AS url,
               'doc-' || CAST(doc_id AS VARCHAR) AS title,
               text AS text_out
        FROM documents ORDER BY url
    """,
    "extract_page_stats": """
        SELECT lang, COUNT(*) AS n_pages, SUM(LENGTH(text)) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "extract_charset_title": """
        SELECT 'https://charset.fixture.invalid/' || CAST(doc_id AS VARCHAR) AS url,
               'Привет-' || CAST(doc_id AS VARCHAR) AS title
        FROM documents ORDER BY url
    """,
    "frontier_seed": """
        SELECT 'https://host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com/order/'
                 || CAST(o_orderkey AS VARCHAR) AS url,
               'host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com' AS host,
               ROUND(o_totalprice, 2) AS priority
        FROM orders ORDER BY url
    """,
    "frontier_host_budget": """
        SELECT host, COUNT(*) AS n_urls,
               SUM(CAST(ROUND(priority * 100, 0) AS BIGINT)) AS sum_priority_cents,
               LEAST(COUNT(*), 10) AS budget
        FROM (SELECT 'host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com' AS host,
                     ROUND(o_totalprice, 2) AS priority FROM orders)
        GROUP BY host ORDER BY host
    """,
    "frontier_topk": """
        SELECT url, host, priority FROM (
            SELECT 'https://host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com/order/'
                     || CAST(o_orderkey AS VARCHAR) AS url,
                   'host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com' AS host,
                   ROUND(o_totalprice, 2) AS priority
            FROM orders)
        ORDER BY priority DESC, url LIMIT 100
    """,
    "url_seen_antijoin": """
        SELECT 'https://host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com/order/'
                 || CAST(o_orderkey AS VARCHAR) AS url
        FROM orders WHERE o_orderkey % 3 <> 0 ORDER BY url
    """,
    "crawl_bfs_wave1": """
        SELECT DISTINCT url, wave FROM (
            SELECT 'https://host-' || CAST(o_custkey % 20 AS VARCHAR) || '.example.com/order/'
                     || CAST(o_orderkey AS VARCHAR) AS url, 0 AS wave
            FROM orders WHERE o_orderkey % 100 = 1
            UNION ALL
            SELECT 'https://items.example.com/item/' || CAST(l_orderkey AS VARCHAR) || '/'
                     || CAST(l_linenumber AS VARCHAR) AS url, 1 AS wave
            FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 1))
        ORDER BY url
    """,
    "canonicalize_urls": """
        SELECT c_custkey,
               'https://host-' || CAST(c_custkey AS VARCHAR)
                 || '.example.com/a/c%2Fd?q=' || CAST(c_custkey AS VARCHAR) AS canon_url
        FROM customer ORDER BY c_custkey
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 0) AS sum_qty,
               ROUND(SUM(l_extendedprice), 0) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "top_orders_by_revenue": """
        SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING')
        GROUP BY l_orderkey
        ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
        LIMIT 10
    """,
    "revenue_by_nation": """
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "events_value_stats": """
        SELECT event_type, COUNT(value) AS n,
               ROUND(AVG(value), 6) AS mean_value,
               ROUND(VAR_SAMP(value), 6) AS var_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "length_histogram": """
        SELECT n_chars // 50 AS bucket, COUNT(*) AS n_docs
        FROM documents GROUP BY bucket ORDER BY bucket
    """,
    "events_value_outliers": """
        WITH s AS (
            SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type, value, ROUND((value - m) / sd, 6) AS z
        FROM events e JOIN s ON s.event_type = e.event_type
        WHERE sd > 0 AND ABS((value - m) / sd) > 2.5
        ORDER BY event_id
    """,
    "events_running_total": """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING), 6) AS running_value
        FROM events ORDER BY event_id
    """,
    "events_first_last": """
        WITH w AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events)
        SELECT a.user_id, a.value AS first_value, d.value AS last_value
        FROM (SELECT user_id, value FROM w WHERE rn_a = 1) a
        JOIN (SELECT user_id, value FROM w WHERE rn_d = 1) d USING (user_id)
        ORDER BY a.user_id
    """,
    "length_quantiles_by_lang": """
        WITH per_lang AS (
            SELECT lang, quantile_disc(n_chars, [0.25, 0.5, 0.75, 0.9]) AS vs
            FROM documents GROUP BY lang)
        SELECT lang, [0.25, 0.5, 0.75, 0.9][i] AS q, vs[i] AS value
        FROM per_lang, (SELECT unnest(range(1, 5)) AS i)
        ORDER BY lang, q
    """,
    "length_percentile_rank": """
        SELECT doc_id, n_chars,
               ROUND(CUME_DIST() OVER (ORDER BY n_chars), 6) AS cume_dist
        FROM documents ORDER BY doc_id
    """,
    "orders_pushdown_count": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_totalprice > 300000
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "normalize_text": """
        WITH dirty AS (
            SELECT doc_id,
                   ' e' || chr(769) || 'x' || chr(9) || text
                       || ' ' || chr(11) || chr(9) AS t
            FROM documents
        ), n AS (
            SELECT doc_id,
                   TRIM(REGEXP_REPLACE(REGEXP_REPLACE(nfc_normalize(t),
                       '[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]', '', 'g'),
                       '[\\t\\n\\f\\r ]+', ' ', 'g'), ' ') AS text_norm
            FROM dirty
        )
        SELECT doc_id, text_norm, LENGTH(text_norm) AS n_chars_norm
        FROM n ORDER BY doc_id
    """,
    "domain_sample": """
        SELECT source, md5(text) AS sample_key, doc_id FROM (
            SELECT source, text, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(text), doc_id) AS rn
            FROM documents)
        WHERE rn <= 5 ORDER BY source, sample_key
    """,
    "customer_big_order_semi": """
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    "customer_no_big_order_anti": """
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    "customer_order_full_audit": """
        WITH hi AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000),
             big AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n_big
                     FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
        SELECT c_custkey, c_name, n_big
        FROM hi FULL JOIN big USING (c_custkey)
        ORDER BY c_custkey
    """,
    "customer_big_order_counts": """
        SELECT c_custkey, c_name, COALESCE(t.n, 0) AS n_big_orders
        FROM customer LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n FROM orders
            WHERE o_totalprice > 400000 GROUP BY o_custkey
        ) t ON t.o_custkey = c_custkey
        ORDER BY c_custkey
    """,
    "supplier_count_by_region": """
        SELECT r_name, COUNT(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "part_type_stats": """
        SELECT p_type, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 2) AS avg_price
        FROM part GROUP BY p_type ORDER BY p_type
    """,
    "events_tumbling": """
        SELECT event_type, CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY event_type, hour ORDER BY event_type, hour
    """,
    "events_lag_gap": """
        SELECT event_id, user_id,
               COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
        FROM events ORDER BY event_id
    """,
    "events_hopping": """
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) - k.k AS win,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) k
        GROUP BY event_type, win ORDER BY event_type, win
    """,
    "connected_components": """
        WITH RECURSIVE
        e AS (
            SELECT user_id AS a,
                   100000 + CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS b
            FROM events
            WHERE ((user_id % 5) + 5) % 5 =
                  ((CAST(json_extract_string(props, '$.k') AS BIGINT)
                    % 5) + 5) % 5),
        und AS (SELECT a AS src, b AS dst FROM e
                UNION SELECT b, a FROM e),
        nodes AS (SELECT DISTINCT src AS node FROM und),
        walk(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT u.dst, w.label FROM walk w JOIN und u ON u.src = w.node
        )
        SELECT node, MIN(label) AS label FROM walk GROUP BY node
        ORDER BY node
    """,
    "pagerank": """
        WITH e AS (
            SELECT user_id AS src,
                   100000 + CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS dst
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL),
        nodes AS (
            SELECT node, CAST(SUM(od) AS BIGINT) AS od FROM (
                SELECT src AS node, COUNT(*) AS od FROM e GROUP BY src
                UNION ALL
                SELECT DISTINCT dst AS node, 0 AS od FROM e)
            GROUP BY node),
        p AS (SELECT (1000000000000 // COUNT(*)) AS r0,
                     ((15 * (1000000000000 // COUNT(*))) // 100) AS base
              FROM nodes),
        r1 AS (
            SELECT n.node, n.od,
                   CAST(p.base + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
                       AS rank_units
            FROM nodes n CROSS JOIN p
            LEFT JOIN (
                SELECT e.dst, SUM(p.r0 // n2.od) AS s
                FROM e JOIN nodes n2 ON e.src = n2.node CROSS JOIN p
                GROUP BY e.dst) s ON s.dst = n.node),
        r2 AS (
            SELECT n.node,
                   CAST(p.base + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
                       AS rank_units
            FROM nodes n CROSS JOIN p
            LEFT JOIN (
                SELECT e.dst, SUM(r1.rank_units // r1.od) AS s
                FROM e JOIN r1 ON r1.node = e.src
                GROUP BY e.dst) s ON s.dst = n.node)
        SELECT node, rank_units FROM r2 ORDER BY node
    """,
    "pagerank_personalized": """
        WITH e AS (
            SELECT user_id AS src,
                   100000 + CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS dst
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL),
        nodes AS (
            SELECT node, CAST(SUM(od) AS BIGINT) AS od FROM (
                SELECT src AS node, COUNT(*) AS od FROM e GROUP BY src
                UNION ALL
                SELECT DISTINCT dst AS node, 0 AS od FROM e)
            GROUP BY node),
        seeds AS (
            SELECT DISTINCT user_id AS node FROM events
            WHERE user_id % 50 = 0),
        p AS (SELECT (1000000000000 // COUNT(*)) AS r0,
                     ((15 * (1000000000000 // COUNT(*))) // 100) AS base
              FROM seeds),
        r1 AS (
            SELECT n.node, n.od,
                   CAST(CASE WHEN sd.node IS NOT NULL THEN p.base ELSE 0 END
                        + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
                       AS rank_units
            FROM nodes n CROSS JOIN p
            LEFT JOIN seeds sd ON sd.node = n.node
            LEFT JOIN (
                SELECT e.dst,
                       SUM((CASE WHEN sd2.node IS NOT NULL THEN p.r0
                                 ELSE 0 END) // n2.od) AS s
                FROM e JOIN nodes n2 ON e.src = n2.node CROSS JOIN p
                LEFT JOIN seeds sd2 ON sd2.node = e.src
                GROUP BY e.dst) s ON s.dst = n.node),
        r2 AS (
            SELECT n.node,
                   CAST(CASE WHEN sd.node IS NOT NULL THEN p.base ELSE 0 END
                        + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)
                       AS rank_units
            FROM nodes n CROSS JOIN p
            LEFT JOIN seeds sd ON sd.node = n.node
            LEFT JOIN (
                SELECT e.dst, SUM(r1.rank_units // r1.od) AS s
                FROM e JOIN r1 ON r1.node = e.src
                GROUP BY e.dst) s ON s.dst = n.node)
        SELECT node, rank_units FROM r2 ORDER BY node
    """,
    "events_props_extract": """
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "event_type_pivot": """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "events_moving_avg": """
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
        FROM events ORDER BY event_id
    """,
    "sales_rollup": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 0) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "events_sessionize": """
        SELECT user_id, session_id, COUNT(*) AS n_events FROM (
            SELECT user_id,
                   SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
                FROM events))
        GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    "events_asof_join": """
        SELECT p.event_id, p.user_id, v.event_id AS view_event_id,
               epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id
    """,
    "events_range_count": """
        SELECT p.event_id, COUNT(c.ts) AS n_clicks
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts + INTERVAL 30 MINUTE
        GROUP BY p.event_id ORDER BY p.event_id
    """,
    "top_users": """
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
        ORDER BY n DESC, user_id LIMIT 20
    """,
    "distinct_segments": """
        SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
    """,
    "top_tokens_per_lang": """
        SELECT lang, token, n, rank FROM (
            SELECT lang, token, n,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n DESC, token) AS rank
            FROM (
                SELECT lang, token, COUNT(*) AS n FROM (
                    SELECT lang,
                           unnest(regexp_extract_all(text, '\\S+')) AS token
                    FROM documents)
                GROUP BY lang, token))
        WHERE rank <= 5 ORDER BY lang, rank
    """,
    "top_tokens": """
        SELECT token, COUNT(*) AS n FROM (
            SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    "bpe_pair_counts": """
        SELECT pair, COUNT(*) AS n FROM (
            SELECT unnest(list_transform(range(1, LENGTH(w)), i -> w[i] || w[i + 1])) AS pair
            FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents))
        GROUP BY pair ORDER BY n DESC, pair LIMIT 50
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id
        FROM documents GROUP BY md5(text) ORDER BY content_hash
    """,
    # The near-dup oracles restate the pipeline EXACTLY because LSH here is
    # candidate generation only — the keep decision is exact Jaccard over
    # word-3-gram shingle sets, and the engine's banding (recall ≥ 1-7e-6
    # per true pair at these thresholds) plus verify provably reproduces the
    # all-pairs answer on this corpus (equivalence asserted in
    # tests/test_queries_oracle_parity.py before these oracles were added).
    "ngram_jaccard": """
        WITH s AS (
            SELECT doc_id,
                   CASE WHEN LENGTH(t) = 0 THEN CAST([] AS VARCHAR[])
                        WHEN LENGTH(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_distinct(list_transform(range(1, LENGTH(t) - 1),
                            i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                   END AS sh
            FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents))
        SELECT x.doc_id AS a, y.doc_id AS b,
               ROUND(LENGTH(list_intersect(x.sh, y.sh))
                     / LENGTH(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
        FROM s x JOIN s y ON x.doc_id < y.doc_id
        WHERE LENGTH(list_intersect(x.sh, y.sh))
              >= 0.5 * LENGTH(list_distinct(list_concat(x.sh, y.sh)))
        ORDER BY a, b
    """,
    "dedup_minhash": """
        WITH RECURSIVE s AS (
            SELECT doc_id,
                   CASE WHEN LENGTH(t) = 0 THEN CAST([] AS VARCHAR[])
                        WHEN LENGTH(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_distinct(list_transform(range(1, LENGTH(t) - 1),
                            i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                   END AS sh
            FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents)),
        edges AS (
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM s x JOIN s y ON x.doc_id < y.doc_id
            WHERE LENGTH(list_intersect(x.sh, y.sh))
                  >= 0.8 * LENGTH(list_distinct(list_concat(x.sh, y.sh)))),
        sym AS (
            SELECT a, b FROM edges
            UNION SELECT b, a FROM edges
            UNION SELECT a, a FROM edges
            UNION SELECT b, b FROM edges),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, m.b FROM reach r JOIN sym m ON r.b = m.a)
        SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a ORDER BY doc_id
    """,
    # train_prep: the composed pipeline end to end — gate (c4_filter's
    # expressions) → exact dedup (min doc_id per text) → near-dedup
    # (all-pairs exact Jaccard ≥ 0.85 + transitive closure, keep each
    # component's min doc_id) → pack_sequences at seq_len=128. The
    # extraction stage round-trips text verbatim (extract_text's oracle).
    "train_prep": """
        WITH RECURSIVE gated AS (
            SELECT doc_id, text
            FROM (
                SELECT doc_id, text, LENGTH(text) AS n_chars,
                       ROUND(LENGTH(list_filter(string_split(text, ' '), w -> w IN
                           ('the','and','of','a','to','in','is','it','that','for')))
                           / GREATEST(LENGTH(list_filter(string_split(text, ' '),
                                                         w -> w <> '')), 1), 6)
                           AS stopword_ratio,
                       ROUND((LENGTH(g) - LENGTH(list_distinct(g)))
                           / GREATEST(LENGTH(g), 1), 6) AS dup_bigram_frac
                FROM (
                    SELECT doc_id, text,
                           list_transform(range(1, LENGTH(t)),
                                          i -> t[i] || ' ' || t[i + 1]) AS g
                    FROM (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS t
                          FROM documents)))
            WHERE n_chars BETWEEN 150 AND 450
              AND stopword_ratio >= 0.03 AND dup_bigram_frac <= 0.06),
        uniq AS (
            SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
            FROM gated GROUP BY text),
        s AS (
            SELECT doc_id,
                   CASE WHEN LENGTH(t) = 0 THEN CAST([] AS VARCHAR[])
                        WHEN LENGTH(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_distinct(list_transform(range(1, LENGTH(t) - 1),
                            i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                   END AS sh
            FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM uniq)),
        edges AS (
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM s x JOIN s y ON x.doc_id < y.doc_id
            WHERE LENGTH(list_intersect(x.sh, y.sh))
                  >= 0.85 * LENGTH(list_distinct(list_concat(x.sh, y.sh)))),
        sym AS (
            SELECT a, b FROM edges
            UNION SELECT b, a FROM edges
            UNION SELECT a, a FROM edges
            UNION SELECT b, b FROM edges),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, m.b FROM reach r JOIN sym m ON r.b = m.a),
        labels AS (
            SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
        survivors AS (
            SELECT u.doc_id, u.text FROM uniq u
            LEFT JOIN labels l ON u.doc_id = l.doc_id
            WHERE l.doc_id IS NULL OR l.cluster_id = u.doc_id),
        counted AS (
            SELECT doc_id, LENGTH(regexp_extract_all(text, '\\S+')) AS n_tokens
            FROM survivors),
        o AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens + 1) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset
            FROM counted)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // 128 AS first_seq,
               CASE WHEN n_tokens > 0
                    THEN (start_offset + n_tokens - 1) // 128
                    ELSE start_offset // 128 END AS last_seq,
               CASE WHEN n_tokens > 0
                    THEN (start_offset + n_tokens - 1) // 128
                    ELSE start_offset // 128 END
                 - start_offset // 128 + 1 AS n_seqs
        FROM o ORDER BY doc_id
    """,
    "doc_fingerprint": """
        SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id
    """,
    "token_count": """
        SELECT doc_id, LENGTH(regexp_extract_all(text, '\\S+')) AS n_tokens,
               LENGTH(text) AS n_chars
        FROM documents ORDER BY doc_id
    """,
    "token_offsets": """
        WITH t AS (
            SELECT doc_id,
                   LENGTH(regexp_extract_all(text, '\\S+')) AS n_tokens
            FROM documents)
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS start_offset
        FROM t ORDER BY doc_id
    """,
    "chunk_spans": """
        WITH t AS (
            SELECT doc_id,
                   LENGTH(regexp_extract_all(text, '\\S+')) AS n
            FROM documents),
        c AS (
            SELECT doc_id, n,
                   GREATEST(1, (n - 8 + 23) // 24) AS n_chunks
            FROM t WHERE n > 0)
        SELECT c.doc_id,
               CAST(u.i AS BIGINT) AS chunk_id,
               CAST(u.i * 24 AS BIGINT) AS start_tok,
               CAST(LEAST(u.i * 24 + 32, c.n) AS BIGINT) AS end_tok,
               c.n_chunks
        FROM c, LATERAL (SELECT UNNEST(range(0, c.n_chunks)) AS i) u
        ORDER BY doc_id, chunk_id
    """,
    "source_quality_filter": """
        WITH s AS (
            SELECT doc_id, source,
                   CAST(ROUND(ROUND(
                       LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / GREATEST(LENGTH(text), 1), 6) * 1000000, 0)
                       AS BIGINT) AS am
            FROM documents),
        m AS (
            SELECT source,
                   ROUND(SUM(am) / (COUNT(*) * 1000000.0), 6)
                       AS source_mean_alpha
            FROM s GROUP BY source)
        SELECT s.doc_id, s.source, m.source_mean_alpha,
               m.source_mean_alpha >= 0.822 AS keep
        FROM s JOIN m USING (source) ORDER BY s.doc_id
    """,
    "pack_sequences": """
        WITH t AS (
            SELECT doc_id,
                   LENGTH(regexp_extract_all(text, '\\S+')) AS n_tokens
            FROM documents),
        o AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens + 1) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset
            FROM t)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // 512 AS first_seq,
               CASE WHEN n_tokens > 0
                    THEN (start_offset + n_tokens - 1) // 512
                    ELSE start_offset // 512 END AS last_seq,
               CASE WHEN n_tokens > 0
                    THEN (start_offset + n_tokens - 1) // 512
                    ELSE start_offset // 512 END
                 - start_offset // 512 + 1 AS n_seqs
        FROM o ORDER BY doc_id
    """,
    "token_count_bpe": """
        SELECT doc_id,
               LENGTH(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+|[ ]+'))
                   AS n_bpe_tokens
        FROM documents ORDER BY doc_id
    """,
    "stopword_stats": """
        SELECT doc_id,
               LENGTH(toks) AS n_tokens,
               LENGTH(list_filter(toks, t -> t IN
                   ('the','and','of','a','to','in','is','it','that','for'))) AS n_stopwords,
               ROUND(LENGTH(list_filter(toks, t -> t IN
                   ('the','and','of','a','to','in','is','it','that','for')))
                   / GREATEST(LENGTH(toks), 1), 6) AS stopword_ratio
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
        ORDER BY doc_id
    """,
    "quality_score": """
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               LENGTH(regexp_extract_all(text, '\\S+')) AS n_tokens,
               ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     / GREATEST(LENGTH(text), 1), 6) AS alpha_ratio,
               ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
                     / GREATEST(LENGTH(text), 1), 6) AS space_ratio,
               ROUND((LENGTH(text) - (LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))))
                     / GREATEST(LENGTH(regexp_extract_all(text, '\\S+')), 1), 6) AS mean_token_len
        FROM documents ORDER BY doc_id
    """,
    "lang_distribution": """
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang
    """,
    "repetition_stats": """
        SELECT doc_id,
               LENGTH(g) AS n_bigrams,
               LENGTH(list_distinct(g)) AS n_distinct_bigrams,
               ROUND((LENGTH(g) - LENGTH(list_distinct(g))) / GREATEST(LENGTH(g), 1), 6)
                   AS dup_bigram_frac
        FROM (
            SELECT doc_id,
                   list_transform(range(1, LENGTH(t)), i -> t[i] || ' ' || t[i + 1]) AS g
            FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents))
        ORDER BY doc_id
    """,
    "length_filter": """
        SELECT lang, COUNT(*) AS n_kept FROM documents
        WHERE LENGTH(text) BETWEEN 200 AND 1500
        GROUP BY lang ORDER BY lang
    """,
    "embedding_topk": """
        SELECT vec_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        FROM embeddings
        ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC, vec_id
        LIMIT 10
    """,
    "embedding_label_stats": """
        SELECT label, COUNT(*) AS n,
               ROUND(AVG(SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS mean_norm
        FROM embeddings GROUP BY label ORDER BY label
    """,
    "c4_filter": """
        WITH m AS (
            SELECT doc_id, LENGTH(text) AS n_chars,
                   ROUND(LENGTH(list_filter(string_split(text, ' '), t -> t IN
                       ('the','and','of','a','to','in','is','it','that','for')))
                       / GREATEST(LENGTH(list_filter(string_split(text, ' '),
                                                     t -> t <> '')), 1), 6) AS stopword_ratio,
                   ROUND((LENGTH(g) - LENGTH(list_distinct(g)))
                       / GREATEST(LENGTH(g), 1), 6) AS dup_bigram_frac
            FROM (
                SELECT doc_id, text,
                       list_transform(range(1, LENGTH(t)), i -> t[i] || ' ' || t[i + 1]) AS g
                FROM (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS t
                      FROM documents))
        )
        SELECT doc_id, n_chars, stopword_ratio, dup_bigram_frac,
               (n_chars BETWEEN 150 AND 450)
                   AND stopword_ratio >= 0.03 AND dup_bigram_frac <= 0.06 AS keep,
               CASE WHEN n_chars NOT BETWEEN 150 AND 450 THEN 'length'
                    WHEN stopword_ratio < 0.03 THEN 'stopwords'
                    WHEN dup_bigram_frac > 0.06 THEN 'repetition' END AS drop_reason
        FROM m ORDER BY doc_id
    """,
    "gopher_filter": """
        WITH m AS (
            SELECT doc_id,
                   LENGTH(regexp_extract_all(text, '\\S+')) AS n_words,
                   LENGTH(regexp_replace(text, '\\s', '', 'g')) AS n_nonws,
                   LENGTH(text) - LENGTH(REPLACE(text, '#', ''))
                       + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) / 3
                       AS n_symbols,
                   LENGTH(list_distinct(list_filter(
                       regexp_extract_all(text, '\\S+'),
                       t -> t IN ('the','be','to','of','and','that','have','with')
                   ))) AS n_stop_distinct
            FROM documents
        ), r AS (
            SELECT doc_id, n_words, n_stop_distinct,
                   CAST(n_nonws AS DOUBLE) / GREATEST(n_words, 1) AS mwl,
                   CAST(n_symbols AS DOUBLE) / GREATEST(n_words, 1) AS sym
            FROM m
        )
        SELECT doc_id, n_words,
               ROUND(mwl, 6) AS mean_word_len,
               ROUND(sym, 6) AS symbol_ratio,
               n_stop_distinct,
               (n_words BETWEEN 30 AND 90) AND mwl >= 4.3 AND mwl <= 4.8
                   AND sym <= 0.1 AND n_stop_distinct >= 1 AS keep,
               CASE WHEN n_words NOT BETWEEN 30 AND 90 THEN 'words'
                    WHEN mwl < 4.3 OR mwl > 4.8 THEN 'word_length'
                    WHEN sym > 0.1 THEN 'symbols'
                    WHEN n_stop_distinct < 1 THEN 'stopwords' END AS drop_reason
        FROM r ORDER BY doc_id
    """,
    "lm_score": """
        WITH tokens AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        counts AS (SELECT tok, COUNT(*) AS n FROM tokens GROUP BY tok),
        total AS (SELECT SUM(n) AS t FROM counts)
        SELECT tokens.doc_id,
               COUNT(*) AS n_tokens,
               ROUND(SUM(LN(counts.n / total.t)) / COUNT(*), 6) AS lm_score
        FROM tokens JOIN counts USING (tok) CROSS JOIN total
        GROUP BY tokens.doc_id ORDER BY tokens.doc_id
    """,
    "tfidf_topk": """
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
        scored AS (
            SELECT tf.doc_id, tf.tok AS token, tf.tf, df.df,
                   ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
            FROM tf JOIN df USING (tok) CROSS JOIN n
        )
        SELECT doc_id, token, tf, df, tfidf, rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, token
            ) AS rank FROM scored
        ) WHERE rank <= 5 ORDER BY doc_id, rank
    """,
    "inverted_index_stats": """
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok)
        SELECT tok AS token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
        FROM tf GROUP BY tok ORDER BY token
    """,
    "token_postings": """
        SELECT doc_id, tok AS token, COUNT(*) AS tf FROM (
            SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS tok
            FROM documents
        ) WHERE tok IN ('table', 'spark', 'window')
        GROUP BY doc_id, tok ORDER BY token, doc_id
    """,
    "bm25_topk": """
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
               FROM toks GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n,
                         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        df AS (SELECT tok, COUNT(*) AS df FROM tf
               WHERE tok IN ('table', 'spark', 'window') GROUP BY tok),
        terms AS (
            SELECT tf.doc_id,
                   CAST(ROUND(
                       (LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                        * (tf.tf * (1.2 + 1.0))
                        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / stats.avgdl))))
                       * 1000000.0, 0) AS BIGINT) AS term_micros
            FROM tf JOIN df ON tf.tok = df.tok
                    JOIN dl ON tf.doc_id = dl.doc_id
                    CROSS JOIN stats
        ),
        scored AS (SELECT doc_id, CAST(SUM(term_micros) AS BIGINT)
                   AS score_micros FROM terms GROUP BY doc_id)
        SELECT doc_id, score_micros, score_micros / 1000000.0 AS score, rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY score_micros DESC, doc_id
            ) AS rank FROM scored
        ) WHERE rank <= 10 ORDER BY rank
    """,
    "sample_docs": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
        ORDER BY doc_id
    """,
    "mixture_sample": """
        WITH w(lang, wgt) AS (
            VALUES ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.2 AS DOUBLE)),
                   ('es', CAST(0.2 AS DOUBLE)), ('zh', CAST(0.2 AS DOUBLE))),
        counts AS (
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        s AS (
            SELECT MIN(n / wgt) AS scale FROM counts JOIN w USING (lang)),
        r AS (
            SELECT lang, LEAST(wgt * (SELECT scale FROM s) / n, 1.0) AS rate
            FROM counts JOIN w USING (lang))
        SELECT d.doc_id, d.lang
        FROM documents d JOIN r USING (lang)
        WHERE r.rate >= 1.0
           OR substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8) <
              printf('%08x', CAST(FLOOR(r.rate * 4294967296.0) AS BIGINT))
        ORDER BY d.doc_id
    """,
    "sample_stratified": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
            CASE lang WHEN 'en' THEN '0ccccccc' WHEN 'zh' THEN '66666666'
                 ELSE '33333333' END
        ORDER BY doc_id
    """,
    "pii_redact": r"""
        WITH augmented AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' mail user' || doc_id || '@host'
                                || (doc_id % 7) || '.example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' call '
                                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                                || '-'
                                || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')
                                || '-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' from 10.' || (doc_id % 256) || '.0.'
                                || (doc_id % 256)
                           ELSE '' END AS text
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
                   '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS text,
               CAST(length(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   AS BIGINT) AS n_email,
               CAST(length(regexp_extract_all(text,
                   '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
               CAST(length(regexp_extract_all(text,
                   '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4
        FROM augmented ORDER BY doc_id
    """,
    "media_decode": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                               ELSE 'video/mp4' END AS media_type,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INTEGER) AS width,
               CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS INTEGER) AS height,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                         ELSE OCTET_LENGTH(ENCODE(text)) % 100 + 1 END AS INTEGER) AS frames
        FROM documents ORDER BY doc_id
    """,
    "image_features": """
        WITH px AS (
            SELECT doc_id,
                   CAST(doc_id % 16 + 1 AS BIGINT) AS w,
                   CAST(doc_id % 12 + 1 AS BIGINT) AS h
            FROM documents)
        SELECT p.doc_id,
               CAST(p.w AS INTEGER) AS width,
               CAST(p.h AS INTEGER) AS height,
               CAST(CASE p.doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                    AS INTEGER) AS channels,
               p.w * p.h AS n_px,
               ROUND(AVG(CAST((p.doc_id + 3*x.g + 7*y.g) % 256 AS DOUBLE)), 6)
                   AS mean_c0
        FROM px p,
             LATERAL (SELECT UNNEST(generate_series(0, p.w - 1)) AS g) x,
             LATERAL (SELECT UNNEST(generate_series(0, p.h - 1)) AS g) y
        GROUP BY p.doc_id, p.w, p.h
        ORDER BY p.doc_id
    """,
    "image_resize": """
        WITH px AS (
            SELECT doc_id,
                   CAST(doc_id % 16 + 1 AS BIGINT) AS w,
                   CAST(doc_id % 12 + 1 AS BIGINT) AS h
            FROM documents)
        SELECT p.doc_id,
               CAST(8 AS INTEGER) AS out_w,
               CAST(6 AS INTEGER) AS out_h,
               CAST(CASE p.doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                    AS INTEGER) AS channels,
               48 * CAST(CASE p.doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                         AS BIGINT) AS n_bytes,
               CAST(SUM((p.doc_id + 3*((x.g*p.w)//8) + 7*((y.g*p.h)//6)) % 256)
                    AS BIGINT) AS checksum_c0
        FROM px p,
             LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) x,
             LATERAL (SELECT UNNEST(generate_series(0, 5)) AS g) y
        GROUP BY p.doc_id, p.w, p.h
        ORDER BY p.doc_id
    """,
    # the aHash oracle rebuilds the hash from the gradient synthesis
    # (pixel[y,x,0] = (doc_id + 3x + 7y) % 256, nearest-neighbor index
    # (g·dim)//8) with the same integer mean threshold (v·64 > Σv)
    "recrawl_schedule": """
        WITH log AS (
            SELECT 'h' || CAST(user_id % 32 AS VARCHAR) AS host,
                   event_id % 2000 AS url_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM events),
        last AS (
            SELECT host, url_id, MAX(ts_us) AS last_ts_us
            FROM log GROUP BY host, url_id),
        ranked AS (
            SELECT host, url_id, last_ts_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY host
                       ORDER BY last_ts_us, url_id) AS revisit_rank
            FROM last)
        SELECT host, url_id, last_ts_us, revisit_rank
        FROM ranked WHERE revisit_rank <= 5
        ORDER BY host, revisit_rank
    """,
    "pmi_collocations": """
        WITH toks AS (
            SELECT regexp_extract_all(text, '\\S+') AS t FROM documents),
        uni AS (
            SELECT tok, COUNT(*) AS c
            FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
        big AS (
            SELECT w1, w2, COUNT(*) AS n_pair FROM (
                SELECT t[i] AS w1, t[i + 1] AS w2
                FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g)
            GROUP BY w1, w2),
        tot AS (SELECT (SELECT SUM(c) FROM uni) AS n_tok,
                       (SELECT SUM(n_pair) FROM big) AS n_bi)
        SELECT b.w1, b.w2, b.n_pair,
               CAST(FLOOR(1e6 * LN(
                   CAST(b.n_pair * t.n_tok * t.n_tok AS DOUBLE)
                   / CAST(t.n_bi * u1.c * u2.c AS DOUBLE))) AS BIGINT) AS pmi_q
        FROM big b
        CROSS JOIN tot t
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2
        WHERE b.n_pair >= 5
        ORDER BY pmi_q DESC, b.w1, b.w2 LIMIT 50
    """,
    "image_phash": """
        WITH grid AS (
            SELECT d.doc_id, dy.g AS dy, dx.g AS dx,
                   ((d.doc_id + 3 * ((dx.g * (d.doc_id % 16 + 1)) // 8)
                              + 7 * ((dy.g * (d.doc_id % 12 + 1)) // 8)) % 256) AS v
            FROM documents d,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) dy,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) dx),
        totals AS (SELECT doc_id, SUM(v) AS total FROM grid GROUP BY doc_id),
        bits AS (
            SELECT g.doc_id, (g.dy * 8 + g.dx) AS idx,
                   CASE WHEN g.v * 64 > t.total THEN 1 ELSE 0 END AS b
            FROM grid g JOIN totals t USING (doc_id))
        SELECT doc_id,
               CAST(SUM(CASE WHEN idx < 32
                             THEN b * (CAST(1 AS BIGINT) << idx)
                             ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(SUM(CASE WHEN idx >= 32
                             THEN b * (CAST(1 AS BIGINT) << (idx - 32))
                             ELSE 0 END) AS BIGINT) AS hash_hi
        FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
    "phash_dedup": """
        WITH grid AS (
            SELECT d.doc_id, dy.g AS dy, dx.g AS dx,
                   ((d.doc_id + 3 * ((dx.g * (d.doc_id % 16 + 1)) // 8)
                              + 7 * ((dy.g * (d.doc_id % 12 + 1)) // 8)) % 256) AS v
            FROM documents d,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) dy,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) dx),
        totals AS (SELECT doc_id, SUM(v) AS total FROM grid GROUP BY doc_id),
        bits AS (
            SELECT g.doc_id, (g.dy * 8 + g.dx) AS idx,
                   CASE WHEN g.v * 64 > t.total THEN 1 ELSE 0 END AS b
            FROM grid g JOIN totals t USING (doc_id)),
        hashes AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN idx < 32
                                 THEN b * (CAST(1 AS BIGINT) << idx)
                                 ELSE 0 END) AS BIGINT) AS hash_lo,
                   CAST(SUM(CASE WHEN idx >= 32
                                 THEN b * (CAST(1 AS BIGINT) << (idx - 32))
                                 ELSE 0 END) AS BIGINT) AS hash_hi
            FROM bits GROUP BY doc_id)
        SELECT hash_hi, hash_lo, COUNT(*) AS n_docs,
               MIN(doc_id) AS keeper_doc_id
        FROM hashes GROUP BY hash_hi, hash_lo ORDER BY hash_hi, hash_lo
    """,
    "phash_neardup": """
        WITH grid AS (
            SELECT d.doc_id, dy.g AS dy, dx.g AS dx,
                   ((d.doc_id + 3 * ((dx.g * (d.doc_id % 16 + 1)) // 8)
                              + 7 * ((dy.g * (d.doc_id % 12 + 1)) // 8)) % 256) AS v
            FROM documents d,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) dy,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS g) dx),
        totals AS (SELECT doc_id, SUM(v) AS total FROM grid GROUP BY doc_id),
        bits AS (
            SELECT g.doc_id, (g.dy * 8 + g.dx) AS idx,
                   CASE WHEN g.v * 64 > t.total THEN 1 ELSE 0 END AS b
            FROM grid g JOIN totals t USING (doc_id)),
        hashes AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN idx < 32
                                 THEN b * (CAST(1 AS BIGINT) << idx)
                                 ELSE 0 END) AS BIGINT) AS hash_lo,
                   CAST(SUM(CASE WHEN idx >= 32
                                 THEN b * (CAST(1 AS BIGINT) << (idx - 32))
                                 ELSE 0 END) AS BIGINT) AS hash_hi
            FROM bits GROUP BY doc_id),
        uniq AS (
            SELECT hash_hi, hash_lo, MIN(doc_id) AS keeper
            FROM hashes GROUP BY hash_hi, hash_lo)
        SELECT LEAST(a.keeper, b.keeper) AS doc_a,
               GREATEST(a.keeper, b.keeper) AS doc_b,
               CAST(bit_count(xor(a.hash_lo, b.hash_lo)) AS BIGINT)
                   + CAST(bit_count(xor(a.hash_hi, b.hash_hi)) AS BIGINT) AS hamming
        FROM uniq a JOIN uniq b
          ON (a.hash_hi, a.hash_lo) < (b.hash_hi, b.hash_lo)
        WHERE bit_count(xor(a.hash_lo, b.hash_lo))
                  + bit_count(xor(a.hash_hi, b.hash_hi)) <= 3
        ORDER BY doc_a, doc_b
    """,
    "frame_sample": """
        SELECT d.doc_id, s.g AS frame_idx
        FROM documents d,
             LATERAL (SELECT UNNEST(generate_series(0, d.doc_id % 5, 2)) AS g) s
        ORDER BY d.doc_id, frame_idx
    """,
    "audio_features": """
        WITH s AS (
            SELECT d.doc_id, w.g AS window_idx, j.g AS j,
                   ((d.doc_id*31 + (w.g*40 + j.g)*17) % 4096) - 2048 AS v
            FROM documents d,
                 LATERAL (SELECT UNNEST(generate_series(0, d.doc_id % 50 + 1)) AS g) w,
                 LATERAL (SELECT UNNEST(generate_series(0, 39)) AS g) j),
        lagged AS (
            SELECT *, LAG(v) OVER (PARTITION BY doc_id, window_idx ORDER BY j) AS prev
            FROM s)
        SELECT doc_id, window_idx,
               CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
               CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
               CAST(SUM(CASE WHEN j > 0 AND ((v < 0) <> (prev < 0))
                             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM lagged
        GROUP BY doc_id, window_idx
        ORDER BY doc_id, window_idx
    """,
    "webp_meta": """
        SELECT doc_id,
               CAST(doc_id % 1024 + 1 AS INTEGER) AS width,
               CAST(doc_id % 512 + 1 AS INTEGER) AS height,
               CAST(1 AS BIGINT) AS frames
        FROM documents ORDER BY doc_id
    """,
    "video_meta": """
        SELECT doc_id,
               CAST(doc_id % 64 + 16 AS INTEGER) AS width,
               CAST(doc_id % 48 + 9 AS INTEGER) AS height,
               CAST(doc_id % 30 + 1 AS BIGINT) AS frames,
               CAST((doc_id % 30 + 1) * 40 AS BIGINT) AS duration_ms
        FROM documents ORDER BY doc_id
    """,
    "media_decode_real": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
               CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 640 + 1 END AS INTEGER) AS width,
               CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 480 + 1 END AS INTEGER) AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1
                         ELSE (doc_id % 100 + 1) * 80 END AS BIGINT) AS frames,
               CAST(CASE WHEN doc_id % 2 = 1 THEN (doc_id // 2) % 2 + 1 END AS INTEGER) AS channels,
               CAST(CASE WHEN doc_id % 2 = 1 THEN 8000 END AS INTEGER) AS sample_rate_hz,
               CAST(CASE WHEN doc_id % 2 = 1 THEN (doc_id % 100 + 1) * 10 END AS BIGINT) AS duration_ms
        FROM documents ORDER BY doc_id
    """,
    "line_dedup": """
        WITH base AS (
            SELECT doc_id,
                   'nav menu ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
                   text || chr(10) ||
                   'contact us ' || CAST(doc_id % 3 AS VARCHAR) || chr(10) ||
                   'ref ' || CAST(doc_id AS VARCHAR) AS raw
            FROM documents),
        exploded AS (
            SELECT doc_id,
                   unnest(string_split(raw, chr(10))) AS line,
                   unnest(range(1, len(string_split(raw, chr(10))) + 1)) AS ord
            FROM base),
        freq AS (SELECT line FROM exploded GROUP BY line HAVING COUNT(*) > 1)
        SELECT e.doc_id,
               string_agg(CASE WHEN f.line IS NULL THEN e.line END,
                          chr(10) ORDER BY e.ord) AS text_dedup,
               COUNT(CASE WHEN f.line IS NULL THEN 1 END) AS n_kept,
               COUNT(f.line) AS n_removed
        FROM exploded e LEFT JOIN freq f ON e.line = f.line
        GROUP BY e.doc_id ORDER BY e.doc_id
    """,
    "substring_dedup": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\s+'),
                               t -> t <> '') AS t
            FROM documents),
        grams AS (
            SELECT doc_id,
                   unnest(range(1, len(t) - 5 + 2)) AS pos,
                   unnest(list_transform(range(1, len(t) - 5 + 2),
                          i -> array_to_string(t[i:i+4], ' '))) AS gram
            FROM toks WHERE len(t) >= 5),
        freq AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
        dup AS (SELECT g.doc_id, g.pos FROM grams g JOIN freq f USING (gram)),
        cover AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS tp
                  FROM dup),
        dstats AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM dup
                   GROUP BY doc_id),
        cstats AS (SELECT doc_id, COUNT(*) AS n_dup_tokens FROM cover
                   GROUP BY doc_id)
        SELECT t.doc_id,
               len(t.t) AS n_tokens,
               GREATEST(len(t.t) - 5 + 1, 0) AS n_grams,
               COALESCE(d.n_dup_grams, 0) AS n_dup_grams,
               COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
               ROUND(COALESCE(c.n_dup_tokens, 0) / GREATEST(len(t.t), 1), 6)
                   AS dup_token_frac
        FROM toks t
        LEFT JOIN dstats d USING (doc_id)
        LEFT JOIN cstats c USING (doc_id)
        ORDER BY t.doc_id
    """,
    "dedup_incremental": """
        WITH pages AS (
            SELECT doc_id, substring(text, 1, 12) AS text FROM documents),
        existing AS (
            SELECT DISTINCT md5(text) AS h FROM pages WHERE doc_id % 2 = 0)
        SELECT n.doc_id,
               md5(n.text) AS content_hash,
               md5(n.text) IN (SELECT h FROM existing) AS is_duplicate
        FROM pages n WHERE n.doc_id % 2 = 1
        ORDER BY n.doc_id
    """,
    "length_quantiles": """
        WITH s AS (
            SELECT quantile_disc(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99]) AS v
            FROM documents)
        SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
               unnest(v) AS value
        FROM s
    """,
    "domain_cap": """
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents)
        WHERE rn <= 7 ORDER BY doc_id
    """,
    "decontaminate": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
            FROM documents),
        evald AS (
            SELECT DISTINCT array_to_string(t[i : i + 7], ' ') AS gram
            FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i)
            WHERE doc_id < 10),
        firstg AS (
            SELECT doc_id AS eid, array_to_string(t[1:8], ' ') AS gram
            FROM toks WHERE doc_id < 10 AND len(t) >= 8),
        train AS (
            SELECT d.doc_id,
                   d.text || CASE WHEN d.doc_id % 7 = 3
                                  THEN ' ' || COALESCE(g.gram, '')
                                  ELSE '' END AS text
            FROM documents d LEFT JOIN firstg g ON g.eid = d.doc_id % 10),
        joined AS (
            SELECT doc_id,
                   ' ' || array_to_string(
                       list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                       ' ') || ' ' AS j
            FROM train)
        SELECT t.doc_id,
               COUNT(e.gram) AS n_hits,
               COUNT(e.gram) > 0 AS contaminated
        FROM joined t LEFT JOIN evald e ON contains(t.j, ' ' || e.gram || ' ')
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    "embedding_kmeans_assign": """
        WITH c AS (SELECT vec_id AS cid, embedding AS cvec
                   FROM embeddings WHERE vec_id < 8),
        d AS (
            SELECT e.vec_id, c.cid,
                   ROUND(list_sum(list_transform(list_zip(e.embedding, c.cvec),
                         x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ** 2)),
                         4) AS dist
            FROM embeddings e CROSS JOIN c)
        SELECT vec_id,
               (array_agg(cid ORDER BY dist, cid))[1] AS cluster_id
        FROM d GROUP BY vec_id ORDER BY vec_id
    """,
    "embedding_pq_topk": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        c AS (SELECT vec_id AS cid, embedding AS cvec
              FROM embeddings WHERE vec_id < 8),
        s AS (SELECT UNNEST(generate_series(0, 3)) AS j),
        enc AS (
            SELECT e.vec_id, s.j,
                   (array_agg(c.cid ORDER BY
                        ROUND(list_sum(list_transform(
                            list_zip(
                                list_slice(e.embedding, s.j*16 + 1,
                                           (s.j + 1)*16),
                                list_slice(c.cvec, s.j*16 + 1,
                                           (s.j + 1)*16)),
                            x -> (CAST(x[1] AS DOUBLE)
                                  - CAST(x[2] AS DOUBLE)) ** 2)), 4),
                        c.cid))[1] AS code
            FROM embeddings e CROSS JOIN s CROSS JOIN c
            GROUP BY e.vec_id, s.j),
        tq AS (
            SELECT s.j, c.cid,
                   ROUND(list_sum(list_transform(
                       list_zip(
                           list_slice(q.qv, s.j*16 + 1, (s.j + 1)*16),
                           list_slice(c.cvec, s.j*16 + 1, (s.j + 1)*16)),
                       x -> (CAST(x[1] AS DOUBLE)
                             - CAST(x[2] AS DOUBLE)) ** 2)), 4) AS d
            FROM q CROSS JOIN s CROSS JOIN c),
        dist AS (
            SELECT enc.vec_id,
                   MAX(CASE WHEN enc.j = 0 THEN enc.code END) AS code_0,
                   MAX(CASE WHEN enc.j = 1 THEN enc.code END) AS code_1,
                   MAX(CASE WHEN enc.j = 2 THEN enc.code END) AS code_2,
                   MAX(CASE WHEN enc.j = 3 THEN enc.code END) AS code_3,
                   ROUND(SUM(tq.d), 4) AS approx_dist
            FROM enc JOIN tq ON tq.j = enc.j AND tq.cid = enc.code
            GROUP BY enc.vec_id)
        SELECT vec_id, code_0, code_1, code_2, code_3, approx_dist
        FROM dist ORDER BY approx_dist, vec_id LIMIT 10
    """,
    "semdedup": """
        WITH c AS (SELECT vec_id AS cid, embedding AS cvec
                   FROM embeddings WHERE vec_id < 8),
        d AS (
            SELECT e.vec_id,
                   (array_agg(c.cid ORDER BY
                        ROUND(list_sum(list_transform(list_zip(e.embedding, c.cvec),
                              x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ** 2)),
                              4), c.cid))[1] AS cluster_id
            FROM embeddings e CROSS JOIN c GROUP BY e.vec_id),
        j AS (SELECT d.vec_id, d.cluster_id, e.embedding
              FROM d JOIN embeddings e USING (vec_id))
        SELECT a.vec_id, a.cluster_id,
               NOT EXISTS (
                   SELECT 1 FROM j b
                   WHERE b.cluster_id = a.cluster_id AND b.vec_id < a.vec_id
                     AND ROUND(list_cosine_similarity(
                             CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
               ) AS keep
        FROM j a ORDER BY a.vec_id
    """,
    # dedup_simhash, embedding_ann, dedup_embedding and embedding_kmeans are
    # deliberately oracle-free: approximate / iterative operators DuckDB SQL
    # cannot express (bit-level simhash, hyperplane LSH, Lloyd's iterations)
    # — the driver records rows-only checks and tests/test_functions.py +
    # tests/test_clustering.py pin their semantics. dedup_minhash,
    # ngram_jaccard and train_prep have exact restatements above; langid is
    # generated below from the shared profiles.
    "ccnet_buckets": """
        WITH tokens AS (
            SELECT doc_id, lang, tok FROM (
                SELECT doc_id, lang,
                       UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        counts AS (
            SELECT lang, tok, COUNT(*) AS n FROM tokens GROUP BY lang, tok),
        totals AS (SELECT lang, SUM(n) AS t FROM counts GROUP BY lang),
        scores AS (
            SELECT tokens.doc_id, tokens.lang, COUNT(*) AS n_tokens,
                   ROUND(SUM(LN(counts.n / totals.t)) / COUNT(*), 6)
                       AS lm_score
            FROM tokens
            JOIN counts USING (lang, tok)
            JOIN totals USING (lang)
            GROUP BY tokens.doc_id, tokens.lang
        ),
        th AS (
            SELECT lang,
                   quantile_disc(lm_score, 1.0/3) AS t1,
                   quantile_disc(lm_score, 2.0/3) AS t2
            FROM scores GROUP BY lang
        )
        SELECT s.doc_id, s.lang, s.n_tokens, s.lm_score,
               CASE WHEN s.lm_score <= th.t1 THEN 'tail'
                    WHEN s.lm_score <= th.t2 THEN 'middle'
                    ELSE 'head' END AS bucket
        FROM scores s JOIN th USING (lang) ORDER BY s.doc_id
    """,
    "more_like_this": """
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
        probes(p) AS (VALUES (0), (100), (250)),
        contrib AS (
            SELECT tp.doc_id AS probe_doc, t2.doc_id AS doc_id,
                   CAST(ROUND(
                       LN(CAST(n.n AS DOUBLE) / df.df)
                       * LN(CAST(n.n AS DOUBLE) / df.df)
                       * tp.tf * t2.tf * 1000000.0, 0) AS BIGINT) AS m
            FROM tf tp
            JOIN probes ON tp.doc_id = probes.p
            JOIN tf t2 ON t2.tok = tp.tok AND t2.doc_id != tp.doc_id
            JOIN df ON df.tok = tp.tok
            CROSS JOIN n
        ),
        scored AS (
            SELECT probe_doc, doc_id, CAST(SUM(m) AS BIGINT) AS score_micros
            FROM contrib GROUP BY probe_doc, doc_id
        )
        SELECT probe_doc, doc_id, score_micros,
               score_micros / 1000000.0 AS score, rank
        FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY probe_doc
                ORDER BY score_micros DESC, doc_id
            ) AS BIGINT) AS rank FROM scored
        ) WHERE rank <= 10 ORDER BY probe_doc, rank
    """,
    "anchor_texts": """
        WITH links AS (
            SELECT 'https://docs.fixture.invalid/'
                       || CAST(doc_id + 1 AS VARCHAR) AS target_url,
                   'next doc-' || CAST(doc_id + 1 AS VARCHAR) AS anchor
            FROM documents
            UNION ALL
            SELECT 'https://docs.fixture.invalid/'
                       || CAST((doc_id * 7 + 3) % 1000 AS VARCHAR),
                   'hub doc-' || CAST((doc_id * 7 + 3) % 1000 AS VARCHAR)
            FROM documents
        )
        , ranked AS (
            SELECT target_url, anchor,
                   ROW_NUMBER() OVER (PARTITION BY target_url
                                      ORDER BY anchor) AS rn
            FROM links
        )
        SELECT target_url, CAST(COUNT(*) AS BIGINT) AS n_anchors,
               string_agg(anchor, '|' ORDER BY anchor)
                   FILTER (WHERE rn <= 64) AS anchors
        FROM ranked GROUP BY target_url ORDER BY target_url
    """,
    "curation_prep": """
        WITH tokens AS (
            SELECT doc_id, lang, tok FROM (
                SELECT doc_id, lang,
                       UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        counts AS (
            SELECT lang, tok, COUNT(*) AS n FROM tokens GROUP BY lang, tok),
        totals AS (SELECT lang, SUM(n) AS t FROM counts GROUP BY lang),
        scores AS (
            SELECT tokens.doc_id, tokens.lang,
                   ROUND(SUM(LN(counts.n / totals.t)) / COUNT(*), 6)
                       AS lm_score
            FROM tokens
            JOIN counts USING (lang, tok)
            JOIN totals USING (lang)
            GROUP BY tokens.doc_id, tokens.lang
        ),
        th AS (
            SELECT lang, quantile_disc(lm_score, 1.0/3) AS t1
            FROM scores GROUP BY lang
        ),
        docs1 AS (
            SELECT d.doc_id, d.text FROM documents d
            JOIN scores s USING (doc_id)
            JOIN th ON th.lang = s.lang
            WHERE s.lm_score > th.t1
        ),
        arr1 AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM docs1
        ),
        bg AS (
            SELECT doc_id,
                   UNNEST([a[i] || ' ' || a[i+1]
                           FOR i IN generate_series(1, len(a)-1)]) AS bg
            FROM arr1 WHERE len(a) >= 2
        ),
        cls AS (
            SELECT doc_id,
                   SUM((CAST(concat('0x', substr(md5(bg), 1, 8))
                             AS BIGINT) % 64) - 32) AS score_sum
            FROM bg GROUP BY doc_id
        ),
        docs2 AS (
            SELECT d.doc_id, d.text FROM docs1 d
            JOIN cls USING (doc_id) WHERE cls.score_sum > 0
        ),
        arr AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM docs2
        ),
        occ AS (
            SELECT doc_id,
                   UNNEST([array_to_string(a[i:i+4], ' ')
                           FOR i IN generate_series(1, len(a)-4)]) AS gram,
                   UNNEST(generate_series(1, len(a)-4)) AS pos
            FROM arr WHERE len(a) >= 5
        ),
        dup AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        docc AS (
            SELECT occ.doc_id, occ.pos,
                   ROW_NUMBER() OVER (PARTITION BY occ.gram
                                      ORDER BY occ.doc_id, occ.pos) = 1
                       AS canon
            FROM occ JOIN dup USING (gram)
        ),
        tokpos AS (
            SELECT doc_id, UNNEST(a) AS tok,
                   UNNEST(generate_series(1, len(a))) AS p
            FROM arr WHERE len(a) >= 1
        ),
        marks AS (
            SELECT t.doc_id, t.p,
                   BOOL_OR(NOT s.canon) AS hit_noncanon,
                   BOOL_OR(s.canon) AS hit_canon
            FROM tokpos t JOIN docc s
              ON t.doc_id = s.doc_id AND t.p BETWEEN s.pos AND s.pos + 4
            GROUP BY t.doc_id, t.p
        ),
        kept AS (
            SELECT t.doc_id, t.p, t.tok
            FROM tokpos t LEFT JOIN marks m
              ON t.doc_id = m.doc_id AND t.p = m.p
            WHERE m.p IS NULL OR NOT (m.hit_noncanon AND NOT m.hit_canon)
        ),
        cnt AS (
            SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens
            FROM arr WHERE len(a) >= 1
        )
        SELECT c.doc_id, c.n_tokens,
               COALESCE(kc.n_kept, 0) AS n_kept,
               COALESCE(kc.text_out, '') AS text_out
        FROM cnt c LEFT JOIN (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS text_out
            FROM kept GROUP BY doc_id
        ) kc USING (doc_id)
        ORDER BY c.doc_id
    """,
    "substring_scrub": """
        WITH arr AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM documents
        ),
        occ AS (
            SELECT doc_id,
                   UNNEST([array_to_string(a[i:i+4], ' ')
                           FOR i IN generate_series(1, len(a)-4)]) AS gram,
                   UNNEST(generate_series(1, len(a)-4)) AS pos
            FROM arr WHERE len(a) >= 5
        ),
        dup AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        docc AS (
            SELECT occ.doc_id, occ.pos,
                   ROW_NUMBER() OVER (PARTITION BY occ.gram
                                      ORDER BY occ.doc_id, occ.pos) = 1
                       AS canon
            FROM occ JOIN dup USING (gram)
        ),
        tokpos AS (
            SELECT doc_id, UNNEST(a) AS tok,
                   UNNEST(generate_series(1, len(a))) AS p
            FROM arr WHERE len(a) >= 1
        ),
        marks AS (
            SELECT t.doc_id, t.p,
                   BOOL_OR(NOT s.canon) AS hit_noncanon,
                   BOOL_OR(s.canon) AS hit_canon
            FROM tokpos t JOIN docc s
              ON t.doc_id = s.doc_id AND t.p BETWEEN s.pos AND s.pos + 4
            GROUP BY t.doc_id, t.p
        ),
        kept AS (
            SELECT t.doc_id, t.p, t.tok
            FROM tokpos t LEFT JOIN marks m
              ON t.doc_id = m.doc_id AND t.p = m.p
            WHERE m.p IS NULL OR NOT (m.hit_noncanon AND NOT m.hit_canon)
        ),
        counts AS (
            SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens
            FROM arr WHERE len(a) >= 1
        )
        SELECT c.doc_id, c.n_tokens,
               COALESCE(kc.n_kept, 0) AS n_kept,
               COALESCE(kc.text_out, '') AS text_out
        FROM counts c LEFT JOIN (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS text_out
            FROM kept GROUP BY doc_id
        ) kc USING (doc_id)
        ORDER BY c.doc_id
    """,
    "hash_classifier": """
        WITH arr AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   UNNEST([a[i] || ' ' || a[i+1]
                           FOR i IN generate_series(1, len(a)-1)]) AS bg
            FROM arr WHERE len(a) >= 2
        ),
        scored AS (
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   CAST(SUM((CAST(concat('0x', substr(md5(bg), 1, 8))
                                  AS BIGINT) % 64) - 32) AS BIGINT)
                       AS score_sum
            FROM bg GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams, score_sum, score_sum > 0 AS keep
        FROM scored ORDER BY doc_id
    """,
    "dsir_select": """
        WITH arr AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   UNNEST([a[i] || ' ' || a[i+1]
                           FOR i IN generate_series(1, len(a)-1)]) AS bg
            FROM arr WHERE len(a) >= 2
        ),
        f AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(bg), 1, 8)) AS BIGINT) % 64
                       AS b
            FROM bg
        ),
        raw AS (SELECT b, COUNT(*) AS rc FROM f GROUP BY b),
        tgt AS (
            SELECT f.b, COUNT(*) AS tc
            FROM f JOIN documents d USING (doc_id)
            WHERE d.lang = 'en' GROUP BY f.b
        ),
        tot AS (
            SELECT (SELECT COUNT(*) FROM f) AS rt,
                   (SELECT COUNT(*) FROM f JOIN documents d USING (doc_id)
                    WHERE d.lang = 'en') AS tt
        ),
        ratio AS (
            SELECT gs.b,
                   CAST(FLOOR(1000000 * (
                        LN((COALESCE(tc, 0) + 1) / (tt + 64))
                      - LN((COALESCE(rc, 0) + 1) / (rt + 64))))
                       AS BIGINT) AS r
            FROM (SELECT UNNEST(generate_series(0, 63)) AS b) gs
            LEFT JOIN raw ON raw.b = gs.b
            LEFT JOIN tgt ON tgt.b = gs.b
            CROSS JOIN tot
        ),
        w AS (
            SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(ratio.r) AS BIGINT) AS weight
            FROM f JOIN ratio ON ratio.b = f.b
            GROUP BY f.doc_id
        )
        SELECT doc_id, n_bigrams, weight
        FROM w ORDER BY weight DESC, doc_id LIMIT 50
    """,
    "bigram_lm_score": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM documents),
        v AS (SELECT COUNT(DISTINCT t) AS vsz
              FROM (SELECT UNNEST(a) AS t FROM toks) u),
        bg AS (
            SELECT doc_id,
                   UNNEST([a[i] FOR i IN generate_series(1, len(a)-1)])
                       AS w1,
                   UNNEST([a[i+1] FOR i IN generate_series(1, len(a)-1)])
                       AS w2
            FROM toks WHERE len(a) >= 2),
        dbg AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
                FROM bg GROUP BY doc_id, w1, w2),
        c12 AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS n12
                FROM dbg GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(SUM(k) AS BIGINT) AS n1
               FROM dbg GROUP BY w1),
        scored AS (
            SELECT dbg.doc_id, dbg.k,
                   dbg.k * LN((c12.n12 + 1) / (c1.n1 + v.vsz)) AS klp
            FROM dbg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
            CROSS JOIN v)
        SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
               ROUND(SUM(klp) / SUM(k), 6) AS bigram_lm_score
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    "self_dedup_lines": """
        WITH pages AS (
            SELECT doc_id,
                   'nav menu ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
                   text || chr(10) ||
                   'nav menu ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
                   'ref ' || CAST(doc_id AS VARCHAR) || chr(10) || text
                       AS raw
            FROM documents),
        arr AS (SELECT doc_id, string_split(raw, chr(10)) AS a FROM pages),
        l AS (SELECT doc_id, UNNEST(a) AS line,
                     UNNEST(generate_series(1, len(a))) AS pos FROM arr),
        k AS (SELECT doc_id, line, MIN(pos) AS pos
              FROM l GROUP BY doc_id, line),
        agg AS (SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
                       CAST(COUNT(*) AS BIGINT) AS n_kept
                FROM k GROUP BY doc_id),
        tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
                FROM l GROUP BY doc_id)
        SELECT a.doc_id, a.text_dedup, a.n_kept,
               t.n_total - a.n_kept AS n_removed
        FROM agg a JOIN tot t USING (doc_id) ORDER BY a.doc_id
    """,
    "fineweb_filter": """
        WITH pages AS (
            SELECT doc_id,
                   'Welcome to page ' || CAST(doc_id AS VARCHAR) ||
                       CASE WHEN doc_id % 5 = 4 THEN '' ELSE '.' END
                   || chr(10) || text
                   || chr(10) || 'nav menu ' || CAST(doc_id % 5 AS VARCHAR)
                   || chr(10) ||
                   CASE WHEN doc_id % 7 = 0 THEN text
                        WHEN doc_id % 7 = 1 THEN 'OK'
                        ELSE 'Read the full article about topic ' ||
                             CAST(doc_id % 7 AS VARCHAR) || '.' END
                   || chr(10) ||
                   CASE WHEN doc_id % 4 = 0 THEN 'Buy now'
                        ELSE 'All rights reserved.' END AS raw
            FROM documents),
        l AS (SELECT doc_id, UNNEST(string_split(raw, chr(10))) AS line
              FROM pages),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN regexp_matches(line, '[.!?"'']$')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_punct,
                   CAST(SUM(CASE WHEN length(line) < 30 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_short,
                   CAST(SUM(length(line)) AS BIGINT) AS total_chars
            FROM l GROUP BY doc_id),
        dup AS (
            SELECT doc_id,
                   CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * len
                                          ELSE 0 END), 0) AS BIGINT)
                       AS dup_chars
            FROM (SELECT doc_id, COUNT(*) AS c, length(line) AS len
                  FROM l GROUP BY doc_id, line) g
            GROUP BY doc_id)
        SELECT p.doc_id, n_lines, n_punct, n_short, dup_chars, total_chars,
               (100 * n_punct >= 12 * n_lines AND
                100 * n_short < 67 * n_lines AND
                10 * dup_chars < total_chars) AS keep,
               CASE WHEN 100 * n_punct < 12 * n_lines THEN 'punct'
                    WHEN 100 * n_short >= 67 * n_lines THEN 'short_lines'
                    WHEN 10 * dup_chars >= total_chars THEN 'dup_lines'
                    END AS drop_reason
        FROM per_doc p JOIN dup USING (doc_id) ORDER BY p.doc_id
    """,
    "epoch_shuffle": """
        WITH k AS (
            SELECT doc_id,
                   md5('epoch:0::' || CAST(doc_id AS VARCHAR))
                       AS shuffle_key
            FROM documents),
        s AS (
            SELECT doc_id, shuffle_key,
                   CAST(CAST(concat('0x', substr(shuffle_key, 1, 8))
                             AS BIGINT) % 8 AS BIGINT) AS shard
            FROM k)
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                       ORDER BY shuffle_key, doc_id) - 1
                    AS BIGINT) AS pos,
               shuffle_key
        FROM s ORDER BY shard, pos
    """,
    "shard_manifest": """
        WITH off AS (
            SELECT doc_id, n_chars,
                   COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS start
            FROM documents)
        SELECT CAST(start // 16384 AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(n_chars) AS BIGINT) AS total_n_chars,
               MIN(doc_id) AS first_doc_id,
               MAX(doc_id) AS last_doc_id
        FROM off GROUP BY shard ORDER BY shard
    """,
    "boilerplate": """
        SELECT 'https://docs.fixture.invalid/' || CAST(doc_id AS VARCHAR)
                   AS url,
               CAST(3 AS BIGINT) AS n_blocks,
               CAST(CASE WHEN regexp_matches(text, '\\S') THEN 1 ELSE 0 END
                   AS BIGINT) AS n_kept,
               CASE WHEN regexp_matches(text, '\\S') THEN text ELSE '' END
                   AS main_text
        FROM documents ORDER BY url
    """,
    "web_curation": """
        WITH base AS (
            SELECT doc_id, text, lang FROM documents
            WHERE regexp_matches(text, '\\S')
        ),
        barr AS (
            SELECT doc_id, text, lang,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM base
        ),
        gate AS (
            SELECT doc_id, text, lang FROM (
                SELECT doc_id, text, lang,
                       CAST(len(a) AS BIGINT) AS n_tokens,
                       CAST(len(list_filter(
                            a, x -> LOWER(x) IN ('the', 'le', 'der')))
                           AS BIGINT) AS n_blocked
                FROM barr)
            WHERE ROUND(CASE WHEN n_tokens > 0
                             THEN n_blocked / n_tokens ELSE 0 END, 6) <= 0.1
        ),
        arr AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM gate
        ),
        bg AS (
            SELECT doc_id,
                   UNNEST([a[i] || ' ' || a[i+1]
                           FOR i IN generate_series(1, len(a)-1)]) AS bg
            FROM arr WHERE len(a) >= 2
        ),
        f AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(bg), 1, 8)) AS BIGINT) % 64
                       AS b
            FROM bg
        ),
        raw AS (SELECT b, COUNT(*) AS rc FROM f GROUP BY b),
        tgt AS (
            SELECT f.b, COUNT(*) AS tc
            FROM f JOIN gate g USING (doc_id)
            WHERE g.lang = 'en' GROUP BY f.b
        ),
        tot AS (
            SELECT (SELECT COUNT(*) FROM f) AS rt,
                   (SELECT COUNT(*) FROM f JOIN gate g USING (doc_id)
                    WHERE g.lang = 'en') AS tt
        ),
        ratio AS (
            SELECT gs.b,
                   CAST(FLOOR(1000000 * (
                        LN((COALESCE(tc, 0) + 1) / (tt + 64))
                      - LN((COALESCE(rc, 0) + 1) / (rt + 64))))
                       AS BIGINT) AS r
            FROM (SELECT UNNEST(generate_series(0, 63)) AS b) gs
            LEFT JOIN raw ON raw.b = gs.b
            LEFT JOIN tgt ON tgt.b = gs.b
            CROSS JOIN tot
        ),
        w AS (
            SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(ratio.r) AS BIGINT) AS weight
            FROM f JOIN ratio ON ratio.b = f.b
            GROUP BY f.doc_id
        )
        SELECT doc_id, n_bigrams, weight
        FROM w ORDER BY weight DESC, doc_id LIMIT 20
    """,
    "url_blocklist": """
        WITH hosts AS (
            SELECT c_custkey,
                   'sub' || CAST(c_custkey AS VARCHAR) || '.' ||
                   CASE c_custkey % 5
                       WHEN 0 THEN 'good.org'
                       WHEN 1 THEN 'news.example.com'
                       WHEN 2 THEN 'ads.example'
                       WHEN 3 THEN 'cdn.ads.example'
                       ELSE 'tracker.net'
                   END AS host
            FROM customer)
        SELECT c_custkey, host,
               (host = 'ads.example' OR host LIKE '%.ads.example'
                OR host = 'tracker.net' OR host LIKE '%.tracker.net')
                   AS blocked
        FROM hosts ORDER BY c_custkey
    """,
    "word_blocklist": """
        WITH arr AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS a
            FROM documents),
        s AS (
            SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(
                        a, x -> LOWER(x) IN ('the', 'le', 'der')))
                       AS BIGINT) AS n_blocked
            FROM arr)
        SELECT doc_id, n_tokens, n_blocked,
               ROUND(CASE WHEN n_tokens > 0
                          THEN n_blocked / n_tokens ELSE 0 END, 6)
                   AS blocked_frac,
               ROUND(CASE WHEN n_tokens > 0
                          THEN n_blocked / n_tokens ELSE 0 END, 6) <= 0.1
                   AS keep
        FROM s ORDER BY doc_id
    """,
}


# Shared simhash CTE chain (WITH RECURSIVE must sit at statement top, so
# both simhash oracles are composed from this prefix): yields per-doc
# sb(doc_id, block0..block3).
_SIMHASH_CTE = r"""
    WITH RECURSIVE powers(i, w) AS (
        SELECT 0, CAST(1 AS HUGEINT)
        UNION ALL SELECT i + 1, w * 2 FROM powers WHERE i < 63),
    toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
        FROM documents),
    th AS (
        SELECT doc_id,
               CAST(CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT)
                    AS HUGEINT)
             + CAST(concat('0x', substr(md5(tok), 3, 2)) AS BIGINT) * 256
             + CAST(concat('0x', substr(md5(tok), 5, 2)) AS BIGINT) * 65536
             + CAST(concat('0x', substr(md5(tok), 7, 2)) AS BIGINT) * 16777216
             + CAST(concat('0x', substr(md5(tok), 9, 2)) AS BIGINT) * 4294967296
             + CAST(concat('0x', substr(md5(tok), 11, 2)) AS BIGINT) * 1099511627776
             + CAST(concat('0x', substr(md5(tok), 13, 2)) AS BIGINT) * 281474976710656
             + CAST(CAST(concat('0x', substr(md5(tok), 15, 2)) AS BIGINT)
                    AS HUGEINT) * 72057594037927936
               AS h
        FROM toks),
    cnts AS (
        SELECT t.doc_id, p.i,
               SUM(2 * CAST((t.h // p.w) % 2 AS BIGINT) - 1) AS cnt
        FROM th t CROSS JOIN powers p
        GROUP BY t.doc_id, p.i),
    outbits AS (
        SELECT c.doc_id, j.j,
               CASE WHEN c.cnt > 0 THEN 1 ELSE 0 END AS bit
        FROM (SELECT unnest(range(0, 64)) AS j) j
        JOIN cnts c ON c.i = 8 * (j.j // 8) + 7 - (j.j % 8)),
    blocks AS (
        SELECT doc_id, j // 16 AS blk,
               CAST(SUM(bit * CAST(p.w AS BIGINT)) AS BIGINT) AS val
        FROM outbits JOIN powers p ON p.i = j % 16
        GROUP BY doc_id, j // 16),
    sb AS (
        SELECT d.doc_id,
               COALESCE(MAX(CASE WHEN blk = 0 THEN val END), 0) AS block0,
               COALESCE(MAX(CASE WHEN blk = 1 THEN val END), 0) AS block1,
               COALESCE(MAX(CASE WHEN blk = 2 THEN val END), 0) AS block2,
               COALESCE(MAX(CASE WHEN blk = 3 THEN val END), 0) AS block3
        FROM documents d LEFT JOIN blocks b ON b.doc_id = d.doc_id
        GROUP BY d.doc_id)
"""

ORACLE_SQL["simhash_blocks"] = _SIMHASH_CTE + """
    SELECT doc_id, block0, block1, block2, block3 FROM sb ORDER BY doc_id
"""

# dedup_simhash pairs: candidates share any 16-bit quarter exactly (each
# quarter bucket capped at its 512 smallest doc_ids, the engine's
# bucket_cap), verified by hamming <= 3 over the full hash — the per-block
# XOR popcounts sum to the 64-bit hamming distance because the quarters
# partition the bits.
ORACLE_SQL["dedup_simhash"] = _SIMHASH_CTE + """
    , expl AS (
        SELECT doc_id, bi.block_id,
               CASE bi.block_id WHEN 0 THEN block0 WHEN 1 THEN block1
                    WHEN 2 THEN block2 ELSE block3 END AS block_value,
               block0, block1, block2, block3
        FROM sb CROSS JOIN (SELECT unnest(range(0, 4)) AS block_id) bi),
    capped AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY block_id, block_value
                                     ORDER BY doc_id) AS rn
        FROM expl)
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM (SELECT * FROM capped WHERE rn <= 512) x
    JOIN (SELECT * FROM capped WHERE rn <= 512) y
        ON x.block_id = y.block_id AND x.block_value = y.block_value
        AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.block0, y.block0))
        + bit_count(xor(x.block1, y.block1))
        + bit_count(xor(x.block2, y.block2))
        + bit_count(xor(x.block3, y.block3)) <= 3
    ORDER BY a, b
"""


def _langid_oracle_sql() -> str:
    """langid restated exactly: the engine's scorer is substring counts of
    ``" word "`` over space-isolated lowered text ÷ token count, strict
    argmax with first-profile tie-break, 'und' when the best score is 0.
    Every step is integer-exact or the same double division DuckDB does, so
    the restatement is bit-equal. Generated from functions/textstats'
    _LANG_PROFILES so the two can never drift apart."""
    from ..functions.textstats import _LANG_PROFILES

    def hits(lang: str) -> str:
        terms = [
            "(LENGTH(iso) - LENGTH(REPLACE(iso, ' {w} ', ''))) // {n}".format(
                w=word, n=len(word) + 2)
            for word in sorted(_LANG_PROFILES[lang])
        ]
        return " + ".join(terms)

    langs = list(_LANG_PROFILES)  # dict order = the engine's tie-break order
    score_cols = ",\n               ".join(
        f"({hits(lang)}) / GREATEST(n_tokens, 1) AS s_{lang}" for lang in langs
    )
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pred_chain = "\n                    ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    return f"""
        WITH iso AS (
            SELECT doc_id,
                   ' ' || regexp_replace(LOWER(text), '\\s', '  ', 'g') || ' '
                       AS iso,
                   LENGTH(regexp_extract_all(LOWER(text), '\\S+')) AS n_tokens
            FROM documents),
        scored AS (
            SELECT doc_id,
               {score_cols}
            FROM iso)
        SELECT doc_id,
               CASE WHEN {best} <= 0 THEN 'und'
                    {pred_chain}
               END AS pred_lang,
               ROUND({best}, 6) AS confidence
        FROM scored ORDER BY doc_id
    """


def _hits_oracle_sql() -> str:
    """hits restated exactly: the hits_units integer contract (see
    functions/graph.py) — sum-normalized HITS with T=10**12 mass, floor
    divisions, HUGEINT widening for the rescale product — unrolled to the
    query's 2 iterations. Generated so the propagate/rescale CTEs can't
    drift from each other."""

    def prop(raw_name: str, score: str, edge_key: str, out_key: str) -> str:
        return f"""{raw_name} AS (
            SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS raw
            FROM nodes n LEFT JOIN (
                SELECT e.{out_key} AS node, SUM({score}.score) AS s
                FROM e JOIN {score} ON {score}.node = e.{edge_key}
                GROUP BY e.{out_key}) s USING (node))"""

    def rescale(name: str, raw: str) -> str:
        return f"""{name} AS (
            SELECT node, CAST(CAST(raw AS HUGEINT) * 1000000000000
                          // (SELECT SUM(raw) FROM {raw}) AS BIGINT) AS score
            FROM {raw})"""

    steps = ",\n        ".join([
        prop("a1r", "h0t", "src", "dst"), rescale("a1", "a1r"),
        prop("h1r", "a1", "dst", "src"), rescale("h1", "h1r"),
        prop("a2r", "h1", "src", "dst"), rescale("a2", "a2r"),
        prop("h2r", "a2", "dst", "src"), rescale("h2", "h2r"),
    ])
    return f"""
        WITH e AS (
            SELECT user_id AS src,
                   100000 + CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS dst
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
        p AS (SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS h0
              FROM nodes),
        h0t AS (SELECT n.node, p.h0 AS score FROM nodes n CROSS JOIN p),
        {steps}
        SELECT n.node, a2.score AS auth_units, h2.score AS hub_units
        FROM nodes n JOIN a2 ON a2.node = n.node JOIN h2 ON h2.node = n.node
        ORDER BY n.node
    """


# dedup audit: the same all-pairs-Jaccard + closure restatement, folded to
# the cluster-size histogram — generated from the dedup_minhash entry so
# the two clusterings can never drift apart
ORACLE_SQL["dedup_cluster_sizes"] = f"""
    SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
        FROM ({ORACLE_SQL["dedup_minhash"]}) clusters
        GROUP BY cluster_id)
    GROUP BY size ORDER BY size
"""

ORACLE_SQL["hits"] = _hits_oracle_sql()
ORACLE_SQL["langid"] = _langid_oracle_sql()
ORACLE_SQL["langid_confusion"] = f"""
    WITH pred AS ({_langid_oracle_sql()})
    SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.pred_lang ORDER BY d.lang, p.pred_lang
"""

ORACLE_SQL["wet_extract"] = """
    SELECT 'https://docs.fixture.invalid/' || CAST(doc_id AS VARCHAR) AS url,
           CAST(1767225600000000 AS BIGINT) AS wet_ts_us,
           text
    FROM documents ORDER BY url
"""

# the missing-resource lattice of _convert_report_pages restated: fav
# unfound on d%4==0; a missing stylesheet (d%5==0) reports itself and
# never descends; otherwise the @import (d%3==0) and css url() (d%2==1)
# report individually. n_resources counts every parsed MIME part.
ORACLE_SQL["unfound_report"] = """
    WITH u AS (
        SELECT doc_id,
            list_sort(
                (CASE WHEN doc_id % 4 = 0
                      THEN ['https://convert.fixture.invalid/fav'
                            || CAST(doc_id AS VARCHAR) || '.png']
                      ELSE []::VARCHAR[] END)
                ||
                (CASE WHEN doc_id % 5 = 0
                      THEN ['https://convert.fixture.invalid/style'
                            || CAST(doc_id AS VARCHAR) || '.css']
                      ELSE
                        (CASE WHEN doc_id % 3 = 0
                              THEN ['https://convert.fixture.invalid/imp'
                                    || CAST(doc_id AS VARCHAR) || '.css']
                              ELSE []::VARCHAR[] END)
                        ||
                        (CASE WHEN doc_id % 2 = 1
                              THEN ['https://convert.fixture.invalid/img'
                                    || CAST(doc_id AS VARCHAR) || '.png']
                              ELSE []::VARCHAR[] END)
                 END)) AS lst
        FROM documents)
    SELECT doc_id,
           CAST(1 + CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END
                  + CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END
                  + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END
                AS BIGINT) AS n_resources,
           CAST(len(lst) AS BIGINT) AS n_unfound,
           COALESCE(array_to_string(lst, '|'), '') AS unfound
    FROM u ORDER BY doc_id
"""

ORACLE_SQL["favicon_report"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN 'https://convert.fixture.invalid/fav'
                     || CAST(doc_id AS VARCHAR) || '.png'
                ELSE 'data:image/png;base64,' || to_base64(encode(
                     repeat(chr(CAST(65 + doc_id % 26 AS INTEGER)),
                            3 + doc_id % 5)))
           END AS href,
           CASE WHEN doc_id % 4 = 0 THEN NULL
                ELSE 'https://convert.fixture.invalid/fav'
                     || CAST(doc_id AS VARCHAR) || '.png'
           END AS original_href,
           CASE WHEN doc_id % 3 = 0 THEN '16x16' END AS sizes,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png' END AS icon_type
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["host_graph"] = """
    WITH e AS (
        SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.fixture.invalid'
                   AS src_host,
               'h' || CAST((doc_id + 1) % 7 AS VARCHAR) || '.fixture.invalid'
                   AS dst_host
        FROM documents
        UNION ALL
        SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.fixture.invalid',
               'h' || CAST((doc_id * 3 + 1) % 7 AS VARCHAR)
                   || '.fixture.invalid'
        FROM documents)
    SELECT src_host, dst_host, COUNT(*) AS n_links
    FROM e GROUP BY src_host, dst_host ORDER BY src_host, dst_host
"""

ORACLE_SQL["meta_extract"] = """
    SELECT doc_id,
           'T' || chr(CAST(65 + doc_id % 26 AS INTEGER))
               || CAST(doc_id AS VARCHAR) AS title,
           'Desc & d' || CAST(doc_id AS VARCHAR) AS description,
           CASE WHEN doc_id % 2 = 0
                THEN 'OG doc-' || CAST(doc_id AS VARCHAR) END AS og_title,
           CAST(2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS n_meta
    FROM documents ORDER BY doc_id
"""

# scripts-off keeps only the injected ld+json block; scripts-on adds the
# page's d%3+1 inline scripts plus its external script tag
ORACLE_SQL["script_gate_report"] = """
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_script_off,
           CAST(1 + (doc_id % 3 + 1) + 1 AS BIGINT) AS n_script_on
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["srcset_report"] = """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0
                 THEN 'data:image/png;base64,' || to_base64(encode(
                      'Pa' || CAST(doc_id AS VARCHAR)))
                 ELSE 'https://srcset.fixture.invalid/a'
                      || CAST(doc_id AS VARCHAR) || '.png' END)
           || ' 1x, ' ||
           (CASE WHEN doc_id % 3 = 0
                 THEN 'data:image/png;base64,' || to_base64(encode(
                      'Pb' || CAST(doc_id AS VARCHAR)))
                 ELSE 'https://srcset.fixture.invalid/b'
                      || CAST(doc_id AS VARCHAR) || '.png' END)
           || ' 2x' AS srcset,
           CASE WHEN doc_id % 5 = 0
                THEN 'data:image/png;base64,' || to_base64(encode(
                     'Pc' || CAST(doc_id AS VARCHAR)))
                ELSE 'https://srcset.fixture.invalid/c'
                     || CAST(doc_id AS VARCHAR) || '.png' END AS src,
           'a' || CAST(doc_id AS VARCHAR) || '.png 1x, b'
               || CAST(doc_id AS VARCHAR) || '.png 2x' AS orig_srcset
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["char_entropy"] = """
    WITH cnts AS (
        SELECT doc_id, ch, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
              FROM documents)
        GROUP BY doc_id, ch),
    lens AS (SELECT doc_id, LENGTH(text) AS n FROM documents),
    agg AS (
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c.c * CAST(FLOOR(1000000 * -LN(c.c * 1.0 / l.n))
                                   AS BIGINT)) AS BIGINT) AS entropy_units
        FROM cnts c JOIN lens l USING (doc_id) GROUP BY c.doc_id)
    SELECT l.doc_id, CAST(l.n AS BIGINT) AS n_chars,
           COALESCE(a.n_distinct, 0) AS n_distinct,
           COALESCE(a.entropy_units, 0) AS entropy_units
    FROM lens l LEFT JOIN agg a USING (doc_id) ORDER BY l.doc_id
"""

# RFC 3986 resolution restated: with a <base> (even doc_ids) ../ pops one
# segment off /sub/dir/ and / jumps to the base origin's root; without,
# both resolve against the archive's Content-Location
ORACLE_SQL["base_href_links"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0
                THEN 'https://base' || CAST(doc_id % 5 AS VARCHAR)
                     || '.example/sub/up' || CAST(doc_id AS VARCHAR) || '.html'
                ELSE 'https://links.fixture.invalid/up'
                     || CAST(doc_id AS VARCHAR) || '.html'
           END AS up_url,
           CASE WHEN doc_id % 2 = 0
                THEN 'https://base' || CAST(doc_id % 5 AS VARCHAR)
                     || '.example/root' || CAST(doc_id AS VARCHAR) || '.html'
                ELSE 'https://links.fixture.invalid/root'
                     || CAST(doc_id AS VARCHAR) || '.html'
           END AS root_url
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["transfer_decode"] = """
    SELECT 'https://td.fixture.invalid/' || CAST(doc_id AS VARCHAR) AS url,
           'doc-' || CAST(doc_id AS VARCHAR) AS title,
           text AS text_out
    FROM documents ORDER BY url
"""

ORACLE_SQL["frame_report"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN 'https://frame.fixture.invalid/child'
                     || CAST(doc_id AS VARCHAR) || '.html' END AS frame_src,
           doc_id % 3 != 0 AS has_child_title,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS n_unfound
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["synth_index"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 2
                THEN 'doc-' || CAST(doc_id AS VARCHAR) END AS title,
           CASE doc_id % 3
                WHEN 0 THEN ''
                WHEN 1 THEN 'plain ' || CAST(doc_id AS VARCHAR) || ' x'
                ELSE 'body ' || CAST(doc_id AS VARCHAR) END AS text_out,
           CASE WHEN doc_id % 3 != 2
                THEN 'index-synthesized' END AS anomaly_type,
           CASE WHEN doc_id % 3 = 0
                THEN 'data:image/png;base64,' || to_base64(encode(
                     'Pi' || CAST(doc_id AS VARCHAR))) END AS img_src
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["mhtml_recursion"] = """
    SELECT doc_id,
           doc_id % 4 != 0 AS has_inner_title,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS n_unfound
    FROM documents ORDER BY doc_id
"""

# the composed gate: c4/gopher verdicts reused VERBATIM from their committed
# oracles (they can't drift), the fineweb line rules restated over the raw
# text (the filter entry's own oracle runs them over synthesized pages)
ORACLE_SQL["quality_ensemble"] = f"""
    WITH c4 AS ({ORACLE_SQL["c4_filter"]}),
    g AS ({ORACLE_SQL["gopher_filter"]}),
    l AS (SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line
          FROM documents),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN regexp_matches(line, '[.!?"'']$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_punct,
               CAST(SUM(CASE WHEN length(line) < 30 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_short,
               CAST(SUM(length(line)) AS BIGINT) AS total_chars
        FROM l GROUP BY doc_id),
    dup AS (
        SELECT doc_id,
               CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * len
                                      ELSE 0 END), 0) AS BIGINT) AS dup_chars
        FROM (SELECT doc_id, COUNT(*) AS c, length(line) AS len
              FROM l GROUP BY doc_id, line) gd
        GROUP BY doc_id),
    fw AS (
        SELECT p.doc_id,
               (100 * n_punct >= 12 * n_lines AND
                100 * n_short < 67 * n_lines AND
                10 * dup_chars < total_chars) AS keep,
               CASE WHEN 100 * n_punct < 12 * n_lines THEN 'punct'
                    WHEN 100 * n_short >= 67 * n_lines THEN 'short_lines'
                    WHEN 10 * dup_chars >= total_chars THEN 'dup_lines'
                    END AS drop_reason
        FROM per_doc p JOIN dup USING (doc_id))
    SELECT doc_id,
           (c4.keep AND g.keep AND fw.keep) AS keep,
           CASE WHEN NOT c4.keep THEN 'c4:' || c4.drop_reason
                WHEN NOT g.keep THEN 'gopher:' || g.drop_reason
                WHEN NOT fw.keep THEN 'fineweb:' || fw.drop_reason
                END AS drop_reason
    FROM c4 JOIN g USING (doc_id) JOIN fw USING (doc_id)
    ORDER BY doc_id
"""

ORACLE_SQL["sitemap_extract"] = """
    WITH ks AS (SELECT DISTINCT doc_id % 10 AS k FROM documents),
    urls AS (
        SELECT 'https://s' || CAST(k AS VARCHAR) || '.fixture.invalid/p'
               || CAST(k AS VARCHAR) || CAST(i AS VARCHAR) AS url
        FROM ks, UNNEST([1, 2]) AS t(i)
        UNION ALL
        SELECT 'https://s' || CAST(k AS VARCHAR) || '.fixture.invalid/q'
               || CAST(k AS VARCHAR) || '1'
        FROM ks WHERE k % 3 = 0)
    SELECT url FROM urls ORDER BY url
"""

ORACLE_SQL["wat_roundtrip"] = """
    SELECT 'https://docs.fixture.invalid/' || CAST(doc_id AS VARCHAR) AS url,
           CAST(1767225600000000 AS BIGINT) AS wat_ts_us,
           'doc-' || CAST(doc_id AS VARCHAR) AS title,
           CAST(2 AS BIGINT) AS n_links,
           'https://docs.fixture.invalid/' || CAST(doc_id + 1 AS VARCHAR)
               || '|' || 'https://docs.fixture.invalid/'
               || CAST((doc_id * 7 + 3) % 1000 AS VARCHAR) AS links
    FROM documents ORDER BY url
"""

# the committed cdx_index restatement, filtered to the probed keys
# (ts = 1700000000 + doc_id encodes the doc residue)
ORACLE_SQL["cdx_lookup"] = f"""
    SELECT * FROM ({ORACLE_SQL["cdx_index"]}) idx
    WHERE (ts - 1700000000) % 97 = 0
    ORDER BY surt, ts
"""

# host_pagerank: the committed pagerank restatement with the events edge
# table swapped for the deterministic host edges (slice at the nodes CTE so
# every superstep line is shared verbatim — the two entries cannot drift)
_PR_SQL = ORACLE_SQL["pagerank"]
_HOST_EDGES_SQL = """
            SELECT doc_id % 7 AS src, (doc_id + 1) % 7 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 7, (doc_id * 3 + 1) % 7
            FROM documents"""
ORACLE_SQL["host_pagerank"] = (
    _PR_SQL[:_PR_SQL.index("WITH e AS (") + len("WITH e AS (")]
    + _HOST_EDGES_SQL
    + _PR_SQL[_PR_SQL.index("),\n        nodes AS ("):]
)

ORACLE_SQL["extract_errors"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'Index page not found' END AS error,
           CASE WHEN doc_id % 3 != 0
                THEN 'doc-' || CAST(doc_id AS VARCHAR) END AS title,
           CASE WHEN doc_id % 3 = 0 THEN ''
                ELSE 'ok ' || CAST(doc_id AS VARCHAR) END AS text_out
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["charset_bom_report"] = """
    SELECT doc_id, 'Бом-' || CAST(doc_id AS VARCHAR) AS title
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["sft_format"] = r"""
    WITH parts AS (
        SELECT doc_id,
               'Summarize document doc-' || CAST(doc_id AS VARCHAR) || ':'
                   || chr(10) || text || chr(10) AS prompt,
               'Summary: lang=' || lang || ' chars='
                   || CAST(LENGTH(text) AS VARCHAR) AS completion
        FROM documents)
    SELECT doc_id,
           prompt || completion AS sft_text,
           CAST(LENGTH(prompt) AS BIGINT) AS loss_start,
           CAST(LENGTH(prompt) + LENGTH(completion) AS BIGINT) AS loss_end
    FROM parts ORDER BY doc_id
"""

ORACLE_SQL["span_corruption"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS l FROM documents),
    flat AS (
        SELECT doc_id, UNNEST(generate_series(1, len(l))) AS i
        FROM toks WHERE len(l) > 0),
    m AS (
        SELECT doc_id, i,
               CAST(concat('0x', substr(md5('span1:'
                   || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(i AS VARCHAR)), 1, 2)) AS INTEGER) < 38 AS masked
        FROM flat),
    runs AS (
        SELECT doc_id, i, masked,
               masked AND NOT COALESCE(
                   LAG(masked) OVER (PARTITION BY doc_id ORDER BY i),
                   FALSE) AS run_start
        FROM m),
    agg AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_masked,
               CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_spans,
               COALESCE(string_agg(
                   CASE WHEN masked THEN CAST(i AS VARCHAR) END,
                   ',' ORDER BY i), '') AS masked_positions
        FROM runs GROUP BY doc_id)
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tokens,
           COALESCE(a.n_masked, 0) AS n_masked,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.masked_positions, '') AS masked_positions
    FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id
"""

ORACLE_SQL["meta_robots_gate"] = """
    SELECT doc_id,
           doc_id % 4 NOT IN (0, 1) AS indexable,
           CAST(CASE WHEN doc_id % 4 IN (0, 2) THEN 0 ELSE 1 END
                AS BIGINT) AS n_followable_links
    FROM documents ORDER BY doc_id
"""
