#!/usr/bin/env python3
"""Bench-only corpus upscaler: replicate the sf0.1 tables REP times with
shifted primary keys into a target dir, for an "sf1-scale" Bench point
(no sf1 driver testdata exists). Key handling preserves semantics:

- orders/lineitem: orderkey shifted per replica (joins stay 1:N);
  custkey/partkey/suppkey unchanged (dims stay 1x, stay broadcastable).
- events: event_id shifted, user_id/ts unchanged (hourly windows get
  10x rows; sessionization/skew joins see 10x events per user).
- documents/embeddings: ids shifted, content unchanged (dedup sees
  exact 10x duplicate groups - a deliberate hot-group stress; ANN
  candidates 10x).
- events.ts is written as epoch-nanos BIGINT, the same physical shape
  Spark reads the driver parquet with (nanosAsLong), so Tables.events
  works unchanged.

Usage: python3 tools/upscale.py [src] [dst] [rep]
"""
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def key_span(table: str, key: str) -> int:
        return con.sql(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    for t in ["region", "nation", "customer", "supplier", "part"]:
        copy(f"SELECT * FROM '{src}/{t}.parquet'", t)

    ok = key_span("orders", "o_orderkey")
    copy(
        f"SELECT o_orderkey + i * {ok} AS o_orderkey, o_custkey, o_orderstatus,"
        f" o_totalprice, o_orderdate, o_orderpriority"
        f" FROM '{src}/orders.parquet', range({rep}) t(i)", "orders")
    copy(
        f"SELECT l_orderkey + i * {ok} AS l_orderkey, l_partkey, l_suppkey,"
        f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        f" l_returnflag, l_linestatus, l_shipdate"
        f" FROM '{src}/lineitem.parquet', range({rep}) t(i)", "lineitem")

    ev = key_span("events", "event_id")
    copy(
        f"SELECT event_id + i * {ev} AS event_id, epoch_ns(ts) AS ts, user_id,"
        f" event_type, value, props"
        f" FROM '{src}/events.parquet', range({rep}) t(i)", "events")

    dk = key_span("documents", "doc_id")
    copy(
        f"SELECT doc_id + i * {dk} AS doc_id, text, lang, source, n_chars"
        f" FROM '{src}/documents.parquet', range({rep}) t(i)", "documents")

    vk = key_span("embeddings", "vec_id")
    copy(
        f"SELECT vec_id + i * {vk} AS vec_id, embedding, label"
        f" FROM '{src}/embeddings.parquet', range({rep}) t(i)", "embeddings")


if __name__ == "__main__":
    main()
