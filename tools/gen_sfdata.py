#!/usr/bin/env python
"""Generate a driver-shaped synthetic dataset at an arbitrary scale factor.

The graded testdata under /root/testdata/sf{0.001,0.01,0.1} is driver-generated
and read-only; the driver's round-end MEASUREMENT escalates to sf1.0, which it
generates itself.  This script synthesizes a *measurement-only* dataset with
the same schemas, cardinality ratios and value distributions (inspected from
sf0.1 via pyarrow) so optimization work can be timed at the driver's
measurement scale.  It is NOT byte-identical to the driver's data and must
never be written into /root/testdata.

Usage: python tools/gen_sfdata.py <sf> <outdir>     e.g. 1.0 /root/testdata_sf1/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ADJ = ["red", "small", "hot", "cold", "old", "new", "large", "blue"]
NOUN = ["gear", "gizmo", "widget", "ring", "plate", "anvil", "bolt", "rod"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def write(df: pd.DataFrame, out: str, name: str) -> None:
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {len(df)} rows")


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    k = sf / 0.1  # ratios are expressed relative to the inspected sf0.1

    n_docs = int(5000 * k)
    n_emb = int(2000 * k)
    n_events = int(100000 * k)
    n_li = int(600000 * k)
    n_orders = int(150000 * k)
    n_cust = int(15000 * k)
    n_supp = int(1000 * k)
    n_part = int(20000 * k)
    n_users = int(1500 * k)

    # documents: 31-word vocab, 10-100 tokens/doc, round-robin source
    lens = rng.integers(10, 101, n_docs)
    flat = rng.integers(0, len(VOCAB), int(lens.sum()))
    words = np.array(VOCAB, dtype=object)[flat]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_docs, p=LANG_P),
        "source": [f"src{i % 20}" for i in range(n_docs)],
    })
    docs["n_chars"] = docs.text.str.len().astype(np.int64)
    write(docs, out, "documents")

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(vecs),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    })
    write(emb, out, "embeddings")

    ts0 = pd.Timestamp("2024-01-01").value // 1000
    span = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span, n_events)) + ts0
    events = pd.DataFrame({
        "event_id": np.arange(n_events, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n_events),
        "event_type": rng.choice(["view", "click", "signup", "purchase", "error"], n_events),
        "value": np.round(rng.exponential(50.0, n_events), 2),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_events)],
    })
    write(events, out, "events")

    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_orders, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": rng.choice(["N", "R", "A"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": (pd.Timestamp("1995-01-01") + pd.to_timedelta(rng.integers(0, 2500, n_li), unit="D")).astype("datetime64[us]"),
    })
    write(li, out, "lineitem")

    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_orders),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_orders),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
        "o_orderdate": (pd.Timestamp("1995-01-01") + pd.to_timedelta(rng.integers(0, 2405, n_orders), unit="D")).astype("datetime64[us]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_orders),
    })
    write(orders, out, "orders")

    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"], n_cust),
    })
    write(cust, out, "customer")

    supp = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    write(supp, out, "supplier")

    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in rng.integers(0, 64, n_part)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(["LARGE", "MEDIUM", "ECONOMY", "PROMO", "SMALL", "STANDARD"], n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900 + (np.arange(n_part) % 1000) * 0.1, 1),
    })
    write(part, out, "part")

    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int64),
    })
    write(nation, out, "nation")

    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int64),
        "r_name": REGIONS,
    })
    write(region, out, "region")

    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    main()
