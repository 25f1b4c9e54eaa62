#!/usr/bin/env python3
"""Generate scale-test parquet tables mirroring /root/testdata's shape.

The driver generates sf{0.001,0.01,0.1}; scale-proofing (VERDICT r7 item 1)
needs a 10x tier. This reproduces the same schemas, key ranges, and value
distributions observed in the driver data (seed 42, deterministic) at an
arbitrary multiple of sf0.1, plus a skew-stressed variant:
  - orders.o_custkey / lineitem.l_partkey,l_suppkey / events.user_id:
    30% of rows hit key 0 (join/agg skew -> AQE skew-join path),
  - documents: 20% of docs share one hot text (giant dedup cluster).

Usage: python3 tools/gen_sf.py OUTDIR MULT [--skew]
e.g.   python3 tools/gen_sf.py /tmp/testdata/sf1 10
       python3 tools/gen_sf.py /tmp/testdata/sf1skew 10 --skew
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"


def write(outdir, name, table):
    path = os.path.join(outdir, f"{name}.parquet")
    # Row groups are the unit of scan parallelism: a single-row-group file
    # caps the whole map side at ONE reader no matter how many cores the
    # cluster has (measured: the 500k-doc single-row-group documents table
    # serialized every compute-dense pipeline at the 100x tier — SCALE.md).
    # Size groups so even the smallest interesting table splits ~256 ways,
    # the same discipline a real ingest layer applies when writing.
    rgs = max(8192, table.num_rows // 256)
    pq.write_table(table, path, version="2.6", coerce_timestamps=None,
                   row_group_size=rgs)
    print(f"[gen] {name}: {table.num_rows} rows ({rgs}/group) -> {path}", flush=True)


def main():
    outdir = sys.argv[1]
    mult = int(sys.argv[2])
    skew = "--skew" in sys.argv
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = 15000 * mult
    n_supp = 1000 * mult
    n_part = 20000 * mult
    n_ord = 150000 * mult
    n_li = 600000 * mult
    n_ev = 100000 * mult
    n_doc = 5000 * mult
    n_emb = 2000 * mult

    # region / nation: constant dimensions, copy shape from the reference dir
    write(outdir, "region", pq.read_table(f"{REF}/region.parquet"))
    write(outdir, "nation", pq.read_table(f"{REF}/nation.parquet"))

    # customer
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    ck = np.arange(n_cust, dtype=np.int64)
    write(outdir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, n_cust)]),
    }))

    # supplier
    write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part
    adjs = np.array(["blue", "cold", "hot", "large", "new", "old", "red", "small"])
    nouns = np.array(["ring", "bolt", "screw", "nut", "washer", "cap", "disk", "plate"])
    types = np.array(["ECONOMY", "MEDIUM", "PROMO", "SMALL", "STANDARD", "LARGE"])
    pk = np.arange(n_part, dtype=np.int64)
    pname = np.char.add(np.char.add(adjs[rng.integers(0, 8, n_part)], " "),
                        nouns[rng.integers(0, 8, n_part)])
    write(outdir, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array(pname),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(types[rng.integers(0, len(types), n_part)]),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (pk % 2001), 2),
    }))

    # orders: orderdate uniform 1995-01-01..2001-08-01 (day granularity)
    day_us = 86_400_000_000
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_days = (np.datetime64("2001-08-01", "us").astype(np.int64) - d0) // day_us
    odate_us = d0 + rng.integers(0, span_days + 1, n_ord) * day_us
    o_cust = rng.integers(0, n_cust, n_ord)
    if skew:
        hot = rng.random(n_ord) < 0.30
        o_cust = np.where(hot, 0, o_cust)
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": o_cust.astype(np.int64),
        "o_orderstatus": pa.array(statuses[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: lines-per-order ~ truncated Poisson(4)+... observed mode 3-4,
    # range 1..17. Draw per-order counts, then trim/pad to exactly n_li.
    cnts = np.clip(rng.poisson(4.0, n_ord), 1, 17)
    total = int(cnts.sum())
    while total < n_li:  # pad by bumping random orders
        idx = rng.integers(0, n_ord, n_li - total)
        np.add.at(cnts, idx, 1)
        cnts = np.clip(cnts, 1, 17)
        total = int(cnts.sum())
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), cnts)[:n_li]
    lnum_parts = [np.arange(1, c + 1, dtype=np.int32) for c in cnts]
    lnums = np.concatenate(lnum_parts)[:n_li]
    l_part = rng.integers(0, n_part, n_li)
    l_supp = rng.integers(0, n_supp, n_li)
    if skew:
        hot = rng.random(n_li) < 0.30
        l_part = np.where(hot, 0, l_part)
        l_supp = np.where(hot, 0, l_supp)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    retail = 900.0 + 0.1 * (l_part % 2001)
    ship_ms = (odate_us[okeys] // 1000) + rng.integers(1, 96, n_li) * 86_400_000
    flags = np.array(["A", "N", "R"])
    lstat = np.array(["F", "O"])
    write(outdir, "lineitem", pa.table({
        "l_orderkey": okeys,
        "l_partkey": l_part.astype(np.int64),
        "l_suppkey": l_supp.astype(np.int64),
        "l_linenumber": lnums,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * retail, 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(flags[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(lstat[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship_ms, pa.timestamp("ms")),
    }))

    # events: ~30-day span regardless of size (a stream gets denser, not
    # longer); ts is NANOS on purpose — the engine's read path must keep
    # handling TIMESTAMP(NANOS) at scale. user pool = n_ev/66.7 like sf0.1.
    n_users = max(1, int(n_ev / 66.7))
    t0 = np.datetime64("2024-01-01", "ns").astype(np.int64)
    span_ns = 30 * 86_400_000_000_000
    ts = t0 + np.sort(rng.integers(0, span_ns, n_ev))
    users = rng.integers(0, n_users, n_ev)
    if skew:
        users = np.where(rng.random(n_ev) < 0.30, 0, users)
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": users.astype(np.int64),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_ev)]),
        "value": np.round(np.clip(rng.exponential(80.0, n_ev), 0, 600), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: same 31-word vocabulary as the driver data (read from it),
    # 10..100 words, lang {en:.41, others:.1475}, 20 round-robin sources,
    # ~0.2% exact-dup pairs (driver sf0.1 had 8 dup texts in 5000).
    vocab = sorted({w for t in pq.read_table(f"{REF}/documents.parquet", columns=["text"])
                   .column("text").to_pylist() for w in t.split(" ")})
    vocab = np.array(vocab)
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    wc = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), c)]) for c in wc]
    n_dup = max(1, n_doc // 500)
    for i in rng.integers(0, n_doc, n_dup):
        texts[(int(i) + n_doc // 2) % n_doc] = texts[int(i)]
    if skew:
        hot_text = texts[0]
        for i in np.flatnonzero(rng.random(n_doc) < 0.20):
            texts[int(i)] = hot_text
    write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(langs[rng.choice(5, n_doc, p=lang_p)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 64-dim unit vectors in 10 label clusters (center + noise,
    # L2-normalized) — matches observed component range ±0.58 and gives
    # ANN/semdedup benches real cluster structure.
    d = 64
    centers = rng.standard_normal((10, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    vecs = centers[labels] * 0.8 + rng.standard_normal((n_emb, d)) * 0.25
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel()), d).cast(pa.list_(pa.float32()))
    write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": emb,
        "label": labels,
    }))
    print("[gen] done", flush=True)


if __name__ == "__main__":
    main()
