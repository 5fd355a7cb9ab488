#!/usr/bin/env python
"""Deterministic synthetic-testdata generator for scale benchmarking.

Mirrors the driver-generated tables at ``/root/testdata/sf*`` (TESTDATA.md:
seed-42 TPC-H-ish star schema + ``events`` / ``documents`` / ``embeddings``)
so the registry can be benchmarked at scale factors the driver does not ship
(sf1 ≈ 6 M lineitem rows).  Schemas are matched to the parquet physical
types of the driver's files (int64/int32/double/string/timestamp[us],
``list<float>``); distributions are matched to the profiled driver data:

- uniform-random foreign keys (lineitem→orders draws give the observed
  zero-truncated-Poisson(4) per-order fan-out; orders→customer Poisson(10)),
- ``events.value`` ~ Exponential(mean 50), ts uniform over 2024-01,
  user_id uniform over customers/10 users,
- documents: 10–100 words from the 30-word engine vocab, lang weights
  (en .41, de/es/fr/zh ~.15), ``source = src{doc_id % 20}``, ~5 % planted
  near-duplicates carrying the ``dup`` marker token + a few exact dups,
- embeddings: 64-dim unit-normalized Gaussians with a small per-label
  centroid offset, labels 0–9.

NOT a byte-for-byte clone of the driver data (the driver's RNG stream is
unknown); it is the same schema, key ranges, and statistical shape, which
is what per-family scaling ratios need.  Correctness gates keep running on
the driver's own files.

Usage:  python tools/gen_testdata.py --sf 1 --out /root/repo/.scale_data/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "small", "dark", "light", "cold"]
PNOUN = ["ring", "bolt", "screw", "cap", "disk", "tube", "wheel", "plate"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000


def _counts(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": int(50_000 * sf),
        "embeddings": int(20_000 * sf),
    }


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=262_144, compression="snappy")
    print(f"wrote {path}: {table.num_rows} rows")


def gen(sf: float, out: str, only: set[str] | None = None) -> None:
    """Write the synthetic tables to ``out``.  ``only`` restricts which
    tables are generated (third-decade sweeps need just documents /
    embeddings — sf100 lineitem would be 600 M rows of dead weight);
    every table block seeds its own RNG stream, so a filtered run
    produces byte-identical files for the tables it does write."""
    os.makedirs(out, exist_ok=True)
    n = _counts(sf)
    want = (lambda t: True) if only is None else (lambda t: t in only)
    base = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)

    if want("region"):
        _write(out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": pa.array(REGIONS),
        }))
    if want("nation"):
        _write(out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    if want("customer"):
        rng = np.random.default_rng(42)
        nc = n["customer"]
        _write(out, "customer", pa.table({
            "c_custkey": pa.array(np.arange(nc), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
            "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
        }))

    if want("supplier"):
        rng = np.random.default_rng(43)
        ns = n["supplier"]
        _write(out, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(ns), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
            "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
        }))

    if want("part"):
        rng = np.random.default_rng(44)
        np_ = n["part"]
        adj = np.array(PADJ)[rng.integers(0, len(PADJ), np_)]
        noun = np.array(PNOUN)[rng.integers(0, len(PNOUN), np_)]
        _write(out, "part", pa.table({
            "p_partkey": pa.array(np.arange(np_), pa.int64()),
            "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, np_)],
            "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, np_)]),
            "p_size": pa.array(rng.integers(1, 51, np_), pa.int32()),
            "p_retailprice": np.round(900.0 + (np.arange(np_) % 1000) * 0.1, 2),
        }))

    if want("orders"):
        rng = np.random.default_rng(45)
        no = n["orders"]
        _write(out, "orders", pa.table({
            "o_orderkey": pa.array(np.arange(no), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n["customer"], no), pa.int64()),
            "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, no)]),
            "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
            "o_orderdate": pa.array(
                base + rng.integers(0, 2405, no) * DAY_US, pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
        }))

    if want("lineitem"):
        rng = np.random.default_rng(46)
        nl = n["lineitem"]
        _write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(rng.integers(0, n["orders"], nl), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n["part"], nl), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n["supplier"], nl), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
            "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
            "l_discount": np.round(rng.integers(0, 11, nl) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, nl) * 0.01, 2),
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nl)]),
            "l_shipdate": pa.array(
                base + rng.integers(1, 2500, nl) * DAY_US, pa.timestamp("us")
            ),
        }))

    if want("events"):
        rng = np.random.default_rng(47)
        ne = n["events"]
        users = max(1, n["customer"] // 10)
        ts0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
        # chunked writer: at sf100 events is 100 M rows and the props
        # column alone would hold ~100 M Python strings in one list —
        # write 10 M-row slices through one ParquetWriter instead.
        # RNG-stream note: per-chunk column draws interleave the PCG64
        # stream differently than the old single-shot per-column draws,
        # so for ne > chunk the data DIFFERS from what the pre-chunked
        # generator would have produced (only files at or below the
        # chunk size are byte-identical).  No stale artifact exists:
        # every ne > chunk events file ever generated (.scale_data
        # sf100, round 9+) came from THIS writer — the single-shot path
        # OOM'd before it could write one.
        chunk = 10_000_000
        path = os.path.join(out, "events.parquet")
        writer = None
        for lo in range(0, ne, chunk):
            m = min(chunk, ne - lo)
            t = pa.table({
                "event_id": pa.array(np.arange(lo, lo + m), pa.int64()),
                "ts": pa.array(
                    ts0 + rng.integers(0, 30 * DAY_US, m), pa.timestamp("us")
                ),
                "user_id": pa.array(rng.integers(0, users, m), pa.int64()),
                "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, m)]),
                "value": np.round(rng.exponential(50.0, m), 2),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, m)],
            })
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema, compression="snappy")
            writer.write_table(t, row_group_size=262_144)
        if writer is not None:
            writer.close()
        print(f"wrote {path}: {ne} rows")

    if want("documents"):
        rng = np.random.default_rng(48)
        nd = n["documents"]
        vocab = np.array(VOCAB)
        # chunked writer above DOC_CHUNK rows (fourth-decade corpora: sf1000
        # is 50 M texts ≈ 25+ GB of Python strings in one list — the same
        # wall the events writer hit at sf100).  Near/exact-duplicate
        # planting samples its copy SOURCE within the chunk, and per-chunk
        # RNG draws interleave differently than the single-shot stream, so
        # a >DOC_CHUNK file is NOT byte-comparable to what the unchunked
        # path would have produced — fine for new fourth-decade artifacts
        # (none predate this writer); files at or below DOC_CHUNK keep the
        # historical single-shot stream exactly.  Known locality skew
        # (round-10 ADVICE): because copy sources stay within the chunk,
        # corpora >DOC_CHUNK have ZERO cross-chunk duplicate pairs — all
        # dup pairs land within 10M-id bands, which can flatter LSH /
        # minhash bucket locality relative to a uniform-source corpus.
        # Kept as-is (changing it would break byte-identity with every
        # committed >DOC_CHUNK artifact); scale conclusions drawn from
        # fourth-decade corpora should note dup pairs are id-band-local.
        DOC_CHUNK = 10_000_000

        def _doc_chunk(lo: int, m: int) -> pa.Table:
            lens = rng.integers(10, 101, m)
            texts: list[str] = []
            for i in range(m):
                texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
            # plant ~5% near-duplicates: copy another doc (same chunk),
            # swap one word for the 'dup' marker token
            ndup = m // 20
            dup_targets = rng.choice(m, size=ndup, replace=False)
            for t in dup_targets:
                src = int(rng.integers(0, m))
                words = texts[src].split()
                words[int(rng.integers(0, len(words)))] = "dup"
                texts[int(t)] = " ".join(words)
            # a handful of exact duplicates
            for t in rng.choice(m, size=max(1, m // 625), replace=False):
                texts[int(t)] = texts[int(rng.integers(0, m))]
            langs = rng.choice(LANGS, size=m, p=LANG_W)
            return pa.table({
                "doc_id": pa.array(np.arange(lo, lo + m), pa.int64()),
                "text": texts,
                "lang": pa.array(langs),
                "source": [f"src{i % 20}" for i in range(lo, lo + m)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            })

        if nd <= DOC_CHUNK:
            _write(out, "documents", _doc_chunk(0, nd))
        else:
            path = os.path.join(out, "documents.parquet")
            writer = None
            for lo in range(0, nd, DOC_CHUNK):
                t = _doc_chunk(lo, min(DOC_CHUNK, nd - lo))
                if writer is None:
                    writer = pq.ParquetWriter(path, t.schema, compression="snappy")
                writer.write_table(t, row_group_size=262_144)
                print(f"  documents chunk {lo}..{lo + t.num_rows}", flush=True)
            writer.close()
            print(f"wrote {path}: {nd} rows")

    if want("embeddings"):
        rng = np.random.default_rng(49)
        nv = n["embeddings"]
        labels = rng.integers(0, 10, nv)
        centroids = rng.normal(0, 0.15, (10, 64))
        vecs = rng.normal(0, 1.0, (nv, 64)) + centroids[labels]
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs.astype(np.float32)
        _write(out, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(nv), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float32()), 64
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset of tables to generate")
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data",
        f"sf{args.sf:g}",
    )
    gen(args.sf, out, only=set(args.tables.split(",")) if args.tables else None)


if __name__ == "__main__":
    main()
