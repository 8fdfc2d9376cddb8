#!/usr/bin/env python
"""Derive an sf1-equivalent dataset from /root/testdata/sf0.1 for the
SCALE.md growth study (10× rows in every non-dimension table).

Naive replication would FAKE superlinear near-dup density: 10 byte-wise
copies of every document become 10 mutual near-duplicates (45 pairs per
doc), which measures the data artifact, not the engine.  So:

- documents: replica 0 is verbatim; replicas 1..9 word-shuffle each
  text with a per-(replica, doc) deterministic permutation — shuffling
  destroys word-shingle and char-3-gram locality, so near-dup DENSITY
  (pairs per row) stays at sf0.1 levels while rows grow 10×.
- embeddings: replicas add deterministic ±noise (scaled per replica) so
  sign-LSH buckets don't collapse onto 10 identical copies.
- fact tables (orders/lineitem/events): key-shifted replicas with
  consistent foreign keys (customer/supplier/part shift by the same
  offsets), so joins have the same selectivity per row as sf0.1.
- region/nation: unscaled (TPC-H doesn't scale them either).

Output: /root/repo/.scaledata/sf1/*.parquet (gitignored).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SCALE_DST", "/root/repo/.scaledata/sf1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
OFF = 100_000_000  # key offset per replica — far above any sf0.1 key


def copy_unscaled(con: duckdb.DuckDBPyConnection, table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )


def replicate_sql(con: duckdb.DuckDBPyConnection, table: str, shifted: dict[str, str]) -> None:
    """UNION ALL of REPLICAS copies with key columns shifted by i*OFF."""
    parts = []
    for i in range(REPLICAS):
        cols = ", ".join(
            f"{c} + {i * OFF} AS {c}" if c in shifted else c
            for c in [d[0] for d in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
        )
        parts.append(f"SELECT {cols} FROM '{SRC}/{table}.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        copy_unscaled(con, t)

    replicate_sql(con, "customer", {"c_custkey"})
    replicate_sql(con, "supplier", {"s_suppkey"})
    replicate_sql(con, "part", {"p_partkey"})
    replicate_sql(con, "orders", {"o_orderkey", "o_custkey"})
    replicate_sql(con, "lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
    replicate_sql(con, "events", {"event_id", "user_id"})

    # documents: word-shuffle replicas 1..9 (deterministic per (i, doc)).
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    sources = tbl.column("source").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(REPLICAS):
        for did, txt, lang, src in zip(doc_ids, texts, langs, sources):
            if i == 0 or txt is None:
                new_txt = txt
            else:
                words = txt.split()
                random.Random(i * 1_000_003 + (did or 0)).shuffle(words)
                new_txt = " ".join(words)
            out["doc_id"].append((did or 0) + i * OFF)
            out["text"].append(new_txt)
            out["lang"].append(lang)
            out["source"].append(src)
            out["n_chars"].append(len(new_txt) if new_txt is not None else 0)
    pq.write_table(pa.table(out), f"{DST}/documents.parquet")

    # embeddings: deterministic noise per replica (keeps neighborhoods
    # plausible without creating 10 exact copies of every vector).
    etbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = etbl.column("vec_id").to_pylist()
    embs = np.array(etbl.column("embedding").to_pylist(), dtype=np.float32)
    labels = etbl.column("label").to_pylist()
    eo = {"vec_id": [], "embedding": [], "label": []}
    for i in range(REPLICAS):
        rng = np.random.default_rng(i)
        noisy = embs if i == 0 else embs + rng.normal(0, 0.05, embs.shape).astype(np.float32)
        eo["vec_id"].extend(v + i * OFF for v in vec_ids)
        eo["embedding"].extend(noisy.tolist())
        eo["label"].extend(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(eo["vec_id"], pa.int64()),
                "embedding": pa.array(eo["embedding"], pa.list_(pa.float32())),
                "label": pa.array(eo["label"], pa.int32()),
            }
        ),
        f"{DST}/embeddings.parquet",
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    sys.exit(main())
