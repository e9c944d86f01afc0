#!/usr/bin/env python3
"""Derive the 10x "sf1" benchmark dataset from the driver's sf0.1 parquet
(no driver sf1 exists). Implements the recipe documented in
BENCH_sf1.json's sf1_derivation:

- fact tables (lineitem, orders, documents, embeddings) are replicated
  10x with key remapping so joins stay consistent (the same per-replica
  offset is added to l_orderkey and o_orderkey);
- documents get a per-replica text token so replicas remain DISTINCT
  documents under exact/near dedup;
- dimension tables (region nation customer supplier part) and events are
  copied at sf0.1 scale — real corpora grow facts much faster than dims;
- ADDITIONALLY <dst>/perturbed/embeddings.parquet holds the PERTURBED
  embedding variant for honest cross-scale ANN recall (VERDICT r10
  next-3): replica 0 keeps the original vectors (queries stay
  comparable with sf0.1), replicas 1..R-1 add deterministic per-element
  Gaussian noise with sigma = 0.05 per dim (= 0.4x the corpus'
  per-dim std of 0.125) via hash-seeded Box-Muller — exact copies made
  sf1's IVF recall trivially 1.0 (each query's true top-10 were its own
  byte-identical copies, same cell by construction); at 0.4x std the
  copies are still near their origin but land across cell boundaries,
  so ground truth is non-degenerate.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [replicas]
       (defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10)
"""
import os
import sys

import duckdb

OFFSET = 100_000_000  # disjoint key space per replica; sf0.1 keys << this


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, sql: str) -> None:
        con.sql(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ["region", "nation", "customer", "supplier", "part", "events"]:
        write(t, f"SELECT * FROM '{src}/{t}.parquet'")

    reps_sql = f"(SELECT unnest(range(0, {reps})) AS rep)"
    write("orders",
          f"SELECT o_orderkey + rep * {OFFSET} AS o_orderkey, "
          f"  orders.* EXCLUDE (o_orderkey) "
          f"FROM '{src}/orders.parquet' AS orders CROSS JOIN {reps_sql}")
    write("lineitem",
          f"SELECT l_orderkey + rep * {OFFSET} AS l_orderkey, "
          f"  lineitem.* EXCLUDE (l_orderkey) "
          f"FROM '{src}/lineitem.parquet' AS lineitem CROSS JOIN {reps_sql}")
    write("documents",
          f"SELECT doc_id + rep * {OFFSET} AS doc_id, "
          f"  text || ' rep' || rep AS text, "
          f"  documents.* EXCLUDE (doc_id, text) "
          f"FROM '{src}/documents.parquet' AS documents CROSS JOIN {reps_sql}")
    write("embeddings",
          f"SELECT vec_id + rep * {OFFSET} AS vec_id, "
          f"  embeddings.* EXCLUDE (vec_id) "
          f"FROM '{src}/embeddings.parquet' AS embeddings CROSS JOIN {reps_sql}")

    # perturbed variant: deterministic hash-seeded Box-Muller noise,
    # sigma=0.05/dim on replicas 1..R-1 only (see module docstring)
    os.makedirs(f"{dst}/perturbed", exist_ok=True)
    u1 = "((hash(vec_id0 * 8191 + i * 131 + rep * 7 + 1) % 1048576) + 0.5) / 1048576.0"
    u2 = "((hash(vec_id0 * 8191 + i * 131 + rep * 7 + 2) % 1048576) + 0.5) / 1048576.0"
    noise = f"0.05 * sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2})"
    write("perturbed/embeddings",
          f"SELECT vec_id0 + rep * {OFFSET} AS vec_id, "
          f"  CAST(list_transform(embedding, (x, i) -> "
          f"    CASE WHEN rep = 0 THEN CAST(x AS DOUBLE) "
          f"         ELSE x + {noise} END) AS FLOAT[]) AS embedding, "
          f"  label "
          f"FROM (SELECT vec_id AS vec_id0, embedding, label "
          f"      FROM '{src}/embeddings.parquet') CROSS JOIN {reps_sql}")


if __name__ == "__main__":
    main()
