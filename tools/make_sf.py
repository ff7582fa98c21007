"""Scale-factor replicator: build a larger self-bench fixture from an
existing testdata dir by K-fold replication with consistent key offsets.

The driver ships sf0.001/0.01/0.1; the 2x-of-baseline bar has only ever
been exercised at sf0.1 (VERDICT r4 #3). This tool manufactures sf1 (or
any K) locally WITHOUT touching the read-only driver fixtures: every
fact/dim table is unioned K times with each foreign-key family shifted
by a per-family stride (max key + 1), so join fan-outs, group
cardinalities, and key distributions all scale together — orders still
join their customers, lineitems their orders/parts/suppliers, events get
K x distinct users. region/nation stay fixed (broadcast dims by
construction, same as TPC-H). Replica texts get a per-replica suffix
(near-dups, not exact dups — realistic dedup load) and embeddings a tiny
deterministic per-replica perturbation (distinct vectors, same cluster
structure).

DuckDB writes ONE parquet file per table (the layout the loader and the
streaming gate's pathGlobFilter expect); multi-row-group files stay
splittable for Spark's scan parallelism.

Usage: python tools/make_sf.py [src_dir] [dest_dir] [K]
       python tools/make_sf.py            # sf0.1 -> /tmp/spark_graft_sf1, K=10
"""

from __future__ import annotations

import os
import sys

import duckdb

# key families: columns sharing a family get the SAME stride so FK
# relationships survive replication
FAMILIES: dict[str, list[tuple[str, str]]] = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "order": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}
COPY_AS_IS = ["region", "nation"]
REPLICATED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def make_sf(src: str, dest: str, k: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for fam, cols in FAMILIES.items():
        base_table, base_col = cols[0]
        stride = con.execute(
            f"SELECT max({base_col}) + 1 FROM '{src}/{base_table}.parquet'"
        ).fetchone()[0]
        for t, c in cols:
            strides[(t, c)] = stride
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in REPLICATED:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if (t, c) in strides:
                sel.append(f"{c} + i * {strides[(t, c)]} AS {c}")
            elif t == "documents" and c == "text":
                # near-dup replicas, not byte-identical ones: dedup and
                # fingerprint queries see realistic (bounded) cluster load
                sel.append(
                    "text || CASE WHEN i = 0 THEN '' ELSE ' rep' || i END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "list_transform(embedding, x -> "
                    "CAST(x + i * 0.0001 AS FLOAT))::FLOAT[] AS embedding"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN range({k}) r(i)) TO '{dest}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sf(src, dest, k)
    print(f"wrote {dest} (K={k} from {src})")
