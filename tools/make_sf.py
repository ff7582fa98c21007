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
construction, same as TPC-H).

Replicas must be DISTINCT documents/vectors, not near-dups of each
other: the driver's own sf progression keeps planted-duplicate counts
constant while the corpus grows, and the scaling bench exists to measure
operator scaling, not fixture-manufactured quadratic duplicate density
(K replicas per family = C(K,2) true pairs per family — the first sf1
run flagged exactly this on the Levenshtein and embedding near-dup
queries). So replica texts are REPLACED with deterministic md5 token
streams of the same token count (shingle Jaccard ~0 vs base and between
replicas, text volume stays ~K x — an appended-filler variant inflated
bytes 1.7 x beyond the row growth and muddied every text-op ratio) and
replica embeddings get a per-(vector, replica, element) hash-signed
+-0.025*i perturbation — cosine < 0.99 against base and every other
replica, and NO shared perturbation direction (a common direction
clustered all same-i replicas into the same LSH hyperplane buckets and
manufactured quadratic candidate skew: 205 s on the incremental
near-dup query, 5 s after the fix).

DuckDB writes ONE parquet file per table (the layout the loader and the
streaming gate's pathGlobFilter expect); multi-row-group files stay
splittable for Spark's scan parallelism.

Usage: python tools/make_sf.py [src_dir] [dest_dir] [K] [tables]
       python tools/make_sf.py            # sf0.1 -> /tmp/spark_graft_sf1, K=10
       python tools/make_sf.py /tmp/spark_graft_sf1 /tmp/spark_graft_sf10 \
           10 documents,embeddings        # sf10, heavy-family tables only

``tables`` (comma-separated) restricts replication to a subset — the
r7 next-decade sweep manufactures sf10 for documents/embeddings only
(~500k docs / 200k vectors), since the dedup/ANN/span families read
nothing else and a full sf10 TPC-H side would waste the sandbox.
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


def make_sf(src: str, dest: str, k: int, tables: list[str] | None = None) -> None:
    os.makedirs(dest, exist_ok=True)
    # Invalidate the reader memo for in-process callers (r9 advice #3):
    # readers._TABLE_CACHE assumes fixture dirs are immutable, and this
    # is the one tool that rewrites one — a test that generates a dir,
    # reads it through `load`, and regenerates it in the SAME process
    # would otherwise keep the stale memoized file listing.
    try:
        from employee_activity_etl_poc_spark.sources.readers import (
            clear_table_cache,
        )

        clear_table_cache()
    except ImportError:
        pass  # standalone use outside the repo checkout
    copy_as_is = [t for t in COPY_AS_IS if tables is None or t in tables]
    replicated = [t for t in REPLICATED if tables is None or t in tables]
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for fam, cols in FAMILIES.items():
        base_table, base_col = cols[0]
        if base_table not in replicated:
            continue
        stride = con.execute(
            f"SELECT max({base_col}) + 1 FROM '{src}/{base_table}.parquet'"
        ).fetchone()[0]
        for t, c in cols:
            strides[(t, c)] = stride
    for t in copy_as_is:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in replicated:
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
                sel.append(
                    "CASE WHEN i = 0 THEN text ELSE "
                    "array_to_string([substr(md5(doc_id::VARCHAR || '-' || "
                    "i::VARCHAR || '-' || j::VARCHAR), 1, 5) "
                    "for j in generate_series(1, len(string_split(text, ' ')))], "
                    "' ') END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "[CAST(embedding[j] + 0.025 * i * "
                    "(CASE WHEN hash(vec_id::VARCHAR || ':' || i::VARCHAR "
                    "|| ':' || j::VARCHAR) % 2 = 0 THEN 1 ELSE -1 END) "
                    "AS FLOAT) "
                    "for j in generate_series(1, len(embedding))]::FLOAT[] "
                    "AS embedding"
                )
            else:
                sel.append(c)
        inner = (
            f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN range({k}) r(i)"
        )
        if t == "documents":
            # replica texts grew; keep the derived length column honest
            inner = (
                f"SELECT * REPLACE (length(text)::BIGINT AS n_chars) "
                f"FROM ({inner})"
            )
        con.execute(
            f"COPY ({inner}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    make_sf(src, dest, k, tables)
    print(f"wrote {dest} (K={k} from {src})")
