"""Scale-factor replicator (tools/make_sf.py): FK families survive
replication, and replicas are DISTINCT docs/vectors — not manufactured
near-dups that would scale duplicate density quadratically (the flaw the
first sf1 self-bench run exposed on the Levenshtein and embedding
near-dup queries)."""

from __future__ import annotations

import duckdb
import numpy as np

from tools.make_sf import make_sf

SRC = "/root/testdata/sf0.001"


def test_replication_counts_fks_and_distinct_replicas(tmp_path):
    dest = str(tmp_path / "sf2x")
    make_sf(SRC, dest, 2)
    con = duckdb.connect()

    # row counts scale by K; fixed dims don't
    for t, k in [("lineitem", 2), ("orders", 2), ("events", 2),
                 ("documents", 2), ("embeddings", 2), ("region", 1)]:
        n_src = con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_dst = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        assert n_dst == k * n_src, t

    # FK integrity after offsetting: every order has its customer, every
    # lineitem its order/part/supplier
    for fact, fk, dim, pk in [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]:
        orphans = con.execute(
            f"SELECT count(*) FROM '{dest}/{fact}.parquet' f "
            f"WHERE NOT EXISTS (SELECT 1 FROM '{dest}/{dim}.parquet' d "
            f"WHERE d.{pk} = f.{fk})"
        ).fetchone()[0]
        assert orphans == 0, (fact, fk)

    # keys stay unique after offsetting
    for t, key in [("orders", "o_orderkey"), ("events", "event_id"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")]:
        n, nd = con.execute(
            f"SELECT count(*), count(DISTINCT {key}) FROM '{dest}/{t}.parquet'"
        ).fetchone()
        assert n == nd, t

    # replica docs are NOT near-dups: token Jaccard < 0.5 vs base, and
    # n_chars tracks the grown text
    stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    rows = con.execute(
        f"SELECT doc_id, text, n_chars FROM '{dest}/documents.parquet' "
        f"WHERE doc_id IN (3, {3 + stride}) ORDER BY doc_id"
    ).fetchall()
    (_, t0, c0), (_, t1, c1) = rows
    w0, w1 = set(t0.split()), set(t1.split())
    assert len(w0 & w1) / len(w0 | w1) < 0.5
    assert c0 == len(t0) and c1 == len(t1)

    # replica embeddings are distinct vectors below the 0.99 near-dup bar
    stride_v = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    vecs = con.execute(
        f"SELECT vec_id, embedding FROM '{dest}/embeddings.parquet' "
        f"WHERE vec_id IN (7, {7 + stride_v}) ORDER BY vec_id"
    ).fetchall()
    a, b = (np.array(v[1]) for v in vecs)
    cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos < 0.99
