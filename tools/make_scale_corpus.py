"""Build the deterministic 100x-oracle-scale corpus for sf1 assurance.

Writes a directory shaped like a driver sf dir whose ``documents`` table
is N tagged copies of the base dir's (copy 0 verbatim so the near-dup
and exact-dup structure of the base corpus survives; copies 1..N-1 get
a copy tag appended so they are distinct documents with shifted ids),
and symlinks every other table unchanged. Feed the result to
tools/check_correctness.py to hash-compare gate rows Spark-vs-DuckDB
one decade above the driver's own sf0.1 verification:

    python tools/make_scale_corpus.py /root/testdata/sf0.1 /tmp/sf1 10
    python tools/check_correctness.py /tmp/sf1 em_quantify cap_per_domain

Deterministic by construction — no RNG anywhere, so repeated builds
produce byte-identical inputs and the oracle comparison is exact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rnadam_spark.sources.tables import TABLES


SCALED_TABLES = ("documents", "events", "orders", "lineitem", "embeddings")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scale"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional 4th arg: comma list of tables to scale (the rest
    # symlink from base). A documents,embeddings-only corpus makes a
    # 1000x text/similarity decade feasible where lineitem/events at
    # the same factor would not fit local disk.
    scale_set = set(
        sys.argv[4].split(",") if len(sys.argv) > 4 else SCALED_TABLES
    )
    unknown = scale_set - set(SCALED_TABLES)
    if unknown:
        raise SystemExit(f"unknown scaled tables: {sorted(unknown)}")

    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # id offset safely beyond the base id range
    max_id = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()[0]
    copies = " UNION ALL ".join(
        f"""SELECT doc_id + {i * max_id} AS doc_id,
               text || {"''" if i == 0 else f"' [copy {i}]'"} AS text,
               lang, source,
               n_chars + {0 if i == 0 else len(f" [copy {i}]")} AS n_chars
            FROM read_parquet('{base}/documents.parquet')"""
        for i in range(factor)
    )
    if "documents" in scale_set:
        con.execute(
            f"COPY ({copies} ORDER BY doc_id) TO '{out}/documents.parquet' (FORMAT PARQUET)"
        )
    # events scale by DISJOINT-USER copies: each copy shifts user_id and
    # event_id beyond the base ranges and leaves ts unchanged, so
    # per-user semantics (sessionization, running stats) see N× distinct
    # users rather than artificially merged sessions, and time-window
    # rollups see N× the rows per window — both are the honest 10×
    # shapes. Deterministic, no RNG.
    emax_id, umax = con.execute(
        f"SELECT max(event_id) + 1, max(user_id) + 1 "
        f"FROM read_parquet('{base}/events.parquet')"
    ).fetchone()
    ecopies = " UNION ALL ".join(
        f"""SELECT event_id + {i * emax_id} AS event_id, ts,
               user_id + {i * umax} AS user_id, event_type, value, props
            FROM read_parquet('{base}/events.parquet')"""
        for i in range(factor)
    )
    if "events" in scale_set:
        con.execute(
            f"COPY ({ecopies} ORDER BY event_id) TO '{out}/events.parquet' (FORMAT PARQUET)"
        )
    # orders/lineitem scale by CONSISTENTLY-shifted orderkeys (same
    # offset in both tables so the fact-fact join stays intact);
    # customer/part/supplier references stay unchanged — dims are
    # symlinked and each customer simply carries N× orders, the honest
    # fact-growth shape for the relational family.
    omax = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM read_parquet('{base}/orders.parquet')"
    ).fetchone()[0]
    ocopies = " UNION ALL ".join(
        f"""SELECT o_orderkey + {i * omax} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{base}/orders.parquet')"""
        for i in range(factor)
    )
    if "orders" in scale_set:
        con.execute(
            f"COPY ({ocopies} ORDER BY o_orderkey) TO '{out}/orders.parquet' (FORMAT PARQUET)"
        )
    lcopies = " UNION ALL ".join(
        f"""SELECT l_orderkey + {i * omax} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{base}/lineitem.parquet')"""
        for i in range(factor)
    )
    if "lineitem" in scale_set:
        con.execute(
            f"COPY ({lcopies} ORDER BY l_orderkey, l_linenumber) "
            f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)"
        )
    # embeddings scale by DISJOINT-ID copies whose vectors are the base
    # vectors CIRCULARLY ROTATED by the copy index (copy 0 verbatim):
    # norms are preserved, cross-copy cosines vary (no degenerate
    # all-duplicates geometry), and the construction is deterministic
    # and exactly re-derivable in SQL on both engines. This lets the
    # three similarity gate rows (embedding_topk / embedding_bucket_pairs
    # / ivf_topk) verify at 10x/100x instead of riding a symlink.
    vmax, dim = con.execute(
        f"SELECT max(vec_id) + 1, max(len(embedding)) "
        f"FROM read_parquet('{base}/embeddings.parquet')"
    ).fetchone()
    vcopies = " UNION ALL ".join(
        f"""SELECT vec_id + {i * vmax} AS vec_id,
               {'embedding' if i % dim == 0 else
                f'(embedding[{i % dim + 1}:] || embedding[:{i % dim}])::FLOAT[]'}
                 AS embedding,
               label
            FROM read_parquet('{base}/embeddings.parquet')"""
        for i in range(factor)
    )
    if "embeddings" in scale_set:
        emb_dst = os.path.join(out, "embeddings.parquet")
        if os.path.islink(emb_dst):
            os.remove(emb_dst)  # upgrade corpora built by the symlink era
        con.execute(
            f"COPY ({vcopies} ORDER BY vec_id) TO '{emb_dst}' (FORMAT PARQUET)"
        )
    for t in TABLES:
        if t in scale_set:
            continue
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    print(
        f"{out}: {'/'.join(sorted(scale_set))} x{factor} "
        f"(documents = {n} rows); other tables symlinked"
    )


if __name__ == "__main__":
    main()
