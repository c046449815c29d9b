"""Python union-find oracle for ``dedup_clusters`` at scales where the
DuckDB recursive-CTE oracle is infeasible.

At sf1 (50k docs, ~1.5M candidate pairs) the gate row's recursive
``walk`` CTE — min label over full reachability — needed 50+ CPU-minutes
and 27 GB RSS in DuckDB before being killed, while the Spark operator
runs the same graph in seconds (SURVEY.md sf1 block). The reachability
walk is the *verification* bottleneck, not the engine: for verification
all we need is each node's minimum reachable doc_id, which sorted-edge
union-find computes in O(E α(N)).

Independence argument (this is an oracle, not an echo): the candidate
pair set is re-derived by DUCKDB from the raw parquet via the exact
gate-row SQL (`pipeline_q._LSH_PAIRS_SQL` — shingle → minhash → band →
capped bucket join; the same SQL the driver's gate hash-verifies at
sf0.01 and that was value-exact at sf1), and the connected-components
contract (component = min doc_id over reachability, nodes = pair
endpoints only) is re-implemented here in ~20 lines of pure python with
no Spark types anywhere. Spark's alternating large-star/small-star
rounds (operators/clustering.py) share no code or algorithm with it.

The python reference itself is pinned where BOTH oracles are feasible:
tests/test_clustering.py::test_union_find_matches_recursive_cte runs
this module against the recursive-CTE oracle at gate scale.

The same split verifies ``paragraph_near_dups`` (whose gate oracle ends
in the identical recursive walk over verified paragraph-unit pairs):
DuckDB re-derives the verified pair set via the gate row's own CTE
chain (`pipeline_q._PARA_PAIRS_SQL` — posexplode units → LSH bands →
capped buckets → exact-Jaccard verify), union-find closes the
components, and the loser set (node != component, decoded back to
(doc_id, para_idx)) is compared against Spark.

Usage:
    python tools/make_scale_corpus.py /root/testdata/sf0.1 /tmp/sf1 10
    python tools/unionfind_oracle.py /tmp/sf1 all
    python tools/unionfind_oracle.py /tmp/sf1 dedup_clusters
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def union_find_components(pairs) -> dict[int, int]:
    """Map each node appearing in ``pairs`` to the minimum node id in
    its connected component (the dedup_clusters canonical-id contract).

    Plain union-find with path compression + union by attaching the
    larger root to the smaller: because the union keeps the SMALLER id
    as root, the root IS the component minimum — no second pass.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # smaller id stays root => root == component min
    return {node: find(node) for node in parent}


def _check(name: str, sf_dir: str, spark) -> dict:
    import duckdb

    from rnadam_spark.queries import pipeline_q

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )

    t0 = time.time()
    if name == "dedup_clusters":
        duck_pairs = con.execute(pipeline_q._LSH_PAIRS_SQL).fetchall()
    else:  # paragraph_near_dups: pairs of encoded (doc_id, para_idx) units
        duck_pairs = con.execute(pipeline_q._PARA_PAIRS_SQL).fetchall()
    t_pairs = time.time() - t0

    t0 = time.time()
    comp = union_find_components(duck_pairs)
    if name == "dedup_clusters":
        expected = comp
    else:
        # the gate row returns the LOSERS (node != component), decoded
        enc = pipeline_q._PARA_ENC
        expected = {
            (node // enc, node % enc): None
            for node, c in comp.items()
            if node != c
        }
    t_uf = time.time() - t0

    t0 = time.time()
    if name == "dedup_clusters":
        got = {
            r["doc_id"]: r["component"]
            for r in pipeline_q.dedup_clusters(spark, sf_dir).collect()
        }
    else:
        got = {
            (r["doc_id"], r["para_idx"]): None
            for r in pipeline_q.paragraph_near_dups(spark, sf_dir).collect()
        }
    t_spark = time.time() - t0

    status = "OK" if got == expected else "VALUE_MISMATCH"
    out = {
        "name": name,
        "oracle": "duckdb_pairs+python_union_find",
        "status": status,
        "sf_dir": sf_dir,
        "pairs": len(duck_pairs),
        "nodes": len(comp),
        "components": len(set(comp.values())),
        "rows": len(got),
        "sec_oracle_pairs": round(t_pairs, 2),
        "sec_oracle_unionfind": round(t_uf, 2),
        "sec_spark": round(t_spark, 2),
    }
    if status != "OK":
        only_spark = sorted(set(got) - set(expected))[:5]
        only_oracle = sorted(set(expected) - set(got))[:5]
        out["example"] = {
            "only_spark": [list(x) if isinstance(x, tuple) else x for x in only_spark],
            "only_oracle": [list(x) if isinstance(x, tuple) else x for x in only_oracle],
        }
        if name == "dedup_clusters":
            diff = sorted(
                k for k in set(got) & set(expected) if got[k] != expected[k]
            )[:5]
            out["example"]["label_mismatch"] = [
                {"doc_id": k, "spark": got[k], "oracle": expected[k]} for k in diff
            ]
    return out


def main() -> None:
    from rnadam_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or ["dedup_clusters"]
    if names == ["all"]:
        names = ["dedup_clusters", "paragraph_near_dups"]

    spark = get_spark("unionfind-oracle")
    failed = 0
    for name in names:
        if name not in ("dedup_clusters", "paragraph_near_dups"):
            raise SystemExit(f"unknown query: {name}")
        out = _check(name, sf_dir, spark)
        print(json.dumps(out))
        if out["status"] != "OK":
            failed += 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
