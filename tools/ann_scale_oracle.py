"""Scale-sized ANN candidate-pair verification (sf1/sf10 assurance).

The gate row ``embedding_bucket_pairs`` pins the 8-plane / cap-100
shape at oracle scale. At sf10 (200k vectors) every 8-plane bucket
exceeds the cap, so the registered row degenerates to 0 pairs on BOTH
engines — the skew guard is verified (the engines agree everything is
dropped) but the pair kernel itself gets zero coverage. This tool
re-verifies the pair kernel at scale with the plane count the operator
would actually use there (``similarity.planes_for`` — the sizing rule
the query docstring already points to), building the DuckDB twin
dynamically from the SAME deterministic hyperplanes and comparing
through the bounded-memory stream digest.

Usage: python tools/ann_scale_oracle.py [sf_dir] [target_bucket] [max_bucket]
       (defaults: /tmp/sf10, 64, 100)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from rnadam_spark.operators import similarity
from rnadam_spark.session import get_spark
from rnadam_spark.sources.tables import load_table

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_correctness import stream_compare  # noqa: E402


def _plane_lit(plane: list[int]) -> str:
    return "[" + ", ".join(f"{float(v)}" for v in plane) + "]"


def pair_oracle_sql(n_planes: int, max_bucket: int) -> str:
    """DuckDB twin of ``similarity.bucket_near_pairs`` at ``n_planes``,
    mirroring the registered oracle's shape (QUALIFY cap, 6dp half-up
    cosine rounding, lower-triangle pair order)."""
    planes = similarity.hyperplanes(n=n_planes)
    emb = "embedding::DOUBLE[]"
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product({emb}, {_plane_lit(p)}) >= 0 THEN {2**j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    cos = (
        "floor((list_dot_product(a.embedding::DOUBLE[], bb.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(bb.embedding::DOUBLE[], bb.embedding::DOUBLE[]))))"
        " * 1000000.0 + 0.5) / 1000000.0"
    )
    return f"""
    WITH b0 AS (SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket, embedding FROM embeddings),
    b AS (SELECT * FROM b0
          QUALIFY count(*) OVER (PARTITION BY bucket) <= {max_bucket})
    SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b, {cos} AS cos
    FROM b a JOIN b bb USING (bucket)
    WHERE a.vec_id < bb.vec_id AND {cos} >= 0.0
    """


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    target_bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    max_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    n_planes = similarity.planes_for(n, target_bucket)

    spark = get_spark("ann-scale-oracle")

    def fn(spark, sf_dir):
        return similarity.bucket_near_pairs(
            load_table(spark, sf_dir, "embeddings"),
            0.0,
            n_planes=n_planes,
            max_bucket=max_bucket,
        )

    r = stream_compare(
        f"bucket_pairs_p{n_planes}",
        fn,
        pair_oracle_sql(n_planes, max_bucket),
        spark,
        sf_dir,
        con,
    )
    r["n_vectors"], r["n_planes"] = n, n_planes
    print(json.dumps(r))
    sys.exit(0 if r["status"] == "OK" else 1)


if __name__ == "__main__":
    main()
