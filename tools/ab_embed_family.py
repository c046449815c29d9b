"""r13 decomposition of the embedding-family extras: pq_encode,
ivf_cells, cell_near_pairs stages, semantic_dedup. Min-of-3 through
the noop sink, interleaved in one session.

Usage: python tools/ab_embed_family.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rnadam_spark.operators import similarity as sim
from rnadam_spark.session import get_spark
from rnadam_spark.sources.tables import load_table


def timed(spark, make_df, reps=3, desc=""):
    spark.sparkContext.setJobDescription(desc or None)
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"{sf_dir}: {n} embedding rows, dim={len(emb.select('embedding').first()[0])}")

    cents = sim.kmeans_centroids(emb, k=8, max_iterations=3)
    books = sim.train_pq(emb, m=8, nbits=4, max_iterations=3)

    r = {}
    r["pq_encode_pandas"] = timed(spark, lambda: sim.pq_encode(emb, books), desc="pq_encode pandas")
    r["pq_encode_jvm"] = timed(
        spark, lambda: sim.pq_encode(emb, books, kernel="jvm"), desc="pq_encode jvm"
    )
    r["ivf_cells_pandas"] = timed(
        spark, lambda: sim.ivf_cells(emb, centroids=cents), desc="ivf_cells pandas"
    )
    r["ivf_cells_jvm"] = timed(
        spark,
        lambda: sim.ivf_cells(emb, centroids=cents, kernel="jvm"),
        desc="ivf_cells jvm",
    )
    r["cell_near_pairs"] = timed(
        spark,
        lambda: sim.cell_near_pairs(emb, cents, min_cos=0.98, max_cell=2000),
        desc="cell_near_pairs",
    )
    r["semantic_dedup"] = timed(
        spark,
        lambda: sim.semantic_dedup(emb, min_cos=0.98, centroids=cents, max_cell=2000),
        desc="semantic_dedup",
    )
    print({k: v for k, v in r.items()})
    spark.stop()


if __name__ == "__main__":
    main()
