"""Python reference oracles for the k-mer-class gate rows at scales
where the DuckDB oracle dies.

At sf10 (500k docs, ~5.5x10^8 shingles) the `equivalence_classes` /
`class_counts_normalized` DuckDB oracles OOM even with a spill
directory: their `string_agg(kmer ORDER BY kmer)` aggregate state over
~4M (doc, cnt) groups is not an out-of-core operator. The engine runs
the same rows in seconds — the single-node ORACLE is the ceiling, the
same shape `dedup_clusters` hit at sf1 (tools/unionfind_oracle.py).

Same discipline as there: re-derive the expected answer from the raw
parquet with pure python that shares nothing with the Spark plan
(collections.Counter per document, md5 over the '|'-joined sorted
member list, integer class-count roll-up, and the gate's exact
floor(x*1e8+0.5)/1e8 double rounding for the normalized share — all
arithmetic is either exact integer math or single correctly-rounded
IEEE ops, so the reference is bit-comparable), and pin the reference
against the DuckDB oracle at gate scale in pytest
(tests/test_index.py::test_pyref_kmer_oracle_matches_duckdb).

Semantics mirrored (queries/genomics_q.py):
  - k-mers: all contiguous K=5-char substrings, docs shorter than K
    contribute nothing
  - equivalence_classes: one row per (doc_id, cnt) group of k-mers with
    equal per-doc multiplicity; class_id = md5 of the sorted members
    joined by '|' (content-hash IDs, SAM as A3+A4); n_kmers = group size
  - class_counts_normalized: class_count = sum(cnt * n_kmers) over all
    (doc, cnt) groups sharing a class_id (identical member sets in
    different docs SHARE an id — md5 is content-addressed), p =
    hround(class_count / total, 8)

Usage:
    python tools/pyref_kmer_oracle.py /tmp/sf10
    python tools/pyref_kmer_oracle.py /tmp/sf10 equivalence_classes
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the process pool re-imports this module by name in workers
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K = 5


def doc_class_rows(doc_id: int, text: str | None) -> list[tuple[int, int, str, int]]:
    """equivalence_classes rows of one document:
    (doc_id, cnt, class_id, n_kmers) per distinct multiplicity."""
    text = text or ""
    counts = Counter(text[i : i + K] for i in range(len(text) - K + 1))
    by_cnt: dict[int, list[str]] = {}
    for kmer, cnt in counts.items():
        by_cnt.setdefault(cnt, []).append(kmer)
    return [
        (
            doc_id,
            cnt,
            hashlib.md5("|".join(sorted(kmers)).encode("utf-8")).hexdigest(),
            len(kmers),
        )
        for cnt, kmers in by_cnt.items()
    ]


def _chunk_rows(args: tuple[list[int], list[str | None]]) -> list[tuple]:
    ids, texts = args
    out: list[tuple] = []
    for d, t in zip(ids, texts):
        out.extend(doc_class_rows(d, t))
    return out


def expected_equivalence_classes(sf_dir: str) -> set[tuple]:
    """The full expected row set, computed with a process pool (the
    per-doc kernel is pure CPU over ~GB of text)."""
    from concurrent.futures import ProcessPoolExecutor

    import pyarrow.parquet as pq

    table = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = table.column("doc_id").to_pylist()
    texts = table.column("text").to_pylist()
    step = 5000
    chunks = [
        (ids[i : i + step], texts[i : i + step]) for i in range(0, len(ids), step)
    ]
    rows: set[tuple] = set()
    workers = min(30, os.cpu_count() or 4)
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for part in ex.map(_chunk_rows, chunks):
            rows.update(part)
    return rows


def expected_class_counts(rows: set[tuple]) -> set[tuple]:
    """class_counts_normalized rows derived from the class rows:
    exact integer roll-up, then the gate's double rounding (bigint →
    double conversion is exact below 2^53, division and the hround
    multiply are each one correctly-rounded IEEE op — identical in
    Spark, DuckDB, and python)."""
    counted: dict[str, int] = {}
    for _doc, cnt, class_id, n_kmers in rows:
        counted[class_id] = counted.get(class_id, 0) + cnt * n_kmers
    total = sum(counted.values())
    assert total < (1 << 53), "bigint->double no longer exact; rework the compare"
    return {
        (cid, c, math.floor(c / total * 100000000.0 + 0.5) / 100000000.0)
        for cid, c in counted.items()
    }


def main() -> None:
    import time

    from rnadam_spark.queries.genomics_q import class_counts_normalized, equivalence_classes
    from rnadam_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or ["equivalence_classes", "class_counts_normalized"]

    t0 = time.time()
    rows = expected_equivalence_classes(sf_dir)
    t_ref = time.time() - t0

    spark = get_spark("pyref-kmer-oracle")
    failed = 0
    for name in names:
        t0 = time.time()
        if name == "equivalence_classes":
            got = {tuple(r) for r in equivalence_classes(spark, sf_dir).collect()}
            want = rows
        elif name == "class_counts_normalized":
            got = {tuple(r) for r in class_counts_normalized(spark, sf_dir).collect()}
            want = expected_class_counts(rows)
        else:
            raise SystemExit(f"unknown query: {name}")
        t_spark = time.time() - t0
        status = "OK" if got == want else "VALUE_MISMATCH"
        out = {
            "name": name,
            "oracle": "python_counter_reference",
            "status": status,
            "sf_dir": sf_dir,
            "rows": len(got),
            "rows_expected": len(want),
            "sec_reference": round(t_ref, 2),
            "sec_spark": round(t_spark, 2),
        }
        if status != "OK":
            out["example"] = {
                "only_spark": [list(x) for x in list(got - want)[:3]],
                "only_reference": [list(x) for x in list(want - got)[:3]],
            }
            failed += 1
        print(json.dumps(out))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
