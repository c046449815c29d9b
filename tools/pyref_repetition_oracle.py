"""Python reference oracle for ``repetition_stats`` at scales where
the DuckDB oracle dies.

At sf100 (5M documents) the DuckDB twin's per-doc line/2/3/5-gram
value-counts CTEs exceed the 55 GiB spill cap — the single-node ORACLE
is the ceiling, not the engine (the same shape
tools/pyref_kmer_oracle.py and tools/pyref_text_oracle.py closed for
the k-mer and text rows). Same discipline: re-derive the expected rows
from the raw parquet with pure python (collections.Counter per
document) that shares nothing with the Spark plan, and pin the
reference against the DuckDB oracle at gate scale in pytest
(tests/test_repetition.py::test_pyref_repetition_matches_duckdb).

Cross-engine care, each pinned by the gate-scale test:
  - lines: split on \\n, trim SPACES ONLY (Spark F.trim == DuckDB
    trim == str.strip(' ') — NOT python's all-whitespace .strip()),
    drop empties;
  - tokens: Java/RE2 ASCII ``\\s+`` via ``re.ASCII``;
  - n-grams: ' '-joined consecutive tokens;
  - top-gram tie-break: (count desc, gram desc) — python str order ==
    UTF-8 byte order == Spark's binary string comparison for valid
    UTF-8;
  - floats: every division is ONE IEEE op over exactly-representable
    integer operands (all masses < 2^53), mirroring the oracle's
    CAST(int AS DOUBLE)/CAST(int AS DOUBLE) and the engine's
    double-accumulated integer aggregate (exact below 2^53), then
    hround 6dp = floor(x*1e6+0.5)/1e6 — bit-comparable, not
    approximately comparable.

Usage:
    python tools/pyref_repetition_oracle.py /tmp/sf100
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the process pool re-imports this module by name in workers
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_WS = re.compile(r"\s+", re.ASCII)  # Java \s: [ \t\n\x0B\f\r]


def hround(x: float, d: int = 6) -> float:
    scale = float(10**d)
    return math.floor(x * scale + 0.5) / scale


def _dup_mass(counts: Counter) -> tuple[int, int]:
    """(duplicated char mass, total char mass): sum(c*len) over values
    with c >= 2, and over all values."""
    dup = tot = 0
    for v, c in counts.items():
        m = c * len(v)
        tot += m
        if c >= 2:
            dup += m
    return dup, tot


def _top_frac(counts: Counter, n_chars: int) -> float:
    if not counts:
        return 0.0
    # (count desc, gram desc) — max over (c, gram) pairs
    c, g = max((c, g) for g, c in counts.items())
    return float(c) * float(len(g)) / float(n_chars)


def _chunk_stats(args: tuple[list[int], list[str | None]]) -> list[tuple]:
    ids, texts = args
    rows: list[tuple] = []
    for doc_id, text in zip(ids, texts):
        text = text or ""
        n_chars = max(len(text), 1)
        lines = [s for s in (seg.strip(" ") for seg in text.split("\n")) if s]
        lc = Counter(lines)
        n_lines = len(lines)
        dup_occ = sum(c for c in lc.values() if c >= 2)
        dup_line_frac = float(dup_occ) / float(max(n_lines, 1))
        ldup, ltot = _dup_mass(lc)
        dup_line_char_frac = float(ldup) / float(max(ltot, 1))
        toks = [t for t in _WS.split(text) if t]

        def grams(n: int) -> Counter:
            return Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )

        g2, g3, g5 = grams(2), grams(3), grams(5)
        d5dup, d5tot = _dup_mass(g5)
        rows.append(
            (
                doc_id,
                n_lines,
                hround(dup_line_frac, 6),
                hround(dup_line_char_frac, 6),
                hround(_top_frac(g2, n_chars), 6),
                hround(_top_frac(g3, n_chars), 6),
                hround(float(d5dup) / float(max(d5tot, 1)), 6),
            )
        )
    return rows


def expected(sf_dir: str) -> set[tuple]:
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
    workers = min(30, os.cpu_count() or 4)
    with ProcessPoolExecutor(max_workers=workers) as ex:
        return {row for part in ex.map(_chunk_stats, chunks) for row in part}


def main() -> None:
    import time

    from rnadam_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    t0 = time.time()
    want = expected(sf_dir)
    t_ref = time.time() - t0

    spark = get_spark("pyref-repetition-oracle")
    t0 = time.time()
    got = {tuple(r) for r in entrymod.queries()["repetition_stats"](spark, sf_dir).collect()}
    t_spark = time.time() - t0

    status = "OK" if got == want else "VALUE_MISMATCH"
    out = {
        "name": "repetition_stats",
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
            "only_spark": [list(x) for x in sorted(got - want)[:3]],
            "only_reference": [list(x) for x in sorted(want - got)[:3]],
        }
    print(json.dumps(out))
    sys.exit(0 if status == "OK" else 1)


if __name__ == "__main__":
    main()
