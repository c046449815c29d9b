"""High-precision (mpmath, 50-digit) reference for the ``em_two_steps``
gate row at scales where the DuckDB oracle dies.

At sf10 the DuckDB CTE chain OOMs on its 5.5x10^8-row shingle stage —
and unlike the other oracle-bound rows, an op-for-op float twin would
not be independent evidence (it would share the engine's rounding
behavior by construction). What IS independent: re-derive the two EM
steps (init → M → E → M → normalize, Quantify.scala:90-114 unrolled)
from the raw parquet in 50-digit arithmetic, round to the gate's 8dp
grain, and compare grains. A 50-digit value is the true rational result
for all practical purposes, while the engine computes in IEEE doubles
(~1e-15 relative error) — so the comparison must, and does, treat the
one honest disagreement case explicitly: when the TRUE value lies
within epsilon of a half-boundary of the 8dp grid, the double chain may
legitimately land on the adjacent grain. Rows are classified
  exact     — engine grain == true grain
  boundary  — adjacent grain AND true value within 1e-6 grain-units
              (1e-14 absolute) of the half-boundary: the double chain's
              expected behavior, counted and reported, not hidden
  mismatch  — anything else: a real defect; the run fails.

Semantics mirrored (queries/genomics_q.py::em_two_steps →
algorithms/quantify.py::quantify, max_iterations=1, no calibration):
  classes keyed by per-(doc,kmer) multiplicity (class = the set of docs
  sharing that k-mer count); class_count = sum of GLOBAL counts of the
  class's distinct member kmers; rel_p = class share; alpha0 = equal
  split of class_count over member docs; M: mu_d = sum_c alpha*rel_p /
  (n_chars_d - K + 1); E: alpha = mu_d / sum over class; M again;
  one global normalize; output (t_id=str(doc_id), hround(mu, 8)).

Usage:
    python tools/pyref_em_oracle.py /tmp/sf10
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K = 5
BOUNDARY_TOL = 1e-6  # grain units: 1e-14 in mu value


def _chunk_pass(args: tuple[list[int], list[str | None]]) -> tuple:
    """One chunk of documents → (per-doc rows, chunk-local global kmer
    Counter, chunk-local distinct (kmer, multiplicity) pair set)."""
    ids, texts = args
    docs: list[tuple[int, int, list[int]]] = []  # (doc_id, n_chars, multiplicities)
    g: Counter = Counter()
    pairs: set[tuple[str, int]] = set()
    for doc_id, text in zip(ids, texts):
        text = text or ""
        counts = Counter(text[i : i + K] for i in range(len(text) - K + 1))
        g.update(counts)
        mults = set(counts.values())
        pairs.update((kmer, c) for kmer, c in counts.items())
        docs.append((doc_id, len(text), sorted(mults)))
    return docs, g, pairs


def expected_em_two_steps(sf_dir: str):
    """{doc_id: (n_chars, true mu as mpf)} plus exact integer
    intermediates, from one parallel pass over documents.parquet."""
    from concurrent.futures import ProcessPoolExecutor

    import pyarrow.parquet as pq
    from mpmath import mp, mpf

    mp.dps = 50

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
    g: Counter = Counter()
    pairs: set[tuple[str, int]] = set()
    docs: list[tuple[int, int, list[int]]] = []
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for d, cg, cp in ex.map(_chunk_pass, chunks):
            docs.extend(d)
            g.update(cg)
            pairs.update(cp)

    # class_count[c] = sum of global counts over the class's DISTINCT
    # member kmers (the kmer_to_class DISTINCT + join + groupBy chain) —
    # exact integers
    class_count: dict[int, int] = {}
    for kmer, c in pairs:
        class_count[c] = class_count.get(c, 0) + g[kmer]
    total = sum(class_count.values())

    # membership: docs per class (exact ints)
    n_members: dict[int, int] = {}
    for _doc, _n, mults in docs:
        for c in mults:
            n_members[c] = n_members.get(c, 0) + 1

    rel_p = {c: mpf(class_count[c]) / total for c in class_count}
    # init + first M-step: alpha0 = class_count/n_members (same for
    # every member), mu1_d = sum_c alpha0*rel_p / (n_chars - K + 1)
    alpha0 = {c: mpf(class_count[c]) / n_members[c] for c in class_count}
    mu1: dict[int, object] = {}
    for doc_id, n_chars, mults in docs:
        if not mults:
            continue  # docs shorter than K have no classes and drop
        s = mpf(0)
        for c in mults:
            s += alpha0[c] * rel_p[c]
        mu1[doc_id] = s / (n_chars - K + 1)
    # E-step: alpha1[(c,d)] = mu1_d / sum over class members
    class_mu_sum: dict[int, object] = {}
    for doc_id, _n, mults in docs:
        if doc_id not in mu1:
            continue
        for c in mults:
            class_mu_sum[c] = class_mu_sum.get(c, mpf(0)) + mu1[doc_id]
    # second M-step + one global normalize
    mu2: dict[int, object] = {}
    for doc_id, n_chars, mults in docs:
        if doc_id not in mu1:
            continue
        s = mpf(0)
        for c in mults:
            s += (mu1[doc_id] / class_mu_sum[c]) * rel_p[c]
        mu2[doc_id] = s / (n_chars - K + 1)
    tot2 = sum(mu2.values(), mpf(0))
    return {d: mu2[d] / tot2 for d in mu2}


def compare(sf_dir: str) -> dict:
    import time

    from mpmath import mp, mpf

    from rnadam_spark.queries.genomics_q import em_two_steps
    from rnadam_spark.session import get_spark

    mp.dps = 50
    t0 = time.time()
    true_mu = expected_em_two_steps(sf_dir)
    t_ref = time.time() - t0

    spark = get_spark("pyref-em-oracle")
    t0 = time.time()
    got = {r.t_id: r.mu for r in em_two_steps(spark, sf_dir).collect()}
    t_spark = time.time() - t0

    n_exact = n_boundary = 0
    mismatches = []
    boundary_examples = []
    if set(got) != {str(d) for d in true_mu}:
        mismatches.append(
            {"kind": "row_set", "only_spark": len(set(got) - {str(d) for d in true_mu}),
             "only_reference": len({str(d) for d in true_mu} - set(got))}
        )
    else:
        for d, mu in true_mu.items():
            frac = mu * mpf(10) ** 8 + mpf("0.5")
            i_ref = int(frac)  # floor for non-negative
            dist = min(frac - i_ref, i_ref + 1 - frac)
            eng = got[str(d)]
            i_eng = int(eng * 1e8 + 0.5)
            if i_eng == i_ref:
                n_exact += 1
            elif abs(i_eng - i_ref) == 1 and dist < BOUNDARY_TOL:
                n_boundary += 1
                if len(boundary_examples) < 3:
                    boundary_examples.append(
                        {"doc": d, "true_grain": i_ref, "engine_grain": i_eng,
                         "half_boundary_dist_grains": float(dist)}
                    )
            else:
                if len(mismatches) < 5:
                    mismatches.append(
                        {"doc": d, "true_mu_50dps": str(mu), "engine_mu": eng,
                         "true_grain": i_ref, "engine_grain": i_eng}
                    )
    status = "OK" if not mismatches else "VALUE_MISMATCH"
    return {
        "name": "em_two_steps",
        "oracle": "python_mpmath_50dps_reference",
        "status": status,
        "sf_dir": sf_dir,
        "rows": len(got),
        "rows_expected": len(true_mu),
        "n_exact": n_exact,
        "n_boundary": n_boundary,
        "boundary_examples": boundary_examples,
        "mismatches": mismatches,
        "sec_reference": round(t_ref, 2),
        "sec_spark": round(t_spark, 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = compare(sf_dir)
    print(json.dumps(out))
    sys.exit(0 if out["status"] == "OK" else 1)


if __name__ == "__main__":
    main()
