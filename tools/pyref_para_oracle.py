"""Python reference oracle for ``paragraph_near_dups`` at scales where
even the PAIR-derivation SQL is infeasible in DuckDB.

The union-find split (tools/unionfind_oracle.py) already moved the
recursive reachability walk out of DuckDB, but at sf10 the remaining
pair SQL — units → 4-char shingles → 16 minhashes → banded buckets →
exact-Jaccard verify — still cost 1,905s, putting sf100 at day scale
(r12 VERDICT missing #3). This module re-derives the VERIFIED PAIR SET
itself from the raw parquet in pure python/numpy (the
pyref_kmer/pyref_text technique), then closes components with the same
union-find, making the fourth decade oracle-feasible.

Independence argument: nothing here touches Spark — the pipeline is
re-implemented from the gate row's SQL semantics (pipeline_q._PARA_CTES)
with numpy integer arithmetic. The python reference is itself pinned
against the DuckDB pair SQL at gate scale in
tests/test_pyref_para_oracle.py, the same two-level discipline as every
other pyref module.

Exactness notes (each mirrors the SQL, bit-for-bit):
  - units: re.split on the literal ``' table '`` (no metachars, so
    python/DuckDB/Spark regex splits agree), ORIGINAL indices kept,
    ``strip(' ')`` length >= 40 (DuckDB ``trim`` strips spaces only);
  - shingle identity: the verify stage intersects distinct 4-char
    STRINGS, and the base-31 code is NOT injective over printable ASCII
    ("b!" and "a@" both hash to 3071) — so ssets pack each shingle's 4
    code points into one int64 (4 x 16 bits, injective for BMP text;
    ords are validated < 65536 and the corpus is ASCII), while the
    MINHASH uses the same base-31-mod-p code both engines use;
  - minhash: min over (code*a + b) % 1_000_000_007 with the shared
    hash_family(16, 42) coefficients — all integer, no float anywhere;
  - banding: groups keyed on the 4 h-value ints (the SQL's
    '_'-concatenated decimal string is injective over nonneg ints, so
    int-tuple grouping is identical), bucket cap <= LSH_MAX_BUCKET;
  - verify: |A∩B| via sorted-unique int64 intersection,
    jaccard = inter / max(|A|+|B|-inter, 1) in one IEEE double
    division, hround6 (floor(x*1e6+0.5)/1e6) >= 0.8 — the exact SQL
    expression order;
  - components: union-find with min-id roots (unionfind_oracle),
    losers = nodes whose component min is not themselves, decoded to
    (doc_id, para_idx).

Scale shape: phase A (parse+sign) fans out over record batches in a
process pool; phase C (bucket verify) forks workers that inherit the
sset arrays copy-on-write — no shared-memory plumbing, no pair
materialization beyond the verified set.

Usage:
    python tools/pyref_para_oracle.py /tmp/sf1            # engine compare
    python tools/pyref_para_oracle.py /tmp/sf100
    python tools/pyref_para_oracle.py /tmp/sf1 --pairs-only
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rnadam_spark.functions.hashing import MOD, hash_family  # noqa: E402
from rnadam_spark.operators.dedup import N_BANDS, N_HASHES  # noqa: E402
from rnadam_spark.queries.pipeline_q import (  # noqa: E402
    _PARA_ENC,
    _PARA_MIN_CHARS,
    _PARA_SPLIT,
    LSH_MAX_BUCKET,
)

_A = np.array([a for a, _ in hash_family(N_HASHES, 42)], dtype=np.int64)
_B = np.array([b for _, b in hash_family(N_HASHES, 42)], dtype=np.int64)
_SPLIT_RE = re.compile(_PARA_SPLIT)


def _unit_rows(doc_id: int, text: str | None):
    """Yield (unit, sig16 ndarray, sset ndarray) per kept paragraph."""
    if text is None:
        return
    for idx, para in enumerate(_SPLIT_RE.split(text)):
        if len(para.strip(" ")) < _PARA_MIN_CHARS:
            continue
        # vectorized code points (utf-32-le = one uint32 per char)
        arr = np.frombuffer(para.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        if arr.max(initial=0) > 0xFFFF:
            raise NotImplementedError(
                "non-BMP character in paragraph — 4x16-bit shingle "
                "packing would collide; extend to a wider packing"
            )
        c0, c1, c2, c3 = arr[:-3], arr[1:-2], arr[2:-1], arr[3:]
        code = c0 % MOD
        for cn in (c1, c2, c3):  # exact SQL mod placement
            code = (code * 31 + cn) % MOD
        codes = np.unique(code)
        sig = np.min((codes[:, None] * _A + _B) % MOD, axis=0)
        sset = np.unique((c0 << 48) | (c1 << 32) | (c2 << 16) | c3)
        yield doc_id * _PARA_ENC + idx, sig, sset


def _chunk_units(args):
    """Phase A worker: (ids, texts) -> packed per-chunk arrays."""
    ids, texts = args
    units, sigs, ssets = [], [], []
    for doc_id, text in zip(ids, texts):
        for unit, sig, sset in _unit_rows(doc_id, text):
            units.append(unit)
            sigs.append(sig)
            ssets.append(sset)
    if not units:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty.reshape(0, N_HASHES), empty, empty
    lens = np.array([len(s) for s in ssets], dtype=np.int64)
    return (
        np.array(units, dtype=np.int64),
        np.stack(sigs),
        np.concatenate(ssets),
        lens,
    )


# phase C globals — set in the parent BEFORE the fork-based pool starts,
# inherited copy-on-write by workers (zero-copy on linux)
_G_UNITS: np.ndarray | None = None
_G_CODES: np.ndarray | None = None
_G_OFFS: np.ndarray | None = None


def _verify_buckets(bucket_chunk: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Phase C worker: exact-Jaccard verify every in-bucket pair of the
    given buckets (index arrays into the global unit tables); returns
    (ua, ub) arrays of the pairs that pass, unit-ordered ua < ub."""
    ua_out: list[int] = []
    ub_out: list[int] = []
    units, codes, offs = _G_UNITS, _G_CODES, _G_OFFS
    for members in bucket_chunk:
        m = len(members)
        sets = [codes[offs[i] : offs[i + 1]] for i in members]
        us = units[members]
        for i in range(m - 1):
            si = sets[i]
            li = len(si)
            for j in range(i + 1, m):
                sj = sets[j]
                inter = np.intersect1d(si, sj, assume_unique=True).size
                jac = inter / max(li + len(sj) - inter, 1)
                if np.floor(jac * 1e6 + 0.5) / 1e6 >= 0.8:
                    a, b = us[i], us[j]
                    if a > b:
                        a, b = b, a
                    ua_out.append(a)
                    ub_out.append(b)
    return np.array(ua_out, dtype=np.int64), np.array(ub_out, dtype=np.int64)


def derive_pairs(sf_dir: str, workers: int | None = None) -> np.ndarray:
    """The verified DISTINCT pair set as an (n, 2) int64 array —
    the python twin of pipeline_q._PARA_PAIRS_SQL."""
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    import pyarrow.parquet as pq

    global _G_UNITS, _G_CODES, _G_OFFS

    workers = workers or max((os.cpu_count() or 4) - 2, 1)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    del t
    step = max(len(ids) // (workers * 8), 1)
    chunks = [
        (ids[i : i + step], texts[i : i + step]) for i in range(0, len(ids), step)
    ]
    ctx = mp.get_context("fork")
    with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as ex:
        parts = list(ex.map(_chunk_units, chunks))
    del ids, texts, chunks
    units = np.concatenate([p[0] for p in parts])
    sigs = np.concatenate([p[1] for p in parts])
    codes = np.concatenate([p[2] for p in parts])
    lens = np.concatenate([p[3] for p in parts])
    del parts
    offs = np.zeros(len(units) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])

    # banding: group on the 4 h-value ints per band, cap the buckets
    buckets: list[np.ndarray] = []
    for b in range(N_BANDS):
        key = sigs[:, b * 4 : b * 4 + 4]
        order = np.lexsort(key.T[::-1])
        sk = key[order]
        new_group = np.empty(len(order), dtype=bool)
        new_group[0] = True
        new_group[1:] = (sk[1:] != sk[:-1]).any(axis=1)
        starts = np.flatnonzero(new_group)
        ends = np.append(starts[1:], len(order))
        for s, e in zip(starts, ends):
            if 2 <= e - s <= LSH_MAX_BUCKET:
                buckets.append(order[s:e])

    # phase C: verify in parallel; globals inherited via fork
    _G_UNITS, _G_CODES, _G_OFFS = units, codes, offs
    step = max(len(buckets) // (workers * 16), 1)
    bchunks = [buckets[i : i + step] for i in range(0, len(buckets), step)]
    with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as ex:
        results = list(ex.map(_verify_buckets, bchunks))
    _G_UNITS = _G_CODES = _G_OFFS = None
    ua = np.concatenate([r[0] for r in results])
    ub = np.concatenate([r[1] for r in results])
    # dedup across bands: units < 2^53, so (ua, ub) packs losslessly
    # into complex128 and np.unique sorts lexicographically
    z = np.unique(ua.astype(np.float64) + 1j * ub.astype(np.float64))
    out = np.empty((len(z), 2), dtype=np.int64)
    out[:, 0] = z.real.astype(np.int64)
    out[:, 1] = z.imag.astype(np.int64)
    return out


def _pair_iter(pairs: np.ndarray, chunk: int = 5_000_000):
    """Stream (a, b) tuples without materializing a 2-column python
    list — at sf100 scale ``pairs.tolist()`` alone would be tens of GB."""
    for i in range(0, len(pairs), chunk):
        yield from zip(pairs[i : i + chunk, 0].tolist(), pairs[i : i + chunk, 1].tolist())


def expected_losers(sf_dir: str) -> set[tuple[int, int]]:
    """(doc_id, para_idx) loser set: python pairs + python union-find."""
    from unionfind_oracle import union_find_components

    pairs = derive_pairs(sf_dir)
    comp = union_find_components(_pair_iter(pairs))
    return {
        (node // _PARA_ENC, node % _PARA_ENC)
        for node, c in comp.items()
        if node != c
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pairs_only = "--pairs-only" in sys.argv

    t0 = time.time()
    pairs = derive_pairs(sf_dir)
    t_pairs = time.time() - t0
    if pairs_only:
        print(
            json.dumps(
                {
                    "name": "paragraph_near_dups",
                    "mode": "pairs_only",
                    "pairs": len(pairs),
                    "sec_oracle_pairs": round(t_pairs, 2),
                }
            )
        )
        return

    from unionfind_oracle import union_find_components

    t0 = time.time()
    comp = union_find_components(_pair_iter(pairs))
    expected = {
        (node // _PARA_ENC, node % _PARA_ENC)
        for node, c in comp.items()
        if node != c
    }
    t_uf = time.time() - t0

    from rnadam_spark.queries.pipeline_q import paragraph_near_dups
    from rnadam_spark.session import get_spark

    spark = get_spark("pyref-para-oracle")
    t0 = time.time()
    got = {
        (r["doc_id"], r["para_idx"])
        for r in paragraph_near_dups(spark, sf_dir).collect()
    }
    t_spark = time.time() - t0

    status = "OK" if got == expected else "VALUE_MISMATCH"
    out = {
        "name": "paragraph_near_dups",
        "oracle": "python_pairs+python_union_find",
        "status": status,
        "sf_dir": sf_dir,
        "pairs": len(pairs),
        "nodes": len(comp),
        "rows": len(got),
        "sec_oracle_pairs": round(t_pairs, 2),
        "sec_oracle_unionfind": round(t_uf, 2),
        "sec_spark": round(t_spark, 2),
    }
    if status != "OK":
        out["example"] = {
            "only_spark": sorted(map(list, got - expected))[:5],
            "only_oracle": sorted(map(list, expected - got))[:5],
        }
    print(json.dumps(out))
    sys.exit(0 if status == "OK" else 1)


if __name__ == "__main__":
    main()
