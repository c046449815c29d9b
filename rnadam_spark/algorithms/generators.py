"""Seeded synthetic transcript/read generators for the statistical
end-to-end tests.

Python ports of the reference's test generators — same contracts, same
distributions (not the same RNG stream; the e2e tests assert recovered
abundances within tolerance, not byte-identical data):

- ``generate_string``: draws from ``nextInt(3)`` → alphabet is
  effectively {A, C, G}; 'T' is unreachable
  (TranscriptGenerator.scala:42-55, FIXTURES.md §A).
- ``generate_independent_transcripts``: regenerates until no k-mer is
  shared across transcripts and none repeats within one
  (TranscriptGenerator.scala:133-156).
- ``generate_transcripts``: builds transcripts by shuffling + con-
  catenating shared class blocks with multiplicities
  (TranscriptGenerator.scala:88-122).
- ``generate_reads``: reads per transcript ∝ abundance × length
  (normalized), uniform start positions, no errors
  (ReadGenerator.scala:60-84).
"""

from __future__ import annotations

import random

ALPHABET = "ACG"  # nextInt(3): 'T' unreachable in the reference generator


def generate_string(length: int, rng: random.Random) -> str:
    assert length > 0
    return "".join(ALPHABET[rng.randrange(3)] for _ in range(length))


def _kmers(s: str, k: int) -> list[str]:
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def _non_repetitive(k: int, s: str) -> bool:
    km = _kmers(s, k)
    return len(km) == len(set(km))


def _independent(k: int, ts: list[str]) -> bool:
    sets = [set(_kmers(t, k)) for t in ts]
    union = set().union(*sets)
    return len(union) == sum(len(s) for s in sets)


def generate_independent_transcripts(
    k: int, lengths: list[int], seed: int | None = None
) -> tuple[list[str], list[str], dict[str, str], dict[str, list[str]]]:
    """Returns (sequences, names, kmer→class map, class→transcripts map);
    with independent transcripts each transcript is its own class."""
    rng = random.Random(seed)
    while True:
        ts = [generate_string(n, rng) for n in lengths]
        if _independent(k, ts) and all(_non_repetitive(k, t) for t in ts):
            break
    names = [str(i) for i in range(len(ts))]
    # class IDs are strings, matching the engine's md5-content-hash IDs
    class_map = {str(i): [str(i)] for i in range(len(ts))}
    kmer_map = {km: str(i) for i, t in enumerate(ts) for km in _kmers(t, k)}
    return ts, names, kmer_map, class_map


def generate_transcripts(
    k: int,
    class_size: list[int],
    class_multiplicity: list[int],
    class_membership: list[set[int]],
    seed: int | None = None,
) -> tuple[list[str], list[str], dict[str, str], dict[str, list[str]]]:
    """Transcripts assembled from shared, independent class blocks."""
    assert len(class_membership) == len({frozenset(s) for s in class_membership})
    rng = random.Random(seed)
    blocks, _, kmer_map, _ = generate_independent_transcripts(k, class_size, seed)
    transcripts = []
    for member in class_membership:
        components = [i for i in sorted(member) for _ in range(class_multiplicity[i])]
        rng.shuffle(components)
        transcripts.append("".join(blocks[i] for i in components))
    names = [str(i) for i in range(len(class_membership))]
    t_map: dict[str, list[str]] = {}
    for t_idx, member in enumerate(class_membership):
        for c in member:
            t_map.setdefault(str(c), []).append(str(t_idx))
    return transcripts, names, kmer_map, t_map


def generate_reads(
    transcripts: list[str],
    relative_abundances: list[float],
    num_reads: int,
    read_length: int,
    seed: int | None = None,
) -> list[str]:
    lengths = [len(t) for t in transcripts]
    assert min(lengths) >= read_length, "Transcripts must be longer than read length."
    assert len(relative_abundances) == len(transcripts)
    assert abs(sum(relative_abundances) - 1.0) < 0.001

    pre = [lengths[i] * relative_abundances[i] for i in range(len(transcripts))]
    total = sum(pre)
    fractions = [p / total for p in pre]

    rng = random.Random(seed)
    reads: list[str] = []
    for i, t in enumerate(transcripts):
        n = int(fractions[i] * num_reads)
        for _ in range(n):
            start = rng.randrange(len(t) - read_length)
            reads.append(t[start : start + read_length])
    return reads
