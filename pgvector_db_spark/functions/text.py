"""Text-analysis primitives for the LLM-data-pipeline operators
(BASELINE.json north star; SURVEY §2.3): shingling, MinHash, SimHash,
rolling-hash fingerprints, token stats, language-ID heuristic.

All pure Catalyst expressions (higher-order functions + md5) — the hot
path of a 100 TB dedup run must stay JVM-side, and every primitive is
SQL-expressible so the DuckDB oracle replays it exactly:

  hash32(s)  = first 8 hex chars of md5(s) as a bigint   (order-free min)
  minhash_j  = min over shingles of hash32(shingle || '_mh<j>')
  simhash    = per-bit majority vote over token hash32s
  fingerprint = sequential polynomial fold over characters

Determinism: md5 is identical everywhere; min / majority / fold are either
order-insensitive or sequentially folded, so results are bitwise equal
across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

MOD = 1_000_000_007


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash32(s: Column) -> Column:
    """First 32 bits of md5 as bigint — the shared cross-engine hash."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def char_shingles(text: ColumnOrName, k: int = 5) -> Column:
    """Distinct character k-grams (the MinHash input units)."""
    t = _c(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - (k - 1)),
        lambda i: F.substring(t, i, k),
    )
    return F.array_distinct(grams)


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokens."""
    return F.split(F.trim(_c(text)), r"\s+")


def minhash_signature(
    shingle_col: Column,
    num_hashes: int = 16,
    prefix: str = "_mh",
    hash_fn: str = "md5",
) -> Column:
    """MinHash signature as array<bigint>: component j is the minimum of
    hash(shingle, j) over the shingle set. Each component is an
    independent permutation approximation; P(minhash_a == minhash_b) =
    jaccard(a, b).

    ``hash_fn='md5'`` is the cross-engine (DuckDB-replicable) hash used by
    oracle-checked queries; ``'xxhash64'`` is the production path — the
    same statistics at a fraction of the cost (one JVM hash vs an md5 +
    hex decode per (shingle, component))."""

    def comp(j: int) -> Column:
        if hash_fn == "xxhash64":
            return F.array_min(
                F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(j)))
            )
        suffix = F.lit(f"{prefix}{j}")
        return F.array_min(
            F.transform(shingle_col, lambda s: hash32(F.concat(s, suffix)))
        )

    return F.array(*[comp(j) for j in range(num_hashes)])


def lsh_band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys for LSH bucketing: md5 over each band's slice of the
    signature. Docs sharing ANY band key are candidate pairs — the
    banding turns O(n²) comparison into a shuffle on band keys."""
    keys = []
    for b in range(bands):
        slice_ = F.slice(sig_col, b * rows_per_band + 1, rows_per_band)
        joined = F.concat_ws(",", F.transform(slice_, lambda x: x.cast("string")))
        keys.append(F.md5(F.concat(F.lit(f"band{b}:"), joined)))
    return F.array(*keys)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def simhash(text: ColumnOrName, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: bit b of the result is the majority
    vote of bit b across all token hash32s (strict majority → 1)."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: hash32(t))
    n = F.size(hashes)

    def ones_at(b: int) -> Column:
        def step(acc: Column, h: Column) -> Column:
            return acc + F.shiftright(h, b).bitwiseAND(F.lit(1))

        return F.aggregate(hashes, F.lit(0).cast("bigint"), step)

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out + F.when(ones_at(b) * 2 > n, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0)
        )
    return out


def hamming_distance(a: Column, b: Column, bits: int = 16) -> Column:
    """Hamming distance between two simhash values."""
    x = a.bitwiseXOR(b)
    return sum(
        (F.shiftright(x, i).bitwiseAND(F.lit(1)) for i in range(bits)),
        F.lit(0),
    )


def doc_fingerprint(text: ColumnOrName) -> Column:
    """Rolling polynomial hash over characters: fold (acc*31 + code) % p.
    Sequential fold → engine- and partitioning-independent."""
    t = _c(text)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(F.substring(t, i, 1)).cast("bigint"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % F.lit(MOD),
    )


STOPWORDS = {
    "en": ("the", "of", "and", "to", "in", "a"),
    "es": ("el", "de", "la", "que", "los", "y"),
    "fr": ("le", "de", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "von", "zu"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2", "you3"),
}


def lang_scores(text: ColumnOrName) -> dict[str, Column]:
    """Stopword-hit count per language — the n-gram-heuristic language ID.
    Deterministic and SQL-expressible; predict with argmax + alphabetical
    tie-break (see queries.ds_lang_id)."""
    toks = tokens(F.lower(_c(text)))

    def score(ws: tuple[str, ...]) -> Column:
        # Chained equality, NOT w.isin(...): an In expression inside a
        # higher-order-function lambda generates pathological codegen that
        # Janino takes ~13 s to compile (measured; OR-chain compiles in
        # <0.4 s). Same semantics — split() never yields NULL elements.
        def is_stop(w: Column) -> Column:
            pred = w == F.lit(ws[0])
            for s in ws[1:]:
                pred = pred | (w == F.lit(s))
            return pred

        return F.size(F.filter(toks, is_stop))

    return {lang: score(ws) for lang, ws in STOPWORDS.items()}
