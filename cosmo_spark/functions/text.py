"""Text-analysis expression kit for training-data pipelines.

Everything is a deterministic Column expression (JVM-side, codegen-friendly):
tokenization, polynomial rolling hashes (document fingerprints / shingle
hashes for MinHash), shingling, and stopword/quality ratios.  The polynomial
hash is defined arithmetically (not via Spark's xxhash64) so an independent
engine (the DuckDB oracle) can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for polynomial hashes — large prime, keeps acc*31+c < 2^63
HASH_MOD = 1_000_000_007
HASH_BASE = 31

#: tiny per-language stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
}


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def tokenize(text: Column | str) -> Column:
    """Lowercase word tokens: split on non-alphanumeric runs, drop empties."""
    text = _c(text)
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def poly_hash(s: Column | str) -> Column:
    """Deterministic polynomial string hash: fold chars as h = (h*31 + code) mod p.

    Reproducible in ANSI SQL (DuckDB oracle uses list_reduce over codepoints),
    unlike xxhash64/murmur.  Used for document fingerprinting and as the base
    hash for MinHash shingles.
    """
    s = _c(s)
    chars = F.filter(F.split(s, ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(HASH_BASE) + F.ascii(ch)) % F.lit(HASH_MOD),
    )


def word_shingles(tokens: Column | str, n: int = 3) -> Column:
    """n-gram word shingles of a token array (space-joined strings).

    Empty result when the document has fewer than ``n`` tokens.
    """
    tokens = _c(tokens)
    count = F.size(tokens) - F.lit(n - 1)
    return F.when(count > 0, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def token_hashes(tokens: Column | str) -> Column:
    """Polynomial hash of every token: array<long>."""
    return F.transform(_c(tokens), lambda t: poly_hash(t))


def shingle_hashes_from_token_hashes(th: Column | str, n: int = 3) -> Column:
    """Distinct n-gram shingle hashes from a *pre-materialized* token-hash
    array column.

    Shingle hash := polynomial fold of the token hashes
    (``((h1*31 + h2) % p * 31 + h3) % p``) — each character is hashed exactly
    once per document (in ``token_hashes``) instead of ``n`` times.

    IMPORTANT: ``th`` must be a bound column (staged in its own projection),
    not an inline ``transform`` expression — Catalyst cannot CSE inside
    lambda bodies, so an inline expression would be re-evaluated per shingle
    index (O(tokens²) hashing).
    """
    th = _c(th)
    count = F.size(th) - F.lit(n - 1)
    hashes = F.when(count > 0, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.aggregate(
            F.slice(th, i, n),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * F.lit(HASH_BASE) + h) % F.lit(HASH_MOD),
        ),
    )).otherwise(F.array().cast("array<long>"))
    return F.array_distinct(hashes)


def minhash_signature(hashes: Column | str, perms: list[tuple[int, int]]) -> Column:
    """MinHash signature: for each (a, b) permutation, min((a*h + b) mod p).

    ``hashes`` is the distinct shingle-hash array; output is a long array of
    len(perms).  NULL-free: empty shingle sets produce p (the modulus) as a
    sentinel so empty docs never collide with real signatures.
    """
    hashes = _c(hashes)

    def perm_min(a: int, b: int) -> Column:
        permuted = F.transform(
            hashes, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD)
        )
        return F.coalesce(F.array_min(permuted), F.lit(HASH_MOD))

    return F.array(*[perm_min(a, b) for a, b in perms])


def stopword_ratio(tokens: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords (duplicates counted)."""
    tokens = _c(tokens)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens))

def with_lexical_stats(
    df, tokens_col: str, n_col: str = "n", starts_col: str = "starts",
    counts_col: str = "counts", entropy_col: str = "entropy",
):
    """Stage row-local run-length lexical stats onto ``df``.

    Adds ``n`` (token count), ``starts`` (1-based run-boundary indices of
    the SORTED token array), ``counts`` (per-distinct-token occurrence
    counts), and ``entropy`` (unigram Shannon entropy, nats) — all computed
    with zero shuffles: sort, boundary-filter, difference, fold.  Rows with
    empty token arrays are dropped (entropy is undefined there).

    Each intermediate is staged as a bound column in its own projection:
    Catalyst cannot CSE inside lambda bodies, so inline expressions would
    re-sort the array per index probe (the shingle-staging discipline,
    see shingle_hashes_from_token_hashes).
    """
    out = df.filter(F.size(tokens_col) > 0)
    out = out.withColumn("__s", F.array_sort(tokens_col)).withColumn(
        n_col, F.size(tokens_col)
    )
    starts = F.filter(
        F.sequence(F.lit(1), F.col(n_col)),
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(F.col("__s"), i) != F.element_at(F.col("__s"), i - 1)
        ),
    )
    out = out.withColumn(starts_col, starts)
    out = out.withColumn(
        "__ext", F.concat(starts_col, F.array(F.col(n_col) + 1))
    )
    counts = F.transform(
        F.sequence(F.lit(1), F.size(starts_col)),
        lambda j: F.element_at(F.col("__ext"), j + 1)
        - F.element_at(F.col("__ext"), j),
    )
    out = out.withColumn(counts_col, counts)
    ent = F.log(F.col(n_col)) - F.aggregate(
        F.col(counts_col),
        F.lit(0.0),
        lambda a, c: a + c.cast("double") * F.log(c.cast("double")),
    ) / F.col(n_col)
    return out.withColumn(entropy_col, ent).drop("__s", "__ext")
