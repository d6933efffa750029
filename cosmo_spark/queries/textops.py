"""Text-analysis / dedup query catalog over the ``documents`` table.

Training-data pipeline operators: exact dedup, MinHash+LSH near-dup,
SimHash fingerprints, n-gram Jaccard, language ID, quality scoring, token
counting, document fingerprinting.  All hashes are deterministic polynomial
arithmetic so the DuckDB oracles reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmo_spark.queries import register
from cosmo_spark.session import tune_session
from cosmo_spark.sources.tables import load_table
from cosmo_spark.functions.text import (
    HASH_BASE,
    HASH_MOD,
    STOPWORDS,
    poly_hash,
    stopword_ratio,
    token_hashes,
    tokenize,
    with_lexical_stats,
)
from cosmo_spark.operators.dedup import (
    exact_dedup,
    minhash_candidates,
    ngram_jaccard_pairs,
    normalize_text,
    simhash,
)

#: DuckDB fragment: polynomial hash of a string expression {X}.
#: NULL-safe to match Spark: poly_hash(NULL) is NULL on both engines — the
#: bare list_reduce form returned 0 for NULL input (list_prepend(0, NULL)
#: -> [0]), a cross-engine divergence the null-injection sweep caught.
_DUCK_POLY = (
    "(CASE WHEN {X} IS NULL THEN NULL ELSE "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_filter(string_split({X}, ''), ch -> ch <> ''), "
    "ch -> CAST(unicode(ch) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007)"
    " END)"
)

#: DuckDB fragment: token list of lower(text)
_DUCK_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------- #
# q18 — tokenize + explode word frequency                                     #
# --------------------------------------------------------------------------- #

@register(
    "q18_word_frequency",
    operators=("U3", "TXT4"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS word FROM tl)
SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY word HAVING count(*) >= 10
""",
)
def q18_word_frequency(
    spark: SparkSession, sf_dir: str, exact_distinct: bool = True
) -> DataFrame:
    """Zip-explode + group count — the reference's explode_df reshape
    (ref: cosmo/monitor_helpers.py:35-49) applied to token arrays.

    Scale: explode multiplies rows before the shuffle, but partial
    aggregation collapses per-partition word counts first.  The exact
    ``countDistinct`` forces a two-phase expand (one extra shuffle keyed on
    (word, doc_id)); at 100 TB pass ``exact_distinct=False`` to use
    HyperLogLog++ ``approx_count_distinct`` (rsd 5%), which rides the same
    single shuffle as the plain counts — the n_docs consumer is a
    frequency-threshold heuristic that tolerates it (SURVEY A12 note).
    Default stays exact for bit-parity with the oracle.
    """
    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    n_docs = (
        F.countDistinct("doc_id") if exact_distinct
        else F.approx_count_distinct("doc_id")
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n"),
            n_docs.alias("n_docs"),
        )
        .filter(F.col("n") >= 10)
    )


# --------------------------------------------------------------------------- #
# q20 — exact dedup                                                           #
# --------------------------------------------------------------------------- #

@register(
    "q20_exact_dedup",
    operators=("P16", "DD1"),
    oracle=f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text
  FROM documents
), hashed AS (
  SELECT doc_id,
         {_DUCK_POLY.replace('{X}', 'norm_text')} AS text_hash,
         length(norm_text) AS text_len
  FROM norm
)
SELECT text_hash, text_len, min(doc_id) AS rep_id, count(*) AS n_dups
FROM hashed GROUP BY text_hash, text_len
""",
)
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text via hash-groupBy (keep min id).

    Scale: the shuffle carries (hash, len, id) — never the document text.
    """
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id", keep="min")


# --------------------------------------------------------------------------- #
# q34 — language identification heuristic                                     #
# --------------------------------------------------------------------------- #

def _lang_case_sql() -> str:
    hits = {
        lang: (
            "len(list_filter(toks, t -> list_contains(["
            + ", ".join(f"'{w}'" for w in words)
            + "], t)))"
        )
        for lang, words in STOPWORDS.items()
    }
    return f"""
WITH tl AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, lang,
         {hits['en']} AS h_en, {hits['es']} AS h_es,
         {hits['fr']} AS h_fr, {hits['de']} AS h_de
  FROM tl
)
SELECT doc_id, lang AS label,
       CASE WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
            WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
            WHEN h_fr >= h_de THEN 'fr'
            ELSE 'de' END AS predicted
FROM scored
"""


@register("q34_langid", operators=("TXT1",), oracle=_lang_case_sql())
def q34_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword hit counts
    with a deterministic preference order on ties (en > es > fr > de)."""
    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    scored = d.select("doc_id", F.col("lang").alias("label"), toks.alias("toks"))

    def hits(words):
        sw = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(F.col("toks"), lambda t: F.array_contains(sw, t)))

    for lang, words in STOPWORDS.items():
        scored = scored.withColumn(f"h_{lang}", hits(words))
    h = {lang: F.col(f"h_{lang}") for lang in STOPWORDS}
    predicted = (
        F.when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]), "en")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]), "es")
        .when(h["fr"] >= h["de"], "fr")
        .otherwise("de")
    )
    return scored.select("doc_id", "label", predicted.alias("predicted"))


# --------------------------------------------------------------------------- #
# q35 — quality scoring                                                       #
# --------------------------------------------------------------------------- #

@register(
    "q35_quality_score",
    operators=("TXT2",),
    oracle=f"""
WITH tl AS (
  SELECT doc_id, n_chars, {_DUCK_TOKS} AS toks,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         length(text) AS len_text
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(CASE WHEN len(toks) > 0
                  THEN list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
                       / len(toks) END, 6) AS mean_token_len,
       round(n_punct / len_text, 6) AS punct_ratio,
       round(CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> list_contains(
                       ['the','a','of','and','to','in','is','it'], t)))
                       / CAST(len(toks) AS DOUBLE) END, 6) AS stopword_ratio,
       (len(toks) BETWEEN 10 AND 1000 AND n_punct / len_text < 0.2) AS passes
FROM tl
""",
)
def q35_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: token count, mean token length, punctuation
    ratio, stopword ratio, and a pass/fail gate — the standard pre-training
    corpus filters, all as column expressions."""
    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    base = d.select(
        "doc_id",
        toks.alias("toks"),
        n_punct.alias("n_punct"),
        F.length("text").alias("len_text"),
    )
    n_tokens = F.size("toks")
    mean_tok = F.when(
        n_tokens > 0,
        F.aggregate(
            F.transform("toks", lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ) / n_tokens,
    )
    sw_ratio = stopword_ratio(F.col("toks"), STOPWORDS["en"])
    punct_ratio = F.col("n_punct") / F.col("len_text")
    return base.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        (n_tokens.between(10, 1000) & (punct_ratio < 0.2)).alias("passes"),
    )


# --------------------------------------------------------------------------- #
# q36 — corpus token statistics                                               #
# --------------------------------------------------------------------------- #

@register(
    "q36_token_stats",
    operators=("TXT3",),
    oracle=f"""
WITH tl AS (SELECT lang, source, {_DUCK_TOKS} AS toks, n_chars FROM documents)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
       round(avg(len(toks)), 6) AS avg_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM tl GROUP BY lang, source
""",
)
def q36_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token accounting per (lang, source) — the bookkeeping
    rollup every training-data pipeline runs before sampling."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(tokenize(F.col("text")))
    return (
        d.select("lang", "source", n_tokens.alias("n_toks"), "n_chars")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.round(F.avg("n_toks"), 6).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------- #
# q37 — document fingerprint (polynomial rolling hash)                        #
# --------------------------------------------------------------------------- #

@register(
    "q37_fingerprint",
    operators=("TXT5", "DD1"),
    oracle=f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt
  FROM documents
)
SELECT doc_id, {_DUCK_POLY.replace('{X}', 'nt')} AS fingerprint
FROM norm
""",
)
def q37_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rolling-hash fingerprint — deterministic across engines
    (polynomial fold, not murmur/xxhash)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", poly_hash(normalize_text(F.col("text"))).alias("fingerprint")
    )


# --------------------------------------------------------------------------- #
# q38 — SimHash fingerprints                                                  #
# --------------------------------------------------------------------------- #

@register(
    "q38_simhash",
    operators=("DD3",),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM tl),
tokh AS (SELECT doc_id, {_DUCK_POLY.replace('{X}', 'tok')} AS h FROM tok),
bits AS (SELECT unnest(range(16)) AS i),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> CAST(i AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tokh CROSS JOIN bits GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
)
def q38_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document: sign-aggregated token-hash
    bits, all in per-row higher-order expressions (no shuffle until the
    final projection)."""
    d = _t(spark, sf_dir, "documents")
    return simhash(d, "text", "doc_id", bits=16)


# --------------------------------------------------------------------------- #
# q39 — MinHash + LSH near-duplicate candidates, Jaccard-verified             #
# --------------------------------------------------------------------------- #

def _minhash_oracle() -> str:
    from cosmo_spark.operators.dedup import minhash_perms

    perms = minhash_perms(8)
    p = 1_000_000_007
    mins = ",\n         ".join(
        f"min((h * {a} + {b}) % {p}) AS m{i}" for i, (a, b) in enumerate(perms)
    )
    bands = ",\n       ".join(
        f"(m{2*b} * 31 + m{2*b+1}) % {p} AS band{b}" for b in range(4)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_hash FROM sig" for b in range(4)
    )
    return f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS pos FROM tl),
tokh AS (SELECT doc_id, pos, {_DUCK_POLY.replace('{X}', 'tok')} AS th FROM tok),
shh AS (
  SELECT DISTINCT a.doc_id,
         ((a.th * 31 + b.th) % {p} * 31 + c.th) % {p} AS h
  FROM tokh a
  JOIN tokh b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokh c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), sig AS (
  SELECT doc_id,
         {mins}
  FROM shh GROUP BY doc_id
), sigb AS (
  SELECT doc_id,
       {bands}
  FROM sig
), bandrows AS ({band_union.replace('sig', 'sigb')}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandrows a JOIN bandrows b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.id_a, c.id_b,
         (SELECT count(*) FROM shh x JOIN shh y
            ON x.doc_id = c.id_a AND y.doc_id = c.id_b AND x.h = y.h) AS inter,
         (SELECT count(*) FROM shh x WHERE x.doc_id = c.id_a) AS na,
         (SELECT count(*) FROM shh y WHERE y.doc_id = c.id_b) AS nb
  FROM cand c
)
SELECT id_a, id_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
FROM verified
"""


def _cluster_oracle() -> str:
    """Recursive-CTE transitive closure over the MinHash candidate pairs."""
    minhash = _minhash_oracle().strip()
    return f"""
WITH RECURSIVE pairs AS (
  {minhash}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS id, dst AS peer FROM edges
  UNION
  SELECT r.id, e.dst AS peer FROM reach r JOIN edges e ON r.peer = e.src
)
SELECT id, CAST(least(id, min(peer)) AS BIGINT) AS cluster
FROM reach GROUP BY id
"""


@register("q45_dup_clusters", operators=("DD6",), oracle=_cluster_oracle())
def q45_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster assignment: connected components over the
    MinHash candidate graph via iterative min-label propagation — the
    'keep one per duplicate cluster' step of corpus dedup.

    The oracle expresses the same closure as a recursive CTE; the Spark side
    is a bounded driver loop of joins (each round one shuffle), the standard
    iterative-algorithm shape Spark handles that SQL recursion cannot scale.
    """
    from cosmo_spark.operators.dedup import duplicate_clusters, shingle_table

    d = _t(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    cands = minhash_candidates(
        d, "text", "doc_id", n_hashes=8, bands=4, shingle_n=3, shingles=sh
    )
    verified = ngram_jaccard_pairs(d, "text", "doc_id", candidate_pairs=cands,
                                   shingles=sh)
    return duplicate_clusters(verified.select("id_a", "id_b"))


@register(
    "q46_stratified_sample",
    operators=("TXT6",),
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, lang,
         {_DUCK_POLY.replace('{X}', 'text')} AS h
  FROM documents
), sampled AS (
  SELECT * FROM hashed
  WHERE h % 100 < (CASE lang WHEN 'en' THEN 10 ELSE 50 END)
)
SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM sampled GROUP BY lang
""",
)
def q46_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: per-language rates applied
    via content-hash buckets (``hash % 100 < rate``) — reproducible across
    engines and runs, unlike ``sampleBy`` RNG; the standard way to downsample
    an over-represented language while keeping the selection stable under
    re-runs and incremental ingest."""
    d = _t(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    sampled = d.select(
        "doc_id", "lang", poly_hash(F.col("text")).alias("h")
    ).filter(F.col("h") % 100 < rate)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register("q39_minhash_lsh", operators=("DD2", "DD4"), oracle=_minhash_oracle())
def q39_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands × 2 rows) candidate pairs, verified with
    exact shingle-set Jaccard.

    Scale: signatures are per-row expressions; the only shuffles are the
    (band_idx, band_hash) candidate join — tiny rows — and the verify join
    restricted to candidates.  This is the find-then-verify shape that keeps
    near-dup at 100 TB sub-quadratic.
    """
    from cosmo_spark.operators.dedup import shingle_table

    d = _t(spark, sf_dir, "documents")
    # hash shingles once, reuse for both signature and verification — the
    # per-character hashing is the dominant cost
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    cands = minhash_candidates(
        d, "text", "doc_id", n_hashes=8, bands=4, shingle_n=3, shingles=sh
    )
    verified = ngram_jaccard_pairs(
        d, "text", "doc_id", candidate_pairs=cands, shingles=sh
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------------------- #
# q50 — Structured Streaming exact dedup (end-to-end)                         #
# --------------------------------------------------------------------------- #

@register(
    "q50_stream_dedup",
    operators=("ST1", "ST3", "DD1"),
    oracle=f"""
WITH norm AS (
  SELECT regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text
  FROM documents
)
SELECT DISTINCT {_DUCK_POLY.replace('{X}', 'norm_text')} AS text_hash,
       length(norm_text) AS text_len
FROM norm
""",
)
def q50_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming exact dedup: availableNow file stream
    over the documents table -> stateful ``dropDuplicates`` on the
    (normalized-text hash, length) key -> append-mode memory sink.

    The incremental twin of q20 (ref new-file semantics: SURVEY.md ST1/ST3,
    cosmo/monitors/data_models.py:62-77): a batch re-run of the stream is a
    no-op for already-seen documents because the dedup state carries the key
    set across triggers.  The emitted key set is arrival-order-independent
    (keys, not representatives, are output), so it hash-matches the batch
    DISTINCT oracle exactly.

    Scale: state is ~16 bytes per distinct document (hash + length), never
    the text; on an unbounded stream the same pipeline uses
    ``dropDuplicatesWithinWatermark`` to bound state by event time.
    """
    from cosmo_spark.operators.dedup import normalize_text

    tune_session(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    norm = normalize_text(F.col("text"))
    keyed = stream.select(
        poly_hash(norm).alias("text_hash"),
        F.length(norm).cast("long").alias("text_len"),
    )
    deduped = keyed.dropDuplicates(["text_hash", "text_len"])
    sink = "q50_stream_dedup_sink"
    spark.catalog.dropTempView(sink)
    query = (
        deduped.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------- #
# q53 — repetition-based quality signals (Gopher-style)                       #
# --------------------------------------------------------------------------- #

@register(
    "q53_repetition_quality",
    operators=("TXT2", "A12", "U3"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
runs AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         CASE WHEN len(toks) >= 2 THEN
           list_reduce(
             list_prepend(
               struct_pack(p := '', r := CAST(0 AS BIGINT),
                           b := CAST(0 AS BIGINT)),
               list_transform(
                 list_sort(list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i + 1])),
                 s -> struct_pack(p := s, r := CAST(1 AS BIGINT),
                                  b := CAST(1 AS BIGINT)))),
             (acc, x) -> CASE WHEN x.p = acc.p THEN
                 struct_pack(p := x.p, r := acc.r + 1,
                             b := greatest(acc.b, acc.r + 1))
               ELSE struct_pack(p := x.p, r := CAST(1 AS BIGINT),
                                b := greatest(acc.b, CAST(1 AS BIGINT))) END
           ).b
         END AS top_c
  FROM tl
)
SELECT doc_id, n_tokens,
       round(1 - n_distinct / CAST(n_tokens AS DOUBLE), 6) AS dup_word_frac,
       round(top_c / CAST(n_tokens - 1 AS DOUBLE), 6) AS top_bigram_frac
FROM runs
""",
)
def q53_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals per document — the Gopher-rule
    family a training-data pipeline filters on: duplicate-word fraction and
    the fraction of all bigrams taken by the single most frequent bigram
    (high values = boilerplate/spam).  Extends the reference's quality
    scoring (q35) with the repetition dimension.

    Scale shape: ZERO shuffles — both signals are per-document, so they
    compute row-local with higher-order functions: duplicate-word fraction
    via ``array_distinct``, and the modal-bigram count as the longest
    equal-run of the SORTED bigram array (one ``aggregate`` fold over
    struct state).  The former explode → groupBy → countDistinct → join
    formulation shuffled the corpus four times to compute quantities each
    row already owned; this is a map-only scan, O(L log L) per document,
    whole-stage codegen.  Output is one row per document — the natural
    input to a downstream ``WHERE dup_word_frac < t1 AND top_bigram_frac
    < t2`` keep-filter.
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", tokenize(F.col("text")).alias("toks"))
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice("toks", 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("toks"), F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    init = F.struct(
        F.lit("").alias("p"),
        F.lit(0).cast("long").alias("r"),
        F.lit(0).cast("long").alias("b"),
    )
    top_c = F.when(
        n >= 2,
        F.aggregate(
            F.array_sort(bigrams),
            init,
            lambda acc, x: F.when(
                x == acc["p"],
                F.struct(
                    x.alias("p"),
                    (acc["r"] + 1).alias("r"),
                    F.greatest(acc["b"], acc["r"] + 1).alias("b"),
                ),
            ).otherwise(
                F.struct(
                    x.alias("p"),
                    F.lit(1).cast("long").alias("r"),
                    F.greatest(acc["b"], F.lit(1).cast("long")).alias("b"),
                )
            ),
            lambda acc: acc["b"],
        ),
    )
    calc = tl.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        top_c.alias("top_c"),
    )
    return calc.select(
        "doc_id",
        "n_tokens",
        F.round(1 - F.col("n_distinct") / F.col("n_tokens").cast("double"), 6)
         .alias("dup_word_frac"),
        F.round(F.col("top_c") / (F.col("n_tokens") - 1).cast("double"), 6)
         .alias("top_bigram_frac"),
    )


# --------------------------------------------------------------------------- #
# q57 — opaque-binary metadata extraction (multimodal column pattern)         #
# --------------------------------------------------------------------------- #

@register(
    "q57_binary_metadata",
    operators=("MM1", "P11"),
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       length(text) AS n_chars,
       octet_length(encode(text)) = length(text) AS is_ascii,
       hex(encode(left(text, 8))) AS header_hex
FROM documents
""",
)
def q57_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload — the multimodal-column
    pattern (sources/multimodal.py carries media the same way: bytes +
    metadata, decode behind mapInPandas).  Here the payload is the UTF-8
    encoding of the document text so the oracle can reproduce it: byte
    length vs char length (multi-byte detection) and a hex header prefix —
    the magic-number sniff a media pipeline runs before routing blobs to
    decoders.  All JVM-side expressions; nothing leaves codegen.
    """
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.octet_length(t).cast("long").alias("n_bytes"),
        F.length(t).cast("long").alias("n_chars"),
        (F.octet_length(t) == F.length(t)).alias("is_ascii"),
        F.hex(F.encode(F.substring(t, 1, 8), "UTF-8")).alias("header_hex"),
    )


# --------------------------------------------------------------------------- #
# q58 — corpus-frequency rarity scoring (CCNet-style quality signal)          #
# --------------------------------------------------------------------------- #

@register(
    "q58_rare_word_score",
    operators=("TXT2", "A11", "J1"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
words AS (SELECT doc_id, unnest(toks) AS w FROM tl),
vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM words GROUP BY w),
scored AS (
  SELECT words.doc_id, vocab.cf FROM words JOIN vocab USING (w)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cf < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       sum(CASE WHEN cf < 5 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)
         AS rare_frac,
       CAST(sum(cf) AS BIGINT) / CAST(count(*) AS DOUBLE) AS mean_corpus_freq
FROM scored GROUP BY doc_id
""",
)
def q58_rare_word_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative word-frequency scoring — the CCNet-style quality
    signal family: documents dominated by corpus-rare tokens are noise/
    garble candidates, documents of only ultra-common tokens are
    boilerplate.  Two passes over the token explode: corpus vocabulary
    counts, then a token→vocab join aggregated per document.

    All statistics are exact-integer sums divided once, so the oracle
    matches bit-for-bit in any aggregation order (PARITY rule 3) — a log-
    probability variant would hinge on cross-engine ``ln`` ulp behavior.

    Scale: the vocabulary aggregation shuffles on the word key with full
    partial aggregation; the token→vocab join inherits Zipf skew (the
    top-10 tokens of any natural corpus appear in nearly every document),
    so it routes through operators.skew.hot_cold_dict_join — the hottest
    vocab keys broadcast and resolve map-side, only the low-cardinality
    tail shuffle-joins.  A whole-vocab broadcast is NOT the answer at
    100 TB: a web corpus's tail vocabulary is itself corpus-scale.

    ``vocab`` is persisted: it feeds three consumers inside the hot/cold
    join (hot-key TakeOrdered, the anti-join key set, the cold join), and
    without an explicit persist its corpus-scale aggregation would be
    recomputed per branch unless Catalyst happens to reuse the exchange.
    Cleanup is left to the ContextCleaner once the plan is released.
    """
    from cosmo_spark.operators.skew import hot_cold_dict_join

    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("cf")).persist()
    scored = hot_cold_dict_join(words, vocab, on="w", freq_col="cf")
    rare = F.sum(F.when(F.col("cf") < 5, 1).otherwise(0))
    n = F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        rare.alias("n_rare"),
        (rare / n.cast("double")).alias("rare_frac"),
        (F.sum("cf") / n.cast("double")).alias("mean_corpus_freq"),
    )


# --------------------------------------------------------------------------- #
# q59 — benchmark decontamination (train/eval n-gram overlap)                  #
# --------------------------------------------------------------------------- #

#: DuckDB twin of the per-token poly-hash array
_DUCK_TOK_HASHES = (
    "list_transform(t, tok -> " + _DUCK_POLY.format(X="tok") + ")"
)


def _span_hash_col(n: int):
    """Exploded column of every ``n``-token span hash of ``hs`` (stride 1)
    — the shared substring-dedup primitive behind q64/q66/q72/q91.  One
    definition: the fold base/mod, stride, and window arithmetic must stay
    in lockstep with ``_duck_span_fold`` or parity silently breaks for a
    subset of the span queries."""
    return F.explode(
        F.expr(
            f"transform(sequence(1, size(hs) - {n} + 1), i -> "
            f"aggregate(slice(hs, i, {n}), 0L, "
            f"(a, b) -> (a * {HASH_BASE} + b) % {HASH_MOD}))"
        )
    ).alias("h")


def _duck_span_fold(n: int) -> str:
    """DuckDB twin of ``_span_hash_col``'s per-span fold (used inside a
    ``FROM th, unnest(range(1, len(hs) - n + 2)) AS r(i)`` lateral)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"hs[i : i + {n} - 1]), "
        f"(a, b) -> (a * {HASH_BASE} + b) % {HASH_MOD})"
    )


#: gram-combining base/modulus shared by both q59 sides: a 3-gram's hash is
#: the base-1000003 fold of its three token hashes mod 1e9+7
_GRAM_BASE, _GRAM_MOD = 1_000_003, 1_000_000_007

@register(
    "q59_decontaminate",
    operators=("TXT5", "J3", "A12"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
th AS (SELECT doc_id, {_DUCK_TOK_HASHES} AS hs FROM tl),
grams AS (
  SELECT doc_id,
         ((hs[i] * {_GRAM_BASE} + hs[i+1]) % {_GRAM_MOD} * {_GRAM_BASE}
           + hs[i+2]) % {_GRAM_MOD} AS h
  FROM th, unnest(range(1, greatest(len(hs) - 1, 1))) AS r(i)
),
ev AS (SELECT DISTINCT h FROM grams WHERE doc_id % 97 = 0),
tr AS (SELECT DISTINCT doc_id, h FROM grams WHERE doc_id % 97 <> 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
FROM tr JOIN ev USING (h) GROUP BY doc_id
""",
)
def q59_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing any token
    3-gram with a held-out evaluation set (here the deterministic pseudo-
    split ``doc_id % 97 = 0``): the standard pre-training hygiene pass that
    keeps eval benchmarks out of the corpus (the n-gram-overlap method of
    the GPT-3/PaLM appendix lineage).

    Scale shape: each TOKEN is char-poly-hashed exactly once, and a gram's
    hash is two multiply-adds over its three token hashes — hashing gram
    *strings* would re-fold every character 3x and build the join key by
    string concat (measured 3x slower end-to-end).  The shuffle carries one
    BIGINT per gram, never text; the eval side is DISTINCT-collapsed and
    broadcast — a benchmark suite is bounded (thousands of documents), so
    the contamination check rides the corpus scan map-side with no
    corpus-wide shuffle.  Only the per-document distinct-gram dedup
    shuffles, keyed (doc_id, hash), partial-aggregated.  At a truly huge
    eval set the broadcast degrades to an ordinary hash join on ``h`` —
    same plan shape, still no text movement.
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    th = tl.select(
        "doc_id", token_hashes("t").alias("hs")
    )
    grams = th.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("hs") >= 3,
                # NB: Spark [] subscripts are 0-based (the DuckDB twin's are
                # 1-based) — both enumerate the same token triples in order
                F.expr(
                    f"transform(sequence(0, size(hs) - 3), i -> "
                    f"((hs[i] * {_GRAM_BASE} + hs[i+1]) % {_GRAM_MOD} "
                    f"* {_GRAM_BASE} + hs[i+2]) % {_GRAM_MOD})"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("h"),
    )
    ev = grams.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    tr = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "h").distinct()
    )
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


def _gopher_funnel_agg(tl):
    """Cumulative Gopher-cascade conditional sums over a doc frame with
    ``lang`` and token column ``t``.  Shared by the batch (q60) and
    streaming (q73) funnels — SAME expressions, so the stream is the
    batch plan incrementalized, not a reimplementation."""
    n = F.size("t")
    mtl = F.when(
        n > 0,
        F.aggregate(
            F.transform("t", lambda x: F.length(x).cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        ) / n,
    )
    swr = stopword_ratio(F.col("t"), STOPWORDS["en"])
    dwf = F.when(n > 0, 1.0 - F.size(F.array_distinct("t")).cast("double") / n)
    c1 = F.col("lang") == "en"
    c2 = c1 & n.between(30, 1000)
    c3 = c2 & mtl.between(3, 10)
    c4 = c3 & (swr >= 0.05)
    c5 = c4 & (dwf < 0.5)
    return tl.agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum(F.when(c, 1).otherwise(0)).alias(f"s{i}")
            for i, c in enumerate((c1, c2, c3, c4, c5), start=1)
        ],
    )


def _funnel_rows(agg_df):
    """Unpivot the 1-row cumulative counts into the 5-stage funnel."""
    funnel = agg_df.selectExpr(
        "stack(5, "
        "1L, 'lang_en', CAST(total AS LONG), CAST(s1 AS LONG), "
        "2L, 'length_30_1000', CAST(s1 AS LONG), CAST(s2 AS LONG), "
        "3L, 'mean_token_len_3_10', CAST(s2 AS LONG), CAST(s3 AS LONG), "
        "4L, 'stopword_ratio_ge_005', CAST(s3 AS LONG), CAST(s4 AS LONG), "
        "5L, 'dup_word_frac_lt_05', CAST(s4 AS LONG), CAST(s5 AS LONG)"
        ") AS (stage_idx, stage, n_in, n_pass)"
    )
    return funnel.select(
        "stage_idx", "stage", "n_in", "n_pass",
        F.round(
            F.when(F.col("n_in") > 0,
                   F.col("n_pass").cast("double") / F.col("n_in")),
            6,
        ).alias("pass_rate"),
    )


# --------------------------------------------------------------------------- #
# q60 — quality-filter funnel (C4/Gopher-style cascade with per-stage counts) #
# --------------------------------------------------------------------------- #

@register(
    "q60_filter_funnel",
    operators=("TXT2", "A4", "U2"),
    oracle=f"""
WITH tl AS (
  SELECT doc_id, lang, {_DUCK_TOKS} AS t, text FROM documents
), f AS (
  SELECT lang, len(t) AS n,
    CASE WHEN len(t) > 0 THEN
      list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE))) / len(t)
    END AS mtl,
    CASE WHEN len(t) > 0 THEN
      len(list_filter(t, x -> list_contains(
        ['the','a','of','and','to','in','is','it'], x)))
        / CAST(len(t) AS DOUBLE)
    END AS swr,
    CASE WHEN len(t) > 0 THEN
      1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
    END AS dwf
  FROM tl
), agg AS (
  SELECT count(*) AS total,
    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS s1,
    sum(CASE WHEN lang = 'en' AND n BETWEEN 30 AND 1000
        THEN 1 ELSE 0 END) AS s2,
    sum(CASE WHEN lang = 'en' AND n BETWEEN 30 AND 1000
         AND mtl BETWEEN 3 AND 10 THEN 1 ELSE 0 END) AS s3,
    sum(CASE WHEN lang = 'en' AND n BETWEEN 30 AND 1000
         AND mtl BETWEEN 3 AND 10 AND swr >= 0.05 THEN 1 ELSE 0 END) AS s4,
    sum(CASE WHEN lang = 'en' AND n BETWEEN 30 AND 1000
         AND mtl BETWEEN 3 AND 10 AND swr >= 0.05 AND dwf < 0.5
        THEN 1 ELSE 0 END) AS s5
  FROM f
)
SELECT stage_idx, stage, n_in, n_pass,
       round(CASE WHEN n_in > 0 THEN n_pass / CAST(n_in AS DOUBLE) END, 6)
         AS pass_rate
FROM (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'lang_en' AS stage,
         CAST(total AS BIGINT) AS n_in, CAST(s1 AS BIGINT) AS n_pass FROM agg
  UNION ALL SELECT 2, 'length_30_1000', CAST(s1 AS BIGINT), CAST(s2 AS BIGINT) FROM agg
  UNION ALL SELECT 3, 'mean_token_len_3_10', CAST(s2 AS BIGINT), CAST(s3 AS BIGINT) FROM agg
  UNION ALL SELECT 4, 'stopword_ratio_ge_005', CAST(s3 AS BIGINT), CAST(s4 AS BIGINT) FROM agg
  UNION ALL SELECT 5, 'dup_word_frac_lt_05', CAST(s4 AS BIGINT), CAST(s5 AS BIGINT) FROM agg
)
""",
)
def q60_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pre-training quality cascade as ONE funnel query — language
    gate, Gopher-style length band, mean-token-length band, stopword floor,
    repetition (duplicate-word-fraction) cap — emitting per-stage in/pass
    counts, the acceptance report every corpus build publishes.

    Scale shape: one scan computes every per-document signal as column
    expressions; a single aggregate reduces them to cumulative stage counts
    (conditional sums are map-side partial-aggregated, so the shuffle
    carries 6 longs per partition), and the 5-row funnel is an unpivot of
    that one row.  No joins, no second scan, no per-stage passes — adding a
    stage costs one more conditional sum, not another job.
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", "lang", tokenize(F.col("text")).alias("t"))
    return _funnel_rows(_gopher_funnel_agg(tl))


# --------------------------------------------------------------------------- #
# q62 — document chunking (fixed window / stride, the embedding-prep reshape) #
# --------------------------------------------------------------------------- #

_CHUNK_W, _CHUNK_S = 32, 24  # window, stride (8-token overlap)

@register(
    "q62_chunk_documents",
    operators=("U3", "TXT3"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
th AS (SELECT doc_id, {_DUCK_TOK_HASHES} AS hs FROM tl WHERE len(t) > 0),
chunks AS (
  SELECT doc_id, k AS chunk_idx, k * {_CHUNK_S} AS start,
         least({_CHUNK_W}, len(hs) - k * {_CHUNK_S}) AS chunk_len,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           hs[k * {_CHUNK_S} + 1 : k * {_CHUNK_S} + {_CHUNK_W}]),
           (a, b) -> (a * 31 + b) % 1000000007) AS chunk_hash
  FROM th, unnest(range(0, (len(hs) - 1) // {_CHUNK_S} + 1)) AS r(k)
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       CAST(chunk_len AS BIGINT) AS chunk_len, chunk_hash
FROM chunks
""",
)
def q62_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window / stride document chunking — the reshape every
    embedding / retrieval pipeline runs before batch inference: token
    windows of {w} with stride {s} (tail chunks shorter), one row per
    chunk, content-addressed by the polynomial fold of its token hashes
    (chunk-level caching / dedup key downstream).

    Scale shape: per-row explode of a computed start sequence — no
    shuffle at all; chunk count is data-proportional and the explode
    multiplies rows BEFORE any exchange, so downstream batch-inference
    partitioning sees uniformly sized units.  Token hashes are computed
    once per token and sliced per chunk (the q59 discipline — never
    re-fold characters per chunk).
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    th = tl.filter(F.size("t") > 0).select(
        "doc_id", token_hashes("t").alias("hs")
    )
    w, s = _CHUNK_W, _CHUNK_S
    return (
        th.select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(0, CAST(floor((size(hs) - 1) / {s}) AS INT))")
            ).alias("chunk_idx"),
            "hs",
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * s).cast("long").alias("start"),
            F.least(
                F.lit(w), F.size("hs") - F.col("chunk_idx") * s
            ).cast("long").alias("chunk_len"),
            F.aggregate(
                F.expr(f"slice(hs, chunk_idx * {s} + 1, {w})"),
                F.lit(0).cast("long"),
                lambda a, b: (a * 31 + b) % 1000000007,
            ).alias("chunk_hash"),
        )
    )


# --------------------------------------------------------------------------- #
# q63 — corpus mixing: deterministic exact-token-budget source sampling       #
# --------------------------------------------------------------------------- #

@register(
    "q63_source_mixing",
    operators=("TXT6", "W2", "A4"),
    oracle=f"""
WITH tl AS (
  SELECT doc_id, source, len({_DUCK_TOKS}) AS n,
         {_DUCK_POLY.format(X='text')} AS h
  FROM documents
), b AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS tot,
         CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0
              THEN CAST(sum(n) AS BIGINT) // 2
              ELSE CAST(sum(n) AS BIGINT) // 4 END AS budget
  FROM tl GROUP BY source
), ord AS (
  SELECT tl.source, tl.n, b.budget,
         sum(tl.n) OVER (PARTITION BY tl.source
                         ORDER BY tl.h % 256, tl.h, tl.doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM tl JOIN b USING (source)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS tokens,
       CAST(any_value(budget) AS BIGINT) AS budget,
       round(sum(n) / CAST(any_value(budget) AS DOUBLE), 6) AS utilization
FROM ord WHERE cum <= budget GROUP BY source
""",
)
def q63_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing to exact per-source token budgets — the
    "data mixture" step of a pre-training build (web 50%, the rest 25%,
    here derived from the source index): each source contributes documents,
    in content-hash order, until its token budget is exhausted.
    Hash-ordered selection makes the mixture reproducible across runs and
    stable under incremental ingest (the q46 discipline), and an exact
    budget beats rate sampling when the recipe is specified in tokens.

    Scale shape — the naive form (one ordered cumsum per source) serializes
    each source through a single reducer, exactly the q13-class trap at
    corpus scale.  This implementation is the two-level variant: documents
    hash into 256 sub-buckets per source, a per-(source, bucket) partial
    sum reduces corpus-scale data to 256 rows per source, the tiny bucket
    table takes the ordered cumsum (a driver-sized window), and only the
    single BOUNDARY bucket's documents — 1/256th of a source — need the
    exact within-bucket ordered cumsum.  Full buckets are selected
    wholesale by a broadcast semi-join.  Selection order is
    (bucket, hash, doc_id), so the result is identical to the naive global
    cumsum the oracle runs.
    """
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    # persist: four consumers (budgets, bucket stats, full-bucket and
    # boundary-bucket selections) would otherwise re-scan the corpus and
    # re-run the per-character text hashing — the dominant per-row cost —
    # once each (the q55/q58 multi-consumer discipline)
    base = d.select(
        "doc_id", "source",
        F.size(tokenize(F.col("text"))).cast("long").alias("n"),
        poly_hash(F.col("text")).alias("h"),
    ).withColumn("bucket", F.col("h") % 256).persist()
    budgets = base.groupBy("source").agg(F.sum("n").alias("tot")).select(
        "source", "tot",
        # try_cast: a source name without the srcNN numeric suffix takes
        # the else-branch budget instead of failing the ANSI cast (the
        # skew sweep injects 'hot_source')
        F.when(
            F.expr("try_cast(substring(source, 4, 10) AS INT)") % 2 == 0,
            F.expr("tot div 2"),
        ).otherwise(F.expr("tot div 4")).alias("budget"),
    )
    bstats = base.groupBy("source", "bucket").agg(F.sum("n").alias("bt"))
    w = Window.partitionBy("source").orderBy("bucket")
    bcum = (
        bstats.withColumn("cum", F.sum("bt").over(w))
        .join(F.broadcast(budgets.select("source", "budget")), "source")
    )
    full = bcum.filter(F.col("cum") <= F.col("budget")).select("source", "bucket")
    boundary = bcum.filter(
        (F.col("cum") > F.col("budget"))
        & (F.col("cum") - F.col("bt") < F.col("budget"))
    ).select(
        "source", "bucket",
        (F.col("budget") - (F.col("cum") - F.col("bt"))).alias("remaining"),
    )
    sel_full = base.join(F.broadcast(full), ["source", "bucket"], "left_semi")
    w2 = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
    sel_bnd = (
        base.join(F.broadcast(boundary), ["source", "bucket"])
        .withColumn("__cum", F.sum("n").over(w2))
        .filter(F.col("__cum") <= F.col("remaining"))
        .select(*base.columns)
    )
    selected = sel_full.unionByName(sel_bnd)
    return (
        selected.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("tokens"))
        .join(F.broadcast(budgets.select("source", "budget")), "source")
        .select(
            "source", "n_docs", "tokens", "budget",
            F.round(F.col("tokens") / F.col("budget").cast("double"), 6)
             .alias("utilization"),
        )
    )


# --------------------------------------------------------------------------- #
# q64 — repeated-span detection (within-corpus substring dedup signal)        #
# --------------------------------------------------------------------------- #

_SPAN_N = 16  # span length in tokens, stride 1

@register(
    "q64_repeated_spans",
    operators=("DD1", "TXT5", "A11"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
th AS (SELECT doc_id, {_DUCK_TOK_HASHES} AS hs FROM tl WHERE len(t) >= {_SPAN_N}),
spans AS (
  SELECT doc_id,
         {_duck_span_fold(_SPAN_N)} AS h
  FROM th, unnest(range(1, len(hs) - {_SPAN_N} + 2)) AS r(i)
),
marked AS (
  SELECT doc_id, count(*) OVER (PARTITION BY h) AS occ FROM spans
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       round(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS repeated_frac
FROM marked GROUP BY doc_id
""",
)
def q64_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span detection — the exact-substring dedup signal of the
    "Deduplicating Training Data Makes Language Models Better" family: every
    {n}-token window (stride 1) is content-hashed, a span seen more than
    once ANYWHERE in the corpus (within a document or across documents)
    marks its occurrences, and each document reports the fraction of its
    spans that are corpus-repeated — the input to span-removal or
    doc-dropping policies.

    Scale shape: per-token hashes computed once (q59/q62 discipline), span
    hashes are O(L) fold-combines per document using the shared
    HASH_BASE/HASH_MOD constants, and every shuffle carries BIGINTs only.
    The occurrence count is an AGGREGATE + JOIN, deliberately NOT a
    count-over-hash window: mass duplication is this workload's expected
    input (a boilerplate footer span can appear in a large fraction of all
    documents), a window would funnel each hot hash's entire occurrence
    list through one reducer and AQE cannot split windows — but it CAN
    split skewed join partitions, and the count aggregate partial-combines
    the hot hash map-side.  ``spans`` is persisted for its two consumers
    (count + mark join; ContextCleaner reclaims it when the plan is
    released).
    """
    d = _t(spark, sf_dir, "documents")
    n = _SPAN_N
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    th = tl.filter(F.size("t") >= n).select(
        "doc_id", token_hashes("t").alias("hs")
    )
    spans = th.select(
        "doc_id",
        _span_hash_col(n),
    ).persist()
    counts = spans.groupBy("h").agg(F.count(F.lit(1)).alias("__occ"))
    marked = spans.join(counts, "h")
    rep = F.sum(F.when(F.col("__occ") > 1, 1).otherwise(0))
    cnt = F.count(F.lit(1))
    return marked.groupBy("doc_id").agg(
        cnt.alias("n_spans"),
        rep.cast("long").alias("n_repeated"),
        F.round(rep / cnt.cast("double"), 6).alias("repeated_frac"),
    )


# --------------------------------------------------------------------------- #
# q91 — span novelty: first-owner attribution (keep-first pruning signal)      #
# --------------------------------------------------------------------------- #

@register(
    "q91_span_novelty",
    operators=("DD1", "A14", "A11"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
th AS (SELECT doc_id, {_DUCK_TOK_HASHES} AS hs FROM tl WHERE len(t) >= {_SPAN_N}),
spans AS (
  SELECT DISTINCT doc_id,
         {_duck_span_fold(_SPAN_N)} AS h
  FROM th, unnest(range(1, len(hs) - {_SPAN_N} + 2)) AS r(i)
),
totals AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM spans GROUP BY doc_id
),
first_owner AS (
  SELECT h, min(doc_id) AS first_doc FROM spans GROUP BY h
),
novel AS (
  SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
  FROM first_owner GROUP BY first_doc
)
SELECT t.doc_id, t.n_spans,
       COALESCE(n.n_novel, 0) AS n_novel,
       round(COALESCE(n.n_novel, 0) / CAST(t.n_spans AS DOUBLE), 6)
         AS novelty_frac
FROM totals t LEFT JOIN novel n USING (doc_id)
""",
)
def q91_span_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span novelty by FIRST-OWNER attribution — the keep-first-occurrence
    pruning signal: every distinct {n}-token span hash is attributed to the
    lowest doc_id containing it, and each document reports how many of its
    distinct spans it OWNS (novelty_frac → 1 for original content, → 0 for
    a document whose text all appeared in earlier documents).  Complements
    q64: repeated_frac says "this span exists elsewhere"; novelty says
    "this document is the copy, that one is the original" — the decision
    rule substring-dedup policies actually apply.

    Scale shape: NO corpus-scale join anywhere — distinct (doc, h) spans
    partial-combine map-side, the first-owner table is a min() aggregate
    keyed by span hash (hot boilerplate hashes partial-combine, the q64
    skew argument), and its per-doc novel counts collapse to doc-level
    BEFORE the only join, which is doc-table-sized on both sides.  Every
    shuffle carries BIGINTs.
    """
    d = _t(spark, sf_dir, "documents")
    n = _SPAN_N
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    th = tl.filter(F.size("t") >= n).select(
        "doc_id", token_hashes("t").alias("hs")
    )
    spans = th.select(
        "doc_id",
        _span_hash_col(n),
    ).distinct().persist()
    totals = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    first_owner = spans.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = first_owner.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("__novel")
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id", "n_spans",
            F.coalesce("__novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce("__novel", F.lit(0)) / F.col("n_spans").cast("double"), 6
            ).alias("novelty_frac"),
        )
    )


# --------------------------------------------------------------------------- #
# q149 — exact-substring removal: elide duplicated spans, rewrite documents    #
# --------------------------------------------------------------------------- #

# keep-first tiebreak key: a lexicographic (doc_id, start) STRUCT min —
# injective at ANY document length (a packed doc_id*K + start bigint loses
# injectivity for docs with >= K tokens and elects a wrong keeper with the
# oracle agreeing, so parity could not catch it).  Null doc_ids are mapped
# to a NULL key so they never keep and never remove, identically in both
# engines (struct null-FIELD ordering differs across engines; whole-NULL
# keys are simply ignored by min and by the <> filter).


@register(
    "q149_substring_removal",
    operators=("DD1", "TXT5", "A14", "U3"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
th AS (SELECT doc_id, {_DUCK_TOK_HASHES} AS hs FROM tl),
occ AS (
  SELECT doc_id, i, {_duck_span_fold(_SPAN_N)} AS h,
         CASE WHEN doc_id IS NULL THEN NULL ELSE ROW(doc_id, i) END AS k
  FROM th, unnest(range(1, greatest(len(hs) - {_SPAN_N} + 2, 1))) AS r(i)
),
dup AS (
  SELECT h, min(k) AS keeper
  FROM occ GROUP BY h HAVING count(*) >= 2
),
rem AS (
  SELECT o.doc_id, o.i FROM occ o JOIN dup d USING (h)
  WHERE o.k <> d.keeper
),
cov AS (SELECT DISTINCT doc_id, i + j AS p
        FROM rem, unnest(range(0, {_SPAN_N})) AS r(j)),
pos AS (SELECT doc_id, p, hs[p] AS th
        FROM th, unnest(range(1, len(hs) + 1)) AS r(p)),
mk AS (
  SELECT pos.doc_id, pos.p, pos.th, cov.p IS NOT NULL AS rm
  FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list(th ORDER BY p) FILTER (WHERE NOT rm)),
         (a, b) -> (a * {HASH_BASE} + b) % {HASH_MOD}), 0) AS rebuilt_hash
FROM mk GROUP BY doc_id
""",
)
def q149_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with REMOVAL — the other half of the Lee et
    al. 2022 recipe that q64/q91 only signal: every duplicated
    {_SPAN_N}-token span keeps exactly one occurrence corpus-wide (the
    lexicographically-first (doc_id, start)), every other occurrence's
    token positions are elided, and each document is reassembled from its
    surviving tokens.  Output per document: token count before, tokens
    removed, and the position-ordered polynomial fold of the surviving
    token hashes — the rebuilt document's content hash, which a byte-level
    reassembly would feed straight to a sink.  A fully-duplicated document
    (the non-keeper copy of an exact pair) survives with n_removed ==
    n_tokens and rebuilt_hash 0.

    Scale shape: span hashes are O(L) fold-combines per document reusing
    the q64 constants; the duplicate table is a count/min AGGREGATE on the
    span hash (partial-combines map-side — the boilerplate-span skew
    argument from q64), the removal join carries (BIGINT h, packed BIGINT
    key) only, and covered positions collapse via DISTINCT on (doc_id, p)
    before the token-table join, which is keyed on (doc_id, p) — never a
    window over a hot hash.  The final per-document rebuild is a bounded
    collect_list + array_sort fold (documents are bounded; no corpus-scale
    state).  The only tables shuffled are token/span-sized with BIGINT
    columns; text never moves after tokenization.
    """
    d = _t(spark, sf_dir, "documents")
    n = _SPAN_N
    th = d.select(
        "doc_id", token_hashes(tokenize(F.col("text"))).alias("hs")
    )
    spans = th.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(CASE WHEN size(hs) >= {n} "
            f"THEN sequence(1, size(hs) - {n} + 1) ELSE array() END, "
            f"i -> struct(i AS i, aggregate(slice(hs, i, {n}), 0L, "
            f"(a, b) -> (a * {HASH_BASE} + b) % {HASH_MOD}) AS h))"
        )).alias("s"),
    ).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.h").alias("h"),
        F.when(
            F.col("doc_id").isNotNull(),
            F.struct(F.col("doc_id"), F.col("s.i").alias("i")),
        ).alias("k"),
    ).persist()
    dup = spans.groupBy("h").agg(
        F.count(F.lit(1)).alias("__c"), F.min("k").alias("__keeper")
    ).filter(F.col("__c") >= 2)
    rem = (
        spans.join(dup, "h")
        .filter(F.col("k") != F.col("__keeper"))
        .select("doc_id", "i")
    )
    cov = rem.select(
        "doc_id", F.explode(F.expr(f"sequence(i, i + {n} - 1)")).alias("p")
    ).distinct().withColumn("__rm", F.lit(1))
    pos = th.select(
        "doc_id", F.posexplode("hs").alias("p0", "th")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "th")
    marked = pos.join(cov, ["doc_id", "p"], "left")
    kept_fold = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("__rm").isNull(), F.struct("p", "th"))
            )),
            lambda s: s.th,
        ),
        F.lit(0).cast("long"),
        lambda a, b: (a * HASH_BASE + b) % HASH_MOD,
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__rm") == 1, 1).otherwise(0))
        .cast("long").alias("n_removed"),
        kept_fold.alias("rebuilt_hash"),
    )


# --------------------------------------------------------------------------- #
# q65 — token entropy (row-local lexical-diversity quality signal)             #
# --------------------------------------------------------------------------- #

@register(
    "q65_token_entropy",
    operators=("TXT2", "A10", "P11"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
s AS (SELECT doc_id, list_sort(t) AS s, len(t) AS n FROM tl WHERE len(t) > 0),
st AS (
  SELECT doc_id, s, n,
         list_filter(range(1, n + 1),
                     i -> CASE WHEN i = 1 THEN TRUE ELSE s[i] <> s[i-1] END)
           AS starts
  FROM s
), c AS (
  SELECT doc_id, n, len(starts) AS nd,
         list_transform(range(1, len(starts) + 1),
           j -> list_append(starts, n + 1)[j + 1]
                - list_append(starts, n + 1)[j]) AS counts
  FROM st
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(nd AS BIGINT) AS n_distinct,
       round(ln(n) - list_sum(list_transform(counts, c -> c * ln(c))) / n, 6)
         AS entropy,
       round(nd / CAST(n AS DOUBLE), 6) AS ttr
FROM c
""",
)
def q65_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram (token) Shannon entropy + type-token ratio per document — the
    lexical-diversity quality signal (low entropy = templated / repetitive
    text) used alongside the Gopher repetition rules in corpus filtering.

    Entropy is computed ROW-LOCALLY with zero shuffles: sort the token
    array, find run boundaries with an index-filter HOF, difference
    consecutive boundaries into run counts, then fold
    ``ln(n) - sum(c*ln(c))/n`` — algebraically identical to
    ``-sum(p*ln(p))`` but with one division.  The naive implementation
    (explode tokens -> groupBy (doc, token) -> count -> entropy agg) ships
    every TOKEN through two corpus-scale shuffles; this one ships nothing
    — per-row O(L log L) sort inside whole-stage codegen, so at 100 TB it
    is a map-only scan bounded by parquet read bandwidth.

    Each intermediate (sorted array, run starts, extended boundary array)
    is staged as a bound column in its own projection: Catalyst cannot CSE
    inside lambda bodies, so inline expressions would re-sort per index
    probe (the q59/q62 discipline).
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    st = with_lexical_stats(tl, "t")
    return st.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.size("starts").cast("long").alias("n_distinct"),
        F.round("entropy", 6).alias("entropy"),
        F.round(F.size("starts").cast("double") / F.col("n"), 6).alias("ttr"),
    )


# --------------------------------------------------------------------------- #
# q66 — cross-source span containment (mirror / syndication detection)        #
# --------------------------------------------------------------------------- #

@register(
    "q66_source_overlap",
    operators=("DD1", "A12", "U3"),
    oracle=f"""
WITH tl AS (SELECT doc_id, source, {_DUCK_TOKS} AS t FROM documents),
th AS (SELECT doc_id, source, {_DUCK_TOK_HASHES} AS hs FROM tl
       WHERE len(t) >= {_SPAN_N}),
spans AS (
  SELECT DISTINCT source,
         {_duck_span_fold(_SPAN_N)} AS h
  FROM th, unnest(range(1, len(hs) - {_SPAN_N} + 2)) AS r(i)
),
per AS (SELECT source, count(*) AS ns FROM spans GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
  FROM spans a JOIN spans b USING (h)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(shared AS BIGINT) AS shared_spans,
       round(shared / CAST(least(pa.ns, pb.ns) AS DOUBLE), 6) AS containment
FROM pairs
JOIN per pa ON pa.source = pairs.source_a
JOIN per pb ON pb.source = pairs.source_b
""",
)
def q66_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source span containment — for every pair of sources, how many
    distinct {n}-token spans they share, normalized by the smaller side's
    span inventory.  This is the mirror-site / syndicated-boilerplate
    detector a web-corpus build runs at the DOMAIN level (RefinedWeb /
    CCNet lineage): a pair with high containment means one source largely
    republishes the other and should be collapsed before document-level
    dedup.

    Scale shape: the oracle's self-join on span hash is NOT what runs here
    — a hot span (a footer shared by every domain) would make the join
    output quadratic in its occurrence count.  Instead spans collapse to
    ``(h, sorted set of sources)`` with one keyed shuffle carrying BIGINT
    hashes; pair expansion happens ROW-LOCALLY over that bounded set
    (fan-out per span is C(k,2) in DISTINCT sources, not occurrences), and
    the pair counts partial-aggregate map-side.  With an open-domain corpus
    (millions of domains) a single universal span still bounds k at the
    domain count; the guard for that regime is dropping spans above a
    source-count ceiling — they carry no pair signal — exactly the q55
    degenerate-bucket discipline.  The per-source span inventory broadcasts
    (one row per source) onto the pair table.
    """
    d = _t(spark, sf_dir, "documents")
    n = _SPAN_N
    th = (
        d.select("source", tokenize(F.col("text")).alias("t"))
        .filter(F.size("t") >= n)
        .select("source", token_hashes("t").alias("hs"))
    )
    spans = (
        th.select(
            "source",
            _span_hash_col(n),
        )
    )
    # ONE corpus-scale shuffle: collect_set dedups (source, h) occurrences
    # map-side, so no separate distinct() exchange is needed.  The collapsed
    # table (one row per distinct span) is what persists — bounded by the
    # span vocabulary, not the corpus — and feeds both consumers below.
    bysrc = (
        spans.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .persist()
    )
    # per-source distinct-span inventory, derived from the collapsed table:
    # row-local explode of bounded source sets + a sources-sized aggregate
    per = bysrc.select(F.explode("ss").alias("source")).groupBy("source").agg(
        F.count(F.lit(1)).alias("ns")
    )
    pairs = (
        bysrc.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(ss) - 1), i -> "
                    "transform(sequence(i + 1, size(ss)), j -> "
                    "struct(ss[i-1] AS a, ss[j-1] AS b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
    )
    agg = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("shared_spans")
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("ns").alias("na"))
    pb = per.select(F.col("source").alias("source_b"), F.col("ns").alias("nb"))
    return (
        agg.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_spans",
            F.round(
                F.col("shared_spans")
                / F.least("na", "nb").cast("double"),
                6,
            ).alias("containment"),
        )
    )


# --------------------------------------------------------------------------- #
# q67 — epoch-wise deterministic shuffle into training batches                 #
# --------------------------------------------------------------------------- #

_EPOCHS, _N_BATCHES = 3, 16
_CHK_MOD = 99991  # small prime: per-doc terms stay < 1e5 so BIGINT sums
                  # cannot overflow on either engine at any corpus size

@register(
    "q67_epoch_batches",
    operators=("A4", "U2", "TXT4"),
    oracle=f"""
WITH tl AS (SELECT doc_id, len({_DUCK_TOKS}) AS n FROM documents),
sh AS (
  SELECT epoch, doc_id, n,
         (doc_id * (1000003 + epoch * 7919) + epoch * 104729)
           % {HASH_MOD} AS h
  FROM tl, unnest([1, 2, 3]) AS e(epoch)
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       CAST(h % {_N_BATCHES} AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(h % {_CHK_MOD}) % {_CHK_MOD} AS BIGINT) AS order_checksum
FROM sh GROUP BY 1, 2
""",
)
def q67_epoch_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-wise deterministic shuffling into training batches — the data-
    ordering step of a multi-epoch pre-training run: each epoch permutes
    the corpus with its own keyed hash (so no two epochs present documents
    in the same order), documents land in ``h mod {nb}`` batches, and the
    job emits per-(epoch, batch) document/token counts plus a modular
    checksum that makes the assignment reproducible across runs and
    engines.

    Scale shape: the epoch fan-out is a row-local ``explode`` of a
    3-element literal array (rows multiply BEFORE any exchange), the hash /
    batch assignment is pure codegen arithmetic, and the only shuffle
    carries {e}x{nb} groups of partial-aggregated longs — there is no
    global sort and no window anywhere: a rank-based shuffle would funnel
    each epoch through ordered reducers, while hash-bucketing gives the
    same statistical guarantee (disjoint cover, epoch-decorrelated order)
    embarrassingly parallel.  The checksum folds ``h mod {m}`` so partial
    sums fit a BIGINT at any corpus size on both engines (DuckDB promotes
    to HUGEINT, Spark would wrap — keeping terms small sidesteps the
    divergence).
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", F.size(tokenize(F.col("text"))).alias("n"))
    sh = tl.select(
        "doc_id",
        "n",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("epoch"),
    ).withColumn(
        "h",
        (
            F.col("doc_id") * (F.lit(1000003) + F.col("epoch") * 7919)
            + F.col("epoch") * 104729
        )
        % HASH_MOD,
    )
    return sh.groupBy(
        F.col("epoch").cast("long").alias("epoch"),
        (F.col("h") % _N_BATCHES).cast("long").alias("batch_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        (F.sum(F.col("h") % _CHK_MOD) % _CHK_MOD).cast("long")
            .alias("order_checksum"),
    )


# --------------------------------------------------------------------------- #
# q69 — tf-idf keyword extraction (skew-routed dictionary join + local top-k)  #
# --------------------------------------------------------------------------- #

_TFIDF_K = 3

@register(
    "q69_tfidf_keywords",
    operators=("A12", "J2", "O2", "TXT4"),
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
w AS (SELECT doc_id, tok AS term FROM tl, unnest(t) AS u(tok)),
tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS nd FROM documents),
scored AS (
  SELECT doc_id, term, tf * ln(nd / df) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, round(score, 6) AS score
FROM ranked WHERE rank <= {_TFIDF_K}
""",
)
def q69_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tf-idf keyword extraction (top-{k} terms) — the
    classic corpus-statistics feature every search / labeling / topic
    pipeline derives: term frequency per document x inverse document
    frequency over the corpus.

    Scale shape: (1) term counts shuffle once keyed (doc, term) with
    map-side partial aggregation; (2) document frequencies reduce that
    table to vocabulary size; (3) the tf x idf join is Zipf-skewed by
    construction — stopwords hit every document — so it routes through
    ``hot_cold_dict_join`` (the q58 discipline: top-k hot terms broadcast
    and resolve map-side, the tail shuffles without skew); (4) per-doc
    top-k is a ROW-LOCAL sort+slice over each document's own (term, score)
    list after one keyed aggregation — never a corpus-wide rank window
    (a document's distinct-term count is bounded by its length, so the
    collected list is bounded).  The corpus size joins as a broadcast
    1-row scalar, not a driver-side collect.
    """
    from cosmo_spark.operators.skew import hot_cold_dict_join

    d = _t(spark, sf_dir, "documents")
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    words = tl.select("doc_id", F.explode("t").alias("term"))
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # persist: consumed by dfq (vocabulary agg) AND as the fact side of the
    # hot/cold join (which itself probes it twice: hot semi, cold anti)
    tf = tf.persist()
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_dim = dfq.crossJoin(F.broadcast(nd)).select(
        "term", "df", F.log(F.col("nd").cast("double") / F.col("df")).alias("idf")
    )
    scored = hot_cold_dict_join(tf, idf_dim, on="term", freq_col="df").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("score")
    )
    top = scored.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("ns"),
                        F.col("term").alias("term"),
                        F.col("score").alias("score"),
                    )
                )
            ),
            1,
            _TFIDF_K,
        ).alias("top")
    )
    return top.select(
        "doc_id", F.posexplode("top").alias("r", "s")
    ).select(
        "doc_id",
        (F.col("r") + 1).cast("long").alias("rank"),
        F.col("s.term").alias("term"),
        F.round("s.score", 6).alias("score"),
    )


# --------------------------------------------------------------------------- #
# q70 — end-to-end corpus build (dedup -> quality -> decontam -> sample)       #
# --------------------------------------------------------------------------- #

_Q70_SAMPLE_PCT = 50

@register(
    "q70_corpus_build",
    operators=("DD1", "P2", "J3", "A4", "U2"),
    oracle=f"""
WITH norm AS (
  SELECT doc_id, source, lang, {_DUCK_TOKS} AS t,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text
  FROM documents
), hashed AS (
  SELECT doc_id, source, lang, t, len(t) AS n,
         {_DUCK_POLY.replace('{X}', 'norm_text')} AS th,
         length(norm_text) AS tl_len,
         {_DUCK_TOK_HASHES} AS hs
  FROM norm
), grams AS (
  SELECT doc_id,
         ((hs[i] * {_GRAM_BASE} + hs[i+1]) % {_GRAM_MOD} * {_GRAM_BASE}
           + hs[i+2]) % {_GRAM_MOD} AS h
  FROM hashed, unnest(range(1, greatest(len(hs) - 1, 1))) AS r(i)
), ev AS (SELECT DISTINCT h FROM grams WHERE doc_id % 97 = 0),
contam AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN ev USING (h)
  WHERE g.doc_id % 97 <> 0
), train AS (SELECT * FROM hashed WHERE doc_id % 97 <> 0),
winners AS (
  SELECT th, tl_len, min(doc_id) AS win_id FROM train GROUP BY th, tl_len
), flags AS (
  SELECT tr.doc_id, tr.source, tr.n,
         tr.doc_id = w.win_id AS is_win,
         tr.lang = 'en' AND tr.n BETWEEN 30 AND 1000
           AND (CASE WHEN tr.n > 0 THEN
                 list_sum(list_transform(tr.t, x -> CAST(length(x) AS DOUBLE)))
                   / tr.n END) BETWEEN 3 AND 10
           AND (CASE WHEN tr.n > 0 THEN
                 len(list_filter(tr.t, x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))
                   / CAST(tr.n AS DOUBLE) END) >= 0.05
           AND (CASE WHEN tr.n > 0 THEN
                 1.0 - CAST(len(list_distinct(tr.t)) AS DOUBLE) / tr.n END)
               < 0.5 AS qual,
         c.doc_id IS NOT NULL AS contam,
         tr.th % 100 < {_Q70_SAMPLE_PCT} AS samp
  FROM train tr
  JOIN winners w ON tr.th = w.th AND tr.tl_len = w.tl_len
  LEFT JOIN contam c ON tr.doc_id = c.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN is_win THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN is_win AND coalesce(qual, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN is_win AND coalesce(qual, FALSE) AND NOT contam
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(sum(CASE WHEN is_win AND coalesce(qual, FALSE) AND NOT contam
                     AND samp THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN is_win AND coalesce(qual, FALSE) AND NOT contam
                     AND samp THEN n ELSE 0 END) AS BIGINT) AS tokens_sampled
FROM flags GROUP BY source
""",
)
def q70_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pre-training corpus build as ONE query — the composition
    every stage of this catalog exists for: exact dedup (q20's normalized
    hash, min-id winner), quality gate (q60's Gopher cascade), benchmark
    decontamination (q59's 3-gram overlap against the held-out split),
    and deterministic content-hash sampling (q46's discipline), reported
    as a per-source funnel of document and token counts.

    Scale shape: per-document signals (normalized hash, token hashes,
    quality flags, sample bucket) are computed in one pass over the corpus
    and persisted WITHOUT the raw text (the shuffle-facing frame carries
    hashes, booleans, and counts only — at 100 TB you would checkpoint
    this compact frame to parquet instead).  Four keyed exchanges follow,
    none carrying text: (1) winner-per-(hash, len) aggregate, (2) the
    winner join back (same key — ReuseExchange collapses the pair),
    (3) the gram-overlap semi-join against the BROADCAST eval gram set
    with its distinct-doc collapse, (4) the contamination flag join keyed
    doc_id.  The funnel itself is conditional sums partial-aggregated to
    one row per source.  Stage ordering (dedup -> quality -> decontam ->
    sample) is encoded in the nesting of the conditions, not in separate
    passes — adding a stage costs one conditional sum.
    """
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source", "lang",
        tokenize(F.col("text")).alias("t"),
        normalize_text(F.col("text")).alias("norm"),
    )
    base = base.select(
        "doc_id", "source", "lang", "t",
        poly_hash(F.col("norm")).alias("th"),
        F.length("norm").alias("tl_len"),
    )
    base = base.withColumn("hs", token_hashes("t")).withColumn(
        "n", F.size("t")
    )
    n = F.col("n")
    mtl = F.when(
        n > 0,
        F.aggregate(
            F.transform("t", lambda x: F.length(x).cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        ) / n,
    )
    swr = stopword_ratio(F.col("t"), STOPWORDS["en"])
    dwf = F.when(n > 0, 1.0 - F.size(F.array_distinct("t")).cast("double") / n)
    qual = (
        (F.col("lang") == "en") & n.between(30, 1000) & mtl.between(3, 10)
        & (swr >= 0.05) & (dwf < 0.5)
    )
    # compact fact frame: hashes/booleans/counts only — no text, no arrays
    facts = base.select(
        "doc_id", "source", "th", "tl_len", "n",
        F.coalesce(qual, F.lit(False)).alias("qual"),
        (F.col("th") % 100 < _Q70_SAMPLE_PCT).alias("samp"),
    ).filter(F.col("doc_id") % 97 != 0).persist()
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("hs") >= 3,
                F.expr(
                    f"transform(sequence(0, size(hs) - 3), i -> "
                    f"((hs[i] * {_GRAM_BASE} + hs[i+1]) % {_GRAM_MOD} "
                    f"* {_GRAM_BASE} + hs[i+2]) % {_GRAM_MOD})"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("h"),
    )
    ev = grams.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    contam = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(True))
    )
    winners = facts.groupBy("th", "tl_len").agg(
        F.min("doc_id").alias("win_id")
    )
    flags = (
        facts.join(winners, ["th", "tl_len"])
        .join(contam, "doc_id", "left")
        .withColumn("is_win", F.col("doc_id") == F.col("win_id"))
        .withColumn("contam", F.coalesce(F.col("contam"), F.lit(False)))
    )
    keep_u = F.col("is_win")
    keep_q = keep_u & F.col("qual")
    keep_c = keep_q & ~F.col("contam")
    keep_s = keep_c & F.col("samp")
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_train"),
        F.sum(F.when(keep_u, 1).otherwise(0)).cast("long").alias("n_unique"),
        F.sum(F.when(keep_q, 1).otherwise(0)).cast("long").alias("n_quality"),
        F.sum(F.when(keep_c, 1).otherwise(0)).cast("long").alias("n_clean"),
        F.sum(F.when(keep_s, 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.sum(F.when(keep_s, F.col("n")).otherwise(0)).cast("long")
            .alias("tokens_sampled"),
    )


# --------------------------------------------------------------------------- #
# q71 — bloom-prefiltered decontamination (the beyond-broadcast scale path)    #
# --------------------------------------------------------------------------- #

from cosmo_spark.queries import REGISTRY as _REGISTRY

@register(
    "q71_bloom_decontaminate",
    operators=("J3", "A12", "TXT5"),
    # byte-identical contract to q59: the bloom prefilter has no false
    # negatives and survivors are re-checked exactly, so the same oracle
    # must hash-match — that equivalence IS what this query verifies
    oracle=_REGISTRY["q59_decontaminate"].oracle,
)
def q71_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q59's benchmark decontamination re-planned for the regime where the
    eval gram set is too large to broadcast: a Bloom BITSET of the eval
    grams broadcasts instead (fixed m/8 bytes however many members),
    non-matching training grams drop map-side, and only the surviving
    sliver pays an exact shuffle semi-join (operators/bloom.py).

    Results are identical to q59 — no false negatives, false positives
    killed by the exact re-check — which is why this query shares q59's
    oracle verbatim: the correctness gate proves the scale path equals the
    broadcast path.  At sf0.01 the bitset is overkill; at a benchmark
    suite of 10^8 grams it is the only shape that still works.
    """
    d = _t(spark, sf_dir, "documents")
    tl = d.select("doc_id", tokenize(F.col("text")).alias("t"))
    th = tl.select("doc_id", token_hashes("t").alias("hs"))
    grams = th.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("hs") >= 3,
                F.expr(
                    f"transform(sequence(0, size(hs) - 3), i -> "
                    f"((hs[i] * {_GRAM_BASE} + hs[i+1]) % {_GRAM_MOD} "
                    f"* {_GRAM_BASE} + hs[i+2]) % {_GRAM_MOD})"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("h"),
    )
    ev = grams.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    tr = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "h").distinct()
    )
    from cosmo_spark.operators.bloom import bloom_semi_join

    return (
        bloom_semi_join(tr, ev, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


# --------------------------------------------------------------------------- #
# q72 — leakage-audited train/val/test split (group-aware by source)           #
# --------------------------------------------------------------------------- #

@register(
    "q72_split_leakage",
    operators=("A4", "A12", "U3", "P11"),
    oracle=f"""
WITH tl AS (
  SELECT doc_id, source,
         CASE ({_DUCK_POLY.replace('{X}', 'source')}) % 10
           WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split,
         {_DUCK_TOKS} AS t
  FROM documents
), stats AS (
  SELECT split, count(DISTINCT source) AS n_sources,
         count(*) AS n_docs, sum(len(t)) AS n_tokens
  FROM tl GROUP BY split
), th AS (
  SELECT doc_id, split, {_DUCK_TOK_HASHES} AS hs FROM tl
  WHERE len(t) >= {_SPAN_N}
), spans AS (
  SELECT DISTINCT split,
         {_duck_span_fold(_SPAN_N)} AS h
  FROM th, unnest(range(1, len(hs) - {_SPAN_N} + 2)) AS r(i)
), multi AS (
  SELECT h FROM spans GROUP BY h HAVING count(*) >= 2
), leak AS (
  SELECT split, count(*) AS leaked_spans
  FROM spans JOIN multi USING (h) GROUP BY split
)
SELECT stats.split AS split,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(leaked_spans, 0) AS BIGINT) AS leaked_spans
FROM stats LEFT JOIN leak ON stats.split = leak.split
""",
)
def q72_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test splitting with a leakage audit — the
    split is assigned at the SOURCE level (hash of the domain, so near-dups
    within one domain can never straddle splits: the leakage mode document-
    level random splits are famous for), and the audit counts, per split,
    the distinct 16-token spans that also occur in ANOTHER split — the
    residual cross-domain contamination a held-out set still carries.

    Scale shape: split assignment is a row-local hash (no data moves to
    decide membership — any worker can re-derive it, which is what makes
    the split reproducible across runs and engines).  The audit reuses the
    q66 discipline: spans collapse once to (h, split set) via map-side
    collect_set — 3 splits bound the set — and per-split leak counts are a
    row-local explode of the multi-split rows.  Stats and audit are two
    aggregates joined on a 3-row table.
    """
    d = _t(spark, sf_dir, "documents")
    n = _SPAN_N
    split = F.when(
        poly_hash(F.col("source")) % 10 == 0, F.lit("val")
    ).when(
        poly_hash(F.col("source")) % 10 == 1, F.lit("test")
    ).otherwise(F.lit("train"))
    tl = d.select(
        "doc_id", "source", split.alias("split"),
        tokenize(F.col("text")).alias("t"),
    )
    stats = tl.groupBy("split").agg(
        F.countDistinct("source").alias("n_sources"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).alias("n_tokens"),
    )
    th = tl.filter(F.size("t") >= n).select(
        "split", token_hashes("t").alias("hs")
    )
    spans = th.select(
        "split",
        _span_hash_col(n),
    )
    byspan = spans.groupBy("h").agg(
        F.collect_set("split").alias("ss")
    )
    leak = (
        byspan.filter(F.size("ss") >= 2)
        .select(F.explode("ss").alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("leaked_spans"))
    )
    return stats.join(F.broadcast(leak), "split", "left").select(
        "split",
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("leaked_spans", F.lit(0)).cast("long").alias("leaked_spans"),
    )


# --------------------------------------------------------------------------- #
# q73 — streaming quality-filter funnel (incremental corpus acceptance gate)   #
# --------------------------------------------------------------------------- #

@register(
    "q73_stream_quality_funnel",
    operators=("ST1", "ST4", "TXT2", "A4"),
    # shares q60's oracle verbatim: the availableNow stream over the same
    # table must converge to exactly the batch funnel — the gate proves the
    # incremental plan equals the batch plan
    oracle=_REGISTRY["q60_filter_funnel"].oracle,
)
def q73_stream_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q60 quality cascade run as a REAL Structured Streaming job — the
    acceptance gate of an incremental corpus build, where documents arrive
    continuously and the funnel report must stay current without
    re-scanning history: availableNow file stream over the documents table
    -> the SAME per-document signal expressions and conditional sums
    (_gopher_funnel_agg — one shared implementation, not a streaming
    rewrite) as a streaming global aggregate in complete mode -> memory
    sink, unpivoted to the 5-stage funnel.

    Scale shape: the streaming aggregate keeps 6 longs of state TOTAL
    (cumulative conditional sums are associative), each micro-batch adds
    its partial sums map-side — state size is O(1) in corpus size, no
    watermark needed because there is no keyed window.  At scale the
    memory sink becomes a Delta table the dashboard reads; the plan is
    unchanged.
    """
    tune_session(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tl = stream.select("lang", tokenize(F.col("text")).alias("t"))
    agg = _gopher_funnel_agg(tl)
    sink = "q73_stream_funnel_sink"
    spark.catalog.dropTempView(sink)
    query = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    return _funnel_rows(spark.table(sink))


# --------------------------------------------------------------------------- #
# q74 — sequence packing (concatenate-and-cut into fixed context windows)      #
# --------------------------------------------------------------------------- #

_PACK_W = 256  # context-window length in tokens

@register(
    "q74_pack_sequences",
    operators=("W2", "O1", "TXT4"),
    oracle=f"""
WITH tl AS (
  SELECT doc_id, len({_DUCK_TOKS}) AS n,
         {_DUCK_POLY.replace('{X}', 'text')} AS h
  FROM documents
), ord AS (
  SELECT doc_id, n, h,
         sum(n) OVER (ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n AS start
  FROM tl WHERE n > 0
)
SELECT doc_id, CAST(start AS BIGINT) AS start,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(start // {_PACK_W} AS BIGINT) AS first_win,
       CAST((start + n - 1) // {_PACK_W} AS BIGINT) AS last_win
FROM ord
""",
)
def q74_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — concatenate documents in deterministic
    content-hash order and cut the token stream into fixed {w}-token
    context windows (the GPT-style packing every pre-training data loader
    performs): each document gets its global token offset and the window
    range it lands in, so any worker can materialize any training sequence
    independently.

    Scale shape: the global running total is NOT a single-reducer ORDER BY
    window (the oracle's form) — it is ``bucketed_prefix_sum``
    (operators/prefix.py): the uniform content hash makes bucket
    boundaries static, per-bucket totals reduce the corpus to 1024 rows,
    the driver-sized bucket-offset window runs over those, and the
    within-bucket cumsum is parallel across buckets — identical values,
    bounded reducers.  Window ids are integer arithmetic on the offsets:
    exact cross-engine parity, no floats anywhere.
    """
    from cosmo_spark.operators.prefix import bucketed_prefix_sum

    d = _t(spark, sf_dir, "documents")
    tl = d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).alias("n"),
        poly_hash(F.col("text")).alias("h"),
    ).filter(F.col("n") > 0)
    packed = bucketed_prefix_sum(
        tl, key_col="h", value_col="n", tiebreak_cols=["doc_id"],
        out_col="start", key_mod=HASH_MOD,
    )
    return packed.select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("n").cast("long").alias("n_tokens"),
        F.expr(f"start div {_PACK_W}").cast("long").alias("first_win"),
        F.expr(f"(start + n - 1) div {_PACK_W}").cast("long").alias("last_win"),
    )


# --------------------------------------------------------------------------- #
# q97 / q144 — BPE tokenizer training (learn merges) + application            #
# --------------------------------------------------------------------------- #

def _q97_oracle() -> str:
    # full greedy-training REPLAY in unrolled SQL: the oracle learns the
    # same rules the Spark trainer learns (count pairs -> argmax with the
    # identical (cnt DESC, a, b) tie-break -> apply) and reports the final
    # vocabulary, so parity proves the trainer itself — independent of the
    # seed cache and of Spark/oracle execution order
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import BPE_N_MERGES

    ctes, final, _ = duck_bpe_train_ctes(_DUCK_TOKS, BPE_N_MERGES)
    return f"""
WITH {", ".join(ctes)},
sym AS (
  SELECT unnest(w) AS symbol, freq FROM {final}
), agg AS (
  SELECT symbol, CAST(sum(freq) AS BIGINT) AS cnt FROM sym GROUP BY symbol
), ranked AS (
  SELECT symbol, cnt, row_number() OVER (ORDER BY cnt DESC, symbol) AS rank
  FROM agg
)
SELECT symbol, cnt, rank FROM ranked WHERE rank <= 20
"""


@register("q97_bpe_apply", operators=("TXT3", "A8"), oracle=_q97_oracle())
def q97_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply LEARNED BPE merges — tokenizer training end-to-end: the rule
    list comes from the distributed trainer (operators/train.
    train_bpe_merges) resolved through the fingerprint-keyed seed cache
    (queries/bpe_artifacts — committed rules on the test corpora, live
    training on anything else; the q44/q105 artifact discipline), then
    each word's character sequence runs through the merges in learned
    order, where one rule pass is the greedy leftmost non-overlapping
    merge (a run of overlapping candidates — only possible for a
    self-pair like 'aa' — merges at odd offsets from the run start, the
    textbook BPE behavior).  The resulting symbol vocabulary reports its
    top-20 by corpus-weighted frequency.  The oracle replays the whole
    training loop in unrolled SQL, so a wrong seed or a drifting trainer
    is a red parity row, not a silently-consistent pair.

    Scale shape: merges run over the WORD-FREQUENCY table (the q76
    Heaps-law trick — per-character work scales with the vocabulary, not
    the corpus); per-word cost is O(L²) on words of bounded length.  The
    only shuffles carry (word, freq) and (symbol, count) pairs.
    """
    from cosmo_spark.functions.bpe import bpe_segment_words
    from cosmo_spark.queries.bpe_artifacts import resolve_bpe_merges

    rules = resolve_bpe_merges(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(tokenize(F.col("text"))).alias("word"))
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    # one-job vocabulary segmentation (bpe_segment_words) instead of one
    # chained expression pass per rule — same greedy sequential-pass
    # semantics (equivalence unit-gated), but rule-table-size-independent
    # job count, which is what lets BPE_N_MERGES rise past demo scale
    cur = wf.join(bpe_segment_words(wf, rules), "word")
    from pyspark.sql.window import Window as _W

    sym = cur.select(F.explode("w").alias("symbol"), "freq")
    agg = sym.groupBy("symbol").agg(F.sum("freq").alias("cnt"))
    top = agg.orderBy(F.desc("cnt"), "symbol").limit(20)
    w_rank = _W.orderBy(F.desc("cnt"), "symbol")
    return top.withColumn("rank", F.row_number().over(w_rank).cast("long"))


def _q144_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import BPE_N_MERGES

    ctes, _final, bests = duck_bpe_train_ctes(_DUCK_TOKS, BPE_N_MERGES)
    unions = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, a AS lhs, b AS rhs, "
        f"(a || b) AS merged, cnt FROM {bname}"
        for k, bname in enumerate(bests, start=1)
    )
    return f"WITH {', '.join(ctes)} SELECT rank, lhs, rhs, merged, cnt FROM ({unions}) ORDER BY rank"


@register("q144_bpe_train", operators=("TXT3",), oracle=_q144_oracle())
def q144_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE tokenizer's merge table — the learning half that q97
    consumes: greedy pair-count/argmax/merge iterations over the corpus
    word-frequency table (operators/train.train_bpe_merges), resolved
    through the seed cache so known corpora pay zero training cost.
    Returns the ordered rule list (rank, lhs, rhs, merged, cnt); the
    DuckDB oracle replays the identical greedy loop in unrolled SQL
    (functions/bpe.duck_bpe_train_ctes), so every learned rule AND its
    winning pair count hash-match cross-engine.

    Scale shape: one corpus-sized word count, then vocabulary-sized
    iterations; the only driver-side rows are the one argmax row per
    iteration and the K-row result itself.
    """
    from cosmo_spark.queries.bpe_artifacts import resolve_bpe_merges

    rules = resolve_bpe_merges(spark, sf_dir)
    rows = [(k, a, b, a + b, int(cnt))
            for k, (a, b, cnt) in enumerate(rules, start=1)]
    return spark.createDataFrame(
        rows, "rank LONG, lhs STRING, rhs STRING, merged STRING, cnt LONG"
    )


def _q148_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import BPE_N_MERGES

    ctes, final, _ = duck_bpe_train_ctes(_DUCK_TOKS, BPE_N_MERGES)
    return f"""
WITH {", ".join(ctes)},
tok AS (
  SELECT word, CAST(len(w) AS BIGINT) AS n_sym FROM {final}
), dt AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS word FROM documents
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_tokens
FROM dt JOIN tok USING (word)
GROUP BY doc_id
"""


@register("q148_bpe_tokenize", operators=("TXT3", "A11"),
          oracle=_q148_oracle())
def q148_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus under the LEARNED merges — the token-budget
    query every pre-training pipeline runs before packing (q74) or
    mixing (q63): per document, word count and the token count a
    BPE tokenizer trained on THIS corpus (q144's rules, resolved through
    the seed cache) would produce.  Completes the tokenizer story:
    q144 learns the merges, q97 inspects the vocabulary they induce,
    q148 prices the corpus in learned tokens.  The oracle replays
    training AND applies the learned segmentation per word, keyed by the
    carried word string.

    Scale shape: the merge passes run over the DISTINCT-word vocabulary
    (Heaps-law-sized), the per-word token cost broadcasts back to the
    corpus (a few bytes per vocabulary entry — fits comfortably even at
    web scale; shuffle-join on word is the fallback when it does not),
    and the only corpus-wide work is one tokenize + one per-doc sum.
    """
    from cosmo_spark.functions.bpe import learned_token_costs
    from cosmo_spark.queries.bpe_artifacts import resolve_bpe_merges

    rules = resolve_bpe_merges(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    tok = learned_token_costs(words, rules)
    return words.join(F.broadcast(tok), "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").alias("n_tokens"),
    )


def _q155_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import BPE_PROD_ORACLE_N

    ctes, _final, bests = duck_bpe_train_ctes(_DUCK_TOKS, BPE_PROD_ORACLE_N)
    unions = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, a AS lhs, b AS rhs, "
        f"(a || b) AS merged, cnt FROM {bname}"
        for k, bname in enumerate(bests, start=1)
    )
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT rank, lhs, rhs, merged, cnt FROM ({unions}) ORDER BY rank"
    )


@register("q155_bpe_train_full", operators=("TXT3",), oracle=_q155_oracle())
def q155_bpe_train_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a PRODUCTION-budget BPE merge table (round-9 verdict #1/#6):
    the full rule ladder under a ``BPE_PROD_N_MERGES`` (1024) budget —
    on the driver corpora that means training to PAIR EXHAUSTION (~89
    rules; the synthetic vocabulary is 31 words), the corpus's complete
    merge history rather than q144's 16-rule demo prefix.

    The hybrid trainer (operators/train.train_bpe_merges_hybrid) is what
    makes the budget affordable: ONE distributed word-frequency pass,
    then the greedy loop driver-side over the Heaps-law-bounded
    vocabulary under an explicit memory cap (1M words / 16M chars;
    over-cap corpora fall back to the distributed per-merge loop).  2000
    merges over a 30k-word vocabulary run in ~2 s driver-side where the
    one-Spark-job-per-merge loop would need ~6000 jobs.

    The DuckDB oracle replays the ENTIRE greedy loop from the raw corpus
    — 112 unrolled MATERIALIZED merge levels, comfortably past the
    sf0.01 exhaustion point; the LEFT-JOIN identity passes make
    post-exhaustion ranks empty, matching the trainer's early stop — so
    every learned rule AND its winning pair count hash-match
    cross-engine with no circularity through the rule cache.
    """
    from cosmo_spark.queries.bpe_artifacts import resolve_bpe_merges_prod

    rules = resolve_bpe_merges_prod(spark, sf_dir)
    rows = [(k, a, b, a + b, int(cnt))
            for k, (a, b, cnt) in enumerate(rules, start=1)]
    return spark.createDataFrame(
        rows, "rank LONG, lhs STRING, rhs STRING, merged STRING, cnt LONG"
    )


def _q156_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import BPE_PROD_ORACLE_N

    ctes, final, _bests = duck_bpe_train_ctes(_DUCK_TOKS, BPE_PROD_ORACLE_N)
    return f"""
WITH {", ".join(ctes)},
tok AS (
  SELECT word, CAST(len(w) AS BIGINT) AS n_sym FROM {final}
), dt AS (
  SELECT doc_id, source, unnest({_DUCK_TOKS}) AS word FROM documents
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_tokens
FROM dt JOIN tok USING (word)
GROUP BY source
"""


@register("q156_bpe_tokenize_full", operators=("TXT3", "A11"),
          oracle=_q156_oracle())
def q156_bpe_tokenize_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price the corpus per SOURCE under the production tokenizer — the
    token-budget roll-up a pre-training data plan runs per provider:
    q155's fully-trained (exhaustion-budget) merge table applied to
    every document, aggregated to (source, n_docs, n_words, n_tokens).

    The apply side is the production shape end-to-end: the whole rule
    table (any size) ships ONCE inside the ``bpe_segment_words``
    mapInPandas closure, segmentation runs as one Arrow-batched pass
    over the DISTINCT-word vocabulary, and only (word, n_sym) pairs — a
    few bytes per vocabulary entry — broadcast back to the corpus.  The
    corpus is touched exactly twice (tokenize, per-source sum); job
    count is independent of merge count.

    The oracle replays training to exhaustion AND the final segmentation
    from the raw corpus (112 materialized merge levels), so the learned
    token prices hash-match cross-engine with no cache circularity.
    """
    from cosmo_spark.functions.bpe import learned_token_costs
    from cosmo_spark.queries.bpe_artifacts import resolve_bpe_merges_prod

    rules = resolve_bpe_merges_prod(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "source", F.explode(tokenize(F.col("text"))).alias("word")
    )
    tok = learned_token_costs(words, rules)
    return words.join(F.broadcast(tok), "word").groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").alias("n_tokens"),
    )


# --------------------------------------------------------------------------- #
# q99 — Gopher/C4-style composite quality-rule filter                          #
# --------------------------------------------------------------------------- #

#: Gopher rule paper's stop-word presence check (Rae et al. 2021 §A1.1);
#: 'a' added because the synthetic corpus is lowercase word-soup
_Q99_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")

_Q99_ORACLE = f"""
WITH tl AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks,
         list_filter(string_split(text, chr(10)), l -> l <> '') AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CASE WHEN toks IS NULL THEN NULL
              ELSE coalesce(list_sum(list_transform(toks, t -> len(t))), 0)
         END AS word_chars,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha_words,
         len(list_intersect(list_distinct(toks),
             {list(_Q99_STOPS)!r})) AS n_stop_distinct,
         len(text) - len(replace(text, '#', ''))
           + len(text) - len(replace(text, '…', '')) AS n_symbols,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%'
                                   OR l LIKE '•%')) AS n_bullet_lines,
         len(list_filter(lines, l -> l LIKE '%...')) AS n_ellipsis_lines
  FROM tl
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(word_chars AS BIGINT) AS word_chars,
       (n_words BETWEEN 20 AND 100000) AS r_count,
       (3 * n_words <= word_chars AND word_chars <= 10 * n_words) AS r_mean_len,
       (10 * n_alpha_words >= 8 * n_words) AS r_alpha,
       (n_stop_distinct >= 2) AS r_stop,
       (10 * n_symbols <= n_words) AS r_symbol,
       (10 * n_bullet_lines <= 9 * n_lines) AS r_bullet,
       (10 * n_ellipsis_lines <= 3 * n_lines) AS r_ellipsis,
       ((n_words BETWEEN 20 AND 100000)
        AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
        AND (10 * n_alpha_words >= 8 * n_words)
        AND (n_stop_distinct >= 2)
        AND (10 * n_symbols <= n_words)
        AND (10 * n_bullet_lines <= 9 * n_lines)
        AND (10 * n_ellipsis_lines <= 3 * n_lines)) AS keep
FROM m
"""


@register("q99_gopher_quality_filter", operators=("TXT2",), oracle=_Q99_ORACLE)
def q99_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style composite quality-rule filter (Rae et al. 2021
    §A1.1; Raffel et al. 2020 §2.2) — the standard rule battery every
    large-scale pretraining pipeline runs before anything model-based:
    word-count bounds, mean-word-length bounds, alphabetic-word fraction,
    stop-word presence, symbol ratio, bullet-line and ellipsis-line
    fractions, plus the conjunction ``keep``.

    Every rule is INTEGER arithmetic (``3*n <= chars`` instead of
    ``chars/n >= 3``) so the DuckDB oracle is bit-exact with no float
    ratios anywhere; per-doc flags stay row-local over the shared
    tokenizer (one pass, no shuffle at any corpus size — the filter is a
    map over documents)."""
    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    lines = F.filter(F.split("text", "\n"), lambda l: l != "")
    m = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
        ).cast("long").alias("word_chars"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).alias("n_alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(s) for s in _Q99_STOPS]),
            )
        ).alias("n_stop_distinct"),
        (
            F.length("text") - F.length(F.replace("text", F.lit("#"), F.lit("")))
            + F.length("text") - F.length(F.replace("text", F.lit("…"), F.lit("")))
        ).alias("n_symbols"),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(lines, lambda l: l.startswith("-") | l.startswith("*")
                     | l.startswith("•"))
        ).alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda l: l.endswith("..."))).alias(
            "n_ellipsis_lines"
        ),
    )
    r_count = F.col("n_words").between(20, 100000)
    r_mean = (3 * F.col("n_words") <= F.col("word_chars")) & (
        F.col("word_chars") <= 10 * F.col("n_words")
    )
    r_alpha = 10 * F.col("n_alpha_words") >= 8 * F.col("n_words")
    r_stop = F.col("n_stop_distinct") >= 2
    r_symbol = 10 * F.col("n_symbols") <= F.col("n_words")
    r_bullet = 10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines")
    r_elli = 10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines")
    keep = r_count & r_mean & r_alpha & r_stop & r_symbol & r_bullet & r_elli
    return m.select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"), "word_chars",
        r_count.alias("r_count"), r_mean.alias("r_mean_len"),
        r_alpha.alias("r_alpha"), r_stop.alias("r_stop"),
        r_symbol.alias("r_symbol"), r_bullet.alias("r_bullet"),
        r_elli.alias("r_ellipsis"), keep.alias("keep"),
    )


# --------------------------------------------------------------------------- #
# q101 — Kneser-Ney-smoothed bigram language-model statistics                  #
# --------------------------------------------------------------------------- #

_KN_D = 0.75

_Q101_ORACLE = f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
bg AS (
  SELECT t.pair[1] AS w1, t.pair[2] AS w2
  FROM tl, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS t(pair)
  WHERE len(toks) >= 2
), c2 AS (
  SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS c1, count(*) AS n1f FROM c2 GROUP BY w1
), cont AS (
  SELECT w2, count(*) AS n1b FROM c2 GROUP BY w2
), tot AS (
  SELECT count(*) AS t FROM c2
)
SELECT c2.w1, c2.w2, c2.c AS c,
       round(
         (CASE WHEN c2.c - {_KN_D} > 0 THEN c2.c - {_KN_D} ELSE 0 END) / c1.c1
         + (({_KN_D} * c1.n1f) / c1.c1) * (CAST(cont.n1b AS DOUBLE) / tot.t),
         6) AS p_kn
FROM c2
JOIN c1 ON c1.w1 = c2.w1
JOIN cont ON cont.w2 = c2.w2
CROSS JOIN tot
"""


@register("q101_kneser_ney_bigrams", operators=("TXT4", "A11"), oracle=_Q101_ORACLE)
def q101_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney-smoothed bigram probabilities trained distributively over
    the corpus (Kneser & Ney 1995; the classic n-gram LM used as a
    perplexity-proxy quality scorer in data pipelines): absolute discount
    D=0.75 with the continuation-probability backoff,

        P_KN(w2|w1) = max(c(w1,w2)-D, 0)/c(w1)
                      + (D·N1+(w1,•)/c(w1)) · (N1+(•,w2)/|bigram types|).

    All counts are exact integers (bigram explode → two groupBys and a
    type count) and the final float expression is written identically in
    the DuckDB oracle, so the parity check is bit-exact; the n1b/total
    continuation stats broadcast into the bigram table — the only
    corpus-sized shuffles are the two count groupBys, both map-side
    combining."""
    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    tl = d.select(toks.alias("toks")).filter(F.size("toks") >= 2)
    bg = tl.select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                F.slice("toks", 2, F.size("toks") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    tot = c2.agg(F.count(F.lit(1)).alias("t"))
    D = F.lit(_KN_D)
    p_kn = (
        F.when(F.col("c") - D > 0, F.col("c") - D).otherwise(F.lit(0.0))
        / F.col("c1")
        + ((D * F.col("n1f")) / F.col("c1"))
        * (F.col("n1b").cast("double") / F.col("t"))
    )
    return (
        c2.join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c", F.round(p_kn, 6).alias("p_kn"))
    )


# --------------------------------------------------------------------------- #
# q103 — token co-occurrence lift (PMI's division-only form)                   #
# --------------------------------------------------------------------------- #

_Q103_MIN_CXY = 5

_Q103_ORACLE = f"""
WITH td AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tl AS (
  SELECT doc_id, u.t AS t
  FROM td, unnest(list_distinct(toks)) AS u(t)
), cx AS (
  SELECT t, count(*) AS c FROM tl GROUP BY t
), tot AS (SELECT count(*) AS t_docs FROM documents),
cxy AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS c_xy
  FROM tl a JOIN tl b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t
)
SELECT cxy.t1, cxy.t2, cxy.c_xy,
       round(CAST(cxy.c_xy * tot.t_docs AS DOUBLE) / (c1.c * c2.c), 6) AS lift
FROM cxy
JOIN cx c1 ON c1.t = cxy.t1
JOIN cx c2 ON c2.t = cxy.t2
CROSS JOIN tot
WHERE cxy.c_xy >= {_Q103_MIN_CXY}
"""


@register("q103_cooccurrence_lift", operators=("TXT4", "A11"), oracle=_Q103_ORACLE)
def q103_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token co-occurrence LIFT — PMI's division-only form
    (lift = P(x,y)/(P(x)P(y)) = c_xy·T / (c_x·c_y), no log, so the
    parity check stays bit-exact) — the association-mining primitive
    behind phrase detection and topic co-occurrence audits.

    Shape: per-doc DISTINCT tokens (set semantics), self-join on doc_id
    with t1 < t2 for unordered pairs — the market-basket join, bounded
    by (distinct tokens per doc)², never vocab²; the unigram
    document-frequency table broadcasts into the pair table; support
    threshold c_xy ≥ {_Q103_MIN_CXY} bounds the output."""
    d = _t(spark, sf_dir, "documents")
    tl = d.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("t")
    )
    cx = tl.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = d.agg(F.count(F.lit(1)).alias("t_docs"))
    a = tl.select("doc_id", F.col("t").alias("t1"))
    b = tl.select("doc_id", F.col("t").alias("t2"))
    cxy = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= _Q103_MIN_CXY)
    )
    lift = (
        (F.col("c_xy") * F.col("t_docs")).cast("double")
        / (F.col("c1") * F.col("c2"))
    )
    return (
        cxy.join(F.broadcast(cx.select(F.col("t").alias("t1"), F.col("c").alias("c1"))), "t1")
        .join(F.broadcast(cx.select(F.col("t").alias("t2"), F.col("c").alias("c2"))), "t2")
        .crossJoin(F.broadcast(tot))
        .select("t1", "t2", "c_xy", F.round(lift, 6).alias("lift"))
    )


# --------------------------------------------------------------------------- #
# q106 — exact set-similarity join via prefix filtering (AllPairs/ppjoin)      #
# --------------------------------------------------------------------------- #

def _q106_oracle() -> str:
    p = 1_000_000_007
    return f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS pos FROM tl),
tokh AS (SELECT doc_id, pos, {_DUCK_POLY.replace('{X}', 'tok')} AS th FROM tok),
shh AS (
  SELECT DISTINCT a.doc_id,
         ((a.th * 31 + b.th) % {p} * 31 + c.th) % {p} AS h
  FROM tokh a
  JOIN tokh b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokh c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), ds AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
  FROM shh x JOIN shh y ON x.h = y.h AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT p.id_a, p.id_b, p.inter, a.n AS na, b.n AS nb,
       round(CAST(p.inter AS DOUBLE) / (a.n + b.n - p.inter), 6) AS jaccard
FROM pairs p
JOIN ds a ON a.doc_id = p.id_a
JOIN ds b ON b.doc_id = p.id_b
WHERE 5 * p.inter >= 4 * (a.n + b.n - p.inter)
"""


@register("q106_setsim_join", operators=("DD2", "DD4"), oracle=_q106_oracle())
def q106_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-set similarity join (Jaccard ≥ 4/5) via PREFIX
    FILTERING (Bayardo et al., WWW'07; Xiao et al., ppjoin) — the
    deterministic, guaranteed-complete complement to q39's probabilistic
    MinHash: order each document's shingle hashes by ascending document
    frequency (rarest first), keep only the first n − ⌈4n/5⌉ + 1 as its
    PREFIX, and generate candidates from shared prefix shingles among
    size-compatible documents (5·na ≥ 4·nb both ways — a qualifying
    pair cannot differ in size by more than the threshold factor).
    Completeness: if all shared shingles hid in a document's suffix, the
    intersection would be ≤ ⌈4n/5⌉ − 1 < the τ·n a qualifying pair
    needs — so the rarest shared shingle provably sits in BOTH prefixes,
    and the oracle (ALL qualifying pairs by exhaustive shared-shingle
    counting, no prefixes anywhere) certifies nothing was pruned away.

    All threshold arithmetic is integer (⌈4n/5⌉ = (4n+4) div 5, keep
    rule 5·|∩| ≥ 4·(na+nb−|∩|)): no float ceil can shorten a prefix at
    a τ boundary.  Scale shape: the only corpus-sized shuffles are the
    shingle document-frequency groupBy and the (prefix-shingle) bucket
    join — bucket sizes track shingle rarity, exactly why prefixes hold
    the RAREST shingles; verification intersects the two bounded
    per-doc arrays row-locally.  The shingle and prefix tables persist
    for the query's own multi-branch reuse (self-join + verification):
    unpersisted, the per-char shingle hashing re-executes in every
    branch — measured 103 s vs ~4 s at sf0.1."""
    from cosmo_spark.operators.dedup import shingle_table

    d = _t(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    ex = sh.select(F.col("__id").alias("doc_id"), F.explode("sh").alias("h"))
    dfreq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("h")))
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # prefix p = n - ceil(4n/5) + 1, all-integer via div
    pfx = ordered.select(
        "doc_id", "n",
        F.expr(
            "transform(slice(s, 1, CAST(n - (4*n + 4) DIV 5 + 1 AS INT)),"
            " x -> x.h)"
        ).alias("pfx"),
    ).select("doc_id", "n", F.explode("pfx").alias("h")).persist()
    cand = (
        pfx.alias("a")
        .join(pfx.alias("b"), "h")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (5 * F.col("a.n") >= 4 * F.col("b.n"))
            & (5 * F.col("b.n") >= 4 * F.col("a.n"))
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sets = sh.select(F.col("__id").alias("doc_id"), "sh")
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"),
                              F.col("sh").alias("sa")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"),
                          F.col("sh").alias("sb")), "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("inter"),
            F.size("sa").cast("long").alias("na"),
            F.size("sb").cast("long").alias("nb"),
        )
        .filter(
            5 * F.col("inter")
            >= 4 * (F.col("na") + F.col("nb") - F.col("inter"))
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return verified.select(
        "id_a", "id_b", "inter", "na", "nb", F.round(jac, 6).alias("jaccard")
    )


# --------------------------------------------------------------------------- #
# q164 — exact containment join (asymmetric set inclusion, prefix-filtered)    #
# --------------------------------------------------------------------------- #

_Q164_TAU_NUM, _Q164_TAU_DEN = 9, 10   # containment >= 9/10


def _q164_oracle() -> str:
    p = 1_000_000_007
    return f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS pos FROM tl),
tokh AS (SELECT doc_id, pos, {_DUCK_POLY.replace('{X}', 'tok')} AS th FROM tok),
shh AS (
  SELECT DISTINCT a.doc_id,
         ((a.th * 31 + b.th) % {p} * 31 + c.th) % {p} AS h
  FROM tokh a
  JOIN tokh b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokh c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), ds AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
  FROM shh x JOIN shh y ON x.h = y.h AND x.doc_id <> y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT p.id_a, p.id_b, p.inter, a.n AS na, b.n AS nb,
       round(CAST(p.inter AS DOUBLE) / a.n, 6) AS containment
FROM pairs p
JOIN ds a ON a.doc_id = p.id_a
JOIN ds b ON b.doc_id = p.id_b
WHERE {_Q164_TAU_DEN} * p.inter >= {_Q164_TAU_NUM} * a.n
"""


@register("q164_containment_join", operators=("DD2", "DD4"),
          oracle=_q164_oracle())
def q164_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-set CONTAINMENT join (|A∩B|/|A| ≥ 9/10, ordered
    pairs: id_a is the CONTAINED document) — the asymmetric complement
    to q106's Jaccard: quote inclusion, boilerplate-wrapped reposts, and
    doc-in-doc duplication clear a containment threshold long before
    they clear a symmetric one (a 50-line article pasted into a
    5000-line page has Jaccard ≈ 0.01 but containment 1.0), so a
    training-data pipeline needs both.

    Prefix filtering, asymmetric form: only the PROBE side prunes.
    Order each document's shingles by ascending document frequency
    (rarest first, one global order) and keep the first
    n − ⌈9n/10⌉ + 1 as its probe prefix; the INDEX side must stay
    complete, because containment puts no lower bound on the container's
    size — exactly why q106's size-compatibility filter (5·na ≥ 4·nb)
    would break completeness here and is absent.  Completeness: a
    qualifying pair needs inter ≥ ⌈9·na/10⌉, and if every prefix shingle
    of A missed B the intersection would fit in A's suffix
    (⌈9·na/10⌉ − 1 shingles) — too small.  The oracle verifies against
    the exhaustive shared-shingle count with no prefixes anywhere.
    All threshold arithmetic integer (10·inter ≥ 9·na).

    Scale shape: candidates are generated per (prefix shingle of A ×
    holder of that shingle) — probe prefixes hold each doc's RAREST
    shingles, so probes land in low-document-frequency buckets; the
    shingle and prefix tables persist across the candidate and verify
    branches (the q106 discipline).  Verification intersects the two
    bounded per-doc arrays row-locally."""
    from cosmo_spark.operators.dedup import shingle_table

    tn, td = _Q164_TAU_NUM, _Q164_TAU_DEN
    d = _t(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    ex = sh.select(F.col("__id").alias("doc_id"), F.explode("sh").alias("h"))
    dfreq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("h")))
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # probe prefix p = n - ceil(9n/10) + 1, all-integer via div
    pfx = ordered.select(
        "doc_id",
        F.expr(
            f"transform(slice(s, 1, CAST(n - ({tn}*n + {tn}) DIV {td} + 1"
            " AS INT)), x -> x.h)"
        ).alias("pfx"),
    ).select("doc_id", F.explode("pfx").alias("h"))
    cand = (
        pfx.alias("a")
        .join(ex.alias("b"), "h")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sets = sh.select(F.col("__id").alias("doc_id"), "sh")
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"),
                              F.col("sh").alias("sa")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"),
                          F.col("sh").alias("sb")), "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("inter"),
            F.size("sa").cast("long").alias("na"),
            F.size("sb").cast("long").alias("nb"),
        )
        .filter(td * F.col("inter") >= tn * F.col("na"))
    )
    return verified.select(
        "id_a", "id_b", "inter", "na", "nb",
        F.round(F.col("inter").cast("double") / F.col("na"), 6)
        .alias("containment"),
    )


# --------------------------------------------------------------------------- #
# q118 — per-document LM familiarity score under the q101 bigram model         #
# --------------------------------------------------------------------------- #

_Q118_ORACLE = f"""
WITH tl AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), bg AS (
  SELECT doc_id, t.pair[1] AS w1, t.pair[2] AS w2
  FROM tl, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS t(pair)
  WHERE len(toks) >= 2
), c2 AS (
  SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS c1, count(*) AS n1f FROM c2 GROUP BY w1
), cont AS (
  SELECT w2, count(*) AS n1b FROM c2 GROUP BY w2
), tot AS (
  SELECT count(*) AS t FROM c2
), model AS (
  SELECT c2.w1, c2.w2,
         CAST(round((
           (CASE WHEN c2.c - {_KN_D} > 0 THEN c2.c - {_KN_D} ELSE 0 END) / c1.c1
           + (({_KN_D} * c1.n1f) / c1.c1) * (CAST(cont.n1b AS DOUBLE) / tot.t)
         ) * 1000000, 0) AS BIGINT) AS q
  FROM c2
  JOIN c1 ON c1.w1 = c2.w1
  JOIN cont ON cont.w2 = c2.w2
  CROSS JOIN tot
)
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(m.q) AS BIGINT) AS q_sum,
       round(CAST(sum(m.q) AS DOUBLE) / (1000000.0 * count(*)), 6)
         AS familiarity
FROM bg JOIN model m ON m.w1 = bg.w1 AND m.w2 = bg.w2
GROUP BY bg.doc_id
"""


@register("q118_lm_familiarity", operators=("TXT4", "A11", "J1"),
          oracle=_Q118_ORACLE)
def q118_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-model familiarity score: the mean Kneser-Ney
    bigram probability of the document under the corpus-trained q101
    model — the perplexity-proxy quality signal pipelines use to rank
    documents by fluency/typicality (high mean probability = in-domain
    text, low = noise or boilerplate-free novelty; CCNet/Wenzek et al.
    2020 rank by LM perplexity the same way).

    Float-sum determinism: a per-document SUM of double probabilities
    would be partial-order-dependent (Spark and DuckDB add in different
    orders), so each bigram's probability is first quantized to an
    integer micro-probability q = round(p_kn * 1e6) — the same double
    certified bit-exact by q101's parity, rounded once — and the per-doc
    accumulation is exact BIGINT arithmetic (the q107 order-independence
    discipline).  One division at output.

    Scale shape: model training is q101's (two map-side-combined count
    groupBys); scoring is ONE (w1, w2)-keyed join of doc bigrams against
    the model (both sides corpus-scale, hash-partitioned — the q69
    hot/cold join shape) and one doc_id groupBy with integer partial
    aggregation."""
    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    tl = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    bg = tl.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                F.slice("toks", 2, F.size("toks") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    tot = c2.agg(F.count(F.lit(1)).alias("t"))
    D = F.lit(_KN_D)
    p_kn = (
        F.when(F.col("c") - D > 0, F.col("c") - D).otherwise(F.lit(0.0))
        / F.col("c1")
        + ((D * F.col("n1f")) / F.col("c1"))
        * (F.col("n1b").cast("double") / F.col("t"))
    )
    model = (
        c2.join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.round(p_kn * F.lit(1000000), 0).cast("long").alias("q"),
        )
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("q").alias("q_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "q_sum",
            F.round(
                F.col("q_sum").cast("double")
                / (F.lit(1000000.0) * F.col("n_bigrams")),
                6,
            ).alias("familiarity"),
        )
    )


# --------------------------------------------------------------------------- #
# q120 — edit-distance near-dup verification within length-blocked candidates  #
# --------------------------------------------------------------------------- #

_Q120_PFX = 120       # chars of document prefix compared
_Q120_MAXD = 8        # max edit distance accepted
_Q120_NCH = 9         # Pass-Join chunks = maxd + 1
#: chunk scheme partitioning the 120-char prefix: (idx, start, len)
_Q120_CHUNKS = [
    (1, 1, 13), (2, 14, 13), (3, 27, 13), (4, 40, 13), (5, 53, 13),
    (6, 66, 13), (7, 79, 14), (8, 93, 14), (9, 107, 14),
]


def _q120_oracle() -> str:
    chunk_rows = ", ".join(f"({i}, {st}, {ln})" for i, st, ln in _Q120_CHUNKS)
    win_rows = ", ".join(
        f"({i}, {ws}, {ln})"
        for i, st, ln in _Q120_CHUNKS
        for ws in range(max(1, st - _Q120_MAXD), st + _Q120_MAXD + 1)
    )
    return f"""
WITH d AS (
  SELECT doc_id, lang, substr(text, 1, {_Q120_PFX}) AS pfx
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
        AND n_chars IS NOT NULL AND n_chars >= {_Q120_PFX}
), ch(i, st, ln) AS (VALUES {chunk_rows}),
wn(i, ws, ln) AS (VALUES {win_rows}),
chunks AS (
  SELECT d.doc_id, d.lang, ch.i, substr(d.pfx, ch.st, ch.ln) AS piece
  FROM d CROSS JOIN ch
), windows AS (
  SELECT d.doc_id, d.lang, wn.i, substr(d.pfx, wn.ws, wn.ln) AS piece
  FROM d CROSS JOIN wn
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN windows b
    ON a.lang = b.lang AND a.i = b.i AND a.piece = b.piece
       AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.doc_a, c.doc_b, levenshtein(da.pfx, db.pfx) AS dist,
         greatest(length(da.pfx), length(db.pfx)) AS mx
  FROM cand c
  JOIN d da ON da.doc_id = c.doc_a
  JOIN d db ON db.doc_id = c.doc_b
)
SELECT doc_a, doc_b, dist,
       round(1.0 - CAST(dist AS DOUBLE) / mx, 6) AS sim
FROM scored WHERE dist <= {_Q120_MAXD}
"""


@register("q120_editdist_near_dup", operators=("DD2", "J1"),
          oracle=_q120_oracle())
def q120_editdist_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs verified by EDIT DISTANCE — the character-level
    complement to the token-set verifiers already in the catalog (q39
    exact Jaccard, q106 prefix-filter set similarity, q33 embedding
    cosine): Levenshtein distance over 120-char document prefixes catches
    small in-place edits (typo farms, template fills) that token-set
    measures blur together.  Long documents only (n_chars >= 120), so
    every compared prefix is exactly 120 chars.

    Candidate generation is Pass-Join partitioning (Li, Deng, Feng &
    Wang, 2011), not all-pairs and not length-blocking: each prefix is
    partitioned into maxd+1 = 9 chunks, and if ed(a, b) <= 8 at least
    one chunk of ``a`` survives untouched, so its exact image must
    appear in ``b`` within a +-8 position shift (pigeonhole).  ``a``
    ships 9 (idx, chunk) signatures; ``b`` ships the 9 x 17 windowed
    substrings; candidates are the (idx, content)-equijoin of the two.
    On word-salad corpora this is devastating where frequency filters
    are not: an earlier cut of this query used (lang, length-bucket)
    blocking + a histogram-L1 count filter and measured 100 s at sf0.1
    (300k candidates, 87k L1 survivors of true distance 60-90); the
    chunk equijoin admits essentially only true near-dups.

    Survivors are verified with Spark's 3-arg banded
    ``levenshtein(l, r, maxd)`` (O(PFX*maxd) per pair, exact for every
    distance <= maxd, -1 beyond).  Both engines agree on codepoint-level
    distance; the one division is rounded at output."""
    docs = _t(spark, sf_dir, "documents")
    return editdist_near_dup_pairs(docs)


def editdist_near_dup_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, dist, sim) Pass-Join edit-distance near-dup pairs of
    a raw ``documents`` frame — the q120 pipeline as a reusable stage (also
    one of q125's evidence sources; ONE definition, zero drift)."""
    d = docs.filter(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") >= _Q120_PFX)
    ).select(
        "doc_id", "lang",
        F.substring("text", 1, _Q120_PFX).alias("pfx"),
    )
    # both literal arrays are built as ONE parsed SQL string each (the
    # srp_lsh planes_lit discipline): the per-element F.struct/F.substring
    # formulation issued ~1.2k py4j round-trips — measured 1.5 s of pure
    # driver-side construction per call, the parser ingests the same
    # expression in milliseconds.
    #
    # r14 (guide §2.3 — shuffle fewer bytes): the candidate equi-join key
    # (lang, i, 13-14-char piece) is folded into ONE xxhash64 long BEFORE
    # the explode, so the window side ships 153 x 8 bytes per doc instead
    # of 153 x ~30.  Exactness is find-then-verify's: any TRUE near-dup
    # pair (ed <= maxd) has a real untouched chunk whose image appears in
    # the other doc's windows (pigeonhole), so its hashes collide too and
    # the pair is still generated; a 64-bit hash collision can only ADD a
    # candidate, which banded levenshtein then rejects (dist = -1) — the
    # verified output is bit-identical (A/B-asserted at sf0.1, 1.90 ->
    # 1.39 s; parity green).
    chunk_arr = F.expr("array(" + ", ".join(
        f"xxhash64(lang, {i}, substring(pfx, {st}, {ln}))"
        for i, st, ln in _Q120_CHUNKS
    ) + ")")
    win_arr = F.expr("array(" + ", ".join(
        f"xxhash64(lang, {i}, substring(pfx, {ws}, {ln}))"
        for i, st, ln in _Q120_CHUNKS
        for ws in range(max(1, st - _Q120_MAXD), st + _Q120_MAXD + 1)
    ) + ")")
    chunks = d.select(
        F.col("doc_id").alias("doc_a"), F.explode(chunk_arr).alias("h")
    )
    windows = d.select(
        F.col("doc_id").alias("doc_b"), F.explode(win_arr).alias("h")
    )
    cand = (
        chunks.join(windows, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pa = d.select(F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pa"))
    pb = d.select(F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pb"))
    scored = (
        cand.join(pa, "doc_a").join(pb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.levenshtein("pa", "pb", _Q120_MAXD).alias("dist"),
            F.greatest(F.length("pa"), F.length("pb")).alias("mx"),
        )
    )
    return scored.filter(F.col("dist") >= 0).select(
        "doc_a", "doc_b",
        # DuckDB's levenshtein yields BIGINT; Spark's yields INT — match
        # the oracle's width (the dtype-parity gate is type-sensitive)
        F.col("dist").cast("long").alias("dist"),
        F.round(F.lit(1.0) - F.col("dist").cast("double") / F.col("mx"), 6)
          .alias("sim"),
    )


# --------------------------------------------------------------------------- #
# q125 — composite entity resolution: three evidence channels, one closure     #
# --------------------------------------------------------------------------- #


def _q125_oracle() -> str:
    from cosmo_spark.queries.vectorops import EMB_NEARDUP_SQL

    mh = _minhash_oracle().strip()
    ed = _q120_oracle().strip()
    emb = EMB_NEARDUP_SQL.strip()
    return f"""
WITH RECURSIVE mh AS (
  {mh}
), emb AS (
  {emb}
), ed AS (
  {ed}
), pr AS (
  SELECT id_a, id_b FROM mh
  UNION SELECT id_a, id_b FROM emb
  UNION SELECT doc_a AS id_a, doc_b AS id_b FROM ed
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pr
  UNION
  SELECT id_b AS src, id_a AS dst FROM pr
), reach AS (
  SELECT src AS id, dst AS peer FROM edges
  UNION
  SELECT r.id, e.dst AS peer FROM reach r JOIN edges e ON r.peer = e.src
), comp AS (
  SELECT id, CAST(least(id, min(peer)) AS BIGINT) AS cluster
  FROM reach GROUP BY id
), sizes AS (
  SELECT cluster, count(*) AS cluster_size FROM comp GROUP BY cluster
)
SELECT c.id, c.cluster, s.cluster_size
FROM comp c JOIN sizes s USING (cluster)
"""


@register("q125_entity_resolution", operators=("DD6", "DD2", "DD5"),
          oracle=_q125_oracle())
def q125_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite entity resolution: near-duplicate clusters over the UNION
    of three independent evidence channels — token-set (q39's LSH-found,
    exact-Jaccard-verified pairs), embedding cosine (q33's label-blocked
    pairs at 0.90), and character-level edit distance (q120's Pass-Join
    pairs) — closed transitively into entities.  This is the production
    ER shape: no single similarity measure catches every duplicate
    surface form, so evidence sets are unioned BEFORE the closure (two
    docs linked lexically to a third merge into one entity even if they
    never matched each other directly).

    Every evidence channel is the catalog's own certified pipeline
    (shared code AND shared oracle text — minhash/q120 builders and
    vectorops.EMB_NEARDUP_SQL are composed verbatim), the closure is the
    q45 machinery (iterative min-label propagation, localCheckpoint per
    round) against a recursive-CTE oracle, and cluster sizes ride one
    aggregate + join.  Scale: each channel is independently bounded
    (LSH bands / blocked cosine / chunk equijoin); the union graph's CC
    cost is O(diameter) rounds over pair edges only."""
    from cosmo_spark.operators.dedup import duplicate_clusters

    comp = duplicate_clusters(_entity_pairs(spark, sf_dir)).select(
        "id", "cluster"
    )
    sizes = comp.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster").select("id", "cluster", "cluster_size")


def _entity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q125's unioned three-channel evidence pairs (LSH-Jaccard, blocked
    cosine, Pass-Join edit distance) as a reusable stage — shared verbatim
    by the q136 count twin so the two queries cannot drift."""
    from cosmo_spark.operators.dedup import (
        embedding_near_dups,
        minhash_candidates,
        ngram_jaccard_pairs,
        shingle_table,
    )

    d = _t(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    mh = ngram_jaccard_pairs(
        d, "text", "doc_id",
        candidate_pairs=minhash_candidates(
            d, "text", "doc_id", n_hashes=8, bands=4, shingle_n=3, shingles=sh
        ),
        shingles=sh,
    ).select("id_a", "id_b")

    e = _t(spark, sf_dir, "embeddings")
    # max_block: `label` is an uncontrolled attribute key — one dominant
    # label reproduces the q33 hot-block pathology inside this evidence
    # channel; the salt is an exact rewrite (same pairs, bounded tasks)
    emb = embedding_near_dups(
        e, "embedding", "vec_id", threshold=0.90, block_col="label", dim=64,
        max_block=256,
    ).select("id_a", "id_b")

    ed = editdist_near_dup_pairs(d).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )

    return mh.unionByName(emb).unionByName(ed).distinct()


# --------------------------------------------------------------------------- #
# q165 — incremental containment join: new batch probed vs standing corpus     #
# --------------------------------------------------------------------------- #


def _q165_oracle() -> str:
    """q164's exhaustive containment oracle restricted to the mod-5
    ingest split (q79's convention): probe/contained side = doc_id % 5
    = 0 (the incoming batch), index/container side = the rest."""
    p = 1_000_000_007
    return f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS pos FROM tl),
tokh AS (SELECT doc_id, pos, {_DUCK_POLY.replace('{X}', 'tok')} AS th FROM tok),
shh AS (
  SELECT DISTINCT a.doc_id,
         ((a.th * 31 + b.th) % {p} * 31 + c.th) % {p} AS h
  FROM tokh a
  JOIN tokh b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokh c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), ds AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
  FROM shh x JOIN shh y ON x.h = y.h
  WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
  GROUP BY x.doc_id, y.doc_id
)
SELECT p.id_a, p.id_b, p.inter, a.n AS na, b.n AS nb,
       round(CAST(p.inter AS DOUBLE) / a.n, 6) AS containment
FROM pairs p
JOIN ds a ON a.doc_id = p.id_a
JOIN ds b ON b.doc_id = p.id_b
WHERE {_Q164_TAU_DEN} * p.inter >= {_Q164_TAU_NUM} * a.n
"""


@register("q165_incremental_containment", operators=("DD2", "DD4", "J5"),
          oracle=_q165_oracle())
def q165_incremental_containment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL containment join — the daily-ingest form of q164
    (r12 verdict #6): the incoming batch (mod-5 split, q79's convention)
    probes the STANDING corpus for containers; within-batch and
    within-corpus pairs are never generated.  This asymmetric probe is
    what a continuously-ingesting pipeline runs per batch: "is this new
    document ≥ 90 % contained in something we already hold?"

    Differences from the one-shot q164, each load-bearing at 100 TB:

    - **Prefix filter on the NEW side only** — the corpus index stays
      complete (containment bounds only the contained side, q164's
      argument), and only the day's batch pays the shingle-ordering agg.
    - **Document frequencies come from the INDEX side** — the statistic a
      standing corpus has precomputed (and that stays stable across
      batches); a probe shingle absent from the index gets df 0.  The
      prefix-filter completeness argument is order-agnostic (if every
      prefix shingle of A misses B, the intersection fits in A's suffix
      of ⌈9·na/10⌉ − 1 < required), so index-side df cannot lose pairs —
      df-0 prefix slots simply generate zero candidates.
    - **Candidate fan-out is probe-bounded**: (batch prefix shingle ×
      index holders of that shingle), with prefixes holding each new
      doc's corpus-rarest shingles — the candidate count scales with the
      BATCH, not the corpus, exactly the q79 incremental shape.

    Verification is q164's row-local array-intersect over the two
    persisted shingle sets; all threshold arithmetic integer."""
    from cosmo_spark.operators.dedup import shingle_table

    tn, td = _Q164_TAU_NUM, _Q164_TAU_DEN
    d = _t(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    probe = sh.filter(F.col("__id") % 5 == 0)
    index = sh.filter(F.col("__id") % 5 != 0)
    ex_idx = index.select(
        F.col("__id").alias("doc_id"), F.explode("sh").alias("h")
    )
    # index-side document frequency: the standing corpus statistic
    dfreq = ex_idx.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    ex_probe = probe.select(
        F.col("__id").alias("doc_id"), F.explode("sh").alias("h")
    )
    ordered = (
        ex_probe.join(dfreq, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.coalesce(F.col("df"), F.lit(0)).alias("df"),
                        F.col("h"),
                    )
                )
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # probe prefix p = n - ceil(9n/10) + 1, all-integer via div (q164)
    pfx = ordered.select(
        "doc_id",
        F.expr(
            f"transform(slice(s, 1, CAST(n - ({tn}*n + {tn}) DIV {td} + 1"
            " AS INT)), x -> x.h)"
        ).alias("pfx"),
    ).select("doc_id", F.explode("pfx").alias("h"))
    cand = (
        pfx.alias("a")
        .join(ex_idx.alias("b"), "h")
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sets = sh.select(F.col("__id").alias("doc_id"), "sh")
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"),
                              F.col("sh").alias("sa")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"),
                          F.col("sh").alias("sb")), "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("inter"),
            F.size("sa").cast("long").alias("na"),
            F.size("sb").cast("long").alias("nb"),
        )
        .filter(td * F.col("inter") >= tn * F.col("na"))
    )
    return verified.select(
        "id_a", "id_b", "inter", "na", "nb",
        F.round(F.col("inter").cast("double") / F.col("na"), 6)
        .alias("containment"),
    )


# --------------------------------------------------------------------------- #
# q134–q136 — count-only twins of the output-dense near-dup queries            #
# --------------------------------------------------------------------------- #
#
# q39/q120/q125's 10× ratios (docs/SCALE.md) are dominated by OUTPUT
# density: replicating the corpus 10× makes every document a ~45-true-pair
# group, so the pair/member row count explodes while the pipeline itself
# stays sub-quadratic.  These twins run the IDENTICAL pipelines (shared
# stage functions — zero drift) but emit per-doc degrees / cluster-size
# histograms instead of pairs, so their measured 10× ratios isolate
# pipeline cost from output materialization — turning SCALE.md's
# "workload-induced" claims into measured fact (round-7 review #5).


def _q134_oracle() -> str:
    ed = _q120_oracle().strip()
    return f"""
WITH pairs AS (
  {ed}
), sides AS (
  SELECT doc_a AS doc_id, dist FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id, dist FROM pairs
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs, min(dist) AS min_dist
FROM sides GROUP BY doc_id
"""


@register("q134_editdist_pair_counts", operators=("DD2", "A11"),
          oracle=_q134_oracle())
def q134_editdist_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-only twin of q120: per-document edit-distance near-dup degree
    (and closest distance) from the VERBATIM q120 pipeline
    (editdist_near_dup_pairs — one definition, zero drift), aggregated
    before anything wide materializes.  Output is ≤ one row per document,
    so its measured 10× ratio is the Pass-Join pipeline's own scaling with
    the output-density term removed (docs/SCALE.md)."""
    pairs = editdist_near_dup_pairs(_t(spark, sf_dir, "documents"))
    sides = pairs.select(F.col("doc_a").alias("doc_id"), "dist").unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"), "dist")
    )
    return sides.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("dist").alias("min_dist"),
    )


def _q135_oracle() -> str:
    mh = _minhash_oracle().strip()
    return f"""
WITH pairs AS (
  {mh}
), sides AS (
  SELECT id_a AS doc_id, jaccard FROM pairs
  UNION ALL
  SELECT id_b AS doc_id, jaccard FROM pairs
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       round(max(jaccard), 6) AS max_jaccard
FROM sides GROUP BY doc_id
"""


@register("q135_lsh_pair_counts", operators=("DD2", "DD4", "A11"),
          oracle=_q135_oracle())
def q135_lsh_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-only twin of q39: per-document verified near-dup degree and
    best Jaccard from the identical LSH find + exact-Jaccard verify
    pipeline, collapsed to one row per document before output."""
    from cosmo_spark.operators.dedup import shingle_table

    d = _t(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", "doc_id", shingle_n=3).persist()
    verified = ngram_jaccard_pairs(
        d, "text", "doc_id",
        candidate_pairs=minhash_candidates(
            d, "text", "doc_id", n_hashes=8, bands=4, shingle_n=3, shingles=sh
        ),
        shingles=sh,
    )
    sides = verified.select(F.col("id_a").alias("doc_id"), "jaccard") \
        .unionByName(verified.select(F.col("id_b").alias("doc_id"), "jaccard"))
    return sides.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )


def _q136_oracle() -> str:
    base = _q125_oracle().strip()
    return f"""
WITH base AS (
  {base}
)
SELECT cluster_size, CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
FROM base GROUP BY cluster_size
"""


@register("q136_entity_cluster_profile", operators=("DD6", "A13"),
          oracle=_q136_oracle())
def q136_entity_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-only twin of q125: the entity-size HISTOGRAM (cluster_size →
    number of entities) over the identical three-channel evidence union
    and connected-components closure (_entity_pairs + duplicate_clusters
    shared verbatim).  Where q125's output grows with every replicated
    member row, this emits one row per distinct cluster size — the
    pipeline-only cost of composite entity resolution."""
    from cosmo_spark.operators.dedup import duplicate_clusters

    comp = duplicate_clusters(_entity_pairs(spark, sf_dir)).select(
        "id", "cluster"
    )
    sizes = comp.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


# --------------------------------------------------------------------------- #
# q126 — exact-k-per-stratum deterministic sample                              #
# --------------------------------------------------------------------------- #

_Q126_K = 8

_Q126_TEXT_HASH = _DUCK_POLY.replace("{X}", "text")

_Q126_ORACLE = f"""
WITH d AS (
  SELECT source, doc_id, {_Q126_TEXT_HASH} AS h
  FROM (SELECT source, doc_id, text FROM documents
        WHERE source IS NOT NULL AND text IS NOT NULL)
), ranked AS (
  SELECT source, doc_id, h,
         row_number() OVER (PARTITION BY source
                            ORDER BY h, doc_id) AS rank
  FROM d
)
SELECT source, doc_id, h, rank FROM ranked WHERE rank <= {_Q126_K}
"""


@register("q126_exact_k_sample", operators=("A8", "P16"), oracle=_Q126_ORACLE)
def q126_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k documents per stratum, deterministically: the k smallest
    content-hash values per source (ties by doc_id) — the quota-based
    complement to q46's rate-based stratified sampling, and the standard
    way eval/holdout sets are cut (same k rows re-emerge run after run
    and under incremental ingest, because membership depends only on
    content, never on partitioning or RNG state).

    Scale shape: hash-per-doc is map-side; the per-source selection goes
    through the two-phase top-k (operators/similarity._grouped_topk —
    rank within (source, input partition) first, then rank the
    surviving sources x partitions x k rows), so a 4-source corpus never
    funnels into 4 reducers sorting everything — the exact trap the
    oracle's plain row_number window would be."""
    from cosmo_spark.operators.similarity import _grouped_topk

    d = _t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    ).select(
        "source", "doc_id", poly_hash(F.col("text")).alias("h")
    )
    scored = d.select(
        F.col("source").alias("query_id"),
        F.col("doc_id").alias("neighbor_id"),
        (-F.col("h")).cast("double").alias("cos_sim"),
    )
    top = _grouped_topk(scored, _Q126_K)
    return (
        top.join(d, (d["source"] == top["query_id"])
                 & (d["doc_id"] == top["neighbor_id"]))
        .select(
            "source", "doc_id", "h",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _q158_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import BPE_PROD_ORACLE_N

    ctes, _final, bests = duck_bpe_train_ctes(_DUCK_TOKS, BPE_PROD_ORACLE_N)
    merged = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, (a || b) AS token FROM {bname}"
        for k, bname in enumerate(bests, start=1)
    )
    return f"""
WITH {", ".join(ctes)},
base AS (
  SELECT DISTINCT unnest(list_transform(range(1, length(word) + 1),
                                        i -> word[i:i])) AS token
  FROM wf
), base_ids AS (
  SELECT CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS id,
         token, 'base' AS kind, CAST(NULL AS BIGINT) AS rank
  FROM base
), m AS ({merged})
SELECT id, token, kind, rank FROM base_ids
UNION ALL
SELECT CAST((SELECT count(*) FROM base) + rank - 1 AS BIGINT) AS id,
       token, 'merged' AS kind, rank
FROM m
"""


@register("q158_bpe_vocab_export", operators=("TXT3",), oracle=_q158_oracle())
def q158_bpe_vocab_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export the trained tokenizer's VOCABULARY TABLE — the artifact a
    runtime tokenizer actually loads (the vocab.json/merges.txt pair of
    every production BPE): base tokens = the distinct characters of the
    corpus vocabulary, id-assigned in lexicographic order; merged tokens
    = the full-exhaustion rule ladder (q155's rules) in learned order,
    ids continuing after the base block.  Completes the tokenizer
    family: q155 trains, q158 exports the artifact, q156 prices the
    corpus, q97/q148 apply.

    The oracle replays training end-to-end (the 112-level materialized
    chain) AND derives the base charset from the same word-frequency
    CTE, so ids, tokens, kinds and ranks hash-match cross-engine with no
    cache circularity.  Duplicate token STRINGS are possible by
    construction (two different rules can concatenate to the same
    string) and are kept — the table is the rule ladder, ids stay
    unique.

    Scale shape: base tokens come from the DISTINCT-word vocabulary
    (Heaps-law-sized) exploded to characters — a bounded frame at any
    corpus size; the merged block is rule-count-sized driver rows.  The
    one scalar that crosses to the driver is the base-block size.
    """
    from pyspark.sql.window import Window as _W

    from cosmo_spark.queries.bpe_artifacts import resolve_bpe_merges_prod

    rules = resolve_bpe_merges_prod(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(tokenize(F.col("text"))).alias("word")) \
        .distinct()
    base = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, char_length(word)), "
                    "i -> substring(word, i, 1))"
                )
            ).alias("token")
        )
        .distinct()
    )
    w_id = _W.orderBy("token")
    base_ids = base.select(
        (F.row_number().over(w_id) - 1).cast("long").alias("id"),
        "token", F.lit("base").alias("kind"),
        F.lit(None).cast("long").alias("rank"),
    )
    n_base = base.count()   # charset-sized scalar — the one driver number
    merged_rows = [
        (n_base + k - 1, a + b, "merged", k)
        for k, (a, b, _cnt) in enumerate(rules, start=1)
    ]
    merged_df = spark.createDataFrame(
        merged_rows, "id LONG, token STRING, kind STRING, rank LONG"
    )
    return base_ids.unionByName(merged_df)


# --------------------------------------------------------------------------- #
# q159/q160 — the >=1k-rule catalog tokenizer (round-10 verdict #3)            #
# --------------------------------------------------------------------------- #

_DUCK_TK_TABLE = f"(SELECT doc_id, source, {_DUCK_TOKS} AS __tk FROM documents) d"


def _q159_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import (
        BPE_1K_ORACLE_N,
        BPE_1K_PIN,
        DUCK_CORPUS_HASH,
        duck_toks_1k,
    )

    ctes, _final, bests = duck_bpe_train_ctes(
        duck_toks_1k("__tk"), BPE_1K_ORACLE_N, table=_DUCK_TK_TABLE
    )
    unions = " UNION ALL ".join(
        f"SELECT 'rule' AS part, CAST({k} AS BIGINT) AS rank, a AS lhs, "
        f"b AS rhs, cnt FROM {bname}"
        for k, bname in enumerate(bests, start=1)
    )
    pin_rows = ", ".join(
        f"(CAST({dh} AS UBIGINT), CAST({n} AS BIGINT), '{sha}', "
        f"CAST({csum} AS BIGINT))"
        for dh, n, sha, csum in BPE_1K_PIN.values()
    ) or ("(CAST(NULL AS UBIGINT), CAST(NULL AS BIGINT), "
          "CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT))")
    return f"""
WITH {", ".join(ctes)},
ch AS ({DUCK_CORPUS_HASH}),
pins AS (SELECT * FROM (VALUES {pin_rows}) v(h, n_rules, fp, tail_cnt)),
tail AS (
  SELECT 'tail' AS part, n_rules AS rank, fp AS lhs, '' AS rhs,
         tail_cnt AS cnt
  FROM pins JOIN ch ON pins.h = ch.h
)
SELECT part, rank, lhs, rhs, cnt FROM ({unions} UNION ALL
SELECT part, rank, lhs, rhs, cnt FROM tail)
"""


@register("q159_bpe_train_1k", operators=("TXT3",), oracle=_q159_oracle())
def q159_bpe_train_1k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a tokenizer with THOUSANDS of real merges from catalog data
    (round-10 verdict #3: the >=1k-merge capability lived only in a
    synthetic-vocabulary unit).  The corpus is derived in-engine and
    deterministically — the bigram+trigram CONCATENATION expansion of the
    documents token stream (~17k distinct derived words, rich enough that
    the full BPE_1K_N_MERGES=4096 budget trains real merges; the raw
    corpus pair-exhausts at ~89) — and the derivation is expressible in
    both engines, so the oracle replays it from raw text.

    Output = the first BPE_1K_ORACLE_N rules (rank, lhs, rhs, cnt) plus
    one 'tail' row fingerprinting the remainder: (total rule count,
    sha256 of ranks prefix+1..4096, their count sum).  The oracle
    replays the prefix LIVE (materialized unrolled levels over the same
    derived corpus — the adversarial sweeps run this half on mutated
    corpora) and pins the remainder keyed by an independently computed
    corpus content hash; on an unpinned corpus BOTH sides emit the
    prefix only.  The pins are trainer output, regenerated by
    tools/print_bpe_1k_pin.py and gated pin-deleted in
    tests/test_bpe_train.py.
    """
    from cosmo_spark.queries.bpe_artifacts import (
        BPE_1K_ORACLE_N,
        BPE_1K_PIN,
        documents_fingerprint_src,
        resolve_bpe_merges_1k,
        tail_fingerprint,
    )

    tune_session(spark)
    rules = resolve_bpe_merges_1k(spark, sf_dir)
    rows = [
        ("rule", k, a, b, int(c))
        for k, (a, b, c) in enumerate(rules[:BPE_1K_ORACLE_N], start=1)
    ]
    if documents_fingerprint_src(spark, sf_dir) in BPE_1K_PIN:
        n, sha, csum = tail_fingerprint(rules, BPE_1K_ORACLE_N)
        rows.append(("tail", n, sha, "", csum))
    return spark.createDataFrame(
        rows, "part STRING, rank LONG, lhs STRING, rhs STRING, cnt LONG"
    )


def _q160_oracle() -> str:
    from cosmo_spark.functions.bpe import duck_bpe_train_ctes
    from cosmo_spark.queries.bpe_artifacts import (
        BPE_1K_ORACLE_N,
        BPE_1K_PRICE_PIN,
        DUCK_CORPUS_HASH,
        duck_toks_1k,
    )

    ctes, final, _bests = duck_bpe_train_ctes(
        duck_toks_1k("__tk"), BPE_1K_ORACLE_N, table=_DUCK_TK_TABLE
    )
    price_rows = ", ".join(
        f"(CAST({dh} AS UBIGINT), '{src}', CAST({n} AS BIGINT))"
        for dh, by_src in BPE_1K_PRICE_PIN.values()
        for src, n in sorted(by_src.items())
    ) or ("(CAST(NULL AS UBIGINT), CAST(NULL AS VARCHAR), "
          "CAST(NULL AS BIGINT))")
    return f"""
WITH {", ".join(ctes)},
tok AS (SELECT word, CAST(len(w) AS BIGINT) AS n_sym FROM {final}),
dt AS (
  SELECT doc_id, source, unnest({duck_toks_1k("__tk")}) AS word
  FROM {_DUCK_TK_TABLE}
),
g AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(n_sym) AS BIGINT) AS n_tokens_prefix
  FROM dt JOIN tok USING (word)
  GROUP BY source
),
ch AS ({DUCK_CORPUS_HASH}),
pp AS (SELECT * FROM (VALUES {price_rows}) v(h, source, n_full)),
pj AS (SELECT source, n_full FROM pp JOIN ch ON pp.h = ch.h)
SELECT g.source, n_docs, n_words, n_tokens_prefix,
       pj.n_full AS n_tokens_full
FROM g LEFT JOIN pj ON g.source = pj.source
"""


@register("q160_bpe_tokenize_1k", operators=("TXT3", "A11"),
          oracle=_q160_oracle())
def q160_bpe_tokenize_1k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price the derived corpus per source under the 4096-rule tokenizer
    — the catalog query that exercises the merge-rank apply kernel at
    production ladder scale (17k-word vocabulary x 4096 rules in one
    Arrow pass; the retired full-ladder-scan kernel was O(rules)/word
    here).

    Two price columns: ``n_tokens_prefix`` (the BPE_1K_ORACLE_N-rule
    ladder — LIVE-verified, the oracle replays training AND segmentation
    from raw text on any corpus) and ``n_tokens_full`` (the whole 4096-
    rule ladder — pinned per known corpus and NULL on both sides
    elsewhere, since a 4096-level SQL replay is not reachable).  Spark
    always computes the full price live, so a kernel or trainer
    regression breaks against the pin.
    """
    from cosmo_spark.functions.bpe import learned_token_costs
    from cosmo_spark.queries.bpe_artifacts import (
        BPE_1K_ORACLE_N,
        BPE_1K_PRICE_PIN,
        derived_words_1k,
        documents_fingerprint_src,
        resolve_bpe_merges_1k,
    )

    tune_session(spark)
    rules = resolve_bpe_merges_1k(spark, sf_dir)
    words = derived_words_1k(spark, sf_dir)
    tokp = learned_token_costs(words, rules[:BPE_1K_ORACLE_N])
    base = words.join(F.broadcast(tokp), "word").groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").alias("n_tokens_prefix"),
    )
    if documents_fingerprint_src(spark, sf_dir) in BPE_1K_PRICE_PIN:
        tokf = learned_token_costs(words, rules).withColumnRenamed(
            "n_sym", "n_sym_full"
        )
        full = words.join(F.broadcast(tokf), "word").groupBy("source").agg(
            F.sum("n_sym_full").alias("n_tokens_full")
        )
        # the per-source price frames are distinct-source-sized on both
        # sides — broadcast the full-ladder side (an SMJ here would sort
        # two 20-row aggregates through two extra exchanges)
        return base.join(F.broadcast(full), "source", "left").select(
            "source", "n_docs", "n_words", "n_tokens_prefix",
            "n_tokens_full",
        )
    return base.select(
        "source", "n_docs", "n_words", "n_tokens_prefix",
        F.lit(None).cast("long").alias("n_tokens_full"),
    )
