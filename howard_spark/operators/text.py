"""Text-analysis operators for training-data pipelines (documents table).

Language ID, quality scoring, token counting, fingerprinting — all in
native JVM expressions (no Python UDFs), with exact DuckDB oracles.
These play the role the INFO-string functions play in the reference
(regexp_extract decode, /root/reference/howard/objects/
variants.py:1912-1918): string surgery kept inside the engine's
vectorized expression layer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, t

# Deterministic marker-word lists per language (tiny stopword banks).
_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
}


def _count_word_expr_spark(col, word):
    # occurrences of word with space boundaries
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return (
        F.length(padded) - F.length(F.regexp_replace(padded, f" {word} ", " "))
    ) / (len(word) + 1)


@query(
    "q21_token_count",
    driver=False,  # merged into q21_text_profile (driver gate)
    oracle=    """
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
           length(text) AS n_chars_q
    FROM documents
    """,
)
def q21(spark, sf):
    """Whitespace token counting per document."""
    d = t(spark, sf, "documents")
    n_tokens = F.when(F.trim("text") == "", 0).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_q"),
    )


@query(
    "q22_quality_score",
    driver=False,  # merged into q21_text_profile (driver gate)
    oracle=    """
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit_cnt,
           CAST(length(text) - length(replace(lower(text), ' the ', '')) AS BIGINT)
               AS stopword_signal,
           CAST(length(text) AS BIGINT) AS len_chars
    FROM documents
    """,
)
def q22(spark, sf):
    """Quality scoring signals: punctuation / digit / stopword counts +
    length — exact integers (ratios are derivable; integer ratios can
    land exactly on decimal rounding ties where engines' round() rules
    disagree, so the gate compares counts)."""
    d = t(spark, sf, "documents")
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    stop = F.length("text") - F.length(F.replace(F.lower("text"), F.lit(" the "), F.lit("")))
    return d.select(
        "doc_id",
        punct.cast("long").alias("punct_cnt"),
        digits.cast("long").alias("digit_cnt"),
        stop.cast("long").alias("stopword_signal"),
        F.length("text").cast("long").alias("len_chars"),
    )


@query(
    "q23_lang_id",
    driver=False,  # merged into q21_text_profile (driver gate)
    oracle=    """
    SELECT doc_id, lang AS lang_true,
           CASE
             WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
             WHEN de_score >= fr_score THEN 'de'
             ELSE 'fr'
           END AS lang_pred
    FROM (
      SELECT doc_id, lang,
        (length(' ' || lower(text) || ' ')
         - length(regexp_replace(' ' || lower(text) || ' ', ' (the|and|of) ', ' ', 'g'))) AS en_score,
        (length(' ' || lower(text) || ' ')
         - length(regexp_replace(' ' || lower(text) || ' ', ' (der|und|die) ', ' ', 'g'))) AS de_score,
        (length(' ' || lower(text) || ' ')
         - length(regexp_replace(' ' || lower(text) || ' ', ' (le|et|la) ', ' ', 'g'))) AS fr_score
      FROM documents
    )
    """,
)
def q23(spark, sf):
    """Heuristic language ID: marker-word mass per language, argmax.
    (A real pipeline would use cld3/fasttext via mapInPandas; the
    n-gram heuristic keeps the operator oracle-checkable.)"""
    d = t(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))

    def score(words):
        pat = " (" + "|".join(words) + ") "
        return F.length(padded) - F.length(F.regexp_replace(padded, pat, " "))

    en, de, fr = score(_MARKERS["en"]), score(_MARKERS["de"]), score(_MARKERS["fr"])
    pred = (
        F.when((en >= de) & (en >= fr), "en")
        .when(de >= fr, "de")
        .otherwise("fr")
    )
    return d.select("doc_id", F.col("lang").alias("lang_true"), pred.alias("lang_pred"))


@query(
    "q24_fingerprint",
    driver=False,  # merged into q21_text_profile (driver gate)
    oracle=    """
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def q24(spark, sf):
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (portable stand-in for a rolling hash; the engine-internal
    fast path uses xxhash64)."""
    d = t(spark, sf, "documents")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fp"))


@query(
    "q25_lang_stats",
    """
    SELECT lang, count(*) AS docs,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def q25(spark, sf):
    """Per-language corpus stats (A1-style groupBy over documents)."""
    return (
        t(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


SAMPLE_PER_STRATUM = 50
SAMPLE_SEED = "s42"


@query(
    "q26_stratified_sample",
    f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('{SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)),
                            doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
)
def q26(spark, sf):
    """Deterministic stratified sampling: exactly N docs per stratum
    (language), chosen by md5(seed:doc_id) order — a seeded shuffle
    that is reproducible across engines, runs, and partitionings
    (unlike rand(), whose draw depends on the physical partition
    layout). The per-language quota-sampling primitive of a
    training-data mix. Shuffles only (doc_id, lang, hash); top-N per
    stratum is one window pass (at extreme strata sizes switch to the
    groupBy + min_by(TopK) shape)."""
    from pyspark.sql.window import Window

    d = t(spark, sf, "documents")
    order = F.md5(F.concat(F.lit(f"{SAMPLE_SEED}:"),
                           F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(order, F.asc("doc_id"))
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= SAMPLE_PER_STRATUM)
        .select("doc_id", "lang")
    )


PACK_CAPACITY = 4096


def pack_bins(toks, capacity: int = PACK_CAPACITY,
              n_buckets: int = 64):
    """Distributed prefix sum over doc_id order (two passes): bucket
    the order key into contiguous doc_id ranges, cumsum WITHIN each
    bucket in parallel (window partitioned by bucket), and add the
    broadcast cumulative bucket offsets. A naive global
    Window.orderBy would funnel every row through ONE task — this
    shape keeps the window fully parallel; the driver touches only
    n_buckets totals. Input: (doc_id, n_tokens)."""
    from pyspark.sql.window import Window

    spark = toks.sparkSession
    hi = toks.agg(F.max("doc_id").alias("m")).first()["m"]
    if hi is None:
        return toks.select("doc_id", "n_tokens",
                           F.lit(0).cast("bigint").alias("bin_id"))
    width = max(int(hi) // n_buckets + 1, 1)
    b = toks.withColumn("__b", (F.col("doc_id") / width).cast("int"))
    totals = (b.groupBy("__b").agg(F.sum("n_tokens").alias("t"))
              .orderBy("__b").collect())
    offs, run = {}, 0
    for r in totals:
        offs[r["__b"]] = run
        run += r["t"]
    off_df = F.broadcast(spark.createDataFrame(
        [(k, v) for k, v in offs.items()], "__b int, __off bigint"))
    w = (Window.partitionBy("__b").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        b.join(off_df, "__b")
        .select(
            "doc_id", "n_tokens",
            # explicit floor on BOTH sides: DuckDB CAST(double AS BIGINT)
            # rounds half-away while Spark cast truncates
            F.floor((F.col("__off") + F.sum("n_tokens").over(w)
                     - F.col("n_tokens")) / capacity)
            .cast("bigint").alias("bin_id"),
        )
    )


@query(
    "q27_pack_bins",
    f"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / {PACK_CAPACITY}) AS BIGINT) AS bin_id
    FROM cum
    """,
)
def q27(spark, sf):
    """Sequence packing: assign documents to ~PACK_CAPACITY-token bins
    for LLM training batches — bin = floor(preceding-cumulative-tokens
    / capacity) over a deterministic doc order, computed with the
    two-pass DISTRIBUTED prefix sum (pack_bins): per-range windows run
    in parallel; only the per-range totals visit the driver. The
    DuckDB oracle is the straightforward single-window formulation —
    identical math."""
    d = t(spark, sf, "documents")
    n_tokens = F.when(F.trim("text") == "", 0).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))).cast("long")
    return pack_bins(d.select("doc_id", n_tokens.alias("n_tokens")))


VOCAB_TOP = 50


@query(
    "q28_vocab_df",
    f"""
    SELECT term, df FROM (
        SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM (
            SELECT DISTINCT doc_id, tok AS term FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM documents) WHERE tok <> ''
        ) GROUP BY term
    ) ORDER BY df DESC, term ASC LIMIT {VOCAB_TOP}
    """,
)
def q28(spark, sf):
    """Vocabulary statistics: the TOP_N terms by document frequency
    (stopword discovery / tokenizer-vocab seeding). Pure integer
    ordering with a term tiebreak — exact across engines. One explode
    + distinct + count; the shuffle carries (term, doc) pairs with
    map-side partial distinct."""
    d = t(spark, sf, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                     .alias("term"))
            .where(F.col("term") != "")
            .distinct())
    return (toks.groupBy("term")
            .agg(F.count("*").cast("bigint").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(VOCAB_TOP))


@query(
    "q29_doc_specificity",
    """
    WITH toks AS (
        SELECT doc_id, tok AS term FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents) WHERE tok <> ''
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM toks),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM toks GROUP BY doc_id, term),
    idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
            FROM toks GROUP BY term)
    SELECT tf.doc_id AS doc_id,
           round(sum(tf.tf * ln((n.n_docs + 1) / (idf.df + 1))), 4)
               AS tfidf_sum,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM tf JOIN idf ON tf.term = idf.term, n
    GROUP BY tf.doc_id, n.n_docs
    """,
)
def q29(spark, sf):
    """Per-document TF-IDF mass (specificity score): sum over the
    doc's terms of tf * ln((N+1)/(df+1)) — high for documents made of
    rare vocabulary, low for stopword soup; a standard quality /
    diversity signal for corpus curation. The ln inputs are exact
    integers in both engines so the double arithmetic agrees to
    ~1 ulp; the sum is rounded to 4dp. Shuffles: one (doc, term) tf
    agg, one term df agg (broadcast back), one doc-level sum."""
    d = t(spark, sf, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                     .alias("term"))
            .where(F.col("term") != ""))
    n_docs = toks.select("doc_id").distinct().count()
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf"))
    idf = F.broadcast(toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")))
    return (
        tf.join(idf, "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("tf") * F.log(
                (F.lit(float(n_docs)) + 1) / (F.col("df") + 1))), 4)
            .alias("tfidf_sum"),
            F.count("*").cast("bigint").alias("n_terms"),
        )
    )


@query(
    "q21_text_profile",
    r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit_cnt,
           CAST(length(text) - length(replace(lower(text), ' the ', '')) AS BIGINT)
               AS stopword_signal,
           CAST(length(text) AS BIGINT) AS len_chars,
           lang AS lang_true,
           CASE
             WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
             WHEN de_score >= fr_score THEN 'de'
             ELSE 'fr'
           END AS lang_pred,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
    FROM (
      SELECT *,
        (length(' ' || lower(text) || ' ')
         - length(regexp_replace(' ' || lower(text) || ' ', ' (the|and|of) ', ' ', 'g'))) AS en_score,
        (length(' ' || lower(text) || ' ')
         - length(regexp_replace(' ' || lower(text) || ' ', ' (der|und|die) ', ' ', 'g'))) AS de_score,
        (length(' ' || lower(text) || ' ')
         - length(regexp_replace(' ' || lower(text) || ' ', ' (le|et|la) ', ' ', 'g'))) AS fr_score
      FROM documents
    )
    """,
)
def q21_profile(spark, sf):
    """Per-document TEXT PROFILE: token count, quality signals
    (punctuation / digit / stopword counts, length), heuristic language
    ID, and normalized fingerprint — the four per-doc text operators
    (q21-q24, kept as pytest-checked extras) fused into ONE scan. At
    100 TB this is how a curation pipeline actually runs: every per-doc
    metric in a single pass over the text column, all native JVM
    expressions inside one WholeStageCodegen span, zero shuffles."""
    d = t(spark, sf, "documents")
    n_tokens = F.when(F.trim("text") == "", 0).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+")))
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    stop = F.length("text") - F.length(
        F.replace(F.lower("text"), F.lit(" the "), F.lit("")))
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))

    def score(words):
        pat = " (" + "|".join(words) + ") "
        return F.length(padded) - F.length(F.regexp_replace(padded, pat, " "))

    en, de, fr = score(_MARKERS["en"]), score(_MARKERS["de"]), score(_MARKERS["fr"])
    pred = (F.when((en >= de) & (en >= fr), "en")
            .when(de >= fr, "de").otherwise("fr"))
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        punct.cast("long").alias("punct_cnt"),
        digits.cast("long").alias("digit_cnt"),
        stop.cast("long").alias("stopword_signal"),
        F.length("text").cast("long").alias("len_chars"),
        F.col("lang").alias("lang_true"),
        pred.alias("lang_pred"),
        fp.alias("fp"),
    )


# --- corpus-hygiene operators (extras tier: pytest-oracle-checked) ------
# The gate registry is capped at 50 driver entries (see operators/
# __init__); these register as extras — same oracle-parity contract,
# enforced by tests/test_oracle_parity.py.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -]?[0-9]{0,4}"


def scrub_pii(col):
    """Redact emails, IPv4 addresses, and international phone numbers
    with typed placeholder tokens — the standard pre-training scrub
    pass. Order matters (emails first: their local parts can contain
    digits that the phone pattern would mangle). Pure regexp_replace
    chain: stays in codegen, one projection."""
    c = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_IP, "<IP>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


@query(
    "q80_pii_scrub",
    driver=False,
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '{PII_EMAIL}', '', 'g'))
                AS BIGINT) AS email_chars,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_IP}', '<IP>', 'g'),
               '\\+[0-9]{{1,3}}[ -][0-9]{{2,4}}[ -][0-9]{{3,4}}[ -]?[0-9]{{0,4}}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def q80(spark, sf):
    """PII scrubbing: the redacted text is md5'd so the full scrub
    output is value-checked against the oracle without shipping it."""
    d = t(spark, sf, "documents")
    email_chars = (F.length("text")
                   - F.length(F.regexp_replace("text", PII_EMAIL, "")))
    return d.select(
        "doc_id",
        email_chars.cast("bigint").alias("email_chars"),
        F.md5(scrub_pii(F.col("text"))).alias("scrubbed_md5"),
    )


@query(
    "q81_repetition_ratio",
    driver=False,
    oracle=r"""
    WITH lines AS (
        SELECT doc_id, ln FROM (
            SELECT doc_id, unnest(string_split(text, '. ')) AS ln
            FROM documents) WHERE trim(ln) <> ''
    ),
    per AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(DISTINCT ln) AS BIGINT) AS n_distinct_lines
        FROM lines GROUP BY doc_id
    )
    SELECT doc_id, n_lines, n_distinct_lines,
           (n_lines - n_distinct_lines) AS n_repeated
    FROM per
    """,
)
def q81(spark, sf):
    """Within-document repetition (Gopher-style quality rule): split
    into sentence-ish units, count exact repeats. Emitted as exact
    integers (n_lines / n_distinct / n_repeated) — the ratio is
    derivable and integer ratios hit cross-engine rounding ties
    (CLAUDE.md). One explode + two-level agg, map-side combinable."""
    d = t(spark, sf, "documents")
    lines = (d.select("doc_id",
                      F.explode(F.split("text", r"\. ")).alias("ln"))
             .where(F.trim("ln") != ""))
    return (lines.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.countDistinct("ln").cast("bigint").alias("n_distinct_lines"))
        .select("doc_id", "n_lines", "n_distinct_lines",
                (F.col("n_lines") - F.col("n_distinct_lines"))
                .alias("n_repeated")))


CONTAM_K = 5  # word n-gram width for contamination matching


@query(
    "q82_contamination",
    driver=False,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, i, tok FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
                   generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS i
            FROM documents) WHERE tok <> ''
    ),
    grams AS (
        SELECT a.doc_id,
               a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' ' || e.tok AS g
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                    JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
                    JOIN toks d ON d.doc_id = a.doc_id AND d.i = a.i + 3
                    JOIN toks e ON e.doc_id = a.doc_id AND e.i = a.i + 4
    ),
    bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 7
    )
    SELECT gr.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
    FROM grams gr LEFT JOIN bench b ON gr.g = b.g
    WHERE gr.doc_id % 100 <> 7
    GROUP BY gr.doc_id
    """,
)
def q82(spark, sf):
    """Benchmark-contamination check: word 5-gram overlap between the
    corpus and a held-out 'benchmark' set (here: every 100th doc, as a
    deterministic stand-in for an eval suite). The real-pipeline shape:
    benchmark grams are the SMALL side -> broadcast; the corpus side
    streams one exploded gram scan through a broadcast-hash lookup —
    no shuffle of corpus grams at all. Emits per-doc gram counts +
    contaminated-gram counts (drop/flag policy is downstream's call)."""
    d = t(spark, sf, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0] — short docs
    # must yield an empty gram array, not a bogus slice
    grams_arr = F.expr(
        f"CASE WHEN size(__t) >= {CONTAM_K} THEN "
        f"transform(sequence(1, size(__t) - {CONTAM_K - 1}), "
        f"i -> array_join(slice(__t, i, {CONTAM_K}), ' ')) "
        f"ELSE array() END")
    grams = (d.select("doc_id", toks.alias("__t"))
             .select("doc_id", F.explode(grams_arr).alias("g")))
    bench = (grams.where(F.col("doc_id") % 100 == 7)
             .select("g").distinct()
             .withColumn("__hit", F.lit(1)))
    return (
        grams.where(F.col("doc_id") % 100 != 7)
        .join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_grams"),
             F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
             .cast("bigint").alias("n_contaminated"))
    )


@query(
    "q84_fuzzy_vocab",
    driver=False,
    oracle=r"""
    WITH terms AS (
        SELECT DISTINCT tok AS term FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
            FROM documents) WHERE tok <> ''
    ),
    keyed AS (
        SELECT term, length(term) AS k FROM terms
        UNION ALL
        SELECT term, length(term) + 1 AS k FROM terms
    )
    SELECT DISTINCT a.term AS term_a, b.term AS term_b,
           CAST(levenshtein(a.term, b.term) AS BIGINT) AS dist
    FROM keyed a JOIN keyed b ON a.k = b.k AND a.term < b.term
    WHERE levenshtein(a.term, b.term) <= 1
    """,
)
def q84(spark, sf):
    """Fuzzy vocabulary join: pairs of distinct corpus terms within
    edit distance 1 (typo/variant detection for vocab cleanup). An
    edit-distance join is not an equi-join, so candidates come from a
    LENGTH BAND encoded as equi-keys: every term emits keys len and
    len+1, and any pair with |len_a - len_b| <= 1 collides on some key
    — the self-join shuffles (term, key) only, never all pairs; exact
    levenshtein filters the collisions. The same length-banding carries
    any bounded-distance d (emit keys len..len+d). Both engines run the
    identical plan, so the gate is fully hash-checked."""
    d = t(spark, sf, "documents")
    terms = (d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                      .alias("term"))
             .where(F.col("term") != "").distinct())
    keyed = terms.select("term", F.length("term").alias("k")).unionByName(
        terms.select("term", (F.length("term") + 1).alias("k")))
    a = keyed.select(F.col("term").alias("term_a"), "k")
    b = keyed.select(F.col("term").alias("term_b"), F.col("k").alias("k2"))
    return (
        a.join(b, (F.col("k") == F.col("k2"))
               & (F.col("term_a") < F.col("term_b")))
        .where(F.levenshtein("term_a", "term_b") <= 1)
        .select("term_a", "term_b",
                F.levenshtein("term_a", "term_b").cast("bigint").alias("dist"))
        .distinct()
    )


@query(
    "q85_unigram_logprob",
    driver=False,
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, tok AS term FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
            FROM documents) WHERE tok <> ''
    ),
    total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
    lm AS (SELECT term, CAST(count(*) AS DOUBLE) AS cnt FROM toks GROUP BY term)
    SELECT t.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln(lm.cnt / total.n)) / count(*), 4) AS avg_logprob
    FROM toks t JOIN lm ON lm.term = t.term, total
    GROUP BY t.doc_id
    """,
)
def q85(spark, sf):
    """Unigram language-model scoring: per-document mean token
    log-probability under the corpus's own unigram distribution — the
    classic perplexity-style quality/outlier filter (documents full of
    rare tokens score low; stopword soup scores high). The LM is a
    corpus-wide term-count table, BROADCAST back onto the token stream;
    the ln inputs are exact integer ratios in both engines, so the
    4dp-rounded mean absorbs sum-order differences (same recipe as
    q29's TF-IDF). Shuffles: one term-count agg + one per-doc sum."""
    d = t(spark, sf, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                     .alias("term"))
            .where(F.col("term") != ""))
    total = float(toks.count())
    lm = F.broadcast(toks.groupBy("term").agg(
        F.count("*").cast("double").alias("cnt")))
    return (
        toks.join(lm, "term")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_tokens"),
             F.round(F.sum(F.log(F.col("cnt") / F.lit(total)))
                     / F.count("*"), 4).alias("avg_logprob"))
    )


# target acceptance rate per language stratum (16^8-granular md5
# thresholds; module literals so both engines inline the same CASE)
MIX_TARGETS = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.125, "it": 0.75}
MIX_SEED = "mix42"


def _mix_threshold_hex(p: float) -> str:
    return format(min(int(p * 16**8), 16**8 - 1), "08x")


@query(
    "q86_mix_rebalance",
    driver=False,
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               substring(md5('{MIX_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h,
               CASE {' '.join(f"WHEN lang = '{k}' THEN '{_mix_threshold_hex(v)}'" for k, v in MIX_TARGETS.items())}
                    ELSE '00000000' END AS thr
        FROM documents
    ) WHERE h < thr
    """,
)
def q86(spark, sf):
    """Training-mix rebalancing: deterministic per-stratum downsampling
    to target rates (keep ~TARGET[lang] of each language). The draw is
    md5(seed:doc_id) compared against an 8-hex-digit threshold — a
    seeded Bernoulli that is reproducible across engines, runs, and
    partition layouts (rand() is not), and STABLE under corpus growth:
    a doc's keep/drop never changes when other docs arrive, so
    incremental pipeline runs stay consistent. Pure projection +
    filter, no shuffle; complements q26's exact-quota sampling."""
    d = t(spark, sf, "documents")
    h = F.substring(F.md5(F.concat(F.lit(f"{MIX_SEED}:"),
                                   F.col("doc_id").cast("string"))), 1, 8)
    thr = F.lit("00000000")
    for k, v in MIX_TARGETS.items():
        thr = F.when(F.col("lang") == k,
                     F.lit(_mix_threshold_hex(v))).otherwise(thr)
    return d.select("doc_id", "lang").where(h < thr)


BLOOM_M = 1 << 16   # bloom bits (string bitmap literal); ~10 bits/key
BLOOM_K = 3         # probes per key


def bloom_prefilter(keyed, block, key: str = "h",
                    m: int = BLOOM_M, k: int = BLOOM_K):
    """Scan-side bloom prefilter: keep only ``keyed`` rows whose key
    MIGHT be in ``block`` (no false negatives), as a pure codegen
    filter — zero shuffle of the big side.

    The filter is a from-scratch bloom over xxhash64(key, seed): the
    bit positions of the (small) block side are collected (bounded by
    k * |block| ints — at a blocklist too big for that collect, build
    the bitmap distributively instead: groupBy bit-word, bit_or masks,
    assemble) and baked into ONE m-char '0'/'1' string literal; each
    probe is substring(bitmap, pos+1, 1) — O(1) byte slice in codegen.
    Catalyst keeps the whole predicate in the scan stage."""
    pos_cols = [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)).alias("p")
                for i in range(k)]
    pos = {r["p"] for r in
           block.select(F.explode(F.array(*pos_cols)).alias("p"))
           .distinct().collect()}
    bitmap = "".join("1" if i in pos else "0" for i in range(m))
    cond = F.lit(True)
    for i in range(k):
        probe = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) + 1
        cond = cond & (F.substring(F.lit(bitmap), probe.cast("int"), 1)
                       == "1")
    return keyed.where(cond)


@query(
    "q89_bloom_blocklist",
    driver=False,
    oracle="""
    WITH d AS (
        SELECT doc_id, md5(substring(text, 1, 32)) AS h FROM documents
    ),
    block AS (SELECT DISTINCT h FROM d WHERE doc_id % 7 = 0)
    SELECT d.doc_id AS doc_id, d.h AS h
    FROM d JOIN block b ON d.h = b.h
    WHERE d.doc_id % 7 <> 0
    """,
)
def q89(spark, sf):
    """Blocklist decontamination with a BLOOM prefilter: corpus docs
    whose 32-char-prefix fingerprint appears in a reference "already
    trained / benchmark" set (every 7th doc, deterministic stand-in).

    100-TB shape: when the blocklist is too large to broadcast, the
    exact semi-join would shuffle the ENTIRE corpus on the hash key.
    Instead the blocklist is folded into a Spark-native bloom filter
    (``bloom_filter_agg``, one small binary blob broadcast to every
    task) and ``might_contain`` prefilters the corpus IN THE SCAN
    STAGE — only the ~fpp fraction of non-matching rows plus the true
    matches reach the exact join, so the shuffle carries survivors,
    not the corpus. The bloom is a SUPERSET prefilter (no false
    negatives by construction), and the exact join re-verifies every
    survivor — so the output is exact, and the DuckDB oracle is a
    plain join: fully hash-checkable despite the probabilistic
    intermediate."""
    d = t(spark, sf, "documents")
    # prefix fingerprint (copied headers/boilerplate), not the full-text
    # hash — the corpus has almost no byte-exact dups, and a vacuous
    # 0-row gate proves nothing
    hashed = d.select("doc_id",
                      F.md5(F.substring("text", 1, 32)).alias("h"))
    block = (hashed.where(F.col("doc_id") % 7 == 0)
             .select("h").distinct())
    corpus = hashed.where(F.col("doc_id") % 7 != 0)
    pref = bloom_prefilter(corpus, block)
    # exact re-verify: the semi join shuffles only bloom survivors
    return (pref.join(block.hint("shuffle_merge"), "h", "left_semi")
            .select("doc_id", "h"))
