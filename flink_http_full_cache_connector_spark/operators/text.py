"""Text analysis operators for large-scale training-data pipelines.

Beyond the reference surface (SURVEY.md §2.D): language-ID, quality
scoring, token counting, document fingerprinting — all expressed with
built-in ``pyspark.sql.functions`` only (JVM-side, whole-stage codegen; no
Python in the per-row path), over the ``documents`` table.

Every operator has a DuckDB oracle twin registered alongside; formulas are
written with engine-portable primitives (md5, replace-based substring
counting, same-order arithmetic, portable ``trunc6``) so the two engines
produce identical values.

Scale: all operators are embarrassingly partition-parallel (per-row
``select``; no shuffle, no driver materialization) — they stream through
100 TB as fast as the scan goes.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve against globals
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_http_full_cache_connector_spark.functions.rounding import duck_trunc6, trunc6
from flink_http_full_cache_connector_spark.operators.scale import widen
from flink_http_full_cache_connector_spark.plans.registry import load_table, register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents widened to cluster parallelism — the md5/replace-chain
    per-row work is CPU-bound and a single-file input would pin one core."""
    return widen(load_table(spark, sf_dir, "documents"))

# ---------------------------------------------------------------------------
# column-level building blocks
# ---------------------------------------------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace token count (regex split, trim first)."""
    return F.size(F.split(F.trim(text), r"\s+"))


#: BPE-ish tokenizer regex: letter runs, digit runs, single punctuation —
#: the class-based pattern evaluates identically under Java regex (Spark)
#: and RE2 (DuckDB)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Approximate subword token count via the BPE-ish regex."""
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def occurrences(text: Column, needle: str) -> Column:
    """Portable substring-occurrence count via the replace trick
    (identical semantics in Spark and DuckDB: no regex involved)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def _padded(text: Column) -> Column:
    # pad so word-boundary markers match at string edges
    return F.concat(F.lit(" "), F.trim(text), F.lit(" "))


#: language marker words for the n-gram/stopword heuristic (word-boundary
#: padded, counted with the replace trick on both engines)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "es": [" el ", " la ", " de ", " los ", " que "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "zh": [" de ", " shi ", " le ", " zai ", " you "],
}

#: deterministic priority order for arg-max ties (both engines use the same
#: CASE ladder, so ties resolve identically)
LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]

STOPWORDS = [" the ", " a ", " and ", " of ", " to "]
PUNCT = [".", ",", "!", "?", ";"]


def lang_scores(text: Column) -> dict[str, Column]:
    padded = _padded(text)
    return {
        lang: sum(occurrences(padded, m) for m in markers).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Arg-max language with deterministic tie-break; 'und' when no marker hits."""
    scores = lang_scores(text)
    total = sum(scores.values())
    max_score = F.greatest(*[scores[o] for o in LANG_PRIORITY])
    # CASE ladder in priority order: first lang hitting the max wins ties —
    # built inside-out, so the highest-priority WHEN ends up outermost,
    # matching the oracle's forward CASE ladder.
    result = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        result = F.when((total > 0) & (scores[lang] == max_score), F.lit(lang)).otherwise(
            result
        )
    return result


def quality_components(text: Column) -> dict[str, Column]:
    ntok = token_count(text)
    nchars = F.length(text)
    nonspace = F.length(F.replace(text, F.lit(" "), F.lit("")))
    padded = _padded(text)
    stop_hits = sum(occurrences(padded, s) for s in STOPWORDS)
    punct_hits = sum(occurrences(text, p) for p in PUNCT)
    return {
        "n_tokens": ntok.cast("long"),
        "avg_token_len": trunc6(nonspace / ntok),
        "stopword_ratio": trunc6(stop_hits / ntok),
        "punct_ratio": trunc6(punct_hits / nchars),
    }


def quality_score(text: Column) -> Column:
    """Deterministic heuristic in [0,1]: length sweet-spot + stopword signal
    + punctuation sanity.  Same-order arithmetic on both engines."""
    c = quality_components(text)
    ntok = c["n_tokens"]
    length_term = F.least(ntok / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(c["stopword_ratio"] * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(c["punct_ratio"] * F.lit(10.0), F.lit(1.0))
    return trunc6(
        length_term * F.lit(0.5) + stop_term * F.lit(0.3) + punct_term * F.lit(0.2)
    )


def md5_fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over token hashes (content-defined
    fingerprint; stable under trailing-whitespace noise).

    ``h = fold(tokens, h*131 + tokenhash mod p)`` with init = first token
    hash — matching DuckDB's ``list_reduce`` (first element as init).  All
    intermediates < 2^63 so no overflow on either engine.
    """
    p = 2147483647  # 2^31 - 1
    tok_hashes = F.transform(
        F.split(F.trim(text), r"\s+"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % p,
    )
    return F.aggregate(
        F.slice(tok_hashes, 2, F.size(tok_hashes) - 1),
        F.element_at(tok_hashes, 1),
        lambda acc, x: (acc * 131 + x) % p,
    )


# ---------------------------------------------------------------------------
# registered queries (oracle twins in DuckDB dialect)
# ---------------------------------------------------------------------------

_DUCK_TOKENS = r"string_split_regex(trim(text), '\s+')"


@register(
    "text_token_count",
    rf"""
    SELECT doc_id, n_chars, len({_DUCK_TOKENS})::bigint AS n_tokens,
           len(regexp_extract_all(text, '{BPE_PATTERN}'))::bigint AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex subword count "
    "(scan-only, no shuffle).",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        "n_chars",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def _duck_occ(padded: str, needle: str) -> str:
    n = len(needle)
    return f"((length({padded}) - length(replace({padded}, '{needle}', ''))) // {n})"


def duck_lang_expr() -> str:
    """DuckDB expression twin of :func:`lang_id` (reusable in composites)."""
    padded = "(' ' || trim(text) || ' ')"
    scores = {
        lang: "(" + " + ".join(_duck_occ(padded, m) for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }
    total = "(" + " + ".join(scores.values()) + ")"
    all_scores = ", ".join(scores.values())
    ladder = " ".join(
        f"WHEN {scores[lang]} = greatest({all_scores}) THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    return f"(CASE WHEN {total} > 0 THEN (CASE {ladder} END) ELSE 'und' END)"


def _duck_lang_sql() -> str:
    return f"""
    SELECT doc_id, lang AS lang_label, {duck_lang_expr()} AS lang_pred
    FROM documents
    """


@register(
    "text_lang_id",
    _duck_lang_sql(),
    doc="Language-ID: marker-word n-gram heuristic, deterministic arg-max ladder.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        lang_id(F.col("text")).alias("lang_pred"),
    )


def duck_quality_expr() -> str:
    """DuckDB expression twin of :func:`quality_score` (reusable)."""
    padded = "(' ' || trim(text) || ' ')"
    ntok = rf"len({_DUCK_TOKENS})"
    stop = "(" + " + ".join(_duck_occ(padded, s) for s in STOPWORDS) + ")"
    punct = "(" + " + ".join(_duck_occ("text", p) for p in PUNCT) + ")"
    return duck_trunc6(
        f"least({ntok} / 64.0, 1.0) * 0.5"
        f" + least({duck_trunc6(f'{stop} / {ntok}')} * 4.0, 1.0) * 0.3"
        f" + (1.0 - least({duck_trunc6(f'{punct} / length(text)')} * 10.0, 1.0)) * 0.2"
    )


def _duck_quality_sql() -> str:
    padded = "(' ' || trim(text) || ' ')"
    ntok = rf"len({_DUCK_TOKENS})"
    nonspace = "length(replace(text, ' ', ''))"
    stop = "(" + " + ".join(_duck_occ(padded, s) for s in STOPWORDS) + ")"
    punct = "(" + " + ".join(_duck_occ("text", p) for p in PUNCT) + ")"
    return f"""
    SELECT doc_id,
           {ntok}::bigint AS n_tokens,
           {duck_trunc6(f'{nonspace} / {ntok}')} AS avg_token_len,
           {duck_trunc6(f'{stop} / {ntok}')} AS stopword_ratio,
           {duck_trunc6(f'{punct} / length(text)')} AS punct_ratio,
           {duck_quality_expr()} AS quality
    FROM documents
    """


@register(
    "text_quality_score",
    _duck_quality_sql(),
    doc="Quality scoring: length/stopword/punctuation heuristics, one scan-side select.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    text = F.col("text")
    c = quality_components(text)
    return docs.select(
        "doc_id",
        c["n_tokens"].alias("n_tokens"),
        c["avg_token_len"].alias("avg_token_len"),
        c["stopword_ratio"].alias("stopword_ratio"),
        c["punct_ratio"].alias("punct_ratio"),
        quality_score(text).alias("quality"),
    )


@register(
    "text_normalize",
    r"""
    SELECT doc_id,
           trim(regexp_replace(nfc_normalize(text), '[ \t\n\r\f\v]+', ' ', 'g'))
               AS normalized
    FROM documents
    """,
    doc="Unicode NFC + whitespace-collapse normalization via an Arrow-batched "
    "pandas UDF (the canonical pre-tokenization cleanup step); oracle uses "
    "DuckDB's utf8proc nfc_normalize — verified byte-identical.",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    # explicit ASCII whitespace class: Python re and RE2 agree on it, unlike
    # \s (Python matches unicode spaces, RE2 does not)
    ws = re.compile(r"[ \t\n\r\f\v]+")

    @pandas_udf("string")
    def nfc_clean(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: ws.sub(" ", unicodedata.normalize("NFC", t)).strip()
            if t is not None
            else None
        )

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", nfc_clean(F.col("text")).alias("normalized"))


@register(
    "text_vocabulary",
    rf"""
    WITH toks AS (SELECT unnest({_DUCK_TOKENS}) AS tok FROM documents)
    SELECT count(DISTINCT tok)::bigint AS vocab_size,
           count(*)::bigint AS total_tokens,
           min(tok) AS first_token, max(tok) AS last_token
    FROM toks
    """,
    doc="Corpus vocabulary stats: DISTINCT aggregation over exploded tokens — "
    "partial counts combine map-side; the distinct shuffle keys on the "
    "(uniform) token itself.",
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    return toks.agg(
        F.countDistinct("tok").alias("vocab_size"),
        F.count("*").alias("total_tokens"),
        F.min("tok").alias("first_token"),
        F.max("tok").alias("last_token"),
    )


@register(
    "text_fingerprint",
    rf"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp_md5,
           list_reduce(
             list_transform({_DUCK_TOKENS},
               t -> ('0x' || substr(md5(t), 1, 8))::bigint % 2147483647),
             (acc, x) -> (acc * 131 + x) % 2147483647
           ) AS fp_rolling
    FROM documents
    """,
    doc="Document fingerprinting: md5 of normalized text + polynomial rolling hash over token hashes.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        md5_fingerprint(F.col("text")).alias("fp_md5"),
        rolling_hash(F.col("text")).alias("fp_rolling"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# engine-portable regexes: plain character classes + bounded quantifiers
# parse identically under Java regex (Spark) and RE2 (DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()-]{7,}[0-9]"


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone numbers (order matters: email local parts
    can contain digit runs a phone pattern would otherwise claim)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    )


@register(
    "text_pii_scrub",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}'))::int AS n_emails,
           len(regexp_extract_all(text, '{PHONE_RE}'))::int AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g')) AS scrub_fp
    FROM documents
    """,
    doc="PII scrubbing: redact emails/phones with portable regexes, count "
    "matches; scrubbed text compared via md5. Map-side only (scan-speed); "
    "redaction semantics pinned by crafted-text unit tests.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_em, n_ph = pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        F.md5(scrub_pii(F.col("text"))).alias("scrub_fp"),
    )


# ---------------------------------------------------------------------------
# corpus-wide n-gram statistics
# ---------------------------------------------------------------------------

TOP_BIGRAMS = 20


@register(
    "text_top_bigrams",
    f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents),
    grams AS (
        SELECT unnest(list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1])) AS bigram
        FROM toks
    )
    SELECT bigram, count(*)::bigint AS cnt
    FROM grams GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT {TOP_BIGRAMS}
    """,
    doc=f"Corpus-wide top-{TOP_BIGRAMS} bigrams: explode adjacent token "
    "pairs, partial-agg count, global exact top-k (TakeOrderedAndProject — "
    "k rows per partition reach the driver, never the full histogram).",
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = docs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(TOP_BIGRAMS)
    )


# ---------------------------------------------------------------------------
# corpus governance report
# ---------------------------------------------------------------------------

@register(
    "corpus_report",
    f"""
    SELECT source, lang,
           count(*)::bigint AS docs,
           sum(n_chars)::bigint AS total_chars,
           sum(len({_DUCK_TOKENS}))::bigint AS total_tokens,
           min({duck_quality_expr()}) AS min_quality,
           max({duck_quality_expr()}) AS max_quality,
           sum(CASE WHEN {duck_lang_expr()} = lang THEN 1 ELSE 0 END)::bigint
               AS langid_agree
    FROM documents
    GROUP BY source, lang
    """,
    doc="Corpus governance report: per (source, declared-lang) volume, "
    "token totals, quality envelope, and lang-ID agreement with the "
    "declared label — one scan, one low-cardinality partial-agg shuffle; "
    "integer sums only (exact).",
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    text = F.col("text")
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            token_count(text).alias("ntok"),
            quality_score(text).alias("q"),
            (lang_id(text) == F.col("lang")).cast("long").alias("agree"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("ntok").alias("total_tokens"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
            F.sum("agree").alias("langid_agree"),
        )
    )


CHUNK_TOKENS = 16
CHUNK_STRIDE = 12


@register(
    "text_chunks_udtf",
    rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        FROM documents
    ),
    starts AS (
        SELECT doc_id, ts,
               unnest(range(0, greatest(len(ts), 1), {CHUNK_STRIDE})) AS start
        FROM toks
    )
    SELECT doc_id, (start // {CHUNK_STRIDE})::int AS chunk_idx,
           array_to_string(ts[start + 1 : start + {CHUNK_TOKENS}], ' ')
               AS chunk_text,
           least({CHUNK_TOKENS}, len(ts) - start)::int AS n_tokens
    FROM starts WHERE len(ts) - start > 0
    """,
    doc=f"Python UDTF surface (Spark 4 user-defined TABLE function, "
    "Arrow-batched via useArrow=True): "
    f"sliding-window document chunking ({CHUNK_TOKENS} tokens, stride "
    f"{CHUNK_STRIDE}) as a LATERAL table function — one doc fans out to "
    "overlapping context-window rows, the shape every pretraining/RAG "
    "pipeline runs before tokenization. The UDTF is the sanctioned escape "
    "hatch for fan-out transforms that genuinely need Python (real BPE "
    "tokenizers, model-based segmenters); this one is whitespace-token "
    "windowing on purpose so the DuckDB oracle can replay it exactly and "
    "pin the plumbing (window starts, overlap, tail handling, token "
    "counts). Embarrassingly parallel: no shuffle, Arrow batches, "
    "per-row independent.",
)
def text_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int", useArrow=True)
    class ChunkDoc:
        def eval(self, text: str):  # noqa: ANN001
            toks = (text or "").split()
            for start in range(0, max(len(toks), 1), CHUNK_STRIDE):
                n = min(CHUNK_TOKENS, len(toks) - start)
                if n > 0:
                    yield (
                        start // CHUNK_STRIDE,
                        " ".join(toks[start : start + CHUNK_TOKENS]),
                        n,
                    )

    spark.udtf.register("chunk_doc", ChunkDoc)
    widen(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents_udtf_src"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents_udtf_src d, LATERAL chunk_doc(d.text) c
        """
    )


BOILERPLATE_MIN_DF = 3


@register(
    "boilerplate_shingles",
    f"""
    WITH sh AS (
        SELECT doc_id, unnest({{shingles}}) AS s FROM documents
    )
    SELECT s AS shingle, count(*)::bigint AS df,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM sh GROUP BY s HAVING count(*) >= {BOILERPLATE_MIN_DF}
    """.format(shingles="list_distinct(list_transform(range(1, len(string_split_regex(trim(text), '\\s+'))-1), i -> string_split_regex(trim(text), '\\s+')[i] || ' ' || string_split_regex(trim(text), '\\s+')[i+1] || ' ' || string_split_regex(trim(text), '\\s+')[i+2]))"),
    doc=f"Boilerplate detection: 3-gram shingles appearing in >= "
    f"{BOILERPLATE_MIN_DF} distinct documents — navigation chrome, "
    "licenses, and templates that inflate near-dup candidate volume and "
    "poison containment scores. The output IS the stop-shingle list the "
    "containment/minhash passes cap df with at real scale. One "
    "uniform-key shuffle; per-doc shingles are pre-distincted so df "
    "counts documents, not occurrences.",
)
def boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_http_full_cache_connector_spark.operators.dedup import (
        word_shingles,
    )

    docs = widen(load_table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", F.explode(word_shingles(F.col("text"))).alias("s"))
    return (
        sh.groupBy(F.col("s").alias("shingle"))
        .agg(
            F.count("*").alias("df"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .where(F.col("df") >= BOILERPLATE_MIN_DF)
    )


@register(
    "text_token_gini",
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
               x -> x <> '')) AS t
        FROM documents
    ),
    cnts AS (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY doc_id, t),
    agg AS (
        SELECT doc_id, sum(c)::bigint AS total, sum(c * c)::bigint AS sum_sq,
               count(*)::bigint AS distinct_toks
        FROM cnts GROUP BY doc_id
    )
    SELECT doc_id, total AS n_tokens, distinct_toks,
           round(1.0 - sum_sq::double / (total * total)::double, 6)
               AS token_gini
    FROM agg
    """,
    doc="Repetitiveness scoring without libm: per-document token Gini "
    "impurity 1 - Σc²/N² (≈0 for a document repeating one token, →1 for "
    "all-distinct) — the log-free stand-in for token entropy, used by "
    "cleaning pipelines to drop degenerate/spammy text. Both Σc² and N "
    "are INTEGERS, so the only float op is one final division — "
    "engine-exact by construction, no float-summation order anywhere. "
    "Two partial-agg shuffles on uniform (doc, token) / doc keys.",
)
def text_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        ).alias("t"),
    )
    cnts = toks.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    agg = cnts.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        F.count("*").alias("distinct_toks"),
    )
    gini = F.lit(1.0) - F.col("sum_sq").cast("double") / (
        (F.col("total") * F.col("total")).cast("double")
    )
    return agg.select(
        "doc_id",
        F.col("total").alias("n_tokens"),
        "distinct_toks",
        F.round(gini, 6).alias("token_gini"),
    )
