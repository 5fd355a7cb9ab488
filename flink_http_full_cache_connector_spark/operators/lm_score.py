"""Unigram language-model scoring — the perplexity-proxy quality filter.

The standard cheap quality gate of an LLM data pipeline (the CCNet /
Gopher recipe uses a KenLM n-gram model; the unigram form is its
join-free distributed skeleton): train token frequencies on the corpus
itself, then score each document by its mean token surprisal
``-log p(w)``.  Gibberish and boilerplate both surface as outliers —
gibberish scores high (rare tokens), degenerate repetition scores low.

Scale design: the model is a TOP-K vocabulary (K = LM_VOCAB_K) with
add-one smoothing for out-of-vocabulary tokens.  Scoring joins exploded
corpus tokens against the vocab — on the raw Zipf-skewed word key that
join would be the classic skew-killer, so the vocab is capped at K rows
and BROADCAST: scoring becomes map-side, shuffle-free (one partial-agg
doc_id shuffle to re-assemble per-doc means).  K is a constant knob
(64k-256k in practice), independent of corpus size.

Exactness: ln() on bit-identical doubles may differ by 1 ulp across
engines (libm vs JVM); per-token surprisals sum ~1e2-1e4 terms, keeping
the drift far below the trunc6 pin — the same contract tfidf_top_terms
has shipped green since round 1.  Top-K vocabulary ties break
deterministically (freq desc, then word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_http_full_cache_connector_spark.functions.rounding import duck_trunc6, trunc6
from flink_http_full_cache_connector_spark.operators.scale import widen
from flink_http_full_cache_connector_spark.plans.registry import load_table, register
from flink_http_full_cache_connector_spark.functions.tokenize import TOKEN_DELIM_RE

#: vocabulary cap: constant-size model, broadcastable at any corpus SF.
LM_VOCAB_K = 50_000


@register(
    "text_surprisal_lm",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w
        FROM documents
    ),
    toks_ne AS (SELECT doc_id, w FROM toks WHERE length(w) > 0),
    vocab AS (
        SELECT w, count(*)::bigint AS freq
        FROM toks_ne GROUP BY w
        ORDER BY freq DESC, w LIMIT {LM_VOCAB_K}
    ),
    n_total AS (SELECT sum(freq)::bigint AS n FROM vocab),
    scored AS (
        SELECT t.doc_id,
               ln((coalesce(v.freq, 0) + 1)::DOUBLE) AS ln_f
        FROM toks_ne t LEFT JOIN vocab v ON t.w = v.w
    )
    SELECT s.doc_id,
           count(*)::bigint AS n_tokens,
           {duck_trunc6("ln((nt.n + 1)::DOUBLE) - sum(s.ln_f) / count(*)")}
               AS avg_surprisal
    FROM scored s CROSS JOIN n_total nt
    GROUP BY s.doc_id, nt.n
    """,
    doc="Unigram-LM mean surprisal per document (perplexity-proxy quality "
    f"filter): top-{LM_VOCAB_K} corpus vocabulary with add-one OOV "
    "smoothing; score = ln(N+1) - mean ln(freq+1). The vocab is "
    "constant-size by construction and broadcasts, so scoring is "
    "map-side over the exploded token stream — no join on the "
    "Zipf-skewed raw word key; one doc_id partial-agg shuffle "
    "re-assembles per-doc means. trunc6-pinned floats (tfidf "
    "precedent).",
)
def text_surprisal_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), TOKEN_DELIM_RE)).alias("w")
    ).where(F.length("w") > 0)
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(LM_VOCAB_K)
        .persist()
    )
    n_total = vocab.agg(F.sum("freq").alias("n"))
    scored = toks.join(F.broadcast(vocab), "w", "left").select(
        "doc_id",
        F.log((F.coalesce(F.col("freq"), F.lit(0)) + 1).cast("double")).alias("ln_f"),
    )
    return (
        scored.join(F.broadcast(n_total))
        .groupBy("doc_id", "n")
        .agg(F.count("*").alias("n_tokens"), F.sum("ln_f").alias("sum_ln"))
        .select(
            "doc_id",
            "n_tokens",
            trunc6(
                F.log((F.col("n") + 1).cast("double"))
                - F.col("sum_ln") / F.col("n_tokens")
            ).alias("avg_surprisal"),
        )
    )
