"""Text analysis over the ``documents`` table: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Catalyst string expressions (no UDFs) so the 100 TB scan stays
in whole-stage codegen and the DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_raster_spark.functions.norm import r4

# language → characteristic stopwords (padded occurrences counted via
# the replace-length trick, identical semantics in any SQL engine)
LANG_MARKERS = {
    "en": ["the", "and", "of", "with"],
    "fr": ["le", "la", "les", "des"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "los", "las", "una"],
}


def _occurrences(col, needle: str):
    """# of occurrences of ' needle ' in ' '||col||' ' (word-bounded)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    pat = f" {needle} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit("")))) / len(pat)


def lang_scores(docs: DataFrame) -> DataFrame:
    low = F.lower(F.col("text"))
    out = docs.select("doc_id", low.alias("_low"))
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            t = _occurrences(F.col("_low"), w)
            score = t if score is None else score + t
        out = out.withColumn(f"score_{lang}", score.cast("double"))
    return out.drop("_low")


def lang_id(docs: DataFrame, min_score: float = 1.0) -> DataFrame:
    """Best-scoring language, 'unknown' when no marker reaches min_score."""
    s = lang_scores(docs)
    langs = list(LANG_MARKERS)
    best_score = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when(F.col(f"score_{lg}") == best_score, F.lit(lg)).otherwise(pred)
    pred = F.when(best_score >= min_score, pred).otherwise(F.lit("unknown"))
    return s.select("doc_id", pred.alias("lang_pred"), r4(best_score).alias("lang_score"))


TOKEN_SPLIT = "filter(split(trim(text), '[ ]+'), x -> x != '')"


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (≈ chars/4, the common LLM
    rule of thumb) + alnum-word count + a BPE-ish regex segmentation
    count (letter runs / digit runs / single punctuation marks — the
    GPT-2 pre-tokenizer shape, simplified to a dialect both Java regex
    and RE2 execute identically)."""
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        F.size(F.expr(TOKEN_SPLIT)).cast("long").alias("n_ws_tokens"),
        F.size(F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")).cast("long").alias("n_words"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_bpe_est"),
        F.size(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n]', 0)")
        ).cast("long").alias("n_bpe_tokens"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by tf·idf (idf = ln(N/df), raw tf) —
    the classic corpus-statistics op a training-data pipeline uses for
    keyword/topic probes.

    Shape: tokens explode → (doc, term) counts → term document
    frequencies (one aggregation, shuffled on term — high cardinality,
    naturally balanced) → broadcast the tiny corpus size → window top-k
    per doc with deterministic ties (score desc, term asc). No UDF.
    Output: (doc_id, term, tf, score, rank).
    """
    from pyspark.sql.window import Window

    toks = (
        docs.withColumn("tokens", F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"))
        .select("doc_id", F.explode("tokens").alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", r4(F.col("score")).alias("score"),
                F.col("rank").cast("int").alias("rank"))
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality in [0,1]: length band + stopword presence +
    mean word length band (classic cheap pretraining filters)."""
    t = token_stats(docs).alias("t")
    d = docs.alias("d")
    j = d.join(t, F.col("d.doc_id") == F.col("t.doc_id")).select(
        F.col("d.doc_id").alias("doc_id"), "d.text", "t.n_words", "t.n_chars_measured"
    )
    low = F.lower(F.col("text"))
    stop_hits = None
    for w in ["the", "and", "of", "a"]:
        o = _occurrences(low, w)
        stop_hits = o if stop_hits is None else stop_hits + o
    mean_word_len = F.col("n_chars_measured") / F.greatest(F.col("n_words"), F.lit(1))
    len_ok = (F.col("n_words") >= 10) & (F.col("n_words") <= 100000)
    stop_ratio = stop_hits / F.greatest(F.col("n_words"), F.lit(1))
    wl_ok = (mean_word_len >= 3) & (mean_word_len <= 12)
    score = (
        len_ok.cast("double") * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + wl_ok.cast("double") * 0.3
    )
    return j.select(
        "doc_id",
        r4(score).alias("quality"),
        r4(stop_ratio).alias("stopword_ratio"),
        r4(mean_word_len).alias("mean_word_len"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalization-invariant content fingerprint: md5 over the
    lowercased alnum-collapsed text (whitespace/punct-insensitive)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", "")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
