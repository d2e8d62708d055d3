"""Shared word-n-gram builders — ONE formulation, both engines.

Used by decontam_ngram_overlap / dedup_ngram_jaccard /
dedup_near_cluster_keep_best (queries/textops.py, queries/analytics.py)
and pipeline_curate_corpus (queries/pipeline.py); keeping the Spark
Column and the DuckDB SQL snippet side by side here is what keeps the
composition key and its constituent keys in lockstep.

A round-12 review finding motivated this module: the previously inline
DuckDB snippets built grams with concat(w[i], ' ', w[i+1], ...), which
on sub-n-word texts skips NULL words but KEEPS the separators ('a b '
for a 2-word doc), while Spark's array_join(slice(...)) drops them
('a b') — a latent cross-engine hash divergence masked by the >= n-word
fixtures.  The SQL below uses list_slice + array_to_string, which
matches Spark's slice + array_join exactly on every length, including
empty tokens and empty text — pinned by the cross-engine fuzz in
tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def ngrams_sql(w: str, n: int) -> str:
    """DuckDB side: words-list expression -> list of word n-grams (one
    partial gram for docs under n words — list_slice clamps, matching
    Spark's slice/array_join)."""
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' '))"
    )


def word_ngrams(words_col: str, n: int) -> F.Column:
    """Spark side: words-array column name -> array of word n-grams
    (one partial gram for docs under n words, mirroring ngrams_sql)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words_col) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(words_col, i, n), " "),
    )


# Trigram shorthands (the decontamination / near-dup shape).
TRIGRAMS_SQL = ngrams_sql("{w}", 3)


def word_trigrams(words_col: str) -> F.Column:
    return word_ngrams(words_col, 3)
