"""Shared language-ID stopword lexicons + hit-count builders — ONE
formulation, both engines.

text_lang_id (queries/textops.py) and the language-gate stage of
pipeline_curate_corpus (queries/pipeline.py) must score documents with
the IDENTICAL lexicons and the IDENTICAL whitespace-token membership
count, or the composition key silently drifts from its constituent key.
Promoted from queries/textops.py privates (round-13, ADVICE item) so
the contract is an explicit public module, like cobradb_spark/ngrams.py
and cobradb_spark/buckets.py.

The lexicons are tiny fixed lists of the highest-frequency function
words per language — the classic cheap lang-ID signal.  At 100 TB the
hit count is a pure per-row array HOF (no shuffle, full codegen); a
production n-gram model swaps the lexicons for trigram tables with the
same plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EN = ("the", "a", "and", "of", "to", "in", "is")
DE = ("der", "die", "das", "und", "ist", "mit", "ein")
ES = ("el", "la", "de", "que", "y", "los", "un")


def hits(words_col, lex: tuple[str, ...]) -> F.Column:
    """Spark side: count of words in `words_col` (array column or
    Column) that belong to `lex`."""
    return F.size(F.filter(words_col, lambda x: x.isin(*lex))).cast("long")


def hits_sql(lex: tuple[str, ...], col: str = "text") -> str:
    """DuckDB side: same count over str_split(col, ' ') — `col`
    parameterized to mirror the Spark builder (ADVICE r13: a consumer
    scoring a differently named column must not silently diverge)."""
    inlist = ", ".join(f"'{w}'" for w in lex)
    return f"len(list_filter(str_split({col}, ' '), x -> x IN ({inlist})))"
