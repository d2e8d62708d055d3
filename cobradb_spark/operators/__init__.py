"""Composed operators Spark lacks natively (SURVEY.md §4.3).

Each is a pure-DataFrame composition (no custom Catalyst rules in v1):
merge/upsert, binned interval join, as-of join fallback, MinHash near-dup
join, ANN search, sessionization.
"""
