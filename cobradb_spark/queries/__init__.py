"""Operator implementations, grouped by SURVEY.md §2 sections.

Importing cobradb_spark.registry.all_queries() pulls these modules in;
each module registers its queries via @register(name, oracle=...).
"""
