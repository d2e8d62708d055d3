"""Pluggable source connectors (Spark 4 pyspark.sql.datasource API)."""
