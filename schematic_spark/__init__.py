"""schematic_spark — a PySpark-native schema + constraint validation engine.

Brand-new engine (not a port) with the query/validation semantics of
``typeable/schematic`` compiled to Spark Catalyst expressions and
vectorized pandas/Arrow UDFs, plus the table-level constraint suite the
north rule mandates: per-column stats, uniqueness, referential integrity,
and distribution drift over Iceberg/parquet tables of interleaved
text+media documents.
"""

__version__ = "0.1.0"
