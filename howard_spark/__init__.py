"""howard_spark — a PySpark-native columnar analytics + lightweight-compression engine.

A from-scratch re-expression of the capabilities of
bioinfo-chru-strasbourg/howard (reference at /root/reference, read-only)
on Spark's DataFrame/SQL engine, centered on a per-column-chunk
lightweight-compression layer (dict, RLE, FSST, bit-pack,
frame-of-reference) with codec auto-selection — see SURVEY.md.
"""

__version__ = "0.1.0"
