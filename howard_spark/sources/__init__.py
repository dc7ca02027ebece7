"""Sources & sinks: the reference's format surface on Spark readers."""

from .readers import infer_format, read_table, read_vcf
from .writers import write_table

__all__ = ["read_table", "read_vcf", "write_table", "infer_format"]
