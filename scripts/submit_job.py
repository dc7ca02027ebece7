"""Minimal ``spark-submit --py-files`` job (the north rule's shipping
contract): encode documents through the SHIPPED howard_spark.zip —
imports resolve from the archive, not the repo checkout — decode, and
sha-verify. Prints one JSON line.

Usage:
    python -c "import shutil; shutil.make_archive('/tmp/howard_spark_pkg','zip',root_dir='.',base_dir='howard_spark')"
    spark-submit --master local[8] --py-files /tmp/howard_spark_pkg.zip \
        scripts/submit_job.py /root/testdata/sf0.001
"""
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = SparkSession.builder.appName("hs-submit-smoke").getOrCreate()
from howard_spark.encode import decode_df, encode_df  # noqa: E402 (from --py-files zip)

d = spark.read.parquet(sys.argv[1] + "/documents.parquet")
enc = encode_df(d, chunk_rows=4096)
dec = decode_df(enc, d.schema)
bad = (dec.select("doc_id", F.sha2("text", 256).alias("a"))
       .join(d.select("doc_id", F.sha2("text", 256).alias("b")), "doc_id")
       .where(F.col("a") != F.col("b")).count())
print(json.dumps({"rows": d.count(), "sha_mismatches": bad}))
spark.stop()
