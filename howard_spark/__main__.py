"""Command-line surface mirroring the reference's tools
(/root/reference/howard/main.py dispatch, howard/tools/*.py):

  python -m howard_spark query      --input f.parquet --query "SELECT ..."
  python -m howard_spark stats      --input f.vcf
  python -m howard_spark convert    --input f.vcf --output f.parquet
  python -m howard_spark annotation --input f.vcf --annotations db.parquet --output out.tsv
  python -m howard_spark encode     --input f.parquet --output enc_dir [--keys a,b]
  python -m howard_spark decode     --input enc_dir --schema-from f.parquet --output out.parquet

Ships with `spark-submit --py-files howard_spark.zip` unchanged — the
module only ever talks to the active SparkSession.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="howard_spark")
    p.add_argument("--cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="ad-hoc SQL over the input (view: variants)")
    q.add_argument("--input", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--output")
    q.add_argument("--limit", type=int, default=20)

    s = sub.add_parser("stats", help="headline variant stats")
    s.add_argument("--input", required=True)

    c = sub.add_parser("convert", help="format conversion (vcf/csv/tsv/psv/bed/json/parquet)")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--order-by", default=None)
    c.add_argument("--partition-by", default=None)

    a = sub.add_parser("annotation", help="annotate from parquet/BED databases")
    a.add_argument("--input", required=True)
    a.add_argument("--annotations", required=True, help="comma-separated db paths")
    a.add_argument("--output", required=True)

    e = sub.add_parser("encode", help="encode through the codec storage layer")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--keys", default=None, help="comma-separated sort keys")
    e.add_argument("--npartitions", type=int, default=None)
    e.add_argument("--no-resume", action="store_true")

    d = sub.add_parser("decode", help="decode an encoded dir back to parquet")
    d.add_argument("--input", required=True)
    d.add_argument("--schema-from", required=True, help="file with the original schema")
    d.add_argument("--output", required=True)
    d.add_argument("--columns", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .session import get_spark

    spark = get_spark(app=f"howard_spark-{args.cmd}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    from .engine import Engine
    from .sources import read_table, write_table

    if args.cmd == "query":
        eng = Engine(spark, input_path=args.input)
        df = eng.query(args.query)
        if args.output:
            write_table(df, args.output)
        else:
            print(df.limit(args.limit).toPandas().to_string(index=False))
    elif args.cmd == "stats":
        print(json.dumps(Engine(spark, input_path=args.input).stats(), indent=2))
    elif args.cmd == "convert":
        df = read_table(spark, args.input)
        write_table(
            df, args.output,
            order_by=args.order_by.split(",") if args.order_by else None,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
        )
        print(f"wrote {args.output}")
    elif args.cmd == "annotation":
        eng = Engine(spark, input_path=args.input)
        for db in args.annotations.split(","):
            eng.annotation(db)
        eng.export(args.output)
        print(f"wrote {args.output}")
    elif args.cmd == "encode":
        df = read_table(spark, args.input)
        keys = args.keys.split(",") if args.keys else list(df.columns[:2])
        from .checkpoint import encode_to_dir

        m = encode_to_dir(df, args.output, keys=keys,
                          npartitions=args.npartitions, resume=not args.no_resume)
        print(json.dumps(m, indent=2))
    elif args.cmd == "decode":
        from .checkpoint import read_encoded
        from .encode import decode_df

        schema = read_table(spark, args.schema_from).schema
        cols = args.columns.split(",") if args.columns else None
        dec = decode_df(read_encoded(spark, args.input), schema, columns=cols)
        dec.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
