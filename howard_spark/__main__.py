"""Command-line surface mirroring the reference's tools
(/root/reference/howard/main.py dispatch, howard/tools/*.py):

  python -m howard_spark query      --input f.parquet --query "SELECT ..."
  python -m howard_spark stats      --input f.vcf
  python -m howard_spark convert    --input f.vcf --output f.parquet
  python -m howard_spark annotation --input f.vcf --annotations db.parquet --output out.tsv
  python -m howard_spark encode     --input f.parquet --output enc_dir [--keys a,b]
  python -m howard_spark decode     --input enc_dir --schema-from f.parquet --output out.parquet
  python -m howard_spark calculation --input f --operations VARTYPE,BARCODE --samples S1,S2 --output out
  python -m howard_spark hgvs       --input f --refgene tx.txt --genome g.tsv --output out
  python -m howard_spark prioritization --input f --criteria c.json --output out
  python -m howard_spark minimalize --input f.vcf --output out.vcf --minimalize-info --minimalize-samples
  python -m howard_spark plugin     --plugins-dir plugins/ [--list | --name X --input f --output out]
  python -m howard_spark from-annovar   --input anno.txt --output db.parquet
  python -m howard_spark from-extann    --input genes.tsv --refgene rg.tsv --output db.bed

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

    k = sub.add_parser("calculation", help="named calculations (ref calculation tool)")
    k.add_argument("--input", required=True)
    k.add_argument("--operations", required=True, help="comma-separated names, see --list")
    k.add_argument("--samples", default=None, help="comma-separated sample columns")
    k.add_argument("--output", required=True)

    h = sub.add_parser("hgvs", help="HGVS annotation (ref hgvs tool)")
    h.add_argument("--input", required=True)
    h.add_argument("--refgene", required=True, help="refGene/genePredExt file")
    h.add_argument("--genome", required=True,
                   help="genome TSV: either 'chrom\tseq' rows or 'chrom\tstart\tend\tseq' windows")
    h.add_argument("--output", required=True)
    h.add_argument("--use-gene", action="store_true")
    h.add_argument("--use-exon", action="store_true")
    h.add_argument("--use-version", action="store_true")
    h.add_argument("--add-protein", action="store_true")
    h.add_argument("--full-format", action="store_true")

    z = sub.add_parser("prioritization", help="profile-criteria scoring (ref prioritization tool)")
    z.add_argument("--input", required=True)
    z.add_argument("--criteria", required=True, help="JSON list of criterion dicts")
    z.add_argument("--output", required=True)

    pr = sub.add_parser("process",
                        help="param-JSON pipeline: annotate/calculate/"
                             "prioritize/query/export (ref process tool)")
    pr.add_argument("--input", required=True)
    pr.add_argument("--param", required=True, help="param JSON path")
    pr.add_argument("--output", default=None,
                    help="overrides param['output']['path']")

    pl = sub.add_parser("plugin", help="list or run user plugins "
                                       "(ref plugin loader contract)")
    pl.add_argument("--plugins-dir", required=True)
    pl.add_argument("--list", action="store_true")
    pl.add_argument("--name", default=None)
    pl.add_argument("--input", default=None)
    pl.add_argument("--output", default=None)
    pl.add_argument("--args", default=None, help="JSON kwargs for the plugin")

    mi = sub.add_parser("minimalize",
                        help="blank INFO/ID/QUAL/FILTER, strip samples "
                             "to GT, or drop samples (ref minimalize plugin)")
    mi.add_argument("--input", required=True)
    mi.add_argument("--output", required=True)
    mi.add_argument("--minimalize-info", action="store_true")
    mi.add_argument("--minimalize-id", action="store_true")
    mi.add_argument("--minimalize-qual", action="store_true")
    mi.add_argument("--minimalize-filter", action="store_true")
    mi.add_argument("--minimalize-samples", action="store_true")
    mi.add_argument("--remove-samples", action="store_true")
    mi.add_argument("--explode-infos", default=None,
                    help="comma-separated INFO fields to explode first")

    fa = sub.add_parser("from-annovar",
                        help="ANNOVAR text table -> parquet db + .hdr (ref from_annovar tool)")
    fa.add_argument("--input", required=True)
    fa.add_argument("--output", required=True)
    fa.add_argument("--database-name", default=None)
    fa.add_argument("--multi-variant", default="auto",
                    help="auto | enable | disable")
    fa.add_argument("--partition-by", default=None)

    fe = sub.add_parser("from-extann",
                        help="gene-file + refgene -> BED-like db + .hdr (ref from_extann tool)")
    fe.add_argument("--input", required=True)
    fe.add_argument("--refgene", required=True)
    fe.add_argument("--output", required=True)
    fe.add_argument("--mode", default="all", choices=["all", "longest", "chosen"])
    fe.add_argument("--transcripts", default=None,
                    help="TSV with gene/transcript columns (mode=chosen)")
    fe.add_argument("--extra-cols", default=None,
                    help="comma-separated refgene columns to carry")
    fe.add_argument("--param", default=None,
                    help="JSON with optional 'replace' map and 'info_meta'")
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
    elif args.cmd == "calculation":
        from .functions.calculations import apply_calculation

        df = read_table(spark, args.input)
        samples = args.samples.split(",") if args.samples else []
        for op in args.operations.split(","):
            kw = {"samples": samples} if samples else {}
            df = apply_calculation(df, op.strip(), **kw)
        write_table(df, args.output)
        print(f"wrote {args.output}")
    elif args.cmd == "hgvs":
        from .functions.hgvs import DictGenome, IntervalGenome, read_transcripts
        from .operators.hgvs_spark import annotate_hgvs

        with open(args.refgene) as fh:
            transcripts = read_transcripts(fh)
        with open(args.genome) as fh:
            first = fh.readline()
        if first and len(first.rstrip("\n").split("\t")) >= 4:
            genome = IntervalGenome.from_file(args.genome)
        else:
            chroms = {}
            with open(args.genome) as fh:
                for line in fh:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) >= 2:
                        chroms[parts[0]] = parts[1]
            genome = DictGenome(chroms)
        df = read_table(spark, args.input)
        cols = {c.upper(): c for c in df.columns}
        out = annotate_hgvs(
            df, transcripts, genome,
            chrom_col=cols.get("#CHROM", cols.get("CHROM", "chrom")),
            pos_col=cols.get("POS", "pos"),
            ref_col=cols.get("REF", "ref"),
            alt_col=cols.get("ALT", "alt"),
            use_gene=args.use_gene, use_exon=args.use_exon,
            use_version=args.use_version, add_protein=args.add_protein,
            full_format=args.full_format,
        )
        write_table(out, args.output)
        print(f"wrote {args.output}")
    elif args.cmd == "prioritization":
        from .operators.variants import Criterion, prioritize

        with open(args.criteria) as fh:
            crits = [Criterion(**c) for c in json.load(fh)]
        df = prioritize(read_table(spark, args.input), crits)
        write_table(df, args.output)
        print(f"wrote {args.output}")
    elif args.cmd == "process":
        with open(args.param) as fh:
            param = json.load(fh)
        if args.output:
            param.setdefault("output", {})["path"] = args.output
        eng = Engine(spark, input_path=args.input)
        out = eng.process(param)
        if out is not None and not param.get("output"):
            print(out.limit(20).toPandas().to_string(index=False))
        if param.get("output"):
            print(f"wrote {param['output']['path']}")
    elif args.cmd == "plugin":
        from .plugins import discover_plugins, run_plugin

        if args.list or not args.name:
            for n, m in discover_plugins(args.plugins_dir).items():
                flag = "enabled " if m["enabled"] else "disabled"
                print(f"{flag} {n} {m.get('__version__') or ''} — "
                      f"{m.get('__description__') or ''}")
        else:
            kw = json.loads(args.args) if args.args else {}
            eng = Engine(spark, input_path=args.input)
            out = run_plugin(args.plugins_dir, args.name, eng, **kw)
            eng = out if isinstance(out, Engine) else eng
            if args.output:
                eng.export(args.output)
                print(f"wrote {args.output}")
    elif args.cmd == "minimalize":
        eng = Engine(spark, input_path=args.input)
        eng.minimalize(
            info=args.minimalize_info, id=args.minimalize_id,
            qual=args.minimalize_qual, filter=args.minimalize_filter,
            samples=args.minimalize_samples,
            remove_samples=args.remove_samples,
            explode_infos_fields=(args.explode_infos.split(",")
                                  if args.explode_infos else None),
        )
        eng.export(args.output)
        print(f"wrote {args.output}")
    elif args.cmd == "from-annovar":
        from .sources.from_annovar import annovar_to_parquet

        info = annovar_to_parquet(
            spark, args.input, args.output,
            database_name=args.database_name,
            multi_variant=args.multi_variant,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
        )
        print(f"wrote {args.output} (+.hdr, {len(info)} INFO fields)")
    elif args.cmd == "from-extann":
        from .sources.from_extann import extann_to_bed

        param = {}
        if args.param:
            with open(args.param) as fh:
                param = json.load(fh)
        transcripts = None
        if args.transcripts:
            transcripts = (spark.read.option("sep", "\t")
                           .option("header", "true").csv(args.transcripts))
        extann_to_bed(
            spark, args.input, args.refgene, args.output,
            mode=args.mode, transcripts=transcripts,
            extra_cols=args.extra_cols.split(",") if args.extra_cols else None,
            replace=param.get("replace"), info_meta=param.get("info_meta"),
        )
        print(f"wrote {args.output} (+.hdr)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
