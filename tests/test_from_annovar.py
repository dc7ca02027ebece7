"""ANNOVAR text -> parquet database converter (reference
from_annovar.py:208-1091): header synonym detection, headerless
positional naming, identifier sanitization, type probing, the '-'
indel convention, chromosome fixing, multi-variant INFO aggregation,
and the parquet + .hdr sidecar contract — then the converted database
annotates through annotate_equi with golden probes."""

import pytest

from howard_spark.functions.info import explode_info
from howard_spark.operators.variants import annotate_equi
from howard_spark.sources.from_annovar import (
    annovar_to_parquet,
    read_annovar,
    sniff_annovar_header,
)
from howard_spark.sources.readers import parse_vcf_info_fields


HEADERED = """\
#Chr\tStart\tRef\tAlt\tGERP++\tdbSNP\tnote
1\t100\tA\tT\t2.5\trs1\tbenign
1\t100\tA\tT\t2.5\trs1b\tlikely;benign
2\t200\tG\t-\t.\trs2\tdeletion
MT\t300\t-\tTT\t1\trs3\tinsertion
"""

HEADERLESS = """\
chr5\t500\t.\tC\tG\t0.12\thigh
chr5\t501\t.\tC\tA\t.\tlow
"""


@pytest.fixture()
def headered(tmp_path):
    p = tmp_path / "anno.txt"
    p.write_text(HEADERED)
    return str(p)


def test_sniff_header_synonyms(headered):
    cols, skip = sniff_annovar_header(headered)
    assert cols[:4] == ["#CHROM", "POS", "REF", "ALT"]
    assert skip == 1
    # sanitization: '+' removed, '.' would become '_'
    assert "GERP" in cols and "dbSNP" in cols and "note" in cols


def test_sniff_headerless(tmp_path):
    p = tmp_path / "db.txt"
    p.write_text(HEADERLESS)
    cols, skip = sniff_annovar_header(str(p), database_name="mydb")
    assert cols == ["#CHROM", "POS", "ID", "REF", "ALT", "mydb", "mydb_2"]
    assert skip == 0


def test_read_annovar_semantics(spark, headered):
    df, info_fields = read_annovar(spark, headered)
    rows = {(r["#CHROM"], r["POS"]): r for r in df.collect()}

    # chromosome fixing: 'chr' prefix, MT->M
    assert set(r[0] for r in rows) == {"chr1", "chr2", "chrM"}

    # multi-variant: chr1:100 has two annotation lines -> one row,
    # distinct values comma-joined, ';' inside values -> ','
    v = rows[("chr1", 100)]
    assert v["REF"] == "A" and v["ALT"] == "T"
    assert "GERP=2.5" in v["INFO"]
    assert "dbSNP=rs1,rs1b" in v["INFO"]
    assert "note=benign,likely,benign" in v["INFO"]  # ';'->',' then agg

    # '-' deletion: POS-1, REF gets the N anchor
    d = rows[("chr2", 199)]
    assert d["REF"] == "NG" and d["ALT"] == "N"
    # GERP was '.' (missing) on this line -> key absent from INFO
    assert "GERP=" not in d["INFO"]

    # '-' insertion: POS-1, ALT gets the N anchor
    i = rows[("chrM", 299)]
    assert i["REF"] == "N" and i["ALT"] == "NTT"

    # type probing: GERP numeric -> Float, others String
    types = {f["ID"]: f["Type"] for f in info_fields}
    assert types["GERP"] == "Float"
    assert types["dbSNP"] == "String"


def test_headerless_types_and_info(spark, tmp_path):
    p = tmp_path / "db.txt"
    p.write_text(HEADERLESS)
    df, info_fields = read_annovar(spark, str(p), database_name="mydb")
    types = {f["ID"]: f["Type"] for f in info_fields}
    assert types == {"mydb": "Float", "mydb_2": "String"}
    r = {row["POS"]: row for row in df.collect()}
    assert r[500]["INFO"] == "mydb=0.12;mydb_2=high"
    assert r[501]["INFO"] == "mydb_2=low"  # null numeric skipped


def test_annovar_to_parquet_and_annotate(spark, tmp_path, headered):
    out = str(tmp_path / "anno.parquet")
    info_fields = annovar_to_parquet(spark, headered, out,
                                     multi_variant="auto")
    db = spark.read.parquet(out)
    assert db.count() == 3

    # .hdr sidecar declares every annotation as an INFO tag
    declared = parse_vcf_info_fields(out + ".hdr")
    assert [f["ID"] for f in declared] == [f["ID"] for f in info_fields]

    # annotate a variants table through annotate_equi (J1): explode the
    # database INFO back to columns, join on the variant key
    fields = [f["ID"] for f in info_fields]
    ann = explode_info(db, "INFO", fields, prefix="")
    variants = spark.createDataFrame(
        [("chr1", 100, ".", "A", "T", "DP=7"),
         ("chr9", 1, ".", "C", "G", "DP=9")],
        "`#CHROM` string, POS bigint, ID string, REF string, "
        "ALT string, INFO string")
    got = {r["#CHROM"]: r["INFO"]
           for r in annotate_equi(variants, ann, fields=fields).collect()}
    assert "GERP=2.5" in got["chr1"] and "dbSNP=rs1,rs1b" in got["chr1"]
    assert got["chr9"] == "DP=9"  # no match -> untouched
