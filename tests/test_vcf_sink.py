"""VCF sink with header reconstruction (S11 full form): the exported
file must re-parse — the reference's format-validity oracle
(ref tests/test_variants_annotations_parquet.py:104-109, pyVCF
re-parse style)."""

import gzip

from howard_spark.sources.readers import parse_vcf_info_fields, read_vcf
from howard_spark.sources.writers import write_vcf

SCHEMA = ("`#CHROM` string, POS int, ID string, REF string, ALT string, "
          "QUAL double, FILTER string, INFO string")

ROWS = [
    ("chr1", 300, "rs3", "G", "C", 99.0, "PASS", "DP=30;AF=0.1"),
    ("chr1", 100, "rs1", "A", "T", 50.0, "PASS", "DP=10"),
    ("chr2", 200, None, "C", "G", None, "q10", "DP=20"),
]

META = ['##contig=<ID=chr1>', '##contig=<ID=chr2>']
INFO_FIELDS = [
    {"ID": "DP", "Number": "1", "Type": "Integer", "Description": "Depth"},
    {"ID": "AF", "Number": "A", "Type": "Float", "Description": "Allele freq"},
]


def _roundtrip(spark, tmp_path, name):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / name)
    write_vcf(df, path, meta_lines=META, info_fields=INFO_FIELDS)
    return path


def test_vcf_roundtrip(spark, tmp_path):
    path = _roundtrip(spark, tmp_path, "out.vcf")
    with open(path) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    assert "##contig=<ID=chr1>" in lines
    assert any(line.startswith("##INFO=<ID=DP,") for line in lines)
    hdr_idx = next(i for i, line in enumerate(lines) if line.startswith("#CHROM"))
    assert lines[hdr_idx].split("\t")[:4] == ["#CHROM", "POS", "ID", "REF"]
    body = lines[hdr_idx + 1:]
    assert len(body) == 3
    # genomic sort applied
    assert body[0].startswith("chr1\t100") and body[2].startswith("chr2\t200")
    # nulls -> '.'
    assert body[2].split("\t")[2] == "."

    # re-parse with the reader (format-validity oracle)
    back = read_vcf(spark, path)
    assert back.count() == 3
    assert {r["POS"] for r in back.collect()} == {100, 200, 300}
    assert [f["ID"] for f in parse_vcf_info_fields(path)] == ["DP", "AF"]


def test_vcf_gz_roundtrip(spark, tmp_path):
    path = _roundtrip(spark, tmp_path, "out.vcf.gz")
    with gzip.open(path, "rt") as fh:
        first = fh.readline().strip()
    assert first == "##fileformat=VCFv4.2"
    back = read_vcf(spark, path)
    assert back.count() == 3
    rows = {r["POS"]: r for r in back.collect()}
    assert rows[200]["QUAL"] is None  # '.' QUAL round-trips to NULL
    assert rows[100]["REF"] == "A"


def test_vcf_bgzf_roundtrip(spark, tmp_path):
    """BGZF output: gzip-readable AND structured as BGZF blocks
    ('BC' extra subfield + standard EOF marker), the container tabix
    indexes (reference shells out to bgzip, commons.py:2274)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "out.bgzf.vcf.gz")
    write_vcf(df, path, meta_lines=META, info_fields=INFO_FIELDS, bgzf=True)

    raw = open(path, "rb").read()
    assert raw[:4] == b"\x1f\x8b\x08\x04"        # gzip + FEXTRA
    assert raw[12:14] == b"BC"                    # BGZF subfield id
    eof = bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000")
    assert raw.endswith(eof)                      # BGZF EOF marker

    with gzip.open(path, "rt") as fh:             # plain gzip readers work
        lines = fh.read().splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    back = read_vcf(spark, path)
    assert back.count() == 3


def test_bgzf_multi_block(tmp_path):
    from howard_spark.sources.writers import BgzfWriter

    path = str(tmp_path / "big.gz")
    payload = "x" * 200_000  # > 3 blocks
    with BgzfWriter(path) as fh:
        fh.write(payload)
    with gzip.open(path, "rt") as fh:
        assert fh.read() == payload
    # several gzip members present
    assert open(path, "rb").read().count(b"\x1f\x8b\x08\x04") >= 3


def test_vcf_genomic_chrom_collation(spark, tmp_path):
    """O2: chr2 must sort before chr10 (natural/bcftools order), X/Y/M
    after numerics — not lexicographic (ref database.py:2859-2885)."""
    rows = [
        ("chr10", 5, "a", "A", "T", 1.0, "PASS", "DP=1"),
        ("chrX", 1, "b", "A", "T", 1.0, "PASS", "DP=1"),
        ("chr2", 9, "c", "A", "T", 1.0, "PASS", "DP=1"),
        ("chrM", 1, "d", "A", "T", 1.0, "PASS", "DP=1"),
        ("chr2", 3, "e", "A", "T", 1.0, "PASS", "DP=1"),
        ("chrY", 1, "f", "A", "T", 1.0, "PASS", "DP=1"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "collate.vcf")
    write_vcf(df, path)
    with open(path) as fh:
        body = [line for line in fh.read().splitlines()
                if line and not line.startswith("#")]
    order = [(line.split("\t")[0], int(line.split("\t")[1])) for line in body]
    assert order == [("chr2", 3), ("chr2", 9), ("chr10", 5),
                     ("chrX", 1), ("chrY", 1), ("chrM", 1)]


def test_vcf_no_csv_quoting(spark, tmp_path):
    """A field containing a double-quote must be emitted verbatim —
    CSV quoting would corrupt the tab-separated VCF body."""
    rows = [("chr1", 1, "id", "A", "T", 1.0, "PASS",
             'DESC="quoted, with comma"')]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "quotes.vcf")
    write_vcf(df, path)
    with open(path) as fh:
        body = [line for line in fh.read().splitlines()
                if line and not line.startswith("#")]
    assert body[0].split("\t")[7] == 'DESC="quoted, with comma"'
