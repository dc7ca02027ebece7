"""extann gene-file -> BED-like database converter (reference
from_extann.py:1-391): refgene span derivation, the three transcript
modes (all / longest / chosen+fallback), value replacement, '.'
filling, genomic sort, embedded header + .hdr sidecar."""

import gzip

import pytest

from howard_spark.sources.from_extann import (
    extann_to_bed,
    read_extann,
)

REFGENE = """\
#CHROM\tSTART\tEND\tname\ttranscript\tstrand\texon
chr1\t100\t200\tBRCA1\tNM_1\t+\t1
chr1\t300\t900\tBRCA1\tNM_1\t+\t2
chr1\t100\t400\tBRCA1\tNM_2\t+\t1
chr10\t50\t80\tTP53\tNM_3\t-\t1
chr2\t10\t70\tEGFR\tNM_4\t+\t1
"""

EXTANN = """\
genes\tpanel\tscore
BRCA1\tcancer\t9
TP53\tcancer;core\t.
UNKNOWN\tnone\t1
"""


@pytest.fixture()
def paths(tmp_path):
    rg = tmp_path / "refgene.tsv"
    rg.write_text(REFGENE)
    ex = tmp_path / "extann.tsv"
    ex.write_text(EXTANN)
    return str(ex), str(rg)


def test_mode_all_spans_per_transcript(spark, paths):
    ex, rg = paths
    rows = read_extann(spark, ex, rg, mode="all",
                       extra_cols=["strand"]).collect()
    got = {(r["genes"], r["#CHROM"], int(r["START"]), int(r["END"]))
           for r in rows}
    # NM_1 span 100-900 (min START, max END over exon rows), NM_2 100-400
    assert ("BRCA1", "chr1", 100, 900) in got
    assert ("BRCA1", "chr1", 100, 400) in got
    assert ("TP53", "chr10", 50, 80) in got
    # unmatched genes are dropped (reference logs and skips)
    assert not any(g == "UNKNOWN" for g, *_ in got)
    by_gene = {r["genes"]: r for r in rows}
    assert by_gene["TP53"]["strand"] == "-"
    assert by_gene["TP53"]["score"] == "."  # null -> '.'


def test_mode_longest_picks_max_span(spark, paths):
    ex, rg = paths
    rows = {r["genes"]: r for r in read_extann(
        spark, ex, rg, mode="longest").collect()}
    assert int(rows["BRCA1"]["END"]) == 900  # NM_1 (800) beats NM_2 (300)
    assert len(rows) == 2


def test_mode_chosen_with_fallback(spark, paths):
    ex, rg = paths
    tr = spark.createDataFrame(
        [("BRCA1", "NM_2")], "gene string, transcript string")
    rows = {r["genes"]: r for r in read_extann(
        spark, ex, rg, mode="chosen", transcripts=tr).collect()}
    assert int(rows["BRCA1"]["END"]) == 400   # chosen NM_2
    assert int(rows["TP53"]["END"]) == 80     # fallback: longest


def test_replace_map(spark, paths):
    ex, rg = paths
    rows = {r["genes"]: r for r in read_extann(
        spark, ex, rg, mode="longest",
        replace={";": ","}).collect()}
    assert rows["TP53"]["panel"] == "cancer,core"


def test_extann_to_bed_file_contract(spark, paths, tmp_path):
    ex, rg = paths
    out = str(tmp_path / "extann.bed")
    df = extann_to_bed(spark, ex, rg, out, mode="all",
                       extra_cols=["strand"],
                       info_meta={"panel": {"Type": "String",
                                            "Description": "gene panel"}})
    text = open(out).read().splitlines()
    assert text[0] == "##fileformat=VCFv4.4"
    assert any(line.startswith('##INFO=<ID=panel,Number=1,Type=String,'
                               'Description="gene panel">') for line in text)
    assert any(line == "##reference=hg19" for line in text)
    hdr_idx = next(i for i, line in enumerate(text) if line.startswith("#CHROM\t"))
    assert text[hdr_idx].split("\t")[:3] == ["#CHROM", "START", "END"]
    body = text[hdr_idx + 1:]
    assert len(body) == df.count() == 3  # BRCA1 x2 transcripts + TP53
    # genomic sort: chr1 rows before chr10 (natural order)
    chroms = [line.split("\t")[0] for line in body]
    assert chroms == ["chr1", "chr1", "chr10"]
    # .hdr sidecar mirrors the embedded header
    assert open(out + ".hdr").read().splitlines()[0] == "##fileformat=VCFv4.4"


def test_extann_to_bed_gz(spark, paths, tmp_path):
    ex, rg = paths
    out = str(tmp_path / "extann.bed.gz")
    extann_to_bed(spark, ex, rg, out, mode="longest")
    with gzip.open(out, "rt") as fh:
        lines = fh.read().splitlines()
    assert lines[0] == "##fileformat=VCFv4.4"
    assert open(out, "rb").read(4) == b"\x1f\x8b\x08\x04"  # BGZF container
