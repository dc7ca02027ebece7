"""find_nomen parity tests — golden values derived by hand from the
reference's loop semantics (/root/reference/howard/functions/
commons.py:560-711)."""

from __future__ import annotations

import pytest

from howard_spark.operators.nomen import find_nomen_df


@pytest.fixture(scope="module")
def hgvs_df(spark):
    rows = [
        # one candidate, full form
        ("chr1", 1, "A", "G", "GENE1:NM_001.2:exon3:c.123A>G:p.Lys41Arg"),
        # NM beats NR (higher base score)
        ("chr1", 2, "C", "T", "GENE2:NR_999.1:n.55C>T,GENE2:NM_777.3:c.55C>T"),
        # preference list outranks NM when ranked (100x bonus)
        ("chr1", 3, "G", "A", "GENE3:NM_111.1:c.1A>T,GENE3:NR_222.1:n.1A>T"),
        # no transcript at all -> GNOMEN only
        ("chr1", 4, "T", "C", "GENE4"),
        # null hgvs
        ("chr1", 5, "A", "C", None),
    ]
    return spark.createDataFrame(
        rows, "`#CHROM` string, POS int, REF string, ALT string, hgvs string"
    )


def test_basic_parse(spark, hgvs_df):
    out = find_nomen_df(hgvs_df).collect()
    r = {x["POS"]: x for x in out}
    assert r[1]["GNOMEN"] == "GENE1"
    assert r[1]["TNOMEN"] == "NM_001" and r[1]["VNOMEN"] == "2"
    assert r[1]["CNOMEN"] == "c.123A>G" and r[1]["PNOMEN"] == "p.Lys41Arg"
    assert r[1]["ENOMEN"] == "exon3"
    assert r[1]["NOMEN"] == "GENE1:NM_001:exon3:c.123A>G:p.Lys41Arg"


def test_nm_beats_nr(spark, hgvs_df):
    r = {x["POS"]: x for x in find_nomen_df(hgvs_df).collect()}
    assert r[2]["TVNOMEN"] == "NM_777.3"
    assert r[2]["CNOMEN"] == "c.55C>T"


def test_preference_list_outranks(spark, hgvs_df):
    # without preference: NM wins
    base = {x["POS"]: x for x in find_nomen_df(hgvs_df).collect()}
    assert base[3]["TVNOMEN"] == "NM_111.1"
    # version-insensitive preference for the NR transcript flips it
    pref = {x["POS"]: x for x in
            find_nomen_df(hgvs_df, transcripts=["NR_222"]).collect()}
    assert pref[3]["TVNOMEN"] == "NR_222.1"
    assert pref[3]["NNOMEN"] == "n.1A>T"


def test_gnomen_only_and_null(spark, hgvs_df):
    r = {x["POS"]: x for x in find_nomen_df(hgvs_df).collect()}
    assert r[4]["GNOMEN"] == "GENE4" and r[4]["TNOMEN"] is None
    assert r[4]["NOMEN"] == "GENE4"
    assert r[5]["NOMEN"] is None or r[5]["NOMEN"] == ""
    assert len(r) == 5  # left join preserved every input row


def test_first_max_wins_on_tie(spark):
    df = spark.createDataFrame(
        [("chr1", 1, "A", "G", "G1:NM_1.1:c.1A>G,G2:NM_2.1:c.2A>G")],
        "`#CHROM` string, POS int, REF string, ALT string, hgvs string",
    )
    r = find_nomen_df(df).first()
    assert r["TVNOMEN"] == "NM_1.1"  # equal scores -> first candidate
