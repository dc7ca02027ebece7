"""Deterministic synthetic genome + transcripts for HGVS tests/gates.

A 600bp chromosome 'chrT' built from a repeating ACGT pattern with
hand-placed motifs (start codon, codon 2, a 6bp A-run for indel
justification, a delins site), plus two transcripts:

  TX1 (+): tx [10,400), cds [130,340), exons [10,70) + [100,400)
           -> c.1 at genomic 131, 60bp exon1, intron 71..100 (1-based)
  TX2 (-): tx [450,580), cds [470,560), single exon
           -> c.1 at genomic 560 (minus strand)

Expected HGVS names for the demo variants are hand-derived in
tests/test_hgvs.py and pinned as the q60 gate oracle.
"""

from __future__ import annotations

from .hgvs import DictGenome, TranscriptModel


def demo_genome() -> DictGenome:
    base = list("ACGT" * 150)  # 600 bp

    def patch(pos1: int, s: str) -> None:
        for i, ch in enumerate(s):
            base[pos1 - 1 + i] = ch

    patch(131, "ATG")            # start codon (c.1-3)
    patch(134, "CAG")            # codon 2 = Gln
    patch(148, "CCAAAAAAGG")     # 150-155 = A-run, C/G fences
    patch(160, "CT")             # delins site (c.30_31)
    return DictGenome({"chrT": "".join(base)})


def demo_transcripts() -> dict[str, TranscriptModel]:
    tx1 = TranscriptModel(
        name="TX1", version=None, gene="GENE1", chrom="chrT", strand="+",
        tx_start=10, tx_end=400, cds_start=130, cds_end=340,
        exons=[(10, 70), (100, 400)],
    )
    tx2 = TranscriptModel(
        name="TX2", version=None, gene="GENE2", chrom="chrT", strand="-",
        tx_start=450, tx_end=580, cds_start=470, cds_end=560,
        exons=[(450, 580)],
    )
    return {t.name: t for t in (tx1, tx2)}


# (chrom, pos, ref, alt) demo variants exercising each mutation class
DEMO_VARIANTS = [
    ("chrT", 135, "A", "T"),          # exonic SNV, codon 2 -> Gln2Leu
    ("chrT", 120, "T", "C"),          # 5'UTR SNV (c.-11)
    ("chrT", 73, "G", "A"),           # UTR-intron SNV (c.-31+3)
    ("chrT", 345, "A", "G"),          # 3'UTR SNV (c.*5)
    ("chrT", 149, "CA", "C"),         # 1bp del in A-run -> 3'-justified c.25del
    ("chrT", 149, "C", "CA"),         # 1bp ins in A-run -> dup c.25dup
    ("chrT", 149, "CAAAAAA", "C"),    # 6bp del -> length notation c.20_25del6
    ("chrT", 160, "CT", "AG"),        # MNV -> delins c.30_31delCTinsAG
    ("chrT", 500, "T", "C"),          # minus-strand SNV -> revcomp c.61A>G
]
