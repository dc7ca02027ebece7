"""HGVS name GENERATION (reference F9): transcript cdna<->genomic
coordinate mapping, VCF->HGVS variant normalization, and HGVS name
formatting — a from-scratch implementation of the public pyhgvs
algorithm as exercised by the reference
(/root/reference/howard/objects/transcript.py:174-405,
/root/reference/howard/objects/hgvs.py:969-1260,
/root/reference/howard/functions/utils.py:339-935,
/root/reference/howard/objects/variant.py:60-379).

Driver-side / kernel-side pure Python: the Spark integration
(operators/hgvs_spark.py) broadcasts the transcript models + genome and
runs this per-row inside a mapInPandas kernel — the one operator class
where per-row Python is justified (deeply branchy string/coord logic
over broadcast lookup structures, no vectorizable core).

Golden parity: tests/test_hgvs.py checks genomic<->cdna conversions and
formatted names against published hg19 coordinates for well-known
transcripts (BRCA1 NM_007294.3, ACADM NM_000016.4, CFTR NM_000492.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# genetic code (standard NCBI table 1), generated — not hand-copied
# ---------------------------------------------------------------------------

_BASES = "TCAG"
_CODE1 = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
CODON_1 = {
    a + b + c: _CODE1[i * 16 + j * 4 + k]
    for i, a in enumerate(_BASES)
    for j, b in enumerate(_BASES)
    for k, c in enumerate(_BASES)
}
_AA3 = {
    "A": "Ala", "R": "Arg", "N": "Asn", "D": "Asp", "C": "Cys",
    "Q": "Gln", "E": "Glu", "G": "Gly", "H": "His", "I": "Ile",
    "L": "Leu", "K": "Lys", "M": "Met", "F": "Phe", "P": "Pro",
    "S": "Ser", "T": "Thr", "W": "Trp", "Y": "Tyr", "V": "Val",
    "*": "*",
}
CODON_3 = {codon: _AA3[aa] for codon, aa in CODON_1.items()}

_COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


# ---------------------------------------------------------------------------
# cDNA coordinates
# ---------------------------------------------------------------------------

CDNA_START = "cdna_start"
CDNA_STOP = "cdna_stop"


@dataclass
class CdnaCoord:
    """HGVS cDNA coordinate: N / -N / *N with optional intronic +M/-M."""

    coord: int = 0
    offset: int = 0
    landmark: str = CDNA_START

    def __str__(self) -> str:
        if self.landmark == CDNA_STOP:
            out = "*" + str(self.coord)
        else:
            out = str(self.coord)
        if self.offset > 0:
            out += "+" + str(self.offset)
        elif self.offset < 0:
            out += str(self.offset)
        return out

    def __eq__(self, other) -> bool:
        return (self.coord, self.offset, self.landmark) == (
            other.coord, other.offset, other.landmark)


# ---------------------------------------------------------------------------
# transcript model (genePred / refGene row)
# ---------------------------------------------------------------------------


@dataclass
class TranscriptModel:
    """Exon structure of one transcript; all genomic spans 0-based
    half-open (UCSC genePred convention); method arguments 1-based."""

    name: str
    version: int | None
    gene: str
    chrom: str
    strand: str  # '+' | '-'
    tx_start: int
    tx_end: int
    cds_start: int
    cds_end: int
    exons: list[tuple[int, int]] = field(default_factory=list)  # ascending

    # -- basics ------------------------------------------------------------

    @property
    def full_name(self) -> str:
        return f"{self.name}.{self.version}" if self.version is not None else self.name

    @property
    def is_coding(self) -> bool:
        return self.cds_end - self.cds_start > 0

    @property
    def ordered_exons(self) -> list[tuple[int, int]]:
        """Exons in transcript order (5'->3' of the transcript)."""
        return self.exons if self.strand == "+" else list(reversed(self.exons))

    # -- transcript positions ----------------------------------------------

    def _tx_position(self, genomic: int) -> int:
        """Position along the spliced transcript of a genomic coordinate
        that falls in an exon (edge-inclusive on the 0-based start, per
        the reference's convention)."""
        acc = 0
        for start, end in self.ordered_exons:
            if start <= genomic <= end:
                pos = genomic - start if self.strand == "+" else end - genomic
                return acc + pos
            acc += end - start
        raise ValueError(f"genomic coordinate {genomic} is not exonic")

    @property
    def start_codon(self) -> int:
        s, e = (self.cds_start, self.cds_end)
        if self.strand == "-":
            s, e = e, s
        return self._tx_position(s)

    @property
    def stop_codon(self) -> int:
        s, e = (self.cds_start, self.cds_end)
        if self.strand == "-":
            s, e = e, s
        return self._tx_position(e)

    def _exon_cdna_pos(self, genomic: int) -> int:
        """1-based cDNA position of an exonic genomic coordinate."""
        acc = 0
        for start, end in self.ordered_exons:
            if start <= genomic <= end:
                pos = genomic - (start + 1) if self.strand == "+" else end - genomic
                return acc + pos + 1
            acc += end - start
        raise ValueError(f"genomic coordinate {genomic} is not exonic")

    # -- genomic -> cdna -----------------------------------------------------

    def genomic_to_cdna(self, genomic: int) -> CdnaCoord:
        """Convert a 1-based genomic coordinate to an HGVS cDNA coord."""
        # signed distance to each exon: 0 inside; >0 exon after; <0 before
        best = None  # (abs_distance, signed_distance, exon)
        for start, end in self.ordered_exons:
            lo, hi = start + 1, end
            if lo <= genomic <= hi:
                d = 0
            else:
                sd, ed = lo - genomic, genomic - hi
                d = sd if abs(sd) < abs(ed) else -ed
            if best is None or abs(d) < best[0]:
                best = (abs(d), d, (start, end))
        if best is None:
            raise ValueError("transcript has no exons")

        min_abs, dist, (estart, eend) = best
        if min_abs:
            nearest = estart + 1 if dist > 0 else eend
            if self.strand == "+":
                dist = -dist
            coord = self._exon_cdna_pos(nearest)
            if genomic < self.tx_start + 1 or genomic > self.tx_end:
                # outside the transcript: fold the distance into the coord
                coord += dist
                dist = 0
            out = CdnaCoord(coord, dist)
        else:
            out = CdnaCoord(self._exon_cdna_pos(genomic), 0)

        if self.is_coding:
            utr5p = self.start_codon
            out.coord -= utr5p
            if out.coord <= 0:
                out.coord -= 1
            else:
                stop = self.stop_codon - utr5p
                if out.coord > stop or (out.coord == stop and out.offset > 0):
                    out.coord -= stop
                    out.landmark = CDNA_STOP
        return out

    # -- cdna -> genomic -----------------------------------------------------

    def cdna_to_genomic(self, coord: CdnaCoord) -> int:
        if coord.landmark == CDNA_START:
            utr5p = self.start_codon if self.is_coding else 0
            cdna_pos = utr5p + coord.coord + (0 if coord.coord > 0 else 1)
        elif coord.landmark == CDNA_STOP:
            if coord.coord < 0:
                raise ValueError("negative coord with stop-codon landmark")
            cdna_pos = self.stop_codon + coord.coord
        else:
            raise ValueError(f"unknown landmark {coord.landmark!r}")

        if cdna_pos < 1:  # 5' flank
            if self.strand == "+":
                return self.tx_start + cdna_pos
            return self.tx_end - cdna_pos + 1

        acc = 0
        for start, end in self.ordered_exons:
            elen = end - start
            if acc + 1 <= cdna_pos <= acc + elen:
                pos = cdna_pos - (acc + 1)
                if self.strand == "+":
                    return start + 1 + pos + coord.offset
                return end - pos - coord.offset
            acc += elen
        # 3' flank (reference anchors this on the CDS end — preserved)
        if self.strand == "+":
            return self.cds_end + coord.coord
        return self.cds_start + 1 - coord.coord

    def find_exon_number(self, genomic: int) -> int | None:
        """1-based exon number (in transcript order) containing genomic."""
        for i, (start, end) in enumerate(self.ordered_exons, start=1):
            if start <= genomic <= end:
                return i
        return None


def parse_genepred(line: str, skip_first_column: bool = True) -> TranscriptModel:
    """One genePred(Ext) row -> TranscriptModel. refGene files carry a
    bin number in column 0 (skip_first_column)."""
    f = line.rstrip("\n").split("\t")
    if skip_first_column:
        f = f[1:]
    name = f[0]
    if "." in name:
        base, _, ver = name.partition(".")
        version: int | None = int(ver)
    else:
        base, version = name, None
    exon_starts = [int(x) for x in f[8].rstrip(",").split(",")]
    exon_ends = [int(x) for x in f[9].rstrip(",").split(",")]
    gene = f[11] if len(f) > 11 else ""
    return TranscriptModel(
        name=base,
        version=version,
        gene=gene,
        chrom=f[1],
        strand=f[2],
        tx_start=int(f[3]),
        tx_end=int(f[4]),
        cds_start=int(f[5]),
        cds_end=int(f[6]),
        exons=sorted(zip(exon_starts, exon_ends)),
    )


def read_transcripts(lines) -> dict[str, TranscriptModel]:
    """Transcripts from refGene/genePredExt lines, keyed by both the
    bare name and the versioned full name."""
    out: dict[str, TranscriptModel] = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        tm = parse_genepred(line)
        out[tm.name] = tm
        out[tm.full_name] = tm
    return out


# ---------------------------------------------------------------------------
# genome access
# ---------------------------------------------------------------------------


class DictGenome:
    """Genome from full chromosome strings: {chrom: sequence}."""

    def __init__(self, chroms: dict[str, str]):
        self._chroms = chroms

    def get(self, chrom: str, start0: int, end0: int) -> str:
        """0-based half-open slice, uppercased; clamps at boundaries."""
        seq = self._chroms.get(str(chrom), "")
        return seq[max(start0, 0):max(end0, 0)].upper()


class IntervalGenome:
    """Genome from recorded (chrom, start0, end0, seq) windows: serves
    any sub-range fully contained in a stored window. Missing ranges
    raise (loud is better than silently wrong names)."""

    def __init__(self, records):
        self._by_chrom: dict[str, list[tuple[int, int, str]]] = {}
        for chrom, s, e, seq in records:
            self._by_chrom.setdefault(str(chrom), []).append((int(s), int(e), seq))
        for v in self._by_chrom.values():
            v.sort()

    @classmethod
    def from_file(cls, path: str) -> "IntervalGenome":
        recs = []
        with open(path) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 4:
                    recs.append((parts[0], int(parts[1]), int(parts[2]), parts[3]))
        return cls(recs)

    def get(self, chrom: str, start0: int, end0: int) -> str:
        start0 = max(start0, 0)
        if end0 <= start0:
            return ""
        for s, e, seq in self._by_chrom.get(str(chrom), []):
            if s <= start0 and end0 <= e:
                return seq[start0 - s:end0 - s].upper()
        raise KeyError(f"no genome window covers {chrom}:{start0}-{end0}")


# ---------------------------------------------------------------------------
# VCF -> HGVS normalization
# ---------------------------------------------------------------------------


def _justify(start0: int, end0: int, indel: str, seq: str, direction: str):
    """Shift an indel left/right through equal flanking bases in seq
    (0-based half-open coordinates within seq)."""
    if not indel:
        return start0, end0, indel
    if direction == "left":
        while start0 > 0 and seq[start0 - 1] == indel[-1]:
            indel = seq[start0 - 1] + indel[:-1]
            start0 -= 1
            end0 -= 1
    else:
        while end0 < len(seq) and seq[end0] == indel[0]:
            indel = indel[1:] + seq[end0]
            start0 += 1
            end0 += 1
    return start0, end0, indel


def normalize_vcf(chrom: str, pos: int, ref: str, alt: str, genome):
    """GATK/VCF normalization: trim shared prefix/suffix, left-align
    indels against the genome, re-pad 1bp. pos is 1-based."""
    start0 = pos - 1
    alleles = [ref, alt]

    # trim common prefix
    minlen = min(map(len, alleles))
    p = 0
    while p < minlen and len({a[p] for a in alleles}) == 1:
        p += 1
    if p:
        start0 += p
        alleles = [a[p:] for a in alleles]
    # trim common suffix
    minlen = min(map(len, alleles))
    s = 0
    while s < minlen and len({a[-(s + 1)] for a in alleles}) == 1:
        s += 1
    if s:
        alleles = [a[:-s] for a in alleles]
    end0 = start0 + len(alleles[0])

    is_indel = any(len(a) != 1 for a in alleles)
    with_seq = [i for i, a in enumerate(alleles) if a]
    if is_indel and len(with_seq) == 1 and genome is not None:
        i = with_seq[0]
        allele = alleles[i]
        flank = 20
        while True:
            seq_start = max(start0 - flank, 0)
            fetch = len(allele) + 2 * flank
            seq = genome.get(chrom, seq_start, seq_start + fetch)
            j0, j1 = start0 - seq_start, start0 - seq_start + len(allele)
            j0n, _, allele = _justify(j0, j1, allele, seq, "left")
            start0 = seq_start + j0n
            end0 = start0 + len(alleles[0])
            if j0n > 0 or seq_start == 0:
                break
        alleles[i] = allele

    needs_pad = is_indel and (
        any(not a for a in alleles)
        or len({a[0] for a in alleles if a}) > 1  # VCF: indel alleles share 1st base
    )
    if needs_pad:
        if genome is None:
            # silently mis-padding would shift coordinates — refuse loudly
            raise ValueError(
                "indel normalization needs a genome (1bp re-pad); "
                "SNV-only callers may pass genome=None"
            )
        # 1bp left pad
        pad = genome.get(chrom, start0 - 1, start0)
        if pad:
            alleles = [pad + a for a in alleles]
            start0 -= 1
        else:
            nxt = genome.get(chrom, end0, end0 + 1)
            alleles = [a + nxt for a in alleles]
            end0 += 1

    return chrom, start0 + 1, alleles[0], alleles[1]


def hgvs_normalize(chrom: str, pos: int, ref: str, alt: str, genome,
                   strand: str = "+"):
    """VCF-style (1bp-padded, left-aligned) -> HGVS-style (unpadded,
    3'-justified, dup-detected). Returns (chrom, pos, ref, alt, type)."""
    if len(ref) == len(alt) == 1:
        return chrom, pos, ref, alt, ("=" if ref == alt else ">")

    # strip the 1bp VCF pad
    pos += 1
    ref, alt = ref[1:], alt[1:]

    # 3'-justify the lesion (vs cDNA direction: right on +, left on -)
    if (ref and alt) or (not ref and not alt):
        mutation_type = "delins" if ref and alt else ">"
        return chrom, pos, ref, alt, mutation_type

    window = 100
    size = window + max(len(ref), len(alt))
    start1 = max(pos - size, 1)
    end1 = pos + size
    seq = genome.get(chrom, start1 - 1, end1)
    off0 = pos - start1
    indel = alt if alt else ref
    off_end0 = off0 if alt else off0 + len(indel)
    direction = "right" if strand == "+" else "left"
    off0n, _, indel = _justify(off0, off_end0, indel, seq, direction)
    pos = start1 + off0n
    if alt:
        alt = indel
    else:
        ref = indel

    # duplication detection
    if ref and alt:
        return chrom, pos, ref, alt, "delins"
    if len(ref) > len(alt):
        return chrom, pos, ref, alt, "del"
    indel = alt
    n = len(indel)
    prev = genome.get(chrom, pos - 1 - n, pos - 1)
    nxt = genome.get(chrom, pos - 1, pos - 1 + n)
    if prev == indel:
        return chrom, pos - n, indel, indel * 2, "dup"
    if nxt == indel:
        return chrom, pos, indel, indel * 2, "dup"
    return chrom, pos, ref, alt, "ins"


# ---------------------------------------------------------------------------
# name generation
# ---------------------------------------------------------------------------


def _protein_extra(genome, chrom: str, offset: int, transcript: TranscriptModel,
                   cdna_start: CdnaCoord, cdna_end: CdnaCoord,
                   ref: str, alt: str, mutation_type: str,
                   codon_type: str = "3") -> str | None:
    """p.-level change descriptor (reference cdna_to_protein,
    /root/reference/howard/functions/utils.py:586-700). Covers exonic
    substitutions/MNVs exactly; frame-disrupting indels get 'fs'."""
    if genome is None:
        return None
    if cdna_start.offset != 0 or cdna_start.landmark == CDNA_STOP:
        return None
    # a lesion reaching past the stop codon or into an intron has no
    # simple codon arithmetic (the reference crashes here on
    # stop-spanning MNVs — utils.py:657 list assignment; we decline)
    if cdna_end.offset != 0 or cdna_end.landmark == CDNA_STOP:
        return None
    is_indel = mutation_type != ">"
    is_mnv = mutation_type == "delins" and len(ref) == len(alt)

    gap_cdna = 0 if mutation_type == "ins" else -1
    genomic_position = offset - 1
    cstart = cdna_start.coord + gap_cdna
    cend = cdna_end.coord + gap_cdna
    if cstart < 0:
        return None

    mod = cstart % 3
    aa_index = cstart // 3
    aa_end = cend // 3
    g0 = genomic_position - mod
    g1 = g0 + 3 + (aa_end - aa_index) * 3
    try:
        seq_ref = genome.get(chrom, g0, g1)
    except KeyError:
        return None
    if len(seq_ref) < (g1 - g0):
        return None

    if is_indel and not is_mnv:
        seq_alt = ""
    else:
        buf = list(seq_ref)
        if mod + len(ref) > len(buf):
            return None  # lesion extends past the fetched codon window
        for i in range(len(ref)):
            buf[mod + i] = alt[i].upper()
        seq_alt = "".join(buf)

    if transcript.strand == "-":
        seq_ref = revcomp(seq_ref)
        seq_alt = revcomp(seq_alt)

    codons_ref = [seq_ref[i:i + 3] for i in range(0, len(seq_ref) - 2, 3)]
    codons_alt = [seq_alt[i:i + 3] for i in range(0, len(seq_alt) - 2, 3)]
    if not is_mnv:
        codons_ref = codons_ref[:1]
        codons_alt = codons_alt[:1]

    table = CODON_1 if codon_type == "1" else CODON_3
    aa_ref = "".join(str(table.get(c.upper())) for c in codons_ref)
    aa_alt = "".join(str(table.get(c.upper())) for c in codons_alt)
    if is_indel and not is_mnv:
        aa_alt = "fs"
    return f"{aa_ref}{aa_index + 1}{aa_alt}"


@dataclass
class HgvsParts:
    """Assembled components of one HGVS name."""

    kind: str = "g"  # g | c | n
    chrom: str = ""
    transcript: str = ""
    transcript_protein: str = ""
    gene: str = ""
    exon: int | None = None
    mutation_type: str = ">"
    start: int = 0
    end: int = 0
    cdna_start: CdnaCoord | None = None
    cdna_end: CdnaCoord | None = None
    ref: str = ""
    alt: str = ""
    pep_extra: str | None = None

    # -- allele / coords -----------------------------------------------------

    def _dna_allele(self) -> str:
        mt = self.mutation_type
        if mt == "=":
            return self.ref + "="
        if mt == ">":
            return self.ref + ">" + self.alt
        if mt == "delins":
            return "del" + self.ref + "ins" + self.alt
        if mt in ("del", "dup"):
            return mt + self.ref
        if mt == "ins":
            return mt + self.alt
        raise ValueError(f"unknown mutation type {mt!r}")

    def _coords(self) -> str:
        if self.kind in ("c", "n"):
            a, b = self.cdna_start, self.cdna_end
        else:
            a, b = self.start, self.end
        return str(a) if str(a) == str(b) else f"{a}_{b}"

    def format(self, use_gene: bool = True, use_exon: bool = False,
               use_protein: bool = False, use_version: bool = False,
               full_format: bool = False) -> str:
        if use_protein and self.pep_extra:
            allele = "p." + self.pep_extra
        else:
            allele = f"{self.kind}.{self._coords()}{self._dna_allele()}"
        if full_format and not use_protein and self.pep_extra:
            allele += ":p." + self.pep_extra

        if full_format:
            prefix = ":".join(
                x for x in (
                    self.gene, self.transcript, self.transcript_protein,
                    f"exon{self.exon}" if self.exon else "",
                ) if x
            )
        elif self.kind == "g" and self.chrom:
            prefix = self.chrom
        elif self.transcript:
            tx = (self.transcript_protein
                  if use_protein and self.transcript_protein else self.transcript)
            if not use_version:
                tx = tx.split(".")[0]
            if use_gene and self.gene:
                prefix = f"{tx}({self.gene})"
            elif use_exon and self.exon:
                prefix = f"{tx}(exon{self.exon})"
            else:
                prefix = tx
        else:
            prefix = self.gene if use_gene else ""
        return f"{prefix}:{allele}" if prefix else allele


def variant_to_hgvs(chrom: str, pos: int, ref: str, alt: str, genome,
                    transcript: TranscriptModel | None,
                    transcript_protein: str | None = None,
                    exon: int | None = None,
                    max_allele_length: int = 4,
                    codon_type: str = "3") -> HgvsParts:
    """VCF-style variant -> assembled HGVS components (the reference's
    variant_to_hgvs_name, utils.py:723-860)."""
    strand = transcript.strand if transcript else "+"
    chrom, pos, ref, alt = normalize_vcf(chrom, pos, ref, alt, genome)
    chrom, pos, ref, alt, mtype = hgvs_normalize(chrom, pos, ref, alt, genome, strand)

    parts = HgvsParts(chrom=chrom, mutation_type=mtype)
    if mtype == "ins":
        start, end = pos - 1, pos
    else:
        start, end = pos, pos + len(ref) - 1

    if not transcript:
        parts.kind = "g"
        parts.start, parts.end = start, end
    else:
        parts.kind = "c" if transcript.is_coding else "n"
        if mtype == ">":
            parts.cdna_start = transcript.genomic_to_cdna(pos)
            parts.cdna_end = parts.cdna_start
        else:
            if transcript.strand == "-":
                start, end = end, start
            parts.cdna_start = transcript.genomic_to_cdna(start)
            parts.cdna_end = transcript.genomic_to_cdna(end)
        if transcript.is_coding:
            parts.pep_extra = _protein_extra(
                genome, chrom, pos, transcript, parts.cdna_start, parts.cdna_end,
                ref, alt, mtype, codon_type=codon_type)

    if transcript:
        parts.transcript = transcript.full_name
        parts.gene = transcript.gene
        if transcript.strand == "-":
            ref, alt = revcomp(ref), revcomp(alt)
    if transcript_protein:
        parts.transcript_protein = transcript_protein
    if exon:
        parts.exon = exon

    rl, al = len(ref), len(alt)
    if (mtype == "dup" and rl > max_allele_length) or (
        mtype != "dup" and (rl > max_allele_length or al > max_allele_length)
    ):
        ref, alt = str(rl), str(al)
    parts.ref, parts.alt = ref, alt
    return parts


def format_hgvs_name(chrom: str, pos: int, ref: str, alt: str, genome,
                     transcript: TranscriptModel | None,
                     transcript_protein: str | None = None,
                     exon: int | None = None,
                     use_gene: bool = True, use_exon: bool = False,
                     use_protein: bool = False, full_format: bool = False,
                     use_version: bool = False,
                     max_allele_length: int = 4,
                     codon_type: str = "3") -> str:
    """Generate one HGVS name from a VCF-style variant (reference
    format_hgvs_name, utils.py:865-935)."""
    parts = variant_to_hgvs(
        chrom, pos, ref, alt, genome, transcript,
        transcript_protein=transcript_protein, exon=exon,
        max_allele_length=max_allele_length, codon_type=codon_type)
    return parts.format(use_gene=use_gene, use_exon=use_exon,
                        use_protein=use_protein, full_format=full_format,
                        use_version=use_version)
