"""Sinks (SURVEY.md §2.1 S8-S12): parquet / delimited / json / vcf.

The reference streams Arrow batches into per-format writers
(/root/reference/howard/objects/database.py:2124-2926); on Spark the
same surface is ``df.write`` with explicit ordering, partitioning and
single-file options. Genomic sort (bcftools sort analog, S11/O2) is
an ``orderBy`` before write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

_DELIMS = {"csv": ",", "tsv": "\t", "psv": "|", "tbl": "|", "bed": "\t"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    single_file: bool = False,
    mode: str = "overwrite",
    header: bool = True,
    schema_sidecar: bool = False,
) -> None:
    from .readers import infer_format

    fmt = fmt or infer_format(path)
    out = df
    if order_by:
        # validated per column like the reference's order_by option
        # (/root/reference/howard/objects/database.py:2320-2343)
        missing = [c for c in order_by if c.split(" ")[0] not in df.columns]
        if missing:
            raise ValueError(f"order_by columns not in schema: {missing}")
        out = out.orderBy(*[c for c in order_by])
    if single_file:
        out = out.coalesce(1)

    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)

    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    elif fmt in _DELIMS:
        w.option("sep", _DELIMS[fmt]).option("header", str(header).lower()).csv(path)
    else:
        raise ValueError(f"unsupported sink format {fmt}")

    if schema_sidecar:
        with open(path + ".schema.json", "w") as fh:
            json.dump(json.loads(df.schema.json()), fh)


def reconstruct_vcf_header(df: DataFrame, meta_lines: list[str] | None = None,
                           info_fields: list[dict] | None = None) -> list[str]:
    """Rebuild the '##' meta block for a VCF export (reference keeps the
    parsed pyVCF header and re-emits it, database.py:2594-2620 +
    the .hdr sidecar protocol). Order: fileformat, provided meta,
    INFO declarations, the '#CHROM...' column line."""
    lines: list[str] = []
    meta = list(meta_lines or [])
    if not any(m.startswith("##fileformat=") for m in meta):
        lines.append("##fileformat=VCFv4.2")
    lines += meta
    for f in info_fields or []:
        fid = f.get("ID")
        if not fid:
            continue
        num = f.get("Number", ".")
        typ = f.get("Type", "String")
        desc = f.get("Description", f.get("desc", fid))
        lines.append(f'##INFO=<ID={fid},Number={num},Type={typ},Description="{desc}">')
    lines.append("\t".join(df.columns))
    return lines


def genomic_chrom_key(col):
    """Natural genomic collation key for a chromosome column: numeric
    contigs by value, then X, Y, M/MT, then everything else
    lexicographically — bcftools sort order, matching the reference's
    export (/root/reference/howard/objects/database.py:2859-2885).
    Pure Catalyst expressions (no UDF) so the sort key participates in
    range partitioning at scale. Returns (rank, name) — order by both.
    """
    from pyspark.sql import functions as F

    core = F.regexp_replace(F.upper(col.cast("string")), "^CHR", "")
    rank = (
        F.when(core.rlike("^[0-9]+$"), core.cast("long"))
        .when(core == "X", F.lit(9_000_000_001))
        .when(core == "Y", F.lit(9_000_000_002))
        .when(core.isin("M", "MT"), F.lit(9_000_000_003))
        .otherwise(F.lit(9_999_999_999))
    )
    return rank, core


_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def _bgzf_block(data: bytes, level: int = 6) -> bytes:
    """One BGZF block: a gzip member with the 'BC' extra subfield
    carrying the compressed block size (SAM spec §4.1). Readable by any
    gzip decoder; block-addressable for tabix-style indexing."""
    import struct
    import zlib as _zlib

    co = _zlib.compressobj(level, _zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25 + 1  # header(12)+extra(6)+deflate+crc(4)+isize(4)
    header = (
        b"\x1f\x8b\x08\x04" + b"\x00" * 6  # gzip magic, FLG.FEXTRA, mtime/xfl/os
        + struct.pack("<H", 6)             # XLEN
        + b"BC" + struct.pack("<HH", 2, bsize - 1)
    )
    return (header + comp
            + struct.pack("<I", _zlib.crc32(data) & 0xFFFFFFFF)
            + struct.pack("<I", len(data) & 0xFFFFFFFF))


class BgzfWriter:
    """Minimal BGZF stream writer (text mode): 64KB-block gzip members
    + the standard EOF marker. The reference shells out to bgzip
    (commons.py:2274); this is the same container format from scratch."""

    BLOCK = 0xFF00  # uncompressed bytes per block (bgzip's default)

    def __init__(self, path: str, level: int = 6):
        self._fh = open(path, "wb")
        self._buf = bytearray()
        self._level = level

    def write(self, text: str) -> None:
        self._buf += text.encode()
        while len(self._buf) >= self.BLOCK:
            self._fh.write(_bgzf_block(bytes(self._buf[: self.BLOCK]), self._level))
            del self._buf[: self.BLOCK]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._buf:
            self._fh.write(_bgzf_block(bytes(self._buf), self._level))
        self._fh.write(_BGZF_EOF)
        self._fh.close()


def write_vcf(
    df: DataFrame,
    path: str,
    meta_lines: list[str] | None = None,
    info_fields: list[dict] | None = None,
    sort: bool = True,
    bgzf: bool = False,
) -> None:
    """VCF sink with header reconstruction (S11 full form, reference
    database.py:2594-2620): '##' meta + '#CHROM' line + tab-separated
    body; '.gz' path gzip-compresses (``bgzf=True``: BGZF blocks, the
    tabix-compatible container bgzip produces). NULLs become '.'.

    Scale note: the body is written DISTRIBUTED (Spark csv, one part
    per partition, genomic-sorted via range partitioning on
    (#CHROM, POS)); the driver then streams header + parts into the
    single output file — concatenation is sequential IO only, no
    parse/serialize. For folder-of-parts output at very large scale
    use write_table(fmt='tsv') + the header as a .hdr sidecar instead.
    """
    import glob
    import gzip
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    if "#CHROM" not in df.columns or "POS" not in df.columns:
        raise ValueError("VCF export needs #CHROM and POS columns")

    out = df
    # VCF missing-value convention
    out = out.select(*[
        F.coalesce(F.col(c).cast("string"), F.lit(".")).alias(c) for c in out.columns
    ])
    if sort:
        # genomic (bcftools) collation, not lexicographic: chr2 < chr10,
        # X/Y/M after numerics (O2; ref database.py:2859-2885)
        rank, core = genomic_chrom_key(F.col("#CHROM"))
        out = out.orderBy(rank, core, F.col("POS").cast("long"))

    header = reconstruct_vcf_header(df, meta_lines, info_fields)

    tmp = tempfile.mkdtemp(prefix="vcf_export_")
    body_dir = os.path.join(tmp, "body")
    # quote=\u0000 disables CSV quoting entirely: VCF fields are emitted
    # verbatim (a value containing '"' must NOT be wrapped/escaped)
    (out.write.mode("overwrite")
        .option("sep", "\t").option("header", "false")
        .option("emptyValue", ".").option("quote", "\u0000").csv(body_dir))
    parts = sorted(glob.glob(os.path.join(body_dir, "part-*")))

    if bgzf and path.endswith(".gz"):
        with BgzfWriter(path) as fh:
            for line in header:
                fh.write(line + "\n")
            for p in parts:
                with open(p) as src:
                    for chunk in iter(lambda s=src: s.read(1 << 16), ""):
                        fh.write(chunk)
    else:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "wt") as fh:
            for line in header:
                fh.write(line + "\n")
            for p in parts:
                with open(p) as src:
                    shutil.copyfileobj(src, fh)
    shutil.rmtree(tmp, ignore_errors=True)
