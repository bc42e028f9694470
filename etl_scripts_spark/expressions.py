"""Core column expressions: QBiC barcodes, checksums, dates, code generation.

All pure Catalyst column expressions (JVM-side, whole-stage-codegen'd) — no
Python UDFs in the hot path.  The barcode grammar and the mod-34 checksum are
re-expressed from the reference:

  - barcode regex  Q[A-Z0-9]{4}[0-9]{3}[A-Z][A-Z0-9]
    (drop-boxes/register-fastq-dropbox/register-fastq-dropbox.py:21)
  - checksum char: sum(ord(c)*i, i=1..len) % 34 → +48, skip past '9' by +7
    (drop-boxes/register-iontorrent-data/register-iontorrent-data.py:79-94)
  - validation: checksum(code[0:9]) == code[9]
    (register-fastq-dropbox.py:39-45)
  - entity barcode Q\\w{4}ENTITY-\\d+ (register-nanopore.py:48)
  - date conversions %y%m%d / %d.%m.%Y / epoch → ISO (etl_msconvert.py:602,
    register-omero.py:63-64, register-wf-mapping/register-mapping-dropbox.py:62)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BARCODE_REGEX = "Q[A-Z0-9]{4}[0-9]{3}[A-Z][A-Z0-9]"
ENTITY_BARCODE_REGEX = "Q[A-Z0-9]{4}ENTITY-[0-9]+"
#: derived-sample prefix grammar, e.g. NGS / MS2 / VC1 / HLA1 (SURVEY §1.2)
PREFIXED_BARCODE_REGEX = "(NGS|MS|VC|HLA|MA|MSQC|NGSQC|PCR|IM|FASTA|RMA|VAC|IMG|MTB|MP|NMR)[0-9]*" + BARCODE_REGEX


def barcode_checksum_sum(code: Column) -> Column:
    """Weighted character sum: sum(ascii(c_i) * i) for 1-based position i."""
    chars = F.split(code, "")
    weights = F.sequence(F.lit(1), F.length(code))
    return F.aggregate(
        F.zip_with(chars, weights, lambda c, i: F.ascii(c) * i),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def barcode_checksum_char(code: Column) -> Column:
    """Mod-34 checksum character: 0-9 then A-X (48 + n, skipping ':'..'@')."""
    n = barcode_checksum_sum(code) % 34 + 48
    return F.char(F.when(n > 57, n + 7).otherwise(n))


def is_valid_barcode(code: Column) -> Column:
    """True iff code matches the grammar and its checksum char verifies."""
    shape_ok = code.rlike(f"^{BARCODE_REGEX}$")
    return shape_ok & (F.substring(code, 10, 1) == barcode_checksum_char(F.substring(code, 1, 9)))


def extract_barcode(name: Column) -> Column:
    """First QBiC barcode embedded in a filename ('' if none) — P1."""
    return F.regexp_extract(name, BARCODE_REGEX, 0)


def extract_entity_barcode(name: Column) -> Column:
    return F.regexp_extract(name, ENTITY_BARCODE_REGEX, 0)


def project_of(code: Column) -> Column:
    """Project code = first 5 chars of a barcode (register-vcf.py:62-64)."""
    return F.substring(code, 1, 5)


def parent_code_of(code: Column) -> Column:
    """Parent (test-sample) barcode = first 10 chars of a prefixed code."""
    return F.substring(code, 1, 10)


def strip_run_prefix(code: Column) -> Column:
    """Drop the NGS/MS<n>/VC<n>/... prefix, keeping the bare barcode."""
    return F.regexp_extract(code, BARCODE_REGEX, 0)


# --- date/time normalizers (P14) ------------------------------------------

def yymmdd_to_date(col: Column) -> Column:
    """'171010' (yyMMdd, etl_msconvert.py:602) → DATE."""
    return F.to_date(col, "yyMMdd")


def dotted_to_date(col: Column) -> Column:
    """'24.03.2019' (dd.MM.yyyy, register-omero.py:63-64) → DATE."""
    return F.to_date(col, "dd.MM.yyyy")


def epoch_to_timestamp(col: Column) -> Column:
    """Unix seconds → TIMESTAMP (register-mapping-dropbox.py:62)."""
    return F.to_timestamp(F.from_unixtime(col))


def iso_day(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


# --- workflow-result name destructuring (SURVEY §1.2) ---------------------

def split_wf_name(name: Column) -> dict[str, Column]:
    """'SPACE-PROJECT-EXPERIMENT-SAMPLE' positional split on '-'
    (register-wf-mapping/register-mapping-dropbox.py:40-45).

    Dash-in-space variant handled by counting from the right, like the
    reference's fix (register-wf-hlatyping/register-hlatyping.py:45-52).
    """
    parts = F.split(name, "-")
    n = F.size(parts)
    return {
        "sample": F.element_at(parts, -1),
        "experiment": F.element_at(parts, -2),
        "project": F.element_at(parts, -3),
        "space": F.array_join(F.slice(parts, 1, n - 3), "-"),
    }
