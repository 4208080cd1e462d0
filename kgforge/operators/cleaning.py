"""Unicode text cleaning: control/zero-width stripping, NFC
normalization, whitespace collapse.

The first stage every webtext corpus runs after boilerplate extraction
(reference scope: parser-shacl consumes already-clean RDF text — this is
part of the corpus-scale generalization alongside ``pii.py`` and the
C4/Gopher stages): crawled HTML yields text littered with zero-width
joiners, BOMs, stray C0 controls, NBSP-padded layouts, and decomposed
accents (``e`` + U+0301) that tokenizers and exact-dedup hashes treat as
distinct from their composed forms.

Pipeline order (each step is why the next works):

1. **Zero-width + control strip** — pure codegen ``regexp_replace``
   (character classes spelled ``\\x{...}`` — the escape form Java regex
   and RE2 read identically).
2. **NFC normalization** — THE one deliberate Python step in the text
   path: the JVM exposes no Unicode-normalize SQL function, so this is a
   vectorized Arrow ``pandas_udf`` (``unicodedata.normalize`` over a
   Series; batch transfer, never per-row Python). Skippable
   (``nfc=False``) when upstream guarantees composed input, which turns
   the whole cleaner into one fused codegen projection.
3. **Whitespace collapse + trim** — codegen; the class includes NBSP so
   layout padding collapses with ordinary runs.

Map-only at any scale: no shuffle, no state, fuses with adjacent stages;
the Arrow batch hop in step 2 is the only non-codegen cost and is
O(bytes) with no skew surface. Oracle parity: DuckDB replays steps 1 and
3 with the same regexes and step 2 via ``nfc_normalize`` (q_text_clean).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# zero-width space/non-joiner/joiner + BOM (a BOM mid-text is a paste scar)
_ZERO_WIDTH = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"
# C0 controls minus \t \n \r, plus DEL
_CONTROLS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
# whitespace runs incl. NBSP collapse to one space
_WS_RUN = r"[\s\x{00A0}]+"


def _nfc_series(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def nfc_col(col):
    """NFC-normalize a string column (Arrow-batched pandas UDF; None passes
    through). Built lazily — decorating at import time would require an
    active SparkSession to parse the return type."""
    from pyspark.sql.types import StringType

    return pandas_udf(_nfc_series, StringType())(col)


def clean_text_cols(text_col, nfc: bool = True):
    """The cleaning expression for one text column (module docstring order)."""
    c = F.regexp_replace(text_col, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _CONTROLS, "")
    if nfc:
        c = nfc_col(c)
    return F.trim(F.regexp_replace(c, _WS_RUN, " "))


def clean_text(
    docs: DataFrame, text_col: str = "text", nfc: bool = True
) -> DataFrame:
    """Replace ``text_col`` with its cleaned form, all other columns
    untouched. Map-only; with ``nfc=False`` it is a single codegen
    projection."""
    return docs.withColumn(text_col, clean_text_cols(F.col(text_col), nfc=nfc))


# mojibake markers: UTF-8 multibyte lead bytes read as Latin-1/cp1252 land
# on these characters — Ã (0xC3, 2-byte leads), Â (0xC2), â (0xE2, the
# punctuation family: â€™ â€œ â€" ...). Plain text virtually never uses them
# followed by the continuation range, so they gate the repair attempt.
_MOJIBAKE_HINT = re.compile("[ÂÃâ]")


def _fix_mojibake_one(x):
    if x is None or not _MOJIBAKE_HINT.search(x):
        return x
    # invert the mis-decode by encoding back through the codec that
    # produced it: cp1252 first (the codec browsers actually apply — it
    # maps € ” † etc. into the 0x80-0x9F range UTF-8 continuation bytes
    # land on), falling back to latin-1 for byte-transparent mis-decodes
    for codec in ("cp1252", "latin-1"):
        try:
            fixed = x.encode(codec, errors="strict").decode("utf-8", errors="strict")
            break
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
    else:
        return x  # not a clean single-pass mojibake — leave untouched
    # real mojibake always SHRINKS (n bytes -> 1 char); an equal-length
    # "fix" means the text was legitimate Latin-1-range prose
    return fixed if len(fixed) < len(x) else x


def _fix_mojibake_series(s: pd.Series) -> pd.Series:
    return s.map(_fix_mojibake_one)


def fix_mojibake_col(col):
    """Repair single-pass UTF-8-read-as-Latin-1 mojibake ('CafÃ©' →
    'Café') in a string column: strict round-trip inversion, gated on the
    Ã/Â/â marker characters, accepted only when the repair both succeeds
    and shrinks — legitimate Latin-1-range prose (strict-encodable but
    not shrinkable, or not valid UTF-8 bytes) passes through untouched.
    Arrow-batched pandas UDF, gate + repair per row, no lookups —
    map-only, scales linearly. The double-encoded case (two mis-decode
    rounds) needs a second application; this operator deliberately does
    ONE deterministic pass so the oracle can replay it.
    """
    from pyspark.sql.types import StringType

    return pandas_udf(_fix_mojibake_series, StringType())(col)


def fix_mojibake(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its mojibake-repaired form, other
    columns untouched; adds ``was_fixed`` (repair actually changed the
    text). Map-only."""
    fixed = fix_mojibake_col(F.col(text_col))
    return docs.withColumn("was_fixed", fixed != F.col(text_col)).withColumn(
        text_col, fixed
    )
