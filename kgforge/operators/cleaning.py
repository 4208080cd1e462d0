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
