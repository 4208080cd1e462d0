"""PII detection and redaction: emails, IPv4 addresses, SSN-style ids,
phone numbers.

Training-data pipelines scrub personally identifiable information before
a corpus ships (reference scope: parser-shacl never touches document
text — this is part of the corpus-scale generalization, the same
family as the C4/Gopher cleaning stages in ``corpus_mining.py``).

Design constraints:

- **Pure codegen.** Every rule is a ``regexp_count`` + ``regexp_replace``
  pair over built-in column expressions — no Python in the hot path, the
  whole scrub is one WholeStageCodegen projection, map-only (no shuffle),
  so it scales linearly with the corpus and fuses with any adjacent stage.
- **Sequential rule order is part of the semantics.** Rules apply in
  ``PII_RULES`` order and each counts matches on the text AS REDACTED BY
  THE PREVIOUS RULES: an email's digits can never double-count as a
  phone, an IPv4 can never re-match as a phone run. Replacement tokens
  (``[EMAIL]`` …) are digit-free so no rule can match inside another's
  output — redaction is idempotent.
- **Cross-engine regex subset.** Patterns stay inside the dialect both
  Java regex (Spark) and RE2 (DuckDB oracle) interpret identically:
  character classes, bounded/unbounded greedy quantifiers, non-capturing
  groups, ASCII ``\\b``. No backreferences, no lookaround.

At 100 TB this is a map-only pass: no skew surface, no shuffle, fully
fused; the only cost is the regex scan itself, which is why counting
happens on the progressively-redacted text (each rule scans a string
that is never longer than the original) instead of re-scanning raw text
per rule with overlap bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — ORDER MATTERS (see module docstring).
PII_RULES = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        "ip",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    (
        # leading digit or +, then >=7 phone-ish chars, closing digit:
        # matches +1 (415) 555-0134 / 030-1234567 / 8 555 0100 22 forms.
        "phone",
        r"\+?\d[-\d\s().]{7,}\d",
        "[PHONE]",
    ),
]


def pii_scrub_cols(text_col) -> dict:
    """Column map for one text column: ``n_<kind>`` match counts (counted
    on the text as redacted by all PREVIOUS rules) plus the fully
    ``redacted`` text. Callers splat it into a ``select``."""
    out: dict = {}
    cur = text_col
    for kind, pat, tok in PII_RULES:
        out[f"n_{kind}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, tok)
    out["redacted"] = cur
    return out


def scrub_pii(
    docs: DataFrame, text_col: str = "text", keep_cols: list[str] | None = None
) -> DataFrame:
    """Per-document PII scrub: every ``keep_cols`` column (default: all
    non-text columns) plus n_email / n_ip / n_ssn / n_phone counts and the
    redacted text. Map-only codegen — safe to run as the first stage of
    any corpus pipeline at any scale."""
    keep = keep_cols if keep_cols is not None else [
        c for c in docs.columns if c != text_col
    ]
    cols = pii_scrub_cols(F.col(text_col))
    return docs.select(
        *keep, *[v.alias(k) for k, v in cols.items()]
    )
