"""HTML table extraction: <table> grids lifted to relational cell rows.

Web tables are the second-richest structured-data carrier on crawl pages
after embedded RDF/microdata (WebTables, Cafarella et al. 2008); a
KG-construction pipeline mines them for (entity, attribute, value)
candidates. This operator turns every <table> on every page into
(url, table_idx, row_idx, col_idx, cell, is_header) rows with the whole
parse expressed as codegen regexps + explodes — no Python in the plan.

Reference parity note: the reference parses per-file RDF payloads only
(`src/ShaclParser.php`); table mining generalizes its page-to-triples
surface to the dominant non-RDF structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table>"
_ROW_RE = r"(?is)<tr\b[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<(t[dh])\b[^>]*>(.*?)</t[dh]>"


def _decode_entities(col):
    out = F.regexp_replace(col, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&#39;", "'")
    return F.regexp_replace(out, "&amp;", "&")


def extract_tables(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, table_idx, row_idx, col_idx, cell, is_header) — one row per
    table cell on each page; indices are 0-based document order;
    is_header marks <th> cells; inner markup is stripped and the five
    predefined XML entities decoded; cell text is trimmed.

    Scale shape: three chained regexp_extract_all + posexplode stages,
    all inside the scan's codegen spans — fan-out is cells-per-page
    (bounded by page size), order captured as index columns so no stage
    depends on row order across shuffles. Pages without tables contribute
    no rows (explode, not explode_outer: the cell table is a fact table,
    absence IS the information).
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(html_str, F.lit(_TABLE_RE), 1)).alias(
            "table_idx", "tbl"
        ),
    )
    rows = tables.select(
        "url",
        "table_idx",
        F.posexplode(F.regexp_extract_all(F.col("tbl"), F.lit(_ROW_RE), 1)).alias(
            "row_idx", "row"
        ),
    )
    # tag + body extracted together so <th>/<td> order is preserved even
    # when a row mixes both kinds
    cells = rows.select(
        "url",
        "table_idx",
        "row_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("row"), F.lit(_CELL_RE.replace("(t[dh])", "t[dh]").replace("(.*?)", ".*?")), 0)
        ).alias("col_idx", "raw"),
    )
    body = F.regexp_extract(F.col("raw"), _CELL_RE, 2)
    tag = F.lower(F.regexp_extract(F.col("raw"), _CELL_RE, 1))
    text = F.trim(_decode_entities(F.regexp_replace(body, r"(?s)<[^>]*>", " ")))
    return cells.select(
        "url",
        F.col("table_idx").cast("bigint").alias("table_idx"),
        F.col("row_idx").cast("bigint").alias("row_idx"),
        F.col("col_idx").cast("bigint").alias("col_idx"),
        text.alias("cell"),
        (tag == "th").alias("is_header"),
    )


def table_column_profile(cells: DataFrame) -> DataFrame:
    """Column typing over extracted table cells (the WebTables schema-
    recovery step): per (url, table_idx, col_idx) — the header name (the
    row-0 <th> cell when present), body-cell count, how many body cells
    parse as numbers, and the inferred type ('numeric' when at least half
    do, else 'text'). This is what turns a million raw HTML grids into
    queryable (entity, attribute, value) candidates.

    Scale shape: one combinable agg over body cells (numeric test =
    codegen try_cast, never Python) + one broadcast-scale join against
    the header cells (one row per column). Output is column-cardinality-
    sized.
    """
    body = cells.filter(~F.col("is_header"))
    stats = body.groupBy("url", "table_idx", "col_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(
            F.col("cell").try_cast("double").isNotNull().cast("int")
        ).cast("bigint").alias("n_numeric"),
    )
    headers = (
        cells.filter(F.col("is_header") & (F.col("row_idx") == 0))
        .groupBy("url", "table_idx", "col_idx")
        .agg(F.min("cell").alias("col_name"))
    )
    share = F.col("n_numeric").cast("double") / F.col("n_cells").cast("double")
    return (
        stats.join(headers, ["url", "table_idx", "col_idx"], "left")
        .select(
            "url",
            "table_idx",
            "col_idx",
            "col_name",
            "n_cells",
            "n_numeric",
            F.when(share >= 0.5, F.lit("numeric")).otherwise(F.lit("text")).alias(
                "inferred_type"
            ),
        )
    )


def tables_to_triples(
    cells: DataFrame, base_predicate: str = "http://example.org/col/"
) -> DataFrame:
    """Lift extracted table grids into (subject, predicate, object)
    triples — the WebTables-to-KG step: each body ROW becomes an entity
    (subject = page URL + '#table{t}-row{r}'), each header-named column
    becomes a predicate (header slug under ``base_predicate``; headerless
    columns fall back to 'col{idx}'), each cell its literal object. Empty
    cells produce no triple (absence IS the information, matching the
    RDF extractors' convention).

    Scale shape: one column-cardinality header reduce joined back to body
    cells on (url, table_idx, col_idx) — AQE broadcasts the header side —
    plus codegen string assembly. No shuffle beyond that single join.
    """
    body = cells.filter(~F.col("is_header") & (F.trim(F.col("cell")) != ""))
    headers = (
        cells.filter(F.col("is_header") & (F.col("row_idx") == 0))
        .groupBy("url", "table_idx", "col_idx")
        .agg(F.min("cell").alias("header"))
    )
    slug = F.regexp_replace(F.lower(F.col("header")), r"[^a-z0-9]+", "_")
    pred = F.concat(
        F.lit(base_predicate),
        F.coalesce(
            F.nullif(slug, F.lit("")),
            F.concat(F.lit("col"), F.col("col_idx").cast("string")),
        ),
    )
    subj = F.concat(
        F.col("url"),
        F.lit("#table"), F.col("table_idx").cast("string"),
        F.lit("-row"), F.col("row_idx").cast("string"),
    )
    return (
        body.join(headers, ["url", "table_idx", "col_idx"], "left")
        .select(
            F.col("url"),
            subj.alias("subject"),
            pred.alias("predicate"),
            F.col("cell").alias("object"),
        )
    )
