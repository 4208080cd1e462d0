"""kgforge — a PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the query/data-processing capabilities of the
reference SHACL parser (/root/reference, PHP) as a corpus-scale Spark pipeline:

    pages (url, warc_ts, html, text, lang)
      -> extract_text   (deterministic boilerplate strip, Arrow UDF)
      -> parse_rdf      (Turtle / JSON-LD / RDFa blocks -> triples DF)
      -> shapes         (SHACL shape recognition + record assembly)
      -> mentions       (gazetteer + embedding entity linking)
      -> validate       (shape-driven triple validation)
      -> canonicalize   (MinHash-LSH blocking + connected components)
      -> materialize    (range-partitioned S/P/O tables + manifests)

All per-document logic runs inside vectorized pandas/Arrow UDFs (no per-row
Python in the hot path); all corpus-level logic is declarative DataFrame ops
so Catalyst/AQE handle pushdown, partial aggregation, and skew joins.
"""

__version__ = "0.1.0"
