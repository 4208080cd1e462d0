"""Corpus-level mining operators for a training-data pipeline:

- eval-set decontamination (GPT-3 appx. C style word-n-gram overlap:
  Brown et al. 2020 flag any train document sharing an n-gram with the
  benchmark; reference has no analogue — this generalizes its per-file
  text handling to corpus hygiene),
- chunk-level (line-level analogue) duplication statistics
  (Lee et al. 2021 "Deduplicating Training Data Makes Language Models
  Better": substring-granularity duplication, approximated here at
  fixed token-chunk granularity so it stays a pure set operation),
- adjacent-word PMI association mining (Church & Hanks 1990),
- exact token-count percentiles per language (corpus QA dashboards).

Every operator is a pure built-in column-expression pipeline
(WholeStageCodegen, zero Python in the hot path) with an exact ANSI-SQL
(DuckDB) oracle in ``__spark_entry__.py`` — the correctness gate.

Scale notes are per-function; the common theme: aggregate or
broadcast-filter BEFORE any shuffle that carries exploded n-gram rows,
because explode inflates the corpus ~100x and an early shuffle of that
inflation is the 100-TB bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgforge.operators.text_stats import _tokens_col, word_ngrams_col


def _doc_grams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, g) — one row per word-n-gram OCCURRENCE (not distinct).
    Docs with fewer than n tokens contribute nothing, by contract."""
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens_col(F.col(text_col)).alias("tk"),
        )
        .withColumn("n_tokens", F.size("tk"))
        .filter(F.col("n_tokens") >= n)
    )
    return d.select(
        "doc_id",
        F.explode(word_ngrams_col(F.col("tk"), F.col("n_tokens"), n)).alias("g"),
    )


def contamination_overlap(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval decontamination: for every train document that shares at
    least one word n-gram with the eval/benchmark corpus, return
    (doc_id, n_contaminated_grams) where the count is DISTINCT overlapping
    grams. Clean documents are absent from the result (the common case at
    scale — keeps the output proportional to contamination, not corpus).

    Plan shape: the eval gram set is distinct-ed and broadcast (eval
    benchmarks are MBs, not TBs), so the exploded train grams are filtered
    MAP-SIDE by a broadcast hash join before the only shuffle — the
    (doc_id, g) distinct/count, whose key is doc-scoped (no global hot
    key). Filtering before distinct matters: distinct-ing the full train
    gram inflation first would shuffle ~100x the corpus. Set
    ``broadcast_eval=False`` for an eval side too big to broadcast (falls
    back to a shuffle join; AQE still picks the strategy per stats).
    """
    ev = _doc_grams(eval_docs, n, id_col, text_col).select("g").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _doc_grams(docs, n, id_col, text_col)
    return (
        tr.join(ev, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_contaminated_grams"))
    )


def chunk_dup_stats(
    docs: DataFrame,
    chunk: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk-granularity duplication profile: split each document into
    consecutive NON-overlapping ``chunk``-token blocks (trailing partial
    block dropped), count each block's global corpus frequency, and report
    per document (doc_id, n_chunks, dup_chunks) where dup_chunks is the
    number of block occurrences whose block appears more than once
    corpus-wide. This is the fixed-granularity form of line-level dedup
    (Lee et al. 2021): a high dup_chunks/n_chunks ratio marks boilerplate
    and template pages even when no whole document is a duplicate.

    Plan shape: two shuffles, both map-side combined — the global
    frequency count keyed by block text, and the per-doc reduce. The
    frequency table joins back on the block key; a pathologically common
    block (e.g. a site-wide footer) is a skewed join key, which AQE's
    skew-join split handles (the frequency side is 1 row per key, so the
    duplication factor equals the key's frequency and splits cleanly).
    Docs with fewer than ``chunk`` tokens are excluded, by contract.
    """
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens_col(F.col(text_col)).alias("tk"),
        )
        .withColumn("n_tokens", F.size("tk"))
        .filter(F.col("n_tokens") >= chunk)
    )
    n_chunks = F.floor(F.col("n_tokens") / chunk).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(F.col("tk"), i * chunk + 1, chunk), " "),
    )
    occ = d.select("doc_id", F.explode(blocks).alias("g"))
    freq = occ.groupBy("g").agg(F.count(F.lit(1)).alias("freq"))
    return (
        occ.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("freq") > 1, 1).otherwise(0)).alias("dup_chunks"),
        )
    )


def pmi_pairs(
    docs: DataFrame,
    top_k: int = 25,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-word associations by pointwise mutual information:
    PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) with p(a,b) over bigram
    occurrences and p(a), p(b) over unigram occurrences. Returns
    (gram, pair_count, pmi) for bigrams seen at least ``min_count`` times,
    ordered by ROUNDED pmi desc then gram — rounding before ordering makes
    the cut engine-independent (an ulp difference between ln()
    implementations can't flip the top-k boundary; same device as
    ranking.tfidf_top_terms).

    Plan shape: unigram and bigram counts are map-side-combined aggregates
    over the exploded tokens, each PERSISTED (vocabulary-sized — tiny
    relative to the corpus) because the unigram table feeds two joins and
    Spark does not reuse the exchange across the differently-aliased
    consumers: without the persist the full corpus explode re-runs per
    consumer, a 100-TB-scale disaster the sf0.01 plan audit caught
    (5 Generates, 0 ReusedExchange). Corpus totals come from per-doc
    token COUNTS (n1 = sum n_tokens, n2 = sum (n_tokens-1)) — one cheap
    no-explode pass — and ride along as a broadcast 1-row cross join,
    never a collect. The min_count filter shrinks the bigram side BEFORE
    the unigram joins (AQE broadcasts the vocab sides when they fit).
    """
    toks = docs.select(_tokens_col(F.col(text_col)).alias("tk")).withColumn(
        "n_tokens", F.size("tk")
    )
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .persist()
    )
    bi = (
        toks.filter(F.col("n_tokens") >= 2)
        .select(F.explode(word_ngrams_col(F.col("tk"), F.col("n_tokens"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
        .persist()
    )
    # n2 counts ALL bigram occurrences (pre-min_count), so it can't come
    # from the filtered `bi` table — per-doc lengths give it exactly
    totals = toks.agg(
        F.sum("n_tokens").cast("double").alias("n1"),
        F.sum(F.greatest(F.col("n_tokens") - 1, F.lit(0))).cast("double").alias("n2"),
    )
    parts = F.split("g", " ")
    scored = (
        bi.withColumn("wa", parts.getItem(0))
        .withColumn("wb", parts.getItem(1))
        .join(uni.select(F.col("w").alias("wa"), F.col("wc").alias("ca")), "wa")
        .join(uni.select(F.col("w").alias("wb"), F.col("wc").alias("cb")), "wb")
        .crossJoin(F.broadcast(totals))
        .select(
            "g",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n2"))
                    / ((F.col("ca") / F.col("n1")) * (F.col("cb") / F.col("n1")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("g")).limit(top_k)


def token_percentiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact token-count percentiles (p50/p90/p99, linear interpolation)
    and document count per language — the corpus-QA summary a length
    filter is tuned against. Spark's exact ``percentile`` aggregate uses
    the same (1-g)*lower + g*upper interpolation as ANSI
    PERCENTILE_CONT / DuckDB quantile_cont, so the oracle matches
    value-for-value on the rounded output.

    Plan shape: one shuffle keyed by language. Exact percentiles hold the
    per-group value multiset on the reducer — fine for a GROUP BY with a
    handful of languages only because the VALUES are small ints; for a
    high-cardinality or memory-tight grouping swap in approx_percentile
    (t-digest, mergeable map-side) and drop the oracle to rows-only.
    """
    from kgforge.operators.text_stats import token_count_col

    pct = F.percentile(F.col("n_tokens"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        docs.select("lang", token_count_col(F.col(text_col)).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pct.alias("pct"),
        )
        .select(
            "lang",
            "n_docs",
            F.round(F.col("pct").getItem(0), 6).alias("p50_tokens"),
            F.round(F.col("pct").getItem(1), 6).alias("p90_tokens"),
            F.round(F.col("pct").getItem(2), 6).alias("p99_tokens"),
        )
    )


def remove_duplicate_paragraphs(
    docs: DataFrame,
    split_re: str = r"\n\n+",
    join_sep: str = "\n\n",
    max_freq: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level dedup REWRITE (the C4 §2.2 / CCNet move: drop
    boilerplate lines that recur across the corpus, keep the rest of the
    document): split each text on ``split_re``, count each non-empty
    trimmed paragraph's global corpus frequency, drop paragraphs whose
    frequency exceeds ``max_freq``, and reassemble the survivors in
    original order with ``join_sep``.

    Returns (doc_id, text, n_paragraphs, n_removed) for EVERY input
    document — a fully-boilerplate document comes back with text '' so
    downstream stages see the removal rather than silently losing the row.

    Plan shape: posexplode (order captured as a column, never relying on
    row order across shuffles) → one map-side-combined frequency groupBy
    keyed by the paragraph text → frequency join back (a hot site-wide
    footer is a skewed key; the frequency side is 1 row/key so AQE's skew
    split applies cleanly) → one per-doc reduce that array_sort's the
    surviving (pos, para) structs, so reassembly order is exact whatever
    the partitioning. At 100 TB, swap the join key for xxhash64(para) to
    keep long paragraphs out of the shuffle (collision risk 2^-64 per
    pair); the text key here keeps the operator byte-exact for the
    oracle.
    """
    parts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), split_re)).alias("pos", "para"),
    ).withColumn("k", F.trim(F.col("para")))
    nonempty = parts.filter(F.col("k") != "")
    freq = nonempty.groupBy("k").agg(F.count(F.lit(1)).alias("freq"))
    kept = (
        nonempty.join(freq, "k")
        .withColumn("drop", F.col("freq") > max_freq)
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.sum(F.col("drop").cast("int")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("drop"), F.struct("pos", "para"))
                    )
                ),
                lambda x: x["para"],
            ),
            join_sep,
        ).alias("text"),
    )
    base = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("n_paragraphs", F.lit(0).cast("long")).alias("n_paragraphs"),
        F.coalesce("n_removed", F.lit(0).cast("long")).alias("n_removed"),
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT duplicated-substring spans (Lee et al. 2021 ExactSubstr, at
    word-token granularity): a token position is *duplicated* when the
    k-token gram starting there occurs >= ``min_freq`` times corpus-wide
    (counting occurrences, so a phrase repeated within ONE document also
    qualifies — the paper's criterion). Overlapping/adjacent duplicated
    windows merge into MAXIMAL spans; returns one row per span:
    (doc_id, span_start, span_end, span_tokens) with 0-based token
    indices, end exclusive. Unlike ``chunk_dup_stats`` (fixed
    non-overlapping blocks, counts only) this slides the window over
    EVERY position and reports exact span extents, so a 200-token quote
    shared by two pages surfaces as one 200-token span in each, not as a
    fuzzy block ratio.

    Plan shape: the gram text never shuffles — each occurrence is hashed
    to int64 map-side (xxhash64; 2^-64 collision risk, same trade the
    verified dedup joins make), so the explode ships 16 bytes/token. One
    map-side-combined frequency groupBy; duplicated grams are FILTERED
    before the join back (output stays proportional to duplication, and
    the join's hot keys — site-wide boilerplate grams — are 1 row/key on
    the frequency side, AQE skew-split-friendly). The merge is
    gaps-and-islands over a doc-scoped window: partitions are single
    documents, never corpus-wide.
    """
    from pyspark.sql import Window

    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens_col(F.col(text_col)).alias("tk"),
        )
        .withColumn("n_tokens", F.size("tk"))
        .filter(F.col("n_tokens") >= k)
    )
    occ = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                word_ngrams_col(F.col("tk"), F.col("n_tokens"), k),
                lambda g: F.xxhash64(g),
            )
        ).alias("pos", "g"),
    )
    dup_g = (
        occ.groupBy("g")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
        .select("g")
    )
    dup_pos = occ.join(dup_g, "g").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    brk = F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0)
    islands = dup_pos.withColumn(
        "isl", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicated-span REWRITE: drop every token inside a maximal
    duplicated span (``duplicated_spans``) and reassemble the survivors
    space-joined, in original order. Returns
    (doc_id, text, n_tokens, dup_tokens) for EVERY input document —
    whitespace is normalized to single spaces (the tokenizer's contract);
    a fully-duplicated document comes back with text '' rather than
    vanishing.

    Plan shape: spans aggregate to one array<struct> row per AFFECTED
    document (bounded: merged spans are disjoint, so at most
    n_tokens/k spans) and LEFT-join back to the corpus on doc_id — clean
    documents pass through untouched with a null span array. The token
    filter is a pure codegen exists() over that array; no second explode
    of the corpus.
    """
    spans = (
        duplicated_spans(docs, k, min_freq, id_col, text_col)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("spans"),
            F.sum("span_tokens").alias("dup_tokens"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens_col(F.col(text_col)).alias("tk")
    )
    joined = base.join(spans, "doc_id", "left")
    kept = F.filter(
        F.transform(F.col("tk"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.coalesce(
            F.exists(
                F.col("spans"),
                lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] < sp["span_end"]),
            ),
            F.lit(False),
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("text"),
        F.size("tk").cast("long").alias("n_tokens"),
        F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
    )


def bitext_candidates(
    pages: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    lang_seg: str = "[a-z]{2}",
) -> DataFrame:
    """Bitext candidate mining by URL structure (the ParaCrawl bootstrap,
    Bañón et al. 2020 §3.2): multilingual sites publish translations at
    URL twins that differ only in a language path segment
    (/en/article/7 vs /de/article/7). Strip the first language segment
    to a site-neutral document key, pick one representative URL per
    (key, lang), and pair up languages sharing a key — the candidate
    pairs a downstream aligner scores.

    Output: (doc_key, lang_a, url_a, lang_b, url_b) with lang_a < lang_b.

    Scale shape: the key is one codegen regexp_replace fused into the
    scan; representatives are ONE combinable min-agg per (key, lang); the
    pair join is key-keyed with per-key fan-out bounded by the language
    count (dozens, never corpus-shaped), so no skew guard is needed —
    the hot-key worst case is |langs|² rows per key.
    """
    key = F.regexp_replace(
        F.col(url_col), f"^(https?://[^/]+)/{lang_seg}/", r"$1/"
    ).alias("doc_key")
    reps = (
        pages.select(key, F.col(lang_col).alias("lang"), F.col(url_col).alias("url"))
        .groupBy("doc_key", "lang")
        .agg(F.min("url").alias("url"))
    )
    a = reps.select("doc_key", F.col("lang").alias("lang_a"), F.col("url").alias("url_a"))
    b = reps.select("doc_key", F.col("lang").alias("lang_b"), F.col("url").alias("url_b"))
    return a.join(b, "doc_key").filter(F.col("lang_a") < F.col("lang_b"))


def remove_host_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    min_pages: int = 2,
    min_share: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """HOST-scoped boilerplate line removal: drop a line from a page when
    the SAME host repeats it on at least ``max(min_pages,
    ceil(min_share * host_pages))`` of its pages — the site-template
    (nav / footer / cookie banner) variant of C4's corpus-global rule,
    which a corpus-global frequency can't express (a small site's footer
    never clears a global threshold, yet pollutes every page of the
    site).

    Returns (doc_id, host, text, n_lines, n_removed) for EVERY input
    document, survivors rejoined in original order (byte-exact).

    Plan shape mirrors remove_duplicate_paragraphs: posexplode with
    captured positions → per-(host, line) DISTINCT-doc frequency (one
    combinable agg) + per-host page counts (metadata-sized, AQE
    broadcast) → threshold flag in codegen → per-doc array_sort
    reassembly. The frequency join key is (host, line): a hot template
    line is confined to its host's partition, so template skew never
    crosses hosts.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(host_col).alias("host")
    ).distinct()
    parts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("k", F.trim(F.col("line")))
    nonempty = parts.filter(F.col("k") != "")
    host_pages = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct(F.col(id_col)).alias("host_pages")
    )
    linefreq = nonempty.groupBy("host", "k").agg(
        F.count_distinct("doc_id").alias("n_docs_line")
    )
    thr = F.greatest(
        F.lit(min_pages).cast("long"),
        F.ceil(F.lit(min_share) * F.col("host_pages")).cast("long"),
    )
    flagged = (
        nonempty.join(linefreq, ["host", "k"])
        .join(host_pages, "host")
        .withColumn("drop", F.col("n_docs_line") >= thr)
    )
    per_doc = flagged.groupBy("doc_id", "host").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("drop").cast("int")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(~F.col("drop"), F.struct("pos", "line")))
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text"),
    )
    return base.join(per_doc, ["doc_id", "host"], "left").select(
        "doc_id",
        "host",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("n_lines", F.lit(0).cast("long")).alias("n_lines"),
        F.coalesce("n_removed", F.lit(0).cast("long")).alias("n_removed"),
    )
