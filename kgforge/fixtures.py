"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Everything is a pure function of the page id — generation runs *distributed*
(spark.range → mapInPandas) so the bench corpus never bottlenecks on the
driver, and re-generation is byte-identical (resume/lineage invariants).

Page anatomy (i = page id):
- url        https://ex{i%97}.example.org/page/{i}
- payload    i%3==0 Turtle SHACL shape doc | 1 JSON-LD entity | 2 RDFa markup
- visible    2-5 gazetteer entity mentions woven into sentences
- html       head + nav boilerplate + payload + visible text + footer
- text       extract_text(html)  — the byte-identical golden
- dupes      i%23==0 pages are full MIRRORS of page i-1 (byte-identical
             html + text at a second url); i%29==0 near-duplicates of
             page i-1's body (one word changed, own title/payload)
- skew       entity E0000 appears on ~10% of pages (hot key for CC salting)
- sameAs     alias URIs per site link to a canonical entity URI -> CC work
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd

from .html import extract_text
from .schema import PAGES_SCHEMA

N_ENTITIES = 1000
HOT_ENTITY = 0

_FIRST = ["Ada", "Bart", "Chen", "Dana", "Edo", "Fleur", "Gijs", "Hana", "Ivan", "Joke"]
_LAST = ["Akker", "Bakker", "Cohen", "Dijk", "Evers", "Fokker", "Groot", "Haan", "Iding", "Jong"]
_ORG = ["Acme", "Borealis", "Cirrus", "Datura", "Elysium", "Fjord", "Gamma", "Helix", "Iris", "Jade"]
_KIND = ["Person", "Organization", "Place"]


def entity_surface(k: int) -> str:
    if k % 3 == 0:
        return f"{_FIRST[k % 10]} {_LAST[(k // 10) % 10]} {k // 100}"
    if k % 3 == 1:
        return f"{_ORG[k % 10]} {_ORG[(k // 10) % 10]} Group {k // 100}"
    return f"{_ORG[(k // 7) % 10]} City {k // 100}-{k % 100}"


def entity_type(k: int) -> str:
    return "http://schema.org/" + _KIND[k % 3]


def gazetteer_rows() -> list[tuple[str, str, str, float]]:
    """(entity_id, surface, type_uri, prior) — broadcastable dim table."""
    return [
        (f"E{k:04d}", entity_surface(k), entity_type(k), round(0.5 + (k * 2654435761 % 1000) / 2000.0, 4))
        for k in range(N_ENTITIES)
    ]


def ambiguous_gazetteer_rows() -> list[tuple[str, str, str, float]]:
    """Gazetteer with one-surface/many-entities ambiguity: every entity
    k % 5 == 0 gains a rival candidate ``A{k}`` sharing its surface but
    carrying the next type in the cycle and an independently-drawn prior
    (shifted Knuth stream) — the entity-LINKING fixture; detection fixtures
    keep using the unambiguous ``gazetteer_rows``."""
    rows = gazetteer_rows()
    for k in range(0, N_ENTITIES, 5):
        rows.append(
            (
                f"A{k:04d}",
                entity_surface(k),
                "http://schema.org/" + _KIND[(k + 1) % 3],
                round(0.5 + ((k * 2654435761 + 7919) % 1000) / 2000.0, 4),
            )
        )
    return rows


def page_entities(i: int) -> list[int]:
    """2-5 deterministic entity ids per page; ~10% carry the hot entity."""
    n = 2 + (i * 7) % 4
    ents = [(i * 31 + 17 * j) % N_ENTITIES for j in range(n)]
    if i % 10 == 3:
        ents[0] = HOT_ENTITY
    # dedupe preserving order
    seen: set[int] = set()
    return [e for e in ents if not (e in seen or seen.add(e))]


def canonical_entity_uri(k: int) -> str:
    return f"https://kg.example.org/entity/E{k:04d}"


def alias_entity_uri(k: int, site: int) -> str:
    return f"https://ex{site}.example.org/entity/E{k:04d}"


def _turtle_payload(i: int, ents: list[int]) -> str:
    k = ents[0]
    site = i % 97
    lines = [
        "@prefix sh: <http://www.w3.org/ns/shacl#> .",
        "@prefix ex: <https://ex%d.example.org/ns#> ." % site,
        "@prefix schema: <http://schema.org/> .",
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
        f"ex:Shape{i} a sh:NodeShape ;",
        f'    sh:targetClass <{entity_type(k)}> ;',
        f'    sh:property [ sh:path schema:name ; sh:datatype xsd:string ; sh:minCount 1 ; sh:maxCount 1 ] ;',
        f'    sh:property [ sh:path schema:age ; sh:datatype xsd:integer ; sh:maxCount 1 ] ;',
        f'    sh:property [ sh:path schema:knows ; sh:nodeKind sh:IRI ] .',
        "",
    ]
    for k2 in ents:
        a = alias_entity_uri(k2, site)
        lines += [
            f"<{a}> a <{entity_type(k2)}> ;",
            f'    schema:name "{entity_surface(k2)}" ;',
            f"    owl:sameAs <{canonical_entity_uri(k2)}> .",
        ]
    # deliberate constraint violations so the validation stage has work:
    a0 = alias_entity_uri(ents[0], site)
    if i % 13 == 0:
        lines.append(f'<{a0}> schema:age "unknown" .')  # datatype violation
    elif i % 17 == 0:
        lines.append(f'<{a0}> schema:name "Duplicate Name {i}" .')  # maxCount violation
    else:
        lines.append(f"<{a0}> schema:age {20 + i % 60} .")
    if len(ents) >= 2:
        lines.append(
            f"<{alias_entity_uri(ents[0], site)}> schema:knows <{alias_entity_uri(ents[1], site)}> ."
        )
    return "\n".join(lines)


def _jsonld_payload(i: int, ents: list[int]) -> str:
    import json

    site = i % 97
    k = ents[0]
    doc = {
        "@context": {
            "schema": "http://schema.org/",
            "owl": "http://www.w3.org/2002/07/owl#",
            "name": {"@id": "http://schema.org/name"},
            "sameAs": {"@id": "http://www.w3.org/2002/07/owl#sameAs", "@type": "@id"},
            "knows": {"@id": "http://schema.org/knows", "@type": "@id"},
        },
        "@id": alias_entity_uri(k, site),
        "@type": entity_type(k),
        "name": entity_surface(k),
        "sameAs": canonical_entity_uri(k),
    }
    if len(ents) >= 2:
        doc["knows"] = {
            "@id": alias_entity_uri(ents[1], site),
            "@type": entity_type(ents[1]),
            "name": entity_surface(ents[1]),
            "sameAs": canonical_entity_uri(ents[1]),
        }
    return json.dumps(doc, indent=1, sort_keys=True)


def _rdfa_payload(i: int, ents: list[int]) -> str:
    site = i % 97
    parts = []
    for k in ents[:2]:
        parts.append(
            f'<div typeof="{entity_type(k)}" about="{alias_entity_uri(k, site)}">'
            f'<span property="http://schema.org/name">{entity_surface(k)}</span>'
            f'<link property="http://www.w3.org/2002/07/owl#sameAs" href="{canonical_entity_uri(k)}"/>'
            f"</div>"
        )
    return "\n".join(parts)


_LANGS = ["en", "en", "nl", "de", "en"]

_SENTENCES = [
    "The quarterly report from {e} outlines growth across all divisions.",
    "Researchers at {e} published findings on distributed graph processing.",
    "A new partnership with {e} was announced this week.",
    "Local officials credited {e} with the infrastructure initiative.",
    "Analysts expect {e} to expand into adjacent markets next year.",
]


_PSEUDO_CONS = "bdfgklmnprsvz"
_PSEUDO_VOW = "aeiou"
_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_U64 = (1 << 64) - 1


def _pseudo_paragraph(i: int, n_words: int = 50) -> str:
    """~350 chars of page-unique deterministic pseudo-prose (LCG-driven
    consonant-vowel syllables; the alphabet excludes 't'/'h' so the token
    'the' — which the i%29 near-dup branch rewrites — can never appear, and
    lowercase gibberish can never collide with a capitalized gazetteer
    surface).

    Why it exists: the 5-sentence template pool alone gives the corpus a
    period-1000 visible-text cycle — at 20k pages every page had ~19 twins
    whose 3-gram sets matched almost exactly, so near-dup dedup saw one
    giant clique (87%% of pages in >=0.9-Jaccard pairs) instead of a
    crawl-shaped corpus with planted mirrors (i%%23) and near-dups (i%%29).
    Each page's private gram mass from this paragraph pushes unrelated-page
    Jaccard to ~0.2, which also keeps MinHash-LSH band buckets far below
    the skew cap (expected bucket size ~ n * j^rows)."""
    h = (i * 1_000_003 + 0x9E3779B9) & _U64
    words = []
    for _ in range(n_words):
        h = (h * _LCG_A + _LCG_C) & _U64
        r = h >> 16
        n_syll = 2 + r % 3
        r >>= 2
        syls = []
        for _s in range(n_syll):
            syls.append(_PSEUDO_CONS[r % 13] + _PSEUDO_VOW[(r >> 4) % 5])
            r >>= 7
        words.append("".join(syls))
    return " ".join(words) + "."


def visible_text(i: int, ents: list[int]) -> str:
    if i % 29 == 0 and i > 0:
        # near-duplicate of page i-1 (one token changed)
        prev = visible_text(i - 1, page_entities(i - 1))
        return prev.replace("the", "that", 1)
    sents = [
        _SENTENCES[(i + j) % len(_SENTENCES)].format(e=entity_surface(k))
        for j, k in enumerate(ents)
    ]
    # mention sentences FIRST, page-unique filler AFTER: every q_kg mention
    # oracle derives offsets via first-occurrence strpos on the sentence
    # prefix, which an appended suffix cannot shift
    return " ".join(sents) + " " + _pseudo_paragraph(i)


def build_page(i: int) -> tuple:
    if i % 23 == 0 and i > 0:
        # full MIRROR of page i-1 (byte-identical html served at a second
        # url — the crawl-mirror shape exact text-dedup must collapse)
        url = f"https://ex{i % 97}.example.org/page/{i}"
        ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(seconds=int(i) % 2592000)
        prev = build_page(i - 1)
        return (url, ts, prev[2], prev[3], prev[4])
    ents = page_entities(i)
    mode = i % 3
    if mode == 0:
        payload = f'<script type="text/turtle">\n{_turtle_payload(i, ents)}\n</script>'
    elif mode == 1:
        payload = f'<script type="application/ld+json">\n{_jsonld_payload(i, ents)}\n</script>'
    else:
        payload = _rdfa_payload(i, ents)
    body_text = visible_text(i, ents)
    html = (
        "<html><head><title>Page %d</title><style>body{margin:0}</style></head>"
        "<body><nav><a href='/'>Home</a> | <a href='/about'>About</a></nav>"
        "<header><h1>Example Site %d</h1></header>"
        "<main>%s<p>%s</p></main>"
        "<footer>Copyright 2026 Example. All rights reserved.</footer>"
        "</body></html>" % (i, i % 97, payload, body_text)
    )
    url = f"https://ex{i % 97}.example.org/page/{i}"
    warc_ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(seconds=int(i) % 2592000)
    return (url, warc_ts, html.encode("utf-8"), extract_text(html), _LANGS[i % 5])


def pages_pdf(ids) -> pd.DataFrame:
    rows = [build_page(int(i)) for i in ids]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages_df(spark, n: int, partitions: int | None = None):
    """Distributed deterministic corpus of n pages."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism * 2)

    def gen(batches):
        for pdf in batches:
            yield pages_pdf(pdf["id"].tolist())

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_from_documents(spark, sf_dir: str):
    """Wrap the driver-provided ``documents`` table into Common-Crawl-style
    pages: each doc's text becomes page body, plus a deterministic Turtle
    payload keyed by doc_id (entities/shapes derived from doc_id like
    build_page). Lets every KG stage run over the official parquet inputs."""

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                i = int(doc_id)
                ents = page_entities(i)
                payload = f'<script type="text/turtle">\n{_turtle_payload(i, ents)}\n</script>'
                body = f"{text} {visible_text(i, ents)}"  # weave gazetteer mentions in
                html = (
                    "<html><head><title>Doc %d</title></head><body>"
                    "<nav><a href='/'>Home</a></nav>%s<p>%s</p>"
                    "<footer>Copyright 2026 Example.</footer></body></html>"
                    % (i, payload, body)
                )
                url = f"https://ex{i % 97}.example.org/doc/{i}"
                ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(seconds=i % 2592000)
                rows.append((url, ts, html.encode("utf-8"), extract_text(html), lang))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES_SCHEMA)


def _microdata_payload(i: int) -> str:
    """Deterministic schema.org microdata block for doc i — the third
    embedded-structured-data syntax (after JSON-LD and RDFa) on real crawl
    pages. Closed-form triple inventory (the q_kg_microdata DuckDB oracle
    reconstructs it from doc_id alone):

    subject S = https://ex{i%97}.example.org/prod/{i} (itemid):
      S rdf:type schema:Product
      S schema:name        "Product {i}"           (text capture, nested <b>)
      S schema:sku         "SKU-{i}"               (meta/content)
      S schema:url         "/item/{i}"             (relative a/href, no base)
      S schema:releaseDate "2026-01-{1+i%28:02d}"  (time/datetime)
    and when i%3==0 a nested anonymous Offer B = _:m1:
      S schema:offers B ; B rdf:type schema:Offer ;
      B schema:price "{(i*7)%100}.99"              (meta/content)
    """
    day = 1 + i % 28
    parts = [
        '<div itemscope itemtype="http://schema.org/Product" '
        f'itemid="https://ex{i % 97}.example.org/prod/{i}">',
        f'<span itemprop="name">Product <b>{i}</b></span>',
        f'<meta itemprop="sku" content="SKU-{i}">',
        f'<a itemprop="url" href="/item/{i}">item {i}</a>',
        f'<time itemprop="releaseDate" datetime="2026-01-{day:02d}">Jan {day}</time>',
    ]
    if i % 3 == 0:
        parts.append(
            '<div itemprop="offers" itemscope itemtype="http://schema.org/Offer">'
            f'<meta itemprop="price" content="{(i * 7) % 100}.99"></div>'
        )
    parts.append("</div>")
    return "".join(parts)


def microdata_pages_from_documents(spark, sf_dir: str):
    """documents -> pages whose embedded structured data is HTML microdata
    (itemscope/itemprop) instead of a <script> payload. Same distributed
    generation contract as pages_from_documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                i = int(doc_id)
                html = (
                    "<html><head><title>Doc %d</title></head><body>"
                    "<nav><a href='/'>Home</a></nav>%s<p>%s</p>"
                    "<footer>Copyright 2026 Example.</footer></body></html>"
                    % (i, _microdata_payload(i), text)
                )
                url = f"https://ex{i % 97}.example.org/doc/{i}"
                ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
                    seconds=i % 2592000
                )
                rows.append((url, ts, html.encode("utf-8"), extract_text(html), lang))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES_SCHEMA)


def reference_fixture_pages(spark, fixtures_glob: str = "/root/reference/tests/Fixtures/**/*.ttl"):
    """Test-only: the reference's golden TTL fixtures as pages rows (read at
    runtime from the read-only reference checkout; content is DATA, not code)."""
    import glob as _glob

    rows = []
    for idx, f in enumerate(sorted(_glob.glob(fixtures_glob, recursive=True))):
        with open(f) as fh:
            ttl = fh.read()
        html = (
            "<html><head><title>%s</title></head><body><nav>x</nav>"
            '<script type="text/turtle">\n%s\n</script>'
            "<p>Fixture %s</p><footer>f</footer></body></html>"
            % (f.rsplit("/", 1)[-1], ttl.replace("</script>", ""), f.rsplit("/", 1)[-1])
        )
        rows.append(
            (
                "fixture://" + f,
                _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc),
                html.encode("utf-8"),
                extract_text(html),
                "en",
            )
        )
    return spark.createDataFrame(rows, PAGES_SCHEMA)
