"""HTML table extraction (operators/tables.py)."""


def _pages(spark, html: bytes, url: str = "u"):
    return spark.createDataFrame([(url, bytearray(html))], "url string, html binary")


def test_extract_tables_grid_and_headers(spark):
    from kgforge.operators.tables import extract_tables

    html = (b"<table><tr><th>Name</th><th>Age</th></tr>"
            b"<tr><td>Ada</td><td>41</td></tr></table>")
    got = {(r["row_idx"], r["col_idx"]): (r["cell"], r["is_header"])
           for r in extract_tables(_pages(spark, html)).collect()}
    assert got == {
        (0, 0): ("Name", True), (0, 1): ("Age", True),
        (1, 0): ("Ada", False), (1, 1): ("41", False),
    }


def test_extract_tables_multiple_tables_and_entities(spark):
    from kgforge.operators.tables import extract_tables

    html = (b"<TABLE class='x'><tr><td>a &amp; b</td></tr></TABLE>"
            b"<p>gap</p>"
            b"<table><tr><td>&lt;tag&gt; &quot;q&quot; &#39;s&#39;</td></tr></table>")
    rows = extract_tables(_pages(spark, html)).collect()
    by_tbl = {(r["table_idx"], r["row_idx"], r["col_idx"]): r["cell"] for r in rows}
    assert by_tbl[(0, 0, 0)] == "a & b"
    assert by_tbl[(1, 0, 0)] == "<tag> \"q\" 's'"


def test_extract_tables_inner_markup_and_no_tables(spark):
    from kgforge.operators.tables import extract_tables

    html = b"<table><tr><td><b>5</b> units</td><td><a href='/x'>link text</a></td></tr></table>"
    got = {r["col_idx"]: r["cell"] for r in extract_tables(_pages(spark, html)).collect()}
    assert got[0] == "5  units"        # tag -> space convention
    assert got[1] == "link text"
    assert extract_tables(_pages(spark, b"<p>no tables</p>", "u2")).count() == 0


def test_extract_tables_mixed_th_td_order(spark):
    from kgforge.operators.tables import extract_tables

    html = b"<table><tr><th>k</th><td>v</td></tr></table>"
    got = sorted(
        (r["col_idx"], r["cell"], r["is_header"])
        for r in extract_tables(_pages(spark, html)).collect()
    )
    assert got == [(0, "k", True), (1, "v", False)]


def test_table_column_profile_typing(spark):
    from kgforge.operators.tables import extract_tables, table_column_profile

    html = (b"<table><tr><th>name</th><th>score</th></tr>"
            b"<tr><td>alpha</td><td>1.5</td></tr>"
            b"<tr><td>beta</td><td>2</td></tr>"
            b"<tr><td>gamma</td><td>n/a</td></tr></table>")
    got = {r["col_idx"]: r for r in table_column_profile(
        extract_tables(_pages(spark, html))).collect()}
    assert got[0]["col_name"] == "name" and got[0]["inferred_type"] == "text"
    assert got[1]["col_name"] == "score" and got[1]["n_numeric"] == 2
    assert got[1]["inferred_type"] == "numeric"  # 2/3 >= 0.5


def test_table_column_profile_headerless(spark):
    from kgforge.operators.tables import extract_tables, table_column_profile

    html = b"<table><tr><td>1</td></tr><tr><td>2</td></tr></table>"
    got = table_column_profile(extract_tables(_pages(spark, html))).collect()[0]
    assert got["col_name"] is None and got["inferred_type"] == "numeric"
    assert got["n_cells"] == 2


def test_tables_to_triples_lifting(spark):
    from kgforge.operators.tables import extract_tables, tables_to_triples

    html = (b"<table><tr><th>Full Name</th><th></th></tr>"
            b"<tr><td>Ada</td><td>x</td></tr>"
            b"<tr><td></td><td>y</td></tr></table>")
    got = {(r["subject"], r["predicate"]): r["object"]
           for r in tables_to_triples(extract_tables(_pages(spark, html))).collect()}
    # header 'Full Name' slugs to full_name; empty header falls back col1;
    # the empty cell in row 2 produces NO triple
    assert got == {
        ("u#table0-row1", "http://example.org/col/full_name"): "Ada",
        ("u#table0-row1", "http://example.org/col/col1"): "x",
        ("u#table0-row2", "http://example.org/col/col1"): "y",
    }
