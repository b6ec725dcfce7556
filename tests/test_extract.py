"""llm/extract.py — HTML→text main-content extraction, unicode
normalization, and the paragraph explode (raw-crawl front half,
round 12). Edge semantics live here; the three-scale oracle pairing
covers the corpus-level pipelines."""

from openmsistream_spark.llm.extract import (
    MOJIBAKE,
    extract_main_content,
    normalize_text,
    paragraphs,
    strip_tags,
)

SF = "/root/testdata/sf0.001"

PAGE = (
    "<html><head><title>t1</title><style>p{margin:0}</style>"
    "<script type='text/javascript'>var n=1; if (n<2) { n=3; }</script></head><body>"
    "<nav><a href='/'>Home</a> <a href='/about'>About</a></nav>"
    "<p>this is a long enough paragraph of body text that should certainly survive</p>"
    "<p>short</p>"
    "<div>another long paragraph with an inline <a href='/x'>link</a> inside but mostly prose</div>"
    "<div class='rel'><a href='/r1'>related one</a> <a href='/r2'>related two</a>"
    " <a href='/r3'>related three</a></div>"
    "<!-- a comment with <p>fake</p> tags -->"
    "<footer>(c) <a href='/tos'>Terms</a> &amp; <a href='/priv'>Privacy</a></footer>"
    "</body></html>"
)


def test_extract_main_drops_boilerplate_keeps_body(spark):
    df = spark.createDataFrame([(1, PAGE)], "id long, html string")
    r = extract_main_content(df, "html").first()
    main = r.main_text.split("\n")
    # exactly the two body paragraphs survive, in document order
    assert len(main) == 2 and r.n_kept == 2
    assert main[0].startswith("this is a long enough paragraph")
    # inline link TEXT is retained inside a kept block (tags stripped)
    assert "inline link inside" in main[1]
    # boilerplate is gone: nav, related links, footer, title, comment
    joined = r.main_text
    for frag in ("Home", "related", "Terms", "t1", "fake"):
        assert frag not in joined
    # candidates counted: title, nav, 2 long paras, 'short', related,
    # footer = 7 non-empty blocks
    assert r.n_blocks == 7


def test_extract_min_len_and_density_knobs(spark):
    df = spark.createDataFrame([(1, PAGE)], "id long, html string")
    # min_text_len=1 admits 'short' and the title and footer text; the
    # pure-link blocks still die to density
    loose = extract_main_content(df, "html", min_text_len=1).first()
    assert loose.n_kept > 2
    texts = loose.main_text.split("\n")
    assert "short" in texts and "t1" in texts
    assert not any("related one" in t for t in texts)
    # density=1.0 admits everything non-empty
    all_in = extract_main_content(
        df, "html", min_text_len=1, max_link_density=1.0
    ).first()
    assert all_in.n_kept == all_in.n_blocks == 7


def test_extract_entities_and_script_lt(spark):
    # the '<' inside the script must not break segmentation, and
    # '&amp;lt;' decodes single-pass to '&lt;' (never to '<')
    page = (
        "<script>if (1<2) { x=1; }</script>"
        "<p>alpha &amp;lt; beta mixed &quot;quote&quot; and &#39;tick&#39; done</p>"
    )
    df = spark.createDataFrame([(1, page)], "id long, html string")
    r = extract_main_content(df, "html").first()
    assert r.main_text == "alpha &lt; beta mixed \"quote\" and 'tick' done"
    assert r.n_blocks == 1 and r.n_kept == 1


def test_strip_tags_spaces_blocks(spark):
    df = spark.createDataFrame(
        [(1, "<p>one</p><p>two</p><script>var x=1;</script>")],
        "id long, html string",
    )
    r = strip_tags(df, "html").first()
    # adjacent blocks must not fuse into 'onetwo'
    assert r.text_all == "one two"


def test_normalize_repairs_every_mojibake_entry(spark):
    rows = [(i, f"a {bad} z") for i, (bad, _) in enumerate(MOJIBAKE)]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r.id: r.text_norm for r in normalize_text(df, "t").collect()}
    for i, (_, good) in enumerate(MOJIBAKE):
        # U+009D inside one GOOD-side neighborhood is control-stripped
        # only on the BAD side; the repaired char itself must survive
        assert out[i] == f"a {good} z", (i, out[i])


def test_normalize_controls_nfc_whitespace(spark):
    nfd = "cafe\u0301"  # decomposed e + combining acute
    ctrl = "x\u0007\u001b\u007f\u009fy"
    df = spark.createDataFrame(
        [(1, f"  {nfd}   {ctrl}  "), (2, None)], "id long, t string"
    )
    rows = {r.id: r.text_norm for r in normalize_text(df, "t").collect()}
    assert rows[1] == "caf\u00e9 xy"  # composed, stripped, collapsed
    assert rows[2] is None
    # tab/newline/CR survive the control strip (they are whitespace,
    # handled by the collapse step, not stripped as controls)
    df2 = spark.createDataFrame([(1, "a\tb\nc")], "id long, t string")
    assert normalize_text(df2, "t").first().text_norm == "a b c"
    no_collapse = normalize_text(df2, "t", collapse_ws=False).first()
    assert no_collapse.text_norm == "a\tb\nc"


def test_paragraphs_order_tail_and_locality(spark):
    df = spark.createDataFrame(
        [(7, "s", "A B C D E F G H I J")], "doc_id long, source string, text string"
    )
    rows = paragraphs(df, tokens_per_para=4).orderBy("para_idx").collect()
    assert [(r.para_idx, r.para) for r in rows] == [
        (1, "a b c d"), (2, "e f g h"), (3, "i j"),
    ]
    assert all(r.source == "s" for r in rows)
    # zero shuffle: the explode plan has no Exchange
    explained = paragraphs(df, tokens_per_para=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained


def test_html_catalog_entry_plan_is_pure_codegen(spark):
    """The extraction catalog entry must stay entirely JVM-side (zero
    Python eval of any tier) and shuffle-free: one scan, one project."""
    from openmsistream_spark.queries import QUERIES

    df = QUERIES["html_extract_main"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
    # and the unicode entry's ONLY Python is the one Arrow NFC stage
    dfu = QUERIES["unicode_normalize_docs"].fn(spark, SF)
    planu = dfu._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in planu
    assert planu.count("ArrowEvalPython") == 1
    assert "Exchange" not in planu


def test_c4_line_filter_rules(spark):
    from openmsistream_spark.llm.extract import c4_line_filter

    pages = [
        # doc 1: one good line, one short, one unpunctuated, one banned
        (1, "alpha beta gamma delta done.\nok.\nno terminal punct here\n"
            "please enable javascript today.\nthe final line stands here!"),
        # doc 2: page-level lorem ipsum marker -> whole page dropped
        (2, "a perfectly fine long line here.\nas seen in lorem ipsum pages."),
        # doc 3: brace marker -> dropped
        (3, "another perfectly fine long line.\nconfig { a }"),
        # doc 4: nothing survives the line rules -> dropped by min_kept
        (4, "short.\nno punct line at all"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, t string")
    out = {r.doc_id: r for r in c4_line_filter(df, "t").collect()}
    assert set(out) == {1}
    r = out[1]
    assert r.n_lines == 5 and r.n_kept == 2
    assert r.cleaned == (
        "alpha beta gamma delta done.\nthe final line stands here!"
    )
    # terminal quote counts as terminal punctuation
    df2 = spark.createDataFrame(
        [(9, 'he said "stop right there."\nshe said "why not now?"')],
        "doc_id long, t string",
    )
    r2 = c4_line_filter(df2, "t").first()
    assert r2.n_kept == 2


def test_e2e_chain_plan_single_arrow_stage(spark):
    """curated_crawl_docs (extract -> normalize -> C4 rules chained)
    must stay shuffle-free with exactly the one Arrow NFC stage — the
    whole front half rides the scan's partitioning at any scale."""
    from openmsistream_spark.queries import QUERIES

    df = QUERIES["curated_crawl_docs"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_synth_html_empty_text_matches_oracle(spark):
    """Spark's sequence(1, 0) defaults to step -1 ([1, 0] — two phantom
    blocks) and DuckDB's array_to_string([], '') is NULL (nulling the
    page): both empty-text edge cases are guarded, and the two synth
    sides agree byte-for-byte (round-12 review finding)."""
    import duckdb

    from openmsistream_spark.queries_extras7 import (
        _synth_html_spark,
        _synth_html_sql,
    )

    df = spark.createDataFrame(
        [(1, "", "src0"), (2, "x" * 250, "src1"), (3, "x" * 100, "s")],
        "doc_id long, text string, source string",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT 1 AS doc_id, '' AS \"text\", 'src0' AS source"
        " UNION ALL SELECT 2, repeat('x', 250), 'src1'"
        " UNION ALL SELECT 3, repeat('x', 100), 's'"
    )
    for punct in (False, True):
        got = {
            r.doc_id: r.h
            for r in df.select(
                "doc_id", _synth_html_spark(punct=punct).alias("h")
            ).collect()
        }
        want = dict(
            con.execute(
                f"SELECT doc_id, {_synth_html_sql(punct=punct)} FROM t"
            ).fetchall()
        )
        assert got == want
        # an empty-text page is a real page with ZERO paragraph blocks
        assert want[1] is not None and "<p>x" not in want[1]
        assert want[2].count("<p>x") == 3 and want[3].count("<p>x") == 1
