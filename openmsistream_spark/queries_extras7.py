"""Round-12 catalog additions, registered OUT-OF-BAND.

Same discipline as ``queries_extras*.py``: imported directly by the
catalog entry points (``__spark_entry__.py``, ``bench.py``,
``tests/conftest.py``), never from ``queries.py``, so landing new
queries does not dirty the source closure of already-verified entries.

Content — the raw-crawl FRONT half the r11 verdict named as the one
structural gap, plus Dolma's paragraph-level dedup composition:

- ``html_extract_main``: jusText/trafilatura-class main-content
  extraction (``llm/extract.py``) run over deterministic synthetic HTML
  framed around each document (the ``multimodal_pgm_decode``
  convention: synthesize real inputs from the corpus so the REAL
  operator runs, and the oracle re-implements the whole pipeline —
  synthesis AND extraction — independently in SQL).
- ``unicode_normalize_docs``: ftfy-class encoding repair (mojibake
  inverse table, control strip, NFC composition, whitespace collapse)
  over deterministically corrupted text; DuckDB's ``nfc_normalize``
  anchors the one step Spark expresses as an Arrow stage.
- ``paragraph_novelty_dedup``: Dolma's ¶-level dedup — explode docs
  into ordered token-run paragraphs, drop paragraphs whose bloom
  membership says "possibly already in the reference corpus", and
  re-assemble the survivors in order. Bloom verdicts are deterministic
  md5 arithmetic, mirrored exactly by the oracle (the
  ``bloom_gram_novelty`` convention).
- ``c4_line_filter``: C4's content-free line/page rules (terminal
  punctuation, min words, banned tokens, page markers) over planted
  line variants that exercise every rule.
- ``within_doc_paragraph_dedup``: Dolma's intra-page device — repeated
  paragraphs inside one document keep only their first occurrence.
- ``curated_crawl_docs``: the whole front half CHAINED (extract →
  normalize → C4 rules); the planted script/style braces would kill
  every page at the C4 '{' rule if extraction did not run first, so
  the oracle pins the stage order itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llm.extract import (
    _BLOCK_RX,
    _ENTITIES,
    _LINK_RX,
    _NOISE_RX,
    DEFAULT_MAX_LINK_DENSITY,
    DEFAULT_MIN_TEXT_LEN,
    MOJIBAKE,
    extract_main_content,
    normalize_text,
    paragraphs,
)
from .queries import load, query

# ------------------------------------------------------------ helpers
# SQL-expression builders that derive the oracle text from the SAME
# module constants the Spark operators compile in, so the two sides
# cannot drift.


def _sql_str(s: str) -> str:
    """A DuckDB expression reconstructing ``s``: printable-ASCII runs
    as quoted literals, everything else as chr() concats (control and
    non-ASCII chars must not appear raw in the SQL text)."""
    parts: list[str] = []
    run = ""

    def flush():
        nonlocal run
        if run:
            parts.append("'" + run.replace("'", "''") + "'")
            run = ""

    for ch in s:
        if 0x20 <= ord(ch) < 0x7F:
            run += ch
        else:
            flush()
            parts.append(f"chr({ord(ch)})")
    flush()
    return " || ".join(parts) if parts else "''"


def _sql_clean(expr: str) -> str:
    """DuckDB mirror of ``extract.clean_block_text``: strip inline
    tags, drop a dangling end-of-block tag opener (the round-14
    tag-soup fix — html5 EOF-in-tag behavior), decode entities in
    table order, collapse whitespace, trim."""
    s = f"regexp_replace({expr}, '<[^>]*>', '', 'g')"
    s = rf"regexp_replace({s}, '<[A-Za-z!/?][^>]*$', '', 's')"
    for ent, ch in _ENTITIES:
        s = f"replace({s}, '{ent}', {_sql_str(ch)})"
    return rf"trim(regexp_replace({s}, '\s+', ' ', 'g'))"


def _sql_moji(expr: str) -> str:
    """DuckDB mirror of ``extract.repair_mojibake`` (same table, same
    order)."""
    for bad, good in MOJIBAKE:
        expr = f"replace({expr}, {_sql_str(bad)}, {_sql_str(good)})"
    return expr


# ----------------------------------------------- html_extract_main

# Deterministic page framing around each document: boilerplate chrome
# (title/nav/related/footer — link-dense or short), noise subtrees
# (style/script/comment, the script holding a literal '<'), and the
# document's text as 100-char <p> paragraphs plus one entity-bearing
# paragraph. All pieces are plain string arithmetic over (doc_id,
# source, text), so the oracle rebuilds the page byte-identically.
_PARA_CHARS = 100

_H_TITLE1 = '<html><head><title>'
_H_TITLE2 = ' docs</title>'
_H_NOISE1 = (
    '<style>p { margin: 0; }</style>'
    '<script type="text/javascript">var d='
)
_H_NOISE2 = '; if (d < 99999) { d = d + 1; }</script></head><body>'
_H_NAV1 = '<nav><a href="/">Home</a> <a href="/s/'
_H_NAV2 = '">'
_H_NAV3 = '</a> <a href="/about">About</a></nav>'
_H_ENT1 = '<p>terms &amp; conditions apply to '
_H_ENT2 = ' users worldwide</p>'
_H_REL1 = '<div class="related"><a href="/r/1">'
_H_REL2 = ' related one</a> <a href="/r/2">'
_H_REL3 = ' related two</a></div>'
_H_CMT1 = '<!-- hidden <p>tracking boilerplate</p> for '
_H_CMT2 = ' -->'
_H_FOOT1 = '<footer>(c) 2024 '
_H_FOOT2 = ' <a href="/tos">Terms</a> <a href="/privacy">Privacy</a></footer></body></html>'


def _synth_html_spark(punct: bool = False) -> F.Column:
    # punct=True closes every body paragraph with a period — the E2E
    # chain needs terminal-punctuated lines for the C4 stage downstream
    dot = "'.', " if punct else ""
    # empty text must yield ZERO paragraph blocks: Spark's
    # sequence(1, 0) defaults to step -1 and returns [1, 0] (two
    # phantom blocks), while the oracle's range(1, 0 + 1) is empty —
    # guard with an explicit empty array so the engines agree
    paras = F.expr(
        f"CASE WHEN length(text) = 0 THEN array() "
        f"ELSE transform(sequence(1, int(ceil(length(text) / {_PARA_CHARS}.0))), "
        f"k -> concat('<p>', substring(text, (k-1)*{_PARA_CHARS} + 1, "
        f"{_PARA_CHARS}), {dot}'</p>')) END"
    )
    return F.concat(
        F.lit(_H_TITLE1), F.col("source"), F.lit(_H_TITLE2),
        F.lit(_H_NOISE1), F.col("doc_id").cast("string"), F.lit(_H_NOISE2),
        F.lit(_H_NAV1), F.col("source"), F.lit(_H_NAV2), F.col("source"),
        F.lit(_H_NAV3),
        F.array_join(paras, ""),
        F.lit(_H_ENT1), F.col("source"), F.lit(_H_ENT2),
        F.lit(_H_REL1), F.col("source"), F.lit(_H_REL2), F.col("source"),
        F.lit(_H_REL3),
        F.lit(_H_CMT1), F.col("source"), F.lit(_H_CMT2),
        F.lit(_H_FOOT1), F.col("source"), F.lit(_H_FOOT2),
    )


def _synth_html_sql(punct: bool = False) -> str:
    dot = " || '.'" if punct else ""
    return (
        f"{_sql_str(_H_TITLE1)} || source || {_sql_str(_H_TITLE2)}"
        f" || {_sql_str(_H_NOISE1)} || CAST(doc_id AS VARCHAR) || {_sql_str(_H_NOISE2)}"
        f" || {_sql_str(_H_NAV1)} || source || {_sql_str(_H_NAV2)} || source"
        f" || {_sql_str(_H_NAV3)}"
        # coalesce: DuckDB's array_to_string([], '') is NULL, which would
        # null the whole page for empty text — Spark's array_join of the
        # (guarded) empty block list is '' instead
        f" || coalesce(array_to_string(list_transform("
        f"range(1, CAST(ceil(length(text) / {_PARA_CHARS}.0) AS BIGINT) + 1),"
        f" k -> '<p>' || substr(text, CAST((k-1)*{_PARA_CHARS} + 1 AS BIGINT),"
        f" {_PARA_CHARS}){dot} || '</p>'), ''), '')"
        f" || {_sql_str(_H_ENT1)} || source || {_sql_str(_H_ENT2)}"
        f" || {_sql_str(_H_REL1)} || source || {_sql_str(_H_REL2)} || source"
        f" || {_sql_str(_H_REL3)}"
        f" || {_sql_str(_H_CMT1)} || source || {_sql_str(_H_CMT2)}"
        f" || {_sql_str(_H_FOOT1)} || source || {_sql_str(_H_FOOT2)}"
    )


_SYNTH_HTML_SQL = _synth_html_sql()

_HTML_SQL = rf"""
    WITH syn AS (
      SELECT doc_id, source, {_SYNTH_HTML_SQL} AS html
      FROM documents
      WHERE NOT regexp_matches(text, '[<>&]')),
    seglist AS (
      SELECT doc_id, source,
             string_split(regexp_replace(
               regexp_replace(html, '{_NOISE_RX}', ' ', 'g'),
               '{_BLOCK_RX}', chr(31), 'g'), chr(31)) AS segs
      FROM syn),
    segrows AS (
      SELECT doc_id, source, unnest(segs) AS seg,
             generate_subscripts(segs, 1) AS i
      FROM seglist),
    feat AS (
      SELECT doc_id, source, i,
             {_sql_clean('seg')} AS t,
             coalesce(list_sum(list_transform(
               regexp_extract_all(seg, '{_LINK_RX}', 1),
               x -> length({_sql_clean('x')}))), 0) AS lc
      FROM segrows)
    SELECT doc_id, source,
           CAST(count(*) FILTER (WHERE length(t) > 0) AS BIGINT) AS n_blocks,
           CAST(count(*) FILTER (WHERE length(t) >= {DEFAULT_MIN_TEXT_LEN}
                 AND lc <= {DEFAULT_MAX_LINK_DENSITY} * length(t)) AS BIGINT)
             AS n_kept,
           CAST(coalesce(length(string_agg(t, chr(10) ORDER BY i)
                 FILTER (WHERE length(t) >= {DEFAULT_MIN_TEXT_LEN}
                         AND lc <= {DEFAULT_MAX_LINK_DENSITY} * length(t))), 0)
             AS BIGINT) AS n_chars_main,
           md5(coalesce(string_agg(t, chr(10) ORDER BY i)
                 FILTER (WHERE length(t) >= {DEFAULT_MIN_TEXT_LEN}
                         AND lc <= {DEFAULT_MAX_LINK_DENSITY} * length(t)), ''))
             AS main_md5
    FROM feat
    GROUP BY doc_id, source
    """


@query(
    "html_extract_main",
    _HTML_SQL,
    doc="HTML->text main-content extraction (jusText/trafilatura-class "
    "block text/link-density classification) over deterministic "
    "synthetic pages framed around each document: script/style/comment "
    "subtrees removed (the script holds a literal '<'), the page split "
    "on block tags, each block cleaned (inline tags, entities, "
    "whitespace) in codegen, and blocks kept iff long enough and "
    "link-sparse enough — title and nav fail min-length, the related "
    "and footer blocks fail link density, body paragraphs survive. "
    "Entirely per-row higher-order column expressions: zero shuffle, "
    "zero Python; the oracle re-implements synthesis AND extraction "
    "independently in SQL",
    survey="LLM text analysis: HTML->text main-content extraction "
    "(raw-crawl front half, round-12)",
)
def html_extract_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        ~F.col("text").rlike("[<>&]")
    )
    pages = docs.select(
        "doc_id", "source", _synth_html_spark().alias("html")
    )
    out = extract_main_content(pages, "html")
    return out.select(
        "doc_id",
        "source",
        "n_blocks",
        "n_kept",
        F.length("main_text").cast("long").alias("n_chars_main"),
        F.md5(F.col("main_text").cast("binary")).alias("main_md5"),
    )


# ------------------------------------------- unicode_normalize_docs

# Deterministic corruption variants appended to each document's 40-char
# prefix; every corrupted char is drawn from the repair table /
# normalize contract so the pipeline visibly fixes something in 3 of 4
# variants: 0 = cp1252 mojibake, 1 = decomposed NFD pair, 2 = control
# chars, 3 = already clean.
_U_SUFFIXES = [
    " caf" + MOJIBAKE[6][0] + " says " + MOJIBAKE[1][0] + "hi" + MOJIBAKE[2][0] + " ok",
    " caf" + "e\u0301" + " latte",  # NFD pair -> NFC composes
    " x" + "\u0007\u001b\u007f" + "y end",  # bell/esc/DEL stripped
    " plain tail text",
]

_UNICODE_SQL = rf"""
    WITH raw AS (
      SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS variant,
             substr(text, 1, 40) || CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN {_sql_str(_U_SUFFIXES[0])}
               WHEN 1 THEN {_sql_str(_U_SUFFIXES[1])}
               WHEN 2 THEN {_sql_str(_U_SUFFIXES[2])}
               ELSE {_sql_str(_U_SUFFIXES[3])} END AS t
      FROM documents),
    norm AS (
      SELECT doc_id, variant, t,
             trim(regexp_replace(nfc_normalize(regexp_replace(
               {_sql_moji('t')},
               '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]', '', 'g')),
               '\s+', ' ', 'g')) AS tn
      FROM raw)
    SELECT doc_id, variant,
           CAST(length(t) AS BIGINT) AS n_chars_raw,
           CAST(length(tn) AS BIGINT) AS n_chars_norm,
           md5(tn) AS norm_md5
    FROM norm
    """


@query(
    "unicode_normalize_docs",
    _UNICODE_SQL,
    doc="unicode normalization / encoding repair (ftfy-class basics in "
    "a fixed order: cp1252-mojibake inverse table, control-char strip, "
    "NFC composition, whitespace collapse) over deterministically "
    "corrupted text — mojibake quotes/accents repaired, decomposed "
    "e+combining-acute composed to one code point, bell/escape/DEL "
    "stripped. Repair table and control class are codegen literal "
    "replaces; NFC is the one Arrow stage (Spark has no ICU builtin; "
    "DuckDB's nfc_normalize anchors the oracle). Row-local, zero "
    "shuffle",
    survey="LLM text analysis: unicode normalization / encoding repair "
    "(raw-crawl front half, round-12)",
)
def unicode_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 4).cast("int")
    raw = F.concat(
        F.substring("text", 1, 40),
        F.when(m == 0, F.lit(_U_SUFFIXES[0]))
        .when(m == 1, F.lit(_U_SUFFIXES[1]))
        .when(m == 2, F.lit(_U_SUFFIXES[2]))
        .otherwise(F.lit(_U_SUFFIXES[3])),
    )
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 4).cast("long").alias("variant"),
        raw.alias("t"),
    )
    out = normalize_text(base, "t", out_col="tn")
    return out.select(
        "doc_id",
        "variant",
        F.length("t").cast("long").alias("n_chars_raw"),
        F.length("tn").cast("long").alias("n_chars_norm"),
        F.md5(F.col("tn").cast("binary")).alias("norm_md5"),
    )


# ---------------------------------------- paragraph_novelty_dedup

# Dolma's ¶-level device composed from existing operators: paragraphs
# (llm/extract.py) -> md5-16 keys -> bloom membership vs the reference
# corpus (src0) -> survivors re-assembled in order. Same mask geometry
# as bloom_gram_novelty (2^20 bits, 4 probes); the sharded-bloom twin
# (llm/bloom_sharded.py) drops in for reference sets past the
# broadcast regime.
_PARA_TOKENS = 4
_PARA_M_BITS = 1 << 20
_PARA_K = 4

_PARA_SQL = rf"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents),
    paras AS (
      SELECT doc_id, source, i,
             array_to_string(ws[(i-1)*{_PARA_TOKENS}+1 : i*{_PARA_TOKENS}], ' ')
               AS para
      FROM (SELECT doc_id, source, ws,
                   unnest(range(1, CAST(ceil(len(ws) / {_PARA_TOKENS}.0)
                                        AS BIGINT) + 1)) AS i
            FROM toks WHERE len(ws) >= 1) t),
    keyed AS (
      SELECT doc_id, source, i, para, substr(md5(para), 1, 16) AS k
      FROM paras),
    pos AS (
      SELECT doc_id, source, i, para,
             ('0x' || substr(md5(k || '#' || CAST(s.j AS VARCHAR)), 1, 15))::UBIGINT
               % {_PARA_M_BITS} AS pos
      FROM keyed CROSS JOIN (SELECT unnest(range({_PARA_K})) AS j) s),
    build AS (SELECT DISTINCT pos FROM pos WHERE source = 'src0'),
    marked AS (
      SELECT p.doc_id, p.i, p.para,
             bool_and(b.pos IS NOT NULL) AS maybe_seen
      FROM pos p LEFT JOIN build b ON b.pos = p.pos
      WHERE p.source <> 'src0'
      GROUP BY 1, 2, 3)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(count(*) FILTER (WHERE NOT maybe_seen) AS BIGINT) AS n_kept,
           CAST(coalesce(length(string_agg(para, chr(10) ORDER BY i)
                 FILTER (WHERE NOT maybe_seen)), 0) AS BIGINT) AS n_chars_kept,
           md5(coalesce(string_agg(para, chr(10) ORDER BY i)
                 FILTER (WHERE NOT maybe_seen), '')) AS kept_md5
    FROM marked
    GROUP BY doc_id
    """


@query(
    "paragraph_novelty_dedup",
    _PARA_SQL,
    doc="paragraph-level dedup (Dolma's device): documents explode into "
    "ordered non-overlapping token-run paragraphs row-locally, the "
    "reference corpus (src0) collapses to a broadcast 2^20-bit bloom "
    "mask, every probe paragraph answers membership locally (Arrow "
    "stage vs the broadcast mask — zero probe-side shuffle), and each "
    "document re-assembles its definitely-novel paragraphs in order "
    "with ONE doc-keyed aggregate. Bloom verdicts (false positives "
    "included) are deterministic md5 arithmetic mirrored exactly by "
    "the oracle; the sharded-bloom twin covers reference sets past "
    "the broadcast regime",
    survey="LLM dedup: paragraph-level bloom dedup + reassembly "
    "(Dolma composition, round-12)",
)
def paragraph_novelty_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.bloom import bloom_build, bloom_mark

    docs = load(spark, sf_dir, "documents")
    paras = paragraphs(docs, tokens_per_para=_PARA_TOKENS).withColumn(
        "k", F.substring(F.md5(F.col("para").cast("binary")), 1, 16)
    )
    bloom = bloom_build(
        paras.filter(F.col("source") == "src0").select("k"),
        "k",
        m_bits=_PARA_M_BITS,
        k=_PARA_K,
    )
    marked = bloom_mark(
        paras.filter(F.col("source") != "src0"), "k", bloom
    )
    kept_struct = F.when(
        ~F.col("maybe_seen"), F.struct("para_idx", "para")
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(kept_struct)), lambda s: s["para"]
        ),
        "\n",
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.sum(F.when(F.col("maybe_seen"), 0).otherwise(1))
            .cast("long")
            .alias("n_kept"),
            kept_text.alias("_kt"),
        )
        .select(
            "doc_id",
            "n_paras",
            "n_kept",
            F.length("_kt").cast("long").alias("n_chars_kept"),
            F.md5(F.col("_kt").cast("binary")).alias("kept_md5"),
        )
    )


# --------------------------------------------------- c4_line_filter

# Planted multi-line structure (the boilerplate_line_dedup convention —
# the corpus is single-line soup, so both sides frame the same lines):
# a long terminal-punctuated line (kept), a 2-word line (dropped:
# min-words), an unpunctuated slice (dropped: terminal rule), a
# javascript line on every 7th doc (dropped: banned token), a constant
# closing line (kept), and page-level lorem-ipsum / brace markers on
# every 11th / 13th doc (whole page dropped).
def _c4_aug_col() -> F.Column:
    return F.concat(
        F.substring("text", 1, 60), F.lit(" one done.\nok.\n"),
        F.substring("text", 61, 60), F.lit("\n"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("please enable javascript today.\n"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit("as seen in lorem ipsum pages.\n"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0, F.lit("config { a }\n")
        ).otherwise(F.lit("")),
        F.lit("the final line stands here!"),
    )


_C4_AUG_SQL = (
    "substr(text, 1, 60) || ' one done.' || chr(10) || 'ok.' || chr(10)"
    " || substr(text, 61, 60) || chr(10)"
    " || CASE WHEN doc_id % 7 = 0"
    "    THEN 'please enable javascript today.' || chr(10) ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0"
    "    THEN 'as seen in lorem ipsum pages.' || chr(10) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0"
    "    THEN 'config { a }' || chr(10) ELSE '' END"
    " || 'the final line stands here!'"
)

_C4_LINE_OK = (
    r"regexp_matches(trim(x), '[.!?\x22]$')"
    r" AND len(string_split_regex(trim(x), '\s+')) >= 3"
    r" AND NOT contains(lower(trim(x)), 'javascript')"
)

_C4_SQL = rf"""
    WITH aug AS (
      SELECT doc_id, {_C4_AUG_SQL} AS t FROM documents),
    pages AS (
      SELECT doc_id, t, string_split(t, chr(10)) AS lines,
             list_filter(string_split(t, chr(10)), x -> {_C4_LINE_OK}) AS kept
      FROM aug
      WHERE NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(lower(t), '{{'))
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           md5(array_to_string(list_transform(kept, x -> trim(x)), chr(10)))
             AS cleaned_md5
    FROM pages
    WHERE len(kept) >= 1
    """


@query(
    "c4_line_filter",
    _C4_SQL,
    doc="C4's rule-based line/page filter (Raffel et al. 2020 sec 2.2): "
    "keep lines ending in terminal punctuation with >= 3 words and no "
    "banned token; drop whole pages containing 'lorem ipsum' or a "
    "brace — the content-free companion to the frequency-based "
    "boilerplate_line_dedup, needing zero corpus statistics, so the "
    "whole operator is per-row codegen (split + higher-order filter + "
    "rejoin), zero shuffle at any corpus size; planted line variants "
    "exercise every rule on both engines",
    survey="LLM curation: C4 rule-based line filter (raw-crawl front "
    "half, round-12)",
)
def c4_line_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.extract import c4_line_filter

    docs = load(spark, sf_dir, "documents")
    aug = docs.select("doc_id", _c4_aug_col().alias("t"))
    out = c4_line_filter(aug, "t")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5(F.col("cleaned").cast("binary")).alias("cleaned_md5"),
    )


# ------------------------------------- within_doc_paragraph_dedup

# Dolma's OTHER paragraph device: repeated paragraphs WITHIN one
# document (boilerplate that loops inside a page) keep only their first
# occurrence; the document is rebuilt in original order. No reference
# corpus, no bloom — one (doc, para)-keyed window + one doc-keyed
# reassembly aggregate, both partitioned by doc_id at scale.
_WD_TOKENS = 2

_WD_SQL = rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents),
    paras AS (
      SELECT doc_id, i,
             array_to_string(ws[(i-1)*{_WD_TOKENS}+1 : i*{_WD_TOKENS}], ' ')
               AS para
      FROM (SELECT doc_id, ws,
                   unnest(range(1, CAST(ceil(len(ws) / {_WD_TOKENS}.0)
                                        AS BIGINT) + 1)) AS i
            FROM toks WHERE len(ws) >= 1) t),
    rk AS (
      SELECT doc_id, i, para,
             row_number() OVER (PARTITION BY doc_id, para ORDER BY i) AS rn
      FROM paras)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
           CAST(coalesce(length(string_agg(para, chr(10) ORDER BY i)
                 FILTER (WHERE rn = 1)), 0) AS BIGINT) AS n_chars_kept,
           md5(coalesce(string_agg(para, chr(10) ORDER BY i)
                 FILTER (WHERE rn = 1), '')) AS kept_md5
    FROM rk
    GROUP BY doc_id
    """


@query(
    "within_doc_paragraph_dedup",
    _WD_SQL,
    doc="within-document paragraph dedup (Dolma's intra-page device): a "
    "paragraph repeated inside one document keeps only its first "
    "occurrence, the document rebuilt in original order — one "
    "(doc, para)-keyed first-occurrence window plus one doc-keyed "
    "reassembly aggregate, both hash-partitioned by doc_id so the "
    "operator scales with documents, never corpus-wide state; "
    "complements paragraph_novelty_dedup (cross-corpus bloom)",
    survey="LLM dedup: within-document paragraph dedup (Dolma "
    "composition, round-12)",
)
def within_doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    paras = paragraphs(docs, tokens_per_para=_WD_TOKENS, keep_cols=())
    w = Window.partitionBy("doc_id", "para").orderBy("para_idx")
    rk = paras.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("para_idx", "para"))
    kept_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(kept_struct)), lambda s: s["para"]
        ),
        "\n",
    )
    return (
        rk.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            kept_text.alias("_kt"),
        )
        .select(
            "doc_id",
            "n_paras",
            "n_kept",
            F.length("_kt").cast("long").alias("n_chars_kept"),
            F.md5(F.col("_kt").cast("binary")).alias("kept_md5"),
        )
    )


# ------------------------------------------------ curated_crawl_docs

# The whole front half CHAINED, end to end, as one oracle-paired query:
# synthetic page (body paragraphs closed with periods this time — the
# C4 stage downstream needs terminal punctuation) -> main-content
# extraction -> unicode normalize (line structure preserved) -> C4
# line/page rules. The braces in the planted <style>/<script> blocks
# would kill every page at the C4 page rule if extraction did not
# remove them first — the stage ORDER is what this entry pins.
#
# Normalize mirror order matters even though every step is identity on
# this ASCII corpus: mojibake repair INSIDE (first), then control
# strip, then NFC — exactly normalize_text's sequence, same as the
# _UNICODE_SQL mirror (a second-pass review caught the chain wrapped
# the other way around; swapped before any non-ASCII corpus could
# diverge the engines).
_E2E_NORM = (
    "nfc_normalize(regexp_replace({x}, "
    r"'[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]', '', 'g'))"
)

_E2E_SQL = rf"""
    WITH syn AS (
      SELECT doc_id, source, {_synth_html_sql(punct=True)} AS html
      FROM documents
      WHERE NOT regexp_matches(text, '[<>&]')),
    seglist AS (
      SELECT doc_id, source,
             string_split(regexp_replace(
               regexp_replace(html, '{_NOISE_RX}', ' ', 'g'),
               '{_BLOCK_RX}', chr(31), 'g'), chr(31)) AS segs
      FROM syn),
    segrows AS (
      SELECT doc_id, source, unnest(segs) AS seg,
             generate_subscripts(segs, 1) AS i
      FROM seglist),
    feat AS (
      SELECT doc_id, source, i,
             {_sql_clean('seg')} AS t,
             coalesce(list_sum(list_transform(
               regexp_extract_all(seg, '{_LINK_RX}', 1),
               x -> length({_sql_clean('x')}))), 0) AS lc
      FROM segrows),
    main AS (
      SELECT doc_id, source,
             coalesce(string_agg(t, chr(10) ORDER BY i)
               FILTER (WHERE length(t) >= {DEFAULT_MIN_TEXT_LEN}
                       AND lc <= {DEFAULT_MAX_LINK_DENSITY} * length(t)), '')
               AS mt
      FROM feat GROUP BY doc_id, source),
    norm AS (
      SELECT doc_id, source,
             {_E2E_NORM.format(x=_sql_moji('mt'))} AS t
      FROM main),
    pages AS (
      SELECT doc_id, source, string_split(t, chr(10)) AS lines,
             list_filter(string_split(t, chr(10)), x -> {_C4_LINE_OK}) AS kept
      FROM norm
      WHERE NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(lower(t), '{{'))
    SELECT doc_id, source,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           md5(array_to_string(list_transform(kept, x -> trim(x)), chr(10)))
             AS cleaned_md5
    FROM pages
    WHERE len(kept) >= 1
    """


@query(
    "curated_crawl_docs",
    _E2E_SQL,
    doc="the published crawl recipe's FRONT HALF chained end to end in "
    "one query: synthetic pages -> jusText-class main-content "
    "extraction -> unicode normalize (mojibake/control/NFC, line "
    "structure preserved) -> C4 line/page rules; the planted "
    "script/style braces would kill every page at the C4 '{' rule if "
    "extraction did not remove them first, so the chain ORDER itself "
    "is oracle-pinned; output feeds the engine's existing dedup/"
    "quality/decontamination back half (cf. curated_corpus)",
    survey="LLM curation: chained front-half E2E (extract -> normalize "
    "-> C4, round-12)",
)
def curated_crawl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm.extract import c4_line_filter

    docs = load(spark, sf_dir, "documents").filter(
        ~F.col("text").rlike("[<>&]")
    )
    pages = docs.select(
        "doc_id", "source", _synth_html_spark(punct=True).alias("html")
    )
    main = extract_main_content(pages, "html", out_col="mt").select(
        "doc_id", "source", "mt"
    )
    norm = normalize_text(main, "mt", out_col="t", collapse_ws=False)
    out = c4_line_filter(norm, "t")
    return out.select(
        "doc_id",
        "source",
        "n_lines",
        "n_kept",
        F.md5(F.col("cleaned").cast("binary")).alias("cleaned_md5"),
    )
