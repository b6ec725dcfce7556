"""Raw-crawl front half: HTML→text main-content extraction and unicode
normalization / encoding repair — the FIRST stages of every published
web-curation recipe (RefinedWeb's trafilatura pass, C4's line filters,
Dolma's ¶-level pipeline precede every quality/dedup filter this engine
already implements downstream).

Reference parity note: the reference (OpenMSIStream) ingests laboratory
instrument files and has no HTML stage; this module belongs to the
LLM-data-pipeline surface of the driver's north star. The heuristics
are the published, public ones:

- main-content selection by block-level TEXT/LINK DENSITY — the
  jusText / trafilatura / Kohlschütter-boilerplate family: split the
  page into block-tag-delimited segments, score each by cleaned text
  length and link-text share, keep long low-link-density blocks;
- encoding repair by a fixed mojibake substitution table (the ftfy
  device: UTF-8 bytes mis-decoded as cp1252 produce characteristic
  2-3 char sequences with an unambiguous inverse) plus NFC
  composition and control-character stripping.

Spark shape — why this scales to 100 TB:

- EVERYTHING in the HTML path is per-row column expressions
  (regexp_replace / split / higher-order transform-filter-aggregate
  over the block array): zero shuffle, zero Python, whole rows never
  leave their input partition. A page is processed where it was read.
- Unicode NFC is the ONE step Spark's function library cannot express
  (no ICU builtin); it runs as a single Arrow-vectorized pandas_udf —
  the sanctioned slow-path tier (SURVEY §2.9), still row-local.
- The mojibake table and entity map are fixed literals compiled into
  the plan, not joins.

Every predicate here is deterministic string arithmetic, so a SQL
oracle (DuckDB) reproduces the full pipeline bit-for-bit — see
``queries_extras7.py`` for the driver-verified pairings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- HTML

# Non-content subtrees removed wholesale before any segmentation (their
# inner text is never content). (?s): scripts span lines.
_NOISE_RX = (
    r"(?is)(?:<script(?:\s[^>]*)?>.*?</script>"
    r"|<style(?:\s[^>]*)?>.*?</style>"
    r"|<!--.*?-->)"
)

# Block-level tags delimit candidate text blocks (the jusText block
# unit). Inline tags (<a>, <b>, <span>, …) stay inside their block.
_BLOCK_TAGS = (
    "p|div|nav|footer|header|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th"
    "|article|section|aside|main|body|html|head|title|blockquote|pre"
    "|form|fieldset|figure|figcaption|br|hr"
)
_BLOCK_RX = rf"(?i)</?(?:{_BLOCK_TAGS})(?:\s[^>]*)?/?>"

# Segment separator injected where block tags were. U+001F (unit
# separator) — cannot occur in the input (normalize_text strips it, and
# real HTML never carries it); chr(31) exists in DuckDB too, unlike
# NUL, which DuckDB VARCHARs reject.
SEG_SEP = "\u001f"

# Minimal HTML entity map, decoded in this exact order; '&amp;' LAST so
# double-escaped entities stay escaped once (standard single-pass
# behavior: '&amp;lt;' → '&lt;', not '<').
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_LINK_RX = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"

DEFAULT_MIN_TEXT_LEN = 25
DEFAULT_MAX_LINK_DENSITY = 0.33


def _decode_entities(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def clean_block_text(col: Column) -> Column:
    """Visible text of one block: strip inline tags, decode entities,
    collapse whitespace runs to single spaces, trim.

    A DANGLING tag opener (``<div`` with no ``>`` before the block
    ends — tag soup like ``<div<p>`` cut at the block boundary) is
    dropped to end-of-block, mirroring the html5 tokenizer's
    EOF-in-tag behavior; without this, the newline join across blocks
    can compose a leaked ``<div`` with a later block's orphan ``>``
    into something tag-shaped (hypothesis-found, round 14). A bare
    ``<`` not opening a tag name (``5 < 6``) stays text, as in
    browsers."""
    col = F.regexp_replace(col, r"<[^>]*>", "")
    col = F.regexp_replace(col, r"<[A-Za-z!/?][^>]*\z", "")
    col = _decode_entities(col)
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _link_chars(seg: Column) -> Column:
    """Total cleaned-text characters inside <a>…</a> of one block —
    the numerator of jusText's link density."""
    links = F.regexp_extract_all(seg, F.lit(_LINK_RX), 1)
    return F.aggregate(
        links,
        F.lit(0),
        lambda acc, x: acc + F.length(clean_block_text(x)),
    )


def strip_tags(df: DataFrame, html_col: str, out_col: str = "text_all") -> DataFrame:
    """Whole-page tag strip (no block classification): noise subtrees
    removed, every remaining tag dropped, entities decoded, whitespace
    collapsed. The C4-style baseline when no main-content selection is
    wanted. Pure codegen string ops, zero shuffle. Tags become spaces
    (not empty strings) so adjacent blocks don't fuse into one word."""
    page = F.regexp_replace(F.col(html_col), _NOISE_RX, " ")
    page = F.regexp_replace(page, r"<[^>]*>", " ")
    page = _decode_entities(page)
    return df.withColumn(
        out_col, F.trim(F.regexp_replace(page, r"\s+", " "))
    )


def extract_main_content(
    df: DataFrame,
    html_col: str,
    out_col: str = "main_text",
    min_text_len: int = DEFAULT_MIN_TEXT_LEN,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """Main-content extraction (jusText/trafilatura-class): segment the
    page on block-level tags, clean each block, keep blocks with at
    least ``min_text_len`` cleaned characters whose link-text share is
    at most ``max_link_density``, and join the survivors with newlines.

    Adds ``out_col`` plus ``n_blocks`` (non-empty candidate blocks) and
    ``n_kept``. Everything is per-row higher-order column expressions
    over the block array — zero shuffle, zero Python, so the operator
    rides whatever partitioning the crawl scan already has at any
    corpus size.

    Boilerplate falls out by construction: navigation/related/footer
    blocks are nearly all link text (density ≈ 1 → dropped), chrome
    like titles and buttons is short (< ``min_text_len`` → dropped),
    while body paragraphs are long and link-sparse.
    """
    page = F.regexp_replace(F.col(html_col), _NOISE_RX, " ")
    segs = F.split(F.regexp_replace(page, _BLOCK_RX, SEG_SEP), SEG_SEP)
    feats = F.transform(
        segs,
        lambda s: F.struct(
            clean_block_text(s).alias("t"), _link_chars(s).alias("lc")
        ),
    )
    cand = F.filter(feats, lambda c: F.length(c["t"]) > 0)
    kept = F.filter(
        cand,
        lambda c: (F.length(c["t"]) >= F.lit(min_text_len))
        & (c["lc"] <= F.lit(float(max_link_density)) * F.length(c["t"])),
    )
    return (
        df.withColumn("_cand", cand)
        .withColumn("n_blocks", F.size("_cand").cast("long"))
        .withColumn("n_kept", F.size(kept).cast("long"))
        .withColumn(out_col, F.array_join(F.transform(kept, lambda c: c["t"]), "\n"))
        .drop("_cand")
    )


# ---------------------------------------------------------- C4 lines

# C4's published line/page rules (Raffel et al. 2020 §2.2): keep lines
# ending in terminal punctuation with at least `min_words` words and no
# banned token; drop whole pages containing a page-level marker.
C4_TERMINAL_RX = r'[.!?"]$'
C4_LINE_BANNED = ["javascript"]
C4_PAGE_BANNED = ["lorem ipsum", "{"]
C4_MIN_WORDS = 3


def c4_line_filter(
    df: DataFrame,
    text_col: str,
    out_col: str = "cleaned",
    min_words: int = C4_MIN_WORDS,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4's rule-based line filter: split on newlines, keep lines that
    end in terminal punctuation, have >= ``min_words`` whitespace words,
    and carry no banned token (case-insensitive); DROP the whole page if
    it contains a page-level marker ('lorem ipsum', '{') or fewer than
    ``min_kept_lines`` surviving lines (C4 uses a 5-sentence page rule;
    the knob lets short-document corpora keep the same shape).

    Complements ``drop_boilerplate_lines`` (frequency-based): these are
    the content-free rules that need no corpus statistics, so the whole
    operator is per-row codegen (split + higher-order filter + rejoin),
    zero shuffle at any corpus size. Adds ``out_col`` plus ``n_lines``
    and ``n_kept``; pages that fail the page rules are filtered out.
    """
    page_lc = F.lower(F.col(text_col))
    page_ok = F.lit(True)
    for marker in C4_PAGE_BANNED:
        page_ok = page_ok & ~page_lc.contains(marker.lower())
    lines = F.split(F.col(text_col), "\n")

    def _line_ok(ln: F.Column) -> F.Column:
        t = F.trim(ln)
        ok = t.rlike(C4_TERMINAL_RX) & (
            F.size(F.split(t, r"\s+")) >= F.lit(min_words)
        )
        for tok in C4_LINE_BANNED:
            ok = ok & ~F.lower(t).contains(tok.lower())
        return ok

    kept = F.filter(lines, _line_ok)
    return (
        df.filter(page_ok)
        .withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept", F.size(kept).cast("long"))
        .withColumn(out_col, F.array_join(F.transform(kept, F.trim), "\n"))
        .filter(F.col("n_kept") >= F.lit(min_kept_lines))
    )


# --------------------------------------------------------- paragraphs


def paragraphs(
    docs: DataFrame,
    tokens_per_para: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Explode documents into ordered, NON-overlapping token-run
    paragraphs → one row per (doc, para_idx) with the paragraph text —
    the unit of Dolma's ¶-level dedup (documents are deduplicated
    paragraph-by-paragraph, not whole). The tail run may be shorter
    than ``tokens_per_para``; it is a paragraph too.

    Pure per-row explode (split → sequence → slice → join): zero
    shuffle, the paragraphs of a document stay on its input partition.
    Unlike ``word_shingles`` there is NO distinct — dedup consumers
    need every occurrence, keyed by (doc, idx), to reassemble kept
    paragraphs in order.
    """
    n = int(tokens_per_para)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    para_arr = F.expr(
        f"transform(sequence(1, int(ceil(size(_toks) / {n}.0))), "
        f"i -> struct(CAST(i AS BIGINT) AS para_idx, "
        f"array_join(slice(_toks, (i-1)*{n} + 1, {n}), ' ') AS para))"
    )
    return (
        docs.withColumn("_toks", toks)
        .filter(F.size("_toks") >= 1)
        .select(
            F.col(id_col), *[F.col(c) for c in keep_cols],
            F.explode(para_arr).alias("_p"),
        )
        .select(
            id_col, *keep_cols,
            F.col("_p.para_idx").alias("para_idx"),
            F.col("_p.para").alias("para"),
        )
    )


# ------------------------------------------------------------ unicode

# cp1252-mojibake inverse table (the ftfy core device): UTF-8 byte
# sequences of common punctuation/Latin-1 letters, mis-decoded as
# cp1252, yield these exact character runs. Applied IN ORDER (3-char
# punctuation first; the 2-char 'Ã?' family is prefix-disjoint from it,
# U+00E2 vs U+00C3). Table is deliberately small and fixed — the
# high-frequency cases every crawl hits — and mirrored verbatim in the
# SQL oracle.
MOJIBAKE = [
    ("\u00e2\u20ac\u2122", "\u2019"),  # a-circ euro TM     -> right single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # a-circ euro oe     -> left double quote
    ("\u00e2\u20ac\u009d", "\u201d"),  # a-circ euro <9d>   -> right double quote
    ("\u00e2\u20ac\u201d", "\u2014"),  # a-circ euro rdquo  -> em dash
    ("\u00e2\u20ac\u201c", "\u2013"),  # a-circ euro ldquo  -> en dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # a-circ euro brokenbar-> ellipsis
    ("\u00c3\u00a9", "\u00e9"),  # A-tilde copyright-> e-acute
    ("\u00c3\u00a8", "\u00e8"),  # -> e-grave
    ("\u00c3\u00a4", "\u00e4"),  # -> a-umlaut
    ("\u00c3\u00b6", "\u00f6"),  # -> o-umlaut
    ("\u00c3\u00bc", "\u00fc"),  # -> u-umlaut
    ("\u00c3\u00b1", "\u00f1"),  # -> n-tilde
]

# C0 controls minus \t\n\r, DEL, and C1 controls. Stripped AFTER
# mojibake repair (the â€<9d> pattern contains U+009D).
_CTRL_RX = "[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f-\u009f]"


def repair_mojibake(col: Column) -> Column:
    """Fixed-table cp1252 mojibake inverse — pure literal replaces,
    whole chain stays in codegen."""
    for bad, good in MOJIBAKE:
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def nfc_udf():
    """Arrow-vectorized NFC composition (é as e+◌́ → single code point
    é, etc.). Spark has no ICU normalize builtin, so this is the one
    Python stage of the normalize pipeline; unicodedata implements the
    same canonical composition DuckDB's nfc_normalize anchors the
    oracle with."""
    import pandas as pd  # noqa: F401  (typing of the udf signature)
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # The UDF IS deterministic; the flag only narrows the optimizer's
    # freedom to clone it. Without it, a downstream filter referencing
    # the normalized column gets pushed beneath the normalize projection
    # and Catalyst duplicates the UDF into BOTH operators — every row
    # pays NFC twice (observed on the curated_crawl_docs chain: two
    # ArrowEvalPython stages for one normalize call). Marking it
    # non-deterministic pins one evaluation that both consumers share.
    return _nfc.asNondeterministic()


def normalize_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "text_norm",
    collapse_ws: bool = True,
) -> DataFrame:
    """Encoding repair + canonicalization, the ftfy-class basics in a
    fixed order: (1) mojibake inverse table, (2) control-char strip
    (C0 minus tab/newline/CR, DEL, C1), (3) NFC composition, (4)
    optional whitespace collapse + trim. Steps 1-2 and 4 are codegen
    column ops; step 3 is one Arrow stage (see ``nfc_udf``). Row-local
    throughout — zero shuffle at any corpus size."""
    col = repair_mojibake(F.col(text_col))
    col = F.regexp_replace(col, _CTRL_RX, "")
    col = nfc_udf()(col)
    if collapse_ws:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(out_col, col)
