"""HTML → main-content text extraction (boilerplate stripping).

The first operator of a crawl-to-corpus pipeline: raw HTML in, the
page's MAIN text out — chrome (navigation, footers, scripts, ad/link
blocks) stripped by deterministic tag + link-density rules, the
classic jusText/boilerpipe family reduced to its portable core:

1. **Tag rules**: everything inside ``script style nav header footer
   aside form noscript template iframe svg head`` contributes nothing.
2. **Block segmentation**: text is gathered per block-level element
   (``p div li h1–h6 td th pre blockquote article section``); text
   outside any block (inter-tag whitespace, stray chrome) is dropped.
3. **Link-density rule**: a block is boilerplate iff the share of its
   non-whitespace characters under an ``<a>`` ancestor exceeds
   ``max_link_density`` (default 0.5) — "related links" / menu blocks
   are nearly all anchor text, prose is nearly none.

Reference precedent: the reference's HTML scrapes
(``/root/reference/dags/brz_bonds_meta_monthly/extractors.py:25-55``,
``/root/reference/dags/brz_industry_code_daily/extractors.py:67-110``)
parse bespoke pages with hand-written table walks; this operator is
the corpus-scale generalization on the public-stdlib parser.

Shape at scale: PER-DOCUMENT — nothing crosses a page boundary, so
the whole operator is one shuffle-free Arrow ``mapInPandas`` kernel
(the round-13/14 kernel regime), O(html_len) per page, no
corpus-derived state. At 100 TB of crawl this is embarrassingly
parallel; the only knobs are input split sizing (``io.
parallelize_narrow`` locally, file splits on a real lake).

Whitespace discipline: all tokenization/counting inside the kernel is
ASCII-``\\s`` (``re.ASCII``), matching the engine's Java/DuckDB twin
convention (see ``py_tokens``) so digests replicate in oracle SQL.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: elements whose entire subtree is chrome, never content.
SKIP_TAGS = frozenset(
    "script style nav header footer aside form noscript template "
    "iframe svg head".split()
)
#: block-level elements that segment text into candidate blocks.
BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 td th pre blockquote article "
    "section".split()
)

#: fixture constants shared by :func:`html_fixture` and the oracle
#: generator in ``capital/queries/llm_queries.py`` (the generated-
#: oracle convention): paragraphs of CHUNK tokens, every LINKY_MOD-th
#: paragraph rendered as an all-anchor "related links" block.
FIXTURE_CHUNK = 10
FIXTURE_LINKY_MOD = 3

_WS = re.compile(r"\s+", re.ASCII)


def _nonspace_len(s: str) -> int:
    """Non-whitespace character count, ASCII-``\\s`` discipline."""
    return sum(len(p) for p in _WS.split(s) if p)


class _MainContentParser(HTMLParser):
    """Streaming block collector: per block, the raw text pieces plus
    exact (total, linked) non-whitespace char counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        # Anchor state is a STACK of was-opened-inside-chrome flags,
        # maintained REGARDLESS of skip regions (round-15 review): a
        # mis-nested `<a>logo<footer></a>chrome</footer>` — ubiquitous
        # in real crawls — must still pop on the in-chrome `</a>`, or
        # every later prose block counts as anchored and is stripped.
        # Text is anchored iff some open anchor was opened OUTSIDE
        # chrome.
        self._a_stack: list[bool] = []
        # each block: [pieces, total_nonspace, linked_nonspace]
        self.blocks: list[list] = []
        self._cur: list | None = None

    def _open_block(self) -> None:
        self._flush_block()
        self._cur = [[], 0, 0]

    def _flush_block(self) -> None:
        if self._cur is not None:
            self.blocks.append(self._cur)
            self._cur = None

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag == "a":
            self._a_stack.append(self.skip_depth > 0)
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._open_block()

    def handle_startendtag(self, tag, attrs):  # noqa: D102
        # <br/> etc.: neither opens a skip region nor a block.
        return

    def handle_endtag(self, tag):  # noqa: D102
        if tag == "a":
            if self._a_stack:
                self._a_stack.pop()
        if tag in SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data):  # noqa: D102
        if self.skip_depth or self._cur is None:
            return
        ns = _nonspace_len(data)
        self._cur[0].append(data)
        self._cur[1] += ns
        if any(not in_chrome for in_chrome in self._a_stack):
            self._cur[2] += ns


def extract_page(
    html: str, max_link_density: float = 0.5
) -> tuple[int, int, int, str]:
    """Driver/kernel-side single-page extraction:
    ``(n_blocks, n_kept, main_chars, main_text)``.

    A block is KEPT iff it has any non-whitespace text AND
    ``linked_chars <= max_link_density * total_chars``. Kept block
    texts are whitespace-normalized (ASCII, single spaces) and joined
    with ``\\n``.
    """
    p = _MainContentParser()
    p.feed(html)
    p.close()
    p._flush_block()
    kept: list[str] = []
    for pieces, total, linked in p.blocks:
        if total <= 0 or linked > max_link_density * total:
            continue
        text = " ".join(t for t in _WS.split("".join(pieces)) if t)
        kept.append(text)
    main_text = "\n".join(kept)
    return len(p.blocks), len(kept), _nonspace_len(main_text), main_text


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
) -> DataFrame:
    """Add ``n_blocks``, ``n_kept``, ``main_chars``, ``main_text`` and
    ``main_md5`` (md5 of the UTF-8 extracted text — the engine's
    atomic digest surrogate for driver-facing outputs) to every page
    row. NULL html yields NULL in every output column.
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    new_cols = [
        StructField("n_blocks", LongType()),
        StructField("n_kept", LongType()),
        StructField("main_chars", LongType()),
        StructField("main_text", StringType()),
        StructField("main_md5", StringType()),
    ]
    out_schema = StructType(list(df.schema.fields) + new_cols)
    density = float(max_link_density)

    def _extract(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            nb, nk, mc, mt, md = [], [], [], [], []
            for html in pdf[html_col]:
                if html is None:
                    nb.append(None)
                    nk.append(None)
                    mc.append(None)
                    mt.append(None)
                    md.append(None)
                    continue
                b, k, c, text = extract_page(html, density)
                nb.append(b)
                nk.append(k)
                mc.append(c)
                mt.append(text)
                md.append(hashlib.md5(text.encode("utf-8")).hexdigest())
            out = pdf.copy()
            out["n_blocks"] = pd.Series(nb, dtype="Int64")
            out["n_kept"] = pd.Series(nk, dtype="Int64")
            out["main_chars"] = pd.Series(mc, dtype="Int64")
            out["main_text"] = mt
            out["main_md5"] = md
            yield out

    return df.mapInPandas(_extract, schema=out_schema)


def _fixture_html_expr(toks_col: str) -> str:
    """Spark-SQL expression string building the fixture page from a
    normalized-token array column (shared constants with the DuckDB
    oracle generator — the generated-oracle convention)."""
    esc = (
        "replace(replace(replace(tok, '&', '&amp;'), '<', '&lt;'),"
        " '>', '&gt;')"
    )
    k, m = FIXTURE_CHUNK, FIXTURE_LINKY_MOD
    chunk = f"slice({toks_col}, i * {k} + 1, {k})"
    chunks = (
        f"transform(sequence(0, int((size({toks_col}) - 1) / {k})),"
        f" i -> CASE WHEN i % {m} = {m - 1}"
        f" THEN concat('<p class=\"rel\">',"
        f"   array_join(transform({chunk},"
        f"     tok -> concat('<a href=\"#\">', {esc}, '</a>')), ' '),"
        f"   '</p>')"
        f" ELSE concat('<p>', array_join(transform({chunk},"
        f"   tok -> {esc}), ' '), '</p>') END)"
    )
    return (
        "concat("
        "'<html><head><title>doc</title><script>var x = 1;</script>"
        "</head><body>',"
        "'<nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>',"
        f"array_join({chunks}, ''),"
        "'<footer><a href=\"/terms\">terms</a> copyright</footer>',"
        "'</body></html>')"
    )


def with_html_fixture(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic synthetic ``html`` page column: the
    document's normalized tokens in ``FIXTURE_CHUNK``-token ``<p>``
    paragraphs (every ``FIXTURE_LINKY_MOD``-th one an all-anchor
    "related links" block), wrapped in head/script/nav/footer chrome.
    Tokens are HTML-escaped so the parser round-trip is exact; NULL
    text → NULL html.

    Fixture-generation only (the nested per-index ``slice`` transform
    is the interpreted shingle shape — fine on fixture volumes, not a
    corpus-operator pattern).
    """
    from capital.llm.text import normalized, tokens

    text = F.col(text_col)
    return (
        df.withColumn("__fixture_toks", tokens(normalized(text)))
        .withColumn(
            "html",
            F.when(
                text.isNotNull(),
                F.expr(_fixture_html_expr("__fixture_toks")),
            ),
        )
        .drop("__fixture_toks")
    )
