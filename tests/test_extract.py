"""HTML main-content extraction: tag rules, link-density rule,
entity round-trip, messy markup, NULL propagation, kernel shape."""

from __future__ import annotations

import hashlib

from capital.llm.extract import (
    extract_main_content,
    extract_page,
    with_html_fixture,
)


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_extract_page_strips_chrome_and_link_blocks():
    html = (
        "<html><head><title>t</title><style>p{}</style></head><body>"
        "<nav><a href='/'>home</a> <a href='/x'>x</a></nav>"
        "<p>real prose sentence one</p>"
        '<div>more <b>bold</b> prose here</div>'
        '<p class="rel"><a href="#">l1</a> <a href="#">l2</a></p>'
        "<footer>copyright <a href='/t'>terms</a></footer>"
        "<script>var x = 1;</script></body></html>"
    )
    n_blocks, n_kept, chars, text = extract_page(html)
    # nav/footer/script/style gone entirely; the two prose blocks kept,
    # the all-anchor block dropped by link density.
    assert (n_blocks, n_kept) == (3, 2)
    assert text == "real prose sentence one\nmore bold prose here"
    assert chars == sum(len(t) for t in text.split())


def test_extract_page_mixed_link_density_threshold():
    # 4 anchored chars of 9 total -> density 4/9 <= 0.5: kept;
    # 5 anchored of 9 -> dropped.
    keep = "<p>abcde <a href='#'>wxyz</a></p>"
    drop = "<p>abcd <a href='#'>vwxyz</a></p>"
    assert extract_page(keep)[1] == 1
    assert extract_page(drop)[1] == 0


def test_extract_page_entities_and_messy_markup():
    # entities decode; unclosed <p> flushes at EOF; text outside any
    # block is dropped; void tags don't open blocks.
    html = (
        "stray top text<hr/>"
        "<p>a &amp; b &lt;c&gt;</p>"
        "<p>unclosed tail"
    )
    n_blocks, n_kept, chars, text = extract_page(html)
    assert (n_blocks, n_kept) == (2, 2)
    assert text == "a & b <c>\nunclosed tail"


def test_extract_page_nested_skip_regions():
    html = (
        "<nav><div><p>menu item</p><nav>deeper</nav>after inner</div>"
        "</nav><p>kept</p>"
    )
    n_blocks, n_kept, _, text = extract_page(html)
    # everything under the outer nav (even its nested blocks and the
    # text after the inner nav closes) is chrome.
    assert (n_blocks, n_kept) == (1, 1)
    assert text == "kept"


def test_extract_page_misnested_anchor_does_not_leak():
    """Round-15 review: an <a> opened outside chrome but CLOSED inside
    it (mis-nested logo/nav markup, ubiquitous in real crawls) must
    still pop the anchor state — subsequent prose is NOT anchored.
    Symmetrically, an <a> opened inside chrome that never closes must
    not mark later text as linked."""
    html = (
        '<a href="x">logo<footer></a>chrome</footer>'
        "<p>real prose sentence here</p>"
    )
    n_blocks, n_kept, _, text = extract_page(html)
    assert (n_blocks, n_kept) == (1, 1)
    assert text == "real prose sentence here"
    html2 = (
        '<nav><a href="x">menu</nav>'
        "<p>clean prose paragraph text</p>"
    )
    assert extract_page(html2)[3] == "clean prose paragraph text"


def test_extract_page_korean_text():
    html = (
        "<nav><a href='/'>홈</a></nav>"
        "<p>한국어 본문 단락 입니다</p>"
        '<p><a href="#">관련</a> <a href="#">링크</a></p>'
        "<footer>저작권</footer>"
    )
    n_blocks, n_kept, chars, text = extract_page(html)
    assert (n_blocks, n_kept) == (2, 1)
    assert text == "한국어 본문 단락 입니다"
    assert chars == sum(len(t) for t in text.split())


def test_extract_main_content_null_and_fixture_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau upsilon "
                "aa bb cc dd ee ff gg hh ii jj tail one two"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in extract_main_content(with_html_fixture(df)).collect()
    }
    # doc 1: 33 tokens -> 4 chunks; chunk 2 (0-based) is the linky
    # block -> 3 kept; extracted text is exactly the plain chunks.
    r = out[1]
    assert (r.n_blocks, r.n_kept) == (4, 3)
    expect = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa\n"
        "lam mu nu xi omicron pi rho sigma tau upsilon\n"
        "tail one two"
    )
    assert r.main_text == expect and r.main_md5 == md5(expect)
    # NULL text -> NULL everything.
    assert out[2].n_blocks is None and out[2].main_md5 is None
    # empty text -> the single empty block is dropped (no text).
    assert (out[3].n_blocks, out[3].n_kept) == (1, 0)
    assert out[3].main_md5 == md5("")


def test_fixture_escapes_html_specials(spark):
    df = spark.createDataFrame(
        [(1, "a&b <tag> x>y plain")], "doc_id long, text string"
    )
    h = with_html_fixture(df).collect()[0].html
    assert "&amp;b" in h and "&lt;tag&gt;" in h
    r = extract_main_content(with_html_fixture(df)).collect()[0]
    # parser round-trips the escapes back to the original tokens.
    assert r.main_text == "a&b <tag> x>y plain"


def test_extract_kernel_is_shuffle_free(spark):
    """Per-document operator: no Exchange in the plan (round-13 kernel
    rule — nothing crosses a page boundary)."""
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    plan = (
        extract_main_content(with_html_fixture(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
