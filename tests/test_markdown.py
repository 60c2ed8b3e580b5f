"""Pinned-spec tables for the scrape return-format transforms
(markdown / commonmark / xml / raw / text — spider_cli args.rs:123-125
surface) plus the distributed transform plumbing."""

import pyarrow as pa
import pytest

from spider_ray.markdown import RETURN_FORMATS, TransformStage, transform_html

CASES = [
    # (html, markdown)
    ("<h1>Title</h1>", "# Title"),
    ("<h3>Deep &amp; wide</h3>", "### Deep & wide"),
    ("<p>one</p><p>two</p>", "one\n\ntwo"),
    (
        '<p>go <a href="/a?x=1&amp;y=2">there</a> now</p>',
        "go [there](/a?x=1&y=2) now",
    ),
    ("<p><a>no href</a> kept as text</p>", "no href kept as text"),
    (
        '<ul><li>alpha</li><li><a href="/b">beta</a></li></ul>',
        "- alpha\n- [beta](/b)",
    ),
    ("<ol><li>x</li><li>y</li></ol>", "1. x\n2. y"),
    (
        "<p>mix <strong>bold</strong> and <em>it</em> and <code>c()</code></p>",
        "mix **bold** and *it* and `c()`",
    ),
    ('<p><img src="/i.png" alt="a pic"></p>', "![a pic](/i.png)"),
    ("<p>line<br>break</p>", "line\nbreak"),
    ("<hr>", "---"),
    ("<blockquote><p>quoted</p></blockquote>", "> quoted"),
    ("<pre>  a\n  b</pre>", "```\n  a\n  b\n```"),
    (
        "<table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr></table>",
        "| H1 | H2 |\n| --- | --- |\n| a | b |",
    ),
    # skip subtrees: script/style/head content never leaks
    (
        "<head><title>T</title><style>.x{}</style></head><body><p>real</p></body>",
        "real",
    ),
    ("<script>var x = '<p>fake</p>';</script><p>ok</p>", "ok"),
    # whitespace collapse inside blocks
    ("<p>a\n   b\t\tc</p>", "a b c"),
    ("", ""),
]


@pytest.mark.parametrize("html,want", CASES)
def test_markdown_pinned_cases(html, want):
    assert transform_html(html, "markdown") == want


def test_commonmark_escapes_specials():
    assert (
        transform_html("<p>keep *stars* _và_ [x] `t` \\s</p>", "commonmark")
        == "keep \\*stars\\* \\_và\\_ \\[x\\] \\`t\\` \\\\s"
    )
    # markers from real tags are NOT escaped
    assert transform_html("<p><em>it</em></p>", "commonmark") == "*it*"
    # literal leading # escaped so it can't parse as a heading
    assert transform_html("<p># not a heading</p>", "commonmark") == "\\# not a heading"


def test_commonmark_ul_bullet():
    assert transform_html("<ul><li>a</li></ul>", "commonmark") == "* a"


def test_raw_and_text_formats():
    html = "<html><body><p>Hello &amp; bye</p></body></html>"
    assert transform_html(html, "raw") == html
    assert transform_html(html, "text") == "Hello & bye"


def test_xml_reserialization():
    html = '<p class="a" data-x=\'1 > 0\'>T &amp; U<br><img src="/i.png"></p>'
    got = transform_html(html, "xml")
    assert got == (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<p class="a" data-x="1 &gt; 0">T &amp; U<br/><img src="/i.png"/></p>'
    )


def test_bytes_decode_path():
    # shift_jis page decodes before conversion (same path as textextract)
    body = "<html><head><meta charset=\"shift_jis\"></head><body><h1>日本語</h1></body></html>"
    assert transform_html(body.encode("shift_jis"), "markdown") == "# 日本語"


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        transform_html("<p>x</p>", "pdf")
    assert set(RETURN_FORMATS) == {"markdown", "commonmark", "raw", "text", "xml"}


def test_unbalanced_html_is_deterministic():
    html = "<p>open <strong>bold<p>next</EM></p>"
    a = transform_html(html, "markdown")
    b = transform_html(html, "markdown")
    assert a == b  # garbage-in, same-garbage-out


def test_transform_stage_batch():
    stage = TransformStage("markdown")
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "html": [b"<h1>A</h1>", None],
        }
    )
    out = stage(batch)
    assert out.column("content").to_pylist() == ["# A", ""]


def test_transform_corpus_distributed_matches_sequential(ray_session):
    """The Ray transform pipeline over the unit fixture corpus must equal
    the sequential golden page loop byte-for-byte."""
    from spider_ray.goldens import seq_scrape_transform
    from spider_ray.markdown import transform_corpus

    want = seq_scrape_transform("unit", "markdown")
    from spider_ray.fixtures import ensure_scale

    got_ds = transform_corpus(ensure_scale("unit"), "markdown")
    got = pa.concat_tables(
        b for b in got_ds.iter_batches(batch_format="pyarrow") if b.num_rows
    )
    got = got.take(pa.compute.sort_indices(got, sort_keys=[("url", "ascending")]))
    assert got.column("url").to_pylist() == want.column("url").to_pylist()
    assert got.column("content").to_pylist() == want.column("content").to_pylist()


# --- property: the converter is total and deterministic on arbitrary soup ---

from hypothesis import given, settings
from hypothesis import strategies as st

_SOUP_ATOMS = st.sampled_from(
    [
        "<div>", "</div>", "<p>", "</p>", "<li>", "<ul>", "</ul>", "<table>",
        "<tr>", "<td>", "</td>", "<a href='x'>", "</a>", "<br>", "<pre>",
        "</pre>", "<b>", "</b>", "<h2>", "</h2>", "<!--", "-->", "<script>",
        "</script>", "&amp;", "&#x41;", "text", " ", "\n", "\t", " ",
        "日本語", "<", ">", '"', "'", "`*_[]", "<img src=x>", "<blockquote>",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_SOUP_ATOMS, max_size=40).map("".join),
       st.sampled_from(["markdown", "commonmark", "text", "xml", "raw"]))
def test_transform_html_total_and_deterministic(soup, fmt):
    """Any tag soup converts without raising, deterministically, in every
    return format (the CLI accepts arbitrary fetched bytes)."""
    from spider_ray.markdown import transform_html

    a = transform_html(soup, fmt)
    b = transform_html(soup, fmt)
    assert isinstance(a, str) and a == b


def test_inlined_converter_matches_tokenized_reference():
    """The inlined-tokenizer converter must be byte-identical to the
    generator-dispatcher reference on every fixture page and on the
    raw-text / skip-subtree / unclosed-tag edge snippets."""
    import glob

    import pyarrow.parquet as pq

    from spider_ray.encoding import decode_html
    from spider_ray.fixtures import ensure_scale
    from spider_ray.markdown import _to_markdown, _to_markdown_tokenized

    corpus = ensure_scale("sf0.001")
    for f in sorted(glob.glob(corpus + "/*/*.parquet")):
        t = pq.read_table(f, columns=["html"])
        for h in t.column("html").to_pylist():
            if not h:
                continue
            s = decode_html(h)
            for cm in (False, True):
                assert _to_markdown(s, cm) == _to_markdown_tokenized(s, cm)
    snippets = [
        "<textarea>raw <b>kept</b></textarea>after",
        "<script>var a='<b>no</b>';</script>x",
        "<div><noscript><p>hidden</p></noscript>shown</div>",
        "<noscript/><p>sc</p>",
        "<title>t</title><xmp><i>x</i></xmp>tail",
        "<pre><code>a\nb</code></pre>",
        "<ul><li>one<ul><li>two</li></ul></li></ul>",
        "<table><tr><th>h</th></tr><tr><td>c</td></tr></table>",
        "<blockquote><p>q</p><blockquote>qq</blockquote></blockquote>",
        "<a href='/x'>l</a><a>noref</a><img alt='a&amp;b' src='/i.png'>",
        "<style>p{}</style><textarea/>selfclose",
        "text <!-- c --> more <![CDATA[z]]> end",
        "<script>never closed",
        "<textarea>never closed either",
        "<iframe><p>gone</p></iframe>back",
        "<h2>head</h2><hr><br>",
    ]
    for s in snippets:
        for cm in (False, True):
            assert _to_markdown(s, cm) == _to_markdown_tokenized(s, cm), (s, cm)
