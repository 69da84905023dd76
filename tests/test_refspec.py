"""Unit tests for the reference-equivalent pure functions (the oracle)."""

from web_crawler_spark import refspec as r


def test_get_text_strip_semantics():
    el = r.parse_html("<p>  a  <b> b </b>c </p>").select_one("p")
    assert el.get_text(strip=True) == "abc"          # bs4: strip each node, join
    assert el.get_text(separator=" ", strip=True) == "a b c"
    assert el.get_text() == "  a   b c "


def test_selectors():
    soup = r.parse_html(
        '<div class="newsline"><div><a href="/x">l</a></div>'
        '<span><a href="/y">n</a></span></div>'
        '<h1 id="main-heading">H</h1>'
        '<a data-testid="internal-link" href="/z">z</a>')
    assert [e.get("href") for e in soup.select("div.newsline > div")] == [None]
    assert soup.select_one("div.newsline > div").select_one("a").get("href") == "/x"
    assert soup.select_one("h1#main-heading").get_text(strip=True) == "H"
    assert soup.select_one('a[data-testid="internal-link"]').get("href") == "/z"


def test_extract_article_drops_missing_title():
    html = b'<html><h1 class="article__title"></h1><div class="article__text"><p>x</p></div></html>'
    assert r.extract_article(html, "rbc") is None


def test_rbc_separator_vs_bbc():
    html = (b'<h1 class="article__title">T</h1><div class="article__text">'
            b'<p>a<b>b</b></p></div>'
            b'<div data-component="text-block"><p>a<b>b</b></p></div>')
    rbc = r.extract_article(html, "rbc")
    assert rbc["content"] == "a b"        # get_text(separator=' ', strip=True)
    bbc_html = (b'<h1 id="main-heading">T</h1>'
                b'<div data-component="text-block"><p>a<b>b</b></p></div>')
    bbc = r.extract_article(bbc_html, "bbc")
    assert bbc["content"] == "ab"          # get_text(strip=True)


def test_normalize_content():
    assert r.normalize_content("a\n\nb\n  \n\nc\n") == "a\nb\nc"
    assert r.normalize_content(None) is None
    assert r.csv_flatten(" a\n b\tc ") == "a b c"


def test_summary():
    assert r.summarize("x" * 200) == "x" * 200
    assert r.summarize("x" * 201) == "x" * 200 + "..."


def test_date_range_permissive():
    assert r.is_date_in_range(None, "2024-01-01", "2024-01-31")
    assert r.is_date_in_range("2024-01-15", "2024-01-01", "2024-01-31")
    assert not r.is_date_in_range("2024-02-15", "2024-01-01", "2024-01-31")
    assert r.is_date_in_range("2024-02-15", None, None)
    assert r.is_date_in_range("2024-01-15", "2024-01-01", None)
    assert not r.is_date_in_range("2023-12-31", "2024-01-01", None)


def test_canonicalize():
    assert (r.canonicalize_url("HTTPS://U:p@WWW.Ex.COM:443/a?b=2&a=1#f")
            == "https://www.ex.com/a?a=1&b=2")
    assert r.canonicalize_url("http://H.com:80") == "http://h.com/"
    assert r.canonicalize_url("not-a-url") is None
    assert r.canonicalize_url("https://h.com:8080/x") == "https://h.com:8080/x"


def test_extract_links_order_dedup_cap():
    items = "".join(f'<div><a href="/news/a{i}">x</a></div>' for i in [3, 1, 3, 2])
    html = f'<div class="newsline">{items}</div>'.encode()
    links = r.extract_links(html, "https://h.rbc.ua/rus/archive/2024/01/02", "rbc")
    assert [ln["url"].rsplit("a", 1)[1] for ln in links] == ["3", "1", "2"]
    assert all(ln["date_str"] == "2024-01-02" for ln in links)


def test_rbc_link_predicate_needs_both_substrings():
    """rbc_ukraine_parser.py:130 — absolute URL must contain 'rbc.ua' AND
    '/news/'; an off-domain /news/ link is dropped."""
    html = ('<div class="newsline">'
            '<div><a href="https://other.example/news/x">off</a></div>'
            '<div><a href="/sport/a1">nonews</a></div>'
            '<div><a href="/news/a2">ok</a></div></div>').encode()
    links = r.extract_links(html, "https://www.rbc.ua/rus/archive/2024/01/02", "rbc")
    assert [ln["url"] for ln in links] == ["https://www.rbc.ua/news/a2"]


def test_guardian_link_predicate_exact_prefix():
    """guardian_parser.py:31-32 — raw href must start with the exact
    'https://www.theguardian.com/' prefix; off-site absolute https links and
    relative hrefs are both dropped."""
    html = ('<a data-link-name="article" '
            'href="https://www.theguardian.com/world/a">g</a>'
            '<a data-link-name="article" href="https://evil.example/x">e</a>'
            '<a data-link-name="article" href="/world/rel">r</a>').encode()
    links = r.extract_links(html, "https://www.theguardian.com/international",
                            "guardian")
    assert [ln["url"] for ln in links] == ["https://www.theguardian.com/world/a"]


def test_bbc_link_predicate_on_raw_href():
    """bbc_parser.py:32 — '/news/articles/' tested on the RAW href: a
    relative href gaining the substring only after urljoin is dropped."""
    html = ('<a data-testid="internal-link" href="x9">rel</a>'
            '<a data-testid="internal-link" href="/news/articles/b1">ok</a>'
            ).encode()
    links = r.extract_links(html, "https://www.bbc.com/news/articles/base",
                            "bbc")
    assert [ln["url"] for ln in links] == [
        "https://www.bbc.com/news/articles/b1"]


def test_descendant_combinator_selectors():
    """BBC/Guardian content selectors use the descendant combinator
    (bbc_parser.py:62, guardian_parser.py:60) — p's nested below an
    intermediate div must match."""
    html = (b'<h1 id="main-heading">T</h1>'
            b'<div data-component="text-block"><div><p>deep</p></div></div>')
    assert r.extract_article(html, "bbc")["content"] == "deep"
    g = (b'<h1 itemprop="headline">T</h1>'
         b'<div data-gu-name="body"><figure>f</figure>'
         b'<div><p>a</p></div><p>b</p></div>')
    assert r.extract_article(g, "guardian")["content"] == "a\n\nb"


def test_guardian_fallback_container():
    """guardian_parser.py:63-68 — empty body → fallback to
    'article div.article-body-viewer-selector' paragraphs."""
    html = (b'<h1 itemprop="headline">T</h1>'
            b'<div data-gu-name="body"><p>  </p></div>'
            b'<article><div class="article-body-viewer-selector">'
            b'<p>fb</p></div></article>')
    assert r.extract_article(html, "guardian")["content"] == "fb"


def test_investing_list_and_article():
    """investing_parser.py — list-page metadata cache, /pro/ skip,
    datetime-attr date stripping, >100-char content gate with description
    fallback, no dedup."""
    lst = ('<ul data-test="news-list">'
           '<li><a data-test="article-title-link" '
           'href="https://www.investing.com/news/i1">Gold up</a>'
           '<p data-test="article-description">desc one</p>'
           '<time data-test="article-publish-date" '
           'datetime="2024-01-02 17:24:48">t</time></li>'
           '<li><a data-test="article-title-link" '
           'href="https://www.investing.com/PRO/x">Pro</a></li>'
           '<li><a data-test="article-title-link" '
           'href="https://www.investing.com/news/i2"></a></li>'
           '<li><a data-test="article-title-link" '
           'href="https://www.investing.com/news/i1">Gold up</a>'
           '<p data-test="article-description">desc one</p></li>'
           '</ul>').encode()
    links = r.extract_links(lst, "https://www.investing.com/commodities/gold-news/1",
                            "investing")
    # /pro/ skipped (case-insensitive), empty title skipped, NO dedup
    assert [ln["url"] for ln in links] == [
        "https://www.investing.com/news/i1",
        "https://www.investing.com/news/i1"]
    assert links[0]["date_str"] == "2024-01-02"     # time stripped (:182)
    assert links[0]["title"] == "Gold up"
    assert links[0]["summary"] == "desc one"
    long = "word " * 30
    art = (f'<div id="article"><div class="article_WYSIWYG__O0uhw">'
           f'<p>{long}</p></div></div>').encode()
    got = r.extract_article(art, "investing", list_meta=links[0])
    assert got["title"] == "Gold up"
    assert got["content"].startswith("word word")
    assert got["published_date"] == "2024-01-02"
    # <100 chars → description fallback (:273-281)
    short = b'<div id="article"><p>tiny</p></div>'
    got2 = r.extract_article(short, "investing", list_meta=links[0])
    assert got2["content"] == "desc one"
    # no cached metadata → None (:225-227)
    assert r.extract_article(art, "investing", list_meta=None) is None


def test_generic_config_date_selector():
    """GenericNewsCrawler config knobs (base_crawler.py:245-258,309-322):
    article_date_selector with/without article_date_attribute."""
    r.PARSER_CONFIGS["_custom"] = {
        "title_selectors": ["h2.head"],
        "content_single": "div.body",
        "link_selector": "a",
        "link_url_predicate": None,
        "emit_summary": True,
        "date_from_time": None,
        "date_selector": "span.published",
        "date_attribute": "data-date",
        "frontier_cap": None,
    }
    try:
        html = (b'<h2 class="head">T</h2><div class="body">body text</div>'
                b'<span class="published" data-date="2024-02-03">Feb 3</span>')
        art = r.extract_article(html, "_custom")
        assert art["title"] == "T"
        assert art["content"] == "body text"
        assert art["published_date"] == "2024-02-03"
        assert art["summary"] == "body text"
        # text mode when no attribute configured
        del r.PARSER_CONFIGS["_custom"]["date_attribute"]
        art = r.extract_article(html, "_custom")
        assert art["published_date"] == "Feb 3"
    finally:
        del r.PARSER_CONFIGS["_custom"]


def _tree_eq(a, b):
    if isinstance(a, str) or isinstance(b, str):
        return a == b
    return (a.tag == b.tag and a.attrs == b.attrs and
            len(a.children) == len(b.children) and
            all(_tree_eq(x, y) for x, y in zip(a.children, b.children)))


def test_fast_parser_matches_stdlib_on_all_fixture_shapes():
    """The regex-scanner DOM builder must produce the IDENTICAL tree as the
    HTMLParser-backed builder for every page shape the fixture web
    generates (rbc archives/articles, bbc, guardian, investing lists and
    articles — entities, nested inline tags, duplicate/empty paragraphs,
    all attribute styles)."""
    from web_crawler_spark import html_synth
    web = html_synth.synth_web(n_articles=150, n_hosts=5, seed=13)
    assert len(web["pages"]) > 150
    for url, h in web["pages"].items():
        fast = r.parse_html(h)
        std = r.parse_html_stdlib(h)
        assert _tree_eq(fast, std), url
    # attribute syntax variants + entities in values + void tags + comments
    tricky = (b'<!DOCTYPE html><!-- c --><div A="x&amp;y" b=\'q\' c=bare d>'
              b'<br><img src=i.png><p>t&lt;x&gt;</p></div>')
    assert _tree_eq(r.parse_html(tricky), r.parse_html_stdlib(tricky))
    # XHTML-style self-closing non-void tags: the element must NOT capture
    # following siblings (round-2 advice), and every startendtag-detection
    # edge HTMLParser distinguishes must match — including the unquoted
    # -value-eats-the-slash cases where the tag legitimately stays open
    self_closing = [
        b"<div><span/><p>sib</p></div>",
        b"<div><span /><p>sib</p></div>",
        b'<div><span foo="x"/><p>sib</p></div>',
        b"<div><span foo='x'/><p>sib</p></div>",
        b"<div><span foo=bar/><p>in</p></div>",    # value 'bar/' — stays open
        b"<div><span foo=bar /><p>sib</p></div>",
        b"<div><span foo/><p>sib</p></div>",
        b"<div><span foo=/><p>in</p></div>",       # value '/' — stays open
        b'<div><span a="1" b/><p>sib</p></div>',
        b'<div><span a=b c="d"/><p>sib</p></div>',
        b"<div><em/>x<span/>y</div><p>tail</p>",
        # whitespace around '=' before an unquoted value: attrfind_tolerant
        # still absorbs the '/' into the value (round-3 review finding)
        b"<div><span foo = bar/><p>in</p></div>",
        b"<div><span foo= bar/><p>in</p></div>",
        b"<div><span foo =bar/><p>in</p></div>",
        b"<div><span foo = /><p>in</p></div>",
        b'<div><span foo = "x"/><p>sib</p></div>',
        b"<div><span foo=bar baz/><p>sib</p></div>",
    ]
    for h in self_closing:
        assert _tree_eq(r.parse_html(h), r.parse_html_stdlib(h)), h
