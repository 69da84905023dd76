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
    assert [u.rsplit("a", 1)[1] for u, _ in links] == ["3", "1", "2"]
    assert all(d == "2024-01-02" for _, d in links)
