"""Property-based tests (hypothesis) for the pure kernels the engine's
correctness rests on — no Spark session needed, so these are fast and run
thousands of cases."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from web_crawler_spark import refspec

url_text = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.-_~%",
    max_size=120)
any_text = st.text(max_size=400)
html_ish = st.text(
    alphabet=string.ascii_letters + string.digits + " <>/=\"'&;#\n\t.",
    max_size=600)


@settings(max_examples=300)
@given(url_text)
def test_canonicalize_idempotent(u):
    c = refspec.canonicalize_url(u)
    if c is not None:
        assert refspec.canonicalize_url(c) == c


@settings(max_examples=300)
@given(url_text)
def test_canonicalize_invariants(u):
    c = refspec.canonicalize_url(u)
    if c is None:
        return
    assert "#" not in c                       # fragment stripped
    scheme, _, rest = c.partition("://")
    assert scheme == scheme.lower()
    host = rest.split("/", 1)[0].split("?", 1)[0]
    assert host == host.lower()
    # sorted query params
    if "?" in c:
        q = c.split("?", 1)[1]
        keys = [p.split("=", 1)[0] for p in q.split("&") if p]
        assert keys == sorted(keys)


@settings(max_examples=300)
@given(any_text)
def test_normalize_content_idempotent(t):
    once = refspec.normalize_content(t)
    assert refspec.normalize_content(once) == once
    assert "\n\n" not in once
    assert once == once.strip()


@settings(max_examples=300)
@given(any_text)
def test_csv_flatten_idempotent(t):
    once = refspec.csv_flatten(t)
    assert refspec.csv_flatten(once) == once
    assert "\n" not in once and "\t" not in once


@settings(max_examples=200)
@given(html_ish)
def test_dom_parser_never_crashes(h):
    """The mini-DOM + extractors must be total over arbitrary tag soup
    (reference behavior: parse errors -> skip row, never crash the epoch)."""
    art = refspec.extract_article(h.encode("utf-8", "ignore"), "rbc")
    assert art is None or isinstance(art, dict)
    links = refspec.extract_links(h.encode("utf-8", "ignore"),
                                  "https://x.example/a", "rbc")
    assert isinstance(links, list)


@settings(max_examples=100)
@given(st.lists(st.sampled_from(["/news/a1", "/news/a2", "/news/a3",
                                 "/news/a4"]), min_size=1, max_size=12))
def test_extract_links_order_preserving_dedup(hrefs):
    """Link extraction dedups like list(dict.fromkeys(...)): first
    occurrence wins, page order kept (base_crawler.py:278)."""
    body = "".join(f'<div><a href="{h}">x</a></div>' for h in hrefs)
    html = f'<html><body><div class="newsline">{body}</div></body></html>'
    links = refspec.extract_links(html.encode(), "https://www.rbc.ua/x", "rbc")
    got = [ln["url"].split("rbc.ua")[1].split("?")[0] for ln in links]
    assert got == list(dict.fromkeys(hrefs))


@settings(max_examples=300, deadline=None)
@given(url_text)
def test_canonicalize_batch_matches_refspec(u):
    """The vectorized Arrow-batch canonicalizer must agree byte-for-byte
    with the pure refspec function on EVERY input (fast path or fallback)."""
    import pandas as pd
    from web_crawler_spark.functions.canonicalize import canonicalize_batch
    got = canonicalize_batch(pd.Series([u], dtype="object"))[0]
    want = refspec.canonicalize_url(u) if u else None
    assert (None if got is None else got) == want


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(["http", "HTTP", "https", "ftp"]),
       st.sampled_from(["Ex.COM", "a-b.c", "h", "www.x.y.rbc.ua"]),
       st.sampled_from(["", ":80", ":443", ":8080", ":0080"]),
       st.sampled_from(["", "/", "/a/b", "/a;p", "/a%20b", "/a.b-c_d~e"]),
       st.sampled_from(["", "?", "?b=2&a=1", "?a-=x&a=y", "?a=1&&b=2",
                        "?x", "?=v", "?a=b=c", "?a=", "?k=v#frag", "#f"]))
def test_canonicalize_fast_path_structured(sch, host, port, path, q):
    """Structured generator hitting the fast-path grammar and its escape
    hatches (tuple-vs-string sort trap 'a-=x&a=y', bare keys, double '=',
    empty pairs, default ports)."""
    import pandas as pd
    from web_crawler_spark.functions.canonicalize import canonicalize_batch
    u = f"{sch}://{host}{port}{path}{q}"
    got = canonicalize_batch(pd.Series([u], dtype="object"))[0]
    assert got == refspec.canonicalize_url(u)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=383),
               min_size=0, max_size=24))
def test_bpe_encode_properties(word):
    """BPE inference on ARBITRARY words (fixture-vocab and far beyond):
    ranked-merge loop == sequential-apply reference (the standard BPE
    identity), tokens concatenate back to the word, and token count is
    monotone-bounded by the character count."""
    from web_crawler_spark.functions.bpe import load_tokenizer
    from tests.test_training_ops import _bpe_apply_reference
    tok = load_tokenizer()
    got = tok.encode(word)
    assert got == _bpe_apply_reference(word, tok.merges)
    assert "".join(got) == word
    assert len(got) <= max(len(word), 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["table", "the", "spark", "row", "a",
                                 "customer", "zzz", "batch"]),
                min_size=0, max_size=12))
def test_bpe_count_text_is_sum_of_word_counts(words):
    from web_crawler_spark.functions.bpe import load_tokenizer
    tok = load_tokenizer()
    text = " ".join(words)
    assert tok.count_text(text) == sum(len(tok.encode(w)) for w in words)
