"""Reference-equivalent pure functions (the byte-identity oracle).

This module re-implements, in dependency-free pure Python, the *observable
semantics* of the reference crawler's extraction + normalization path so we
can (a) generate golden outputs for tests and (b) run the exact same code
inside Arrow-batched pandas UDFs on executors.

The reference uses BeautifulSoup(html, 'lxml'); bs4/lxml are not available
in this environment, so a minimal DOM + selector engine is implemented here
covering exactly the selector grammar the reference uses:

    tag | tag.class | tag#id | tag[attr] | tag[attr="val"] | 'A > B' child combinator

bs4 `get_text` semantics replicated (see ``Element.get_text``):
  * joins every descendant text node with `separator`
  * with strip=True each text node is stripped and empty nodes are skipped

Reference behaviors replicated (file:line refer to /root/reference/app):
  * title extraction w/ h1 fallback and drop-on-empty —
    parsers/rbc_ukraine_parser.py:158-165, parsers/bbc_parser.py:52-59
  * paragraph join with '\\n\\n', RBC uses get_text(separator=' ', strip=True)
    while BBC/Guardian use get_text(strip=True) —
    rbc_ukraine_parser.py:167-179, bbc_parser.py:62-63, guardian_parser.py:60-61
  * sink content normalization re.sub(r'\\n\\s*\\n+', '\\n', c).strip() —
    models/database.py:169-177
  * CSV whitespace flatten ' '.join(content.split()) — models/csv_storage.py:102-108
  * summary = content[:200]+'...' if len>200 — scrapers/base_crawler.py:325
  * permissive date-range predicate (null/error => include) —
    scrapers/base_crawler.py:103-125
  * URL absolutization urljoin + validity (netloc and scheme) —
    scrapers/base_crawler.py:91-101
  * order-preserving dedup list(dict.fromkeys(...)) — base_crawler.py:278
  * archive-date regex r'/(\\d{4})/(\\d{2})/(\\d{2})$' — rbc_ukraine_parser.py:110-112
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from html.parser import HTMLParser
from typing import Any, Dict, List, Optional, Tuple
from urllib.parse import parse_qsl, urlencode, urljoin, urlparse, urlunparse

# --------------------------------------------------------------------------
# Mini DOM
# --------------------------------------------------------------------------

VOID_TAGS = {"br", "img", "meta", "link", "input", "hr", "area", "base", "col",
             "embed", "source", "track", "wbr"}


@dataclass
class Element:
    tag: str
    attrs: Dict[str, str] = field(default_factory=dict)
    children: List[Any] = field(default_factory=list)  # Element | str
    parent: Optional["Element"] = None

    # -- text ---------------------------------------------------------------
    def _strings(self):
        for c in self.children:
            if isinstance(c, str):
                yield c
            else:
                yield from c._strings()

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            parts = [s.strip() for s in self._strings()]
            parts = [p for p in parts if p]
        else:
            parts = list(self._strings())
        return separator.join(parts)

    # -- traversal ----------------------------------------------------------
    def descendants(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.descendants()

    def find_all(self, tag: str) -> List["Element"]:
        return [e for e in self.descendants() if e.tag == tag]

    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    # -- selectors ------------------------------------------------------------
    def select(self, selector: str) -> List["Element"]:
        """Child ('A > B') and descendant ('A B') combinators — the full
        grammar the reference's soup.select calls use (e.g. BBC's
        'div[data-component="text-block"] p', bbc_parser.py:62)."""
        current = [self]
        for comb, part in _parse_selector(selector):
            matched: List[Element] = []
            seen = set()
            for node in current:
                pool = (c for c in node.children if isinstance(c, Element)) \
                    if comb == ">" else node.descendants()
                for cand in pool:
                    if id(cand) not in seen and _match_simple(cand, part):
                        matched.append(cand)
                        seen.add(id(cand))
            current = matched
        return current

    def select_one(self, selector: str) -> Optional["Element"]:
        found = self.select(selector)
        return found[0] if found else None


def _parse_selector(selector: str) -> List[Tuple[str, str]]:
    """'div#a > .b c' → [(' ', 'div#a'), ('>', '.b'), (' ', 'c')]."""
    parts: List[Tuple[str, str]] = []
    comb = " "
    for tok in selector.replace(">", " > ").split():
        if tok == ">":
            comb = ">"
            continue
        parts.append((comb, tok))
        comb = " "
    return parts


_SIMPLE_SEL = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9]*)?"        # tag
    r"(?:\.([\w-]+))?"                   # .class
    r"(?:#([\w-]+))?"                    # #id
    r"(?:\[([\w-]+)(?:=\"([^\"]*)\")?\])?$"  # [attr="val"]
)


@lru_cache(maxsize=512)
def _compile_simple(sel: str):
    """Parse a simple selector once (selectors repeat per config, but
    _match_simple runs per candidate NODE — caching removes a regex match
    from the extractor's hottest loop, ~10% of whole-article parse time)."""
    m = _SIMPLE_SEL.match(sel)
    return m.groups() if m else None


def _match_simple(el: Element, sel: str) -> bool:
    g = _compile_simple(sel)
    if g is None:
        return False
    tag, cls, eid, attr, aval = g
    if tag and el.tag != tag:
        return False
    if cls and cls not in el.attrs.get("class", "").split():
        return False
    if eid and el.attrs.get("id") != eid:
        return False
    if attr:
        if attr not in el.attrs:
            return False
        if aval is not None and el.attrs.get(attr) != aval:
            return False
    return True


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs},
                     parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


#: fast scanner tokens: comments/doctype/PIs (skipped, as HTMLParser's
#: unimplemented handlers skip them), end tags, start tags (quoted
#: attribute values may contain '>')
_TOK = re.compile(
    r"<!--.*?-->|<![^>]*>|<\?[^>]*>"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.S)
_ATTR = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"([^\"]*)\"|'([^']*)'|[^\s>]*))?")
#: documents where HTMLParser switches to CDATA mode (charrefs kept, raw
#: text until the closing tag) — the fast scanner defers to the stdlib
_NEEDS_STDLIB = re.compile(r"<(script|style)\b", re.I)

import html as _htmlmod  # noqa: E402  (entity decoding for the fast path)


def _parse_html_fast(s: str) -> Element:
    """Regex-scanner DOM builder — same tree as the HTMLParser-backed
    builder for the supported HTML subset (differential-tested over every
    fixture page shape), ~3.7x faster tokenization. Per-document work is
    the extractor's hot path at 10^10 pages."""
    root = Element("[document]")
    stack = [root]
    pos = 0
    append = None
    for m in _TOK.finditer(s):
        if m.start() > pos:
            stack[-1].children.append(_htmlmod.unescape(s[pos:m.start()]))
        pos = m.end()
        name = m.group(2)
        if name is None:
            continue                        # comment/doctype/PI: skipped
        name = name.lower()
        if m.group(1):                      # end tag: pop to match
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == name:
                    del stack[i:]
                    break
            continue
        attrs: Dict[str, str] = {}
        raw_attrs = m.group(3)
        if raw_attrs:
            for am in _ATTR.finditer(raw_attrs):
                v = am.group(3) if am.group(3) is not None else \
                    am.group(4) if am.group(4) is not None else am.group(2)
                attrs[am.group(1).lower()] = \
                    _htmlmod.unescape(v) if v else ""
        # XHTML-style self-closing (<span/>): mirror HTMLParser's
        # startendtag detection exactly — the trailing '/' closes the tag
        # UNLESS it was consumed by an UNQUOTED attribute value
        # (`foo=bar/`, `foo = bar/`, `foo=/` → value ends in '/', tag stays
        # open; `foo="x"/`, bare `foo/`, ` /` → self-closing). _ATTR's
        # grammar matches attrfind_tolerant (spaces around '=', unquoted
        # value = [^\s>]* which eats '/'), so the check is: does the last
        # attribute match carry an unquoted value reaching the very end of
        # the attr blob? Default handle_startendtag calls start+end, so a
        # self-closed element is never pushed.
        self_close = False
        if raw_attrs and raw_attrs.endswith("/"):
            self_close = True
            last_m = None
            for last_m in _ATTR.finditer(raw_attrs):
                pass
            if (last_m is not None and last_m.end() == len(raw_attrs)
                    and last_m.group(2) is not None
                    and last_m.group(3) is None and last_m.group(4) is None
                    and last_m.group(2).endswith("/")):
                self_close = False
        el = Element(name, attrs, parent=stack[-1])
        stack[-1].children.append(el)
        if name not in VOID_TAGS and not self_close:
            stack.append(el)
    if pos < len(s):
        stack[-1].children.append(_htmlmod.unescape(s[pos:]))
    return root


def parse_html(html) -> Element:
    """Stand-in for BeautifulSoup(html, 'lxml') for our HTML subset.
    Fast regex-scanner path by default; script/style documents (CDATA
    semantics) go through the stdlib HTMLParser builder."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    if _NEEDS_STDLIB.search(html) is None:
        return _parse_html_fast(html)
    b = _DomBuilder()
    b.feed(html)
    return b.root


def parse_html_stdlib(html) -> Element:
    """The HTMLParser-backed builder (differential-test reference)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    return b.root


# --------------------------------------------------------------------------
# Extraction spec (SURVEY.md Appendix A)
# --------------------------------------------------------------------------

#: selector configs per parser class — mirrors the per-site parsers; the
#: reference's GenericNewsCrawler config dict (base_crawler.py:245-258).
#: Link-predicate kinds replicate *where* each reference parser applies its
#: filter: 'href_*' test the raw href (bbc_parser.py:32,
#: guardian_parser.py:31-32), 'abs_contains_all' tests the absolutized URL
#: (rbc_ukraine_parser.py:129-131).
PARSER_CONFIGS: Dict[str, Dict[str, Any]] = {
    # rbc_ukraine_parser.py:158-179: rbc-style archive+article
    "rbc": {
        "title_selectors": ["h1.article__title", "h1"],
        "content_container": "div.article__text",   # container presence
        "content_fallback": "article",              # decides fallback (:168-179)
        "paragraph_separator": " ",     # get_text(separator=' ', strip=True)
        "link_selector": "div.newsline > div",
        # rbc_ukraine_parser.py:130: 'rbc.ua' in absolute AND '/news/' in it
        "link_url_predicate": ("abs_contains_all", ("rbc.ua", "/news/")),
        "emit_summary": False,
        "date_from_time": None,         # date comes from the archive map only
        "frontier_cap": None,
    },
    # bbc_parser.py:27-88
    "bbc": {
        "title_selectors": ["h1#main-heading", "h1"],
        # descendant combinator, exactly bbc_parser.py:62
        "content_blocks": 'div[data-component="text-block"] p',
        "content_fallback": "article",              # on empty content (:65-70)
        "paragraph_separator": "",      # get_text(strip=True)
        "link_selector": 'a[data-testid="internal-link"]',
        "link_url_predicate": ("href_contains", "/news/articles/"),  # :32
        "emit_summary": True,
        "date_from_time": "attr_or_text",           # :76-81
        "frontier_cap": 20,
    },
    # guardian_parser.py:27-86
    "guardian": {
        "title_selectors": ['h1[itemprop="headline"]', "h1"],
        "content_blocks": 'div[data-gu-name="body"] p',              # :60
        "content_fallback": "article div.article-body-viewer-selector",  # :65
        "paragraph_separator": "",
        "link_selector": 'a[data-link-name="article"]',
        # exact reference prefix (guardian_parser.py:32) — off-site absolute
        # https links on a Guardian list page must be dropped
        "link_url_predicate": ("href_prefix", "https://www.theguardian.com/"),
        "emit_summary": True,
        "date_from_time": "attr",                    # :77-79
        "frontier_cap": 20,
    },
    # base_crawler.py:242-333 GenericNewsCrawler defaults: any valid link,
    # single content selector via get_text(strip=True), no cap
    "generic": {
        "title_selectors": ["h1"],
        "content_single": "article",
        "link_selector": "a",
        "link_url_predicate": None,
        "emit_summary": True,
        "date_from_time": None,
        "frontier_cap": None,
    },
    # investing_parser.py:127-298 — list-page metadata cache (title/desc/
    # date extracted on the list page, carried to the article parse),
    # '/pro/' skip, datetime-attr date, no dedup/cap on discovery
    "investing": {
        "kind": "investing",
        "emit_summary": False,
        "frontier_cap": None,
    },
}

#: investing_parser.py:254-261 — content selector cascade, first match with
#: > 100 chars of rendered text wins
INVESTING_CONTENT_SELECTORS = (
    "div#article .article_WYSIWYG__O0uhw",
    "div#article .articlePage",
    "div#article",
    "article .article-content",
    ".article-content",
    '[data-test="article-content"]',
)


def extract_article(html, parser_class: str = "rbc",
                    list_meta: Optional[Dict[str, Any]] = None
                    ) -> Optional[Dict[str, Any]]:
    """Parse an article page. Returns None when no title (row dropped),
    mirroring rbc_ukraine_parser.py:163-165 / bbc_parser.py:58-60.

    ``list_meta`` is the list-page metadata cache row for this URL
    (investing_parser.py:29,191-197): keys title/summary/date_str. Only the
    investing parser consumes it."""
    cfg = PARSER_CONFIGS[parser_class]
    if cfg.get("kind") == "investing":
        return _extract_article_investing(html, list_meta)
    soup = parse_html(html)

    title = ""
    for sel in cfg["title_selectors"]:
        el = soup.select_one(sel)
        if el:
            title = el.get_text(strip=True)
        if title:
            break
    if not title:
        return None

    if "content_single" in cfg:
        # GenericNewsCrawler: one extract_text call (base_crawler.py:298-302)
        el = soup.select_one(cfg["content_single"])
        content = el.get_text(strip=True) if el is not None else ""
    else:
        sep = cfg["paragraph_separator"]

        def para_text(p: Element) -> str:
            return p.get_text(separator=sep, strip=True) if sep \
                else p.get_text(strip=True)

        def joined(paragraphs: List[Element]) -> str:
            # '\n\n'.join over non-empty texts — rbc_ukraine_parser.py:171
            return "\n\n".join(t for t in (para_text(p) for p in paragraphs)
                               if t.strip())

        if "content_blocks" in cfg:
            # BBC/Guardian: fall back when the joined content is EMPTY
            # (bbc_parser.py:65-70, guardian_parser.py:63-68)
            content = joined(soup.select(cfg["content_blocks"]))
            if not content:
                fb = soup.select_one(cfg["content_fallback"])
                content = joined(fb.find_all("p")) if fb is not None else ""
        else:
            # RBC: fall back when the CONTAINER is absent
            # (rbc_ukraine_parser.py:168-179)
            container = soup.select_one(cfg["content_container"])
            if container is not None:
                content = joined(container.find_all("p"))
            else:
                fb = soup.select_one(cfg["content_fallback"])
                content = joined(fb.find_all("p")) if fb is not None else ""

    out: Dict[str, Any] = {"title": title, "content": content}
    if cfg["emit_summary"]:
        # base_crawler.py:325 — computed on pre-normalization content
        out["summary"] = content[:200] + "..." if len(content) > 200 else content
    # <time datetime=...> — only BBC/Guardian read it (bbc_parser.py:76-82
    # attr-then-text; guardian_parser.py:77-79 attr only); RBC/generic get
    # their date from the archive map / config
    date_mode = cfg.get("date_from_time")
    out["published_date"] = None
    if date_mode:
        t = soup.select_one("time")
        if t is not None:
            if date_mode == "attr_or_text":
                out["published_date"] = (t.get("datetime") or
                                         t.get_text(strip=True) or None)
            else:
                out["published_date"] = t.get("datetime") or None
    elif cfg.get("date_selector"):
        # GenericNewsCrawler's config-driven date extraction
        # (base_crawler.py:309-322): attribute when article_date_attribute
        # is configured, element text otherwise
        el = soup.select_one(cfg["date_selector"])
        if el is not None:
            if cfg.get("date_attribute"):
                out["published_date"] = el.get(cfg["date_attribute"])
            else:
                out["published_date"] = el.get_text(strip=True) or None
    return out


def _extract_article_investing(html, list_meta: Optional[Dict[str, Any]]
                               ) -> Optional[Dict[str, Any]]:
    """investing_parser.py:216-298 — title/description/date come from the
    list-page cache; the article page contributes only its rendered text.

    Selenium's ``element.text`` (rendered text, blocks joined by newlines)
    is approximated as get_text(separator='\\n', strip=True) — the browser
    itself is out of engine scope (SURVEY §2.1 S6)."""
    if not list_meta or not list_meta.get("title"):
        return None                     # "not found in cache" (:225-227)
    soup = parse_html(html)
    content = ""
    for sel in INVESTING_CONTENT_SELECTORS:     # cascade (:253-271)
        el = soup.select_one(sel)
        if el is not None:
            c = el.get_text(separator="\n", strip=True)
            if c and len(c) > 100:              # "meaningful content" (:267)
                content = c
                break
    if not content or len(content) < 100:       # description fallback (:273-281)
        content = list_meta.get("summary") or ""
    return {"title": list_meta["title"], "content": content,
            "published_date": list_meta.get("date_str")}


def extract_links(html, base_url: str, parser_class: str = "rbc"
                  ) -> List[Dict[str, Any]]:
    """List-page link extraction → [{url, date_str, title, summary}] in page
    order. date_str from the archive URL + span.time (RBC,
    rbc_ukraine_parser.py:103-148); title/summary only for investing (its
    list-page metadata cache). Order-preserving dedup + cap per config."""
    cfg = PARSER_CONFIGS[parser_class]
    if cfg.get("kind") == "investing":
        return _extract_links_investing(html, base_url)
    soup = parse_html(html)
    pred = cfg["link_url_predicate"]
    kind, arg = pred if pred else (None, None)

    archive_date = None
    m = re.search(r"/(\d{4})/(\d{2})/(\d{2})$", base_url)
    if m:
        archive_date = f"{m.group(1)}-{m.group(2)}-{m.group(3)}"

    seen: Dict[str, Optional[str]] = {}
    for node in soup.select(cfg["link_selector"]):
        link = node if node.tag == "a" else node.select_one("a")
        if link is None:
            continue
        href = link.get("href")
        if not href:
            continue
        # raw-href predicates run BEFORE absolutization, where the
        # reference applies them (bbc_parser.py:32, guardian_parser.py:32)
        if kind == "href_contains" and arg not in href:
            continue
        if kind == "href_prefix" and not href.startswith(arg):
            continue
        absolute = absolute_url(base_url, href)
        if not is_valid_url(absolute):
            continue
        # absolute-URL predicate (rbc_ukraine_parser.py:130)
        if kind == "abs_contains_all" and not all(a in absolute for a in arg):
            continue
        date = None
        ts = link.select_one("span.time")
        time_str = ts.get_text(strip=True) if ts else None
        if archive_date:
            date = f"{archive_date} {time_str}" if time_str else archive_date
        if absolute not in seen:            # first occurrence wins
            seen[absolute] = date
    links = [{"url": u, "date_str": d, "title": None, "summary": None}
             for u, d in seen.items()]
    cap = cfg["frontier_cap"]
    return links[:cap] if cap else links


def _extract_links_investing(html, base_url: str) -> List[Dict[str, Any]]:
    """investing_parser.py:142-214 — one pass over the news list extracting
    url+title+description+date per item; '/pro/' URLs skipped; rows without
    url or title skipped; NO dedup and NO cap (the reference returns the
    raw `urls` list, :214)."""
    soup = parse_html(html)
    out: List[Dict[str, Any]] = []
    for item in soup.select('ul[data-test="news-list"] li'):
        link = item.select_one('a[data-test="article-title-link"]')
        if link is None:
            continue
        href = link.get("href")
        # Selenium's get_attribute('href') is browser-absolutized; urljoin
        # reproduces that for relative fixtures
        url = absolute_url(base_url, href) if href else ""
        title = link.get_text(strip=True)
        if not url or not title:                    # :164
            continue
        desc_el = item.select_one('p[data-test="article-description"]')
        description = desc_el.get_text(strip=True) if desc_el else ""
        date = None
        t = item.select_one('time[data-test="article-publish-date"]')
        if t is not None:
            dt = t.get("datetime")
            if dt:
                date = dt.split(" ")[0]             # :179-182
        if "/pro/" in url.lower():                  # :187-189
            continue
        out.append({"url": url, "date_str": date,
                    "title": title, "summary": description})
    return out


def normalize_content(content: Optional[str]) -> Optional[str]:
    """DB-sink normalization — models/database.py:169-177 (byte-identity target)."""
    if content is None:
        return None
    return re.sub(r"\n\s*\n+", "\n", content).strip()


def csv_flatten(content: Optional[str]) -> Optional[str]:
    """CSV-sink whitespace flatten — models/csv_storage.py:102-108."""
    if content is None:
        return None
    return " ".join(content.split())


def summarize(content: str) -> str:
    """base_crawler.py:325."""
    return content[:200] + "..." if len(content) > 200 else content


def strip_time(published_date: Optional[str]) -> Optional[str]:
    """rbc_ukraine_parser.py:184-186."""
    if published_date and " " in published_date:
        return published_date.split(" ")[0]
    return published_date


def is_date_in_range(published_date: Optional[str], start_date: Optional[str],
                     end_date: Optional[str]) -> bool:
    """Permissive lexicographic date predicate — base_crawler.py:103-125."""
    if not published_date:
        return True
    if not start_date and not end_date:
        return True
    if start_date and end_date:
        return start_date <= published_date <= end_date
    if start_date:
        return published_date >= start_date
    return published_date <= end_date


# --------------------------------------------------------------------------
# URLs
# --------------------------------------------------------------------------

def absolute_url(base: str, href: str) -> str:
    """base_crawler.py:91-93."""
    return urljoin(base, href)


def is_valid_url(url: str) -> bool:
    """base_crawler.py:95-101."""
    try:
        p = urlparse(url)
        return bool(p.netloc) and bool(p.scheme)
    except Exception:
        return False


def canonicalize_url(url: str) -> Optional[str]:
    """North-rule canonicalizer: scheme/host lowercase, sorted query,
    fragment strip, default-port strip, empty-path → '/'.

    A deliberate *superset* of the reference's urljoin+validity
    (base_crawler.py:91-101), per BASELINE.json north_rule."""
    try:
        p = urlparse(url)
        if not (p.netloc and p.scheme):
            return None
        scheme = p.scheme.lower()
        netloc = p.netloc.lower()
        if "@" in netloc:           # drop userinfo
            netloc = netloc.rsplit("@", 1)[1]
        if (scheme, ":" in netloc) in (("http", True), ("https", True)):
            host, _, port = netloc.rpartition(":")
            if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
                netloc = host
        path = p.path or "/"
        query = urlencode(sorted(parse_qsl(p.query, keep_blank_values=True)))
        return urlunparse((scheme, netloc, path, p.params, query, ""))
    except Exception:
        return None


def url_host(url: str) -> Optional[str]:
    try:
        return urlparse(url).netloc.lower() or None
    except Exception:
        return None


# --------------------------------------------------------------------------
# Reference crawl simulator (golden trace generator)
# --------------------------------------------------------------------------

def simulate_crawl(pages: Dict[str, bytes],
                   seeds: List[Tuple[str, int, str]],
                   start_date: Optional[str] = None,
                   end_date: Optional[str] = None,
                   request_delay: float = 1.0,
                   seen: Optional[set] = None) -> Dict[str, Any]:
    """Single-threaded simulation of the reference crawl semantics:
    sources in registry order (crawler_manager.py:212-214), within a source
    list-page discovery order, order-preserving dedup, date filter, dedup
    against the global URL-seen set (articles.url UNIQUE, database.py:57).

    ``seeds``: [(seed_url, source_id, parser_class)] in registry order.
    Returns {'trace': [(seq, url, host, action, sched_ts)], 'articles': [...]}
    where sched_ts is the politeness-schedule time offset (1 fetch per
    request_delay per source/host, base_crawler.py:65-70).
    """
    seen = set(seen or ())
    trace: List[Tuple[int, str, str, str, float]] = []
    articles: List[Dict[str, Any]] = []
    seq = 0
    for seed_url, source_id, parser_class in seeds:
        clock = 0.0  # per-crawler-instance rate limiter (per host)
        html = pages.get(seed_url)
        if html is None:
            continue
        clock += request_delay
        links = extract_links(html, seed_url, parser_class)
        for link in links:
            url, date_str = link["url"], link["date_str"]
            clock += request_delay
            if url not in pages:
                trace.append((seq, url, url_host(url) or "", "error", clock))
                seq += 1
                continue
            art = extract_article(pages[url], parser_class, list_meta=link)
            if art is None:
                trace.append((seq, url, url_host(url) or "", "error", clock))
                seq += 1
                continue
            published = strip_time(date_str) if date_str else strip_time(
                art.get("published_date"))
            if not is_date_in_range(published, start_date, end_date):
                trace.append((seq, url, url_host(url) or "", "skipped_date", clock))
                seq += 1
                continue
            if url in seen:
                trace.append((seq, url, url_host(url) or "", "skipped_dup", clock))
                seq += 1
                continue
            seen.add(url)
            articles.append({
                "source_id": source_id,
                "url": url,
                "title": art["title"],
                "content": normalize_content(art["content"]),
                "published_date": published,
            })
            trace.append((seq, url, url_host(url) or "", "fetched", clock))
            seq += 1
    return {"trace": trace, "articles": articles, "seen": seen}
