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
        parts = [p.strip() for p in selector.split(">")]
        current = [self]
        for i, part in enumerate(parts):
            matched: List[Element] = []
            seen = set()
            for node in current:
                pool = (c for c in node.children if isinstance(c, Element)) if i > 0 \
                    else node.descendants()
                for cand in pool:
                    if id(cand) not in seen and _match_simple(cand, part):
                        matched.append(cand)
                        seen.add(id(cand))
            current = matched
        return current

    def select_one(self, selector: str) -> Optional["Element"]:
        found = self.select(selector)
        return found[0] if found else None


_SIMPLE_SEL = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9]*)?"        # tag
    r"(?:\.([\w-]+))?"                   # .class
    r"(?:#([\w-]+))?"                    # #id
    r"(?:\[([\w-]+)(?:=\"([^\"]*)\")?\])?$"  # [attr="val"]
)


def _match_simple(el: Element, sel: str) -> bool:
    m = _SIMPLE_SEL.match(sel)
    if not m:
        return False
    tag, cls, eid, attr, aval = m.groups()
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


def parse_html(html) -> Element:
    """Stand-in for BeautifulSoup(html, 'lxml') for our HTML subset."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    return b.root


# --------------------------------------------------------------------------
# Extraction spec (SURVEY.md Appendix A)
# --------------------------------------------------------------------------

#: selector configs per parser class — mirrors the per-site parsers; the
#: reference's GenericNewsCrawler config dict (base_crawler.py:245-258)
PARSER_CONFIGS: Dict[str, Dict[str, Any]] = {
    # rbc_ukraine_parser.py:158-179: rbc-style archive+article
    "rbc": {
        "title_selectors": ["h1.article__title", "h1"],
        "content_container": "div.article__text",
        "content_fallback": "article",
        "paragraph_separator": " ",     # get_text(separator=' ', strip=True)
        "link_selector": "div.newsline > div",
        "link_url_predicate": ("contains", "/news/"),
        "emit_summary": False,
        "frontier_cap": None,
    },
    # bbc_parser.py:27-88
    "bbc": {
        "title_selectors": ["h1#main-heading", "h1"],
        "content_blocks": 'div[data-component="text-block"] > p',
        "content_fallback": "article",
        "paragraph_separator": "",      # get_text(strip=True)
        "link_selector": 'a[data-testid="internal-link"]',
        "link_url_predicate": ("contains", "/news/articles/"),
        "emit_summary": True,
        "frontier_cap": 20,
    },
    # guardian_parser.py:27-86
    "guardian": {
        "title_selectors": ['h1[itemprop="headline"]', "h1"],
        "content_blocks": 'div[data-gu-name="body"] > p',
        "content_fallback": "article",
        "paragraph_separator": "",
        "link_selector": 'a[data-link-name="article"]',
        "link_url_predicate": ("prefix", "https://"),
        "emit_summary": True,
        "frontier_cap": 20,
    },
}


def extract_article(html, parser_class: str = "rbc") -> Optional[Dict[str, Any]]:
    """Parse an article page. Returns None when no title (row dropped),
    mirroring rbc_ukraine_parser.py:163-165 / bbc_parser.py:58-60."""
    cfg = PARSER_CONFIGS[parser_class]
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

    sep = cfg["paragraph_separator"]

    def para_text(p: Element) -> str:
        return p.get_text(separator=sep, strip=True) if sep else p.get_text(strip=True)

    paragraphs: List[Element] = []
    if "content_blocks" in cfg:
        paragraphs = soup.select(cfg["content_blocks"])
    else:
        container = soup.select_one(cfg["content_container"])
        if container is not None:
            paragraphs = container.find_all("p")
    if not paragraphs:
        fb = soup.select_one(cfg["content_fallback"])
        if fb is not None:
            paragraphs = fb.find_all("p")
    # '\n\n'.join over non-empty paragraph texts — rbc_ukraine_parser.py:171
    content = "\n\n".join(t for t in (para_text(p) for p in paragraphs)
                          if t.strip())

    out: Dict[str, Any] = {"title": title, "content": content}
    if cfg["emit_summary"]:
        # base_crawler.py:325 — computed on pre-normalization content
        out["summary"] = content[:200] + "..." if len(content) > 200 else content
    # <time datetime=...> — bbc_parser.py:76-82
    t = soup.select_one("time")
    if t is not None:
        out["published_date"] = t.get("datetime") or t.get_text(strip=True) or None
    else:
        out["published_date"] = None
    return out


def extract_links(html, base_url: str, parser_class: str = "rbc"
                  ) -> List[Tuple[str, Optional[str]]]:
    """List-page link extraction → [(absolute_url, date_str|None)], in page
    order, order-preserving-deduped. rbc_ukraine_parser.py:103-148."""
    cfg = PARSER_CONFIGS[parser_class]
    soup = parse_html(html)
    kind, arg = cfg["link_url_predicate"]

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
        absolute = absolute_url(base_url, href)
        if not is_valid_url(absolute):
            continue
        if kind == "contains" and arg not in absolute:
            continue
        if kind == "prefix" and not absolute.startswith(arg):
            continue
        date = None
        ts = link.select_one("span.time")
        time_str = ts.get_text(strip=True) if ts else None
        if archive_date:
            date = f"{archive_date} {time_str}" if time_str else archive_date
        if absolute not in seen:            # first occurrence wins
            seen[absolute] = date
    urls = list(seen.items())
    cap = cfg["frontier_cap"]
    return urls[:cap] if cap else urls


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
        for url, date_str in links:
            clock += request_delay
            if url not in pages:
                trace.append((seq, url, url_host(url) or "", "error", clock))
                seq += 1
                continue
            art = extract_article(pages[url], parser_class)
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
