"""HTML listing extraction — stdlib-only (no bs4/lxml in the runtime).

A tiny DOM built on ``html.parser.HTMLParser`` plus a CSS-lite selector
engine covering exactly the selector forms the reference uses
(reference: PhocusWire/PhocusWireSource.py:131-173, Skift/SkiftSource.py:126-158):

    ``div.article-list div.item``   descendant combinator
    ``div.author > span.name``      child combinator
    ``h3.c-tease__title a``         tag + class, plain tag

Per-source ``ListingExtractor`` configs turn one listing page's HTML into
RAW_LISTING_SCHEMA dicts. This runs *inside the data source's partition
read* on executors — it is not a UDF, and the hot path (normalize onward)
stays pure Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_text")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def get(self, name: str) -> str | None:
        return self.attrs.get(name)

    @property
    def text(self) -> str:
        out: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def iter_elements(self):
        stack: list[Node] = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[root]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    return b.root


def _parse_selector(selector: str) -> list[tuple[str, str | None, set[str]]]:
    """→ list of (combinator, tag|None, classes); combinator ' ' or '>'."""
    parts: list[tuple[str, str | None, set[str]]] = []
    comb = " "
    for tok in selector.split():
        if tok == ">":
            comb = ">"
            continue
        tag, _, rest = tok.partition(".")
        parts.append((comb, tag or None, set(rest.split(".")) if rest else set()))
        comb = " "
    return parts


def _matches(node: Node, tag: str | None, classes: set[str]) -> bool:
    return (tag is None or node.tag == tag) and classes <= node.classes


def select(root: Node, selector: str) -> list[Node]:
    """All descendants of ``root`` matching the CSS-lite selector, in
    document order, deduplicated."""
    current = [root]
    for comb, tag, classes in _parse_selector(selector):
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            pool = (
                (c for c in base.children if isinstance(c, Node))
                if comb == ">"
                else base.iter_elements()
            )
            for n in pool:
                if id(n) not in seen and _matches(n, tag, classes):
                    seen.add(id(n))
                    nxt.append(n)
        current = nxt
    return current


def select_one(root: Node, selector: str) -> Node | None:
    found = select(root, selector)
    return found[0] if found else None


# ---------------------------------------------------------------------------
# Per-source listing extractors → RAW_LISTING_SCHEMA dicts
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ListingExtractor:
    """Config-driven extraction of one listing page.

    The reference's two scrapers are ~90% duplicated imperative code; here
    each source is just this config (SURVEY.md §7 Phase 3).
    """

    source_name: str
    container_selector: str
    title_selector: str
    author_selector: str
    date_mode: str  # 'author_pipe' (text after '|') or 'time_attr'
    date_selector: str = ""
    href_prefix: str = ""  # reference interpolates base + '/' + href verbatim

    def extract_page(self, html: str, page_no: int) -> list[dict]:
        rows: list[dict] = []
        for item in select(parse_html(html), self.container_selector):
            title_tag = select_one(item, self.title_selector)
            # F1/F2 (missing title/href) are *declared* downstream filters
            # (operators/normalize.py); the source still emits the raw row so
            # the filter semantics live in one place. But a container with no
            # anchor at all yields nothing extractable — emit NULLs.
            title = title_tag.text.strip() if title_tag is not None else None
            href = title_tag.get("href") if title_tag is not None else None
            if href is not None:
                href = self.href_prefix + href
            author_tag = select_one(item, self.author_selector)
            author = author_tag.text.strip() if author_tag is not None else None
            rows.append(
                {
                    "raw_title": title,
                    "raw_href": href,
                    "raw_author": author,
                    "raw_date": self._extract_date(item),
                    "source_name": self.source_name,
                    "page_no": page_no,
                }
            )
        return rows

    def _extract_date(self, item: Node) -> str | None:
        if self.date_mode == "author_pipe":
            # 'By Abby Crotty | July 28, 2025' → part after the pipe
            # (reference: PhocusWire/PhocusWireSource.py:166-173 — exactly
            # two parts required, else no date).
            container = select_one(item, self.date_selector)
            if container is None:
                return None
            parts = container.text.split("|")
            return parts[1].strip() if len(parts) == 2 else None
        if self.date_mode == "time_attr":
            t = select_one(item, self.date_selector)
            return t.get("datetime") if t is not None else None
        raise ValueError(f"unknown date_mode {self.date_mode!r}")


EXTRACTORS: dict[str, ListingExtractor] = {
    # reference: PhocusWire/PhocusWireSource.py:131-173; href interpolation at
    # :153 is base + '/' + href even when href starts with '/', producing the
    # double-slash links observed in data/articles.db — href_prefix keeps the
    # md5 ids bit-identical.
    "Phocuswire": ListingExtractor(
        source_name="Phocuswire",
        container_selector="div.article-list div.item",
        title_selector="a.title",
        author_selector="div.author > span.name",
        date_mode="author_pipe",
        date_selector="div.author",
        href_prefix="/",
    ),
    # reference: Skift/SkiftSource.py:126-158; hrefs are absolute.
    "Skift": ListingExtractor(
        source_name="Skift",
        container_selector="article",
        title_selector="h3.c-tease__title a",
        author_selector="div.c-tease__byline a.underline",
        date_mode="time_attr",
        date_selector="div.c-tease__byline time",
    ),
}


def extract_listing(source_name: str, html: str, page_no: int) -> list[dict]:
    return EXTRACTORS[source_name].extract_page(html, page_no)
