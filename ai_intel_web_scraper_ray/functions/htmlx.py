"""HTML content + link extraction on the stdlib parser.

The reference extracts with BeautifulSoup+lxml
(reference: competitive-intel/scrapers/utils.py:120-246, 279-293); neither
library exists in this environment, so this is a from-scratch extractor on
``html.parser`` reproducing the same semantics:

- title from ``<title>``, falling back to the first ``<h1>``;
- content area by a CSS-selector subset (tag, ``.class``, ``#id``,
  ``[role='x']``) with the fallback chain
  ``main / article / [role='main'] / .content / #content / body``;
- removal of nav/header/footer/aside/script/style/noscript and of any element
  whose class matches cookie|banner|popup|modal|overlay|sidebar|toc
  (case-insensitive);
- structured text: fenced code blocks with language, tables as markdown,
  ``#``-prefixed headings, ``- `` list items, recursion into
  p/div/section/article/main/blockquote, parts joined by newlines.

Link extraction returns same-domain, html-looking canonical URLs.  NOTE ON
ORDER: the reference dedups links via ``list(set(links))`` whose order depends
on Python's randomized string hash — the reference is only deterministic under
a fixed PYTHONHASHSEED.  A distributed engine cannot depend on worker-process
hash seeds, so we pin the canonical link order to *first occurrence in
document order* (``dict.fromkeys``), and the conformance oracle
(tests/oracle.py) pins the same refinement.  See SURVEY.md §7.5.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple, Union

from .urls import is_html_url, is_same_domain, normalize_url

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_REMOVE_TAGS = {"nav", "header", "footer", "aside", "script", "style", "noscript"}
_REMOVE_CLASS_RE = re.compile(r"cookie|banner|popup|modal|overlay|sidebar|toc", re.I)
_RECURSE_TAGS = {"p", "div", "section", "article", "main", "blockquote"}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_FALLBACK_SELECTORS = ["main", "article", "[role='main']", ".content", "#content"]


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Dict[str, str], parent: Optional["Node"]):
        self.tag = tag
        self.attrs = attrs
        self.children: List[Union["Node", str]] = []
        self.parent = parent

    # -- queries ----------------------------------------------------------
    def iter_nodes(self):
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def find_all(self, tag: str) -> List["Node"]:
        # inline preorder loop — same order as iter_nodes, without the
        # per-node generator resume (find_all("a") walks every node of the
        # content subtree on every page, the hottest tree query)
        out: List["Node"] = []
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag == tag:
                out.append(n)
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
        return out

    def get_text(self, strip: bool = False, sep: str = "") -> str:
        parts: List[str] = []

        def walk(n: Node):
            for c in n.children:
                if isinstance(c, str):
                    parts.append(c)
                else:
                    walk(c)

        walk(self)
        text = sep.join(parts)
        return text.strip() if strip else text

    def classes(self) -> List[str]:
        return self.attrs.get("class", "").split()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs} if attrs else {},
                    self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs} if attrs else {},
                    self.stack[-1])
        self.stack[-1].children.append(node)

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


def select_one(root: Node, selector: str) -> Optional[Node]:
    """Tiny CSS subset: 'tag', '.class', '#id', \"[role='x']\".  Inline
    preorder loops (same first-match-in-document-order semantics as
    iterating ``iter_nodes``, minus the generator overhead — this runs
    several times per page on the crawl hot path)."""
    selector = selector.strip()
    if selector.startswith("."):
        want = selector[1:]
        stack = [root]
        while stack:
            n = stack.pop()
            if want in n.classes():
                return n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
        return None
    if selector.startswith("#"):
        want = selector[1:]
        stack = [root]
        while stack:
            n = stack.pop()
            if n.attrs.get("id") == want:
                return n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
        return None
    m = re.fullmatch(r"\[(\w+)=['\"]?([^'\"\]]+)['\"]?\]", selector)
    if m:
        attr, want = m.group(1), m.group(2)
        stack = [root]
        while stack:
            n = stack.pop()
            if n.tag != "[document]" and n.attrs.get(attr) == want:
                return n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
        return None
    stack = [root]
    while stack:
        n = stack.pop()
        if n.tag == selector:
            return n
        stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
    return None


def _prune(node: Node) -> None:
    """Drop unwanted subtrees in place (nav/footer/... + banner classes)."""

    def keep(child: Union[Node, str]) -> bool:
        if not isinstance(child, Node):
            return True
        if child.tag in _REMOVE_TAGS:
            return False
        cls = child.attrs.get("class", "")
        if cls and _REMOVE_CLASS_RE.search(cls):
            return False
        return True

    node.children = [c for c in node.children if keep(c)]
    for c in node.children:
        if isinstance(c, Node):
            _prune(c)


def _table_markdown(table: Node) -> str:
    rows = []
    for tr in table.find_all("tr"):
        cells = [
            c.get_text(strip=True)
            for c in tr.iter_nodes()
            if c.tag in ("th", "td")
        ]
        if cells:
            rows.append("| " + " | ".join(cells) + " |")
    if not rows:
        return ""
    if len(rows) > 1:
        ncols = rows[0].count("|") - 1
        rows.insert(1, "| " + " | ".join(["---"] * ncols) + " |")
    return "\n" + "\n".join(rows) + "\n"


def _structured_text(node: Node) -> str:
    parts: List[str] = []
    for child in node.children:
        if isinstance(child, str):
            s = child.strip()
            if s:
                parts.append(s)
            continue
        tag = child.tag
        if tag == "pre" or (tag == "code" and child.parent and child.parent.tag == "pre"):
            lang = ""
            for cls in child.classes():
                if cls.startswith("language-"):
                    lang = cls[len("language-"):]
                    break
            parts.append(f"\n```{lang}\n{child.get_text()}\n```\n")
        elif tag == "table":
            parts.append(_table_markdown(child))
        elif tag in _HEADING_TAGS:
            parts.append(f"\n{'#' * int(tag[1])} {child.get_text(strip=True)}\n")
        elif tag in ("ul", "ol"):
            for li in (c for c in child.children if isinstance(c, Node) and c.tag == "li"):
                parts.append(f"- {li.get_text(strip=True)}")
        elif tag in _RECURSE_TAGS:
            inner = _structured_text(child)
            if inner.strip():
                parts.append(inner)
        else:
            s = child.get_text(strip=True)
            if s:
                parts.append(s)
    return "\n".join(parts)


def extract_content(html: str, content_selector: str = "article", url: str = "") -> Tuple[str, str]:
    """(title, structured_text) for one page."""
    root = parse_html(html)

    title = ""
    t = select_one(root, "title")
    if t:
        title = t.get_text(strip=True)
    if not title:
        h1 = select_one(root, "h1")
        if h1:
            title = h1.get_text(strip=True)

    area = select_one(root, content_selector)
    if area is None:
        for fb in _FALLBACK_SELECTORS:
            area = select_one(root, fb)
            if area is not None:
                break
    if area is None:
        area = select_one(root, "body")
    if area is None:
        return title, ""

    _prune(area)
    return title, _structured_text(area)


def extract_page(
    html: str,
    content_selector: str = "article",
    base_url: str = "",
    collect_links: bool = True,
    collect_media: bool = False,
) -> Tuple[str, str, List[str], List[str]]:
    """Single-parse (title, structured_text, links, media_refs).

    ``parse_html`` is ~2/3 of the per-page cost (profiled: 2.6 s of 3.9 s
    per 500 bench pages) and ``extract_content`` + ``extract_links`` each
    paid it.  Semantics are identical to calling both on fresh parses:
    links are collected BEFORE the content-area prune mutates the tree,
    exactly as ``extract_links``'s own parse would see it.

    ``collect_media``: also return same-domain NON-html links (the anchors
    ``is_html_url`` rejects — images, pdfs, archives) canonicalized in
    first-occurrence order.  The reference crawler silently drops these
    (scrapers/docs_scraper.py link filter); the engine records them as the
    ``media`` spans of the interleaved text+media payload
    (sources/interleaved.py).  Media anchors are scanned even at max depth
    (where ``collect_links=False``): they are payload, not frontier."""
    root = parse_html(html)

    # the selector area is queried for BOTH the link scan and the content
    # extraction — resolve it once per page (body lazily, only on miss)
    area_sel = select_one(root, content_selector)
    _body: List[Optional[Node]] = []

    def body() -> Optional[Node]:
        if not _body:
            _body.append(area_sel if content_selector == "body"
                         else select_one(root, "body"))
        return _body[0]

    links: List[str] = []
    media: List[str] = []
    if collect_links or collect_media:
        content = area_sel if area_sel is not None else body()
        if content is not None:
            for a in content.find_all("a"):
                href = a.attrs.get("href")
                if not href:
                    continue
                full = normalize_url(href, base_url)
                if not is_same_domain(full, base_url):
                    continue
                if is_html_url(full):
                    if collect_links:
                        links.append(full)
                elif collect_media:
                    media.append(full)
        links = list(dict.fromkeys(links))
        media = list(dict.fromkeys(media))

    title = ""
    t = select_one(root, "title")
    if t:
        title = t.get_text(strip=True)
    if not title:
        h1 = select_one(root, "h1")
        if h1:
            title = h1.get_text(strip=True)

    area = area_sel
    if area is None:
        for fb in _FALLBACK_SELECTORS:
            area = select_one(root, fb)
            if area is not None:
                break
    if area is None:
        area = body()
    if area is None:
        return title, "", links, media
    _prune(area)
    return title, _structured_text(area), links, media


def extract_links(html: str, base_url: str, content_selector: str = "body") -> List[str]:
    """Same-domain html links in the content area, canonicalized; first-
    occurrence order (deterministic refinement of the reference's
    ``list(set(...))`` — see module docstring)."""
    root = parse_html(html)
    content = select_one(root, content_selector) or select_one(root, "body")
    if content is None:
        return []
    links = []
    for a in content.find_all("a"):
        href = a.attrs.get("href")
        if not href:
            continue
        full = normalize_url(href, base_url)
        if is_same_domain(full, base_url) and is_html_url(full):
            links.append(full)
    return list(dict.fromkeys(links))
