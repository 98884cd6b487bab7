"""HTML5-ish DOM tree builder on the Python stdlib.

The reference engine parses pages with Go's ``golang.org/x/net/html``
(a WHATWG-HTML5 tree constructor) and then re-renders them so the
tokenizer and goquery see identical trees
(``/root/reference/fetch/cache.go:80-109``).  No third-party HTML
parser is available in this environment, so this module implements the
subset of the HTML5 tree-construction algorithm the goskyr fixture
corpus exercises on top of ``html.parser.HTMLParser``:

* explicit ``html``/``head``/``body`` scaffolding (created when omitted)
* void elements never take children
* implied end tags (``p`` closed by block starts, ``li`` by ``li``,
  ``td``/``th``/``tr`` table rules, ``dd``/``dt``, ``option`` ...)
* ``tbody`` insertion for ``tr`` directly inside ``table``
* raw-text handling for ``script``/``style`` (html.parser CDATA mode)
* character references decoded in text and attributes
* duplicate attributes: first occurrence wins (HTML5 rule)
* ALL text nodes (including whitespace-only) are preserved — the
  extraction separator logic depends on sibling text nodes
  (``/root/reference/scrape/scrape.go:2010-2018``)

The produced tree is a plain-Python ``Node`` structure cheap to build
inside Arrow-batched pandas UDFs (one parse per page, amortized over a
batch).
"""

from __future__ import annotations

from html.parser import HTMLParser

ELEMENT = 1
TEXT = 3
COMMENT = 8
DOCUMENT = 9

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# metadata content allowed in <head>
_HEAD_ELEMENTS = frozenset("title base link meta style script noscript template".split())

# elements whose start tag closes an open <p> (HTML5 "closes a p element")
_P_CLOSERS = frozenset(
    "address article aside blockquote details dialog dir div dl fieldset "
    "figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main "
    "menu nav ol p pre section table ul".split()
)

# implied-end-tag rules: starting tag T closes an open element E when
# E in _AUTOCLOSE[T] and E is the current open element.
_AUTOCLOSE = {
    "li": {"li"},
    "dt": {"dd", "dt"},
    "dd": {"dd", "dt"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"tr", "td", "th", "tbody", "tfoot", "caption", "colgroup"},
    "tbody": {"tr", "td", "th", "thead", "caption", "colgroup"},
    "tfoot": {"tr", "td", "th", "tbody", "thead", "caption", "colgroup"},
    "option": {"option"},
    "optgroup": {"option", "optgroup"},
    "colgroup": {"colgroup"},
    "caption": {"caption"},
}

_TABLE_SECTIONS = frozenset(("thead", "tbody", "tfoot"))


class Node:
    """One DOM node. Mirrors x/net/html's Node shape (type, data, attrs,
    parent/children) so the extraction walk reads like the reference's."""

    __slots__ = ("type", "tag", "text", "attrs", "classes", "parent", "children", "find_cache")

    def __init__(self, type_, tag="", text="", attrs=None):
        self.type = type_
        self.tag = tag
        self.text = text
        self.attrs = attrs if attrs is not None else {}
        self.classes = ()
        self.parent = None
        self.children = []
        self.find_cache = None  # per-node selector→result memo (cf. goskyr's
        # per-Document/Selection Find caches, fetch/cache.go:111-141)

    # -- tree ops ---------------------------------------------------------
    def append(self, child):
        child.parent = self
        self.children.append(child)

    def element_children(self):
        return [c for c in self.children if c.type == ELEMENT]

    def iter_elements(self):
        """Pre-order document-order walk over element descendants (excl. self)."""
        stack = list(reversed([c for c in self.children if c.type == ELEMENT]))
        # full DFS including nested
        out_stack = [c for c in reversed(self.children)]
        while out_stack:
            n = out_stack.pop()
            if n.type == ELEMENT:
                yield n
                out_stack.extend(reversed(n.children))

    def get_attr(self, name, default=None):
        return self.attrs.get(name, default)

    def set_attr(self, name, value):
        self.attrs[name] = value
        if name == "class":
            self.classes = tuple(value.split())

    def next_sibling(self):
        p = self.parent
        if p is None:
            return None
        sibs = p.children
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        return sibs[i + 1] if i + 1 < len(sibs) else None

    # -- text -------------------------------------------------------------
    def text_content(self):
        """jQuery-style .Text(): concatenation of all text nodes."""
        parts = []
        stack = [self] if self.type != DOCUMENT else list(reversed(self.children))
        if self.type == DOCUMENT:
            while stack:
                n = stack.pop()
                if n.type == TEXT:
                    parts.append(n.text)
                else:
                    stack.extend(reversed(n.children))
            return "".join(parts)
        _collect_text(self, parts)
        return "".join(parts)

    def __repr__(self):  # pragma: no cover - debug aid
        if self.type == TEXT:
            return f"Text({self.text!r})"
        return f"<{self.tag} {self.attrs}>"


def _collect_text(n, parts):
    if n.type == TEXT:
        parts.append(n.text)
        return
    for c in n.children:
        _collect_text(c, parts)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.document = Node(DOCUMENT)
        self.html = None
        self.head = None
        self.body = None
        self._stack = []  # open elements; empty until <html> materialized
        self._head_done = False

    # -- scaffolding ------------------------------------------------------
    def _ensure_html(self):
        if self.html is None:
            self.html = Node(ELEMENT, "html")
            self.document.append(self.html)
        return self.html

    def _ensure_head(self):
        self._ensure_html()
        if self.head is None:
            self.head = Node(ELEMENT, "head")
            self.html.append(self.head)
        return self.head

    def _ensure_body(self):
        self._ensure_head()
        self._head_done = True
        if self.body is None:
            self.body = Node(ELEMENT, "body")
            self.html.append(self.body)
        return self.body

    def _current(self, for_tag=None, is_text=False):
        """Insertion point honoring the html/head/body scaffolding."""
        if self._stack:
            return self._stack[-1]
        # no explicit open element: route by content type
        if not self._head_done:
            if for_tag in _HEAD_ELEMENTS:
                return self._ensure_head()
            if is_text and (for_tag is None):
                # whitespace before body is dropped; non-ws text opens body
                return None  # caller decides
        return self._ensure_body()

    # -- handlers ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._insert_element(tag, attrs, self_closing=tag in VOID_ELEMENTS)

    def handle_startendtag(self, tag, attrs):
        self._insert_element(tag, attrs, self_closing=True)

    def _insert_element(self, tag, attrs, self_closing):
        if tag == "html":
            node = self._ensure_html()
            for k, v in attrs:
                if k not in node.attrs:
                    node.set_attr(k, v if v is not None else "")
            return
        if tag == "head":
            self._ensure_head()
            self._stack.append(self.head)
            return
        if tag == "body":
            node = self._ensure_body()
            for k, v in attrs:
                if k not in node.attrs:
                    node.set_attr(k, v if v is not None else "")
            self._stack = [node]
            return

        # implied end tags
        auto = _AUTOCLOSE.get(tag)
        while self._stack:
            cur = self._stack[-1].tag
            if auto and cur in auto:
                self._stack.pop()
                continue
            if tag in _P_CLOSERS and cur == "p":
                self._stack.pop()
                continue
            break

        # leaving head? body-content tag while head elements open
        if not self._head_done and tag not in _HEAD_ELEMENTS:
            # close any open head-level elements
            self._stack = []
            parent = self._ensure_body()
        else:
            parent = self._current(for_tag=tag)
            if parent is None:
                parent = self._ensure_body()

        # tbody insertion: tr (or thead/tbody rows) directly inside table
        if tag == "tr" and parent.type == ELEMENT and parent.tag == "table":
            tbody = None
            if parent.children and parent.children[-1].type == ELEMENT and parent.children[-1].tag == "tbody":
                tbody = parent.children[-1]
            if tbody is None:
                tbody = Node(ELEMENT, "tbody")
                parent.append(tbody)
            parent = tbody
        elif tag in ("td", "th") and parent.type == ELEMENT and (parent.tag == "table" or parent.tag in _TABLE_SECTIONS):
            # td directly inside table/section: imply tr (and tbody under table)
            if parent.tag == "table":
                tbody = Node(ELEMENT, "tbody")
                parent.append(tbody)
                parent = tbody
            tr = Node(ELEMENT, "tr")
            parent.append(tr)
            self._stack.append(tr)
            parent = tr

        node = Node(ELEMENT, tag)
        for k, v in attrs:
            if k not in node.attrs:
                node.set_attr(k, v if v is not None else "")
        parent.append(node)
        if not self_closing:
            self._stack.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        if tag == "html":
            self._stack = []
            return
        if tag == "head":
            self._head_done = True
            self._stack = []
            return
        if tag == "body":
            self._stack = []
            return
        # find matching open element
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched end tag: ignored (HTML5 parse error recovery)

    def handle_data(self, data):
        if not data:
            return
        if not self._stack:
            if not self._head_done:
                if data.strip() == "":
                    return  # whitespace between <head> and <body>: dropped
                parent = self._ensure_body()
            else:
                parent = self._ensure_body()
        else:
            parent = self._stack[-1]
            # text directly inside html element scaffolding
            if parent is self.head and data.strip() == "":
                # whitespace in head is kept inside head per spec; keep it
                pass
        # text directly inside a table is foster-parented in HTML5; the
        # fixture corpus has only whitespace there, which x/net/html moves
        # before the table — for byte parity of extraction we drop pure
        # whitespace and foster-parent the rest before the table.
        _foster = frozenset(("table", "tr")) | _TABLE_SECTIONS
        if parent.type == ELEMENT and parent.tag in _foster:
            if data.strip() == "":
                return
            gp = parent
            while gp is not None and gp.type == ELEMENT and gp.tag in _foster:
                gp = gp.parent
            if gp is None:
                gp = self._ensure_body()
            t = Node(TEXT, text=data)
            # insert before the table element
            table = parent
            while table.parent is not gp:
                table = table.parent
            idx = gp.children.index(table)
            t.parent = gp
            gp.children.insert(idx, t)
            return
        # merge adjacent text nodes (convert_charrefs may split on entities
        # only when false; with True html.parser already merges, but be safe)
        if parent.children and parent.children[-1].type == TEXT:
            parent.children[-1].text += data
            return
        parent.append(Node(TEXT, text=data))

    def handle_comment(self, data):
        pass  # comments are irrelevant to extraction; dropped

    def handle_decl(self, decl):
        pass

    def close(self):
        super().close()
        self._ensure_body()


def parse_html(html_str: str) -> Node:
    """Parse an HTML string into a Document node (always containing
    html > head, body children, like x/net/html)."""
    tb = _TreeBuilder()
    tb.feed(html_str)
    tb.close()
    return tb.document


_NO_ESCAPE_TEXT_PARENTS = frozenset(
    # x/net/html render: raw-text elements whose text is emitted verbatim
    "iframe noembed noframes noscript plaintext script style xmp".split()
)


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace('"', "&quot;")
    )


def render(node: Node) -> str:
    """Serialize a node back to HTML (x/net/html Render-compatible for the
    subset we build). Inner HTML of an element = render of its children."""
    out = []
    _render_into(node, out)
    return "".join(out)


def render_children(node: Node) -> str:
    out = []
    for c in node.children:
        _render_into(c, out)
    return "".join(out)


def _render_into(n: Node, out: list):
    if n.type == DOCUMENT:
        for c in n.children:
            _render_into(c, out)
        return
    if n.type == TEXT:
        p = n.parent
        if p is not None and p.type == ELEMENT and p.tag in _NO_ESCAPE_TEXT_PARENTS:
            out.append(n.text)
        else:
            out.append(_escape_text(n.text))
        return
    out.append("<")
    out.append(n.tag)
    for k, v in n.attrs.items():
        out.append(f' {k}="{_escape_attr(v)}"')
    out.append(">")
    if n.tag in VOID_ELEMENTS:
        return
    for c in n.children:
        _render_into(c, out)
    out.append(f"</{n.tag}>")
