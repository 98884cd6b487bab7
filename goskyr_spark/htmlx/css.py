"""CSS selector engine matching the cascadia subset goskyr uses.

The reference matches selectors with ``github.com/andybalholm/cascadia``
via goquery (``/root/reference/fetch/cache.go:111-141``).  The selector
language observed across the fixture corpus and the config generator
(``/root/reference/generate/parse.go:139-186``) is:

    tag[.class...]  compounds, ``>`` child and descendant combinators,
    ``#id``, ``:nth-child(N)``, ``,`` groups, ``*``, ``[attr]``/
    ``[attr=val]`` for completeness, CSS identifier escapes
    (``\\31 -1`` hex form and ``\\@`` literal form — see
    ``css-class-with-special-chars-com`` fixtures).

Semantics mirror goquery:

* ``find(roots, sel)``  -> descendants of any root that match, in
  document order, deduplicated (goquery ``Selection.Find``)
* ``filter(nodes, sel)`` -> the nodes themselves that match
  (goquery ``Selection.Filter``)

Matching is right-to-left over compound chains; class and attribute
matching is case-sensitive, tag names are lower-cased (x/net/html
lower-cases at parse time).
"""

from __future__ import annotations

from .parser import ELEMENT, Node

_HEX = "0123456789abcdefABCDEF"
_WS = " \t\r\n\f"


class SelectorError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer helpers


def _unescape_ident(s: str, i: int) -> tuple[str, int]:
    """Read a CSS identifier starting at i, handling escapes.

    Returns (identifier, next_index).
    """
    out = []
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\":
            i += 1
            if i >= n:
                out.append("\\")
                break
            c = s[i]
            if c in _HEX:
                j = i
                while j < n and j - i < 6 and s[j] in _HEX:
                    j += 1
                cp = int(s[i:j], 16)
                out.append(chr(cp))
                i = j
                # one whitespace after hex escape is consumed
                if i < n and s[i] in _WS:
                    i += 1
            else:
                out.append(c)
                i += 1
        elif ch.isalnum() or ch in "-_" or ord(ch) > 0x7F:
            out.append(ch)
            i += 1
        else:
            break
    return "".join(out), i


class Compound:
    __slots__ = ("tag", "classes", "id", "attrs", "nth", "pseudo")

    def __init__(self):
        self.tag = None  # None = any
        self.classes = []
        self.id = None
        self.attrs = []  # list of (name, op, value)
        self.nth = None  # int for :nth-child(N)
        self.pseudo = []  # 'first-child' | 'last-child'

    def match(self, node: Node) -> bool:
        if node.type != ELEMENT:
            return False
        if self.tag is not None and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            nc = node.classes
            for c in self.classes:
                if c not in nc:
                    return False
        for name, op, value in self.attrs:
            if name not in node.attrs:
                return False
            if op == "=" and node.attrs[name] != value:
                return False
            if op == "~=" and value not in node.attrs[name].split():
                return False
        if self.nth is not None or self.pseudo:
            parent = node.parent
            if parent is None:
                return False
            elems = [c for c in parent.children if c.type == ELEMENT]
            idx = elems.index(node) + 1  # 1-based
            if self.nth is not None and idx != self.nth:
                return False
            if "first-child" in self.pseudo and idx != 1:
                return False
            if "last-child" in self.pseudo and idx != len(elems):
                return False
        return True

    def __repr__(self):  # pragma: no cover
        return f"Compound(tag={self.tag}, classes={self.classes}, id={self.id}, nth={self.nth})"


class Selector:
    """One complex selector: list of (combinator, Compound); first
    combinator is the implicit descendant from the match root."""

    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = parts  # [(comb, Compound)] comb in {' ', '>', '+', '~'}

    def match(self, node: Node) -> bool:
        """Does node match this selector (ancestors unrestricted above)?"""
        return self._match_from(node, len(self.parts) - 1)

    def _match_from(self, node: Node, k: int) -> bool:
        comb, comp = self.parts[k]
        if not comp.match(node):
            return False
        if k == 0:
            return True
        prev_comb = comb  # combinator between parts[k-1] and parts[k]
        if prev_comb == ">":
            p = node.parent
            return p is not None and p.type == ELEMENT and self._match_from(p, k - 1)
        if prev_comb == " ":
            p = node.parent
            while p is not None and p.type == ELEMENT:
                if self._match_from(p, k - 1):
                    return True
                p = p.parent
            return False
        if prev_comb == "+":
            sib = _prev_element_sibling(node)
            return sib is not None and self._match_from(sib, k - 1)
        if prev_comb == "~":
            sib = _prev_element_sibling(node)
            while sib is not None:
                if self._match_from(sib, k - 1):
                    return True
                sib = _prev_element_sibling(sib)
            return False
        raise SelectorError(f"unknown combinator {prev_comb!r}")


def _prev_element_sibling(node: Node):
    p = node.parent
    if p is None:
        return None
    prev = None
    for c in p.children:
        if c is node:
            return prev
        if c.type == ELEMENT:
            prev = c
    return None


class SelectorGroup:
    __slots__ = ("selectors", "source", "_single")

    def __init__(self, selectors, source):
        self.selectors = selectors
        self.source = source
        # hot path: nearly all selectors are single-complex groups
        self._single = selectors[0] if len(selectors) == 1 else None

    def match(self, node: Node) -> bool:
        if self._single is not None:
            return self._single.match(node)
        for s in self.selectors:
            if s.match(node):
                return True
        return False

    def __repr__(self):  # pragma: no cover
        return f"SelectorGroup({self.source!r})"


# ---------------------------------------------------------------------------
# parser

def _parse_compound(s: str, i: int) -> tuple[Compound, int]:
    n = len(s)
    comp = Compound()
    matched_any = False
    if i < n and s[i] == "*":
        comp.tag = None
        i += 1
        matched_any = True
    elif i < n and (s[i].isalnum() or s[i] in "_\\" or ord(s[i]) > 0x7F):
        tag, i = _unescape_ident(s, i)
        comp.tag = tag.lower()
        matched_any = True
    while i < n:
        ch = s[i]
        if ch == ".":
            cls, i = _unescape_ident(s, i + 1)
            if not cls:
                raise SelectorError(f"empty class in {s!r}")
            comp.classes.append(cls)
            matched_any = True
        elif ch == "#":
            ident, i = _unescape_ident(s, i + 1)
            comp.id = ident
            matched_any = True
        elif ch == "[":
            j = s.index("]", i)
            inner = s[i + 1 : j]
            if "=" in inner:
                if "~=" in inner:
                    name, _, val = inner.partition("~=")
                    op = "~="
                else:
                    name, _, val = inner.partition("=")
                    op = "="
                val = val.strip("\"'")
                comp.attrs.append((name.strip(), op, val))
            else:
                comp.attrs.append((inner.strip(), "exists", None))
            i = j + 1
            matched_any = True
        elif ch == ":":
            i += 1
            name, i = _unescape_ident(s, i)
            if i < n and s[i] == "(":
                j = s.index(")", i)
                arg = s[i + 1 : j].strip()
                i = j + 1
            else:
                arg = None
            if name == "nth-child":
                try:
                    comp.nth = int(arg)
                except (TypeError, ValueError):
                    raise SelectorError(f"unsupported nth-child arg {arg!r} in {s!r}")
            elif name in ("first-child", "last-child"):
                comp.pseudo.append(name)
            else:
                raise SelectorError(f"unsupported pseudo-class :{name} in {s!r}")
            matched_any = True
        else:
            break
    if not matched_any:
        raise SelectorError(f"expected compound selector at {i} in {s!r}")
    return comp, i


def parse_selector(source: str) -> SelectorGroup:
    s = source
    n = len(s)
    i = 0
    selectors = []
    parts = []
    pending_comb = None  # None = start of selector
    while i < n:
        # skip whitespace, remembering it as a potential descendant combinator
        saw_ws = False
        while i < n and s[i] in _WS:
            saw_ws = True
            i += 1
        if i >= n:
            break
        ch = s[i]
        if ch == ",":
            if parts:
                selectors.append(Selector(parts))
            parts = []
            pending_comb = None
            i += 1
            continue
        if ch in ">+~":
            pending_comb = ch
            i += 1
            continue
        comp, i = _parse_compound(s, i)
        if not parts:
            parts.append((" ", comp))
        else:
            comb = pending_comb if pending_comb else (" " if saw_ws else " ")
            parts.append((comb, comp))
        pending_comb = None
    if parts:
        selectors.append(Selector(parts))
    if not selectors:
        raise SelectorError(f"empty selector {source!r}")
    return SelectorGroup(selectors, source)


_SEL_CACHE: dict[str, SelectorGroup] = {}


def compile_selector(source: str) -> SelectorGroup:
    sel = _SEL_CACHE.get(source)
    if sel is None:
        sel = parse_selector(source)
        if len(_SEL_CACHE) > 4096:
            _SEL_CACHE.clear()
        _SEL_CACHE[source] = sel
    return sel


# ---------------------------------------------------------------------------
# goquery-style operations


def find(roots: list[Node], selector: str) -> list[Node]:
    """Descendants of any root matching selector, document order, deduped.

    goquery ``Selection.Find`` — matching is absolute (ancestors above the
    root participate in combinator checks, like cascadia's behavior on a
    full document tree).
    """
    # memoized single-root path: each container node is re-queried once per
    # field per record — the reference caches these finds per Document /
    # Selection (fetch/cache.go:111-141); we cache on the root node itself
    if len(roots) == 1:
        root = roots[0]
        cache = root.find_cache
        if cache is None:
            cache = root.find_cache = {}
        hit = cache.get(selector)
        if hit is not None:
            return list(hit)
        out = _find_uncached(roots, selector)
        cache[selector] = out
        return list(out)
    return _find_uncached(roots, selector)


def _find_uncached(roots: list[Node], selector: str) -> list[Node]:
    sel = compile_selector(selector)
    out = []
    seen = set()
    for root in roots:
        stack = list(reversed(root.children))
        while stack:
            node = stack.pop()
            if node.type == ELEMENT:
                nid = id(node)
                if nid not in seen and sel.match(node):
                    seen.add(nid)
                    out.append(node)
                stack.extend(reversed(node.children))
    return out


def filter_nodes(nodes: list[Node], selector: str) -> list[Node]:
    """goquery ``Selection.Filter``: keep nodes matching selector."""
    sel = compile_selector(selector)
    return [n for n in nodes if n.type == ELEMENT and sel.match(n)]
