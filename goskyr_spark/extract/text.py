"""Scalar extraction functions — the expression library (SURVEY §2.3).

Byte-identical re-implementation of the reference's text pipeline:

* ``get_text_string``      — ``getTextString``   ``/root/reference/scrape/scrape.go:1924-2126``
* ``get_html_string``      — ``getHTMLString``   ``/root/reference/scrape/scrape.go:2131-2176``
* ``extract_string_field`` — ``extractStringField`` ``/root/reference/scrape/scrape.go:1878-1918``
* ``extract_string_regex`` — ``extractStringRegex`` ``/root/reference/scrape/scrape.go:2229-2252``
* ``transform_string``     — ``transformString``  ``/root/reference/scrape/scrape.go:2256-2273``
* ``extract_json_field``   — ``extractJsonField`` ``/root/reference/scrape/scrape.go:2288-2306``
* separators               — ``/root/reference/scrape/scrape.go:50-72``
* ``shorten_string``       — ``/root/reference/utils/utils.go:11-16``

These are pure functions of (DOM node set, ElementLocation); the Spark
layer batches them inside Arrow pandas UDFs.
"""

from __future__ import annotations

import json
import re

from ..config.model import ElementLocation, RegexConfig, TransformConfig
from ..htmlx.css import compile_selector, find
from ..htmlx.parser import ELEMENT, TEXT, Node, render_children

UNIT_SEPARATOR = "\x1f"    # siblings within one matched element
RECORD_SEPARATOR = "\x1e"  # values from multiple matched elements
GROUP_SEPARATOR = "\x1d"   # reserved
FIELD_PART_SEPARATOR = "\n\n\n"  # joins multiple ElementLocations (text)
HTML_PART_SEPARATOR = "<br>"     # joins multiple ElementLocations (html/markdown)
HTML_NODE_SEPARATOR = "<br>"     # joins inner HTML of multiple nodes

SKIP_TAG = frozenset(("noscript", "script", "style"))

# HTML block-level elements (scrape.go:1863-1874): under strip_tags,
# separators go only between block-level siblings.
BLOCK_ELEMENTS = frozenset(
    "address article aside blockquote br details dialog dd div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header "
    "hgroup hr li main nav ol p pre section table tbody td tfoot th "
    "thead tr ul".split()
)

_COLLAPSE_SPACES_RE = re.compile(r"[ ]{2,}")

# Go strings.TrimSpace cutset = unicode.IsSpace:
# '\t','\n','\v','\f','\r',' ',U+0085,U+00A0 + Unicode Zs. Python's
# str.strip() strips a superset-compatible set for all of those.
_GO_SPACE = "\t\n\v\f\r \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"


def go_trim_space(s: str) -> str:
    return s.strip(_GO_SPACE)


def shorten_string(s: str, max_length: int) -> str:
    """utils.ShortenString: truncate to max_length-3 runes + '...'."""
    if max_length > 0 and len(s) > max_length:
        return s[: max_length - 3] + "..."
    return s


class ExtractError(Exception):
    """Extraction error — the record is emitted with ``_error``
    (``/root/reference/scrape/scrape.go:815-826``)."""


def _go_regex(pattern: str) -> re.Pattern:
    """Compile a Go RE2 pattern with Python re.

    The RE2 syntax used across fixture configs is a shared subset; the
    only common divergence is RE2's ``(?i)`` placement and ``\\b`` which
    agree anyway.
    """
    return re.compile(pattern)


def extract_string_regex(rc: RegexConfig, s: str) -> str:
    if not rc.exp:
        return s
    regex = _go_regex(rc.exp)
    matches = [m.group(0) for m in regex.finditer(s)]
    if not matches:
        raise ExtractError(f"no matching strings found for regex: {rc.exp}")
    if rc.index == -1:
        return matches[-1]
    if rc.index >= len(matches):
        raise ExtractError(
            f"regex index out of bounds. regex '{rc.exp}' gave only {len(matches)} matches"
        )
    return matches[rc.index]


def transform_string(t: TransformConfig, s: str) -> str:
    if t.type == "regex-replace":
        if t.regex:
            # Go Replacement uses $1/$name; translate to Python \1/\g<name>
            repl = re.sub(r"\$(\d+)", r"\\\1", t.replace)
            repl = re.sub(r"\$\{(\w+)\}", r"\\g<\1>", repl)
            return _go_regex(t.regex).sub(repl, s)
        return s
    if t.type == "":
        return s
    raise ExtractError(f"transform type '{t.type}' does not exist")


_JSON_SPACE_RE = re.compile(r"\s+")
_JSON_DANGLING_COMMA_RE = re.compile(r",\s*}")


def extract_json_field(path: str, s: str) -> str:
    """JSONPath subset lookup with the reference's whitespace/dangling-comma
    repairs (scrape.go:2288-2306). Supports dotted paths and [n] indexing —
    the subset jsonquery FindOne covers for goskyr configs."""
    if not path:
        return s
    s2 = _JSON_SPACE_RE.sub(" ", s)
    s2 = _JSON_DANGLING_COMMA_RE.sub(" }", s2)
    try:
        doc = json.loads(s2)
    except json.JSONDecodeError as e:
        raise ExtractError(f"parsing json: {e}") from e
    cur = doc
    for part in path.strip("/").replace("]", "").split("/" if "/" in path else "."):
        if part == "":
            continue
        idxs = part.split("[")
        key = idxs[0]
        if key:
            if not isinstance(cur, dict) or key not in cur:
                return ""
            cur = cur[key]
        for ix in idxs[1:]:
            try:
                cur = cur[int(ix)]
            except (ValueError, IndexError, TypeError):
                return ""
    if cur is None:
        return ""
    if isinstance(cur, (dict, list)):
        return json.dumps(cur, separators=(",", ":"))
    if isinstance(cur, bool):
        return "true" if cur else "false"
    return str(cur)


def _subtree_text(node: Node, separator: str, strip_tags: bool, until_sel) -> str:
    """The core subtree text walk (scrape.go:1984-2021).

    Collects text nodes, skipping script/style/noscript, stopping at an
    ``until_selector`` match, inserting ``separator`` after each element
    child that has a next sibling (block-only when strip_tags).
    """
    buf: list[str] = []
    stopped = False

    def f(n: Node):
        nonlocal stopped
        if stopped:
            return
        if n.type == ELEMENT and n.tag in SKIP_TAG:
            return
        if until_sel is not None and n.type == ELEMENT and until_sel.match(n):
            stopped = True
            return
        if n.type == TEXT:
            buf.append(n.text)
        children = n.children
        if children:
            last = len(children) - 1
            for i, c in enumerate(children):
                if stopped:
                    break
                f(c)
                if c.type == ELEMENT and i != last:
                    if not strip_tags or c.tag in BLOCK_ELEMENTS:
                        buf.append(separator)

    f(node)
    return "".join(buf)


def get_text_string(e: ElementLocation, nodes: list[Node]) -> str:
    """getTextString (scrape.go:1924-2126) over a goquery-style node set."""
    entire_subtree = e.entire_subtree
    all_nodes = e.all_nodes
    if e.child_index == 0:
        if not e.entire_subtree and not e.all_nodes:
            entire_subtree = True
            all_nodes = True
        elif e.entire_subtree and not e.all_nodes:
            all_nodes = True

    if e.selector == "":
        field_nodes = nodes
    else:
        field_nodes = find(nodes, e.selector)

    field_strings: list[str] = []
    if field_nodes:
        if e.attr == "":
            if entire_subtree:
                if e.separator:
                    subtree_sep = e.separator
                elif e.strip_tags:
                    subtree_sep = "\n"
                else:
                    subtree_sep = UNIT_SEPARATOR
                until_sel = compile_selector(e.until_selector) if e.until_selector else None
                if all_nodes:
                    for node in field_nodes:
                        field_strings.append(
                            _subtree_text(node, subtree_sep, e.strip_tags, until_sel)
                        )
                else:
                    field_strings.append(
                        _subtree_text(field_nodes[0], subtree_sep, e.strip_tags, until_sel)
                    )
            else:
                # ChildIndex mode: pick the child_index-th child node when it
                # is a text node (scrape.go:2034-2069)
                first_children: list[Node] = []
                if all_nodes:
                    for node in field_nodes:
                        if node.children:
                            first_children.append(node.children[0])
                else:
                    first = field_nodes[0].children[0] if field_nodes[0].children else None
                    for n in field_nodes:
                        if not n.attrs:
                            first = n.children[0] if n.children else None
                            break
                    if first is not None:
                        first_children.append(first)
                for fc in first_children:
                    idx = 0
                    cur = fc
                    while cur is not None:
                        if idx == e.child_index and cur.type == TEXT:
                            field_strings.append(cur.text)
                            break
                        cur = cur.next_sibling()
                        idx += 1
        else:
            if all_nodes:
                for node in field_nodes:
                    field_strings.append(node.attrs.get(e.attr, ""))
            else:
                field_strings.append(field_nodes[0].attrs.get(e.attr, ""))

    field_strings = [extract_json_field(e.json_selector, s) for s in field_strings]
    field_strings = [extract_string_regex(e.regex_extract, s) for s in field_strings]
    field_strings = [go_trim_space(s) for s in field_strings]
    field_strings = [shorten_string(s, e.max_length) for s in field_strings]
    node_sep = e.node_separator if e.node_separator else RECORD_SEPARATOR
    return node_sep.join(field_strings)


def get_html_string(e: ElementLocation, nodes: list[Node]) -> str:
    """getHTMLString (scrape.go:2131-2176): inner HTML of all matched
    nodes joined with <br>, then regex/shorten."""
    if e.selector == "":
        field_nodes = nodes
    else:
        field_nodes = find(nodes, e.selector)
    if not field_nodes:
        return ""
    parts = []
    for n in field_nodes:
        h = go_trim_space(render_children(n))
        if h:
            parts.append(h)
    html_str = HTML_NODE_SEPARATOR.join(parts)
    html_str = extract_string_regex(e.regex_extract, html_str)
    return shorten_string(html_str, e.max_length)


def extract_string_field(extract_fn, f, nodes: list[Node], part_sep: str) -> str:
    """extractStringField (scrape.go:1878-1918): join per-location parts,
    default/required, transforms, NBSP+collapse+trim normalization."""
    parts = []
    for loc in f.location:
        if f.strip_tags:
            loc.strip_tags = True
        if f.collapse_spaces:
            loc.collapse_spaces = True
        s = extract_fn(loc, nodes)
        if s != "":
            parts.append(s)
    t = part_sep.join(parts)
    if t == "":
        t = f.default
        if f.required and t == "":
            raise ExtractError(f"field {f.name} is required but empty")
    for tr in f.transform:
        t = transform_string(tr, t)
    t = t.replace("\u00a0", " ")
    t = _COLLAPSE_SPACES_RE.sub(" ", t)
    return go_trim_space(t)
