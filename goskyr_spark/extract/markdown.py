"""html → markdown (F3) — ``getMarkdownString``/``HTMLToMarkdown``
(``/root/reference/scrape/scrape.go:2178-2225``).

The conversion step approximates the Go ``html-to-markdown`` library for
the common element set (the library's exact spacing is not reproducible
from a different implementation — SURVEY §7 hard part #2; none of the 28
golden configs use ``type: markdown``, so there is no fixture gate).
The POST-PROCESSING pipeline is an exact port: UTF-8 sanitize, NBSP
variants → space, ``  \\n`` → ``\\n``, ``* * *`` and blockquote-marker
strips, ``\\\\\\n`` → ``\\n``, newline doubling, cap at ``\\n\\n\\n``,
trim."""

from __future__ import annotations

import re

from ..htmlx.parser import ELEMENT, TEXT, Node, parse_html

_SPACE_BEFORE_NL = re.compile(r"  \n")
_BLOCKQUOTE = re.compile(r"^> ?", re.MULTILINE)
_EXCESS_NL = re.compile(r"\n{4,}")
_WS = re.compile(r"\s+")

_BLOCK = {"p", "div", "section", "article", "header", "footer", "aside", "main",
          "blockquote", "pre",
          # table internals WITHOUT a table plugin render as block text:
          # the Go library (html-to-markdown/v2, turndown-derived block
          # semantics) treats table/tr/td/th as block nodes, so each
          # CELL's content becomes its own blank-line-separated block —
          # closure of divergence #2, see tests/test_markdown.py
          "table", "thead", "tbody", "tfoot", "caption", "tr", "td", "th"}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}

_LINE_START_HASH = re.compile(r"^(\s*)(#{1,6})(?=\s|$)")
# '*' appears here AND in the emphasis pass: a space-flanked '*' is not
# an emphasis delimiter (left alone there) but at a line start followed
# by a space it IS a bullet marker — symmetric with '-'/'+'
_LINE_START_MARKER = re.compile(r"^(\s*)([-*>+])(?=\s)")
_LINE_START_ORDERED = re.compile(r"^(\s*)(\d{1,9})([.)])(?=\s)")


def _escape_emphasis(t: str) -> str:
    """Escape ``*`` / ``_`` where CommonMark flanking rules could turn
    them into emphasis delimiters (the Go library's "smart" escape):
    ``*`` whenever a non-space char is adjacent on either side (intraword
    ``*`` IS emphasis); ``_`` only at word boundaries (intraword ``_``
    is literal in CommonMark, so ``a_b`` stays unescaped)."""
    if "*" not in t and "_" not in t:
        return t
    out = []
    n = len(t)
    for i, ch in enumerate(t):
        if ch in "*_":
            prev = t[i - 1] if i > 0 else " "
            nxt = t[i + 1] if i + 1 < n else " "
            flanked = (not prev.isspace()) or (not nxt.isspace())
            if ch == "_" and prev.isalnum() and nxt.isalnum():
                flanked = False  # intraword underscore: literal
            if flanked:
                out.append("\\")
        out.append(ch)
    return "".join(out)


def _escape_markdown(t: str, at_line_start: bool) -> str:
    """Markdown-significant characters in TEXT nodes are escaped so the
    emitted document renders back to the literal text (html-to-markdown
    v2 default behavior; derived from CommonMark rules — the Go library
    itself cannot be run here, see the divergence note in
    tests/test_markdown.py). Backslash first, then the always-inline
    set (backtick, brackets), flanking-sensitive emphasis markers, and
    — only at a line start — block-structure leaders (ATX ``#``,
    blockquote ``>``, list markers ``-``/``+``, ``N.``/``N)``)."""
    t = t.replace("\\", "\\\\")
    t = re.sub(r"([`\[\]])", r"\\\1", t)
    t = _escape_emphasis(t)
    if at_line_start:
        t = _LINE_START_HASH.sub(lambda m: m.group(1) + "\\" + m.group(2), t)
        t = _LINE_START_MARKER.sub(lambda m: m.group(1) + "\\" + m.group(2), t)
        t = _LINE_START_ORDERED.sub(
            lambda m: m.group(1) + m.group(2) + "\\" + m.group(3), t
        )
        if t.lstrip().startswith(">"):
            i = len(t) - len(t.lstrip())
            t = t[:i] + "\\" + t[i:]
    return t


def _raw_text(node: Node) -> str:
    """Concatenated TEXT descendants with whitespace preserved (for
    fenced code blocks)."""
    if node.type == TEXT:
        return node.text
    return "".join(_raw_text(c) for c in node.children or [])


def _convert(node: Node, out: list[str], ctx: dict) -> None:
    if node.type == TEXT:
        t = _WS.sub(" ", node.text)
        if t.strip() or (out and out[-1] and not out[-1].endswith("\n")):
            if not ctx.get("verbatim"):
                tail = "".join(out[-2:])
                at_ls = not ctx.get("inline") and (not tail or tail.endswith("\n"))
                t = _escape_markdown(t, at_line_start=at_ls)
            out.append(t)
        return
    if node.type != ELEMENT:
        # document root: walk through
        if node.children:
            for c in node.children:
                _convert(c, out, ctx)
        return
    tag = node.tag
    if tag in ("script", "style", "noscript", "head"):
        return
    if tag in _HEADINGS:
        out.append("\n\n" + "#" * _HEADINGS[tag] + " ")
        for c in node.children:
            _convert(c, out, ctx)
        out.append("\n\n")
        return
    if tag == "br":
        out.append("\n")
        return
    if tag == "hr":
        out.append("\n\n* * *\n\n")
        return
    if tag in ("strong", "b"):
        out.append("**")
        for c in node.children:
            _convert(c, out, ctx)
        out.append("**")
        return
    if tag in ("em", "i"):
        out.append("_")
        for c in node.children:
            _convert(c, out, ctx)
        out.append("_")
        return
    if tag == "code":
        # inline code spans are verbatim: no markdown escaping inside
        out.append("`")
        sub = dict(ctx, verbatim=True)
        for c in node.children:
            _convert(c, out, sub)
        out.append("`")
        return
    if tag == "pre":
        # fenced code block (commonmark plugin): raw text verbatim (no
        # whitespace collapsing), info string from a code child's
        # language-* class
        lang = ""
        for c in node.children:
            if c.type == ELEMENT and c.tag == "code":
                m = re.search(r"language-([\w+-]+)", c.attrs.get("class", ""))
                if m:
                    lang = m.group(1)
                break
        out.append("\n\n```" + lang + "\n" + _raw_text(node).strip("\n") + "\n```\n\n")
        return
    if tag == "a":
        inner: list[str] = []
        # link text is inline by construction — never at a line start,
        # so block-structure leaders (#, -, >) stay literal inside it
        sub_inline = dict(ctx, inline=True)
        for c in node.children:
            _convert(c, inner, sub_inline)
        text = "".join(inner).strip()
        href = node.attrs.get("href", "")
        title = node.attrs.get("title", "")
        if href and title:
            out.append(f'[{text}]({href} "{title}")')
        elif href:
            out.append(f"[{text}]({href})")
        else:
            out.append(text)
        return
    if tag == "img":
        alt = node.attrs.get("alt", "")
        src = node.attrs.get("src", "")
        out.append(f"![{alt}]({src})")
        return
    if tag in ("ul", "ol"):
        # nested lists keep their level: each sub-list line is indented
        # by the parent marker's width ("- " → 2, "1. " → 3), the
        # CommonMark continuation rule the Go library follows
        depth = ctx.get("list_depth", 0)
        out.append("\n\n" if depth == 0 else "\n")
        idx = 1
        sub_ctx = dict(ctx, list_depth=depth + 1)
        for c in node.children:
            if c.type == ELEMENT and c.tag == "li":
                marker = "- " if tag == "ul" else f"{idx}. "
                idx += 1
                inner = []
                for cc in c.children:
                    _convert(cc, inner, sub_ctx)
                lines = "".join(inner).strip().splitlines() or [""]
                indented = [lines[0]] + [
                    (" " * len(marker) + ln) if ln.strip() else "" for ln in lines[1:]
                ]
                out.append(marker + "\n".join(indented) + "\n")
        if depth == 0:
            out.append("\n")
        return
    if tag == "blockquote":
        inner = []
        for c in node.children:
            _convert(c, inner, ctx)
        quoted = "\n".join("> " + ln for ln in "".join(inner).strip().splitlines())
        out.append("\n\n" + quoted + "\n\n")
        return
    is_block = tag in _BLOCK
    if is_block:
        out.append("\n\n")
    for c in node.children:
        _convert(c, out, ctx)
    if is_block:
        out.append("\n\n")


def html_to_markdown(html_str: str) -> str:
    """HTMLToMarkdown (scrape.go:2196-2221)."""
    tree = parse_html(html_str)
    out: list[str] = []
    _convert(tree, out, {})
    r = "".join(out)
    r = re.sub(r"\n{3,}", "\n\n", r)
    r = "\n".join(ln.rstrip() if ln.strip() else "" for ln in r.split("\n")).strip()

    # exact post-processing port
    r = r.replace("�", " ")
    r = r.replace(" ", " ").replace(" ", " ").replace(" ", " ")
    r = _SPACE_BEFORE_NL.sub("\n", r)
    r = r.replace("* * *\n", "\n")
    r = _BLOCKQUOTE.sub("", r)
    r = r.replace("\\\n", "\n")
    r = r.replace("\n", "\n\n")
    r = _EXCESS_NL.sub("\n\n\n", r)
    return r.strip()


def get_markdown_string(e, nodes) -> str:
    """getMarkdownString (scrape.go:2181-2187)."""
    from .text import get_html_string

    html_str = get_html_string(e, nodes)
    if html_str == "":
        return html_str
    return html_to_markdown(html_str)
