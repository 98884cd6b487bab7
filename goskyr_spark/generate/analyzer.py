"""Auto-config generation, stage 1: page analysis (G1-G4, G12).

Port of the reference's streaming-tokenizer analyzer to an event walk
over our parsed DOM (equivalent: the reference tokenizes the re-rendered
normalized document, and our tree IS that document):

* ``Analyzer``            ← ``/root/reference/generate/parse.go:193-384``
* squash / merge rules    ← ``/root/reference/generate/analyze.go:567-942``
* min-count/static filter ← ``/root/reference/generate/analyze.go:945-1038``
* CRC32 field names       ← ``/root/reference/generate/locationprops.go:86-99``

Faithfully replicated quirks (verified against reference behavior):
* the parent's sibling list is RESET when a non-void child element
  starts (``parse.go:319`` writes ``ChildNodes[p] = []node{}`` with the
  pre-push path key) — so nth-child pseudo-classes effectively only
  arise from runs of void siblings; none of the 28 golden configs
  contain nth-child;
* the pagination <a> capture fires at the FIRST end tag after the
  anchor opens, with the then-current node path (``parse.go:273-289``);
* end tags pop until the matching tag, deleting counters keyed by the
  path string computed at entry (``parse.go:291-304``);
* text nodes increment the child counter even when whitespace-only,
  but script/style/noscript text is skipped entirely
  (``parse.go:224-250``, ``scrape/scrape.go:1853-1857``).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field as dc_field

from ..htmlx.parser import ELEMENT, TEXT, Node

SKIP_TAG = {"noscript", "script", "style"}
# tags handled by the reference's SelfClosingTagToken branch (parse.go:347-381)
SELF_CLOSING_HANDLED = {"br", "input", "img", "link"}
VOID_FOR_EVENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_SPACES_RE = re.compile(r"\s+")

ALLOWED_ATTRS = {"a": ("aria-label", "href"), "img": ("src",)}


@dataclass
class GNode:
    tag: str
    classes: list[str] = dc_field(default_factory=list)
    pseudo: list[str] = dc_field(default_factory=list)

    def string(self) -> str:
        """node.string (parse.go:26-43): tag.classes:pseudo with CSS escapes."""
        r = self.tag
        for cl in self.classes:
            cl = cl.replace(":", "\\:").replace(">", "\\>").replace("@", "\\@")
            if cl and cl[0].isdigit():
                cl = "\\3" + cl
            r += "." + cl
        if self.pseudo:
            r += ":" + ":".join(self.pseudo)
        return r

    def clone(self) -> "GNode":
        return GNode(self.tag, list(self.classes), list(self.pseudo))


def intersect_strings(a: list[str], b: list[str]) -> list[str]:
    if not a or not b:
        return []
    bs = set(b)
    return [s for s in a if s in bs]


def structural_modifier_family(cl: str) -> str:
    """parse.go:108-119."""
    sep = max(cl.rfind("-"), cl.rfind("_"))
    if sep <= 0 or sep == len(cl) - 1:
        return ""
    stem = cl[:sep].rstrip("-_")
    is_bem = sep > 0 and cl[sep - 1] == cl[sep]
    if not is_bem and not any(c in stem for c in "-_"):
        return ""
    return cl[: sep + 1]


def same_structural_modifier_family(classes, other, shared) -> bool:
    if len(classes) != len(shared) + 1 or len(other) != len(shared) + 1:
        return False

    def unshared(cs):
        for c in cs:
            if c not in shared:
                return c
        return ""

    fam = structural_modifier_family(unshared(classes))
    return fam != "" and fam == structural_modifier_family(unshared(other))


def merge_structural_classes(classes, other):
    """parse.go:65-80 → (shared, ok)."""
    if not classes and not other:
        return [], True
    shared = intersect_strings(classes, other)
    if not shared:
        return None, False
    if 2 * len(shared) > len(classes) or 2 * len(shared) > len(other):
        return shared, True
    if same_structural_modifier_family(classes, other, shared):
        return shared, True
    return None, False


def structural_match(n: GNode, n2: GNode):
    """parse.go:47-60 → (ok, merged)."""
    if n.tag != n2.tag:
        return False, None
    shared, ok = merge_structural_classes(n.classes, n2.classes)
    if not ok:
        return False, None
    return True, GNode(n.tag, shared, intersect_strings(n.pseudo, n2.pseudo))


def path_string(p: list[GNode]) -> str:
    return " > ".join(n.string() for n in p)


def path_string_without_nth_child(p: list[GNode]) -> str:
    """analyze.go:602-612 (NOTE: no CSS escaping here, per the reference)."""
    return " > ".join(n.tag + "".join("." + c for c in n.classes) for n in p)


@dataclass
class LocationProps:
    path: list[GNode]
    examples: list[str]
    attr: str = ""
    text_index: int = 0
    count: int = 1
    name: str = ""
    i_strip: int = 0
    is_text: bool = False
    alternative_paths: list[list[GNode]] = dc_field(default_factory=list)

    def clone(self) -> "LocationProps":
        out = LocationProps(
            path=[n.clone() for n in self.path],
            examples=list(self.examples),
            attr=self.attr,
            text_index=self.text_index,
            count=self.count,
            name=self.name,
            i_strip=self.i_strip,
            is_text=self.is_text,
            alternative_paths=[[n.clone() for n in ap] for ap in self.alternative_paths],
        )
        return out


def make_location_props(node_path: list[GNode], example: str, is_text: bool) -> LocationProps:
    return LocationProps(path=[n.clone() for n in node_path], examples=[example], is_text=is_text)


# ---- event stream over the parsed DOM (== tokenizing the rendered doc) ----


def dom_events(root: Node):
    """Yield ('start'|'selfclose', tag, attrs) / ('text', data, None) /
    ('end', tag, None) in document order, mirroring x/net/html's
    tokenizer over the rendered tree (void elements render
    self-closing)."""
    def walk(el: Node):
        for ch in el.children:
            if ch.type == ELEMENT:
                if ch.tag in VOID_FOR_EVENTS:
                    yield ("selfclose", ch.tag, ch.attrs)
                else:
                    yield ("start", ch.tag, ch.attrs)
                    yield from walk(ch)
                    yield ("end", ch.tag, None)
            elif ch.type == TEXT:
                yield ("text", ch.text, None)

    yield from walk(root)


def tag_metadata(tag: str, attrs: dict, sibling_nodes: list[GNode]):
    """getTagMetadata (parse.go:390-434). Attr iteration is sorted for
    determinism (the reference iterates a Go map)."""
    out_attrs = {}
    cls: list[str] = []
    if tag != "body":
        v = (attrs.get("class") or "").strip()
        if v:
            cls = [c for c in _SPACES_RE.split(v) if c and "." not in c]
        allowed = ALLOWED_ATTRS.get(tag)
        if allowed:
            for k in allowed:
                if k in attrs:
                    out_attrs[k] = (attrs.get(k) or "").strip()
    pcls: list[str] = []
    this = GNode(tag, cls)
    for sib in sibling_nodes:
        ok, _ = structural_match(sib, this)
        if ok:
            pcls = [f"nth-child({len(sibling_nodes) + 1})"]
            break
    return out_attrs, cls, pcls


class Analyzer:
    """parse.go:193-384, as a replayable event consumer."""

    def __init__(self, find_next: bool):
        self.loc_man: list[LocationProps] = []
        self.pag_man: list[LocationProps] = []
        self.next_paths: list[LocationProps] = []
        self.num_children: dict[str, int] = {}
        self.child_nodes: dict[str, list[GNode]] = {}
        self.node_path: list[GNode] = []
        self.depth = 0
        self.in_body = False
        self.find_next = find_next
        self._a_attrs: dict | None = None
        self._a_text: list[str] | None = None

    def parse(self, root: Node) -> None:
        for kind, a, b in dom_events(root):
            if not self._token(kind, a, b):
                break

    # one token; returns keep-going
    def _token(self, kind: str, arg, attrs) -> bool:
        if kind == "text":
            if not self.in_body:
                return True
            if not self.node_path:
                return True
            name = self.node_path[-1].tag
            if name in SKIP_TAG:
                return True
            p = path_string(self.node_path)
            text = arg
            trimmed = text.strip()
            if trimmed:
                lp = make_location_props(self.node_path, trimmed, True)
                lp.text_index = self.num_children.get(p, 0)
                self.loc_man.append(lp)
            self.num_children[p] = self.num_children.get(p, 0) + 1
            if self._a_attrs is not None:
                self._a_text.append(text)
            return True

        if kind in ("start", "end"):
            name = arg
            if name == "body":
                self.in_body = not self.in_body
            if not self.in_body:
                return True
            p = path_string(self.node_path)

            if name in ("br", "input"):
                self.num_children[p] = self.num_children.get(p, 0) + 1
                self.child_nodes.setdefault(p, []).append(GNode(name))
                return True

            if kind == "end":
                if self._a_attrs is not None:
                    href = self._a_attrs.get("href", "")
                    lp = make_location_props(self.node_path, href, False)
                    if (self._a_attrs.get("aria-label") or "").lower() == "next":
                        self.next_paths.append(lp)
                    elif "".join(self._a_text).lower() == "next":
                        self.next_paths.append(lp)
                    else:
                        self.pag_man.append(lp)
                    self._a_attrs = None
                    self._a_text = None

                n = True
                while n and self.depth > 0:
                    if self.node_path[-1].tag == name:
                        if name == "body":
                            return False
                        n = False
                    self.num_children.pop(p, None)
                    self.child_nodes.pop(p, None)
                    self.node_path.pop()
                    self.depth -= 1
                return True

            # start tag
            a_attrs, cls, pcls = tag_metadata(name, attrs, self.child_nodes.get(p, []))
            self.num_children[p] = self.num_children.get(p, 0) + 1
            self.child_nodes.setdefault(p, []).append(GNode(name, cls))
            self.node_path.append(GNode(name, cls, pcls))
            self.depth += 1
            # reference quirk (parse.go:319): resets the PARENT's sibling
            # list right after pushing the child
            self.child_nodes[p] = []

            for k in sorted(a_attrs):
                lp = make_location_props(self.node_path, a_attrs[k], False)
                lp.attr = k
                self.loc_man.append(lp)

            if self.find_next and name == "a" and a_attrs.get("href"):
                self._a_attrs = a_attrs
                self._a_text = []
            return True

        # selfclose (parse.go:347-381)
        if not self.in_body:
            return True
        name = arg
        if name not in SELF_CLOSING_HANDLED:
            return True
        p = path_string(self.node_path)
        a_attrs, cls, pcls = tag_metadata(name, attrs, self.child_nodes.get(p, []))
        self.num_children[p] = self.num_children.get(p, 0) + 1
        self.child_nodes.setdefault(p, []).append(GNode(name, cls))
        if not a_attrs:
            return True
        tmp = [n.clone() for n in self.node_path] + [GNode(name, cls, pcls)]
        for k in sorted(a_attrs):
            lp = LocationProps(path=[n.clone() for n in tmp], examples=[a_attrs[k]], is_text=False)
            lp.attr = k
            self.loc_man.append(lp)
        return True


# ---- squash (analyze.go:567-942) ----

AUTO_GENERATED_CLASS_RE = re.compile(
    r"^(?:post-\d+|postid-\d+|page-id-\d+|attachment-\d+|fl-builder-content-\d+|"
    r"js-view-dom-id-[0-9a-fA-F]+|\d+)$"
)


def filter_auto_generated_classes(classes: list[str]) -> list[str]:
    return [c for c in classes if not AUTO_GENERATED_CLASS_RE.match(c)]


def count_paths_ignoring_nth_child(lps: list[LocationProps]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for lp in lps:
        k = path_string_without_nth_child(lp.path)
        counts[k] = counts.get(k, 0) + 1
    return counts


def strip_nth_child(lp: LocationProps, min_occ: int, path_counts: dict[str, int]) -> None:
    """analyze.go:686-720."""
    total = path_counts.get(path_string_without_nth_child(lp.path), 0)
    if total >= min_occ:
        for i in range(len(lp.path)):
            if lp.path[i].pseudo:
                lp.path[i].pseudo = []
                if lp.i_strip == 0:
                    lp.i_strip = i
        return

    i_strip = 0
    sub = 2 if min_occ < 6 else 1
    for i in range(len(lp.path) - sub, -1, -1):
        if i < i_strip:
            lp.path[i].pseudo = []
        elif lp.path[i].pseudo:
            nc_index = int(lp.path[i].pseudo[0].split("(")[1].replace(")", ""))
            if nc_index >= min_occ:
                lp.path[i].pseudo = []
                i_strip = i
                lp.i_strip = i_strip


def positional_nth_child_variant(lp: LocationProps, min_occ: int, path_counts) -> LocationProps | None:
    """analyze.go:630-654."""
    if lp is None or path_counts.get(path_string_without_nth_child(lp.path), 0) < min_occ:
        return None
    preserve = -1
    for i in range(len(lp.path) - 1, -1, -1):
        if lp.path[i].pseudo:
            preserve = i
            break
    if preserve == -1:
        return None
    variant = lp.clone()
    for j in range(len(variant.path)):
        if j != preserve:
            variant.path[j].pseudo = []
    variant.i_strip = preserve - 1 if preserve > 0 else -1
    return variant


def merge_optional_path_node(a: GNode, b: GNode):
    if a.tag != b.tag or a.pseudo != b.pseudo:
        return None, False
    classes, ok = merge_structural_classes(
        filter_auto_generated_classes(a.classes), filter_auto_generated_classes(b.classes)
    )
    if not ok:
        return None, False
    return GNode(a.tag, classes, list(a.pseudo)), True


def merge_same_length_path(p1: list[GNode], p2: list[GNode]):
    if len(p1) != len(p2):
        return None, False
    merged = []
    for a, b in zip(p1, p2):
        m, ok = merge_optional_path_node(a, b)
        if not ok:
            return None, False
        merged.append(m)
    return merged, True


def merge_optional_picture_paths(first: list[GNode], second: list[GNode]):
    """analyze.go:817-856: absorb an optional <picture> wrapper."""
    short, long_ = (first, second) if len(first) <= len(second) else (second, first)
    if len(long_) != len(short) + 1:
        return None, None, False
    wrapper = -1
    for i in range(1, len(long_) - 1):
        if long_[i].tag == "picture" and long_[i + 1].tag == "img" and short[i].tag == "img":
            wrapper = i
            break
    if wrapper == -1:
        return None, None, False
    merged_short, merged_long = [], []
    for si, snode in enumerate(short):
        li = si + 1 if si >= wrapper else si
        m, ok = merge_optional_path_node(snode, long_[li])
        if not ok:
            return None, None, False
        merged_short.append(m)
        if si == wrapper - 1:
            merged_long.extend([m, long_[wrapper]])
            continue
        merged_long.append(m)
    return merged_short, merged_long, True


def merge_alternative_path(alts: list[list[GNode]], cand: list[GNode]) -> list[list[GNode]]:
    for i, alt in enumerate(alts):
        merged, ok = merge_same_length_path(alt, cand)
        if ok:
            alts[i] = merged
            return alts
    return alts + [[n.clone() for n in cand]]


def rebase_optional_picture_paths(canonical: list[GNode], alts: list[list[GNode]]) -> list[list[GNode]]:
    rebased: list[list[GNode]] = []
    for alt in alts:
        _, reb, ok = merge_optional_picture_paths(canonical, alt)
        if not ok:
            rebased.append([n.clone() for n in alt])
            continue
        rebased = merge_alternative_path(rebased, reb)
    return rebased


def check_and_update_loc_props(old: LocationProps, new: LocationProps) -> bool:
    """analyze.go:724-815."""
    if old.text_index != new.text_index or old.attr != new.attr:
        return False
    if len(old.path) != len(new.path):
        short, long_, ok = merge_optional_picture_paths(old.path, new.path)
        if not ok:
            return False
        old.path = short
        old.alternative_paths = merge_alternative_path(old.alternative_paths, long_)
        for ap in new.alternative_paths:
            old.alternative_paths = merge_alternative_path(old.alternative_paths, ap)
        old.alternative_paths = rebase_optional_picture_paths(old.path, old.alternative_paths)
        old.count += 1
        old.examples.extend(new.examples)
        return True

    new_path: list[GNode] = []
    for i, on in enumerate(old.path):
        if on.tag != new.path[i].tag:
            return False
        pseudo_tmp = new.path[i].pseudo if i > old.i_strip else []
        if len(on.pseudo) != len(pseudo_tmp):
            return False
        if len(on.pseudo) == 1 and on.pseudo[0] != pseudo_tmp[0]:
            return False
        node = GNode(on.tag, [], list(on.pseudo))
        if not on.classes and not new.path[i].classes:
            new_path.append(node)
            continue
        old_f = filter_auto_generated_classes(on.classes)
        new_f = filter_auto_generated_classes(new.path[i].classes)
        if not old_f and not new_f:
            new_path.append(node)
            continue
        shared, ok = merge_structural_classes(old_f, new_f)
        if not ok:
            return False
        node.classes = shared
        new_path.append(node)

    old.path = new_path
    for ap in new.alternative_paths:
        old.alternative_paths = merge_alternative_path(old.alternative_paths, ap)
    old.alternative_paths = rebase_optional_picture_paths(old.path, old.alternative_paths)
    old.count += 1
    old.examples.extend(new.examples)
    return True


def merge_location_prop(lst: list[LocationProps], lp: LocationProps) -> list[LocationProps]:
    for existing in lst:
        if check_and_update_loc_props(existing, lp):
            return lst
    lst.append(lp)
    return lst


def squash_location_manager(lps: list[LocationProps], min_occ: int) -> list[LocationProps]:
    """analyze.go:567-587 — iterates the raw list BACKWARDS."""
    path_counts = count_paths_ignoring_nth_child(lps)
    squashed: list[LocationProps] = []
    positional: list[LocationProps] = []
    for i in range(len(lps) - 1, -1, -1):
        lp = lps[i]
        variant = positional_nth_child_variant(lp, min_occ, path_counts)
        if variant is not None:
            positional = merge_location_prop(positional, variant)
        stripped = lp.clone()
        strip_nth_child(stripped, min_occ, path_counts)
        squashed = merge_location_prop(squashed, stripped)
    return squashed + positional


# ---- filters + naming ----


def filter_below_min_count(lps: list[LocationProps], min_count: int) -> list[LocationProps]:
    return [lp for lp in lps if lp.count >= min_count]


def location_props_varies(lp: LocationProps) -> bool:
    if lp is None or not lp.examples:
        return False
    return any(ex != lp.examples[0] for ex in lp.examples)


def normalize_evidence_value(v: str) -> str:
    return " ".join(v.split())


def normalize_evidence_values(vs) -> list[str]:
    return sorted(normalize_evidence_value(v) for v in vs)


def evidence_matches_location(row, lp: LocationProps) -> bool:
    values, count = row
    if lp is None or lp.count != count or len(lp.examples) != len(values):
        return False
    return normalize_evidence_values(lp.examples) == normalize_evidence_values(values)


def filter_static_fields(lps: list[LocationProps], evidence=None):
    """analyze.go:970-1000. evidence: list of (values, occurrence_count)."""
    evidence = evidence or []
    kept = []
    matched = [False] * len(evidence)
    for lp in lps:
        if location_props_varies(lp):
            kept.append(lp)
            continue
        keep = False
        for i, row in enumerate(evidence):
            if evidence_matches_location(row, lp):
                matched[i] = True
                keep = True
        if keep:
            kept.append(lp)
    return kept, matched


def set_field_names(lps: list[LocationProps]) -> list[LocationProps]:
    """locationprops.go:86-99: F%x-%s-%d over CRC32-IEEE of the path
    string; panics on hash collisions; sorted by name."""
    hashes: dict[int, str] = {}
    for lp in lps:
        ps = path_string(lp.path)
        h = zlib.crc32(ps.encode())
        if h in hashes and hashes[h] != ps:
            raise RuntimeError(f"duplicate hash {h} for field {ps!r}")
        hashes[h] = ps
        lp.name = f"F{h:x}-{lp.attr}-{lp.text_index}"
    lps.sort(key=lambda lp: lp.name)
    return lps


def analyze_page(root: Node, min_occ: int, find_next: bool,
                 only_varying_fields: bool = True, evidence=None):
    """analyzePage (analyze.go:33-177) without the UI branch.

    Returns (lps, pag_props, evidence_matched)."""
    a = Analyzer(find_next=find_next)
    a.parse(root)
    loc_man = squash_location_manager(a.loc_man, min_occ)
    pag_man = squash_location_manager(a.pag_man, 3)
    loc_man = set_field_names(loc_man)
    loc_man = filter_below_min_count(loc_man, min_occ)
    pag_man = filter_below_min_count(pag_man, 3)
    matched = []
    if only_varying_fields:
        loc_man, matched = filter_static_fields(loc_man, evidence)
        pag_man, _ = filter_static_fields(pag_man)
    if not loc_man:
        return [], [], matched
    return loc_man, a.next_paths + pag_man, matched
