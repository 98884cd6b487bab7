"""Auto-config generation, stage 2: shared root selector + clusters
(G5, G7 grouping).

* findSharedRootSelector ← ``/root/reference/generate/analyze.go:181-258``
* pullBackRootSelector   ← ``/root/reference/generate/analyze.go:262-355``
* findClusters           ← ``/root/reference/generate/analyze.go:1042-1132``
"""

from __future__ import annotations

from ..extract.record import PageDoc
from ..htmlx import css
from .analyzer import GNode, LocationProps, path_string, structural_match


def _find_count(doc: PageDoc, selector: str) -> int:
    """gqdoc.Document.Selection.Find(sel).Filter(sel).Length()."""
    try:
        return len(doc.find(selector))
    except css.SelectorError:
        return 0


def pull_back_root_selector(root_sel: list[GNode], doc: PageDoc, count: int) -> list[GNode]:
    """analyze.go:262-355."""
    ret = list(root_sel)
    prev = ret
    if not ret:
        return ret

    candidates = []
    test_ret = ret
    while len(test_ret) > 3:
        test_str = path_string(test_ret)
        test_len = _find_count(doc, test_str)
        if test_len > 0 and (count % test_len == 0 or test_len == count):
            candidates.append((list(test_ret), test_len))
        test_ret = test_ret[:-1]

    for cand_path, cand_count in candidates:
        if cand_path and cand_path[-1].tag == "div":
            ratio = cand_count // count
            if ratio == 1 or (1 < ratio < 20):
                return cand_path

    while True:
        ret_str = path_string(ret)
        sel_len = _find_count(doc, ret_str)
        if sel_len == count:
            return ret
        if count == 0 or sel_len % count != 0:
            return prev
        if not ret:
            break
        prev = ret
        ret = ret[:-1]
    return ret


def find_shared_root_selector(doc: PageDoc, lps: list[LocationProps]) -> list[GNode]:
    """analyze.go:181-258: lockstep walk merging via structural match."""
    if len(lps) == 1:
        return pull_back_root_selector(lps[0].path, doc, lps[0].count)
    merged_path: list[GNode] = []
    i = 0
    while True:
        merged = None
        for j, lp in enumerate(lps):
            if i + 1 == len(lp.path):
                return pull_back_root_selector(merged_path, doc, lp.count)
            if j == 0:
                merged = lp.path[i]
            else:
                ok, m = structural_match(merged, lp.path[i])
                if not ok:
                    return pull_back_root_selector(merged_path, doc, lp.count)
                merged = m
        merged_path.append(merged)
        i += 1


def find_clusters(lps: list[LocationProps], root_selector: list[GNode]) -> dict[str, list[LocationProps]]:
    """analyze.go:1042-1132: group by structural match at depth root+1."""
    new_len = len(root_selector) + 1
    groups: list[tuple[GNode, list[LocationProps]]] = []
    for lp in lps:
        if new_len > len(lp.path):
            continue
        cnode = lp.path[new_len - 1]
        matched = False
        for gi in range(len(groups)):
            ok, m = structural_match(groups[gi][0], cnode)
            if ok:
                groups[gi] = (m, groups[gi][1] + [lp])
                matched = True
                break
        if not matched:
            groups.append((cnode, [lp]))
    rets: dict[str, list[LocationProps]] = {}
    for merged, members in groups:
        key = path_string(list(root_selector) + [merged])
        rets[key] = members
    return rets
