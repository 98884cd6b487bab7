"""Generator merge-rule parity (G2/G4/G6) — the reference's unit vectors
(``/root/reference/generate/analyze_test.go``): CMS auto-class stripping,
BEM record-state modifier families, role-class non-merge, optional
picture wrappers, dateDominatedText."""

from __future__ import annotations

import pytest

from goskyr_spark.generate.analyzer import (
    GNode,
    LocationProps,
    check_and_update_loc_props,
    merge_location_prop,
    path_string,
)
from goskyr_spark.generate.configs import date_dominated_text, relative_location_selector


def lp(path, attr="", examples=None, text_index=0):
    return LocationProps(
        path=[GNode(t, list(c)) for t, c in path],
        attr=attr,
        examples=examples or ["x"],
        text_index=text_index,
    )


def test_varying_post_classes_merge():
    old = lp([("div", ["content-area", "post-1001", "product", "type-product", "status-publish"]),
              ("h1", ["product-title", "entry-title"])], examples=["Workshop A"])
    new = lp([("div", ["content-area", "post-2002", "product", "type-product", "status-publish"]),
              ("h1", ["product-title", "entry-title"])], examples=["Workshop B"])
    assert check_and_update_loc_props(old, new)
    assert old.count == 2
    classes = old.path[0].classes
    assert "content-area" in classes and "product" in classes
    assert "post-1001" not in classes and "post-2002" not in classes
    assert sorted(old.path[1].classes) == ["entry-title", "product-title"]


def test_beaver_builder_content_ids():
    old = lp([("div", ["fl-builder-content", "fl-builder-content-6725",
                       "fl-builder-global-templates-locked", "product"])], examples=["val1"])
    new = lp([("div", ["fl-builder-content", "fl-builder-content-8090",
                       "fl-builder-global-templates-locked", "product"])], examples=["val2"])
    assert check_and_update_loc_props(old, new)
    classes = old.path[0].classes
    assert "fl-builder-content" in classes and "product" in classes
    assert "fl-builder-content-6725" not in classes and "fl-builder-content-8090" not in classes


def test_drupal_view_ids():
    old = lp([("div", ["views-element-container"]),
              ("div", ["js-view-dom-id-c4784e6de400096e"]),
              ("a", ["website"])], attr="href", examples=["https://alice.example"])
    new = lp([("div", ["views-element-container"]),
              ("div", ["js-view-dom-id-58c08a4c74af54dc"]),
              ("a", ["website"])], attr="href", examples=["https://bob.example"])
    assert check_and_update_loc_props(old, new)
    assert old.count == 2
    assert old.path[1].classes == []


def test_record_state_bem_family_merges():
    locations: list = []
    for availability in ("yes", "limited", "no"):
        locations = merge_location_prop(locations, lp(
            [("article", ["practitioner-profile", "practice-availability-" + availability]),
             ("div", ["main"]), ("a", ["website"])],
            attr="href", examples=[f"https://{availability}.example"]))
    assert len(locations) == 1
    assert path_string(locations[0].path) == "article.practitioner-profile > div.main > a.website"
    assert locations[0].count == 3


def test_role_classes_do_not_merge():
    old = lp([("div", ["block", "header"]), ("a", ["link"])])
    new = lp([("div", ["block", "footer"]), ("a", ["link"])])
    assert not check_and_update_loc_props(old, new)


def test_optional_picture_wrapper():
    wrapped = lp([("article", ["card"]), ("div", ["media"]), ("picture", []),
                  ("img", ["el-image"])], attr="src", examples=["wrapped.jpg"])
    direct = lp([("article", ["card"]), ("div", ["media"]), ("img", ["el-image"])],
                attr="src", examples=["direct.jpg"])
    assert check_and_update_loc_props(wrapped, direct)
    assert path_string(wrapped.path) == "article.card > div.media > img.el-image"
    assert wrapped.count == 2
    assert len(wrapped.alternative_paths) == 1
    assert path_string(wrapped.alternative_paths[0]) == "article.card > div.media > picture > img.el-image"
    root = [GNode("article", ["card"])]
    assert relative_location_selector(wrapped, root) == (
        "div.media > img.el-image, div.media > picture > img.el-image"
    )


DDT_CASES = [
    ("Saturday, June 27, 2026 | 6 pm - 9 pm", True),
    ("17:00 PM – 21:00 PM (SAST)", True),
    ("Begins: Friday, 03-Jul-2026", True),
    ("2026-08-29 @10:00 AM - 2026-08-30@05:00 PM", True),
    ("Monday, June 15, 2026 6:00 - 7:30 pm CST", True),
    ("Development by Design | Singapore | July 7 - 10, 2026", False),
    ("Type, Teach, Transform through the 27 Enneagram Subtypes | Virtual | July 17-24, 2026", False),
    ("The Art of Enneagram Typing and Training | VIRTUAL | August 17 - 28, 2026", False),
    ("Join us on Saturday, June 27 for a wonderful workshop about the nine personality types and their wings", False),
    ("", False),
]


@pytest.mark.parametrize("text,want", DDT_CASES, ids=[c[0][:40] or "empty" for c in DDT_CASES])
def test_date_dominated_text(text, want):
    assert date_dominated_text(text) is want


def test_static_field_evidence_bounds_and_report():
    """analyze_test.go:388-447: evidence row 0 matches the 'Assessor'
    static location; chrome text never leaks into records."""
    from goskyr_spark.extract.record import PageDoc
    from goskyr_spark.generate.configs import GenOptions, configurations_with_evidence_report

    html = """<html><body><main class="directory">
<article class="person"><h2>Aga</h2><div class="role">Assessor</div><div class="chrome">Directory</div></article>
<article class="person"><h2>Ada</h2><div class="chrome">Directory</div></article>
<article class="person"><h2>Alex</h2><div class="chrome">Directory</div></article>
<article class="person"><h2>Ari</h2><div class="chrome">Directory</div></article>
</main></body></html>"""
    doc = PageDoc("https://example.com/trainers", html)
    opts = GenOptions(
        url="https://example.com/trainers",
        min_occs=(1,),
        min_records=2,
        only_varying_fields=True,
        static_field_evidence=[
            (["  Assessor\n"], 1),
            (["Directory", "Directory", "Directory"], 3),
            (["Mentor"], 1),
        ],
    ).init()
    configs, matched, unmatched = configurations_with_evidence_report(doc, opts)
    assert configs
    assert matched == [0]
    assert unmatched == [1, 2]
    for c in configs.values():
        for rec in getattr(c, "records", []) or []:
            assert "Directory" not in rec.values()


def test_static_field_evidence_requires_varying_mode():
    from goskyr_spark.generate.configs import GenOptions, configurations_with_evidence_report

    import pytest as _pytest

    with _pytest.raises(ValueError):
        configurations_with_evidence_report(
            None,
            GenOptions(only_varying_fields=False,
                       static_field_evidence=[(["Assessor"], 1)]),
        )


def test_find_clusters_does_not_mutate_root_backed_paths():
    """analyze_test.go:459-504."""
    from goskyr_spark.generate.selectors import find_clusters

    card_path = [GNode("body"), GNode("div", ["container"]),
                 GNode("div", ["main", "current"]),
                 GNode("article", ["card", "article"]),
                 GNode("div", ["card-body"]), GNode("div", ["name"])]
    root = card_path[:2]
    card = LocationProps(path=card_path, count=10, examples=["Abby"])
    form = LocationProps(
        path=[GNode("body"), GNode("div", ["container"]), GNode("form"), GNode("select")],
        count=10, examples=["filter"])
    clusters = find_clusters([card, form], root)
    key = "body > div.container > div.main.current"
    assert key in clusters, clusters.keys()
    assert card.path[2].string() == "div.main.current"  # not mutated
    assert path_string(clusters[key][0].path[: len(root) + 1]) == key


def test_squash_preserves_positional_sibling_alternatives():
    """analyze_test.go:506-541."""
    from goskyr_spark.generate.analyzer import squash_location_manager

    lps = []
    for record in (1, 2):
        for paragraph in (1, 2, 3):
            lps.append(LocationProps(
                text_index=0,
                path=[GNode("body"),
                      GNode("div", ["card"], [f"nth-child({record})"]),
                      GNode("p", [], [f"nth-child({paragraph})"])],
                count=1,
                examples=[f"record {record} paragraph {paragraph}"]))
    got = squash_location_manager(lps, 2)
    by_path = {path_string(lp.path): lp.count for lp in got}
    assert by_path.get("body > div.card > p") == 6, by_path
    for paragraph in (1, 2, 3):
        assert by_path.get(f"body > div.card > p:nth-child({paragraph})") == 2, by_path
    assert "body > div.card:nth-child(1) > p" not in by_path


def test_extend_page_config_records_with_next():
    """R7 (generate.go:872-964): next-page records appended; paginators
    that produce nothing are dropped; with no fetcher (the reference's
    own dead-cache state) everything degrades to empty paginators."""
    from goskyr_spark.config.model import Config
    from goskyr_spark.extract.record import PageDoc
    from goskyr_spark.generate.pipeline import extend_page_config_records_with_next

    yml = """
id:
  slug: x-com
  id: n01a
scrapers:
  - url: https://x.com/list
    selector: article
    fields:
      - name: t
        location:
          selector: h2
    paginators:
      - location:
          selector: a.next
          attr: href
      - location:
          selector: a.dead
          attr: href
"""
    page1 = ('<html><body><article><h2>A</h2></article>'
             '<a class="next" href="/list2">Next</a>'
             '<a class="dead" href="/nowhere">x</a></body></html>')
    page2 = "<html><body><article><h2>B</h2></article></body></html>"

    def get_page(url):
        if url.endswith("/list2"):
            return page2
        return None

    cfg = Config.from_yaml(yml)
    cfg.records = [{"t": "A"}]
    doc = PageDoc("https://x.com/list", page1)
    extend_page_config_records_with_next(cfg, doc, get_page)
    assert [r["t"] for r in cfg.records] == ["A", "B"]
    assert len(cfg.scrapers[0].paginators) == 1
    assert cfg.scrapers[0].paginators[0].location.selector == "a.next"

    # reference parity mode: dead fetch map → no extension, paginators cleared
    cfg2 = Config.from_yaml(yml)
    cfg2.records = []
    extend_page_config_records_with_next(cfg2, PageDoc("https://x.com/list", page1), None)
    assert cfg2.scrapers[0].paginators == []


def test_compact_config_id_preserved():
    """config_id_test.go: compact mode survives strategy replacement and
    renders without the slug."""
    from goskyr_spark.config.model import ConfigID
    from goskyr_spark.generate.configs import GenOptions, _replace_strategy_prefix

    cid = ConfigID(slug="example-com", id="n10a").with_compact(True)
    assert str(_replace_strategy_prefix(cid, "s")) == "s10a"

    opts = GenOptions(url="https://example.com/events",
                      config_id=ConfigID().with_compact(True)).init()
    opts.config_id.id = "n5"
    assert str(opts.config_id) == "n5"

    default = GenOptions(url="https://example.com/events").init()
    default.config_id.id = "n5"
    assert str(default.config_id) == default.config_id.slug + "__n5"
