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
