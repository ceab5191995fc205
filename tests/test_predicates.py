"""Tier-1 predicate parity — golden cases from reference src/utils.rs tests."""

from dce_spark.core.predicates import (
    has_long_encoded_token,
    is_non_content_text,
    punctuation_ratio,
    should_skip_element,
)


def test_non_content_blobs():
    # src/utils.rs:528-538
    assert is_non_content_text(
        ".xboost-cart-slide { background: rgba(0, 0, 0, 0.5); position: fixed;"
        " right: 0; top: 0; bottom: 0; left: 0; z-index: 2000;"
        " justify-content: flex-end; }"
    )
    assert is_non_content_text(
        "window.yaContextCb.push(function () { Ya.adfoxCode.createAdaptive({"
        " ownerId: 173858, containerId: 'adfox_151179074300466320', params:"
        " { p1: 'csljp', p2: 'hjrx' } }); });"
    )
    assert is_non_content_text(
        'window.cartSettings = {"data":"eyJnbG9iYWxfd2lkZ2V0X3RoZW1lX2NvbG9y'
        "IjoiI0U5NUM1QSIsImdsb2JhbF93aWRnZXRfc2Vjb25kYXJ5X2J1dHRvbl9iZ19ob3Zl"
        'cl9jb2xvciI6IiNmZmZmZmYiLCJzdGlja3lfY2FydF9pY29uX2NvbG9yIjoiI0ZBRjVGNSJ9"};'
    )


def test_non_content_keeps_prose():
    # src/utils.rs:541-554
    assert not is_non_content_text(
        '{"@context":"https://schema.org","@type":"Organization"}'
    )
    assert not is_non_content_text(
        "This article mentions window dressing, documents, and functions in prose."
    )
    assert not is_non_content_text(
        "Call document.querySelector() to select an element, then pass the"
        " result to a function."
    )
    assert not is_non_content_text("Function follows form in this design document.")


def test_non_content_edges():
    assert is_non_content_text("")
    assert is_non_content_text("   \n\t  ")
    assert not is_non_content_text("short text")


def test_punctuation_ratio():
    assert punctuation_ratio("") == 0.0
    assert punctuation_ratio("abcd") == 0.0
    assert punctuation_ratio("{}[]") == 1.0
    assert abs(punctuation_ratio("ab{}") - 0.5) < 1e-9


def test_long_encoded_token():
    assert has_long_encoded_token("x" * 96)
    assert not has_long_encoded_token("x" * 95)
    assert has_long_encoded_token("prefix " + "A1+/_-=" * 14 + " suffix")
    assert not has_long_encoded_token("a b " * 100)


def test_should_skip_tags():
    # src/utils.rs:125-130
    for t in ("script", "noscript", "style", "svg", "template", "canvas", "iframe"):
        assert should_skip_element(t, {})
    assert not should_skip_element("div", {})
    assert not should_skip_element("article", None)


def test_should_skip_attrs():
    # src/utils.rs:133-186 + tests :557-582
    assert should_skip_element("div", {"hidden": ""})
    assert should_skip_element("div", {"aria-hidden": "true"})
    assert should_skip_element("div", {"aria-hidden": "TRUE"})
    assert not should_skip_element("div", {"aria-hidden": "false"})
    assert should_skip_element("div", {"style": "display: none"})
    assert should_skip_element("div", {"style": "VISIBILITY:HIDDEN"})
    assert not should_skip_element("div", {"style": "display:block"})
    assert should_skip_element("div", {"class": "hidden"})
    assert should_skip_element("div", {"class": "a sr-only b"})
    assert should_skip_element("span", {"class": "invisible"})
    # token-based: no false positive on substrings (src/utils.rs:148-152)
    assert not should_skip_element("div", {"class": "menu-hidden-link"})
    # marker substrings on class+id, ascii-lowercased
    assert should_skip_element("div", {"class": "sharedaddy"})
    assert should_skip_element("div", {"id": "jp-relatedposts-1"})
    assert should_skip_element("div", {"class": "ADS__banner"})
    assert should_skip_element("div", {"class": "x", "id": "adfox_123"})
    assert should_skip_element("div", {"data-content": "webR"})
    assert not should_skip_element("div", {"data-content": "other"})


def test_non_content_fast_path_differential():
    """The prose fast path (p_ratio <= 0.12 and no code delimiter ->
    False) must be observationally identical to the unshortcut rule
    set. Re-derive the full classifier inline and fuzz-compare."""
    import random

    from dce_spark.core.predicates import (
        _AD_SCRIPT_MARKERS,
        _JS_API_MARKERS,
        _THR_012,
        _THR_016,
        _THR_018,
        has_long_encoded_token,
        is_non_content_text,
        punctuation_ratio,
    )
    from dce_spark.core.textnorm import ascii_lower, rust_trim

    def reference(text):  # the pre-fast-path formulation, verbatim
        trimmed = rust_trim(text)
        if not trimmed:
            return True
        length = len(trimmed)
        looks_like_css_block = False
        if trimmed[0] in ".#@" and "{" in trimmed and "}" in trimmed:
            head = ascii_lower(trimmed[:7])
            looks_like_css_block = (
                head.startswith(".") or head.startswith("#")
                or head.startswith("@media") or head.startswith("@import")
            )
        if looks_like_css_block and (
            length >= 80 or punctuation_ratio(trimmed) > _THR_018
        ):
            return True
        if length < 80:
            return False
        lower = ascii_lower(trimmed)
        assignment_count = (
            lower.count(" = ") + lower.count('="') + lower.count("='")
            + lower.count("={") + lower.count("=[")
        )
        call_count = (
            lower.count("function(") + lower.count("function (")
            + lower.count("=>") + lower.count(");") + lower.count("});")
        )
        js_api = sum(1 for m in _JS_API_MARKERS if m in lower)
        ad = sum(1 for m in _AD_SCRIPT_MARKERS if m in lower)
        p_ratio = punctuation_ratio(trimmed)
        delims = "{" in trimmed or "}" in trimmed or ";" in trimmed
        has_js_assignment = (
            "window." in lower and assignment_count > 0 and delims
        )
        blob = (
            p_ratio > _THR_012
            and (
                (js_api >= 2 and call_count > 0)
                or (js_api >= 1 and assignment_count >= 2)
                or (ad >= 1 and (call_count > 0 or assignment_count > 0))
            )
        ) or (ad >= 2 and delims)
        if blob:
            return True
        if (
            p_ratio > _THR_016 and (assignment_count > 0 or "window." in lower)
        ) or has_js_assignment:
            return has_long_encoded_token(trimmed)
        return False

    rng = random.Random(7)
    frags = [
        "plain prose about markets and policy outcomes here ",
        "window.dataLayer = window.dataLayer || []; ",
        "function(){return 1;} ", ".cls{color:red} ", "@media screen ",
        "adfox ", "gtag('config'); ", "a=1;b=2; ", "== => );} ",
        "A" * 100, "x" * 40 + "= ", "; ", "{", "}", "   ", "",
    ]
    cases = ["".join(rng.choice(frags) for _ in range(rng.randrange(1, 6)))
             for _ in range(3000)]
    cases += frags
    for c in cases:
        assert is_non_content_text(c) == reference(c), repr(c[:120])
