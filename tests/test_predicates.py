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
