"""HTML5-lite tree builder behavior tests."""

from dce_spark.core.htmlparse import KIND_ELEMENT, KIND_TEXT, parse_html


def tags(doc):
    return [doc.tag[i] for i in range(len(doc)) if doc.kind[i] == KIND_ELEMENT]


def texts(doc):
    return [doc.text[i] for i in range(len(doc)) if doc.kind[i] == KIND_TEXT]


def test_body_always_exists():
    # reference src/utils.rs:477-496: parser always provides a body
    for html in ["", "<div>No body here</div>", "<<<>>>", "Plain text",
                 "<html><div>No explicit body</div></html>"]:
        doc = parse_html(html)
        assert len(doc) >= 1
        assert doc.tag[0] == "body"
        assert doc.parent[0] == -1


def test_head_content_dropped():
    doc = parse_html(
        "<html><head><title>T</title><script>var x=1;</script>"
        "<style>.a{}</style></head><body><p>hi</p></body></html>"
    )
    assert "title" not in tags(doc)
    assert all("var x" not in (t or "") for t in texts(doc))
    assert "hi" in "".join(texts(doc))


def test_implied_p_close():
    doc = parse_html("<body><p>one<p>two<div>three</div>")
    # both p's are siblings under body, div is a sibling too
    t = tags(doc)
    assert t == ["body", "p", "p", "div"]
    p_nodes = [i for i in range(len(doc)) if doc.tag[i] == "p"]
    assert doc.parent[p_nodes[0]] == 0
    assert doc.parent[p_nodes[1]] == 0


def test_unclosed_p_closed_by_end_div():
    # test_1.html's  "<p>Even more huge paragraph </div>" shape
    doc = parse_html("<body><div><p>text</div><span>after</span>")
    span = next(i for i in range(len(doc)) if doc.tag[i] == "span")
    assert doc.parent[span] == 0  # span is child of body, not of p/div


def test_li_implied_close():
    doc = parse_html("<body><ul><li>a<li>b<li>c</ul>")
    lis = [i for i in range(len(doc)) if doc.tag[i] == "li"]
    assert len(lis) == 3
    ul = next(i for i in range(len(doc)) if doc.tag[i] == "ul")
    assert all(doc.parent[i] == ul for i in lis)


def test_empty_p_on_stray_end_tag():
    # spec: </p> with no open p inserts an empty p element
    doc = parse_html("<body><div></p></div>")
    assert "p" in tags(doc)


def test_end_br_inserts_br():
    doc = parse_html("<body>a</br>b")
    assert "br" in tags(doc)


def test_void_elements_do_not_nest():
    doc = parse_html("<body><img src='x'>text<br>more")
    img = next(i for i in range(len(doc)) if doc.tag[i] == "img")
    assert doc.subtree_end[img] == img + 1
    joined = "".join(texts(doc))
    assert "text" in joined and "more" in joined


def test_self_closing_html_element_stays_open():
    # spec: self-closing flag ignored on non-void HTML elements
    doc = parse_html("<body><div/>inside</body>")
    div = next(i for i in range(len(doc)) if doc.tag[i] == "div")
    txt = next(i for i in range(len(doc)) if doc.kind[i] == KIND_TEXT)
    assert doc.parent[txt] == div


def test_rawtext_script_content_single_text_node():
    doc = parse_html("<body><script>if (a < b) { x(\"<div>\"); }</script><p>t</p>")
    script = next(i for i in range(len(doc)) if doc.tag[i] == "script")
    assert doc.kind[script + 1] == KIND_TEXT
    assert "<div>" in doc.text[script + 1]
    assert "p" in tags(doc)


def test_iframe_rawtext():
    doc = parse_html("<body><iframe><span>fallback</span></iframe><p>t</p>")
    # iframe content is raw text, not elements
    assert "span" not in tags(doc)
    assert "p" in tags(doc)


def test_rcdata_textarea_entities_decoded():
    doc = parse_html("<body><textarea>a &amp; b</textarea>")
    ta = next(i for i in range(len(doc)) if doc.tag[i] == "textarea")
    assert doc.text[ta + 1] == "a & b"


def test_table_synthesis_tbody():
    doc = parse_html("<body><table><tr><td>x</td></tr></table>")
    t = tags(doc)
    assert "tbody" in t  # implied tbody is created per spec
    tr = next(i for i in range(len(doc)) if doc.tag[i] == "tr")
    tbody = next(i for i in range(len(doc)) if doc.tag[i] == "tbody")
    assert doc.parent[tr] == tbody


def test_table_foster_parenting_text():
    doc = parse_html("<body><table>fostered<tr><td>cell</td></tr></table>")
    table = next(i for i in range(len(doc)) if doc.tag[i] == "table")
    fostered = next(
        i for i in range(len(doc))
        if doc.kind[i] == KIND_TEXT and "fostered" in doc.text[i]
    )
    # fostered text sits BEFORE the table, under body
    assert fostered < table
    assert doc.parent[fostered] == 0


def test_table_whitespace_stays_inside():
    doc = parse_html("<body><table>\n  <tr><td>x</td></tr>\n</table>")
    table = next(i for i in range(len(doc)) if doc.tag[i] == "table")
    ws = [i for i in range(len(doc))
          if doc.kind[i] == KIND_TEXT and (doc.text[i] or "").strip() == ""]
    assert any(doc.parent[i] == table for i in ws)


def test_stray_table_parts_ignored():
    doc = parse_html("<body><td>x</td><p>y</p>")
    assert "td" not in tags(doc)
    assert "p" in tags(doc)


def test_a_closes_a():
    doc = parse_html("<body><a href='1'>one<a href='2'>two</a>")
    a_nodes = [i for i in range(len(doc)) if doc.tag[i] == "a"]
    assert len(a_nodes) == 2
    # second <a> must not be nested inside the first
    assert doc.parent[a_nodes[1]] != a_nodes[0]


def test_comments_dropped():
    doc = parse_html("<body>a<!-- comment -->b")
    assert all("comment" not in (t or "") for t in texts(doc))


def test_text_coalescing():
    doc = parse_html("<body>a&amp;b and &lt;more&gt;")
    tx = texts(doc)
    assert tx == ["a&b and <more>"]


def test_crlf_normalized():
    doc = parse_html("<body>line1\r\nline2\rline3")
    assert texts(doc) == ["line1\nline2\nline3"]


def test_nul_stripped():
    doc = parse_html("<body>a\x00b")
    assert texts(doc) == ["ab"]


def test_svg_foreign_content():
    doc = parse_html("<body><svg><circle r='1'/><text>lbl</text></svg><p>t</p>")
    t = tags(doc)
    assert "svg" in t and "circle" in t
    assert "p" in t
    p = next(i for i in range(len(doc)) if doc.tag[i] == "p")
    assert doc.parent[p] == 0  # p escaped the svg


def test_svg_breakout():
    doc = parse_html("<body><svg><div>broke out</div></svg>")
    div = next(i for i in range(len(doc)) if doc.tag[i] == "div")
    assert doc.parent[div] == 0


def test_content_after_body_close():
    doc = parse_html("<html><body><p>in</p></body><p>after</p></html>")
    ps = [i for i in range(len(doc)) if doc.tag[i] == "p"]
    assert len(ps) == 2
    assert all(doc.parent[i] == 0 for i in ps)


def test_pre_leading_newline_stripped():
    doc = parse_html("<body><pre>\ncode</pre>")
    pre = next(i for i in range(len(doc)) if doc.tag[i] == "pre")
    assert doc.text[pre + 1] == "code"


def test_attrs_first_wins_and_valueless():
    doc = parse_html('<body><div class="a" class="b" hidden>x</div>')
    div = next(i for i in range(len(doc)) if doc.tag[i] == "div")
    assert doc.attrs[div]["class"] == "a"
    assert doc.attrs[div]["hidden"] == ""


def test_formatting_reconstruction_across_p():
    # spec: <b> left open across an implied </p> is reconstructed in
    # the next paragraph (active formatting elements)
    doc = parse_html("<body><p><b>bold <p>still bold</p>")
    ps = [i for i in range(len(doc)) if doc.tag[i] == "p"]
    assert len(ps) == 2
    b2 = [i for i in range(len(doc)) if doc.tag[i] == "b" and doc.parent[i] == ps[1]]
    assert b2
    txt = next(i for i in range(len(doc))
               if doc.kind[i] == KIND_TEXT and "still" in doc.text[i])
    assert doc.parent[txt] == b2[0]


def test_formatting_end_tag_stops_reconstruction():
    doc = parse_html("<body><p><b>bold</b> plain<p>also plain")
    bs = [i for i in range(len(doc)) if doc.tag[i] == "b"]
    assert len(bs) == 1  # no reconstruction after an explicit close


def test_formatting_cleared_at_cell_boundary():
    # AFE markers: formatting left open inside a cell must not leak
    # into the next cell
    doc = parse_html(
        "<body><table><tr><td><b>x</td><td>plain</td></tr></table>"
    )
    tds = [i for i in range(len(doc)) if doc.tag[i] == "td"]
    assert len(tds) == 2
    second_cell_bs = [
        i for i in range(len(doc))
        if doc.tag[i] == "b" and tds[1] <= i < doc.subtree_end[tds[1]]
    ]
    assert not second_cell_bs


def test_classic_misnested_b_i():
    # <p>1<b>2<i>3</b>4</i>5 — the canonical misnesting case; the AFE
    # reconstruction yields the spec tree p{1, b{2, i{3}}, i{4}, 5}
    doc = parse_html("<body><p>1<b>2<i>3</b>4</i>5</p>")
    p = next(i for i in range(len(doc)) if doc.tag[i] == "p")
    bs = [i for i in range(len(doc)) if doc.tag[i] == "b"]
    is_ = [i for i in range(len(doc)) if doc.tag[i] == "i"]
    assert len(bs) == 1 and len(is_) == 2
    assert doc.parent[bs[0]] == p
    assert doc.parent[is_[0]] == bs[0]  # i{3} inside b
    assert doc.parent[is_[1]] == p  # reconstructed i{4} under p
    t4 = next(i for i in range(len(doc))
              if doc.kind[i] == KIND_TEXT and doc.text[i] == "4")
    t5 = next(i for i in range(len(doc))
              if doc.kind[i] == KIND_TEXT and doc.text[i] == "5")
    assert doc.parent[t4] == is_[1]
    assert doc.parent[t5] == p


def test_noahs_ark_caps_identical_entries():
    # 5 unclosed identical <b>: reconstruction reopens at most 3
    doc = parse_html("<body><p>" + "<b>" * 5 + "x<p>y")
    ps = [i for i in range(len(doc)) if doc.tag[i] == "p"]
    reopened = [
        i for i in range(len(doc))
        if doc.tag[i] == "b" and ps[1] <= i < doc.subtree_end[ps[1]]
    ]
    assert len(reopened) <= 3


def test_adoption_agency_b_p():
    # the spec's own worked example (13.2.10.2): <b>1<p>2</b>3</p>
    # -> body{ b{1}, p{ b{2}, 3 } }; "3" is NOT bold
    for tok in ("fast", "stdlib"):
        doc = parse_html("<body><b>1<p>2</b>3</p>", tokenizer=tok)
        bs = [i for i in range(len(doc)) if doc.tag[i] == "b"]
        p = next(i for i in range(len(doc)) if doc.tag[i] == "p")
        assert len(bs) == 2
        assert doc.parent[bs[0]] == 0 and doc.parent[bs[1]] == p
        t2 = next(i for i in range(len(doc))
                  if doc.kind[i] == KIND_TEXT and doc.text[i] == "2")
        t3 = next(i for i in range(len(doc))
                  if doc.kind[i] == KIND_TEXT and doc.text[i] == "3")
        assert doc.parent[t2] == bs[1]
        assert doc.parent[t3] == p  # clone was popped by outer-loop pass 2


def test_adoption_agency_a_div_chain():
    # html5lib adoption01: <a>1<div>2<div>3</a>4 clones <a> into each div
    doc = parse_html("<body><a href='x'>1<div>2<div>3</a>4</div></div>")
    a_nodes = [i for i in range(len(doc)) if doc.tag[i] == "a"]
    divs = [i for i in range(len(doc)) if doc.tag[i] == "div"]
    assert len(a_nodes) == 3 and len(divs) == 2
    assert doc.parent[a_nodes[0]] == 0
    assert doc.parent[a_nodes[1]] == divs[0]
    assert doc.parent[a_nodes[2]] == divs[1]
    assert all(doc.attrs[i].get("href") == "x" for i in a_nodes)
    t4 = next(i for i in range(len(doc))
              if doc.kind[i] == KIND_TEXT and doc.text[i] == "4")
    assert doc.parent[t4] == divs[1]  # "4" after </a>: not a link


def test_adoption_agency_foster_parented_formatting():
    # html5lib tables01: formatting open across a table is adopted with
    # foster parenting; y and z land in reopened <b> clones
    doc = parse_html("<body><table><b><tr><td>x</td></tr>y</table>z")
    table = next(i for i in range(len(doc)) if doc.tag[i] == "table")
    ty = next(i for i in range(len(doc))
              if doc.kind[i] == KIND_TEXT and doc.text[i] == "y")
    tz = next(i for i in range(len(doc))
              if doc.kind[i] == KIND_TEXT and doc.text[i] == "z")
    assert doc.tag[doc.parent[ty]] == "b" and ty < table
    assert doc.tag[doc.parent[tz]] == "b" and tz > doc.subtree_end[table] - 1


def test_adoption_agency_inner_loop_drops_non_formatting():
    # <b><em><foo><aside></b>X: foo (non-AFE) is dropped from the open
    # stack, em is cloned around aside, an empty b clone lands inside
    # aside, and the outer loop's second pass pops that clone — so X is
    # a plain child of aside (same mechanism as "3" in <b>1<p>2</b>3)
    doc = parse_html("<body><b><em><foo><aside></b>X")
    aside = next(i for i in range(len(doc)) if doc.tag[i] == "aside")
    tx = next(i for i in range(len(doc))
              if doc.kind[i] == KIND_TEXT and doc.text[i] == "X")
    assert doc.parent[tx] == aside
    bs = [i for i in range(len(doc)) if doc.tag[i] == "b"]
    assert len(bs) == 2 and doc.parent[bs[1]] == aside  # empty clone
    assert doc.tag[doc.parent[aside]] == "em"
    assert doc.parent[doc.parent[aside]] == 0


def test_title_text_captured():
    for tok in ("fast", "stdlib"):
        doc = parse_html(
            "<html><head><title>My &amp; Title</title></head>"
            "<body><p>x</p></body></html>", tokenizer=tok)
        assert doc.head_text == ("My & Title",)
        assert "title" not in tags(doc)  # still not a body node


def test_subtree_end_invariants():
    doc = parse_html("<body><div><p>a<span>b</span></p></div><p>c</p>")
    n = len(doc)
    for i in range(n):
        assert i < doc.subtree_end[i] <= n
        # children lie within the parent's subtree
        if doc.parent[i] >= 0:
            p = doc.parent[i]
            assert p < i < doc.subtree_end[p]
    assert doc.subtree_end[0] == n


def test_afe_cap_bounds_unique_formatting_storm():
    # N unique-attr <b> + <p> pairs: Noah's ark only collapses IDENTICAL
    # entries, so without the AFE size cap every text token reconstructs
    # all N formatting elements (O(N^2) nodes). Capped, parse time and
    # node count stay linear in the input.
    # No wall-clock bound (this VM has minutes-scale steal storms that
    # inflate any timing 10-30x): the O(N^2) blowup is asserted via the
    # NODE COUNT, which the AFE cap bounds to ~N * (_MAX_AFE + c) —
    # the uncapped algorithm produces ~N^2/2 = 2M nodes here.
    html = "<body>" + "".join(f"<b id=i{i}>1<p>" for i in range(2000))
    doc = parse_html(html)
    # each paragraph reopens at most _MAX_AFE formatting elements
    assert len(doc) < 2000 * 80


# ---- MB-scale adversarial stress (node-count proxies; wall-clock
# asserts are banned on this steal-prone VM) ----


def test_mb_scale_deep_nesting_at_depth_cap():
    # 500k unclosed <div> (~2.5 MB): the open-element depth cap (512)
    # must flatten everything past it — node count stays ~500k + text,
    # depth never exceeds the cap, and subtree invariants hold.
    html = "<body>" + "<div>" * 500_000 + "payload text"
    doc = parse_html(html)
    assert len(doc) <= 500_002
    # max depth via parent-chain length of the deepest (last) node
    depth = 0
    i = len(doc) - 1
    while i > 0:
        i = doc.parent[i]
        depth += 1
    assert depth <= 513
    # the text payload survives
    assert any(doc.kind[j] == 1 and "payload" in (doc.text[j] or "")
               for j in range(len(doc)))


def test_mb_scale_wide_flat_siblings():
    # 300k sibling elements (~4 MB): linear node count, body holds all
    html = "<body>" + "<p>x</p>" * 300_000
    doc = parse_html(html)
    assert 600_000 <= len(doc) <= 600_001 + 1
    assert doc.subtree_end[0] == len(doc)


def test_mb_scale_element_with_100k_attributes():
    # one element carrying 10^5 attributes (~1.6 MB of attr text): the
    # tree must stay tiny (1 element + text) and all attrs parse
    attrs = " ".join(f"a{i}=v{i}" for i in range(100_000))
    doc = parse_html(f"<body><div {attrs}>t</div>")
    assert len(doc) <= 4
    div = next(i for i in range(len(doc)) if doc.tag[i] == "div")
    assert len(doc.attrs[div]) == 100_000
    assert doc.attrs[div]["a99999"] == "v99999"


def test_mb_scale_unterminated_comment_and_rawtext():
    # a 2 MB unterminated comment swallows the rest of the input
    # without blowing up; same for an unterminated <script>
    blob = "x" * 2_000_000
    doc = parse_html(f"<body><p>before</p><!-- {blob}")
    texts = [doc.text[i] for i in range(len(doc)) if doc.kind[i] == 1]
    assert texts == ["before"]  # comment content never becomes text
    doc2 = parse_html(f"<body><p>b</p><script>{blob}")
    # rawtext is kept as the script's single text child (html5ever
    # keeps it too; the content filters drop it downstream)
    script = next(i for i in range(len(doc2)) if doc2.tag[i] == "script")
    assert doc2.text[script + 1] == blob
    assert len(doc2) == 5


def test_mb_scale_table_foster_storm():
    # 50k text tokens inside <table> all foster-parent before it:
    # linear nodes, no quadratic reinsert
    html = "<body><table>" + "a<td>b</td>" * 50_000
    doc = parse_html(html)
    assert len(doc) < 50_000 * 5


def test_mb_scale_entity_flood():
    # 500k entities in one text run decode linearly
    html = "<body><p>" + "&amp;" * 500_000
    doc = parse_html(html)
    texts = [doc.text[i] for i in range(len(doc)) if doc.kind[i] == 1]
    assert "".join(texts) == "&" * 500_000


def test_comment_end_edges_spec():
    """Spec comment termination: <!--> and <!---> are abruptly-closed
    empty comments; --!> also closes a comment. Only the END position
    is observable (comment data is dropped)."""
    def texts(h):
        doc = parse_html(h)
        return [doc.text[i] for i in range(len(doc)) if doc.kind[i] == 1]

    assert texts("<body><!-->visible<p>x") == ["visible", "x"]
    assert texts("<body><!--->also<p>y") == ["also", "y"]
    assert texts("<body><!-- a --!><p>w") == ["w"]
    assert texts("<body><!-- a --!>tail<!-- b -->end") == ["tailend"]
    assert texts("<body><!-- unterminated x<p>q") == []


def test_malformed_attr_equals_runs_parse_linear_time():
    """Regression: the tokenizer's attrs grammar must not backtrack
    exponentially on '=' + whitespace runs ending in an unpaired
    value quote (a ~120-byte corrupt tag used to wedge parse_html for
    minutes — a DoS in the extraction hot path). The unquoted-value
    branch now consumes only the '=', so whitespace is consumed
    uniquely by the junk-char class and a failing match backtracks
    linearly; the slow-path recovery output is unchanged."""
    import time

    for n in (16, 64, 256):
        html = "<p>hello</p><a " + "=  " * n + '="...'
        t0 = time.time()
        doc = parse_html(html)
        assert time.time() - t0 < 2.0, n
        texts = [
            doc.text[i] for i in range(len(doc)) if doc.kind[i] == 1
        ]
        assert texts == ["hello"]


def test_eof_tag_fragment_strip_rcdata_divergence_pinned():
    """Accepted tradeoff, pinned: _strip_eof_tag_fragment drops a
    '<'+alpha tail after the document's last '>', even when that tail
    is RCDATA content of an unterminated element — the spec (and
    html5lib) would keep '<y' as character data of the open <title>.
    The pre-pass guards the common truncated-page case (a page cut
    mid-tag) and only ever loses bytes at EOF of an already-truncated
    document; full RCDATA-state tracking in a pre-tokenizer pass would
    re-implement half the tokenizer for that tail. Documented loss:
    the fragment after the last '<' is dropped."""
    doc = parse_html("<p>keep</p><title>A < B and x<y")
    texts = [doc.text[i] for i in range(len(doc)) if doc.kind[i] == 1]
    assert texts == ["keep", "A < B and x"]
