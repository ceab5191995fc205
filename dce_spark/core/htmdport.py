"""Vendored port of the htmd crate's default HTML -> Markdown
conversion.

The reference converts the pruned container HTML with
``htmd::HtmlToMarkdown::new()`` — all-default options — and trims the
result (reference src/markdown.rs:119-126, 160-166; htmd 0.5 per
Cargo.toml:39). htmd is a public Rust converter in the turndown
lineage (its handlers mirror turndown's COMMONMARK rule set), built on
an html5ever parse of the input string. This module ports that
pipeline:

1. parse the HTML string with the WHATWG tree builder
   (:mod:`dce_spark.core.htmlparse` — the same html5ever tree-building
   semantics htmd inherits, including fragment reparse quirks like
   table foster-parenting);
2. browser-style whitespace collapse over the tree (turndown's
   collapse-whitespace algorithm: runs of ``[ \\t\\r\\n]`` become one
   space, block boundaries swallow edge spaces, ``<pre>`` subtrees are
   untouched);
3. recursive conversion with per-element handlers, flanking-whitespace
   hoisting for inline elements, the blank-element rule, and
   newline-aware chunk joining (max one blank line);
4. markdown escaping of text content outside code contexts;
5. post-processing: leading newlines and trailing whitespace trimmed.

Option defaults ported (htmd ``Options::default()``): ATX headings
(``# h``), inlined links, two-space ``<br>``, indented code blocks
(``pre > code`` -> 4-space indent), ``*`` bullet markers with
turndown's ``*   `` / ``1.  `` item prefixes, ``* * *`` rules for
``<hr>``, ``**`` strong and ``*`` emphasis delimiters. The crate is
not runnable in this sandbox, so where htmd's default diverges from
turndown's the choice is documented at the handler; golden fixtures
(testdata/golden_cetd_markdown.parquet) are recorded from this port,
and an INDEPENDENT conformance corpus
(tests/fixtures/markdown_conformance.json — expectations hand-
transcribed from the documented turndown rule semantics before ever
running the port) locks the rule table externally.
"""

from __future__ import annotations

import re

from dce_spark.core.htmlparse import KIND_TEXT, parse_html

# turndown block-elements list (is_block)
_BLOCK = frozenset(
    "address article aside audio blockquote body canvas center dd dir "
    "div dl dt fieldset figcaption figure footer form frameset h1 h2 h3 "
    "h4 h5 h6 header hgroup hr html isindex li main menu nav noframes "
    "noscript ol output p pre section table tbody td tfoot th thead tr "
    "ul".split()
)
_VOID = frozenset(
    "area base br col command embed hr img input keygen link meta param "
    "source track wbr".split()
)
# elements kept even when their text content is blank
_MEANINGFUL_WHEN_BLANK = frozenset(
    "a table thead tbody tfoot th td iframe script audio video".split()
)

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# turndown COMMONMARK escape table, applied to text nodes outside code
_ESCAPES = [
    (re.compile(r"\\"), r"\\\\"),
    (re.compile(r"\*"), r"\\*"),
    (re.compile(r"^-", re.M), r"\\-"),
    (re.compile(r"^\+ ", re.M), r"\\+ "),
    (re.compile(r"^(=+)", re.M), r"\\\1"),
    (re.compile(r"^(#{1,6}) ", re.M), r"\\\1 "),
    (re.compile(r"`"), r"\\`"),
    (re.compile(r"^~~~", re.M), r"\\~~~"),
    (re.compile(r"\["), r"\\["),
    (re.compile(r"\]"), r"\\]"),
    (re.compile(r"^>", re.M), r"\\>"),
    (re.compile(r"_"), r"\\_"),
    (re.compile(r"^(\d+)\. ", re.M), r"\1\\. "),
]

_WS_RUN = re.compile(r"[ \t\r\n]+")
_LEAD_NL = re.compile(r"^\n+")
_TRAIL_NL = re.compile(r"\n+$")
_ATTR_CLEAN = re.compile(r"(\n+\s*)+")


class _El:
    __slots__ = ("tag", "attrs", "children", "parent", "idx", "el_idx",
                 "last_el")

    def __init__(self, tag: str, attrs: dict | None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []
        self.parent: _El | None = None
        self.idx = 0
        self.el_idx = 0
        self.last_el = None


class _Tx:
    __slots__ = ("data", "parent", "idx", "el_idx")

    def __init__(self, data: str):
        self.data = data
        self.parent: _El | None = None
        self.idx = 0
        self.el_idx = 0


def _build_tree(html: str) -> _El:
    doc = parse_html(html)
    body = _El("body", None)
    stack: list[tuple[int, _El]] = [(doc.subtree_end[0], body)]
    for i in range(1, len(doc)):
        while stack[-1][0] <= i:
            stack.pop()
        parent = stack[-1][1]
        if doc.kind[i] == KIND_TEXT:
            node = _Tx(doc.text[i] or "")
            node.parent = parent
            parent.children.append(node)
        else:
            node = _El(doc.tag[i], doc.attrs[i])
            node.parent = parent
            parent.children.append(node)
            stack.append((doc.subtree_end[i], node))
    return body


# ---------------------------------------------------------------------
# collapse-whitespace (turndown collapse-whitespace.js, used verbatim by
# the turndown family): single pass in document order.
# ---------------------------------------------------------------------


def _collapse_exact(root: _El) -> None:
    """Literal port of turndown's collapse(): flat document-order walk
    with node removal and single-space edge trimming. Block boundaries
    (and <br>) swallow exactly ONE trailing space of the previous text
    node; void and <pre> elements protect the following text node's
    leading space; <pre> subtrees are not descended into."""
    prev_text: _Tx | None = None
    keep_leading_ws = False

    def doc_order(el: _El):
        for node in list(el.children):
            yield el, node
            if isinstance(node, _El) and node.tag != "pre":
                yield from doc_order(node)

    removals: list[tuple[_El, _Tx]] = []
    for parent, node in doc_order(root):
        if isinstance(node, _Tx):
            text = _WS_RUN.sub(" ", node.data)
            if (
                (prev_text is None or prev_text.data.endswith(" "))
                and not keep_leading_ws
                and text.startswith(" ")
            ):
                text = text[1:]
            if not text:
                removals.append((parent, node))
                continue
            node.data = text
            prev_text = node
        else:
            if node.tag in _BLOCK or node.tag == "br":
                if prev_text is not None and prev_text.data.endswith(" "):
                    prev_text.data = prev_text.data[:-1]
                prev_text = None
                keep_leading_ws = False
            elif node.tag in _VOID or node.tag == "pre":
                prev_text = None
                keep_leading_ws = True
            elif prev_text is not None:
                keep_leading_ws = False
    if prev_text is not None and prev_text.data.endswith(" "):
        prev_text.data = prev_text.data[:-1]
        if not prev_text.data:
            removals.append((prev_text.parent, prev_text))
    for parent, node in removals:
        if node in parent.children:
            parent.children.remove(node)


# ---------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------


# conservative superset of every character the escape table can touch:
# specials anywhere, or a marker character at a line start
_ESCAPE_TRIGGER = re.compile(r"[\\*`\[\]_]|^[-+=#>~0-9]", re.M)


def _escape_md(text: str) -> str:
    if _ESCAPE_TRIGGER.search(text) is None:
        return text  # fast path: most prose needs no escaping
    for pat, rep in _ESCAPES:
        text = pat.sub(rep, text)
    return text


def _clean_attribute(value: str | None) -> str:
    return _ATTR_CLEAN.sub("\n", value) if value else ""


def _join(a: str, b: str) -> str:
    s1 = a.rstrip("\n")
    s2 = b.lstrip("\n")
    nls = min(max(len(a) - len(s1), len(b) - len(s2)), 2)
    return s1 + "\n" * nls + s2


def _index_tree(root: _El) -> None:
    """One pass after whitespace collapse: stamp every node's position
    in its parent (idx), its ordinal among element siblings (el_idx),
    and each element's last element child. Sibling lookups during
    conversion are then O(1) — linear scans per node made wide
    link-list pages (100k siblings) quadratic."""
    stack = [root]
    while stack:
        el = stack.pop()
        ei = 0
        last_el = None
        for i, c in enumerate(el.children):
            c.idx = i
            if isinstance(c, _El):
                c.el_idx = ei
                ei += 1
                last_el = c
                stack.append(c)
        el.last_el = last_el


def _element_index(node: _El) -> int:
    """Index among the parent's ELEMENT children (turndown uses
    parent.children, the element-only collection)."""
    return node.el_idx


def _next_sibling(node) -> object | None:
    sibs = node.parent.children if node.parent else []
    j = node.idx + 1
    return sibs[j] if j < len(sibs) else None


def _prev_sibling(node) -> object | None:
    return node.parent.children[node.idx - 1] if node.idx > 0 else None


def _last_element_child(node: _El):
    return node.last_el


class _Converter:
    """Conversion is read-only over the collapsed tree, so per-node
    text content and void/meaningful-descendant flags are memoized —
    _is_blank and flanking-whitespace checks would otherwise re-walk
    every subtree per node (quadratic on deep containers)."""

    def __init__(self) -> None:
        self._tc: dict[int, str] = {}
        self._flags: dict[int, tuple[bool, bool]] = {}

    def _text(self, node) -> str:
        if isinstance(node, _Tx):
            return node.data
        key = id(node)
        got = self._tc.get(key)
        if got is None:
            got = "".join(self._text(c) for c in node.children)
            self._tc[key] = got
        return got

    def _descendant_flags(self, node: _El) -> tuple[bool, bool]:
        """(has_void, has_meaningful_when_blank) for node's subtree
        INCLUDING the node itself."""
        key = id(node)
        got = self._flags.get(key)
        if got is None:
            v = node.tag in _VOID
            m = node.tag in _MEANINGFUL_WHEN_BLANK
            for c in node.children:
                if isinstance(c, _El) and (not v or not m):
                    cv, cm = self._descendant_flags(c)
                    v = v or cv
                    m = m or cm
            got = (v, m)
            self._flags[key] = got
        return got

    def _is_blank(self, node: _El) -> bool:
        if node.tag in _VOID or node.tag in _MEANINGFUL_WHEN_BLANK:
            return False
        if self._text(node).strip() != "":
            return False
        has_void = has_meaningful = False
        for c in node.children:
            if isinstance(c, _El):
                cv, cm = self._descendant_flags(c)
                has_void = has_void or cv
                has_meaningful = has_meaningful or cm
        return not has_void and not has_meaningful

    def process(self, el: _El, in_code: bool) -> str:
        # linear-time equivalent of folding _join over the children:
        # chunks accumulate in a list with the trailing-newline count
        # carried separately (rebuilding the string per child was
        # O(total^2) on wide sibling lists)
        parts: list[str] = []
        trail = 0  # newlines logically at the end of the output so far
        for child in el.children:
            if isinstance(child, _Tx):
                rep = child.data if in_code else _escape_md(child.data)
            else:
                rep = self.replacement(child, in_code)
            s2 = rep.lstrip("\n")
            lead = len(rep) - len(s2)
            sep = min(max(trail, lead), 2)
            if not s2:
                trail = sep  # empty chunk: newlines stay pending
                continue
            if sep:
                parts.append("\n" * sep)
            body = s2.rstrip("\n")
            parts.append(body)
            trail = len(s2) - len(body)
        return "".join(parts) + "\n" * trail

    def replacement(self, node: _El, in_code: bool) -> str:
        tag = node.tag
        if self._is_blank(node):
            # blank rule: pure-whitespace subtrees collapse to a block
            # break (or nothing inline) — this is what keeps empty
            # <p></p> / <div>\n</div> out of the output
            return "\n\n" if tag in _BLOCK else ""

        # flanking whitespace: hoisted out of inline elements so
        # "<b> x </b>" renders " **x** ", with doubled spaces against
        # an already-whitespace neighbor suppressed
        leading = trailing = ""
        if tag not in _BLOCK and tag not in _VOID and tag != "pre":
            txt = self._text(node)
            if txt.startswith(" "):
                prev = _prev_sibling(node)
                flanked = isinstance(prev, _Tx) and prev.data.endswith(" ")
                leading = "" if flanked else " "
            if txt.endswith(" "):
                nxt = _next_sibling(node)
                flanked = isinstance(nxt, _Tx) and nxt.data.startswith(" ")
                trailing = "" if flanked else " "

        # only <code> ancestry exempts text from markdown escaping
        # (pre-without-code text IS escaped, matching turndown); the
        # pre>code block handler reads raw textContent directly anyway
        content = self.process(node, in_code or tag == "code")
        if leading or trailing:
            content = content.strip()
        return leading + self.handle(node, content, in_code) + trailing

    # -- element handlers (htmd element_handler/* <- turndown rules) --

    def handle(self, node: _El, content: str, in_code: bool) -> str:
        tag = node.tag
        if tag == "p":
            return f"\n\n{content}\n\n"
        if tag in _HEADINGS:
            # htmd default HeadingStyle::Atx
            return f"\n\n{'#' * _HEADINGS[tag]} {content}\n\n"
        if tag == "blockquote":
            inner = _LEAD_NL.sub("", _TRAIL_NL.sub("", content))
            quoted = re.sub(r"^", "> ", inner, flags=re.M)
            return f"\n\n{quoted}\n\n"
        if tag in ("ul", "ol"):
            parent = node.parent
            if (
                parent is not None
                and parent.tag == "li"
                and _last_element_child(parent) is node
            ):
                return "\n" + content
            return f"\n\n{content}\n\n"
        if tag == "li":
            return self._list_item(node, content)
        if tag == "pre":
            first = node.children[0] if node.children else None
            if isinstance(first, _El) and first.tag == "code":
                # htmd default CodeBlockStyle::Indented (turndown's
                # default; fenced is opt-in in both)
                raw = self._text(first)
                return "\n\n    " + raw.replace("\n", "\n    ") + "\n\n"
            return f"\n\n{content}\n\n" if content else ""
        if tag == "code":
            sibs = node.parent is not None and (
                _prev_sibling(node) is not None
                or _next_sibling(node) is not None
            )
            if node.parent is not None and node.parent.tag == "pre" and not sibs:
                return content  # handled by the pre rule
            return self._inline_code(node)
        if tag == "br":
            return "  \n"  # htmd default BrStyle::TwoSpaces
        if tag == "hr":
            # turndown default '* * *'; htmd exposes HrStyle with the
            # same asterisks variant — ported as the default here
            return "\n\n* * *\n\n"
        if tag in ("strong", "b"):
            return f"**{content}**" if content.strip() else ""
        if tag in ("em", "i"):
            # '*' emphasis (CommonMark-canonical; htmd's emphasis
            # handler, vs turndown's '_' default)
            return f"*{content}*" if content.strip() else ""
        if tag == "a":
            href = node.attrs.get("href")
            if href:  # inlined link (htmd default LinkStyle::Inlined)
                href = href.replace("(", "\\(").replace(")", "\\)")
                title = _clean_attribute(node.attrs.get("title"))
                tpart = ' "' + title.replace('"', '\\"') + '"' if title else ""
                return f"[{content}]({href}{tpart})"
            return content  # no href: default passthrough
        if tag == "img":
            alt = _clean_attribute(node.attrs.get("alt"))
            src = node.attrs.get("src") or ""
            title = _clean_attribute(node.attrs.get("title"))
            tpart = f' "{title}"' if title else ""
            return f"![{alt}]({src}{tpart})" if src else ""
        # default rule: block -> paragraph break, inline -> transparent
        if tag in _BLOCK:
            return f"\n\n{content}\n\n"
        return content

    def _list_item(self, node: _El, content: str) -> str:
        content = _LEAD_NL.sub("", content)
        content = _TRAIL_NL.sub("\n", content)
        content = content.replace("\n", "\n    ")
        parent = node.parent
        if parent is not None and parent.tag == "ol":
            start = parent.attrs.get("start")
            idx = _element_index(node)
            try:
                num = int(start) + idx if start else idx + 1
            except ValueError:
                num = idx + 1
            prefix = f"{num}.  "
        else:
            prefix = "*   "  # htmd default BulletListMarker::Asterisk
        tail = (
            "\n"
            if _next_sibling(node) is not None and not content.endswith("\n")
            else ""
        )
        return prefix + content + tail

    def _inline_code(self, node: _El) -> str:
        content = self._text(node)
        if not content:
            return ""
        content = re.sub(r"\r?\n|\r", " ", content)
        extra = (
            " "
            if re.search(r"^`|^ .*?[^ ].* $|`$", content)
            else ""
        )
        delim = "`"
        runs = re.findall(r"`+", content)
        while delim in runs:
            delim += "`"
        return delim + extra + content + extra + delim


def convert_to_markdown(html: str) -> str:
    """htmd-default conversion of an HTML string to markdown."""
    root = _build_tree(html)
    _collapse_exact(root)
    _index_tree(root)
    out = _Converter().process(root, in_code=False)
    # turndown postProcess: strip leading newlines/tabs/CRs and ALL
    # trailing whitespace
    out = re.sub(r"^[\t\r\n]+", "", out)
    return re.sub(r"[\t\r\n\s]+$", "", out)
