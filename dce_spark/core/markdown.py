"""Markdown extraction path (reference src/markdown.rs, feature-gated
there behind `markdown`).

Semantics mirrored:
* threshold = mean of max-node ancestor densities, but 0.0 (not the
  node's own density) when there are no ancestors (markdown.rs:30-34 —
  deliberately different from the text path);
* if no node passes (density >= threshold AND density_sum > 0), fall
  back to converting the max node's nearest element ancestor
  (markdown.rs:47-50, 129-160);
* else: walk up <=5 DOM parents from the max node to the nearest
  {article, main, section, div, content} container (markdown.rs:84-105),
  then wrap up to the nearest element (markdown.rs:107-114);
* pruning during serialization: should_skip_element subtrees,
  <img>/<source>/<picture> with data: URIs, and <span data-mce-type>
  editor bookmarks (utils.rs:290-369). Text nodes are NOT content-
  filtered here (matching filtered_inner_html).

The reference serializes pruned HTML and feeds the htmd converter; this
implementation renders markdown directly from the node table (one pass,
no re-parse). Output is CommonMark-shaped, not byte-identical to htmd —
the byte-identical invariant applies to the text path only.
"""

from __future__ import annotations

from dce_spark.core.cetd import DensityTree
from dce_spark.core.htmlparse import KIND_TEXT, Document
from dce_spark.core.predicates import should_skip_element
from dce_spark.core.textnorm import RUST_WHITESPACE, ascii_lower

_HEADINGS = {"h1": "#", "h2": "##", "h3": "###", "h4": "####",
             "h5": "#####", "h6": "######"}
_BLOCK = frozenset(
    "p div article section main aside header footer nav figure "
    "figcaption blockquote ul ol li table tr h1 h2 h3 h4 h5 h6 pre hr "
    "br".split()
)


def _has_data_uri_media(tag: str, attrs) -> bool:
    """reference src/utils.rs:354-369 (trim_start is Unicode ws)."""
    if tag not in ("img", "source", "picture"):
        return False
    if not attrs:
        return False
    src = attrs.get("src")
    if src is not None and ascii_lower(
        src.lstrip(RUST_WHITESPACE)
    ).startswith("data:"):
        return True
    srcset = attrs.get("srcset")
    return srcset is not None and "data:" in srcset


def _is_editor_artifact_span(tag: str, attrs) -> bool:
    """reference src/utils.rs:347-349: ANY element carrying a
    data-mce-type attribute (the doc comment says span, the code does
    not restrict the tag)."""
    return attrs is not None and "data-mce-type" in attrs


class _MdRenderer:
    def __init__(self, doc: Document):
        self.doc = doc
        n = len(doc)
        self.children: list[list[int]] = [[] for _ in range(n)]
        for i in range(1, n):
            self.children[doc.parent[i]].append(i)
        self.blocks: list[str] = []
        self.inline: list[str] = []

    def _flush(self) -> None:
        text = "".join(self.inline).strip()
        self.inline = []
        if text:
            self.blocks.append(text)

    def render_children(self, idx: int) -> str:
        for c in self.children[idx]:
            self._node(c, 0)
        self._flush()
        out = "\n\n".join(self.blocks)
        self.blocks = []
        return out.strip()

    def _node(self, idx: int, list_depth: int) -> None:
        doc = self.doc
        if doc.kind[idx] == KIND_TEXT:
            txt = doc.text[idx]
            if txt:
                self.inline.append(" ".join(txt.split()) or " ")
            return
        tag = doc.tag[idx]
        attrs = doc.attrs[idx]
        if (
            should_skip_element(tag, attrs)
            or _has_data_uri_media(tag, attrs)
            or _is_editor_artifact_span(tag, attrs)
        ):
            return

        if tag in _HEADINGS:
            self._flush()
            self.inline.append(_HEADINGS[tag] + " ")
            for c in self.children[idx]:
                self._node(c, list_depth)
            self._flush()
            return
        if tag == "a":
            href = (attrs or {}).get("href", "")
            self.inline.append("[")
            for c in self.children[idx]:
                self._node(c, list_depth)
            self.inline.append(f"]({href.strip()})" if href else "]()")
            return
        if tag == "img":
            alt = (attrs or {}).get("alt", "")
            src = (attrs or {}).get("src", "")
            if src:
                self.inline.append(f"![{alt}]({src.strip()})")
            return
        if tag in ("strong", "b"):
            self.inline.append("**")
            for c in self.children[idx]:
                self._node(c, list_depth)
            self.inline.append("**")
            return
        if tag in ("em", "i"):
            self.inline.append("*")
            for c in self.children[idx]:
                self._node(c, list_depth)
            self.inline.append("*")
            return
        if tag == "code":
            self.inline.append("`")
            for c in self.children[idx]:
                self._node(c, list_depth)
            self.inline.append("`")
            return
        if tag == "pre":
            self._flush()
            raw = "".join(
                doc.text[j] or ""
                for j in range(idx, doc.subtree_end[idx])
                if doc.kind[j] == KIND_TEXT
            )
            self.blocks.append("```\n" + raw.strip("\n") + "\n```")
            return
        if tag == "br":
            self.inline.append("\n")
            return
        if tag == "hr":
            self._flush()
            self.blocks.append("---")
            return
        if tag in ("ul", "ol"):
            self._flush()
            ordered = tag == "ol"
            items = []
            k = 0
            for c in self.children[idx]:
                if doc.kind[c] != KIND_TEXT and doc.tag[c] == "li":
                    k += 1
                    sub = _MdRenderer.__new__(_MdRenderer)
                    sub.doc = doc
                    sub.children = self.children
                    sub.blocks = []
                    sub.inline = []
                    body = sub.render_children(c).replace("\n\n", "\n")
                    marker = f"{k}. " if ordered else "- "
                    indent = "  " * list_depth
                    items.append(indent + marker + body)
            if items:
                self.blocks.append("\n".join(items))
            return
        if tag == "blockquote":
            self._flush()
            sub = _MdRenderer.__new__(_MdRenderer)
            sub.doc = doc
            sub.children = self.children
            sub.blocks = []
            sub.inline = []
            inner = sub.render_children(idx)
            if inner:
                self.blocks.append(
                    "\n".join("> " + ln for ln in inner.splitlines())
                )
            return
        if tag in _BLOCK:
            self._flush()
            for c in self.children[idx]:
                self._node(c, list_depth)
            self._flush()
            return
        # inline-ish unknown element: recurse transparently
        for c in self.children[idx]:
            self._node(c, list_depth)


def render_markdown(doc: Document, container_idx: int) -> str:
    """Markdown of the container's inner content, with non-content
    subtrees pruned (the filtered_inner_html + htmd pipeline analogue)."""
    return _MdRenderer(doc).render_children(container_idx)


def extract_content_as_markdown(dtree: DensityTree) -> str:
    """reference src/markdown.rs:17-68."""
    import numpy as np

    if dtree.density_sum is None:
        dtree.calculate_density_sum()
    max_idx = dtree.get_max_density_sum_node()
    if max_idx < 0:
        return ""

    # threshold: mean ancestor density, 0.0 when no ancestors
    # (markdown.rs:30-34 — deliberately not the text path's fallback)
    threshold = dtree._selection_threshold(max_idx, default=0.0)

    with np.errstate(invalid="ignore"):
        mask = (dtree.density >= threshold) & (dtree.density_sum > 0.0)

    doc = dtree.doc
    max_dom = int(dtree.dom_index[max_idx])

    if not mask.any():
        # single-node fallback: nearest element ancestor of the max node
        i = max_dom
        while i >= 0 and doc.kind[i] == KIND_TEXT:
            i = doc.parent[i]
        return render_markdown(doc, max(i, 0))

    return render_markdown(doc, dtree.walk_to_container(max_dom))


# ---------------------------------------------------------------------
# filtered_inner_html — the reference's markdown-path serializer
# (src/utils.rs:290-342): pruned inner HTML of a node, with non-content
# subtrees (skip filters, data:-URI media, editor-artifact elements)
# removed and text/attrs escaped exactly like escape_html_text /
# escape_attr_value (src/utils.rs:372-392).
# ---------------------------------------------------------------------

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)


def escape_html_text(s: str) -> str:
    """reference src/utils.rs:372-381 (& < > only)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def escape_attr_value(s: str) -> str:
    """reference src/utils.rs:384-392 (& and double quote only)."""
    return s.replace("&", "&amp;").replace('"', "&quot;")


def filtered_inner_html(doc: Document, dom_idx: int = 0) -> str:
    """Serialize the inner HTML of ``dom_idx`` (default: body) with
    non-content subtrees pruned — what the reference feeds into htmd."""
    kind = doc.kind
    tags = doc.tag
    attrs = doc.attrs
    texts = doc.text
    sub_end = doc.subtree_end
    out: list[str] = []
    close_at: list[tuple[int, str]] = []  # (subtree_end, tag) stack
    end = sub_end[dom_idx]
    i = dom_idx + 1  # inner HTML: children only, not the node itself
    while i < end:
        while close_at and close_at[-1][0] <= i:
            out.append(f"</{close_at.pop()[1]}>")
        if kind[i] == KIND_TEXT:
            out.append(escape_html_text(texts[i]))
            i += 1
            continue
        tag = tags[i]
        a = attrs[i]
        if (
            should_skip_element(tag, a)
            or _is_editor_artifact_span(tag, a)
            or _has_data_uri_media(tag, a)
        ):
            i = sub_end[i]  # prune the whole subtree
            continue
        out.append("<" + tag)
        if a:
            for name, value in a.items():
                out.append(f' {name}="{escape_attr_value(value)}"')
        out.append(">")
        if tag in _VOID_TAGS:
            i = sub_end[i]  # void: no children serialized, no end tag
            continue
        close_at.append((sub_end[i], tag))
        i += 1
    while close_at:
        out.append(f"</{close_at.pop()[1]}>")
    return "".join(out)
