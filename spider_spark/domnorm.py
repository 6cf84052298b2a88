"""WHATWG HTML normalization — the DomAdapter's ``processHtml`` contract
(/root/reference/src/adapters/dom.ts:36-49) re-expressed against the
PUBLIC spec that happy-dom 20 implements.

The reference does::

    const window = new Window();
    window.document.documentElement.innerHTML = html;
    return window.document.documentElement.outerHTML;

i.e. the HTML *fragment parsing algorithm* with context element ``<html>``
(WHATWG HTML §13.4) followed by the *HTML fragment serialization
algorithm* (§13.3). happy-dom ≥14 implements the spec's tree construction
(insertion modes, implied tags) and serializer, so the faithful
re-expression is to implement the same spec subset here — NOT to
round-trip tokens — giving:

- ``<html><head>…</head><body>…</body></html>`` structure synthesized
  around content, nested ``html``/duplicate ``head``/``body`` tags
  absorbed (attribute-merge for a repeated ``body``, per in-body rules);
- implied end tags: ``p`` closed by block-level start tags, ``li`` by
  ``li``, ``dd``/``dt`` by each other, ``option``/``optgroup``, table
  sections and cells;
- spec tokenizer cleanups: entities decoded at parse and re-encoded
  minimally at serialize (text: ``& < > nbsp``; attributes: ``& " nbsp``),
  all attributes double-quoted, void elements emitted without end tags,
  ``</br>`` treated as ``<br>``, a stray ``</p>`` materializing
  ``<p></p>``, bogus comments (``<?…>``, ``<![CDATA[…]]>``) preserved as
  comments, DOCTYPE dropped (ignored by fragment parsing);
- raw-text children of ``script``/``style`` serialized verbatim.

Known divergences from happy-dom 20, documented because the library is
not installable in this sandbox (tests/js_oracle.mjs carries a
``normalize`` op that activates the true differential wherever happy-dom
IS resolvable):

- the adoption-agency algorithm for misnested formatting elements
  (``<b><i></b></i>``) is not implemented — misnested inline tags close
  at the nearest matching open element instead of being reconstructed;
- foster parenting of stray table text is not implemented;
- foreign content (svg/math) is parsed as ordinary elements: attribute
  case fix-ups (``viewBox``) are lost to the tokenizer's lowercasing;
- ``noscript`` children are escaped like normal text (the spec
  serializer emits them raw only when scripting is enabled).

Everything here is driver-side-free, pure-Python, and runs inside the
Arrow-batched ``udfs.normalize_html`` UDF — per-document bounded work.
"""

from __future__ import annotations

import html as _htmllib
from html.parser import HTMLParser

VOID = frozenset(
    "area base basefont bgsound br col embed frame hr img input keygen "
    "link meta param source track wbr".split()
)

#: serializer literal-text elements (WHATWG §13.3 step "if current node
#: is ..."); noscript intentionally excluded — see module docstring.
RAW_TEXT = frozenset(
    "style script xmp iframe noembed noframes plaintext".split()
)

#: start tags that imply </p> when a p element is in button scope
#: (WHATWG §13.2.6.4.7 "A start tag whose tag name is one of ...")
P_CLOSERS = frozenset(
    "address article aside blockquote center details dialog dir div dl "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header "
    "hgroup hr listing main menu nav ol p plaintext pre section summary "
    "table ul xmp li dd dt".split()
)

HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())

#: elements whose presence on the stack bounds button/list-item scope
#: (approximation of the spec's scope definitions — one boundary set)
SCOPE_BOUNDARY = frozenset(
    "applet caption html table td th marquee object template".split()
)

#: head-pointer elements: in body they still insert via in-head rules;
#: before the body opens they land inside <head>
HEAD_ELEMENTS = frozenset(
    "base basefont bgsound link meta title style script noscript template".split()
)

#: generate-implied-end-tags set (WHATWG §13.2.5.3)
IMPLIED_END = frozenset(
    "dd dt li optgroup option p rb rp rt rtc".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs=None):
        self.tag = tag
        self.attrs = attrs or []  # list[(name, value|None)], first-wins
        self.children: list = []  # _Node | _Text | _Comment


class _Text:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class _Comment:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


def _dedup_attrs(attrs):
    """Spec tokenizer: a duplicate attribute name is ignored (first wins)."""
    seen, out = set(), []
    for k, v in attrs:
        if k not in seen:
            seen.add(k)
            out.append((k, v))
    return out


class _TreeBuilder(HTMLParser):
    """Fragment parsing with context <html>: a subset of the WHATWG tree
    construction algorithm (before head → in head → after head → in body)
    driven by the stdlib tokenizer. The stdlib parser already implements
    the spec's tokenizer states we need: rawtext for script/style,
    bogus-comment for <?…> (handle_pi) and <![…]> (unknown_decl),
    attribute entity decoding, and tag/attr lowercasing."""

    # extend rawtext handling to the RCDATA elements so <b> inside
    # <title>/<textarea> stays text, as the spec tokenizes it
    CDATA_CONTENT_ELEMENTS = ("script", "style", "title", "textarea")
    _RCDATA = frozenset(("title", "textarea"))

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.head: _Node | None = None
        self.body: _Node | None = None
        self.mode = "before_head"
        self.stack: list[_Node] = []  # open elements below head/body

    # --- insertion helpers -------------------------------------------------
    def _current(self) -> _Node:
        if self.stack:
            return self.stack[-1]
        if self.mode == "in_body":
            return self.body
        if self.mode == "in_head":
            return self.head
        return self.root

    def _ensure_head(self):
        if self.head is None:
            self.head = _Node("head")
            self.root.children.append(self.head)

    def _open_body(self, attrs=None):
        self._ensure_head()
        if self.body is None:
            self.body = _Node("body", _dedup_attrs(attrs or []))
            self.root.children.append(self.body)
        elif attrs:
            # repeated <body>: merge only missing attributes (in-body rule)
            have = {k for k, _ in self.body.attrs}
            self.body.attrs.extend((k, v) for k, v in _dedup_attrs(attrs) if k not in have)
        self.mode = "in_body"

    def _in_scope(self, tag: str) -> bool:
        for el in reversed(self.stack):
            if el.tag == tag:
                return True
            if el.tag in SCOPE_BOUNDARY:
                return False
        return False

    def _in_table_scope(self, tag: str) -> bool:
        # table scope bounds only at html/table/template (§13.2.4.2) —
        # rows and cells must see through open td/th/caption boundaries
        for el in reversed(self.stack):
            if el.tag == tag:
                return True
            if el.tag in ("table", "template"):
                return False
        return False

    def _pop_until(self, tags) -> None:
        """Pop up to and including the nearest element named in ``tags``."""
        if isinstance(tags, str):
            tags = (tags,)
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag in tags:
                del self.stack[i:]
                return

    def _generate_implied_end(self, except_tag: str | None = None):
        while self.stack and self.stack[-1].tag in IMPLIED_END and self.stack[-1].tag != except_tag:
            self.stack.pop()

    # --- token handlers ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "html":
            return  # fragment: attrs merge onto the fake root — invisible
        if tag == "head":
            if self.mode == "before_head":
                self._ensure_head()
                self.mode = "in_head"
            return  # duplicate <head> ignored
        if tag == "body":
            if self.mode != "in_body" or self.body is None:
                self._open_body(attrs)
            else:
                self._open_body(attrs)  # merge attrs
            return
        if self.mode != "in_body" and tag in HEAD_ELEMENTS:
            self._ensure_head()
            if self.mode == "before_head":
                self.mode = "in_head"
            node = _Node(tag, _dedup_attrs(attrs))
            self.head.children.append(node)
            if tag not in VOID:
                self.stack.append(node)
            return
        if self.mode != "in_body":
            self._open_body()

        # implied end tags before certain start tags (in-body rules)
        if tag in P_CLOSERS and self._in_scope("p"):
            self._generate_implied_end(except_tag="p")
            self._pop_until("p")
        if tag in HEADINGS and self.stack and self.stack[-1].tag in HEADINGS:
            self.stack.pop()
        if tag == "li":
            for el in reversed(self.stack):
                if el.tag == "li":
                    self._generate_implied_end(except_tag="li")
                    self._pop_until("li")
                    break
                if el.tag in SCOPE_BOUNDARY or el.tag in ("ul", "ol"):
                    break
        if tag in ("dd", "dt"):
            for el in reversed(self.stack):
                if el.tag in ("dd", "dt"):
                    self._generate_implied_end(except_tag=el.tag)
                    self._pop_until(("dd", "dt"))
                    break
                if el.tag in SCOPE_BOUNDARY or el.tag == "dl":
                    break
        if tag == "option" and self.stack and self.stack[-1].tag == "option":
            self.stack.pop()
        if tag == "optgroup":
            if self.stack and self.stack[-1].tag == "option":
                self.stack.pop()
            if self.stack and self.stack[-1].tag == "optgroup":
                self.stack.pop()
        if tag == "tr" and self._in_table_scope("tr"):
            self._generate_implied_end()
            self._pop_until("tr")
        if tag in ("td", "th") and (
            self._in_table_scope("td") or self._in_table_scope("th")
        ):
            self._generate_implied_end()
            self._pop_until(("td", "th"))
        if tag in ("tbody", "thead", "tfoot"):
            for t in ("tbody", "thead", "tfoot"):
                if self._in_table_scope(t):
                    self._pop_until(t)
                    break
        if tag == "colgroup" and self._in_table_scope("colgroup"):
            self._pop_until("colgroup")

        node = _Node(tag, _dedup_attrs(attrs))
        self._current().children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # the self-closing flag is meaningless for HTML elements (§13.1.2):
        # <div/> is a start tag; void elements never push anyway
        self.handle_starttag(tag, attrs)
        if tag not in VOID and self.stack and self.stack[-1].tag == tag:
            # foreign-content style <svg/> etc: treat as immediately closed,
            # matching the serializer's inability to re-emit the flag
            self.stack.pop()

    def handle_endtag(self, tag):
        if tag in ("html",):
            return
        if tag == "head":
            if self.mode == "in_head":
                self.mode = "after_head"
                self.stack.clear()
            return
        if tag == "body":
            if self.mode == "in_body":
                self.stack.clear()
            return
        if tag == "br":
            # spec: </br> acts like <br> (§13.2.6.4.7)
            self.handle_starttag("br", [])
            return
        if tag == "p" and self.mode == "in_body" and not self._in_scope("p"):
            # spec: </p> with no open p inserts an empty <p> first
            self._current().children.append(_Node("p"))
            return
        # rawtext elements close exactly (tokenizer guarantees the pairing)
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                self._generate_implied_end(except_tag=tag)
                # after implied pops, find it again (indexes shifted)
                self._pop_until(tag)
                return
        # no matching open element: ignored

    def handle_data(self, data):
        if not data:
            return
        if self.mode != "in_body":
            in_rawtext = self.stack and self.stack[-1].tag in self.CDATA_CONTENT_ELEMENTS
            if in_rawtext:
                pass  # title/script/style text inside head
            elif data.strip() == "":
                # whitespace before body: spec drops it in "before head"
                # and keeps it in head; normalize to dropping (happy-dom
                # serializes either way into the inter-element gaps)
                return
            else:
                self._open_body()
        cur = self._current()
        if cur.tag in self._RCDATA:
            # RCDATA: the stdlib cdata mode skipped entity decoding;
            # the spec decodes character references in RCDATA
            data = _htmllib.unescape(data)
        if cur.children and isinstance(cur.children[-1], _Text):
            cur.children[-1].data += data
        else:
            cur.children.append(_Text(data))

    def handle_comment(self, data):
        self._current().children.append(_Comment(data))

    def handle_decl(self, decl):
        return  # DOCTYPE ignored by fragment parsing (§13.4)

    def handle_pi(self, data):
        # "<?" enters bogus-comment state: comment data is "?" + content
        self._current().children.append(_Comment("?" + data))

    def unknown_decl(self, data):
        # "<![CDATA[…]]>" outside foreign content is a bogus comment
        self._current().children.append(_Comment("[" + data + "]"))


def _esc_text(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace(" ", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace(" ", "&nbsp;").replace('"', "&quot;")


def _serialize_into(node, out: list, raw: bool):
    if isinstance(node, _Text):
        out.append(node.data if raw else _esc_text(node.data))
        return
    if isinstance(node, _Comment):
        out.append(f"<!--{node.data}-->")
        return
    out.append("<" + node.tag)
    for k, v in node.attrs:
        out.append(f' {k}=""' if v is None else f' {k}="{_esc_attr(v)}"')
    out.append(">")
    if node.tag in VOID:
        return
    child_raw = node.tag in RAW_TEXT
    for c in node.children:
        _serialize_into(c, out, child_raw)
    out.append(f"</{node.tag}>")


def whatwg_normalize_html(html: str) -> str:
    """documentElement.innerHTML = html; return documentElement.outerHTML —
    the dom.ts:36-49 round trip per the WHATWG algorithms (see module
    docstring for the implemented subset and documented divergences).
    Raises on tokenizer errors; callers wanting the reference's
    fall-back-to-raw contract use :func:`textops.normalize_html`."""
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    tb._ensure_head()
    if tb.body is None:
        tb._open_body()
    out: list[str] = ["<html>"]
    for child in tb.root.children:
        _serialize_into(child, out, False)
    out.append("</html>")
    return "".join(out)
