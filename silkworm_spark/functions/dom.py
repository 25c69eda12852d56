"""DOM tree + CSS/XPath selection for spider callbacks.

The reference exposes CSS/XPath selection on ``HTMLResponse`` via the
scraper_rs Rust engine (reference response.py:316-351: ``select``,
``select_first``, ``css``, ``css_first``, ``xpath``, ``xpath_first``),
with elements carrying ``.text`` / ``.attr(name)`` and supporting
nested selection (examples/quotes_spider.py:57-81,
examples/quotes_spider_xpath.py:57-95). scraper_rs is a native
extension that can't ship to Spark executors, so this module is a
small pure-Python twin: an ``html.parser``-built element tree plus a
CSS-subset and XPath-subset matcher. It runs INSIDE the vectorized
parse stage (mapInArrow batches), so per-document cost is the unit
that matters — trees are built once per document and shared by every
selector a callback runs.

Supported CSS (every pattern the reference's own examples/tests use,
plus the common attribute forms):
    tag   *   .class   #id   [attr]   [attr=v]   [attr~=v]
    [attr^=v]   [attr$=v]   [attr*=v]   compound (div.a.b#x[y=z])
    descendant (a b)   child (a > b)   adjacent (a + b)
    sibling (a ~ b)   groups (a, b)   :first-child :last-child
    :nth-child(n)
Supported XPath:
    //name   /name   .//name   ./name   *   @attr selection steps
    predicates: [@attr]   [@attr='v']   [contains(@attr,'v')]
    [contains(text(),'v')]   [text()='v']   [n]   [last()]
    trailing /text()

Oversize guard: ``Document(text, max_size_bytes=...)`` raises
``SelectorError`` past the cap, mirroring the reference's
``doc_max_size_bytes`` behavior (response.py:314-328).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser


class SelectorError(Exception):
    """Mirror of the reference's exceptions.SelectorError."""


# tags that never take content (HTML5 void elements)
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
# raw-text elements: contents are CDATA, excluded from .text
_RAW = {"script", "style"}


class Element:
    """One DOM node. ``children`` holds Elements and str text nodes."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []
        self.parent = parent

    # --- content accessors (scraper_rs Element API) ---
    @property
    def text(self) -> str:
        """Concatenated descendant text (script/style excluded)."""
        out: list[str] = []
        stack: list[Element | str] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            elif n.tag not in _RAW:
                stack.extend(reversed(n.children))
        return "".join(out)

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name.lower())

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def html(self) -> str:
        a = "".join(f' {k}="{v}"' for k, v in self.attrs.items())
        inner = "".join(
            c if isinstance(c, str) else c.html() for c in self.children
        )
        if self.tag in _VOID:
            return f"<{self.tag}{a}/>"
        return f"<{self.tag}{a}>{inner}</{self.tag}>"

    # --- traversal ---
    def iter(self):
        """Descendants in document order (self excluded)."""
        stack: list[Element | str] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Element):
                yield n
                stack.extend(reversed(n.children))

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    # --- selection (reference response.py:335-351 surface, sync) ---
    def select(self, selector: str) -> list["Element"]:
        return _css_select(self, selector)

    def select_first(self, selector: str) -> "Element | None":
        r = _css_select(self, selector, first=True)
        return r[0] if r else None

    css = select
    css_first = select_first

    def xpath(self, path: str) -> list["Element"]:
        return _xpath_select(self, path)

    def xpath_first(self, path: str) -> "Element | None":
        r = _xpath_select(self, path, first=True)
        return r[0] if r else None

    def __repr__(self) -> str:  # debugging aid only
        return f"<Element {self.tag} attrs={self.attrs}>"


class _TreeBuilder(HTMLParser):
    # elements auto-closed when the same/listed tag reopens (enough of
    # the HTML5 implied-end-tag rules for real-world crawl pages)
    _IMPLIED = {
        "p": {"p"}, "li": {"li"}, "option": {"option"},
        "tr": {"tr"}, "td": {"td", "th"}, "th": {"td", "th"},
        "dd": {"dd", "dt"}, "dt": {"dd", "dt"},
    }

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        closers = self._IMPLIED.get(tag)
        if closers and self._stack[-1].tag in closers:
            self._stack.pop()
        parent = self._stack[-1]
        el = Element(tag, {k.lower(): (v or "") for k, v in attrs}, parent)
        parent.children.append(el)
        if tag not in _VOID:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        parent = self._stack[-1]
        parent.children.append(
            Element(tag, {k.lower(): (v or "") for k, v in attrs}, parent)
        )

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore strays
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


class Document(Element):
    """Parsed HTML document — the scraper_rs ``Document`` analog
    (reference api.py:11-38 returns one for one-off fetches; every
    HTMLResponse selector call parses one, response.py:316-322)."""

    __slots__ = ()

    def __init__(self, text: str, max_size_bytes: int | None = None):
        if max_size_bytes is not None and len(text) > max_size_bytes:
            raise SelectorError(
                f"document exceeds max_size_bytes ({len(text)} > {max_size_bytes})"
            )
        b = _TreeBuilder()
        b.feed(text)
        b.close()
        super().__init__("#document", {}, None)
        self.children = b.root.children
        for c in self.children:
            if isinstance(c, Element):
                c.parent = self


# ---------------- CSS subset ----------------

_CSS_TOKEN = re.compile(
    r"""\s*(?P<comb>[>+~,])\s*
      | (?P<ws>\s+)
      | (?P<tag>[a-zA-Z][\w-]*|\*)
      | \.(?P<cls>[\w-]+)
      | \#(?P<id>[\w-]+)
      | \[(?P<attr>[\w-]+)\s*(?:(?P<op>[~^$*|]?=)\s*
          (?P<val>"[^"]*"|'[^']*'|[^\]\s]+))?\s*\]
      | :(?P<pseudo>[\w-]+)(?:\((?P<parg>[^)]*)\))?
    """,
    re.X,
)


def _parse_css(selector: str) -> list[list[tuple[str, list]]]:
    """→ list of groups; each group is [(combinator, [simple,...]), ...]
    right-to-left is applied at match time; stored left-to-right here.
    combinator ∈ {'': first, ' ', '>', '+', '~'}."""
    groups: list[list[tuple[str, list]]] = []
    seq: list[tuple[str, list]] = []
    pending = ""
    simples: list = []
    pos = 0
    s = selector.strip()
    while pos < len(s):
        m = _CSS_TOKEN.match(s, pos)
        if not m or m.end() == pos:
            raise SelectorError(f"CSS selector parse failure at {pos}: {s!r}")
        pos = m.end()
        if m.group("comb") == ",":
            if simples:
                seq.append((pending, simples))
            if not seq:
                raise SelectorError(f"empty CSS group in {s!r}")
            groups.append(seq)
            seq, simples, pending = [], [], ""
        elif m.group("comb"):
            if simples:
                seq.append((pending, simples))
                simples = []
            pending = m.group("comb")
        elif m.group("ws") is not None:
            if simples:
                seq.append((pending, simples))
                simples = []
                pending = " "
        elif m.group("tag"):
            simples.append(("tag", m.group("tag").lower()))
        elif m.group("cls"):
            simples.append(("class", m.group("cls")))
        elif m.group("id"):
            simples.append(("id", m.group("id")))
        elif m.group("attr"):
            v = m.group("val")
            if v and v[0] in "\"'":
                v = v[1:-1]
            simples.append(("attr", m.group("attr").lower(), m.group("op"), v))
        elif m.group("pseudo"):
            simples.append(("pseudo", m.group("pseudo"), m.group("parg")))
    if simples:
        seq.append((pending, simples))
    if seq:
        groups.append(seq)
    if not groups:
        raise SelectorError(f"empty CSS selector: {selector!r}")
    return groups


def _match_simples(el: Element, simples: list) -> bool:
    for s in simples:
        kind = s[0]
        if kind == "tag":
            if s[1] != "*" and el.tag != s[1]:
                return False
        elif kind == "class":
            if s[1] not in el.classes:
                return False
        elif kind == "id":
            if el.attrs.get("id") != s[1]:
                return False
        elif kind == "attr":
            _, name, op, val = s
            have = el.attrs.get(name)
            if have is None:
                return False
            if op is None:
                continue
            if op == "=" and have != val:
                return False
            if op == "~=" and val not in have.split():
                return False
            if op == "^=" and not have.startswith(val):
                return False
            if op == "$=" and not have.endswith(val):
                return False
            if op == "*=" and val not in have:
                return False
            if op == "|=" and not (have == val or have.startswith(val + "-")):
                return False
        elif kind == "pseudo":
            _, name, arg = s
            parent = el.parent
            sibs = parent.element_children() if parent else [el]
            if name == "first-child":
                if sibs[0] is not el:
                    return False
            elif name == "last-child":
                if sibs[-1] is not el:
                    return False
            elif name == "nth-child":
                try:
                    k = int(arg)
                except (TypeError, ValueError):
                    raise SelectorError(f"unsupported :nth-child arg {arg!r}")
                if k < 1 or k > len(sibs) or sibs[k - 1] is not el:
                    return False
            else:
                raise SelectorError(f"unsupported pseudo-class :{name}")
    return True


def _match_seq(el: Element, seq: list, i: int, scope: Element) -> bool:
    """el matches seq[:i+1], anchored so every matched ancestor stays
    inside `scope` (nested element.select semantics)."""
    comb, simples = seq[i]
    if not _match_simples(el, simples):
        return False
    if i == 0:
        return True
    prev_comb = comb  # combinator BETWEEN seq[i-1] and seq[i]
    if prev_comb in (" ", ""):
        p = el.parent
        while p is not None and p is not scope.parent:
            if _match_seq(p, seq, i - 1, scope):
                return True
            if p is scope:
                break
            p = p.parent
        return False
    if prev_comb == ">":
        p = el.parent
        return p is not None and p is not scope.parent and _match_seq(p, seq, i - 1, scope)
    if prev_comb in ("+", "~"):
        parent = el.parent
        if parent is None:
            return False
        sibs = parent.element_children()
        idx = sibs.index(el)
        if prev_comb == "+":
            return idx > 0 and _match_seq(sibs[idx - 1], seq, i - 1, scope)
        return any(_match_seq(s, seq, i - 1, scope) for s in sibs[:idx])
    raise SelectorError(f"unsupported combinator {prev_comb!r}")


def _css_select(scope: Element, selector: str, first: bool = False) -> list[Element]:
    groups = _parse_css(selector)
    out: list[Element] = []
    seen: set[int] = set()
    for el in scope.iter():
        for seq in groups:
            if _match_seq(el, seq, len(seq) - 1, scope):
                if id(el) not in seen:
                    seen.add(id(el))
                    out.append(el)
                if first:
                    return out
                break
    return out


# ---------------- XPath subset ----------------

_XSTEP = re.compile(
    r"(?P<sep>//|/)(?P<name>text\(\)|@[\w-]+|[\w-]+|\*)(?P<preds>(?:\[[^\]]*\])*)"
)
_XPRED = re.compile(r"\[([^\]]*)\]")
_XP_ATTR_EQ = re.compile(r"^@([\w-]+)\s*=\s*(\"[^\"]*\"|'[^']*')$")
_XP_ATTR = re.compile(r"^@([\w-]+)$")
_XP_CONTAINS = re.compile(
    r"^contains\(\s*(@[\w-]+|text\(\))\s*,\s*(\"[^\"]*\"|'[^']*')\s*\)$"
)
_XP_TEXT_EQ = re.compile(r"^text\(\)\s*=\s*(\"[^\"]*\"|'[^']*')$")


def _xpath_select(scope: Element, path: str, first: bool = False):
    p = path.strip()
    if p.startswith("."):
        p = p[1:]
    if not p.startswith("/"):
        p = "//" + p  # bare 'a[...]' treated as descendant step
    pos = 0
    steps: list[tuple[str, str, list[str]]] = []
    while pos < len(p):
        m = _XSTEP.match(p, pos)
        if not m:
            raise SelectorError(f"XPath parse failure at {pos}: {path!r}")
        pos = m.end()
        steps.append(
            (m.group("sep"), m.group("name"), _XPRED.findall(m.group("preds")))
        )
    if pos != len(p):
        raise SelectorError(f"XPath trailing junk in {path!r}")

    current: list = [scope]
    for sep, name, preds in steps:
        if name.startswith("@"):  # attribute value step (terminal)
            attr = name[1:]
            vals = [e.attrs[attr] for e in current
                    if isinstance(e, Element) and attr in e.attrs]
            current = vals
            continue
        if name == "text()":
            current = [e.text for e in current if isinstance(e, Element)]
            continue
        nxt: list[Element] = []
        for base in current:
            if not isinstance(base, Element):
                continue
            pool = base.iter() if sep == "//" else base.element_children()
            cand = [e for e in pool if name == "*" or e.tag == name]
            for pred in preds:
                cand = _apply_pred(cand, pred.strip(), path)
            nxt.extend(cand)
        # de-dup preserving order (// from multiple bases can overlap)
        seen: set[int] = set()
        current = [e for e in nxt if not (id(e) in seen or seen.add(id(e)))]
    return current[:1] if first else current


def _unq(s: str) -> str:
    return s[1:-1]


def _apply_pred(cand: list[Element], pred: str, path: str) -> list[Element]:
    if pred == "last()":
        return cand[-1:]
    if pred.isdigit():
        k = int(pred)
        return [cand[k - 1]] if 1 <= k <= len(cand) else []
    m = _XP_ATTR_EQ.match(pred)
    if m:
        name, val = m.group(1), _unq(m.group(2))
        return [e for e in cand if e.attrs.get(name) == val]
    m = _XP_ATTR.match(pred)
    if m:
        name = m.group(1)
        return [e for e in cand if name in e.attrs]
    m = _XP_CONTAINS.match(pred)
    if m:
        what, val = m.group(1), _unq(m.group(2))
        if what == "text()":
            return [e for e in cand if val in e.text]
        name = what[1:]
        return [e for e in cand if val in (e.attrs.get(name) or "")]
    m = _XP_TEXT_EQ.match(pred)
    if m:
        val = _unq(m.group(1))
        return [e for e in cand if e.text == val]
    raise SelectorError(f"unsupported XPath predicate [{pred}] in {path!r}")
