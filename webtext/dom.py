"""Minimal HTML DOM with the CSS-selector subset the extraction rules need.

This container ships no bs4/lxml/selectolax, so the engine carries its own
small DOM built on the stdlib ``html.parser``.  The API is *not* a
BeautifulSoup clone — it is the minimal surface the oracle extractor
(`webtext.oracle`) needs, with semantics matched to the behaviors the
reference relies on (see /root/reference/common_scripts/
web_text_extractor_ver1.5.py):

- ``get_text(separator, strip)``: joins every descendant text node in
  document order; with ``strip=True`` each text node is stripped and
  whitespace-only nodes are skipped (bs4 behavior the reference uses at
  e.g. ref:625, ref:815, ref:1288).
- ``select``: supports exactly the selector grammar found in the reference
  rule tables (ref:1244-1259, ref:1278-1284, ref:997-1093, ref:1216):
  comma lists, descendant combinator (single space), and compound simple
  selectors ``tag``, ``#id``, ``.cls`` (multi), ``[attr]``, ``[attr=v]``,
  ``[attr*=v]``.  Class selectors match whole class tokens; results are in
  document order without duplicates.
- ``decompose``: destructive removal, mutating the tree in place — the
  reference's selector cascade deliberately mutates its soup between
  fallback branches (ref:1285-1287, 1333-1335, 1351-1353), and the engine
  reproduces that by re-parsing per stage and mutating within a stage.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Node | None"):
        self.text = text
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f"TextNode({self.text[:30]!r})"


class Node:
    """An element node. ``name`` is the lowercased tag name."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Node | TextNode] = []
        self.parent = parent

    # -- attribute helpers -------------------------------------------------
    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    # -- traversal ---------------------------------------------------------
    def walk(self):
        """All descendant elements (not self) in document (DFS pre-) order."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Node):
                yield node
                stack.extend(reversed(node.children))

    def text_nodes(self):
        """All descendant text nodes in document order."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                yield node
            else:
                stack.extend(reversed(node.children))

    # -- text --------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = []
        for tn in self.text_nodes():
            s = tn.text
            if strip:
                s = s.strip()
                if not s:
                    continue
            parts.append(s)
        return separator.join(parts)

    # -- mutation ----------------------------------------------------------
    def decompose(self) -> None:
        """Remove this node (and subtree) from its parent, in place."""
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    # -- finding -----------------------------------------------------------
    def find_all(self, names=None, pred=None) -> list["Node"]:
        """Descendant elements whose tag is in ``names`` (str | set | None)
        and for which ``pred(node)`` is truthy (if given)."""
        if isinstance(names, str):
            names = {names}
        out = []
        for el in self.walk():
            if names is not None and el.name not in names:
                continue
            if pred is not None and not pred(el):
                continue
            out.append(el)
        return out

    def find_first(self, names=None, pred=None) -> "Node | None":
        res = self.find_all(names, pred)
        return res[0] if res else None

    # -- CSS selection -----------------------------------------------------
    def select(self, css: str) -> list["Node"]:
        groups = [_parse_compound_chain(part)
                  for part in _split_toplevel_commas(css) if part.strip()]
        out = []
        for el in self.walk():
            for chain in groups:
                if _match_chain(el, chain):
                    out.append(el)
                    break
        return out

    def select_one(self, css: str) -> "Node | None":
        res = self.select(css)
        return res[0] if res else None

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f"<{self.name} {self.attrs}>"


class Document(Node):
    """Parse root. ``name`` is '[document]'."""

    def __init__(self):
        super().__init__("[document]")

    @property
    def body(self) -> Node | None:
        return self.find_first("body")

    @property
    def title_text(self) -> str:
        t = self.find_first("title")
        return t.get_text(strip=True) if t else ""


# ---------------------------------------------------------------------------
# selector grammar
# ---------------------------------------------------------------------------

def _parse_simple(token: str) -> dict:
    """Parse one compound simple selector: tag, #id, .cls*, [attr op value]*."""
    spec = {"tag": None, "id": None, "classes": [], "attrs": []}
    i, n = 0, len(token)
    while i < n:
        ch = token[i]
        if ch == "#":
            j = i + 1
            while j < n and token[j] not in "#.[":
                j += 1
            spec["id"] = token[i + 1:j]
            i = j
        elif ch == ".":
            j = i + 1
            while j < n and token[j] not in "#.[":
                j += 1
            spec["classes"].append(token[i + 1:j])
            i = j
        elif ch == "[":
            j = token.index("]", i)
            body = token[i + 1:j]
            if "*=" in body:
                k, v = body.split("*=", 1)
                spec["attrs"].append((k.strip(), "*=", v.strip().strip("'\"")))
            elif "=" in body:
                k, v = body.split("=", 1)
                spec["attrs"].append((k.strip(), "=", v.strip().strip("'\"")))
            else:
                spec["attrs"].append((body.strip(), "exists", ""))
            i = j + 1
        else:
            j = i
            while j < n and token[j] not in "#.[":
                j += 1
            spec["tag"] = token[i:j].lower()
            i = j
    return spec


def _split_toplevel_commas(css: str) -> list[str]:
    """Split a selector list on commas that are not inside brackets."""
    parts, depth, cur = [], 0, []
    for ch in css:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _tokenize_chain(sel: str) -> list[str]:
    """Split a single selector into compound/combinator tokens, keeping
    bracketed attribute values (which may contain spaces) intact."""
    tokens, depth, cur = [], 0, []
    for ch in sel:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch.isspace() and depth == 0:
            if cur:
                tokens.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        tokens.append("".join(cur))
    return tokens


def _parse_compound_chain(sel: str) -> list[tuple[str, dict]]:
    """Returns [(combinator_to_left, simple), ...] left→right.

    Supported combinators: descendant (whitespace) and adjacent sibling
    ('+') — the subset the rule tables use.
    """
    chain: list[tuple[str, dict]] = []
    pending_comb = " "
    for tok in _tokenize_chain(sel):
        if tok == "+":
            pending_comb = "+"
            continue
        chain.append((pending_comb, _parse_simple(tok)))
        pending_comb = " "
    return chain


def _match_simple(el: Node, spec: dict) -> bool:
    if spec["tag"] and el.name != spec["tag"]:
        return False
    if spec["id"] is not None and el.id != spec["id"]:
        return False
    if spec["classes"]:
        have = el.classes
        for c in spec["classes"]:
            if c not in have:
                return False
    for key, op, val in spec["attrs"]:
        actual = el.attrs.get(key)
        if actual is None:
            return False
        if op == "=" and actual != val:
            return False
        if op == "*=" and val not in actual:
            return False
    return True


def _preceding_sibling_element(el: Node) -> Node | None:
    if el.parent is None:
        return None
    prev = None
    for child in el.parent.children:
        if child is el:
            return prev
        if isinstance(child, Node):
            prev = child
    return None


def _match_chain(el: Node, chain: list[tuple[str, dict]]) -> bool:
    """Right-to-left matching with backtracking over descendant steps."""
    comb, spec = chain[-1]
    if not _match_simple(el, spec):
        return False
    if len(chain) == 1:
        return True
    rest = chain[:-1]
    if comb == "+":
        sib = _preceding_sibling_element(el)
        return sib is not None and _match_chain(sib, rest)
    anc = el.parent
    while anc is not None and anc.name != "[document]":
        if _match_chain(anc, rest):
            return True
        anc = anc.parent
    return False


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Node] = [self.root]

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                    parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                    parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(TextNode(data, self.stack[-1]))


# ---------------------------------------------------------------------------
# precompiled multi-selector matching (hot-path helper)
# ---------------------------------------------------------------------------

class CompiledSelector:
    """A parsed selector list, reusable across documents.

    Single-compound chains (the overwhelming majority in the rule
    tables: bare tags and single classes) get specialized matchers —
    ``matches`` is the innermost call of the cascade's tree walk."""

    __slots__ = ("chains", "_fast")

    def __init__(self, css: str):
        self.chains = [_parse_compound_chain(part)
                       for part in _split_toplevel_commas(css)
                       if part.strip()]
        self._fast = self._specialize()

    def _specialize(self):
        fns = []
        for chain in self.chains:
            if len(chain) != 1:
                return None
            spec = chain[0][1]
            tag, cid = spec["tag"], spec["id"]
            classes, attrs = spec["classes"], spec["attrs"]
            if tag and not cid and not classes and not attrs:
                fns.append(("tag", tag))
            elif len(classes) == 1 and not tag and not cid and not attrs:
                fns.append(("cls", classes[0]))
            else:
                return None
        return fns

    def matches(self, el: Node) -> bool:
        fast = self._fast
        if fast is not None:
            for kind, val in fast:
                if kind == "tag":
                    if el.name == val:
                        return True
                elif val in el.classes:
                    return True
            return False
        return any(_match_chain(el, chain) for chain in self.chains)


def multi_select(root: Node,
                 compiled: list[CompiledSelector]) -> list[list[Node]]:
    """Document-order matches for MANY selectors in ONE tree walk.

    Semantically identical to ``[root.select(s) for s in selectors]`` —
    the walk is the same DFS ``select`` uses — but the tree is traversed
    once instead of once per selector.  This is the extraction actor's
    hot path (the generic cascade probes 15 selectors, unwanted-removal
    28)."""
    out: list[list[Node]] = [[] for _ in compiled]
    for el in root.walk():
        for i, sel in enumerate(compiled):
            if sel.matches(el):
                out[i].append(el)
    return out


def parse_html(html: str) -> Document:
    builder = _TreeBuilder()
    builder.feed(html or "")
    builder.close()
    return builder.root
