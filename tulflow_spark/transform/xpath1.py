"""Stdlib-only XPath 1.0 engine (lexer → recursive-descent parser → evaluator).

Implements the W3C XPath 1.0 REC data model and semantics over
``xml.etree.ElementTree`` input, plus the handful of XPath 2.0 functions the
reference's real stylesheets use (``matches``, ``replace``, ``lower-case``,
``upper-case``, ``ends-with``, ``string-join``).  This is the foundation for
:mod:`tulflow_spark.transform.microxslt` (arbitrary-stylesheet execution)
and the generic Schematron engine — the reference runs any XSLT/Schematron
via Saxon/lxml (``/root/reference/tulflow/transform.py:63-66``,
``validate.py:35-42``); neither library exists in this container, so this
module supplies the per-partition engine those fallback paths need.

Everything here is driver/executor-side plain Python: it runs inside the
iterator pandas UDFs of ``transform_xml_with_engine`` /
``validate_xml_with_engine``, compiled once per partition.

Node model
----------
Documents are converted once into lightweight :class:`Node` objects with
parent pointers and a global document-order index (attributes included, so
union/step results sort correctly).  Namespace prefix declarations — which
``xml.etree`` normally discards — are captured per element via the pull
parser's ``start-ns`` events; XPath QNames resolve against the *expression
context* nsmap (the stylesheet's), never the source document's, per spec.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET

__all__ = [
    "Node",
    "XPathError",
    "parse_document",
    "compile_expr",
    "compile_pattern",
    "Context",
    "string_value",
]


class XPathError(ValueError):
    """Lex/parse/eval failure with the offending expression in the message."""


ROOT, ELEM, TEXT, ATTR, COMMENT, PI, NSNODE = range(7)


class Node:
    __slots__ = (
        "kind", "tag", "value", "parent", "children", "attrs", "order",
        "prefix", "nsmap",
    )

    def __init__(self, kind, tag=None, value=None, parent=None, order=0,
                 prefix=None, nsmap=None):
        self.kind = kind
        self.tag = tag          # '{uri}local' or 'local' for ELEM/ATTR/PI
        self.value = value      # text for TEXT/ATTR/COMMENT, target data for PI
        self.parent = parent
        self.children = []      # ELEM/ROOT: child ELEM/TEXT/COMMENT/PI nodes
        self.attrs = []         # ELEM: ATTR nodes
        self.order = order
        self.prefix = prefix    # source-document prefix hint (name() fidelity)
        self.nsmap = nsmap      # prefix->uri in scope (parsed docs only)

    # -- conveniences -------------------------------------------------
    def ns_local(self):
        t = self.tag or ""
        if t.startswith("{"):
            uri, local = t[1:].split("}", 1)
            return uri, local
        return "", t

    def qname(self):
        _, local = self.ns_local()
        return f"{self.prefix}:{local}" if self.prefix else local

    def __repr__(self):  # pragma: no cover - debug aid
        k = "root elem text attr comment pi ns".split()[self.kind]
        return f"<Node {k} {self.tag or self.value!r} @{self.order}>"


def string_value(node: Node) -> str:
    if node.kind in (TEXT, ATTR, COMMENT, PI, NSNODE):
        return node.value or ""
    parts: list[str] = []
    stack = list(reversed(node.children))
    while stack:
        n = stack.pop()
        if n.kind == TEXT:
            parts.append(n.value or "")
        elif n.kind == ELEM:
            stack.extend(reversed(n.children))
    return "".join(parts)


def _prefix_for(uri: str, nsmap: dict[str, str] | None) -> str | None:
    if not uri or not nsmap:
        return None
    best = None
    for p, u in nsmap.items():
        if u == uri:
            best = p
            if p:  # prefer an explicit prefix over default-ns ''
                return p
    return best or None


def parse_document(text: str | bytes) -> Node:
    """Parse XML into the Node model, tracking per-element nsmaps and
    document order.  One pass, pull-parser based."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    parser = ET.XMLPullParser(["start", "end", "start-ns", "end-ns"])
    root = Node(ROOT)
    stack = [root]
    ns_stack: list[tuple[str, str | None]] = []   # (prefix, shadowed-uri)
    nsmap: dict[str, str] = {}
    counter = [0]

    def nxt():
        counter[0] += 1
        return counter[0]

    # text accumulation: ET only exposes .text/.tail after 'end'; instead we
    # feed incrementally and read events — .text is reliable at 'end'.  To
    # keep child order (text interleaved with elements) we rebuild from the
    # completed element at 'end' of each element whose parent is the root of
    # its subtree... simpler: parse fully with ET, walk with a parallel
    # nsmap-recording pass below.
    parser.feed(text)
    events = list(parser.read_events())
    parser.close()

    # Pass 1: per-element nsmap snapshots in document order of 'start's.
    snapshots: list[dict[str, str]] = []
    for ev, payload in events:
        if ev == "start-ns":
            p, uri = payload
            ns_stack.append((p, nsmap.get(p)))
            nsmap[p] = uri
        elif ev == "end-ns":
            p, old = ns_stack.pop()
            if old is None:
                nsmap.pop(p, None)
            else:
                nsmap[p] = old
        elif ev == "start":
            snapshots.append(dict(nsmap))

    # Pass 2: ET tree walk (same start order) building Node tree.
    et_root = ET.fromstring(text)
    idx = [0]

    def build(el, parent: Node) -> Node:
        snap = snapshots[idx[0]] if idx[0] < len(snapshots) else {}
        idx[0] += 1
        uri = el.tag[1:].split("}", 1)[0] if el.tag.startswith("{") else ""
        node = Node(ELEM, el.tag, parent=parent, order=nxt(),
                    prefix=_prefix_for(uri, snap), nsmap=snap)
        for aname, aval in el.attrib.items():
            auri = aname[1:].split("}", 1)[0] if aname.startswith("{") else ""
            node.attrs.append(
                Node(ATTR, aname, aval, parent=node, order=nxt(),
                     prefix=_prefix_for(auri, snap))
            )
        if el.text:
            node.children.append(Node(TEXT, value=el.text, parent=node,
                                      order=nxt()))
        for child in el:
            node.children.append(build(child, node))
            if child.tail:
                node.children.append(Node(TEXT, value=child.tail, parent=node,
                                          order=nxt()))
        return node

    root.children.append(build(et_root, root))
    return root


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      \s+
    | (?P<num>\d+\.\d*|\.\d+|\d+)
    | (?P<lit>'[^']*'|"[^"]*")
    | (?P<dslash>//)
    | (?P<ddot>\.\.)
    | (?P<dcolon>::)
    | (?P<op>!=|<=|>=|[|/\[\]()@,=<>+\-*$.])
    | (?P<name>[A-Za-z_][\w.\-]*(?::\*|:[A-Za-z_][\w.\-]*)?|\*)
    """,
    re.VERBOSE,
)

_NODE_TYPES = {"text", "node", "comment", "processing-instruction"}
_AXES = {
    "child", "descendant", "descendant-or-self", "self", "parent",
    "ancestor", "ancestor-or-self", "following-sibling",
    "preceding-sibling", "following", "preceding", "attribute",
    "namespace",
}


def _tokenize(expr: str):
    out = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise XPathError(f"bad token at {pos} in {expr!r}")
        pos = m.end()
        if m.lastgroup is None:
            continue
        kind = m.lastgroup
        text = m.group()
        if kind == "lit":
            out.append(("lit", text[1:-1]))
        elif kind == "num":
            out.append(("num", float(text)))
        elif kind == "name":
            out.append(("name", text))
        elif kind == "dslash":
            out.append(("op", "//"))
        elif kind == "ddot":
            out.append(("op", ".."))
        elif kind == "dcolon":
            out.append(("op", "::"))
        else:
            out.append(("op", text))
    return out


# ---------------------------------------------------------------------------
# Parser → tuple AST
# ---------------------------------------------------------------------------

_OPERAND_END = {"lit", "num"}   # token kinds that end an operand


class _Parser:
    def __init__(self, tokens, expr):
        self.toks = tokens
        self.i = 0
        self.expr = expr

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise XPathError(f"expected {val!r}, got {v!r} in {self.expr!r}")

    def eof(self):
        return self.i >= len(self.toks)

    # expression is an operator position iff previous token ends an operand
    def _prev_ends_operand(self):
        if self.i == 0:
            return False
        k, v = self.toks[self.i - 1]
        if k in _OPERAND_END:
            return True
        return (k == "name") or (k == "op" and v in ("]", ")", ".", ".."))

    def parse(self):
        e = self.or_expr()
        if not self.eof():
            raise XPathError(f"trailing tokens in {self.expr!r}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("name", "or") and self._binop_here():
            self.next()
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.eq_expr()
        while self.peek() == ("name", "and") and self._binop_here():
            self.next()
            e = ("and", e, self.eq_expr())
        return e

    def _binop_here(self):
        return self._prev_ends_operand()

    def eq_expr(self):
        e = self.rel_expr()
        while self.peek()[1] in ("=", "!=") and self.peek()[0] == "op":
            _, op = self.next()
            e = ("cmp", op, e, self.rel_expr())
        return e

    def rel_expr(self):
        e = self.add_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("<", "<=", ">", ">="):
            _, op = self.next()
            e = ("cmp", op, e, self.add_expr())
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek() == ("op", "+") or (
            self.peek() == ("op", "-") and self._prev_ends_operand()
        ):
            _, op = self.next()
            e = ("arith", op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.unary_expr()
        while (
            self.peek() == ("op", "*") and self._prev_ends_operand()
        ) or (
            self.peek()[0] == "name" and self.peek()[1] in ("div", "mod")
            and self._prev_ends_operand()
        ):
            _, op = self.next()
            e = ("arith", op, e, self.unary_expr())
        return e

    def unary_expr(self):
        if self.peek() == ("op", "-") and not self._prev_ends_operand():
            self.next()
            return ("neg", self.unary_expr())
        return self.union_expr()

    def union_expr(self):
        e = self.path_expr()
        while self.peek() == ("op", "|"):
            self.next()
            e = ("union", e, self.path_expr())
        return e

    # -- paths ---------------------------------------------------------
    def path_expr(self):
        k, v = self.peek()
        if k == "op" and v == "$":
            self.next()
            nk, name = self.next()
            if nk != "name":
                raise XPathError(f"bad variable ref in {self.expr!r}")
            return self._filter_tail(("var", name))
        if k == "lit":
            self.next()
            return self._filter_tail(("lit", v))
        if k == "num":
            self.next()
            return self._filter_tail(("num", v))
        if k == "op" and v == "(":
            self.next()
            inner = self.or_expr()
            self.expect(")")
            return self._filter_tail(inner)
        if k == "name" and self.peek(1) == ("op", "(") and \
                v not in _NODE_TYPES:
            return self._filter_tail(self.function_call())
        return self.location_path()

    def _filter_tail(self, primary):
        preds = []
        while self.peek() == ("op", "["):
            preds.append(self.predicate())
        steps = []
        while self.peek()[0] == "op" and self.peek()[1] in ("/", "//"):
            _, sep = self.next()
            if sep == "//":
                steps.append(("descendant-or-self", ("node",), []))
            steps.append(self.step())
        if not preds and not steps:
            return primary
        return ("filter", primary, preds, steps)

    def function_call(self):
        _, name = self.next()
        self.expect("(")
        args = []
        if self.peek() != ("op", ")"):
            args.append(self.or_expr())
            while self.peek() == ("op", ","):
                self.next()
                args.append(self.or_expr())
        self.expect(")")
        return ("call", name, args)

    def location_path(self):
        steps = []
        absolute = False
        k, v = self.peek()
        if k == "op" and v == "/":
            self.next()
            absolute = True
            if self.eof() or not self._starts_step():
                return ("path", True, [])
        elif k == "op" and v == "//":
            self.next()
            absolute = True
            steps.append(("descendant-or-self", ("node",), []))
        steps.append(self.step())
        while self.peek()[0] == "op" and self.peek()[1] in ("/", "//"):
            _, sep = self.next()
            if sep == "//":
                steps.append(("descendant-or-self", ("node",), []))
            steps.append(self.step())
        return ("path", absolute, steps)

    def _starts_step(self):
        k, v = self.peek()
        return (k == "name") or (k == "op" and v in ("@", ".", "..", "*"))

    def step(self):
        k, v = self.peek()
        if k == "op" and v == ".":
            self.next()
            return ("self", ("node",), [])
        if k == "op" and v == "..":
            self.next()
            return ("parent", ("node",), [])
        axis = "child"
        if k == "op" and v == "@":
            self.next()
            axis = "attribute"
        elif k == "name" and v in _AXES and self.peek(1) == ("op", "::"):
            self.next()
            self.next()
            axis = v
        test = self.node_test()
        preds = []
        while self.peek() == ("op", "["):
            preds.append(self.predicate())
        return (axis, test, preds)

    def node_test(self):
        k, v = self.next()
        if k == "op" and v == "*":
            return ("name", "*")
        if k != "name":
            raise XPathError(f"expected node test, got {v!r} in {self.expr!r}")
        if v in _NODE_TYPES and self.peek() == ("op", "("):
            self.next()
            arg = None
            if self.peek()[0] == "lit":
                arg = self.next()[1]
            self.expect(")")
            return (v, arg) if v == "processing-instruction" else (v,)
        return ("name", v)

    def predicate(self):
        self.expect("[")
        e = self.or_expr()
        self.expect("]")
        return e


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

class Context:
    __slots__ = ("node", "pos", "size", "vars", "nsmap", "current")

    def __init__(self, node, pos=1, size=1, vars=None, nsmap=None,
                 current=None):
        self.node = node
        self.pos = pos
        self.size = size
        self.vars = vars or {}
        self.nsmap = nsmap or {}
        self.current = current or node

    def with_node(self, node, pos, size):
        return Context(node, pos, size, self.vars, self.nsmap, self.current)


class DecimalFormat:
    """``xsl:decimal-format`` attribute bundle (XSLT 1.0 §12.3) with the
    spec defaults; consumed by ``format-number()``."""

    __slots__ = (
        "decimal_sep", "grouping_sep", "minus", "percent", "permille",
        "zero", "digit", "pattern_sep", "infinity", "nan",
    )

    def __init__(self, decimal_sep=".", grouping_sep=",", minus="-",
                 percent="%", permille="‰", zero="0", digit="#",
                 pattern_sep=";", infinity="Infinity", nan="NaN"):
        self.decimal_sep = decimal_sep
        self.grouping_sep = grouping_sep
        self.minus = minus
        self.percent = percent
        self.permille = permille
        self.zero = zero
        self.digit = digit
        self.pattern_sep = pattern_sep
        self.infinity = infinity
        self.nan = nan


def format_number(value: float, picture: str, fmt: DecimalFormat) -> str:
    """JDK-DecimalFormat-style picture formatting (XSLT 1.0
    ``format-number()``): 0/# digits, grouping, min/max fraction from the
    picture, percent/per-mille multipliers, a negative subpicture after
    the pattern separator (default: minus-sign prefix), half-even
    rounding (the JDK/Saxon behavior)."""
    import math
    from decimal import ROUND_HALF_EVEN, Decimal

    if value != value:
        return fmt.nan
    if value in (float("inf"), float("-inf")):
        return (fmt.minus if value < 0 else "") + fmt.infinity
    parts = picture.split(fmt.pattern_sep)
    negative = value < 0 or (value == 0 and math.copysign(1.0, value) < 0)
    sub = parts[1] if (negative and len(parts) > 1) else parts[0]
    digit_idx = [i for i, ch in enumerate(sub) if ch in (fmt.zero, fmt.digit)]
    if not digit_idx:
        raise XPathError(f"format-number picture {picture!r} has no digits")
    s0, s1 = digit_idx[0], digit_idx[-1]
    # a decimal separator directly after the last digit belongs to the
    # numeric part ("0.‰" etc. keep it out; "0." keeps trailing point off)
    prefix, numpart, suffix = sub[:s0], sub[s0 : s1 + 1], sub[s1 + 1 :]
    mult = 1
    if fmt.percent in prefix or fmt.percent in suffix:
        mult = 100
    elif fmt.permille in prefix or fmt.permille in suffix:
        mult = 1000
    if fmt.decimal_sep in numpart:
        int_pic, frac_pic = numpart.split(fmt.decimal_sep, 1)
    else:
        int_pic, frac_pic = numpart, ""
    min_int = int_pic.count(fmt.zero)
    min_frac = frac_pic.count(fmt.zero)
    max_frac = min_frac + frac_pic.count(fmt.digit)
    group = 0
    if fmt.grouping_sep in int_pic:
        digits_after = 0
        for ch in reversed(int_pic):
            if ch == fmt.grouping_sep:
                group = digits_after
                break
            if ch in (fmt.zero, fmt.digit):
                digits_after += 1
    q = (Decimal(repr(abs(value))) * mult).quantize(
        Decimal(1).scaleb(-max_frac), rounding=ROUND_HALF_EVEN
    )
    text = format(q, "f")
    int_str, _, frac_str = text.partition(".")
    frac_str = frac_str.rstrip("0")
    if len(frac_str) < min_frac:
        frac_str += "0" * (min_frac - len(frac_str))
    if len(int_str) < min_int:
        int_str = "0" * (min_int - len(int_str)) + int_str
    if group:
        rev = int_str[::-1]
        int_str = fmt.grouping_sep.join(
            rev[i : i + group] for i in range(0, len(rev), group)
        )[::-1]
    if fmt.zero != "0":
        base = ord(fmt.zero)
        tr = {ord(str(d)): chr(base + d) for d in range(10)}
        int_str = int_str.translate(tr)
        frac_str = frac_str.translate(tr)
    out = prefix + int_str
    if frac_str:
        out += fmt.decimal_sep + frac_str
    out += suffix
    if negative and len(parts) == 1:
        out = fmt.minus + out
    return out


def _num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        v = _str(v)
    try:
        return float(v.strip())
    except (ValueError, AttributeError):
        return float("nan")


def _str(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        if v == int(v):
            return str(int(v))
        return repr(v)
    if isinstance(v, list):
        return string_value(v[0]) if v else ""
    raise XPathError(f"cannot convert {type(v)} to string")


def _bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, list):
        return len(v) > 0
    raise XPathError(f"cannot convert {type(v)} to boolean")


def _doc_sort(nodes: list[Node]) -> list[Node]:
    seen = set()
    out = []
    for n in sorted(nodes, key=lambda n: n.order):
        if id(n) not in seen:
            seen.add(id(n))
            out.append(n)
    return out


def _resolve_qname(name: str, nsmap: dict[str, str]) -> str:
    """QName in an expression → '{uri}local' ('' default ns per XPath 1.0:
    unprefixed name tests are in NO namespace)."""
    if ":" in name:
        prefix, local = name.split(":", 1)
        uri = nsmap.get(prefix)
        if uri is None:
            raise XPathError(f"undeclared prefix {prefix!r}")
        return f"{{{uri}}}{local}" if local != "*" else f"{{{uri}}}*"
    return name


def _test_node(node: Node, test, nsmap, axis) -> bool:
    kind = test[0]
    if kind == "node":
        return True
    if kind == "text":
        return node.kind == TEXT
    if kind == "comment":
        return node.kind == COMMENT
    if kind == "processing-instruction":
        return node.kind == PI
    # name test: principal node type = attr for attribute axis,
    # namespace node for the namespace axis, elem otherwise
    want = (ATTR if axis == "attribute"
            else NSNODE if axis == "namespace" else ELEM)
    if node.kind != want:
        return False
    name = test[1]
    if name == "*":
        return True
    if want == NSNODE:
        # a namespace node's name is the prefix, in no namespace
        return node.tag == name
    resolved = _resolve_qname(name, nsmap)
    if resolved.endswith("}*"):
        return (node.tag or "").startswith(resolved[:-1])
    return node.tag == resolved


def _namespace_nodes(node: Node) -> list[Node]:
    """XPath 1.0 namespace axis: one namespace node per in-scope binding
    (including the implicit ``xml`` prefix and the default namespace, whose
    node has an empty name).  Parsed documents carry full per-element
    snapshots; constructed trees fall back to an ancestor-merge walk."""
    if node.kind != ELEM:
        return []
    if node.nsmap is not None:
        nsmap = dict(node.nsmap)
    else:
        chain = []
        cur = node
        while cur is not None:
            chain.append(cur)
            cur = cur.parent
        nsmap = {}
        for el in reversed(chain):
            if getattr(el, "nsmap", None):
                nsmap.update(el.nsmap)
    nsmap["xml"] = "http://www.w3.org/XML/1998/namespace"
    out = []
    for p, uri in sorted(nsmap.items()):
        if not uri:  # xmlns="" un-declaration removes the binding
            continue
        out.append(Node(NSNODE, tag=p, value=uri, parent=node,
                        order=node.order))
    return out


def _axis_nodes(node: Node, axis: str):
    if axis == "child":
        return list(node.children)
    if axis == "namespace":
        return _namespace_nodes(node)
    if axis == "attribute":
        return list(node.attrs)
    if axis == "self":
        return [node]
    if axis == "parent":
        return [node.parent] if node.parent else []
    if axis == "ancestor":
        out = []
        p = node.parent
        while p:
            out.append(p)
            p = p.parent
        return out
    if axis == "ancestor-or-self":
        out = [node]
        p = node.parent
        while p:
            out.append(p)
            p = p.parent
        return out
    if axis in ("descendant", "descendant-or-self"):
        out = [node] if axis == "descendant-or-self" else []
        stack = list(reversed(node.children))
        while stack:
            n = stack.pop()
            out.append(n)
            if n.kind == ELEM:
                stack.extend(reversed(n.children))
        return out
    if axis in ("following-sibling", "preceding-sibling"):
        if node.parent is None or node.kind == ATTR:
            return []
        sibs = node.parent.children
        i = next((j for j, s in enumerate(sibs) if s is node), None)
        if i is None:
            return []
        return sibs[i + 1:] if axis == "following-sibling" else \
            list(reversed(sibs[:i]))
    if axis in ("following", "preceding"):
        root = node
        while root.parent:
            root = root.parent
        everything = _axis_nodes(root, "descendant")
        anc = set(id(a) for a in _axis_nodes(node, "ancestor-or-self"))
        desc = set(id(d) for d in _axis_nodes(node, "descendant-or-self"))
        if axis == "following":
            return [n for n in everything
                    if n.order > node.order and id(n) not in desc]
        return list(reversed([
            n for n in everything
            if n.order < node.order and id(n) not in anc
        ]))
    raise XPathError(f"unsupported axis {axis!r}")


_REVERSE_AXES = {"ancestor", "ancestor-or-self", "preceding",
                 "preceding-sibling", "parent"}


def _apply_preds(nodes, preds, ctx: Context, reverse=False):
    for pred in preds:
        size = len(nodes)
        kept = []
        for i, n in enumerate(nodes):
            sub = ctx.with_node(n, i + 1, size)
            v = _eval(pred, sub)
            ok = (i + 1) == v if isinstance(v, float) else _bool(v)
            if ok:
                kept.append(n)
        nodes = kept
    return nodes


def _eval_steps(start_nodes, steps, ctx: Context):
    nodes = start_nodes
    for axis, test, preds in steps:
        nxt = []
        for n in nodes:
            cand = [c for c in _axis_nodes(n, axis)
                    if _test_node(c, test, ctx.nsmap, axis)]
            # predicate position is along the axis direction per node
            cand = _apply_preds(cand, preds, ctx,
                                reverse=axis in _REVERSE_AXES)
            nxt.extend(cand)
        nodes = _doc_sort(nxt)
    return nodes


def _root_of(node: Node) -> Node:
    while node.parent:
        node = node.parent
    return node


def _eval(ast, ctx: Context):
    op = ast[0]
    if op == "lit":
        return ast[1]
    if op == "num":
        return ast[1]
    if op == "var":
        name = ast[1]
        if name not in ctx.vars:
            raise XPathError(f"unbound variable ${name}")
        return ctx.vars[name]
    if op == "or":
        return _bool(_eval(ast[1], ctx)) or _bool(_eval(ast[2], ctx))
    if op == "and":
        return _bool(_eval(ast[1], ctx)) and _bool(_eval(ast[2], ctx))
    if op == "neg":
        return -_num(_eval(ast[1], ctx))
    if op == "arith":
        _, o, a, b = ast
        x, y = _num(_eval(a, ctx)), _num(_eval(b, ctx))
        if o == "+":
            return x + y
        if o == "-":
            return x - y
        if o == "*":
            return x * y
        if o == "div":
            try:
                return x / y
            except ZeroDivisionError:
                if x == 0:
                    return float("nan")
                return float("inf") if x > 0 else float("-inf")
        if o == "mod":
            try:
                return float(
                    abs(x) % abs(y) * (1 if x >= 0 else -1)
                )
            except ZeroDivisionError:
                return float("nan")
    if op == "cmp":
        return _compare(ast[1], _eval(ast[2], ctx), _eval(ast[3], ctx))
    if op == "union":
        a, b = _eval(ast[1], ctx), _eval(ast[2], ctx)
        if not isinstance(a, list) or not isinstance(b, list):
            raise XPathError("union operands must be node-sets")
        return _doc_sort(a + b)
    if op == "path":
        _, absolute, steps = ast
        start = [_root_of(ctx.node)] if absolute else [ctx.node]
        return _eval_steps(start, steps, ctx)
    if op == "filter":
        _, primary, preds, steps = ast
        v = _eval(primary, ctx)
        if preds or steps:
            if not isinstance(v, list):
                raise XPathError("predicates/steps need a node-set operand")
            v = _apply_preds(list(v), preds, ctx)
            if steps:
                v = _eval_steps(v, steps, ctx)
        return v
    if op == "call":
        return _call(ast[1], ast[2], ctx)
    raise XPathError(f"bad AST node {op!r}")


def _compare(op, a, b):
    # nodeset comparisons are existential over string-values
    if isinstance(a, list) or isinstance(b, list):
        if isinstance(a, list) and isinstance(b, list):
            bs = {string_value(n) for n in b}
            return any(_cmp_vals(op, string_value(n), v2)
                       for n in a for v2 in bs)
        if isinstance(a, list):
            return any(_cmp_vals(op, string_value(n), b) for n in a)
        return any(_cmp_vals(op, a, string_value(n)) for n in b)
    return _cmp_vals(op, a, b)


def _cmp_vals(op, a, b):
    if op in ("<", "<=", ">", ">="):
        x, y = _num(a), _num(b)
        return {"<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y}[op]
    # = / != : bool > num > string precedence
    if isinstance(a, bool) or isinstance(b, bool):
        eq = _bool(a) == _bool(b)
    elif isinstance(a, float) or isinstance(b, float):
        eq = _num(a) == _num(b)
    else:
        eq = _str(a) == _str(b)
    return eq if op == "=" else not eq


_RE_FLAGS = {"i": re.IGNORECASE, "s": re.DOTALL, "m": re.MULTILINE,
             "x": re.VERBOSE}


def _re_flags(s: str) -> int:
    f = 0
    for ch in s:
        f |= _RE_FLAGS.get(ch, 0)
    return f


def _call(name, args, ctx: Context):
    def a(i):
        return _eval(args[i], ctx)

    n = len(args)
    if name == "last":
        return float(ctx.size)
    if name == "position":
        return float(ctx.pos)
    if name == "count":
        v = a(0)
        if not isinstance(v, list):
            raise XPathError("count() needs a node-set")
        return float(len(v))
    if name in ("local-name", "name", "namespace-uri"):
        nodes = a(0) if n else [ctx.node]
        if not nodes:
            return ""
        node = nodes[0]
        uri, local = node.ns_local()
        if name == "local-name":
            return local
        if name == "namespace-uri":
            return uri
        return node.qname()
    if name == "string":
        return _str(a(0)) if n else string_value(ctx.node)
    if name == "concat":
        return "".join(_str(a(i)) for i in range(n))
    if name == "starts-with":
        return _str(a(0)).startswith(_str(a(1)))
    if name == "ends-with":
        return _str(a(0)).endswith(_str(a(1)))
    if name == "contains":
        return _str(a(1)) in _str(a(0))
    if name == "substring-before":
        s, sep = _str(a(0)), _str(a(1))
        i = s.find(sep)
        return s[:i] if i >= 0 else ""
    if name == "substring-after":
        s, sep = _str(a(0)), _str(a(1))
        i = s.find(sep)
        return s[i + len(sep):] if i >= 0 else ""
    if name == "substring":
        s = _str(a(0))
        start = _num(a(1))
        if start != start:
            return ""
        start = round(start)
        if n > 2:
            length = _num(a(2))
            if length != length:
                return ""
            end = start + round(length)
        else:
            end = float("inf")
        return "".join(
            ch for i, ch in enumerate(s, 1) if start <= i < end
        )
    if name == "string-length":
        return float(len(_str(a(0)) if n else string_value(ctx.node)))
    if name == "normalize-space":
        s = _str(a(0)) if n else string_value(ctx.node)
        return " ".join(s.split())
    if name == "translate":
        s, frm, to = _str(a(0)), _str(a(1)), _str(a(2))
        table = {}
        for i, ch in enumerate(frm):
            if ch not in table:
                table[ch] = to[i] if i < len(to) else None
        return "".join(
            table.get(ch, ch) for ch in s if table.get(ch, ch) is not None
        )
    if name == "boolean":
        return _bool(a(0))
    if name == "not":
        return not _bool(a(0))
    if name == "true":
        return True
    if name == "false":
        return False
    if name == "number":
        return _num(a(0)) if n else _num(string_value(ctx.node))
    if name == "sum":
        v = a(0)
        if not isinstance(v, list):
            raise XPathError("sum() needs a node-set")
        return float(sum(_num(string_value(x)) for x in v))
    if name == "floor":
        import math
        return float(math.floor(_num(a(0))))
    if name == "ceiling":
        import math
        return float(math.ceil(_num(a(0))))
    if name == "round":
        import math
        x = _num(a(0))
        if x != x:
            return x
        return float(math.floor(x + 0.5))
    if name == "current":
        return [ctx.current]
    if name == "generate-id":
        nodes = a(0) if n else [ctx.node]
        return f"id{id(nodes[0]):x}" if nodes else ""
    if name == "key":
        # index built by the XSLT layer from xsl:key declarations and
        # threaded through the (shared) variable bindings under a reserved
        # name — XSLT 1.0 forbids variable references inside xsl:key
        # match/use, so the name cannot collide with user bindings
        kname = _str(a(0))
        idx = ctx.vars.get("__xslt_keys__", {}).get(kname)
        if idx is None:
            raise XPathError(f"key {kname!r} is not declared")
        v = a(1)
        vals = (
            [string_value(x) for x in v]
            if isinstance(v, list)
            else [_str(v)]
        )
        out: list[Node] = []
        for val in vals:
            out.extend(idx.get(val, ()))
        return _doc_sort(out)
    # XPath 2.0 extras the reference stylesheets rely on (Saxon ran them)
    if name == "matches":
        flags = _re_flags(_str(a(2))) if n > 2 else 0
        return re.search(_str(a(1)), _str(a(0)), flags) is not None
    if name == "replace":
        flags = _re_flags(_str(a(3))) if n > 3 else 0
        return re.sub(_str(a(1)), _str(a(2)).replace("$", "\\"),
                      _str(a(0)), flags=flags)
    if name == "lower-case":
        return _str(a(0)).lower()
    if name == "upper-case":
        return _str(a(0)).upper()
    if name == "string-join":
        v = a(0)
        sep = _str(a(1)) if n > 1 else ""
        if isinstance(v, list):
            return sep.join(string_value(x) for x in v)
        return _str(v)
    if name == "tokenize":
        # XSLT 2.0 F&O: split by regex occurrences; result modeled as a
        # sequence of synthetic text nodes so 1.0-style node-set ops
        # (for-each, count, predicates, string()) compose with it
        s = _str(a(0))
        if n < 2:  # 2.0's single-arg form splits on whitespace
            return [Node(TEXT, value=t) for t in s.split()]
        flags = _re_flags(_str(a(2))) if n > 2 else 0
        pat = _str(a(1))
        if re.search(pat, "", flags):
            raise XPathError(
                f"tokenize() pattern {pat!r} matches a zero-length string"
            )
        if s == "":
            return []
        return [Node(TEXT, value=t) for t in re.split(pat, s, flags=flags)]
    if name == "current-group":
        g = ctx.vars.get("__current_group__")
        if g is None:
            raise XPathError("current-group() outside xsl:for-each-group")
        return list(g)
    if name == "current-grouping-key":
        k = ctx.vars.get("__current_grouping_key__")
        if k is None:
            raise XPathError(
                "current-grouping-key() outside xsl:for-each-group"
            )
        return k
    if name == "regex-group":
        groups = ctx.vars.get("__regex_groups__")
        if groups is None:
            raise XPathError("regex-group() outside xsl:matching-substring")
        i = int(_num(a(0)))
        return groups[i] if 0 <= i < len(groups) else ""
    if name == "format-number":
        fmts = ctx.vars.get("__decimal_formats__") or {"": DecimalFormat()}
        fname = _str(a(2)) if n > 2 else ""
        fmt = fmts.get(fname)
        if fmt is None:
            raise XPathError(f"decimal-format {fname!r} is not declared")
        return format_number(_num(a(0)), _str(a(1)), fmt)
    if name == "document":
        # no I/O in the engine: URIs resolve against the mapping injected
        # at construction (MicroXSLT(documents={uri: xml}); '' = the
        # stylesheet document, per spec) — the same offline-injection
        # policy as xsl:include/import
        docs = ctx.vars.get("__xslt_documents__")
        if docs is None:
            raise XPathError(
                "document() needs an injected mapping: "
                "MicroXSLT(..., documents={uri: xml_text})"
            )
        v = a(0)
        uris = (
            [string_value(x) for x in v] if isinstance(v, list) else [_str(v)]
        )
        out = []
        for u in uris:
            root = docs.get(u)
            if root is None:
                raise XPathError(
                    f"document({u!r}): URI not in the injected mapping"
                )
            out.append(root)
        return out
    raise XPathError(f"unknown function {name}()")


# ---------------------------------------------------------------------------
# Public compile API
# ---------------------------------------------------------------------------

class CompiledExpr:
    __slots__ = ("ast", "text")

    def __init__(self, ast, text):
        self.ast = ast
        self.text = text

    def evaluate(self, ctx: Context):
        return _eval(self.ast, ctx)

    def boolean(self, ctx: Context) -> bool:
        return _bool(self.evaluate(ctx))

    def string(self, ctx: Context) -> str:
        return _str(self.evaluate(ctx))

    def nodeset(self, ctx: Context) -> list[Node]:
        v = self.evaluate(ctx)
        if not isinstance(v, list):
            raise XPathError(f"{self.text!r} did not yield a node-set")
        return v


def compile_expr(expr: str) -> CompiledExpr:
    return CompiledExpr(_Parser(_tokenize(expr), expr).parse(), expr)


# XPath string() conversion for already-evaluated values (public alias)
to_string = _str


# ---------------------------------------------------------------------------
# Match patterns (XSLT match= / Schematron context=)
# ---------------------------------------------------------------------------

class CompiledPattern:
    """An XSLT pattern: '|'-separated alternatives, each a step chain
    matched right-to-left against a candidate node."""

    __slots__ = ("alts", "text")

    def __init__(self, alts, text):
        self.alts = alts   # list of (absolute, steps, default_priority)
        self.text = text

    def matches(self, node: Node, ctx: Context) -> bool:
        return any(
            self._match_alt(node, absolute, steps, ctx)
            for absolute, steps, _ in self.alts
        )

    def default_priority(self) -> float:
        # Highest alternative priority (engine splits alts per spec when
        # priorities matter; max is the conservative single value).
        return max(p for _, _, p in self.alts)

    def _match_alt(self, node, absolute, steps, ctx) -> bool:
        return self._match_from(node, steps, len(steps) - 1, absolute, ctx)

    def _match_from(self, node, steps, i, absolute, ctx) -> bool:
        if i < 0:
            return (not absolute) or (node is None) or (node.kind == ROOT)
        if node is None:
            return False
        axis, test, preds = steps[i]
        if axis == "descendant-or-self":
            # '//' marker step: some ancestor-or-self position continues
            p = node
            while p is not None:
                if self._match_from(p, steps, i - 1, absolute, ctx):
                    return True
                p = p.parent
            return False
        eff_axis = "attribute" if axis == "attribute" else "child"
        if not _test_node(node, test, ctx.nsmap, eff_axis):
            return False
        if preds:
            if node.kind == ATTR:
                sibs = list(node.parent.attrs) if node.parent else [node]
            elif node.parent is not None:
                sibs = [
                    s for s in node.parent.children
                    if _test_node(s, test, ctx.nsmap, eff_axis)
                ]
            else:
                sibs = [node]
            try:
                pos = next(j for j, s in enumerate(sibs) if s is node) + 1
            except StopIteration:
                pos = 1
            sub = ctx.with_node(node, pos, len(sibs))
            for pred in preds:
                v = _eval(pred, sub)
                ok = pos == v if isinstance(v, float) else _bool(v)
                if not ok:
                    return False
        parent = node.parent
        if i == 0:
            return (not absolute) or (
                parent is not None and parent.kind == ROOT
            ) or (absolute and self._alt_rooted_ok(steps, parent))
        return self._match_from(parent, steps, i - 1, absolute, ctx)

    @staticmethod
    def _alt_rooted_ok(steps, parent):
        return parent is not None and parent.kind == ROOT


def _steps_default_priority(absolute, steps) -> float:
    if absolute and not steps:
        return -0.5   # match="/"
    if len(steps) != 1 or absolute:
        return 0.5
    axis, test, preds = steps[0]
    if preds:
        return 0.5
    kind = test[0]
    if kind == "name":
        name = test[1]
        if name == "*":
            return -0.5
        if name.endswith(":*"):
            return -0.25
        return 0.0
    if kind == "processing-instruction" and len(test) > 1 and test[1]:
        return 0.0
    return -0.5


def compile_pattern(pattern: str) -> CompiledPattern:
    """Compile an XSLT match pattern.  Only child/attribute axes and the
    '//' abbreviation are legal in patterns (XSLT 1.0 §5.2)."""
    alts = []
    for alt_ast in _split_union(_Parser(_tokenize(pattern), pattern).parse()):
        if alt_ast[0] != "path":
            raise XPathError(f"not a pattern: {pattern!r}")
        _, absolute, steps = alt_ast
        for axis, test, preds in steps:
            if axis not in ("child", "attribute", "descendant-or-self",
                            "self"):
                raise XPathError(
                    f"axis {axis!r} not allowed in pattern {pattern!r}"
                )
        alts.append((absolute, steps,
                     _steps_default_priority(absolute, steps)))
    return CompiledPattern(alts, pattern)


def _split_union(ast):
    if ast[0] == "union":
        return _split_union(ast[1]) + _split_union(ast[2])
    return [ast]
