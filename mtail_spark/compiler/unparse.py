"""Program formatter and AST graph dump — dev-tooling parity with the
reference's cmd/mfmt (parser/unparser.go) and cmd/mdot (cmd/mdot/
main.go): `unparse` converts a parsed program back to canonical
source text (2-space indent, one statement per line); `to_dot` emits
a graphviz digraph of the AST.

Both operate on the PARSED tree (pre-check), so hidden/as/limit
clauses and const pattern references are preserved verbatim — the
reference unparser drops `hidden`/`as`, which makes its output
lossy; re-parsability is the contract here (format(format(x)) ==
format(x) and parse(format(x)) equivalent to parse(x), tested in
tests/test_unparse.py)."""

from __future__ import annotations

from mtail_spark.compiler import ast as A

_BINOPS = {
    "<", ">", "<=", ">=", "==", "!=", "<<", ">>", "&", "|", "^",
    "&&", "||", "+", "-", "*", "/", "**", "=", "+=", "%", "=~", "!~",
}


def _dur(seconds: float) -> str:
    """Go time.Duration-style rendering: 3600 -> 1h0m0s, 90 -> 1m30s,
    0.3 -> 300ms (how the reference prints `del ... after`)."""
    if seconds <= 0:
        return "0s"
    if seconds < 1:
        ms = seconds * 1000
        if ms >= 1 or ms == int(ms):
            return f"{ms:g}ms"
        return f"{seconds * 1e6:g}us"
    s = int(seconds)
    frac = seconds - s
    h, rem = divmod(s, 3600)
    m, sec = divmod(rem, 60)
    sec_s = f"{sec + frac:g}s"
    if h:
        return f"{h}h{m}m{sec_s}"
    if m:
        return f"{m}m{sec_s}"
    return sec_s


def _float_lit(v: float, bucket: bool = False) -> str:
    """Shortest round-trip rendering (Python repr semantics): %g
    truncates to 6 significant digits, so `fmt --write` on a program
    with 0.123456789 would silently change the value — breaking the
    semantics-preserving contract.  repr() emits the shortest string
    that parses back to exactly v, and its output (digits, optional
    '.', optional e-exponent) is accepted by the lexer's _NUM_RE.

    bucket=True renders integral values as bare ints (`buckets 1, 10`):
    bucket bounds are parsed to float either way, so the int form is
    value-preserving there — while a FloatLit in an expression must
    keep its `.0` (the INT/FLOAT token distinction feeds type
    inference)."""
    if bucket and float(v).is_integer() and abs(v) < 1e16:
        return str(int(v))
    return repr(float(v))


def _pat_lit(text: str) -> str:
    return "/" + text.replace("/", "\\/") + "/"


def _str_lit(text: str) -> str:
    return '"' + text.replace("\\", "\\\\").replace('"', '\\"') + '"'


class Unparser:
    def __init__(self):
        self.pos = 0
        self.out: list[str] = []
        self.line: list[str] = []

    def emit(self, s: str) -> None:
        self.line.append(s)

    def newline(self) -> None:
        self.out.append(" " * self.pos + "".join(self.line))
        self.line = []

    # ------------------------------------------------------------ nodes

    def node(self, n) -> None:
        getattr(self, "_" + type(n).__name__, self._unknown)(n)

    def _unknown(self, n):
        raise NotImplementedError(f"unparse: {type(n).__name__}")

    def _block(self, stmts: A.StmtList) -> None:
        self.emit("{")
        self.newline()
        self.pos += 2
        self._StmtList(stmts)
        self.pos -= 2

    def _StmtList(self, n: A.StmtList) -> None:
        for s in n.stmts:
            self.node(s)
            self.newline()

    def _CondStmt(self, n: A.CondStmt) -> None:
        if n.cond is not None:
            self.node(n.cond)
            self.emit(" ")
        self._block(n.truth)
        if n.els is not None:
            self.emit("} else ")
            self._block(n.els)
        self.emit("}")

    def _OtherwiseCond(self, n) -> None:
        self.emit("otherwise")

    def _ExprStmt(self, n: A.ExprStmt) -> None:
        self.node(n.expr)

    def _VarDecl(self, n: A.VarDecl) -> None:
        if n.hidden:
            self.emit("hidden ")
        self.emit(f"{n.kind} {n.name}")
        if n.keys:
            self.emit(" by " + ", ".join(n.keys))
        if n.exported_name is not None:
            self.emit(" as " + _str_lit(n.exported_name))
        if n.buckets:
            self.emit(" buckets " + ", ".join(
                _float_lit(b, bucket=True) for b in n.buckets
            ))
        if n.limit:
            self.emit(f" limit {n.limit}")

    def _ConstDef(self, n: A.ConstDef) -> None:
        self.emit(f"const {n.name} ")
        self.node(n.pattern)

    def _DecoDecl(self, n: A.DecoDecl) -> None:
        self.emit(f"def {n.name} ")
        self._block(n.block)
        self.emit("}")

    def _DecoStmt(self, n: A.DecoStmt) -> None:
        self.emit(f"@{n.name} ")
        self._block(n.block)
        self.emit("}")

    def _NextStmt(self, n) -> None:
        self.emit("next")

    def _StopStmt(self, n) -> None:
        self.emit("stop")

    def _DelStmt(self, n: A.DelStmt) -> None:
        self.emit("del ")
        self.node(n.target)
        if n.expiry_s:
            self.emit(" after " + _dur(n.expiry_s))

    # ------------------------------------------------------ expressions

    def _PatternLit(self, n: A.PatternLit) -> None:
        parts = n.parts if n.parts else [n.pattern or ""]
        rendered = [
            p.name if isinstance(p, A.IdTerm) else _pat_lit(p)
            for p in parts
        ]
        self.emit(" + ".join(rendered))

    def _IdTerm(self, n: A.IdTerm) -> None:
        self.emit(n.name)

    def _Capref(self, n: A.Capref) -> None:
        self.emit("$" + n.ref)

    def _IntLit(self, n: A.IntLit) -> None:
        self.emit(str(n.value))

    def _FloatLit(self, n: A.FloatLit) -> None:
        self.emit(_float_lit(n.value))

    def _StringLit(self, n: A.StringLit) -> None:
        self.emit(_str_lit(n.value))

    def _IndexedExpr(self, n: A.IndexedExpr) -> None:
        self.node(n.lhs)
        if n.index:
            self.emit("[")
            for i, e in enumerate(n.index):
                if i:
                    self.emit(", ")
                self.node(e)
            self.emit("]")

    def _BinaryExpr(self, n: A.BinaryExpr) -> None:
        self.node(n.lhs)
        if n.op not in _BINOPS:
            raise NotImplementedError(f"unparse binary op {n.op!r}")
        self.emit(f" {n.op} ")
        self.node(n.rhs)

    def _UnaryExpr(self, n: A.UnaryExpr) -> None:
        if n.op in ("++", "--"):
            self.node(n.expr)
            self.emit(n.op)
        elif n.op in ("!", "~"):
            self.emit(n.op)
            self.node(n.expr)
        elif n.op == "MATCH":
            self.node(n.expr)
        else:
            raise NotImplementedError(f"unparse unary op {n.op!r}")

    def _BuiltinCall(self, n: A.BuiltinCall) -> None:
        self.emit(n.name + "(")
        for i, a in enumerate(n.args):
            if i:
                self.emit(", ")
            self.node(a)
        self.emit(")")


def unparse(stmts: A.StmtList) -> str:
    u = Unparser()
    u._StmtList(stmts)
    return "\n".join(u.out) + ("\n" if u.out else "")


def format_source(source: str, name: str = "prog.mtail") -> str:
    """Parse + reformat program text (cmd/mfmt)."""
    from mtail_spark.compiler.parser import parse

    return unparse(parse(source))


# ------------------------------------------------------------------ mdot


def _node_label(n) -> str:
    t = type(n).__name__
    for attr in ("name", "op", "ref", "kind"):
        v = getattr(n, attr, None)
        if v:
            return f"{t}\\n{v}"
    v = getattr(n, "value", None)
    if v is not None and not isinstance(v, list):
        s = str(v).replace("\\", "\\\\").replace('"', '\\"')
        return f"{t}\\n{s[:24]}"
    if isinstance(n, A.PatternLit) and n.pattern:
        s = n.pattern.replace("\\", "\\\\").replace('"', '\\"')
        return f"{t}\\n{s[:24]}"
    return t


def to_dot(stmts: A.StmtList, title: str = "prog") -> str:
    """Graphviz digraph of the AST (cmd/mdot: one box per node, an
    edge per parent-child relation)."""
    lines = [f'digraph "{title}" {{', "  node [shape=box, style=filled];"]
    counter = [0]

    def visit(n) -> int:
        nid = counter[0]
        counter[0] += 1
        lines.append(f'  n{nid} [label="{_node_label(n)}"];')
        for f in vars(n).values():
            kids = f if isinstance(f, list) else [f]
            for k in kids:
                if isinstance(k, A.Node):
                    lines.append(f"  n{nid} -> n{visit(k)};")
        return nid

    visit(stmts)
    lines.append("}")
    return "\n".join(lines) + "\n"


def dot_source(source: str, name: str = "prog.mtail") -> str:
    from mtail_spark.compiler.parser import parse

    return to_dot(parse(source), title=name)
