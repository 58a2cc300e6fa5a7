"""AST for the mtail DSL.

Shapes mirror the reference grammar (reference
internal/runtime/compiler/parser/parser.y:88-733) but the tree is
designed for expression-DAG compilation, not bytecode emission.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    pos: int = field(default=0, compare=False)


# ------------------------------------------------------------- expressions


@dataclass
class IntLit(Node):
    value: int = 0


@dataclass
class FloatLit(Node):
    value: float = 0.0


@dataclass
class StringLit(Node):
    value: str = ""


@dataclass
class PatternLit(Node):
    """A regex literal or a +-concat of literals and const refs; parts
    resolved to a single pattern string by the checker."""

    parts: list = field(default_factory=list)  # str | IdTerm
    pattern: str | None = None  # resolved
    regex_id: int | None = None  # assigned by checker


@dataclass
class IdTerm(Node):
    name: str = ""


@dataclass
class Capref(Node):
    ref: str = ""  # "1" / "0" / name
    named: bool = False
    # resolved by checker:
    regex_id: int | None = None
    group: int | None = None
    vtype: str | None = None  # Int | Float | String


@dataclass
class IndexedExpr(Node):
    lhs: IdTerm | None = None
    index: list = field(default_factory=list)


@dataclass
class BinaryExpr(Node):
    op: str = ""
    lhs: object = None
    rhs: object = None


@dataclass
class UnaryExpr(Node):
    op: str = ""  # "!" | "++" | "--" | "MATCH"
    expr: object = None


@dataclass
class BuiltinCall(Node):
    name: str = ""
    args: list = field(default_factory=list)


@dataclass
class OtherwiseCond(Node):
    pass


# -------------------------------------------------------------- statements


@dataclass
class StmtList(Node):
    stmts: list = field(default_factory=list)


@dataclass
class CondStmt(Node):
    cond: object = None  # expr | PatternLit | OtherwiseCond | None
    truth: StmtList | None = None
    els: StmtList | None = None


@dataclass
class ExprStmt(Node):
    expr: object = None


@dataclass
class VarDecl(Node):
    name: str = ""
    kind: str = "counter"
    keys: list = field(default_factory=list)
    hidden: bool = False
    exported_name: str | None = None
    buckets: list = field(default_factory=list)
    limit: int | None = None
    vtype: str | None = None  # inferred by checker


@dataclass
class ConstDef(Node):
    name: str = ""
    pattern: PatternLit | None = None


@dataclass
class DecoDecl(Node):
    name: str = ""
    block: StmtList | None = None


@dataclass
class DecoStmt(Node):
    name: str = ""
    block: StmtList | None = None


@dataclass
class NextStmt(Node):
    pass


@dataclass
class StopStmt(Node):
    pass


@dataclass
class DelStmt(Node):
    target: IndexedExpr | None = None
    expiry_s: float | None = None


def walk(node):
    """Yield node and all descendants."""
    yield node
    for f in vars(node).values():
        if isinstance(f, Node):
            yield from walk(f)
        elif isinstance(f, list):
            for x in f:
                if isinstance(x, Node):
                    yield from walk(x)
