"""Recursive-descent parser for the mtail DSL, following the reference
grammar's precedence chain (reference
internal/runtime/compiler/parser/parser.y:88-733):

    logical (&& ||)  <  bitwise (& | ^)  <  relational  <  shift
    <  additive  <  multiplicative (* / % **)  <  unary (!)
    <  postfix (++ --)  <  primary

Pattern literals are lexed on demand (regex mode) at the positions the
grammar marks with `in_regex`.
"""

from __future__ import annotations

from mtail_spark.compiler import ast as A
from mtail_spark.compiler.lexer import Lexer, Token

DECL_KINDS = {"counter", "gauge", "timer", "text", "histogram"}


class ParseError(SyntaxError):
    pass


class Parser:
    def __init__(self, src: str):
        self.lx = Lexer(src)
        self._buf: Token | None = None

    # ------------------------------------------------------------ plumbing

    def peek(self) -> Token:
        if self._buf is None:
            self._buf = self.lx.next()
        return self._buf

    def advance(self) -> Token:
        t = self.peek()
        self._buf = None
        return t

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.advance()
        if t.kind != kind or (text is not None and t.text != text):
            raise ParseError(
                f"expected {text or kind}, got {t.kind} {t.text!r} at {t.pos}"
            )
        return t

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.text in ops

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.text in kws

    def skip_nl(self):
        while self.peek().kind == "NL":
            self.advance()

    def opt_nl(self):
        # An operand must follow the operator we just consumed, so all
        # blank/comment lines in between are skippable.
        self.skip_nl()

    def read_regex_lit(self) -> str:
        """Consume a '/' then the regex payload until the closing '/'."""
        assert self._buf is not None and self._buf.kind == "OP" and self._buf.text == "/"
        self._buf = None  # the '/' was already lexed; lexer.pos is after it
        tok = self.lx.read_regex()
        return tok.value

    # ------------------------------------------------------------- program

    def parse_program(self) -> A.StmtList:
        stmts = self.parse_stmt_list(top=True)
        if self.peek().kind != "EOF":
            t = self.peek()
            raise ParseError(f"unexpected {t.kind} {t.text!r} at {t.pos}")
        return stmts

    def parse_stmt_list(self, top: bool = False) -> A.StmtList:
        out = A.StmtList()
        while True:
            self.skip_nl()
            t = self.peek()
            if t.kind == "EOF" or (t.kind == "OP" and t.text == "}"):
                return out
            s = self.parse_stmt()
            if s is not None:
                out.stmts.append(s)

    def parse_stmt(self):
        t = self.peek()
        if t.kind == "KEYWORD":
            if t.text == "hidden" or t.text in DECL_KINDS:
                return self.parse_decl()
            if t.text == "def":
                self.advance()
                name = self.expect("ID").text
                self.skip_nl()
                block = self.parse_compound()
                return A.DecoDecl(pos=t.pos, name=name, block=block)
            if t.text == "del":
                self.advance()
                target = self.parse_postfix()
                expiry = None
                if self.at_kw("after"):
                    self.advance()
                    expiry = self.expect("DURATION").value
                return A.DelStmt(pos=t.pos, target=target, expiry_s=expiry)
            if t.text == "next":
                self.advance()
                return A.NextStmt(pos=t.pos)
            if t.text == "stop":
                self.advance()
                return A.StopStmt(pos=t.pos)
            if t.text == "const":
                self.advance()
                name = self.expect("ID").text
                self.opt_nl()
                pat = self.parse_pattern_expr()
                return A.ConstDef(pos=t.pos, name=name, pattern=pat)
            if t.text == "otherwise":
                self.advance()
                self.skip_nl()
                block = self.parse_compound()
                return A.CondStmt(
                    pos=t.pos, cond=A.OtherwiseCond(pos=t.pos), truth=block
                )
        if t.kind == "DECO":
            self.advance()
            self.skip_nl()
            block = self.parse_compound()
            return A.DecoStmt(pos=t.pos, name=t.text, block=block)
        # conditional statement or expression statement
        cond = self.parse_conditional_expr()
        if self.at_op("{"):
            truth = self.parse_compound()
            els = None
            if self.at_kw("else"):
                self.advance()
                self.skip_nl()
                els = self.parse_compound()
            return A.CondStmt(pos=t.pos, cond=cond, truth=truth, els=els)
        if self.peek().kind in ("NL", "EOF") or self.at_op("}"):
            # NL-terminated per the reference grammar; also accept `}`
            # / EOF so single-line blocks `{ x++ }` parse
            if self.peek().kind == "NL":
                self.advance()
            return A.ExprStmt(pos=t.pos, expr=cond)
        bad = self.peek()
        raise ParseError(f"unexpected {bad.kind} {bad.text!r} at {bad.pos}")

    def parse_compound(self) -> A.StmtList:
        self.expect("OP", "{")
        body = self.parse_stmt_list()
        self.expect("OP", "}")
        return body

    # ---------------------------------------------------------- declarations

    def parse_decl(self) -> A.VarDecl:
        t = self.peek()
        hidden = False
        if self.at_kw("hidden"):
            hidden = True
            self.advance()
        kind_tok = self.advance()
        if kind_tok.kind != "KEYWORD" or kind_tok.text not in DECL_KINDS:
            raise ParseError(f"expected metric kind at {kind_tok.pos}")
        name_tok = self.advance()
        if name_tok.kind == "ID":
            name = name_tok.text
        elif name_tok.kind == "STRING":
            name = name_tok.value
        else:
            raise ParseError(f"expected metric name at {name_tok.pos}")
        d = A.VarDecl(pos=t.pos, name=name, kind=kind_tok.text, hidden=hidden)
        while True:
            if self.at_kw("by"):
                self.advance()
                keys = [self._id_or_string()]
                while self.at_op(","):
                    self.advance()
                    keys.append(self._id_or_string())
                d.keys = keys
            elif self.at_kw("as"):
                self.advance()
                d.exported_name = self.expect("STRING").value
            elif self.at_kw("buckets"):
                self.advance()
                vals = [self._number()]
                while self.at_op(","):
                    self.advance()
                    vals.append(self._number())
                d.buckets = vals
            elif self.at_kw("limit"):
                self.advance()
                d.limit = self.expect("INT").value
            else:
                break
        return d

    def _id_or_string(self) -> str:
        t = self.advance()
        if t.kind == "ID":
            return t.text
        if t.kind == "STRING":
            return t.value
        raise ParseError(f"expected id or string at {t.pos}")

    def _number(self) -> float:
        t = self.advance()
        if t.kind in ("INT", "FLOAT"):
            return float(t.value)
        raise ParseError(f"expected number at {t.pos}")

    # ------------------------------------------------------------ conditions

    def parse_conditional_expr(self):
        if self.at_op("/"):
            pat = self.parse_pattern_expr()
            match = A.UnaryExpr(pos=pat.pos, op="MATCH", expr=pat)
            if self.at_op("&&", "||"):
                op = self.advance().text
                self.opt_nl()
                rhs = self.parse_logical()
                return A.BinaryExpr(pos=pat.pos, op=op, lhs=match, rhs=rhs)
            return match
        return self.parse_logical()

    def parse_pattern_expr(self) -> A.PatternLit:
        t = self.peek()
        parts: list = []
        if self.at_op("/"):
            parts.append(self.read_regex_lit())
        else:
            raise ParseError(f"expected pattern at {t.pos}")
        while self.at_op("+"):
            save = self.advance()
            self.opt_nl()
            if self.at_op("/"):
                parts.append(self.read_regex_lit())
            elif self.peek().kind == "ID":
                parts.append(A.IdTerm(pos=self.peek().pos, name=self.advance().text))
            else:
                raise ParseError(
                    f"expected regex or const after + at {save.pos}"
                )
        return A.PatternLit(pos=t.pos, parts=parts)

    # ----------------------------------------------------------- expressions

    def parse_logical(self):
        lhs = self.parse_match_or_bitwise()
        while self.at_op("&&", "||"):
            op = self.advance().text
            self.opt_nl()
            rhs = self.parse_match_or_bitwise()
            lhs = A.BinaryExpr(pos=lhs.pos, op=op, lhs=lhs, rhs=rhs)
        return lhs

    def parse_match_or_bitwise(self):
        if self.at_op("/"):
            # a bare pattern as a logical operand (e.g. nested in &&)
            pat = self.parse_pattern_expr()
            return A.UnaryExpr(pos=pat.pos, op="MATCH", expr=pat)
        lhs = self.parse_bitwise()
        if self.at_op("=~", "!~"):
            op = self.advance().text
            self.opt_nl()
            if self.at_op("/"):
                rhs = self.parse_pattern_expr()
            else:
                rhs = self.parse_primary()
            return A.BinaryExpr(pos=lhs.pos, op=op, lhs=lhs, rhs=rhs)
        return lhs

    def _binop_level(self, ops, next_level):
        lhs = next_level()
        while self.at_op(*ops):
            op = self.advance().text
            self.opt_nl()
            rhs = next_level()
            lhs = A.BinaryExpr(pos=lhs.pos, op=op, lhs=lhs, rhs=rhs)
        return lhs

    def parse_bitwise(self):
        return self._binop_level(("&", "|", "^"), self.parse_rel)

    def parse_rel(self):
        return self._binop_level(
            ("<", ">", "<=", ">=", "==", "!="), self.parse_shift
        )

    def parse_shift(self):
        return self._binop_level(("<<", ">>"), self.parse_additive)

    def parse_additive(self):
        return self._binop_level(("+", "-"), self.parse_mult)

    def parse_mult(self):
        return self._binop_level(("*", "/", "%", "**"), self.parse_unary)

    def parse_unary(self):
        if self.at_op("!"):
            t = self.advance()
            return A.UnaryExpr(pos=t.pos, op="!", expr=self.parse_unary())
        if self.at_op("~"):
            t = self.advance()
            return A.UnaryExpr(pos=t.pos, op="~", expr=self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while self.at_op("++", "--"):
            t = self.advance()
            e = A.UnaryExpr(pos=t.pos, op=t.text, expr=e)
        # assignment is right-recursive at statement level; handle here so
        # `m[x] = e` / `m += e` parse as part of any expression position
        if self.at_op("=", "+="):
            op = self.advance().text
            self.opt_nl()
            rhs = self.parse_logical()
            e = A.BinaryExpr(pos=e.pos, op=op, lhs=e, rhs=rhs)
        return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "CAPREF":
            self.advance()
            return A.Capref(pos=t.pos, ref=t.text, named=False)
        if t.kind == "CAPREF_NAMED":
            self.advance()
            return A.Capref(pos=t.pos, ref=t.text, named=True)
        if t.kind == "STRING":
            self.advance()
            return A.StringLit(pos=t.pos, value=t.value)
        if t.kind == "INT":
            self.advance()
            return A.IntLit(pos=t.pos, value=t.value)
        if t.kind == "FLOAT":
            self.advance()
            return A.FloatLit(pos=t.pos, value=t.value)
        if t.kind == "OP" and t.text == "-":
            # negative numeric literal (the reference folds the sign in
            # the optimizer; we fold at parse)
            self.advance()
            n = self.advance()
            if n.kind == "INT":
                return A.IntLit(pos=t.pos, value=-n.value)
            if n.kind == "FLOAT":
                return A.FloatLit(pos=t.pos, value=-n.value)
            raise ParseError(f"expected number after unary - at {t.pos}")
        if t.kind == "OP" and t.text == "(":
            self.advance()
            e = self.parse_logical()
            self.expect("OP", ")")
            return e
        if t.kind == "BUILTIN":
            self.advance()
            self.expect("OP", "(")
            args = []
            if not self.at_op(")"):
                args.append(self.parse_arg())
                while self.at_op(","):
                    self.advance()
                    args.append(self.parse_arg())
            self.expect("OP", ")")
            return A.BuiltinCall(pos=t.pos, name=t.text, args=args)
        if t.kind == "ID":
            self.advance()
            idx: list = []
            node = A.IndexedExpr(pos=t.pos, lhs=A.IdTerm(pos=t.pos, name=t.text), index=idx)
            while self.at_op("["):
                self.advance()
                idx.append(self.parse_arg())
                while self.at_op(","):
                    self.advance()
                    idx.append(self.parse_arg())
                self.expect("OP", "]")
            return node
        raise ParseError(f"unexpected {t.kind} {t.text!r} at {t.pos}")

    def parse_arg(self):
        if self.at_op("/"):
            return self.parse_pattern_expr()
        return self.parse_logical()


def parse(src: str) -> A.StmtList:
    return Parser(src).parse_program()
