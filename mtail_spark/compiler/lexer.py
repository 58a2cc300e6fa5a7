"""Lexer for the mtail DSL.

Token inventory follows the reference lexer (reference
internal/runtime/compiler/parser/lexer.go): newline-terminated
statements, `#` comments, string/int/float/duration literals, caprefs,
decorator refs, and a regex mode entered by the parser when a `/` is
expected to start a pattern (the `in_regex` marker nonterminal in
parser.y:717-725).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "counter", "gauge", "timer", "text", "histogram", "hidden", "by", "as",
    "buckets", "limit", "def", "next", "const", "otherwise", "else", "del",
    "after", "stop",
}

BUILTINS = {
    "bool", "float", "getfilename", "int", "len", "settime", "string",
    "strptime", "strtol", "subst", "timestamp", "tolower",
}

_OPS = [
    "**", "<<", ">>", "<=", ">=", "==", "!=", "=~", "!~", "&&", "||",
    "++", "--", "+=", "{", "}", "(", ")", "[", "]", ",", "<", ">", "=",
    "+", "-", "*", "/", "%", "&", "|", "^", "!", "~",
]

_ID_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM_RE = re.compile(r"\d+(\.\d+)?([eE][+-]?\d+)?")
_DURATION_RE = re.compile(r"\d+(\.\d+)?(ns|us|µs|ms|s|m|h)(\d+(\.\d+)?(ns|us|µs|ms|s|m|h))*")
_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")

_DUR_SECONDS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0,
    "h": 3600.0,
}


class LexError(SyntaxError):
    pass


@dataclass
class Token:
    kind: str  # NL ID KEYWORD BUILTIN CAPREF CAPREF_NAMED DECO STRING INT FLOAT DURATION OP EOF REGEX
    text: str
    pos: int
    value: object = None


def parse_duration_s(text: str) -> float:
    total = 0.0
    for num, unit in _DUR_PART.findall(text):
        total += float(num) * _DUR_SECONDS[unit]
    return total


class Lexer:
    def __init__(self, src: str):
        self.src = src
        self.pos = 0

    def _skip_ws(self):
        src, n = self.src, len(self.src)
        while self.pos < n:
            c = src[self.pos]
            if c in " \t\r":
                self.pos += 1
            elif c == "#":
                while self.pos < n and src[self.pos] != "\n":
                    self.pos += 1
            else:
                break

    def next(self) -> Token:
        self._skip_ws()
        src, n = self.src, len(self.src)
        p = self.pos
        if p >= n:
            return Token("EOF", "", p)
        c = src[p]
        if c == "\n":
            self.pos += 1
            return Token("NL", "\n", p)
        if c == '"':
            return self._string()
        if c == "$":
            m = re.match(r"\$(\d+|[A-Za-z_][A-Za-z0-9_]*)", src[p:])
            if not m:
                raise LexError(f"bad capref at {p}")
            self.pos = p + m.end()
            ref = m.group(1)
            named = not ref.isdigit()
            return Token("CAPREF_NAMED" if named else "CAPREF", ref, p)
        if c == "@":
            m = re.match(r"@([A-Za-z_][A-Za-z0-9_]*)", src[p:])
            if not m:
                raise LexError(f"bad decorator ref at {p}")
            self.pos = p + m.end()
            return Token("DECO", m.group(1), p)
        if c.isdigit():
            m = _DURATION_RE.match(src, p)
            if m and m.group(2):
                self.pos = m.end()
                return Token(
                    "DURATION", m.group(0), p, parse_duration_s(m.group(0))
                )
            m = _NUM_RE.match(src, p)
            self.pos = m.end()
            text = m.group(0)
            if "." in text or "e" in text or "E" in text:
                return Token("FLOAT", text, p, float(text))
            return Token("INT", text, p, int(text))
        m = _ID_RE.match(src, p)
        if m:
            self.pos = m.end()
            word = m.group(0)
            if word in KEYWORDS:
                return Token("KEYWORD", word, p)
            if word in BUILTINS:
                return Token("BUILTIN", word, p)
            return Token("ID", word, p)
        for op in _OPS:
            if src.startswith(op, p):
                self.pos = p + len(op)
                return Token("OP", op, p)
        raise LexError(f"unexpected character {c!r} at {p}")

    def _string(self) -> Token:
        src, n = self.src, len(self.src)
        p = self.pos
        i = p + 1
        out = []
        while i < n:
            c = src[i]
            if c == "\\" and i + 1 < n:
                nxt = src[i + 1]
                out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(nxt, "\\" + nxt))
                i += 2
            elif c == '"':
                self.pos = i + 1
                return Token("STRING", src[p : i + 1], p, "".join(out))
            else:
                out.append(c)
                i += 1
        raise LexError(f"unterminated string at {p}")

    def read_regex(self) -> Token:
        """Called by the parser immediately after consuming a `/` that
        starts a pattern: consume until the closing unescaped `/`.
        `\\/` unescapes to `/`; all other escapes pass through to the
        pattern payload (reference lexer regex mode)."""
        src, n = self.src, len(self.src)
        p = self.pos
        i = p
        out = []
        while i < n:
            c = src[i]
            if c == "\\" and i + 1 < n:
                if src[i + 1] == "/":
                    out.append("/")
                else:
                    out.append(c + src[i + 1])
                i += 2
            elif c == "/":
                self.pos = i + 1
                return Token("REGEX", src[p:i], p, "".join(out))
            elif c == "\n":
                raise LexError(f"newline in regex at {i}")
            else:
                out.append(c)
                i += 1
        raise LexError(f"unterminated regex at {p}")
