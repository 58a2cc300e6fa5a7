"""Random mtail program generator — dev-tooling parity with the
reference's cmd/mgen (a grammar-driven fuzz emitter, cmd/mgen/
main.go): `wild` mode walks a similar grammar producing syntax soup
to harden the parser/checker (clean errors, never crashes); `valid`
mode composes typed fragments into programs that must compile, so
the vectorized backend can be cross-checked against the fold on
sample inputs (tests/test_mgen.py).

Usage: python tools/mgen.py [--mode wild|valid] [--seed N] [--n N]
"""

from __future__ import annotations

import argparse
import random

# ------------------------------------------------------------- wild mode

_GRAMMAR = {
    "start": [["stmt_list"]],
    "stmt_list": [[""], ["stmt_list", "stmt"]],
    "stmt": [
        ["cond", " {\n", "stmt_list", "}\n"],
        ["expr", "\n"],
        ["decl", "\n"],
        ["def ", "ID", " {\n", "stmt_list", "}\n"],
        ["@", "ID", " {\n", "stmt_list", "}\n"],
        ["next\n"],
        ["stop\n"],
        ["const ", "ID", " ", "pattern_expr", "\n"],
        ["del ", "ID", "[", "primary", "]\n"],
    ],
    "expr": [
        ["rel_expr"],
        ["postfix", " = ", "rel_expr"],
        ["postfix", " += ", "rel_expr"],
    ],
    "rel_expr": [
        ["add_expr"],
        ["add_expr", "RELOP", "add_expr"],
    ],
    "RELOP": [[" < "], [" > "], [" <= "], [" >= "], [" == "], [" != "]],
    "add_expr": [
        ["unary"],
        ["add_expr", " + ", "unary"],
        ["add_expr", " - ", "unary"],
        ["add_expr", " * ", "unary"],
    ],
    "unary": [
        ["postfix"],
        ["BUILTIN", "(", "args", ")"],
        ["!", "unary"],
    ],
    "args": [[""], ["expr"], ["args", ", ", "expr"]],
    "postfix": [
        ["primary"],
        ["postfix", "++"],
        ["postfix", "[", "expr", "]"],
    ],
    "primary": [["ID"], ["CAPREF"], ["STRING"], ["(", "expr", ")"],
                ["NUM"]],
    "cond": [["pattern_expr"], ["rel_expr"], ["OTW"]],
    "pattern_expr": [
        ["REGEX"],
        ["pattern_expr", " + ", "REGEX"],
        ["pattern_expr", " + ", "ID"],
    ],
    "decl": [["HIDE", "KIND", " ", "ID", "BY", "AS"]],
    "HIDE": [[""], ["hidden "]],
    "KIND": [["counter"], ["gauge"], ["timer"], ["text"],
             ["histogram"]],
    "BY": [[""], [" by ", "ID"], [" by ", "ID", ", ", "ID"]],
    "AS": [[""], [' as "', "ID", '"']],
    "ID": [["a"], ["bb"], ["ccc"], ["x"], ["metric1"]],
    "CAPREF": [["$1"], ["$0"], ["$name"], ["$2"]],
    "STRING": [['"str"'], ['""'], ['"x y"']],
    "NUM": [["0"], ["1"], ["42"], ["3.14"], ["-7"]],
    "REGEX": [
        ["/foo/"], ["/(\\d+)/"], ["/(?P<name>\\w+)/"],
        ["/a|b/"], ["/.*/"], ["/(/"],  # incl. one invalid regex
    ],
    "BUILTIN": [["timestamp"], ["len"], ["tolower"], ["strptime"],
                ["getfilename"], ["strtol"], ["subst"], ["settime"]],
    "OTW": [["otherwise"]],
}


def wild(rng: random.Random, max_depth: int = 12) -> str:
    def expand(sym: str, depth: int) -> str:
        alts = _GRAMMAR.get(sym)
        if alts is None:
            return sym
        if depth > max_depth:
            # steer to the shortest alternative to terminate
            alts = [min(alts, key=len)]
        return "".join(
            expand(part, depth + 1) for part in rng.choice(alts)
        )

    return expand("start", 0)


# ------------------------------------------------------------ valid mode

_KINDS = ["counter", "gauge", "histogram", "text", "timer"]


def valid(rng: random.Random) -> str:
    """Compose a well-typed program: every generated program must
    compile (asserted by the test), most vectorize."""
    n_metrics = rng.randint(1, 4)
    decls, stmts = [], []
    for i in range(n_metrics):
        kind = rng.choice(_KINDS)
        name = f"m{i}"
        by = rng.choice(["", " by tag"]) if kind != "text" else ""
        buckets = " buckets 1, 10, 100" if kind == "histogram" else ""
        decls.append(f"{kind} {name}{by}{buckets}")
        label = "[$tag]" if by else ""
        if kind == "counter":
            op = rng.choice(
                [f"{name}{label}++", f"{name}{label} += $n"]
            )
        elif kind in ("gauge", "timer"):
            op = rng.choice(
                [f"{name}{label} = $n", f"{name}{label} = $n * 2"]
            )
        elif kind == "histogram":
            op = f"{name}{label} = $n"
        else:  # text
            op = f"{name} = $tag"
        stmts.append(op)
    guard = rng.choice(
        ["", "  $n > 10 {\n    %s\n  }\n" % stmts[0]]
    )
    body = "\n  ".join(stmts)
    return (
        "\n".join(decls)
        + "\n\n/^(?P<tag>[a-z]+) (?P<n>\\d+)/ {\n  "
        + body
        + "\n"
        + guard
        + "}\n"
    )


def main():
    ap = argparse.ArgumentParser(prog="mgen")
    ap.add_argument("--mode", choices=["wild", "valid"], default="wild")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--n", type=int, default=1)
    args = ap.parse_args()
    rng = random.Random(args.seed)
    for _ in range(args.n):
        gen = wild if args.mode == "wild" else valid
        print(gen(rng))
        print("# ---")


if __name__ == "__main__":
    main()
