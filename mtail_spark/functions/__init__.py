"""mtail builtin functions as Spark Column functions.

Each mtail builtin (reference lexer list internal/runtime/compiler/
parser/lexer.go:42-55, VM semantics internal/runtime/vm/vm.go) maps to
a JVM-side Column expression — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mt_len(col: Column) -> Column:
    """len(s) — reference vm.go:823-830."""
    return F.length(col).cast("long")


def mt_tolower(col: Column) -> Column:
    """tolower(s) — reference vm.go:814-821."""
    return F.lower(col)


def mt_subst(old: str, new: str, col: Column) -> Column:
    """subst("old", "new", val) — literal replace-all
    (reference vm.go:920-936, strings.ReplaceAll semantics)."""
    return F.replace(col, F.lit(old), F.lit(new))


def mt_rsubst(pattern: str, new: str, col: Column) -> Column:
    """subst(/re/, "new", val) — regex replace with LITERAL
    replacement (reference vm.go:937-953 uses
    ReplaceAllLiteralString), so escape $ and \\ in the replacement
    which regexp_replace would otherwise treat as group references."""
    literal = new.replace("\\", "\\\\").replace("$", "\\$")
    return F.regexp_replace(col, pattern, literal)


def mt_strtol(col: Column, base: int) -> Column:
    """strtol(s, base) — reference vm.go:832-858."""
    return F.conv(col, base, 10).cast("long")


def mt_getfilename(filename_col: Column) -> Column:
    """getfilename() — reference vm.go:904-905; the engine carries the
    source path as the filename column of the log_lines relation."""
    return filename_col


def capref(line: Column, pattern: str, group: int) -> Column:
    """$n — capture group extraction (reference vm.go:610-629).
    Returns NULL (not "") when the pattern does not match, mirroring
    the runtime-error-kills-line-only rule (vm.go:97-129)."""
    extracted = F.regexp_extract(line, pattern, group)
    return F.when(line.rlike(pattern), extracted)
