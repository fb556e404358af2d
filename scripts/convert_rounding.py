"""One-shot source transform: replace F.round(x, n) -> fround(x, n)
and SQL round(x, n) -> floor((x) * 1e{n} + 0.5) / 1e{n} in the plan
modules, paren-aware. Run once; kept for provenance."""

from __future__ import annotations

import re
import sys


def find_balanced(s: str, start: int) -> int:
    """index just past the matching ')' for the '(' at s[start]."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced")


def split_args_last_int(inner: str) -> tuple[str, int] | None:
    """split 'expr, N' at the top-level last comma if N is an int literal."""
    depth = 0
    for i in range(len(inner) - 1, -1, -1):
        c = inner[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
        elif c == "," and depth == 0:
            tail = inner[i + 1 :].strip()
            if re.fullmatch(r"\d+", tail):
                return inner[:i].rstrip(), int(tail)
            return None
    return None


def transform(src: str) -> str:
    # 1) F.round(expr, n) -> fround(expr, n)
    out = []
    i = 0
    while True:
        j = src.find("F.round(", i)
        if j < 0:
            out.append(src[i:])
            break
        end = find_balanced(src, j + len("F.round"))
        inner = src[j + len("F.round(") : end - 1]
        parsed = split_args_last_int(inner)
        out.append(src[i:j])
        if parsed:
            out.append(f"fround({parsed[0]}, {parsed[1]})")
        else:
            out.append(src[j:end])
        i = end
    src = "".join(out)

    # 2) bare round(expr, n) in SQL strings -> floor-based formula
    out = []
    i = 0
    while True:
        m = re.search(r"(?<![\w.])round\(", src[i:])
        if not m:
            out.append(src[i:])
            break
        j = i + m.start()
        end = find_balanced(src, j + len("round"))
        inner = src[j + len("round(") : end - 1]
        parsed = split_args_last_int(inner)
        out.append(src[i:j])
        if parsed:
            expr, n = parsed
            scale = repr(float(10**n))
            out.append(f"floor(({expr}) * {scale} + 0.5) / {scale}")
        else:
            out.append(src[j:end])
        i = end
    return "".join(out)


if __name__ == "__main__":
    for path in sys.argv[1:]:
        with open(path) as f:
            src = f.read()
        new = transform(src)
        if "fround(" in new and "from chess_pipeline_spark.functions.rounding import fround" not in new:
            new = new.replace(
                "from chess_pipeline_spark.plans.spec import QuerySpec",
                "from chess_pipeline_spark.functions.rounding import fround\nfrom chess_pipeline_spark.plans.spec import QuerySpec",
                1,
            )
        with open(path, "w") as f:
            f.write(new)
        print("transformed", path)
