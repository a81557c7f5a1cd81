"""R/lme4-style formula parser for stan4bart models.

Implements the *semantics* of the reference's formula front-end
(/root/reference/R/lme4_functions.R:23-213 ``glFormula``; 664-736 ``findbars``;
866-879 ``subbart``; 1108-1181 ``nobart``/``allbart``) as a small hand-written
parser — not the R evaluation machinery.  A stan4bart formula is

    y ~ bart(x1 + x2 + .) + x4 + z + (1 + x4 | g1) + (1 | g1:g2) + offset(o)

The right-hand side is split into three additive components:

* exactly one ``bart(...)`` pseudo-call — the nonparametric sum-of-trees part;
* ordinary fixed-effect terms (with ``:`` / ``*`` interactions, ``.``
  expansion, ``-`` removals, ``0``/``1`` intercept markers);
* lme4 random-effect terms ``(expr | group)`` with ``:``-nested grouping
  factors; double-bar terms ``(expr || group)`` are split into independent
  (uncorrelated) terms exactly as the reference does — ``(1 + x || g)``
  becomes ``(1 | g) + (0 + x | g)`` (``expandDoubleVert``,
  lme4_functions.R:555-566, invoked via ``findbars``'s
  ``expand_doublevert_method = "split"``, :731-736).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RandomTerm:
    """One ``(lhs | group)`` term: lhs terms (after expansion) and group expr."""

    lhs_terms: list[str]
    lhs_intercept: bool
    group: str  # e.g. "g1" or "g1:g2"
    raw: str = ""


@dataclass
class ParsedFormula:
    response: str
    bart_terms: list[str]
    fixed_terms: list[str]
    random_terms: list[RandomTerm]
    offset_terms: list[str] = field(default_factory=list)
    raw: str = ""

    @property
    def has_bart(self) -> bool:
        return len(self.bart_terms) > 0


def _split_top_level(s: str, seps: str = "+-") -> list[tuple[str, str]]:
    """Split an expression on top-level +/- (outside any bracket), returning
    (sign, term) pairs. The first term gets sign '+'."""
    out: list[tuple[str, str]] = []
    depth = 0
    cur = []
    sign = "+"
    for ch in s:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if depth == 0 and ch in seps:
            tok = "".join(cur).strip()
            if tok:
                out.append((sign, tok))
            sign = ch
            cur = []
        else:
            cur.append(ch)
    tok = "".join(cur).strip()
    if tok:
        out.append((sign, tok))
    return out


def _find_top_level(s: str, target: str) -> int:
    depth = 0
    for i, ch in enumerate(s):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif depth == 0 and ch == target:
            return i
    return -1


_NAME_RE = re.compile(r"^[A-Za-z_.][A-Za-z0-9_.]*$")


def _expand_nested_group(group: str) -> list[str]:
    """'g1/g2/g3' -> ['g1', 'g1:g2', 'g1:g2:g3'] (R nesting operator)."""
    parts = []
    depth, cur = 0, []
    for ch in group:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if depth == 0 and ch == "/":
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    out, prefix = [], ""
    for p in parts:
        prefix = f"{prefix}:{p}" if prefix else p
        out.append(prefix)
    return out


def expand_terms(
    terms: list[tuple[str, str]],
    all_columns: list[str] | None,
    exclude: set[str],
) -> tuple[list[str], bool]:
    """Expand a signed term list: ``.`` -> all columns (minus exclusions),
    ``a*b`` -> a + b + a:b, apply ``-`` removals, handle 0/1 intercept
    markers.  Returns (terms, intercept)."""
    included: list[str] = []
    intercept = True

    def add(term: str) -> None:
        if term not in included:
            included.append(term)

    def remove(term: str) -> None:
        if term in included:
            included.remove(term)

    for sign, term in terms:
        if term == "1":
            intercept = sign == "+"
            continue
        if term == "0":
            intercept = sign != "+"
            continue
        if term == ".":
            if all_columns is None:
                raise ValueError("'.' in formula requires data columns")
            targets = [c for c in all_columns if c not in exclude]
        elif _find_top_level(term, "*") >= 0:
            i = _find_top_level(term, "*")
            a, b = term[:i].strip(), term[i + 1 :].strip()
            targets = [a, b, f"{a}:{b}"]
        else:
            targets = [term]
        for t in targets:
            (add if sign == "+" else remove)(t)
    return included, intercept


def parse_formula(
    formula: str,
    columns: list[str] | None = None,
) -> ParsedFormula:
    """Parse a stan4bart formula string.

    ``columns`` (data column names) is needed only for ``.`` expansion; the
    response and grouping variables are excluded from ``.`` automatically
    (matching R's ``.`` = "everything not otherwise used on the LHS").
    """
    if "~" not in formula:
        raise ValueError(f"formula must contain '~': {formula!r}")
    lhs, rhs = formula.split("~", 1)
    response = lhs.strip()
    if not response:
        raise ValueError("formula must have a response")

    bart_inner: list[str] = []
    fixed_signed: list[tuple[str, str]] = []
    random_terms: list[RandomTerm] = []
    offset_terms: list[str] = []

    for sign, term in _split_top_level(rhs):
        if term.startswith("bart(") and term.endswith(")"):
            if sign != "+":
                raise ValueError("cannot remove a bart() term")
            if bart_inner:
                raise ValueError("only one bart() component is allowed")
            bart_inner.append(term[len("bart(") : -1])
        elif term.startswith("(") and term.endswith(")") and (
            _find_top_level(term[1:-1], "|") >= 0
        ):
            inner = term[1:-1]
            bar = _find_top_level(inner, "|")
            double_bar = bar + 1 < len(inner) and inner[bar + 1] == "|"
            lhs_expr = inner[:bar].strip()
            group = inner[bar + (2 if double_bar else 1):].strip()
            lhs_terms, lhs_int = expand_terms(
                _split_top_level(lhs_expr), columns, set()
            )
            # nested grouping: (expr | g1/g2) expands to
            # (expr|g1) + (expr|g1:g2) (lme4 findbars '/' semantics,
            # lme4_functions.R:664-736)
            for g in _expand_nested_group(group):
                if double_bar:
                    # uncorrelated random effects: split into independent
                    # terms, intercept first, each slope without intercept
                    # (expandDoubleVert, lme4_functions.R:555-566)
                    if lhs_int:
                        random_terms.append(RandomTerm(
                            lhs_terms=[], lhs_intercept=True, group=g,
                            raw=term))
                    for t in lhs_terms:
                        random_terms.append(RandomTerm(
                            lhs_terms=[t], lhs_intercept=False, group=g,
                            raw=term))
                else:
                    random_terms.append(
                        RandomTerm(lhs_terms=lhs_terms,
                                   lhs_intercept=lhs_int, group=g, raw=term)
                    )
        elif term.startswith("offset(") and term.endswith(")"):
            offset_terms.append(term[len("offset(") : -1].strip())
        else:
            fixed_signed.append((sign, term))

    # '.' exclusion set: the response plus grouping factors, matching R where
    # '.' means "all columns other than the response"; grouping variables are
    # excluded only via explicit '- g' in the reference tests, so keep just
    # the response here.
    exclude = {response}
    fixed_terms, _ = expand_terms(fixed_signed, columns, exclude)

    bart_terms: list[str] = []
    if bart_inner:
        bart_terms, _ = expand_terms(
            _split_top_level(bart_inner[0]), columns, exclude
        )

    return ParsedFormula(
        response=response,
        bart_terms=bart_terms,
        fixed_terms=fixed_terms,
        random_terms=random_terms,
        offset_terms=offset_terms,
        raw=formula,
    )
