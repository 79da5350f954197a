"""PG-dialect → Spark SQL rewriting — the dialect gap layer (SURVEY.md §3A).

The reference parses PostgreSQL grammar (vendored flex/bison parser); Spark
SQL covers almost all of it natively (including ``expr::type`` casts since
3.4). What remains are the PG-isms Spark does not know:

  - ``~``  regex-match operator            → ``RLIKE``
  - ``col ->> 'k'`` / ``col -> 'k'``       → ``get_json_object(col, '$.k')``
  - ``col #>> '{a,b}'`` / ``#>``           → ``get_json_object(col, '$.a.b')``
  - ``::?`` variant-select cast            → ``try_cast`` (pick-if-type-matches)

The rewrite is token-aware (string literals are protected before any
substitution) rather than a full parser — the same pragmatic seam the
reference exposes for parser extensions (`components/sql/parser/
extension.hpp`). Each rule is covered by tests; unknown constructs pass
through untouched so plain Spark SQL always works.
"""

from __future__ import annotations

import re


_STR_LIT = re.compile(r"'(?:[^']|'')*'")


def _protect_strings(sql: str) -> tuple[str, list[str]]:
    literals: list[str] = []

    def stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    return _STR_LIT.sub(stash, sql), literals


def _restore_strings(sql: str, literals: list[str]) -> str:
    def unstash(m: re.Match) -> str:
        return literals[int(m.group(1))]

    return re.sub("\x00(\\d+)\x00", unstash, sql)


def _lit_text(token: str) -> str:
    """'abc' -> abc (unescape doubled quotes)."""
    return token[1:-1].replace("''", "'")


# --- QUALIFY (PG-adjacent window filter, absent from Spark's grammar) --------
# Lowered structurally, not by regex alone: the owning SELECT is found by a
# depth-aware backward scan, the predicate's end by a depth-aware forward
# scan, so QUALIFY inside CTEs/subqueries and QUALIFY predicates containing
# parenthesized window calls both work. Two lowering shapes:
#   pred references select-list ALIASES (no OVER in the predicate):
#       SELECT <list> FROM ... QUALIFY p  →  SELECT * FROM (SELECT <list>
#       FROM ...) WHERE p
#   pred contains window calls directly:
#       →  SELECT * EXCEPT(__otx_qualify) FROM (SELECT <list>,
#          (p) AS __otx_qualify FROM ...) WHERE __otx_qualify
# (Mixing an alias reference and a direct window call in one QUALIFY is not
# supported — the hidden-column form cannot see sibling aliases.)

# --- SIMILAR TO (PG SQL-regex match) -----------------------------------------
# PG's third pattern-match operator (after LIKE and ~): SQL-regex, where
# % and _ are the wildcards, | * + ? {} () [] keep their regex meanings,
# and . ^ $ are LITERALS. Lowered to an anchored RLIKE; the negated form
# uses Spark's native NOT RLIKE so the LHS never needs re-parsing.


def _similar_to_regex(pat: str) -> str:
    """SQL-regex pattern text -> anchored Java regex."""
    out, i, depth = [], 0, 0
    while i < len(pat):
        ch = pat[i]
        if ch == "\\" and i + 1 < len(pat):  # escaped char: literal
            out.append(re.escape(pat[i + 1]))
            i += 2
            continue
        if depth:
            out.append(ch)
            if ch == "]":
                depth = 0
        elif ch == "[":
            depth = 1
            out.append(ch)
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch in ".^$":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    return "^(?:" + "".join(out) + ")$"


def _rewrite_similar_to(body: str, lits: list[str]) -> str:
    """Rewrite [NOT] SIMILAR TO '<pat>' in string-protected SQL text.
    Appends converted patterns to ``lits`` as new stashed literals."""

    def sub(m: re.Match) -> str:
        pat = _lit_text(lits[int(m.group("lit"))])
        # double the backslashes: Spark's SQL string parser consumes one
        # level of escaping before the regex engine sees the pattern
        converted = (
            "'"
            + _similar_to_regex(pat)
            .replace("\\", "\\\\")
            .replace("'", "''")
            + "'"
        )
        lits.append(converted)
        tok = f"\x00{len(lits) - 1}\x00"
        neg = "NOT " if m.group("neg") else ""
        return f"{neg}RLIKE {tok}"

    return re.sub(
        r"(?P<neg>NOT\s+)?SIMILAR\s+TO\s+\x00(?P<lit>\d+)\x00",
        sub,
        body,
        flags=re.IGNORECASE,
    )


_QUAL_TOK = re.compile(r"[()]|\b[A-Za-z_][A-Za-z0-9_]*\b")
_QUAL_TAIL_KWS = {
    "ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "FETCH",
}


def _rewrite_qualify(body: str) -> str:
    """Rewrite every QUALIFY clause in string-protected SQL text."""
    while True:
        m = re.search(r"\bQUALIFY\b", body, re.IGNORECASE)
        if m is None:
            return body
        qstart, qkw_end = m.start(), m.end()

        depth = 0
        pred_end = len(body)
        for t in _QUAL_TOK.finditer(body, qkw_end):
            tx = t.group(0)
            if tx == "(":
                depth += 1
            elif tx == ")":
                if depth == 0:
                    pred_end = t.start()
                    break
                depth -= 1
            elif depth == 0 and tx.upper() in _QUAL_TAIL_KWS:
                pred_end = t.start()
                break

        depth = 0
        sel_start = None
        for t in reversed(list(_QUAL_TOK.finditer(body, 0, qstart))):
            tx = t.group(0)
            if tx == ")":
                depth += 1
            elif tx == "(":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and tx.upper() == "SELECT":
                sel_start = t.start()
                break
        if sel_start is None:
            raise ValueError("QUALIFY without an owning SELECT")

        inner = body[sel_start:qstart].rstrip()
        pred = body[qkw_end:pred_end].strip()
        if re.search(r"\bOVER\b", pred, re.IGNORECASE):
            depth = 0
            from_at = len(inner)
            for t in _QUAL_TOK.finditer(inner, len("SELECT")):
                tx = t.group(0)
                if tx == "(":
                    depth += 1
                elif tx == ")":
                    depth -= 1
                elif depth == 0 and tx.upper() == "FROM":
                    from_at = t.start()
                    break
            spliced = (
                inner[:from_at].rstrip()
                + f", ({pred}) AS __otx_qualify "
                + inner[from_at:]
            )
            new = (
                "SELECT * EXCEPT(__otx_qualify) FROM ("
                + spliced
                + ") WHERE __otx_qualify"
            )
        else:
            new = f"SELECT * FROM ({inner}) WHERE {pred}"
        body = body[:sel_start] + new + " " + body[pred_end:]


_FETCH_RE = re.compile(
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+(ONLY|WITH\s+TIES)",
    re.IGNORECASE,
)
# clause keywords that terminate the backward ORDER-BY scan: hitting one
# at depth 0 means the FETCH has no owning ORDER BY at this query level
_FETCH_STOP_KWS = {
    "SELECT", "FROM", "WHERE", "GROUP", "HAVING", "QUALIFY",
    "UNION", "INTERSECT", "EXCEPT", "LIMIT", "VALUES",
}


def _rewrite_fetch(body: str) -> str:
    """Lower SQL-standard FETCH clauses (PG surface Spark doesn't parse;
    reference grammar components/sql/parser) in string-protected text:

    - ``[OFFSET k ROWS] FETCH FIRST|NEXT [n] ROWS ONLY`` -> ``LIMIT n
      [OFFSET k]`` (count defaults to 1, as PG).
    - ``ORDER BY <keys> FETCH FIRST n ROWS WITH TIES`` -> ``QUALIFY
      RANK() OVER (ORDER BY <keys>) <= n ORDER BY <keys>`` — the
      standard equivalence (peers of the n-th row share its rank), then
      the existing QUALIFY pass finishes the lowering. Runs BEFORE
      ``_rewrite_qualify`` in both dialect modes for exactly that reason.
    """
    while True:
        m = _FETCH_RE.search(body)
        if m is None:
            return body
        n = int(m.group(1) or 1)
        ties = m.group(2).upper().startswith("WITH")
        clause_start = m.start()
        offset = None
        off_m = re.search(
            r"\bOFFSET\s+(\d+)\s+(?:ROWS?\s+)?$", body[:clause_start],
            re.IGNORECASE,
        )
        if off_m is not None:
            offset = int(off_m.group(1))
            clause_start = off_m.start()

        # owning ORDER BY: scan backward at depth 0; identifiers and
        # sort modifiers (ASC/DESC/NULLS/...) pass through, any clause
        # keyword means this FETCH has no ORDER BY of its own
        order_at = None
        depth = 0
        for t in reversed(list(_QUAL_TOK.finditer(body, 0, clause_start))):
            tx = t.group(0)
            if tx == ")":
                depth += 1
            elif tx == "(":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0:
                kw = tx.upper()
                if kw == "ORDER":
                    order_at = t.start()
                    break
                if kw in _FETCH_STOP_KWS:
                    break

        if ties:
            if offset is not None:
                raise ValueError(
                    "FETCH ... WITH TIES combined with OFFSET is not "
                    "supported"
                )
            if order_at is None:
                raise ValueError("FETCH ... WITH TIES requires ORDER BY")
            km = re.match(
                r"ORDER\s+BY\s+", body[order_at:], re.IGNORECASE
            )
            keys = body[order_at + km.end():clause_start].strip()
            new = (
                f"QUALIFY RANK() OVER (ORDER BY {keys}) <= {n} "
                f"ORDER BY {keys} "
            )
            body = body[:order_at] + new + body[m.end():]
        else:
            new = f"LIMIT {n}"
            if offset is not None:
                new += f" OFFSET {offset}"
            body = body[:clause_start] + new + " " + body[m.end():]


_ORDERED_AGG_RE = re.compile(r"\b(string_agg|array_agg)\s*\(", re.IGNORECASE)


def _split_top_level_commas(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _rewrite_ordered_agg(body: str) -> str:
    """Lower PG's inline ordered-aggregate syntax, which Spark's grammar
    rejects outright:

    - ``string_agg(x, sep ORDER BY keys)`` -> ``listagg(x, sep) WITHIN
      GROUP (ORDER BY keys)`` (Spark 4 parses the standard form).
    - ``array_agg(x ORDER BY x [DESC])`` -> ``sort_array(collect_list(x)
      [, false])``; with DISTINCT, ``collect_set``.
    - ``array_agg(v ORDER BY k1, ...)`` (keys != the expression) ->
      struct-sort: ``transform(sort_array(collect_list(struct(k1 AS
      __otx_k0, ..., v AS __otx_v))), s -> s.__otx_v)`` — mixed ASC/DESC
      keys raise (struct sort is all-ascending or all-descending).
    """
    while True:
        found = None
        for m in _ORDERED_AGG_RE.finditer(body):
            fn = m.group(1).lower()
            depth, i = 1, m.end()
            while i < len(body) and depth:
                if body[i] == "(":
                    depth += 1
                elif body[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                break
            inner = body[m.end():i - 1]
            ob = None
            d = 0
            for t in re.finditer(r"[()]|\bORDER\b", inner, re.IGNORECASE):
                tx = t.group(0)
                if tx == "(":
                    d += 1
                elif tx == ")":
                    d -= 1
                elif d == 0:
                    ob = t.start()
                    break
            if ob is None:
                continue
            pre = inner[:ob].strip()
            km = re.match(
                r"ORDER\s+BY\s+(.*)$", inner[ob:], re.IGNORECASE | re.S
            )
            found = (m.start(), i, fn, pre, km.group(1).strip())
            break
        if found is None:
            return body
        start, end, fn, pre, keys = found
        if fn == "string_agg":
            new = f"listagg({pre}) WITHIN GROUP (ORDER BY {keys})"
        else:
            keyparts = [
                k.strip() for k in _split_top_level_commas(keys)
            ]
            desc_flags = [
                bool(re.search(r"\bDESC\s*$", k, re.IGNORECASE))
                for k in keyparts
            ]
            stripped = [
                re.sub(r"\s+(ASC|DESC)\s*$", "", k, flags=re.IGNORECASE)
                .strip()
                for k in keyparts
            ]
            desc_arg = ", false" if desc_flags and all(desc_flags) else ""
            if any(desc_flags) and not all(desc_flags):
                raise ValueError(
                    "array_agg ORDER BY with mixed ASC/DESC keys is not "
                    "supported (struct sort is single-direction)"
                )
            dm = re.match(r"DISTINCT\s+(.*)$", pre, re.IGNORECASE | re.S)
            if dm is not None:
                expr = dm.group(1).strip()
                if len(stripped) != 1 or stripped[0] != expr:
                    raise ValueError(
                        "array_agg(DISTINCT x ORDER BY y) requires the "
                        "ORDER BY key to be the aggregated expression "
                        "(as PG)"
                    )
                new = f"sort_array(collect_set({expr}){desc_arg})"
            elif len(stripped) == 1 and stripped[0] == pre:
                new = f"sort_array(collect_list({pre}){desc_arg})"
            else:
                fields = ", ".join(
                    f"{k} AS __otx_k{n}" for n, k in enumerate(stripped)
                )
                new = (
                    f"transform(sort_array(collect_list(struct({fields}, "
                    f"{pre} AS __otx_v)){desc_arg}), s -> s.__otx_v)"
                )
        body = body[:start] + new + body[end:]


_INTERVAL_UNITS_US = {
    "us": 1, "microsecond": 1,
    "ms": 1000, "millisecond": 1000,
    "s": 1_000_000, "sec": 1_000_000, "second": 1_000_000,
    "min": 60_000_000, "minute": 60_000_000,
    "h": 3_600_000_000, "hr": 3_600_000_000, "hour": 3_600_000_000,
    "d": 86_400_000_000, "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _interval_us(text: str) -> int:
    """'15 minutes' / '1 hour 30 minutes' -> microseconds."""
    total = 0
    for num, unit in re.findall(r"(\d+)\s*([A-Za-z]+)", text):
        u = unit.lower()
        u = u[:-1] if u.endswith("s") and u[:-1] in _INTERVAL_UNITS_US else u
        if u not in _INTERVAL_UNITS_US:
            raise ValueError(f"unsupported interval unit {unit!r} in {text!r}")
        total += int(num) * _INTERVAL_UNITS_US[u]
    if total <= 0:
        raise ValueError(f"empty or zero interval {text!r}")
    return total


_DATE_BIN_RE = re.compile(r"\bdate_bin\s*\(", re.IGNORECASE)


def _rewrite_date_bin(body: str, lits: list[str]) -> str:
    """Lower PG 14's ``date_bin(stride, source, origin)`` — arbitrary-width
    time buckets on an arbitrary origin grid (TimescaleDB time_bucket;
    the reference's temporal bucketing family) — to pure integer
    microsecond arithmetic Spark codegens: ``origin + floor((src -
    origin) / width) * width`` with the floor spelled ``pmod`` so
    sources BEFORE the origin still bin onto the grid (integer DIV
    truncates toward zero and would shift them one bin late)."""
    while True:
        m = _DATE_BIN_RE.search(body)
        if m is None:
            return body
        depth, i = 1, m.end()
        while i < len(body) and depth:
            if body[i] == "(":
                depth += 1
            elif body[i] == ")":
                depth -= 1
            i += 1
        args = _split_top_level_commas(body[m.end():i - 1])
        if len(args) != 3:
            raise ValueError(
                "date_bin expects (stride, source, origin), got "
                f"{len(args)} arguments"
            )
        stride, src, origin = (a.strip() for a in args)
        sm = re.fullmatch(
            r"(?:INTERVAL\s+)?\x00(\d+)\x00(?:\s*::\s*interval)?",
            stride, re.IGNORECASE,
        )
        if sm is None:
            raise ValueError(
                "date_bin stride must be an interval literal"
            )
        width = _interval_us(_lit_text(lits[int(sm.group(1))]))
        s = f"unix_micros(CAST({src} AS TIMESTAMP))"
        o = f"unix_micros(CAST({origin} AS TIMESTAMP))"
        new = (
            f"timestamp_micros({o} + ({s} - {o}) "
            f"- pmod({s} - {o}, {width}))"
        )
        body = body[:m.start()] + new + body[i:]


_GEN_SERIES_RE = re.compile(r"\bgenerate_series\s*\(", re.IGNORECASE)
# words that can follow a FROM-position table function and are NOT aliases
_GS_NONALIAS = frozenset(
    """WHERE GROUP ORDER LIMIT OFFSET HAVING QUALIFY UNION INTERSECT
    EXCEPT ON JOIN CROSS INNER LEFT RIGHT FULL NATURAL USING AS FETCH
    WINDOW""".split()
)


def _rewrite_generate_series(body: str) -> str:
    """Lower PG's ``generate_series`` set-returning function:

    - table position (``FROM generate_series(a, b [, step]) [AS] t(i)``,
      including comma-FROM and JOIN operands) -> the derived table
      ``(SELECT explode(sequence(a, b[, step])) AS i) t`` — valid
      wherever a relation is;
    - select-list position -> ``explode(sequence(...))`` (Spark allows
      one generator per select, matching the common single-SRF use).

    ``sequence`` is inclusive on both ends, exactly like
    ``generate_series``. Alias defaults mirror PG: a bare call exposes a
    column literally named ``generate_series``.
    """
    while True:
        found = None
        for m in _GEN_SERIES_RE.finditer(body):
            depth, i = 1, m.end()
            while i < len(body) and depth:
                if body[i] == "(":
                    depth += 1
                elif body[i] == ")":
                    depth -= 1
                i += 1
            args = body[m.end():i - 1].strip()
            # position: last non-space char/token before the call
            before = body[:m.start()].rstrip()
            table_pos = before.endswith(",") or bool(
                re.search(r"\b(FROM|JOIN)\s*$", before, re.IGNORECASE)
            )
            if not table_pos:
                new = f"explode(sequence({args}))"
                found = (m.start(), i, new)
                break
            am = re.match(
                r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s*"
                r"(?:\(\s*([A-Za-z_]\w*)\s*\))?",
                body[i:],
            )
            name, col, alias_end = "generate_series", "generate_series", 0
            if am and am.group(1) and am.group(1).upper() not in _GS_NONALIAS:
                name = am.group(1)
                col = am.group(2) or "generate_series"
                alias_end = am.end()
            new = f"(SELECT explode(sequence({args})) AS {col}) {name}"
            found = (m.start(), i + alias_end, new)
            break
        if found is None:
            return body
        start, end, new = found
        body = body[:start] + new + body[end:]


def _scan_balanced(body: str, i: int) -> int:
    """Given ``body[i] == '('``, return the index JUST PAST the matching
    close paren (strings are already protected, so parens are real)."""
    depth = 0
    while i < len(body):
        if body[i] == "(":
            depth += 1
        elif body[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return len(body)


def _split_commas_top(text: str) -> list[str]:
    """Split on top-level commas (paren-depth 0; strings protected)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


_EXTRACT_PG_RE = re.compile(
    r"\bEXTRACT\s*\(\s*(EPOCH|ISODOW)\s+FROM\b", re.IGNORECASE
)


def _rewrite_extract_pg(body: str) -> str:
    """Lower the PG EXTRACT fields Spark refuses outright:

    - ``EPOCH`` — seconds since 1970 including the fractional part
      (PG returns numeric): ``unix_micros(CAST(x AS TIMESTAMP)) /
      1000000.0``. The µs count is < 2^53, so the double division is
      exact at whole seconds and order-pinned elsewhere — an oracle
      replaying the same two ops gets bit-identical values.
    - ``ISODOW`` — ISO day of week, Monday=1..Sunday=7 (Spark's
      ``dayofweek`` is Sunday=1): ``pmod(dayofweek(x) + 5, 7) + 1``.

    Spark already accepts the other PG fields (DOW, DOY, WEEK, ...) with
    matching semantics, so only these two are intercepted."""
    while True:
        m = _EXTRACT_PG_RE.search(body)
        if m is None:
            return body
        open_i = body.index("(", m.start())
        end = _scan_balanced(body, open_i)
        inner = body[m.end():end - 1].strip()
        field = m.group(1).upper()
        if field == "EPOCH":
            new = f"(unix_micros(CAST(({inner}) AS TIMESTAMP)) / 1000000.0)"
        else:
            new = f"(pmod(dayofweek(({inner})) + 5, 7) + 1)"
        body = body[:m.start()] + new + body[end:]


_OVERLAPS_RE = re.compile(r"\)\s*OVERLAPS\s*\(", re.IGNORECASE)


def _rewrite_overlaps(body: str) -> str:
    """Lower the SQL-standard ``(s1, e1) OVERLAPS (s2, e2)`` predicate
    (PG grammar a_expr OVERLAPS rule; Spark has no such operator) to its
    definition: each period is the half-open interval [least, greatest),
    EXCEPT that a zero-length period is the single instant, which still
    overlaps anything covering it — the full PG edge-case table:

        CASE WHEN L1 = G1 AND L2 = G2 THEN L1 = L2
             WHEN L1 = G1 THEN L1 >= L2 AND L1 < G2
             WHEN L2 = G2 THEN L2 >= L1 AND L2 < G1
             ELSE L1 < G2 AND L2 < G1 END

    Only row-literal operands ``( a , b ) OVERLAPS ( c , d )`` are
    rewritten (the only form PG's grammar accepts)."""
    while True:
        m = _OVERLAPS_RE.search(body)
        if m is None:
            return body
        # walk LEFT from the ')' at m.start() to its matching open paren
        depth, i = 0, m.start()
        while i >= 0:
            if body[i] == ")":
                depth += 1
            elif body[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        lhs_open = i
        rhs_open = body.index("(", m.end() - 1)
        rhs_end = _scan_balanced(body, rhs_open)
        lhs_parts = _split_commas_top(body[lhs_open + 1:m.start()])
        rhs_parts = _split_commas_top(body[rhs_open + 1:rhs_end - 1])
        if lhs_open < 0 or len(lhs_parts) != 2 or len(rhs_parts) != 2:
            raise ValueError(
                "OVERLAPS expects (start, end) OVERLAPS (start, end)"
            )
        s1, e1 = (p.strip() for p in lhs_parts)
        s2, e2 = (p.strip() for p in rhs_parts)
        l1, g1 = f"least({s1}, {e1})", f"greatest({s1}, {e1})"
        l2, g2 = f"least({s2}, {e2})", f"greatest({s2}, {e2})"
        new = (
            f"(CASE WHEN {l1} = {g1} AND {l2} = {g2} THEN {l1} = {l2} "
            f"WHEN {l1} = {g1} THEN {l1} >= {l2} AND {l1} < {g2} "
            f"WHEN {l2} = {g2} THEN {l2} >= {l1} AND {l2} < {g1} "
            f"ELSE {l1} < {g2} AND {l2} < {g1} END)"
        )
        body = body[:lhs_open] + new + body[rhs_end:]


_SELECT_INTO_HEAD_RE = re.compile(r"^\s*(WITH|SELECT)\b", re.IGNORECASE)
_INTO_RE = re.compile(
    r"\bINTO\s+(?:(?:TEMP|TEMPORARY|UNLOGGED)\s+)?(?:TABLE\s+)?([\w.]+)\s*",
    re.IGNORECASE,
)


def _rewrite_select_into(body: str) -> str:
    """PG's ``SELECT ... INTO tbl FROM ...`` (grammar into_clause) is
    CREATE TABLE AS with the target spliced mid-statement; lift it back
    out so the catalog's CTAS path owns it. Only top-level (depth-0)
    INTO inside a statement that STARTS with SELECT/WITH is touched —
    INSERT INTO / MERGE INTO statements never match the head guard, and
    PG itself rejects INTO in subqueries. TEMP/UNLOGGED degrade to a
    plain managed table (session-scoped anyway here)."""
    if not _SELECT_INTO_HEAD_RE.match(body):
        return body
    for m in _INTO_RE.finditer(body):
        depth = body.count("(", 0, m.start()) - body.count(")", 0, m.start())
        before = body[:m.start()].rstrip().upper()
        # WITH-headed statements can still be INSERT INTO underneath
        if depth == 0 and not before.endswith(("INSERT", "MERGE")):
            tbl = m.group(1)
            rest = body[:m.start()] + body[m.end():]
            return f"CREATE TABLE {tbl} AS {rest.strip()}"
    return body


_BETWEEN_SYM_RE = re.compile(r"\bBETWEEN\s+SYMMETRIC\s+", re.IGNORECASE)
_BSYM_BOUNDARY_RE = re.compile(
    r"[(),;]|\b(AND|OR|ORDER|GROUP|HAVING|WINDOW|LIMIT|UNION|EXCEPT|"
    r"INTERSECT|THEN|ELSE|END|AS|FROM|WHERE|JOIN|ON|QUALIFY)\b",
    re.IGNORECASE,
)


def _rewrite_between_symmetric(body: str) -> str:
    """PG's ``x BETWEEN SYMMETRIC a AND b`` (grammar a_expr BETWEEN
    SYMMETRIC rule): the bounds are unordered — PG swaps them when
    a > b. Spark has no SYMMETRIC; lower to
    ``BETWEEN least(a, b) AND greatest(a, b)``. Operand a runs to the
    first depth-0 AND; operand b to the next depth-0 boundary token
    (AND/OR/clause keyword/paren/comma). NOT BETWEEN SYMMETRIC works
    unchanged — the NOT stays outside the rewritten segment."""

    def scan_operand(text: str, stop_and: bool) -> int:
        depth = 0
        for m in _BSYM_BOUNDARY_RE.finditer(text):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                if depth == 0:
                    return m.start()
                depth -= 1
            elif depth == 0:
                if not stop_and:
                    return m.start()  # any depth-0 boundary ends operand b
                if tok.upper() == "AND":
                    return m.start()
        return len(text)

    while True:
        m = _BETWEEN_SYM_RE.search(body)
        if m is None:
            return body
        rest = body[m.end():]
        a_end = scan_operand(rest, stop_and=True)
        a = rest[:a_end].strip()
        after_and = re.match(r"\s*AND\s*", rest[a_end:], re.IGNORECASE)
        if not a or after_and is None:
            raise ValueError("BETWEEN SYMMETRIC expects <a> AND <b>")
        b_start = a_end + after_and.end()
        b_end = b_start + scan_operand(rest[b_start:], stop_and=False)
        b = rest[b_start:b_end].strip()
        if not b:
            raise ValueError("BETWEEN SYMMETRIC expects <a> AND <b>")
        new = f"BETWEEN least({a}, {b}) AND greatest({a}, {b}) "
        body = body[:m.start()] + new + body[m.end() + b_end:].lstrip()


def _rewrite_order_using(body: str) -> str:
    """PG's ``ORDER BY x USING <`` / ``USING >`` (operator-class sort;
    grammar sortby rule) -> ASC / DESC. JOIN ... USING(...) never
    matches — there USING is followed by a paren, not an operator."""
    body = re.sub(r"\bUSING\s*<(?![<=>~])", "ASC", body, flags=re.IGNORECASE)
    body = re.sub(r"\bUSING\s*>(?![<=>~])", "DESC", body, flags=re.IGNORECASE)
    return body


_FILTER_OVER_RE = re.compile(r"\bFILTER\s*\(\s*WHERE\b", re.IGNORECASE)


def _rewrite_filter_over(body: str) -> str:
    """Lower ``agg(args) FILTER (WHERE p) OVER w`` — legal PG/DuckDB,
    rejected by Spark ("window aggregate function with filter predicate
    is not supported") — to ``agg(CASE WHEN p THEN args END) OVER w``
    (``COUNT(*)`` counts ``CASE WHEN p THEN 1 END``). Grouped-aggregate
    FILTER (no OVER) is left alone: Spark parses that natively."""
    while True:
        found = None
        for m in _FILTER_OVER_RE.finditer(body):
            depth, i = 1, m.end()
            while i < len(body) and depth:
                if body[i] == "(":
                    depth += 1
                elif body[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                break  # unbalanced; leave for Spark's parser to report
            pred = body[m.end():i - 1].strip()
            if not re.match(r"\s*OVER\b", body[i:], re.IGNORECASE):
                continue  # grouped-agg FILTER: native
            j = m.start() - 1
            while j >= 0 and body[j].isspace():
                j -= 1
            if j < 0 or body[j] != ")":
                continue
            depth, k = 1, j - 1
            while k >= 0:
                if body[k] == ")":
                    depth += 1
                elif body[k] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            args = body[k + 1:j].strip()
            fm = re.search(r"([A-Za-z_][A-Za-z0-9_]*)\s*$", body[:k])
            if fm is None:
                continue
            found = (fm.start(1), i, fm.group(1), args, pred)
            break
        if found is None:
            return body
        start, end, fn, args, pred = found
        if args in ("*", ""):
            new = f"{fn}(CASE WHEN {pred} THEN 1 END)"
        else:
            dm = re.match(r"DISTINCT\s+(.*)$", args, re.IGNORECASE | re.S)
            inner = dm.group(1) if dm else args
            kw = "DISTINCT " if dm else ""
            new = f"{fn}({kw}CASE WHEN {pred} THEN {inner} END)"
        body = body[:start] + new + body[end:]


def _json_path(keys: list[str]) -> str:
    out = "$"
    for k in keys:
        out += f"[{k}]" if k.lstrip("-").isdigit() else f".{k}"
    return out


_IDENT = r"[A-Za-z_][A-Za-z_0-9.]*"

# type names whose [N] suffix is an array TYPE declaration, not a subscript
_TYPE_KEYWORDS = frozenset(
    """bool boolean tinyint smallint int2 int integer int4 bigint int8 real
    float4 float float8 double text varchar char string uuid date timestamp
    timestamptz blob bytea decimal numeric""".split()
)

# keywords that can precede a unary minus — never the LHS of a jsonb delete
_SQL_KEYWORDS = frozenset(
    """SELECT WHERE AND OR NOT THEN ELSE WHEN CASE END BY ON AS FROM JOIN
    HAVING LIMIT OFFSET UNION ALL DISTINCT EXCEPT INTERSECT BETWEEN IN LIKE
    RLIKE ILIKE IS NULL TRUE FALSE SET VALUES RETURNING ORDER GROUP""".split()
)
_OPERAND = rf"(?:{_IDENT}\s*\((?:[^()]*)\)|{_IDENT}|\x00\d+\x00)"

# RHS literals shaped like numbers or PG interval strings are arithmetic
# (`o_orderdate - '3 days'`, `x - '42'`), never jsonb key deletes.
_NUM_OR_INTERVAL = re.compile(
    r"^\s*[+-]?\d+(?:\.\d+)?\s*$"  # numeric-string coercion
    r"|^\s*(?:[+-]?\d+(?:\.\d+)?\s*"
    r"(?:years?|yrs?|months?|mons?|weeks?|days?|hours?|hrs?|"
    r"minutes?|mins?|seconds?|secs?|milliseconds?|ms|microseconds?|us)\s*)+"
    r"(?:\d{1,3}:\d{2}(?::\d{2}(?:\.\d+)?)?)?\s*$"  # '1 day 01:00:00'
    r"|^\s*[+-]?\d{1,3}:\d{2}(?::\d{2}(?:\.\d+)?)?\s*$",  # '01:30:00'
    re.IGNORECASE,
)


def _delete_expr(col: str, keys: list[str], depth: int = 0) -> str:
    """JSONB delete lowered to a type-preserving map<string,variant>
    round-trip (reference jsonb_delete, `transform_select.cpp:641-736`):

      - ``col - 'k'``      -> map_filter drops the top-level key
      - ``col #- '{a,b}'`` -> transform_values rebuilds the nested object,
                              recursing per path step (arbitrary depth)

    Object keys only (array-index deletes are not lowered — the reference's
    dynamic documents are object-shaped). NULL/malformed JSON -> NULL, and a
    missing path returns the document unchanged, as in PG.
    """
    k, v = f"k{depth}", f"v{depth}"
    if len(keys) == 1:
        return (
            f"to_json(map_filter(from_json({col}, 'map<string,variant>'), "
            f"({k}, {v}) -> {k} != '{keys[0]}'))"
        )
    head, rest = keys[0], keys[1:]
    inner_src = f"get_json_object({col}, '{_json_path([head])}')"
    inner_del = _delete_expr(inner_src, rest, depth + 1)
    return (
        f"to_json(transform_values(from_json({col}, 'map<string,variant>'), "
        f"({k}, {v}) -> CASE WHEN {k} = '{head}' THEN parse_json({inner_del}) "
        f"ELSE {v} END))"
    )


_GROUP_HEAD = re.compile(rf"(?:\b({_IDENT})\s*)?\(")
_SUBSCRIPT_AFTER = re.compile(r"\s*\[\s*(\d+)\s*\]")
# PG array slice `[a:b]` (1-based, inclusive both ends) — lowered to
# Spark's slice(arr, a, b-a+1). Only literal positive bounds; PG's
# open-ended forms ([:b], [a:]) are not lowered and fail loudly in
# Spark's parser rather than silently shifting.
_SLICE_AFTER = re.compile(r"\s*\[\s*([1-9]\d*)\s*:\s*([1-9]\d*)\s*\]")
# residual 1-based subscript attached to a paren group or bracket that the
# rewrite rules did not consume — reaching spark.sql would silently apply
# Spark's 0-based [] semantics (the off-by-one class this layer exists to
# close), so raise instead of passing through.
_RESIDUAL_SUB = re.compile(r"[\)\]]\s*\[\s*\d+\s*\]")


def _scan_balanced(body: str, open_at: int) -> int:
    """Index just past the paren group whose '(' is at ``open_at``; -1 if
    unbalanced. String literals are already stashed, so no quote handling."""
    depth = 0
    for i in range(open_at, len(body)):
        c = body[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return -1


def _rewrite_group_subscripts(body: str) -> str:
    """One left-to-right pass wrapping ``head(...)[N]`` / ``(...)[N]`` in
    ``element_at`` (PG 1-based). Balanced-paren scanning handles nested call
    arguments that a single-level regex cannot. Call heads that are type
    keywords (``numeric(10,2)[3]`` in DDL) are array TYPE declarations, not
    subscripts, and pass through for the catalog's type mapper. The caller
    loops to fixpoint, so groups wrapped this pass get their interiors
    re-scanned next pass."""
    out: list[str] = []
    i = 0
    while True:
        m = _GROUP_HEAD.search(body, i)
        if not m:
            out.append(body[i:])
            break
        open_at = m.end() - 1
        end = _scan_balanced(body, open_at)
        if end < 0:  # unbalanced tail: nothing rewritable remains
            out.append(body[i:])
            break
        ident = m.group(1)
        wrap_start = m.start()
        if ident and ident.upper() in _SQL_KEYWORDS:
            # `SELECT (a || b)[1]`: the keyword is not a call head — the
            # paren group alone is the subscripted operand
            ident, wrap_start = None, open_at
        sub = _SUBSCRIPT_AFTER.match(body, end)
        sl = _SLICE_AFTER.match(body, end)
        if sub and not (ident and ident.lower() in _TYPE_KEYWORDS):
            out.append(body[i:wrap_start])
            out.append(f"element_at({body[wrap_start:end]}, {sub.group(1)})")
            i = sub.end()
        elif sl and not (ident and ident.lower() in _TYPE_KEYWORDS):
            a, b = int(sl.group(1)), int(sl.group(2))
            out.append(body[i:wrap_start])
            out.append(
                f"slice({body[wrap_start:end]}, {a}, {max(b - a + 1, 0)})"
            )
            i = sl.end()
        else:
            # descend INTO the group so nested subscripts are still seen
            out.append(body[i : open_at + 1])
            i = open_at + 1
    return "".join(out)


def _call_head_ident(body: str, close_at: int) -> str | None:
    """Identifier immediately preceding the '(' that matches the ')' at
    ``close_at``, or None for a bare parenthesized expression."""
    depth = 0
    for i in range(close_at, -1, -1):
        c = body[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
            if depth == 0:
                m = re.search(rf"({_IDENT})\s*$", body[:i])
                return m.group(1) if m else None
    return None


def _left_operand_start(body: str, end: int) -> int | None:
    """Start index of the full operand ending just before ``end``:
    a stashed literal, an identifier, or a balanced paren group with an
    optional call-head identifier — the backward twin of the subscript
    scanner, used to give every PG operator rule nested-call LHS support
    the single-level ``_OPERAND`` regex lacks."""
    i = end
    while i > 0 and body[i - 1] in " \t\n":
        i -= 1
    if i == 0:
        return None
    if body[i - 1] == ")":
        depth, j = 0, i - 1
        while j >= 0:
            if body[j] == ")":
                depth += 1
            elif body[j] == "(":
                depth -= 1
                if depth == 0:
                    break
            j -= 1
        if j < 0 or depth != 0:
            return None
        m = re.search(rf"({_IDENT})\s*$", body[:j])
        if m and m.group(1).upper() not in _SQL_KEYWORDS:
            return m.start(1)
        return j
    m = re.search("\x00\\d+\x00$", body[:i])
    if m:
        return m.start()
    m = re.search(rf"{_IDENT}$", body[:i])
    if m:
        return m.start()
    return None


def _extend_lhs_over_casts(body: str, s: int) -> int:
    """PG's ``::`` binds tighter than the jsonb/path/regex operators, so an
    operand that is the TYPE of a cast must pull the cast's own LHS into the
    operand: ``x::string ->> 'k'`` reads as ``(x::string) ->> 'k'``. Without
    this the arrow rules wrapped only the type name
    (``x::get_json_object(string, ...)``) — matches the AST path, which
    folds the whole cast before applying the operator rules."""
    while True:
        k = s
        while k > 0 and body[k - 1] in " \t\n":
            k -= 1
        if k >= 2 and body[k - 1] == ":" and body[k - 2] == ":":
            prev = _left_operand_start(body, k - 2)
            if prev is None or prev >= k - 2:
                return s
            s = prev
        else:
            return s


def _apply_binop_scanned(
    body: str, op_re: re.Pattern, make, lhs_guard=None, extend_casts=False
) -> str:
    """Rewrite residual ``<operand> OP <rhs>`` occurrences whose LHS needed
    balanced-paren scanning. ``make(lhs, match)`` returns the replacement
    (or None to leave this occurrence). ``lhs_guard(body, start)`` may veto
    an occurrence by its left context; ``extend_casts`` widens the LHS over
    ``::`` cast chains (arrow/path/regex rules — NOT the jsonb delete,
    where a cast tail means arithmetic). Restarts after each rewrite so
    chains collapse left-to-right."""
    while True:
        for m in op_re.finditer(body):
            s = _left_operand_start(body, m.start())
            if s is None:
                continue
            if extend_casts:
                s = _extend_lhs_over_casts(body, s)
            if lhs_guard is not None and lhs_guard(body, s):
                continue
            repl = make(body[s : m.start()].rstrip(), m)
            if repl is None:
                continue
            body = body[:s] + repl + body[m.end() :]
            break
        else:
            return body


def _guard_residual_subscripts(body: str) -> None:
    """Post-pass safety net: any digit subscript still attached to a paren
    group or bracket after the rewrite rules ran is either a parameterized
    array TYPE declaration (allowed — the catalog's DDL type mapper owns
    ``numeric(10,2)[3]``) or a construct this layer failed to lower. Raising
    beats letting Spark's 0-based ``[]`` silently shift every element."""
    for m in _RESIDUAL_SUB.finditer(body):
        if body[m.start()] == ")":
            head = _call_head_ident(body, m.start())
            if head and head.lower() in _TYPE_KEYWORDS:
                continue
        snippet = body[max(0, m.start() - 40) : m.end() + 10]
        raise ValueError(
            "unrewritten 1-based array subscript (would hit Spark's 0-based "
            f"[] and silently shift elements) near: {snippet!r}"
        )


# --- PG null-ordering defaults ----------------------------------------------
# PG sorts NULLS LAST for ASC and NULLS FIRST for DESC (gram.y sortby:
# SortByDir defaults, "nulls sort as if larger than any non-null");
# Spark's defaults are the OPPOSITE (NULLS FIRST for ASC, NULLS LAST for
# DESC). Invisible to order-insensitive consumers, wrong for
# `ORDER BY nullable_key LIMIT n` and for window frames over nullable
# keys. Every sort item without an explicit NULLS FIRST/LAST therefore
# gets PG's default appended. Applied ONCE, to the final Spark SQL text
# after either dialect mode has run (the fallback policy: clause-level
# semantics land in a shared pass, never per-mode), covering clause-level
# ORDER BY and window-spec ORDER BY alike; WITHIN GROUP (ORDER BY ...)
# is skipped — Spark's ordered-set aggregates reject NULLS specs there,
# and the aggregates ignore NULL inputs anyway.

_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
# keywords that terminate a sort-item list (clause level: LIMIT/OFFSET/
# FETCH/set-ops/...; window spec: frame keywords ROWS/RANGE/GROUPS)
_SORT_STOP = {
    "LIMIT", "OFFSET", "FETCH", "WINDOW", "UNION", "INTERSECT", "EXCEPT",
    "MINUS", "ROWS", "RANGE", "GROUPS", "QUALIFY", "HAVING",
    "DISTRIBUTE", "SORT", "CLUSTER",
}
_WORD_RE = re.compile(r"[A-Za-z_]\w*")


_TRAILING_NOISE = re.compile(r"(?:\s+|\x02\d+\x02)+$")


def _null_default_item(item: str) -> str:
    """Append PG's default NULLS placement to one sort item (no-op when
    an explicit NULLS FIRST/LAST is already present). Trailing stashed
    comments (\\x02 tokens) move into the tail so the spec lands BEFORE
    them — appending after a line comment would swallow it."""
    m = _TRAILING_NOISE.search(item)
    core = item[: m.start()] if m else item
    if not core:
        return item
    tail = item[len(core):]
    if re.search(r"\bNULLS\s+(?:FIRST|LAST)$", core, re.IGNORECASE):
        return item
    if re.search(r"\bDESC$", core, re.IGNORECASE):
        return core + " NULLS FIRST" + tail
    return core + " NULLS LAST" + tail


# quoted tokens the shared single-quote protector does not cover: a
# backtick identifier or a double-quoted token may contain a stop word
# ("ORDER BY `rows`") and must be opaque to the item scanner
_QUOTED_TOK = re.compile(r'`[^`]*`|"(?:[^"]|"")*"')
# comments must be opaque to the item scanner too: a stop word inside a
# comment must not truncate the clause, and the NULLS spec must never be
# appended INSIDE a trailing comment (self-review r10). Line comments
# exclude their newline so the terminator stays a real separator.
_COMMENT_TOK = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)


def apply_pg_null_ordering(sql: str) -> str:
    """Make every ORDER BY follow PG's null-placement defaults. Operates
    on finished Spark SQL; idempotent (explicit specs are preserved)."""
    body, lits = _protect_strings(sql)
    return _restore_strings(_null_ordering_protected(body), lits)


def _null_ordering_protected(body: str) -> str:
    """The null-ordering scan over text whose single-quoted literals are
    already stashed (the form both rewrite() paths hold internally —
    exposing it saves a redundant restore/re-protect round trip)."""
    quoted: list[str] = []

    def _stash(m: re.Match) -> str:
        quoted.append(m.group(0))
        return f"\x01{len(quoted) - 1}\x01"

    comments: list[str] = []

    def _stash_comment(m: re.Match) -> str:
        comments.append(m.group(0))
        return f"\x02{len(comments) - 1}\x02"

    body = _QUOTED_TOK.sub(_stash, body)
    body = _COMMENT_TOK.sub(_stash_comment, body)
    # rightmost-first: edits never move the start of a match to their
    # left, and nested clauses (subquery in a sort key) are finished —
    # inside parens, depth > 0 — before their enclosing clause is scanned
    matches = list(_ORDER_BY_RE.finditer(body))
    for m in reversed(matches):
        prefix = body[: m.start()].rstrip()
        if re.search(r"\bGROUP\s*\($", prefix, re.IGNORECASE):
            continue  # WITHIN GROUP (ORDER BY ...)
        i, n, depth = m.end(), len(body), 0
        item_start = i
        pieces: list[tuple[int, int]] = []
        while i < n:
            ch = body[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0:
                if ch == ",":
                    pieces.append((item_start, i))
                    item_start = i + 1
                elif ch == ";":
                    break
                elif ch.isalpha() or ch == "_":
                    w = _WORD_RE.match(body, i)
                    # a stop word terminates the clause only AFTER at
                    # least one sort item: as the first token of an item
                    # it can only be a column literally named rows/limit/
                    # sort/..., so it is consumed as the sort key
                    if (
                        w.group(0).upper() in _SORT_STOP
                        and body[item_start:i].strip()
                    ):
                        break
                    i = w.end()
                    continue
            i += 1
        pieces.append((item_start, i))
        new_items = [_null_default_item(body[a:b]) for a, b in pieces]
        body = body[: m.end()] + ",".join(new_items) + body[i:]
    body = re.sub(
        "\x02(\\d+)\x02", lambda m: comments[int(m.group(1))], body
    )
    return re.sub("\x01(\\d+)\x01", lambda m: quoted[int(m.group(1))], body)


def rewrite(sql: str, literals_resolver=None, *, mode: str | None = None) -> str:
    """Rewrite PG-isms into Spark SQL. Idempotent on plain Spark SQL.

    ``mode`` selects the implementation: ``"ast"`` (default — the
    tokenizer/parse-tree pass in ``dialect_ast``, mirroring the reference's
    real parser, `components/sql/parser/gram.y`) or ``"regex"`` (this
    module — the original scanner, kept as the env-var fallback). Defaults
    to the ``OTTERBRIX_DIALECT_MODE`` environment variable so the whole
    engine can be flipped without code changes; the property suite asserts
    both paths agree (tests/test_dialect_ast.py), and the full 223-gate
    oracle battery passes under both."""
    if mode is None:
        import os

        mode = os.environ.get("OTTERBRIX_DIALECT_MODE", "ast")
    if mode == "ast":
        from otterbrix_spark.dialect_ast import rewrite_ast

        return apply_pg_null_ordering(rewrite_ast(sql))
    body, lits = _protect_strings(sql)
    body = _rewrite_select_into(body)
    body = _rewrite_fetch(body)
    body = _rewrite_filter_over(body)
    body = _rewrite_ordered_agg(body)
    body = _rewrite_generate_series(body)
    body = _rewrite_date_bin(body, lits)
    body = _rewrite_extract_pg(body)
    body = _rewrite_overlaps(body)
    body = _rewrite_between_symmetric(body)
    body = _rewrite_order_using(body)
    body = _rewrite_qualify(body)
    body = _rewrite_similar_to(body, lits)

    def lit_at(tok: str) -> str | None:
        m = re.fullmatch("\x00(\\d+)\x00", tok)
        return _lit_text(lits[int(m.group(1))]) if m else None

    # Every binary PG operator below rewrites through the balanced-operand
    # scanner (_apply_binop_scanned), NOT a single-level-paren regex: the
    # scanner handles nested-call LHS, and — because it always rewrites the
    # LEFTMOST occurrence first — chains like a -> 'x' ->> 'y' collapse
    # with PG's left associativity. (A regex pass that skips a complex LHS
    # would match the INNER pair of a chain first and mis-associate.)

    # --- #- : path delete (BEFORE #>/#>> so '#-' is never half-matched) -----
    def scanned_path_delete(lhs: str, m: re.Match) -> str | None:
        text = lit_at(m.group(1))
        if text is None or lhs.upper() in _SQL_KEYWORDS:
            return None
        keys = [k.strip() for k in text.strip("{}").split(",") if k.strip()]
        return _delete_expr(lhs, keys) if keys else lhs

    body = _apply_binop_scanned(
        body, re.compile("#-\\s*(\x00\\d+\x00)"), scanned_path_delete,
        extend_casts=True,
    )

    # --- #>> / #> : path navigation with '{a,b}' literals -------------------
    def scanned_path(lhs: str, m: re.Match) -> str | None:
        text = lit_at(m.group(1))
        if text is None or lhs.upper() in _SQL_KEYWORDS:
            return None
        keys = [k.strip() for k in text.strip("{}").split(",") if k.strip()]
        return f"get_json_object({lhs}, '{_json_path(keys)}')"

    body = _apply_binop_scanned(
        body, re.compile("#>>?\\s*(\x00\\d+\x00)"), scanned_path,
        extend_casts=True,
    )

    # --- ->> / -> : single-step navigation (chains collapse left-to-right
    # because the scanner always rewrites the leftmost occurrence first) ----
    def scanned_arrow(lhs: str, m: re.Match) -> str | None:
        text = lit_at(m.group(1))
        if text is None or lhs.upper() in _SQL_KEYWORDS:
            return None
        return f"get_json_object({lhs}, '{_json_path([text])}')"

    body = _apply_binop_scanned(
        body, re.compile("->>?\\s*(\x00\\d+\x00)"), scanned_arrow,
        extend_casts=True,
    )

    # --- @> / <@ : jsonb containment (literal pattern side) ----------------
    # PG containment with the pattern as a LITERAL expands at rewrite time
    # into a conjunction of get_json_object comparisons (functions/jsonb.
    # containment_sql documents the supported subset). `a @> '{..}'` takes
    # the scanned LHS operand; `'{..}' <@ b` is the mirrored form with the
    # literal on the left and a simple identifier/call RHS. Non-literal
    # patterns stay untouched (and fail downstream loudly) — PG evaluates
    # dynamic containment row-wise, which this text-level layer cannot.
    def scanned_contains(lhs: str, m: re.Match) -> str | None:
        text = lit_at(m.group(1))
        if text is None or lhs.upper() in _SQL_KEYWORDS:
            return None
        from otterbrix_spark.functions.jsonb import containment_sql

        try:
            return containment_sql(lhs, text)
        except ValueError:
            return None

    body = _apply_binop_scanned(
        body, re.compile("@>\\s*(\x00\\d+\x00)"), scanned_contains,
        extend_casts=True,
    )

    def _contained_sub(m: re.Match) -> str:
        text = lit_at(m.group(1))
        if text is None:
            return m.group(0)
        from otterbrix_spark.functions.jsonb import containment_sql

        try:
            return containment_sql(m.group(2), text)
        except ValueError:
            return m.group(0)

    body = re.sub(
        "(\x00\\d+\x00)\\s*<@\\s*([A-Za-z_][\\w.]*(?:\\((?:[^()]|\\([^()]*\\))*\\))?)",
        _contained_sub,
        body,
    )

    # --- ? / ?| / ?& : jsonb key existence ---------------------------------
    # `a ? 'k'` (single key), `a ?| ARRAY['k1','k2']` (any), `a ?& ...`
    # (all). $1-style parameters are the engine's placeholder syntax, so
    # `?` is unambiguous here. ?|/?& run FIRST so `?` never half-matches.
    def _keys_pred(joiner: str):
        def make(lhs: str, m: re.Match) -> str | None:
            if lhs.upper() in _SQL_KEYWORDS:
                return None
            from otterbrix_spark.functions.jsonb import key_exists_sql

            keys = [lit_at(t) for t in re.findall("\x00\\d+\x00", m.group(1))]
            if not keys or any(k is None for k in keys):
                return None
            return (
                "(" + joiner.join(key_exists_sql(lhs, k) for k in keys) + ")"
            )

        return make

    _ARR_LIT = "ARRAY\\s*\\[\\s*(\x00\\d+\x00(?:\\s*,\\s*\x00\\d+\x00)*)\\s*\\]"
    body = _apply_binop_scanned(
        body,
        re.compile("\\?\\|\\s*" + _ARR_LIT, re.IGNORECASE),
        _keys_pred(" OR "),
        extend_casts=True,
    )
    body = _apply_binop_scanned(
        body,
        re.compile("\\?&\\s*" + _ARR_LIT, re.IGNORECASE),
        _keys_pred(" AND "),
        extend_casts=True,
    )

    def scanned_key_exists(lhs: str, m: re.Match) -> str | None:
        text = lit_at(m.group(1))
        if text is None or lhs.upper() in _SQL_KEYWORDS:
            return None
        from otterbrix_spark.functions.jsonb import key_exists_sql

        return key_exists_sql(lhs, text)

    body = _apply_binop_scanned(
        body, re.compile("\\?\\s*(\x00\\d+\x00)"), scanned_key_exists,
        extend_casts=True,
    )

    # --- ::? variant-select -> try_cast -------------------------------------
    def scanned_variant(lhs: str, m: re.Match) -> str | None:
        if lhs.upper() in _SQL_KEYWORDS:
            return None
        return f"try_cast({lhs} AS {m.group(1)})"

    body = _apply_binop_scanned(
        body, re.compile(r"::\?\s*([A-Za-z_0-9()]+)"), scanned_variant
    )

    # --- `- 'key'` : top-level jsonb delete ---------------------------------
    # Only fires when the RHS is a string literal (PG's jsonb - text) AND the
    # LHS is a real operand, not a SQL keyword (`SELECT - 'x'` is a unary
    # minus on a literal, not a delete). Runs AFTER the arrow rules so
    # `->`/`->>` are already consumed — which means deletes CHAIN correctly
    # after other jsonb rewrites, PG's left associativity.
    # PG only applies `-` as delete when the LHS is typed jsonb; at the text
    # level we approximate: the LHS must be an identifier / call / paren
    # group (never a bare string literal — `text - text` is an error in PG,
    # and never the type of a `::type` cast: `x::bigint - '1'` is
    # arithmetic), and the RHS literal must not be interval/number-shaped
    # (`o_orderdate - '3 days'`) nor carry a `::` cast. Routed through the
    # balanced-operand scanner like every other rule — the old single-level
    # `_OPERAND` regex swallowed a keyword before a parenthesized LHS
    # (`SELECT (doc) - 'k'` matched "SELECT (doc)" as a call head).
    def scanned_key_delete(lhs: str, m: re.Match) -> str | None:
        text = lit_at(m.group(1))
        if text is None or lhs.upper() in _SQL_KEYWORDS:
            return None
        if lit_at(lhs) is not None:  # string-literal LHS: plain SQL
            return None
        if _NUM_OR_INTERVAL.match(text):
            return None
        return _delete_expr(lhs, [text])

    def key_delete_guard(body_: str, s: int) -> bool:
        # operand preceded by ':' is the type of a `::` cast, not a document
        return s > 0 and body_[s - 1] == ":"

    body = _apply_binop_scanned(
        body,
        re.compile("-\\s*(\x00\\d+\x00)(?!\\s*::)"),
        scanned_key_delete,
        lhs_guard=key_delete_guard,
    )

    # --- (composite).* field expansion --------------------------------------
    # PG expands a composite value with `(expr).*`; Spark's star expansion
    # is `expr.*` without the parens (reference composite expansion,
    # test_correctness_bugs.cpp:216 `SELECT (s.p).*`). Only a plain
    # (possibly dotted) identifier inside the parens qualifies — a general
    # expression star-expansion needs the analyzer and passes through.
    # `f(x).*` / `f (x).*` is a CALL's star expansion, not a composite —
    # the nearest non-space char before '(' must not be an identifier char
    def fix_composite_star(m: re.Match) -> str:
        j = m.start() - 1
        while j >= 0 and m.string[j] in " \t\n":
            j -= 1
        if j >= 0 and (m.string[j].isalnum() or m.string[j] in "_."):
            # identifier directly before '(': a keyword (SELECT (x).*) is
            # still a composite context; any other identifier is a call
            k = j
            while k >= 0 and (m.string[k].isalnum() or m.string[k] in "_."):
                k -= 1
            if m.string[k + 1 : j + 1].upper() not in _SQL_KEYWORDS:
                return m.group(0)
        return m.group(1) + ".*"

    body = re.sub(
        rf"\(\s*({_IDENT})\s*\)\s*\.\s*\*", fix_composite_star, body
    )

    # --- ROW(...) composite literals (PG row constructor) -------------------
    # -> struct(...): Spark's positional struct constructor; INSERT-side
    # schema coercion casts it onto the declared struct<...> column type
    # (reference composite types, test_collection_sql.cpp:710 INSERT ROW).
    body = re.sub(r"\bROW\s*\(", "struct(", body, flags=re.IGNORECASE)

    # --- PG array syntax ----------------------------------------------------
    # ARRAY[a, b, c] -> array(a, b, c); ident[N] (integer literal subscript)
    # -> element_at(ident, N), preserving PG's 1-based indexing (Spark's
    # native `[]` subscript is 0-based; element_at is 1-based like PG).
    # A subscript attached directly to an ARRAY literal or a simple call —
    # ARRAY[..][2], f(x)[2] — must ALSO go through element_at: leaving the
    # bare `[2]` hands it to Spark's 0-based subscript, an off-by-one that
    # parses fine and silently shifts every element (caught by
    # tests/test_dialect_nested.py).
    body = re.sub(
        r"\bARRAY\s*\[([^\[\]]*)\]\s*\[\s*(\d+)\s*\]",
        r"element_at(array(\1), \2)",
        body,
        flags=re.IGNORECASE,
    )
    body = re.sub(
        r"\bARRAY\s*\[([^\[\]]*)\]", r"array(\1)", body, flags=re.IGNORECASE
    )

    def fix_subscript(m: re.Match) -> str:
        # `int[3]` in a typed CREATE TABLE is an array TYPE, not a subscript
        if m.group(1).lower() in _TYPE_KEYWORDS:
            return m.group(0)
        return f"element_at({m.group(1)}, {m.group(2)})"

    # Fixpoint: the group scanner wraps `f(..)[N]` / `(expr)[N]` (balanced
    # parens, so nested calls like string_to_array(lower(x), ',')[2] are
    # caught), the ident rule wraps bare `col[N]`; chains like col[1][2]
    # converge because each rewrite consumes one digit-subscript and emits
    # none. Parameterized array TYPES (numeric(10,2)[3]) are skipped here
    # and vetted by _guard_residual_subscripts below.
    def fix_slice(m: re.Match) -> str:
        # PG slice ident[a:b] -> slice(ident, a, b-a+1); 1-based inclusive
        if m.group(1).lower() in _TYPE_KEYWORDS:
            return m.group(0)
        a, b = int(m.group(2)), int(m.group(3))
        return f"slice({m.group(1)}, {a}, {max(b - a + 1, 0)})"

    prev = None
    while prev != body:
        prev = body
        body = _rewrite_group_subscripts(body)
        body = re.sub(rf"\b({_IDENT})\s*\[\s*(\d+)\s*\]", fix_subscript, body)
        body = re.sub(
            rf"\b({_IDENT})\s*\[\s*([1-9]\d*)\s*:\s*([1-9]\d*)\s*\]",
            fix_slice, body,
        )
    _guard_residual_subscripts(body)

    # --- regex operators: `~` / `!~` / `~*` / `!~*` -------------------------
    # case-insensitive variants prepend (?i) to the pattern literal;
    # negated variants wrap in NOT (...). Order matters: longest first.
    def ci_pattern(tok: str) -> str:
        text = lit_at(tok)
        stashed = "'(?i)" + text.replace("'", "''") + "'"
        lits.append(stashed)
        return f"\x00{len(lits) - 1}\x00"

    # regex-match operators through the operand scanner; longest first
    def scanned_regex(template):
        def make(lhs: str, m: re.Match) -> str | None:
            if lhs.upper() in _SQL_KEYWORDS:
                return None
            return template(lhs, m.group(1))

        return make

    # PG LIKE-operator spellings (pg_dump output: ~~ = LIKE, !~~ = NOT
    # LIKE, ~~* = ILIKE, !~~* = NOT ILIKE) — longest first so the plain
    # regex operators below never half-match a double tilde
    body = _apply_binop_scanned(
        body, re.compile("!~~\\*\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"{l} NOT ILIKE {t}"), extend_casts=True,
    )
    body = _apply_binop_scanned(
        body, re.compile("~~\\*\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"{l} ILIKE {t}"), extend_casts=True,
    )
    body = _apply_binop_scanned(
        body, re.compile("!~~(?!\\*)\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"{l} NOT LIKE {t}"), extend_casts=True,
    )
    body = _apply_binop_scanned(
        body, re.compile("(?<![!~])~~(?![~*])\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"{l} LIKE {t}"), extend_casts=True,
    )

    body = _apply_binop_scanned(
        body, re.compile("!~\\*\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"NOT ({l} RLIKE {ci_pattern(t)})"), extend_casts=True,
    )
    body = _apply_binop_scanned(
        body, re.compile("~\\*\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"{l} RLIKE {ci_pattern(t)}"), extend_casts=True,
    )
    body = _apply_binop_scanned(
        body, re.compile("!~\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"NOT ({l} RLIKE {t})"), extend_casts=True,
    )
    body = _apply_binop_scanned(
        body, re.compile("(?<!!)~\\s*(\x00\\d+\x00)"),
        scanned_regex(lambda l, t: f"{l} RLIKE {t}"), extend_casts=True,
    )

    return _restore_strings(_null_ordering_protected(body), lits)
