"""SiddhiQL subset parser.

Statement-level recursive descent over `;`-terminated statements
(mirroring the grammar shapes of `[qc] SiddhiQL.g4`: definition_stream,
definition_table, query with query_input/query_section). Expressions
are carried as balanced substrings and translated to Spark SQL by
``translate_expr`` — the analog of `SiddhiQLBaseVisitorImpl`'s
expression visitor, with Catalyst doing the actual compilation.
"""

from __future__ import annotations

import re

from .model import (
    AggregationDef,
    AppModel,
    FunctionDef,
    TriggerDef,
    JoinInput,
    LogicalStep,
    OutputRate,
    PatternInput,
    PatternStep,
    QueryDef,
    SelectItem,
    SingleInput,
    StreamDef,
    TableAction,
    WindowDef,
    WindowSpec,
)

_TIME_UNITS = {
    "millisecond": 0.001,
    "milliseconds": 0.001,
    "millisec": 0.001,
    "msec": 0.001,
    "ms": 0.001,
    "sec": 1,
    "second": 1,
    "seconds": 1,
    "min": 60,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}

# Siddhi namespace:function → Spark SQL function (subset; extend as the
# suite grows). Identity-mapped names (abs, ceil, upper, …) fall back
# to stripping the namespace.
_FN_MAP = {
    "math:power": "pow",
    "math:ln": "ln",
    "math:toDegrees": "degrees",
    "math:toRadians": "radians",
    "math:parseInt": "int",
    "str:substr": "substring",
    "str:replaceAll": "regexp_replace",
    "str:groupConcat": "string_agg",
    "time:timestampInMilliseconds": "unix_millis",
    "json:getString": "get_json_object",
    "json:getDouble": "get_json_object",
    # NB: `count_distinct` is a DataFrame-API name only; in SQL text the
    # exact form is `count(DISTINCT x)` — special-cased in normalize
    # below, so it must NOT go through the plain-rename map.
    "stdDev": "stddev_pop",
    "ifThenElse": "if",
    "maximum": "greatest",
    "minimum": "least",
    "eventTimestamp": "unix_millis",
    "default": "coalesce",
    "UUID": "uuid",
    "time:currentTimestamp": "current_timestamp",
    "time:currentDate": "current_date",
    "time:date": "to_date",
    "time:dateDiff": "datediff",
    "time:dateFormat": "date_format",
    "time:dayOfWeek": "dayofweek",
}


_INSTANCEOF_TYPES = {
    "instanceOfString": "string",
    "instanceOfInteger": "int",
    "instanceOfLong": "bigint",
    "instanceOfFloat": "float",
    "instanceOfDouble": "double",
    "instanceOfBoolean": "boolean",
}


def _rewrite_instanceof(s: str) -> str:
    """`instanceOfX(expr)` → `(typeof(expr) = 'x')` — the SQL spelling
    of the runtime type checks (`InstanceOf*FunctionExecutor`); the
    argument may itself contain parens, so scan to the balanced close."""
    for name, t in _INSTANCEOF_TYPES.items():
        while True:
            m = re.search(rf"\b{name}\s*\(", s)
            if not m:
                break
            start = m.end()
            depth, i = 1, start
            while i < len(s) and depth:
                if s[i] == "(":
                    depth += 1
                elif s[i] == ")":
                    depth -= 1
                i += 1
            inner = s[start : i - 1]
            s = s[: m.start()] + f"(typeof({inner}) = '{t}')" + s[i:]
    return s


def time_constant_seconds(text: str) -> float:
    """`1 min`, `30 sec`, `500 milliseconds` → seconds."""
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*", text)
    if not m:
        raise ValueError(f"bad time constant: {text!r}")
    unit = m.group(2).lower()
    if unit not in _TIME_UNITS:
        raise ValueError(f"unknown time unit {unit!r} in {text!r}")
    return float(m.group(1)) * _TIME_UNITS[unit]


def translate_expr(expr: str) -> str:
    """SiddhiQL expression → Spark SQL expression."""
    out = expr
    # `==` → `=` (avoid touching >=, <=, !=)
    out = re.sub(r"(?<![<>!=])==", "=", out)
    # Siddhi's zero-arg count() → SQL count(*)
    out = re.sub(r"\bcount\s*\(\s*\)", "count(*)", out)
    # two-arg cast/convert (`CastFunctionExecutor`): cast(x, 'type') →
    # CAST(x AS type). Type arg may be Siddhi-spelled ('string', 'int',
    # 'long', 'float', 'double', 'bool') — map to Spark SQL names.
    _cast_types = {
        "string": "STRING", "int": "INT", "long": "BIGINT",
        "float": "FLOAT", "double": "DOUBLE", "bool": "BOOLEAN",
        "boolean": "BOOLEAN",
    }

    def _cast_repl(m: re.Match) -> str:
        t = m.group(2).strip().strip("'\"").lower()
        return f"CAST({m.group(1)} AS {_cast_types.get(t, t.upper())})"

    out = re.sub(
        r"\b(?:cast|convert)\s*\(([^,()]+),\s*('[^']*'|\"[^\"]*\")\s*\)",
        _cast_repl,
        out,
    )
    # time: fns whose Siddhi arg order differs from SQL
    # (`[ext:time]` DateAdd/DateSub/ExtractAttributesFunctionExtension):
    # dateAdd(ts, n, 'unit') → timestampadd(UNIT, n, ts);
    # extract('unit', ts) → extract(unit FROM ts);
    # currentTimeMillis() → unix_millis(current_timestamp())
    out = re.sub(
        r"\btime:dateAdd\s*\(([^,()]+),([^,()]+),\s*'(\w+)'\s*\)",
        lambda m: f"timestampadd({m.group(3).upper().rstrip('S')},"
        f"{m.group(2)},{m.group(1)})",
        out,
    )
    out = re.sub(
        r"\btime:dateSub\s*\(([^,()]+),([^,()]+),\s*'(\w+)'\s*\)",
        lambda m: f"timestampadd({m.group(3).upper().rstrip('S')},"
        f"-({m.group(2).strip()}),{m.group(1)})",
        out,
    )
    out = re.sub(
        r"\btime:extract\s*\(\s*'(\w+)'\s*,([^()]+)\)",
        lambda m: f"extract({m.group(1).upper()} FROM{m.group(2)})",
        out,
    )
    out = re.sub(
        r"\bcurrentTimeMillis\s*\(\s*\)",
        "unix_millis(current_timestamp())",
        out,
    )
    # namespace:function( → mapped/stripped spark name
    def repl(m: re.Match) -> str:
        full = f"{m.group(1)}:{m.group(2)}"
        if full in _FN_MAP:
            return _FN_MAP[full] + "("
        return m.group(2) + "("  # namespace strip: str:upper → upper

    out = re.sub(r"\b(\w+):(\w+)\s*\(", repl, out)
    # bare mapped functions (no namespace)
    for k, v in _FN_MAP.items():
        if ":" not in k:
            out = re.sub(rf"\b{k}\s*\(", v + "(", out)
    # exact distinct count: SQL spells it count(DISTINCT x), and the
    # DISTINCT must land inside the argument list
    out = re.sub(r"\bdistinctCount\s*\(", "count(DISTINCT ", out)
    out = _rewrite_instanceof(out)
    # Siddhi has no decimal type (§2.2): float literals are doubles.
    # Spark SQL parses bare `0.1` as DECIMAL(1,1) — suffix with D, but
    # never inside string literals.
    def _double_literals(seg: str) -> str:
        return re.sub(r"(?<![\w.])(\d+\.\d+)(?![\w.])", r"\1D", seg)

    pieces = re.split(r"('[^']*')", out)
    out = "".join(
        p if p.startswith("'") else _double_literals(p) for p in pieces
    )
    return out


def _split_statements(text: str) -> list[str]:
    """Split on `;` outside quotes/parens; strip comments."""
    text = re.sub(r"--[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    stmts, buf, depth, in_str = [], [], 0, None
    for ch in text:
        if in_str:
            buf.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in "'\"":
            in_str = ch
            buf.append(ch)
        elif ch in "({":
            # braces: a script-function body (`define function f[js]
            # return double { ...; }`) may contain semicolons
            depth += 1
            buf.append(ch)
        elif ch in ")}":
            depth -= 1
            buf.append(ch)
        elif ch == ";" and depth == 0:
            s = "".join(buf).strip()
            if s:
                stmts.append(s)
            buf = []
        else:
            buf.append(ch)
    s = "".join(buf).strip()
    if s:
        stmts.append(s)
    # merge `partition with (...) begin ... end` blocks back together:
    # their inner queries are `;`-terminated too
    merged: list[str] = []
    block: list[str] = []
    for st in stmts:
        low = st.lower()
        if block:
            block.append(st)
            if re.search(r"\bend\s*$", low):
                merged.append(";\n".join(block))
                block = []
        elif re.match(r"partition\s+with\b", low) and not re.search(
            r"\bend\s*$", low
        ):
            block = [st]
        else:
            merged.append(st)
    if block:  # unterminated block — surface as-is for a parse error
        merged.append(";\n".join(block))
    return merged


def _strip_annotations(stmt: str) -> tuple[str, list[str]]:
    """Pull leading `@name(...)` / `@name:sub(...)` annotations."""
    anns = []
    s = stmt.lstrip()
    while s.startswith("@"):
        m = re.match(r"@[\w.:]+\s*(\()?", s)
        if m and m.group(1):
            depth, i = 0, m.end() - 1
            while i < len(s):
                if s[i] == "(":
                    depth += 1
                elif s[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            anns.append(s[: i + 1])
            s = s[i + 1 :].lstrip()
        else:
            m2 = re.match(r"@[\w.:]+", s)
            anns.append(m2.group(0))
            s = s[m2.end() :].lstrip()
    return s, anns


_DEF_RE = re.compile(
    r"define\s+(stream|table)\s+(\w+)\s*\((.*)\)\s*$", re.S | re.I
)


def _parse_definition(stmt: str, anns: list[str]) -> StreamDef:
    m = _DEF_RE.match(stmt)
    if not m:
        raise ValueError(f"bad definition: {stmt[:80]!r}")
    kind, name, cols = m.groups()
    attrs = []
    for part in cols.split(","):
        cname, ctype = part.split()
        attrs.append((cname.strip(), ctype.strip().lower()))
    return StreamDef(
        name=name,
        attributes=attrs,
        is_table=kind.lower() == "table",
        annotations=anns,
    )


def _find_toplevel(s: str, keyword: str) -> int:
    """Index of a top-level (paren- and bracket-depth-0, outside
    quotes) keyword — `[...]` predicates may contain `and`/`for`/etc."""
    depth, in_br, in_str = 0, 0, None
    low = s.lower()
    kw = keyword.lower()
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "[":
            in_br += 1
        elif ch == "]":
            in_br -= 1
        elif depth == 0 and in_br == 0 and low.startswith(kw, i):
            before = s[i - 1] if i > 0 else " "
            after = s[i + len(kw)] if i + len(kw) < len(s) else " "
            if not (before.isalnum() or before == "_") and not (
                after.isalnum() or after == "_"
            ):
                return i
        i += 1
    return -1


_GRAN_NORM = {
    "sec": "second", "second": "second", "seconds": "second",
    "min": "minute", "minute": "minute", "minutes": "minute",
    "hour": "hour", "hours": "hour", "day": "day", "days": "day",
    "month": "month", "months": "month", "year": "year", "years": "year",
}


def _normalize_granularity(tok: str) -> str:
    return _GRAN_NORM[tok.strip().lower()]


def _expand_within_date(d: str) -> tuple[str, str]:
    """Single-date `within '2024-01-05'` → that day's [start, end);
    `'2024-01'` → that month; `'2024'` → that year."""
    import datetime as _dt

    parts = d.split("-")
    if len(parts) == 3:
        start = _dt.date(int(parts[0]), int(parts[1]), int(parts[2]))
        end = start + _dt.timedelta(days=1)
    elif len(parts) == 2:
        y, m = int(parts[0]), int(parts[1])
        start = _dt.date(y, m, 1)
        end = _dt.date(y + (m == 12), (m % 12) + 1, 1)
    else:
        start = _dt.date(int(parts[0]), 1, 1)
        end = _dt.date(int(parts[0]) + 1, 1, 1)
    return (str(start), str(end))


def _parse_single_input(text: str) -> SingleInput:
    """`Stream[filter]#window.type(args)` (any part optional); `!S` is
    the fault stream of S (`@OnError(action='STREAM')`,
    `[core] stream/StreamJunction.java` fault propagation)."""
    text = text.strip()
    # trailing `as x` — the join-side reference name; strip it BEFORE
    # window parsing (the window regex is end-anchored and a leftover
    # alias would silently swallow the window spec)
    alias = None
    am = re.search(r"\s+as\s+([A-Za-z_]\w*)\s*$", text, re.I)
    if am:
        alias = am.group(1)
        text = text[: am.start()].rstrip()
    m = re.match(r"(!?\w+)", text)
    stream = m.group(1)
    rest = text[m.end() :].strip()
    filt = None
    if rest.startswith("["):
        depth, i = 0, 0
        while i < len(rest):
            if rest[i] == "[":
                depth += 1
            elif rest[i] == "]":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        filt = rest[1:i]
        rest = rest[i + 1 :].strip()
    window = None
    # `#window.kind(args)` or a namespaced stream processor used as a
    # window (`#unique:deduplicate(...)`, `#extrema:maxByLength(...)`)
    wm = re.match(
        r"#\s*(?:window\s*\.\s*)?([\w]+(?::\w+)?)\s*\((.*)\)\s*$", rest, re.S
    )
    if wm:
        kind = wm.group(1)
        args = _split_window_args(wm.group(2))
        window = WindowSpec(kind=kind, args=args)
    return SingleInput(
        stream=stream,
        filter_expr=translate_expr(filt) if filt else None,
        window=window,
        alias=alias,
    )


def _split_window_args(argstr: str) -> list[str]:
    """Split window args on top-level commas only — commas inside
    quoted strings (Quartz lists: `#window.cron('0 0,30 * * * ?')`) or
    nested parens must not split."""
    argstr = argstr.strip()
    if not argstr:
        return []
    args, buf, depth, quote = [], [], 0, None
    for ch in argstr:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    args.append("".join(buf).strip())
    return args


def _has_sequence_commas(text: str) -> bool:
    """A top-level comma with `alias=Stream` shapes on both sides marks
    a sequence input (grammar rule `sequence` — contiguous matching),
    e.g. `every e1=S[c], e2=S[c2]`."""
    depth, in_br = 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "[":
            in_br += 1
        elif ch == "]":
            in_br -= 1
        elif ch == "," and depth == 0 and in_br == 0:
            return bool(re.search(r"=\s*\w+", text[:i]))
    return False


def _parse_input(text: str) -> SingleInput | JoinInput | PatternInput:
    text = text.strip()
    # sequence: top-level comma between alias=Stream steps (contiguous)
    if _has_sequence_commas(text):
        return _parse_pattern(text, strict=True)
    # pattern: contains `->` at top level, starts with `every`, or is a
    # single `alias=Stream[...]` step (grammar `event` inside `pattern`)
    if _find_toplevel(text, "->") != -1 or text.lower().startswith("every"):
        return _parse_pattern(text, strict=False)
    if re.match(r"\w+\s*=\s*\w+", text):
        return _parse_pattern(text, strict=False)
    # absence-first logical form: `not S[c] … and e2=T[d]`
    if re.match(r"not\b", text, re.I):
        return _parse_pattern(text, strict=False)
    ji = -1
    for kw in ("left outer join", "right outer join", "full outer join", "join"):
        ji = _find_toplevel(text, kw)
        if ji != -1:
            join_kw = kw
            break
    if ji != -1:
        left = _parse_single_input(text[:ji])
        rest = text[ji + len(join_kw) :]
        oi = _find_toplevel(rest, "on")
        if oi == -1:
            raise ValueError("join without on")
        right = _parse_single_input(rest[:oi])
        cond = rest[oi + 2 :]
        within = None
        within_range = None
        per = None
        pi = _find_toplevel(cond, "per")
        if pi != -1:
            per = _normalize_granularity(cond[pi + 3 :].strip().strip("'\""))
            cond = cond[:pi]
        wi = _find_toplevel(cond, "within")
        if wi != -1:
            wtext = cond[wi + 6 :].strip()
            cond = cond[:wi]
            if "'" in wtext or '"' in wtext:
                # aggregation retrieval range: one date (that unit) or
                # `'start', 'end'` (grammar `within_time_range`)
                parts = [p.strip().strip("'\"") for p in wtext.split(",")]
                if len(parts) == 2:
                    within_range = (parts[0], parts[1])
                else:
                    within_range = _expand_within_date(parts[0])
            else:
                within = time_constant_seconds(wtext)
        kind = {"join": "inner"}.get(join_kw, join_kw.replace(" join", ""))
        return JoinInput(
            left=left,
            right=right,
            kind=kind,
            on_expr=translate_expr(cond.strip()),
            within_seconds=within,
            within_range=within_range,
            per=per,
        )
    return _parse_single_input(text)


def _parse_pattern(text: str, strict: bool) -> PatternInput:
    every = False
    t = text.strip()
    if t.lower().startswith("every"):
        every = True
        t = t[5:].strip()
    within = None
    wi = _find_toplevel(t, "within")
    if wi != -1:
        within = time_constant_seconds(t[wi + 6 :])
        t = t[:wi].strip()
    # split on top-level -> (followed-by) or , (sequence, strict)
    parts, depth, in_br, buf = [], 0, 0, []
    i = 0
    while i < len(t):
        if t[i] == "[":
            in_br += 1
        elif t[i] == "]":
            in_br -= 1
        elif t[i] == "(":
            depth += 1
        elif t[i] == ")":
            depth -= 1
        if depth == 0 and in_br == 0 and t.startswith("->", i):
            parts.append("".join(buf))
            buf = []
            i += 2
            continue
        if strict and depth == 0 and in_br == 0 and t[i] == ",":
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(t[i])
        i += 1
    parts.append("".join(buf))
    steps: list[PatternStep | LogicalStep] = []
    n_atoms = 0
    for p in parts:
        p = p.strip()
        # strip a fully-enclosing paren pair (grammar allows
        # `(e1=S[c] or e2=S[c2])` as one step)
        while p.startswith("(") and p.endswith(")"):
            depth = 0
            closes_at_end = True
            for j, ch in enumerate(p):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and j < len(p) - 1:
                        closes_at_end = False
                        break
            if not closes_at_end:
                break
            p = p[1:-1].strip()
        # logical step: top-level `and`/`or` inside one arrow-part
        # (`LogicalPreStateProcessor.java`; absence variant when one
        # side is `not S[c]`)
        ai = _find_toplevel(p, "and")
        oi = _find_toplevel(p, "or")
        if ai != -1 or oi != -1:
            op, pos, klen = ("and", ai, 3) if ai != -1 else ("or", oi, 2)
            a = _parse_pattern_atom(p[:pos], n_atoms)
            b = _parse_pattern_atom(p[pos + klen :], n_atoms + 1)
            n_atoms += 2
            steps.append(LogicalStep(op=op, a=a, b=b))
        else:
            steps.append(_parse_pattern_atom(p, n_atoms))
            n_atoms += 1
    return PatternInput(steps=steps, every=every, within_seconds=within, strict=strict)


def _parse_pattern_atom(p: str, idx: int) -> PatternStep:
    """One pattern step: `[alias=]Stream[[pred]][<m:n>]` or the absence
    form `not Stream[[pred]] [for t]`."""
    p = p.strip()
    if re.match(r"not\b", p, re.I):
        rest = p[3:].strip()
        for_seconds = None
        fi = _find_toplevel(rest, "for")
        if fi != -1:
            for_seconds = time_constant_seconds(rest[fi + 3 :])
            rest = rest[:fi].strip()
        m = re.match(r"(\w+)(?:\s*\[(.*)\])?\s*$", rest, re.S)
        if not m:
            raise ValueError(f"bad absence step: {p!r}")
        return PatternStep(
            alias=f"e{idx + 1}",
            stream=m.group(1),
            predicate=translate_expr(m.group(2)) if m.group(2) else None,
            negated=True,
            for_seconds=for_seconds,
        )
    m = re.match(
        r"(?:(\w+)\s*=\s*)?(\w+)(?:\s*\[(.*)\])?"
        r"(?:\s*<\s*(\d+)\s*(?::\s*(\d*))?\s*>|\s*([*+?]))?\s*$",
        p,
        re.S,
    )
    if not m:
        raise ValueError(f"bad pattern step: {p!r}")
    alias = m.group(1) or f"e{idx + 1}"
    # count quantifier `<n>` (exact) / `<m:n>` / unbounded `<m:>`, and
    # the regex sugar `*` = <0:>, `+` = <1:>, `?` = <0:1> (grammar
    # `collection_stream` sequence suffixes, runtime
    # `CountPreStateProcessor.java`).  max None = unbounded: the batch
    # plan unrolls it to a documented cap (builder UNROLL_CAP reps);
    # the streaming NFA collects greedily with `within` as the bound.
    min_c: int = 1
    max_c: int | None = 1
    if m.group(6) is not None:
        min_c, max_c = {"*": (0, None), "+": (1, None), "?": (0, 1)}[m.group(6)]
    elif m.group(4) is not None:
        min_c = int(m.group(4))
        if m.group(5) is None:
            max_c = min_c
        elif m.group(5) == "":
            max_c = None  # unbounded <m:>
        else:
            max_c = int(m.group(5))
        if min_c < 0 or (max_c is not None and not (min_c <= max_c and max_c >= 1)):
            raise ValueError(f"bad count quantifier <{min_c}:{max_c}>")
        if max_c is not None and max_c > 16:
            raise ValueError(
                f"count quantifier max {max_c} > 16: the batch plan "
                "expands one join per repetition — restructure the query"
            )
    return PatternStep(
        alias=alias,
        stream=m.group(2),
        predicate=translate_expr(m.group(3)) if m.group(3) else None,
        min_count=min_c,
        max_count=max_c,
    )


def _split_select_items(sel: str) -> list[SelectItem]:
    sel = sel.strip()
    if sel == "*":
        return []
    items, depth, buf = [], 0, []
    for ch in sel:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    items.append("".join(buf))
    out = []
    for it in items:
        it = it.strip()
        m = re.match(r"(.+?)\s+as\s+(\w+)\s*$", it, re.S | re.I)
        if m:
            out.append(SelectItem(expr=translate_expr(m.group(1).strip()), alias=m.group(2)))
        else:
            out.append(SelectItem(expr=translate_expr(it), alias=None))
    return out


_OUTPUT_RATE_RE = re.compile(
    r"output\s+(all|first|last|snapshot)?\s*every\s+(\d+(?:\.\d+)?)\s*(\w+)",
    re.I,
)


def _parse_table_action(tail: str) -> TableAction:
    """`update or insert into T on cond` | `update T set a=b,… on cond`
    | `delete T on cond`."""
    low = tail.lower()
    oi = _find_toplevel(tail, "on")
    if oi == -1:
        raise ValueError(f"table DML without on: {tail[:60]!r}")
    cond = translate_expr(tail[oi + 2 :].strip())
    head = tail[:oi].strip()
    if low.startswith("update or insert into"):
        table = head.split()[-1]
        return TableAction(kind="upsert", table=table, on_expr=cond)
    if low.startswith("delete"):
        table = head.split()[-1]
        return TableAction(kind="delete", table=table, on_expr=cond)
    # update T [set T.a = expr, ...]
    m = re.match(r"update\s+(\w+)(?:\s+set\b(.*))?$", head, re.S | re.I)
    if not m:
        raise ValueError(f"bad update clause: {tail[:60]!r}")
    table, set_text = m.group(1), m.group(2)
    set_items: list[tuple[str, str]] = []
    if set_text:
        for part in set_text.split(","):
            lhs, rhs = part.split("=", 1)
            set_items.append((lhs.strip(), translate_expr(rhs.strip())))
    return TableAction(kind="update", table=table, on_expr=cond, set_items=set_items)


def _parse_query(stmt: str) -> QueryDef:
    s = stmt
    fi = _find_toplevel(s, "from")
    si = _find_toplevel(s, "select")
    oi_rate = _find_toplevel(s, "output")
    table_action = None
    ii = _find_toplevel(s, "insert into")
    ui = _find_toplevel(s, "update or insert into")
    if ui != -1:
        ii = ui
    if ii == -1:
        ii = _find_toplevel(s, "insert")
    if ii == -1:
        for kw in ("delete", "update"):
            di = _find_toplevel(s, kw)
            if di != -1:
                ii = di
                break
    if fi == -1 or ii == -1:
        raise ValueError(f"bad query: {stmt[:80]!r}")
    tail = s[ii:].strip()
    tl = tail.lower()
    event_type = "current"
    if tl.startswith(("update", "delete")):
        table_action = _parse_table_action(tail)
        out_stream = table_action.table
    else:
        # `insert [current|expired|all] events into S`
        # (QuerySelector output event type)
        m_et = re.match(
            r"insert\s+(current|expired|all)\s+events\s+into\b", tl
        )
        if m_et:
            event_type = m_et.group(1)
        out_stream = s[ii:].split()[-1]
    output_rate = None
    if oi_rate != -1 and oi_rate < ii:
        m = _OUTPUT_RATE_RE.match(s[oi_rate:ii].strip())
        if m:
            which = (m.group(1) or "all").lower()
            unit_tok = m.group(3).lower()
            if unit_tok in ("event", "events"):
                output_rate = OutputRate(which, float(m.group(2)), "events")
            else:
                output_rate = OutputRate(
                    which,
                    time_constant_seconds(f"{m.group(2)} {unit_tok}"),
                    "seconds",
                )
            ii = oi_rate  # the query body ends where the output clause starts
    body_end = ii
    if si == -1:
        input_text = s[fi + 4 : body_end]
        select_items: list[SelectItem] = []
        section = ""
    else:
        input_text = s[fi + 4 : si]
        section = s[si + 6 : body_end]
        select_items = None  # filled below
    group_by: list[str] = []
    having = None
    order_by: list[tuple[str, bool]] = []
    limit = None
    if si != -1:
        gi = _find_toplevel(section, "group by")
        hi = _find_toplevel(section, "having")
        oi = _find_toplevel(section, "order by")
        li = _find_toplevel(section, "limit")
        ends = sorted([x for x in (gi, hi, oi, li) if x != -1]) + [len(section)]
        sel_text = section[: ends[0]]
        select_items = _split_select_items(sel_text)
        if gi != -1:
            g_end = min([x for x in (hi, oi, li) if x > gi] + [len(section)])
            # expression keys (`group by str:upper(x)`) carry commas
            # inside calls — split top-level only, then translate
            group_by = [
                translate_expr(c.strip())
                for c in _split_window_args(section[gi + 8 : g_end])
            ]
        if hi != -1:
            h_end = min([x for x in (oi, li) if x > hi] + [len(section)])
            having = translate_expr(section[hi + 6 : h_end].strip())
        if oi != -1:
            o_end = min([x for x in (li,) if x != -1 and x > oi] + [len(section)])
            for part in section[oi + 8 : o_end].split(","):
                toks = part.split()
                asc = not (len(toks) > 1 and toks[1].lower() == "desc")
                order_by.append((toks[0], asc))
        if li != -1:
            limit = int(section[li + 5 :].split()[0])
    return QueryDef(
        input=_parse_input(input_text),
        select=select_items or [],
        group_by=group_by,
        having=having,
        order_by=order_by,
        limit=limit,
        out_stream=out_stream,
        output_rate=output_rate,
        table_action=table_action,
        event_type=event_type,
    )


_WINDOW_DEF_RE = re.compile(
    r"define\s+window\s+(\w+)\s*\((.*?)\)\s*(\w+)\s*\((.*?)\)"
    r"(?:\s+output\s+(current|expired|all)\s+events)?\s*$",
    re.S | re.I,
)


def _parse_window_def(stmt: str) -> WindowDef:
    """`define window W (a long, b string) timeBatch(1 min) output all
    events;` — grammar rule `definition_window`."""
    m = _WINDOW_DEF_RE.match(stmt.strip())
    if not m:
        raise ValueError(f"bad window definition: {stmt[:80]!r}")
    name, cols, kind, args, policy = m.groups()
    attrs = []
    for part in cols.split(","):
        cname, ctype = part.split()
        attrs.append((cname.strip(), ctype.strip().lower()))
    arg_list = [a.strip() for a in args.split(",")] if args.strip() else []
    return WindowDef(
        name=name,
        attributes=attrs,
        window=WindowSpec(kind=kind, args=arg_list),
        output_policy=(policy or "all").lower(),
    )


_AGG_DEF_RE = re.compile(
    r"define\s+aggregation\s+(\w+)\s+from\s+(\w+)\s+select\s+(.*?)\s+"
    r"aggregate\s+by\s+(\w+)\s+every\s+(.+)$",
    re.S | re.I,
)


def _parse_aggregation_def(stmt: str) -> AggregationDef:
    """`define aggregation A from S select k, sum(v) as total …
    aggregate by ts every hour ... day;` — grammar rule
    `definition_aggregation` (`[qapi] AggregationDefinition.java`).
    `every sec ... year` expands to the granularity range."""
    from ..operators.incremental import GRANULARITIES

    m = _AGG_DEF_RE.match(stmt.strip())
    if not m:
        raise ValueError(f"bad aggregation definition: {stmt[:80]!r}")
    name, source, sel, by_attr, every = m.groups()
    tokens = [t for t in re.split(r"\s*(?:\.\.\.|…)\s*|\s*,\s*", every.strip()) if t]
    grans = [_normalize_granularity(t) for t in tokens]
    if len(grans) == 2 and "..." in every:
        lo, hi = GRANULARITIES.index(grans[0]), GRANULARITIES.index(grans[1])
        grans = list(GRANULARITIES[lo : hi + 1])
    return AggregationDef(
        name=name,
        source=source,
        select=_split_select_items(sel),
        by_attr=by_attr,
        granularities=grans,
    )


_TRIGGER_RE = re.compile(
    r"define\s+trigger\s+(\w+)\s+at\s+(.+)$", re.S | re.I
)


def _parse_trigger_def(stmt: str) -> TriggerDef:
    """`define trigger T at every 5 min;` | `at 'cron expr'` |
    `at 'start'` (`[qapi] definition/TriggerDefinition.java`,
    `[core] trigger/PeriodicTrigger.java` / `CronTrigger` /
    `StartTrigger`). Streaming mapping: `format("rate")` paced to the
    period; `'start'` = one row at stream start."""
    m = _TRIGGER_RE.match(stmt.strip())
    if not m:
        raise ValueError(f"bad trigger definition: {stmt[:80]!r}")
    name, spec = m.group(1), m.group(2).strip()
    if spec.lower().startswith("every"):
        return TriggerDef(
            name=name, every_seconds=time_constant_seconds(spec[5:])
        )
    lit = spec.strip("'\"")
    if lit.lower() == "start":
        return TriggerDef(name=name, at_start=True)
    return TriggerDef(name=name, cron=lit)


_FUNCTION_RE = re.compile(
    r"define\s+function\s+(\w+)\s*\[\s*(\w+)\s*\]\s*"
    r"return\s+(\w+)\s*(?:\(\s*([\w\s,]*)\s*\))?\s*\{(.*)\}\s*$",
    re.S | re.I,
)


def _parse_function_def(stmt: str) -> FunctionDef:
    """`define function f[python] return double (a, b) { a * b };` —
    script UDF (`[core] function/Script.java`). The reference infers
    parameters at call sites; our subset declares them explicitly in
    the optional parameter list (default: single parameter `x`)."""
    m = _FUNCTION_RE.match(stmt.strip())
    if not m:
        raise ValueError(f"bad function definition: {stmt[:80]!r}")
    name, lang, rtype, params, body = m.groups()
    if lang.lower() != "python":
        raise ValueError(
            f"script language {lang!r} unsupported (python only; the "
            "reference's JS/R scripts are out of scope — SURVEY.md §8.5)"
        )
    plist = [p.strip() for p in params.split(",") if p.strip()] if params else ["x"]
    return FunctionDef(
        name=name,
        lang=lang.lower(),
        return_type=rtype.lower(),
        params=plist,
        body=body.strip(),
    )


_PARTITION_RE = re.compile(
    r"partition\s+with\s*\((.*?)\s+of\s+(\w+)\s*\)\s*begin\b(.*)\bend\s*$",
    re.S | re.I,
)


def _parse_partition(stmt: str) -> list[QueryDef]:
    """`partition with (key of Stream)` or the range form
    `partition with (v < 50 as 'low' or v < 200 as 'mid' of Stream)`
    (`[qapi] execution/partition/Partition.java`,
    `ValuePartitionExecutor.java` / `RangePartitionExecutor.java`):
    per-key isolation of the inner query group. On Spark the partition
    key becomes the shuffle key of every inner query (group-by prefix /
    pattern correlation key) — `groupBy(key)` IS the reference's
    per-key runtime cloning; the range form keys on a derived CASE WHEN
    bucket. Inner `#Stream` names are local to the partition; the
    leading `#` is stripped (Spark has no name scoping — the builder's
    env dict provides it)."""
    m = _PARTITION_RE.match(stmt.strip())
    if not m:
        raise ValueError(f"bad partition: {stmt[:80]!r}")
    spec, _of_stream, body = m.groups()
    spec = spec.strip()
    ranges: list[tuple[str, str]] | None = None
    if re.fullmatch(r"\w+", spec):
        key = spec
    else:  # range form: `cond as 'label' or cond as 'label' …`
        ranges = []
        for part in re.split(r"\bor\b", spec, flags=re.I):
            rm = re.match(r"(.+?)\s+as\s+'([^']+)'\s*$", part.strip(), re.S | re.I)
            if not rm:
                raise ValueError(f"bad range partition term: {part.strip()[:60]!r}")
            ranges.append((translate_expr(rm.group(1).strip()), rm.group(2)))
        key = "_range_key"
    agg_re = re.compile(
        r"\b(sum|count|avg|min|max|count_distinct|stddev_pop|string_agg|"
        r"collect_list|collect_set|bool_and|bool_or|first|last)\s*\(",
        re.I,
    )
    queries = []
    # Inner streams (`#Name` — partition-local, `[qapi]
    # execution/partition/Partition.java`) lose their `#` marker so the
    # body queries chain through the ordinary env; window/processor
    # attachments (`S#window.time(..)`, `S#unique:first(..)`) keep
    # theirs — the marker is a name prefix only when it starts a token.
    for inner in _split_statements(re.sub(r"(?<![\w)\]])#", "", body)):
        inner, inner_anns = _strip_annotations(inner)
        q = _parse_query(inner)
        q.annotations = inner_anns
        q.partition_key = key
        q.partition_ranges = ranges
        if isinstance(q.input, (SingleInput, JoinInput)):
            has_agg = any(agg_re.search(it.expr) for it in q.select)
            if has_agg and key not in q.group_by:
                # aggregating inner queries group by the partition key
                q.group_by = [key] + q.group_by
        queries.append(q)
    return queries


def parse_app(text: str) -> AppModel:
    """Parse a SiddhiQL app into the AppModel."""
    app = AppModel()
    for stmt in _split_statements(text):
        body, anns = _strip_annotations(stmt)
        # `@app:*` / `@App:*` annotations are app-scoped regardless of
        # what statement follows them (name, description, playback,
        # statistics)
        app_level = [a for a in anns if re.match(r"@app\s*:", a, re.I)]
        if app_level:
            app.annotations.extend(app_level)
            anns = [a for a in anns if a not in app_level]
        if not body:
            app.annotations.extend(anns)
            continue
        low = body.lower()
        if low.startswith("define stream") or low.startswith("define table"):
            d = _parse_definition(body, anns)
            app.streams[d.name] = d
        elif low.startswith("define window"):
            wd = _parse_window_def(body)
            app.windows[wd.name] = wd
        elif low.startswith("define aggregation"):
            ad = _parse_aggregation_def(body)
            app.aggregations[ad.name] = ad
        elif low.startswith("define trigger"):
            td = _parse_trigger_def(body)
            app.triggers[td.name] = td
        elif low.startswith("define function"):
            fd = _parse_function_def(body)
            app.functions[fd.name] = fd
        elif low.startswith("partition"):
            app.queries.extend(_parse_partition(body))
        elif low.startswith("from"):
            q = _parse_query(body)
            q.annotations = anns
            app.queries.append(q)
        elif low.startswith("define"):
            raise ValueError(f"unsupported definition: {body.split()[1]}")
        else:
            raise ValueError(f"unsupported statement: {body[:60]!r}")
    return app
