"""MATCH_RECOGNIZE → LEAD-chain lowering (SURVEY.md §2.6 CEP surface).

Flink SQL (1.19) exposes CEP as row-pattern matching; the reference course
scope includes it even though the four labs' attested statements don't use
it. Spark SQL has no MATCH_RECOGNIZE, so the router lowers the
*adjacent-sequence subset* — the funnel shape the labs teach — to the same
LEAD-over-ordered-partition machinery as queries/time_windows.pattern_funnel:

  supported:   PATTERN (A B), (A B C), … — plain variable sequences,
               DEFINE on current-row predicates only (``A AS A.col = lit``),
               MEASURES of ``Var.col AS alias``, ONE ROW PER MATCH,
               AFTER MATCH SKIP TO NEXT ROW (always), SKIP PAST LAST ROW
               (when variable predicates are provably pairwise disjoint —
               equality on one shared column with distinct literals — so
               matches can never share rows and greedy skipping equals
               keep-everything), optional WITHIN INTERVAL bound.
  unsupported: quantifiers (A+, B*, {n}), alternation, PREV/NEXT/FIRST/
               LAST navigation, ALL ROWS PER MATCH — these need a real NFA;
               the router raises the instructive error pointing at
               pattern_funnel / applyInPandasWithState instead.

Lowering: one Window partitionBy(PARTITION BY).orderBy(ORDER BY); row i
binds variable k via LEAD(struct(cols), k); the match predicate is the
conjunction of every DEFINE applied at its offset (+ the WITHIN bound on
the last offset's order column). One shuffle on the partition key — the
same plan shape Flink's CEP operator keys its state by, and the 100 TB
story is identical to every other keyed window here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class UnsupportedPatternError(NotImplementedError):
    """Pattern outside the adjacent-sequence subset."""


_MR_HEAD_RE = re.compile(
    r"FROM\s+`?(?P<tbl>\w+)`?\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE
)
_CLAUSES_RE = re.compile(
    r"PARTITION\s+BY\s+(?P<pby>.+?)\s+"
    r"ORDER\s+BY\s+(?P<oby>.+?)\s+"
    r"MEASURES\s+(?P<measures>.+?)\s+"
    r"(?:ONE\s+ROW\s+PER\s+MATCH\s+)?"
    r"(?:AFTER\s+MATCH\s+(?P<skip>SKIP\s+PAST\s+LAST\s+ROW|"
    r"SKIP\s+TO\s+NEXT\s+ROW)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>[^)]*?)\s*\)\s*"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<within_n>\d+)'\s+(?P<within_unit>\w+)\s+)?"
    r"DEFINE\s+(?P<define>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_MEASURE_RE = re.compile(
    r"^(?P<var>\w+)\.(?P<col>\w+)\s+AS\s+(?P<alias>\w+)$", re.IGNORECASE
)
_DEFINE_RE = re.compile(r"^(?P<var>\w+)\s+AS\s+(?P<pred>.+)$", re.IGNORECASE | re.DOTALL)
_EQ_LIT_RE = re.compile(
    r"^\s*\w+\.(?P<col>\w+)\s*=\s*(?P<lit>'[^']*'|[0-9.]+)\s*$"
)


@dataclass
class MatchRecognizeSpec:
    table: str
    partition_by: list[str]
    order_by: list[str]
    measures: list[tuple[str, str, str]]  # (var, col, alias)
    pattern: list[str]  # variable sequence
    defines: dict[str, str]  # var -> raw predicate text
    skip_past_last: bool
    within_seconds: int | None
    span: tuple[int, int]  # [start, end) of "FROM tbl MATCH_RECOGNIZE(...)"
    out_alias: str | None


def _split_commas(s: str) -> list[str]:
    # parens only: SQL predicates contain bare < / > comparison operators,
    # so angle-bracket tracking would corrupt the nesting depth
    parts, depth, cur = [], 0, []
    for ch in s:
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
    return [p.strip() for p in parts if p.strip()]


_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def parse_match_recognize(sql: str) -> MatchRecognizeSpec | None:
    """Extract and parse the MATCH_RECOGNIZE clause, or None if absent.

    Raises UnsupportedPatternError for syntax outside the subset (the
    router converts that into its instructive CEP guidance)."""
    head = _MR_HEAD_RE.search(sql)
    if head is None:
        if re.search(r"\bMATCH_RECOGNIZE\b", sql, re.IGNORECASE):
            raise UnsupportedPatternError(
                "MATCH_RECOGNIZE requires the form FROM <table> "
                "MATCH_RECOGNIZE (...) — subqueries as the pattern input "
                "are not supported"
            )
        return None
    # balance parens to find the clause end
    depth, i = 1, head.end()
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise UnsupportedPatternError("unbalanced MATCH_RECOGNIZE parentheses")
    body = sql[head.end() : i - 1].strip()
    end = i
    out_alias = None
    m_alias = re.match(r"\s*(?:AS\s+)?(\w+)", sql[i:], re.IGNORECASE)
    if m_alias and m_alias.group(1).upper() not in (
        "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "UNION", "JOIN",
        "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ON",
    ):
        out_alias = m_alias.group(1)
        end = i + m_alias.end()

    m = _CLAUSES_RE.search(body)
    if m is None:
        raise UnsupportedPatternError(
            "MATCH_RECOGNIZE clause outside the supported subset (need "
            "PARTITION BY / ORDER BY / MEASURES / PATTERN / DEFINE, in "
            "that order; ALL ROWS PER MATCH is not supported)"
        )
    if re.search(r"ALL\s+ROWS\s+PER\s+MATCH", body, re.IGNORECASE):
        raise UnsupportedPatternError("ALL ROWS PER MATCH is not supported")

    pattern_text = m.group("pattern")
    if re.search(r"[+*?{|]", pattern_text):
        raise UnsupportedPatternError(
            f"PATTERN ({pattern_text}) uses quantifiers/alternation — only "
            "plain adjacent sequences (A B), (A B C), ... are lowered; use "
            "queries/time_windows.pattern_funnel3_sequential or "
            "streaming/stateful.applyInPandasWithState for general CEP"
        )
    pattern = pattern_text.split()
    if len(pattern) < 2 or len(pattern) != len(set(pattern)):
        raise UnsupportedPatternError(
            f"PATTERN ({pattern_text}) must be 2+ distinct variables"
        )

    measures = []
    for item in _split_commas(m.group("measures")):
        mm = _MEASURE_RE.match(item)
        if mm is None:
            raise UnsupportedPatternError(
                f"MEASURES item {item!r} outside the subset (only "
                "Var.col AS alias; FIRST/LAST/aggregates need a real NFA)"
            )
        measures.append((mm.group("var"), mm.group("col"), mm.group("alias")))

    defines: dict[str, str] = {}
    for item in _split_commas(m.group("define")):
        dm = _DEFINE_RE.match(item)
        if dm is None:
            raise UnsupportedPatternError(f"DEFINE item {item!r} unparseable")
        var, pred = dm.group("var"), dm.group("pred").strip()
        foreign = set(re.findall(r"\b(\w+)\.", pred)) - {var}
        if foreign & set(pattern) or re.search(
            r"\b(PREV|NEXT|FIRST|LAST)\s*\(", pred, re.IGNORECASE
        ):
            raise UnsupportedPatternError(
                f"DEFINE for {var} references other pattern rows "
                f"({item!r}) — only current-row predicates are lowered"
            )
        defines[var] = pred
    missing = [v for v in pattern if v not in defines]
    if missing:
        raise UnsupportedPatternError(
            f"PATTERN variables {missing} lack DEFINE clauses (implicit "
            "always-true variables are not supported)"
        )

    skip = (m.group("skip") or "SKIP PAST LAST ROW").upper()
    skip_past_last = "PAST" in skip

    within_seconds = None
    if m.group("within_n"):
        unit = m.group("within_unit").lower().rstrip("s")
        if unit not in _UNIT_SECONDS:
            raise UnsupportedPatternError(f"WITHIN unit {unit!r} unsupported")
        within_seconds = int(m.group("within_n")) * _UNIT_SECONDS[unit]

    spec = MatchRecognizeSpec(
        table=head.group("tbl"),
        partition_by=[c.strip().strip("`") for c in m.group("pby").split(",")],
        order_by=[c.strip().strip("`") for c in m.group("oby").split(",")],
        measures=measures,
        pattern=pattern,
        defines=defines,
        skip_past_last=skip_past_last,
        within_seconds=within_seconds,
        span=(head.start(), end),
        out_alias=out_alias,
    )
    if skip_past_last and not _provably_disjoint(spec):
        raise UnsupportedPatternError(
            "AFTER MATCH SKIP PAST LAST ROW is only lowered when the "
            "DEFINE predicates are provably pairwise disjoint (each "
            "variable an equality on one shared column with distinct "
            "literals), so matches cannot overlap and the LEAD rewrite is "
            "exact; use AFTER MATCH SKIP TO NEXT ROW for overlapping "
            "patterns, or applyInPandasWithState for true greedy skipping"
        )
    return spec


def _eq_literal(pred: str) -> tuple[str, str] | None:
    m = _EQ_LIT_RE.match(pred)
    return (m.group("col"), m.group("lit")) if m else None


def _provably_disjoint(spec: MatchRecognizeSpec) -> bool:
    """True when every variable predicate is ``var.col = literal`` on the
    SAME column with pairwise-distinct literals: no row can satisfy two
    variables, so matches share no rows and SKIP PAST LAST ROW keeps
    exactly the same matches as keep-everything."""
    eqs = [_eq_literal(spec.defines[v]) for v in spec.pattern]
    if any(e is None for e in eqs):
        return False
    cols = {c for c, _ in eqs}
    lits = [lit for _, lit in eqs]
    return len(cols) == 1 and len(lits) == len(set(lits))


def lower_match_recognize(spark: SparkSession, spec: MatchRecognizeSpec) -> DataFrame:
    """Build the LEAD-chain DataFrame for an adjacent-sequence pattern.

    Output columns: PARTITION BY keys + measure aliases."""
    df = spark.table(spec.table)
    cols = df.columns
    w = Window.partitionBy(*spec.partition_by).orderBy(*spec.order_by)
    out = df
    # one struct-valued LEAD per pattern offset: a single window pass
    # computes every future-row binding (Catalyst collapses the k leads
    # into one WindowExec over one shuffle)
    for k in range(1, len(spec.pattern)):
        out = out.withColumn(f"__mr_s{k}", F.lead(F.struct(*cols), k).over(w))

    def ref(var: str, col: str) -> str:
        k = spec.pattern.index(var)
        return col if k == 0 else f"__mr_s{k}.{col}"

    conds = []
    for k, var in enumerate(spec.pattern):
        pred = spec.defines[var]
        pred = re.sub(
            rf"\b{re.escape(var)}\.(\w+)\b",
            (lambda mm, kk=k: mm.group(1) if kk == 0 else f"__mr_s{kk}.{mm.group(1)}"),
            pred,
        )
        conds.append(F.expr(pred))
        if k > 0:
            conds.append(F.col(f"__mr_s{k}").isNotNull())
    if spec.within_seconds is not None:
        last = len(spec.pattern) - 1
        ts0, tsn = spec.order_by[0], f"__mr_s{last}.{spec.order_by[0]}"
        conds.append(
            F.col(tsn)
            <= F.col(ts0) + F.expr(f"INTERVAL {spec.within_seconds} SECOND")
        )

    matched = out
    for c in conds:
        matched = matched.filter(c)
    select = [F.col(c) for c in spec.partition_by] + [
        F.col(ref(var, col)).alias(alias) for var, col, alias in spec.measures
    ]
    return matched.select(*select)


_MR_VIEW_SEQ = [0]


def rewrite_match_recognize(spark: SparkSession, sql: str) -> str | None:
    """If ``sql`` contains a supported MATCH_RECOGNIZE, materialize the
    lowered pattern as a temp view and return the outer query rewritten to
    read it; None when the statement has no MATCH_RECOGNIZE."""
    spec = parse_match_recognize(sql)
    if spec is None:
        return None
    _MR_VIEW_SEQ[0] += 1
    view = f"__mr_lowered_{_MR_VIEW_SEQ[0]}"
    lower_match_recognize(spark, spec).createOrReplaceTempView(view)
    start, end = spec.span
    alias = f" AS {spec.out_alias}" if spec.out_alias else ""
    return f"{sql[:start]}FROM {view}{alias}{sql[end:]}"
