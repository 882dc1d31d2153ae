"""Engine facade — the single entry point a user of the reference labs
switches to (SURVEY.md §3 EP1/EP2/EP3 in one object).

The reference's workflow is: connectors land topics (EP2), Terraform
submits Flink SQL statements over REST (EP1), and ``depends_on`` chains
them into a DAG (EP3). The Spark-native equivalent:

    eng = Engine(sf_dir="/root/testdata/sf0.01")   # tables registered
    eng.sql("ALTER TABLE orders MODIFY WATERMARK FOR `o_orderdate` "
            "AS o_orderdate")                       # S9-style DDL
    df = eng.sql("SELECT window_start, COUNT(*) AS n FROM "
                 "TABLE(TUMBLE(TABLE orders, DESCRIPTOR(o_orderdate), "
                 "INTERVAL '1' DAY)) GROUP BY window_start")
    dag = eng.pipeline()                            # EP3 DAG runner
    dag.add("create_keyed", "CREATE TABLE ...")
    dag.add("fill", "INSERT INTO ...", depends_on=["create_keyed"])
    dag.run()

Every statement goes through the StatementRouter (Flink-dialect DDL +
window TVFs handled, ANSI core delegated to Catalyst); keyed tables read
back as latest-per-key views via the catalog, exactly the compacted-topic
semantics of S1-S5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.router import StatementRouter
from .registry import all_queries
from .session import get_spark, register_views
from .streaming.pipeline import PipelineRunner


class Engine:
    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str | None = None,
        app_name: str = "spark-graft-engine",
    ):
        self.spark = spark or get_spark(app_name)
        if sf_dir is not None:
            register_views(self.spark, sf_dir)
        self.sf_dir = sf_dir
        self.router = StatementRouter(self.spark)
        self.catalog = self.router.catalog

    # ------------------------------------------------------------------ SQL
    def sql(self, statement: str) -> DataFrame | None:
        """Execute one statement in the reference dialect (EP1). DDL
        returns None; queries return a DataFrame."""
        return self.router.execute(statement)

    def sql_stream(
        self, statement: str, sources: dict[str, DataFrame]
    ) -> DataFrame:
        """Run a reference-dialect statement as a CONTINUOUS query — the
        reference's actual execution model (every Flink statement is a
        streaming job). ``sources`` maps table names to streaming
        DataFrames (``spark.readStream...``); each is registered as a view
        with its catalog watermark applied (the S9/S10 ``MODIFY
        WATERMARK`` DDL recorded by ``sql()``), then the statement is
        rewritten (window TVFs, namespace) and planned by Catalyst as a
        streaming query. All four window TVFs stream: TUMBLE/HOP/CUMULATE
        through the shared batch rewrite, SESSION through the native
        ``session_window`` lowering (the batch gaps-and-islands rewrite
        uses LAG/running-sum window functions, which Structured Streaming
        rejects — ``rewrite_session_tvf_streaming`` swaps in the
        streaming-capable grouping with identical session semantics).
        MATCH_RECOGNIZE statements in the canonical eq-literal shape also
        stream: ``_match_recognize_stream`` routes them to the stateful
        per-key matchers (streaming/stateful.py) and rewrites the outer
        query over the matched stream.
        """
        from .plans.router import rewrite_session_tvf_streaming

        watermarked: dict[str, DataFrame] = {}
        for name, sdf in sources.items():
            meta = self.catalog.get(self.router._resolve(name))
            if meta is not None and meta.watermark_col:
                sdf = sdf.withWatermark(meta.watermark_col, meta.watermark_delay)
            sdf.createOrReplaceTempView(name)
            watermarked[name] = sdf
        stmt = statement.strip().rstrip(";")
        mr = self._match_recognize_stream(stmt, watermarked)
        if mr is not None:
            stmt = mr
        streaming_session = rewrite_session_tvf_streaming(stmt)
        if streaming_session is not None:
            stmt = streaming_session
        rewritten = self.router._rewrite_dialect(stmt)
        return self.spark.sql(rewritten)

    def _match_recognize_stream(
        self, stmt: str, sources: dict[str, DataFrame]
    ) -> str | None:
        """Lower a MATCH_RECOGNIZE statement for CONTINUOUS execution.

        The batch lowering uses LEAD window functions, which Structured
        Streaming rejects; the streaming leg instead keys per-partition
        state (streaming/stateful.py — Flink CEP's model). Supported
        continuously: the canonical lab shape — plain adjacent sequence
        (or the A+ B run shape), every DEFINE an equality literal on ONE
        shared column, a single PARTITION BY key, MEASURES of
        ``Var.<order column>`` only. The matched stream is registered as
        a view and the outer statement rewritten to read it. Returns None
        when the statement has no MATCH_RECOGNIZE; raises the instructive
        error for shapes only the batch path lowers."""
        from .plans.match_recognize import (
            UnsupportedPatternError,
            _eq_literal,
            parse_match_recognize,
        )
        from .streaming.stateful import (
            run_pattern_stream,
            sequence_pattern_stream,
        )

        spec = parse_match_recognize(stmt)
        if spec is None:
            return None

        def unsupported(why: str):
            return NotImplementedError(
                f"MATCH_RECOGNIZE over a stream: {why} — the streaming leg "
                "supports plain adjacent sequences (or A+ B) with "
                "equality-literal DEFINEs on one shared column, one "
                "PARTITION BY key, and MEASURES of Var.<order column>; "
                "run the statement in batch (Engine.sql) or use "
                "streaming/stateful.py directly for custom state machines"
            )

        if spec.quant is not None or spec.all_rows:
            raise unsupported("quantifiers / ALL ROWS PER MATCH")
        if any(len(p) > 1 for p in spec.positions):
            raise unsupported("alternation groups")
        if len(spec.partition_by) != 1:
            raise unsupported("multiple PARTITION BY keys")
        eqs = [_eq_literal(spec.defines[v]) for v in spec.pattern]
        if any(e is None for e in eqs) or len({c for c, _ in eqs}) != 1:
            raise unsupported(
                "DEFINEs must be equality literals on one shared column"
            )
        type_col = eqs[0][0]
        types = [lit.strip("'") for _, lit in eqs]
        ts_col = spec.order_by[0]
        tiebreak = spec.order_by[1] if len(spec.order_by) > 1 else None
        key = spec.partition_by[0]

        sdf = sources.get(spec.table)
        if sdf is None:
            raise unsupported(f"pattern input {spec.table!r} not in sources")

        # The stateful matchers compare DEFINE literals as Python strings
        # and hardcode '<key> long' in their state/output schemas — a
        # numeric type column would silently match nothing and a non-long
        # key would break the output schema. Validate both up front.
        dtypes = dict(sdf.dtypes)
        if any(
            not (lit.startswith("'") and lit.endswith("'")) for _, lit in eqs
        ) or dtypes.get(type_col) != "string":
            raise unsupported(
                f"DEFINE literals must be quoted strings over a STRING "
                f"column ({type_col!r} is {dtypes.get(type_col)!r}; the "
                "streaming matchers carry state as strings)"
            )
        if dtypes.get(key) != "bigint":
            raise unsupported(
                f"PARTITION BY key must be BIGINT ({key!r} is "
                f"{dtypes.get(key)!r}; the streaming state schema keys by "
                "long)"
            )

        if spec.plus is not None:
            if spec.plus[2] != 1:
                raise unsupported(
                    "A{n,} / A* run bounds (the streaming matcher tracks "
                    "O(1) state assuming a plain A+ run — use the batch "
                    "path)"
                )
            if not spec.skip_past_last:
                raise unsupported(
                    "A+ B with SKIP TO NEXT ROW (per-start emission needs "
                    "unbounded per-key state; SKIP PAST LAST ROW streams "
                    "with O(1) state)"
                )
            matched = run_pattern_stream(
                sdf, key, ts_col, type_col, types[0], types[1],
                within_seconds=spec.within_seconds, tiebreak_col=tiebreak,
            )
            # last mapped A row = last_ts; B row = end_ts
            pos_col = {spec.plus[0]: "last_ts", spec.plus[1]: "end_ts"}
        else:
            matched = sequence_pattern_stream(
                sdf, key, ts_col, type_col, types,
                within_seconds=spec.within_seconds, tiebreak_col=tiebreak,
            )
            pos_col = {
                var: f"ts_{i + 1}" for i, var in enumerate(spec.pattern)
            }

        from pyspark.sql import functions as F

        select = [F.col(key)]
        for var, col, alias in spec.measures:
            if var not in pos_col or col != ts_col or alias in spec.measure_agg:
                raise unsupported(
                    f"measure {var}.{col} (only Var.{ts_col} is carried "
                    "through the streaming state)"
                )
            select.append(F.col(pos_col[var]).alias(alias))
        view = f"__mr_stream_{abs(hash(stmt)) % 10_000_000}"
        matched.select(*select).createOrReplaceTempView(view)
        start, end = spec.span
        alias_sql = f" AS {spec.out_alias}" if spec.out_alias else ""
        return f"{stmt[:start]}FROM {view}{alias_sql}{stmt[end:]}"

    def table(self, name: str) -> DataFrame:
        """Read a table by (possibly namespaced) name. Keyed tables are
        already collapsed to latest-row-per-key AT WRITE by the router's
        INSERT path (the compacted-topic read view, SURVEY.md §1.1), so no
        read-side wrap is applied here — a write that bypasses the router
        bypasses that guarantee too."""
        return self.spark.table(self.router._resolve(name))

    def run_script(self, script: str) -> list[DataFrame | None]:
        """Replay a multi-statement lab script (semicolon-separated, '--'
        comments) through the front door, in order."""
        return self.router.execute_script(script)

    # ------------------------------------------------------------------ DAG
    def pipeline(self) -> PipelineRunner:
        """A depends_on DAG runner sharing this engine's router (EP3)."""
        return PipelineRunner(self.spark, self.router)

    # ------------------------------------------------------- named queries
    def list_queries(self) -> dict[str, str]:
        """Registered operator names → one-line docs (the SURVEY.md §2
        inventory a reference user browses to find the equivalent)."""
        from .registry import _load_all, _REGISTRY

        _load_all()
        return {
            k: (e.doc or "").split(". ")[0][:120]
            for k, e in sorted(_REGISTRY.items())
        }

    def query(self, name: str, sf_dir: str | None = None) -> DataFrame:
        """Run a registered operator query (SURVEY.md §2 inventory) against
        ``sf_dir`` (defaults to the fixtures this engine registered)."""
        d = sf_dir or self.sf_dir
        if d is None:
            raise ValueError("no sf_dir: pass one or construct Engine with it")
        return all_queries()[name](self.spark, d)
