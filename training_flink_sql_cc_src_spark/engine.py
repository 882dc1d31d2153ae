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
        """
        from .plans.router import rewrite_session_tvf_streaming

        for name, sdf in sources.items():
            meta = self.catalog.get(self.router._resolve(name))
            if meta is not None and meta.watermark_col:
                sdf = sdf.withWatermark(meta.watermark_col, meta.watermark_delay)
            sdf.createOrReplaceTempView(name)
        stmt = statement.strip().rstrip(";")
        streaming_session = rewrite_session_tvf_streaming(stmt)
        if streaming_session is not None:
            stmt = streaming_session
        rewritten = self.router._rewrite_dialect(stmt)
        return self.spark.sql(rewritten)

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
