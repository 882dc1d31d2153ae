"""Dependent-statement DAG runner — the Terraform ``depends_on`` chain
analog (SURVEY.md §3 EP3: connectors → S1 create → S2 insert → S3/S4 →
S5 → S6, terraform/lab-aggregations/main.tf:407-412,442-445,541-544,
574-576).

Batch mode: statements execute in topological order through the
StatementRouter, each INSERT materializing a snapshot view the next
statement reads — the final-state semantics of the lab's continuously
running jobs. Streaming mode on a real deployment is the same DAG with one
``writeStream.start()`` per INSERT and Kafka topics as the intermediate
sinks; here each stage can also be driven through
``streaming.parity.run_stream_over_batch`` for verification.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..plans.router import StatementRouter


@dataclass
class Statement:
    name: str
    sql: str
    depends_on: list[str] = field(default_factory=list)


class PipelineRunner:
    """Topologically executes named statements with depends_on edges."""

    def __init__(self, spark: SparkSession, router: StatementRouter | None = None):
        self.spark = spark
        self.router = router or StatementRouter(spark)
        self._statements: dict[str, Statement] = {}

    def add(self, name: str, sql: str, depends_on: list[str] | None = None) -> None:
        self._statements[name] = Statement(name, sql, depends_on or [])

    def run(self) -> list[str]:
        """Execute all statements in dependency order; returns the order."""
        order: list[str] = []
        done: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in done:
                return
            if name in visiting:
                raise ValueError(f"dependency cycle at {name}")
            visiting.add(name)
            for dep in self._statements[name].depends_on:
                if dep in self._statements:
                    visit(dep)
            visiting.discard(name)
            self.router.execute(self._statements[name].sql)
            done.add(name)
            order.append(name)

        for name in self._statements:
            visit(name)
        return order
