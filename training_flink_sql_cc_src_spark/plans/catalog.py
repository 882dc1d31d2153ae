"""Table-properties catalog — the Schema-Registry / Flink-catalog analog
(SURVEY.md §1.2): maps table name → (schema, primary key, buckets,
changelog mode, watermark, props).

The reference keeps this state in Confluent Schema Registry + Flink catalog
(topics auto-exposed as tables; DDL like ``PRIMARY KEY … NOT ENFORCED``,
``DISTRIBUTED INTO n BUCKETS``, ``WITH ('changelog.mode'='retract')``,
``MODIFY WATERMARK FOR ts AS ts`` annotates them —
terraform/lab-aggregations/main.tf:396,463,530;
terraform/lab-joins/main.tf:465,498,531,564). Spark's session catalog has
no slots for PK/watermark/changelog, so we carry them here and apply them
at read/write time (upsert view wrapping, watermark attachment, bucketed
repartition on sink).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import StructType


@dataclass
class TableMeta:
    name: str
    schema: StructType | None = None
    primary_key: list[str] = field(default_factory=list)
    buckets: int | None = None
    changelog_mode: str = "append"  # append | upsert | retract
    watermark_col: str | None = None
    watermark_expr: str | None = None  # e.g. "ts" or "ts - INTERVAL '5' SECOND"
    props: dict[str, str] = field(default_factory=dict)

    @property
    def is_keyed(self) -> bool:
        return bool(self.primary_key)

    @property
    def watermark_delay(self) -> str:
        """Spark withWatermark delay derived from the Flink watermark expr:
        ``WATERMARK FOR ts AS ts`` → 0 seconds (S9/S10's zero-delay form);
        ``… AS ts - INTERVAL 'n' unit`` → "n unit"."""
        import re

        if not self.watermark_expr:
            return "0 seconds"
        m = re.search(
            r"INTERVAL\s+'?(\d+)'?\s+(\w+)", self.watermark_expr, re.IGNORECASE
        )
        if m:
            n, unit = m.group(1), m.group(2).lower()
            return f"{n} {unit}{'' if unit.endswith('s') else 's'}"
        return "0 seconds"


class TableCatalog:
    """In-memory catalog keyed by table name (single default namespace —
    the reference's catalog.database namespace from ``sql.current-catalog``
    / ``sql.current-database`` collapses to one level here)."""

    def __init__(self) -> None:
        self._tables: dict[str, TableMeta] = {}

    def register(self, meta: TableMeta) -> None:
        self._tables[meta.name] = meta

    def get(self, name: str) -> TableMeta | None:
        return self._tables.get(name)

    def get_or_create(self, name: str) -> TableMeta:
        if name not in self._tables:
            self._tables[name] = TableMeta(name=name)
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def names(self) -> list[str]:
        return sorted(self._tables)
