"""Typed pipeline configuration.

Replaces the reference's ini + three JSON maps (reference:
config/config.py:4-18 ini loading; config/bc_table_map.json business
class → staging table; the table/subject-area configuration mappings
consumed at utilities/utilities.py:428-456 and workflow.ps1:42-43,
443-446) with plain dataclasses — no mutable "active class" ini state
(the reference rewrites its ini to select a class,
change_active_business_class.py:39-61; here names are arguments).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class TableConfig:
    """Per-business-class pipeline settings (FIXTURES.md F6 shape)."""
    business_class_name: str
    staging_table_name: str
    incremental: bool = False
    replication_set_name: str | None = None
    columns_to_load: tuple[str, ...] | None = None

    @property
    def warehouse_table_name(self) -> str:
        # reference: utilities/helpers/table_generator.py:54-56 —
        # warehouse table = staging name minus the `_dl` marker.
        return self.staging_table_name.replace("_dl", "")


@dataclass
class PipelineConfig:
    tables: dict[str, TableConfig] = field(default_factory=dict)
    subject_areas: dict[str, tuple[str, ...]] = field(default_factory=dict)

    def table(self, key: str) -> TableConfig:
        return self.tables[key]

    def classes_for(self, subject_area: str) -> list[TableConfig]:
        return [self.tables[k] for k in self.subject_areas[subject_area]]

    @classmethod
    def from_json(cls, table_map: str | Path | dict,
                  subject_map: str | Path | dict | None = None) -> "PipelineConfig":
        """Load from the reference's JSON map shapes."""
        if not isinstance(table_map, dict):
            table_map = json.loads(Path(table_map).read_text())
        tables = {}
        for key, val in table_map.items():
            if isinstance(val, str):
                # bc_table_map.json shape: {"BC_Name": "staging_table"}
                tables[key] = TableConfig(business_class_name=key,
                                          staging_table_name=val)
            else:
                tables[key] = TableConfig(
                    business_class_name=val["business_class_name"],
                    staging_table_name=val["staging_table_name"],
                    incremental=bool(val.get("incremental", False)),
                    replication_set_name=val.get("replication_set_name"),
                    columns_to_load=tuple(val["columns_to_load"]) if val.get("columns_to_load") else None,
                )
        areas: dict[str, tuple[str, ...]] = {}
        if subject_map is not None:
            if not isinstance(subject_map, dict):
                subject_map = json.loads(Path(subject_map).read_text())
            areas = {k: tuple(v) for k, v in subject_map.items()}
        return cls(tables=tables, subject_areas=areas)
