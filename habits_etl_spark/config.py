"""Declarative mapping schema — the engine analog of the reference's
``etl/config/habits.yml`` + ``HabitSpec`` (reference etl/transform.py:8-12).

The config declares which wide-source columns are meaningful and how to
coerce each one. At plan-build time the config is compiled into a list of
Column expressions (select-list codegen) — never into per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

try:
    import yaml  # optional; config can also be built programmatically
except ImportError:  # pragma: no cover
    yaml = None

DEFAULT_TIMEZONE = "America/Chicago"
DEFAULT_EMAIL_COLUMN = "Email Address"

# Truthy set for bool habit coercion (reference etl/transform.py:14)
TRUTHY = ("yes", "true", "1", "y", "t", "on")


@dataclass(frozen=True)
class HabitSpec:
    """One habit column mapping (reference etl/transform.py:8-12)."""

    id: str
    type: str  # "bool" | "number"
    invert: bool = False

    def __post_init__(self) -> None:
        if self.type not in ("bool", "number"):
            raise ValueError(f"habit {self.id!r}: type must be bool|number, got {self.type!r}")


@dataclass(frozen=True)
class PipelineConfig:
    """Full mapping config (reference etl/config/habits.yml:1-18)."""

    date_column: str
    habits: dict[str, HabitSpec]  # wide-column name -> spec
    email_column: str = DEFAULT_EMAIL_COLUMN
    timezone: str = DEFAULT_TIMEZONE
    notes_columns: tuple[str, ...] = field(default_factory=tuple)
    source: str = "sheets"

    @classmethod
    def from_dict(cls, cfg: dict) -> "PipelineConfig":
        habits = {col: HabitSpec(**spec) for col, spec in cfg["habits"].items()}
        return cls(
            date_column=cfg["date_column"],
            habits=habits,
            email_column=cfg.get("email_column", DEFAULT_EMAIL_COLUMN),
            timezone=cfg.get("timezone", DEFAULT_TIMEZONE),
            notes_columns=tuple(cfg.get("notes_columns", ())),
            source=cfg.get("source", "sheets"),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        if yaml is None:  # pragma: no cover
            raise RuntimeError("pyyaml not available; use PipelineConfig.from_dict")
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))
