"""Source-config validation (SURVEY.md §1.3).

Mirrors the reference's JSON-Schema draft-07 contract
(``schema/v1.json:1-43``; test ``test/source.test.js:10-31``): required
fields, frequency enum, no additional properties. Implemented directly
(no jsonschema dependency in this environment) with identical
accept/reject behavior.
"""

from __future__ import annotations

from typing import Any

from .schemas import VALID_FREQUENCIES

REQUIRED = ("schema", "provider", "frequency", "active")
OPTIONAL = ("secretKey", "meta")
ALLOWED = set(REQUIRED) | set(OPTIONAL)

_TYPES: dict[str, type | tuple[type, ...]] = {
    "schema": str,
    "provider": str,
    "frequency": str,
    "secretKey": str,
    "active": bool,
    "meta": dict,
}


class ConfigError(ValueError):
    pass


def validate_source_config(cfg: dict[str, Any]) -> dict[str, Any]:
    """Validate and return the config; raise ConfigError with every
    violation listed (the reference's Ajv errors-all mode)."""
    errors: list[str] = []
    for field in REQUIRED:
        if field not in cfg:
            errors.append(f"missing required field {field!r}")
    for field in cfg:
        if field not in ALLOWED:
            errors.append(f"unknown field {field!r} (additionalProperties: false)")
    for field, expected in _TYPES.items():
        if field in cfg and not isinstance(cfg[field], expected):
            errors.append(
                f"field {field!r} expects {getattr(expected, '__name__', expected)}"
            )
    if isinstance(cfg.get("frequency"), str) and cfg["frequency"] not in VALID_FREQUENCIES:
        errors.append(
            f"frequency {cfg['frequency']!r} not in {VALID_FREQUENCIES}"
        )
    if errors:
        raise ConfigError("; ".join(errors))
    return cfg


def resolve_paths(cfg: dict[str, Any], data_root: str | None) -> dict[str, Any]:
    """Expand ``{data_root}`` placeholders in meta values (the local
    twin of the reference's BUCKET/STACK env wiring, fetcher/index.js:8-10).
    Returns a new config; non-string meta values pass through."""
    if not data_root or "meta" not in cfg:
        return cfg
    meta = {
        k: v.replace("{data_root}", data_root) if isinstance(v, str) else v
        for k, v in cfg["meta"].items()
    }
    return {**cfg, "meta": meta}


def config_lookup(
    cfg: dict[str, Any],
    default: tuple[tuple[str, str, str], ...],
) -> tuple[tuple[str, str, str], ...]:
    """Per-provider measurand lookup from ``meta.lookup`` — the config
    twin of the reference's per-provider ``lookup`` consts (e.g.
    senstate.js:13-25, cpcb.js:30-52). Rows are
    [input_param, parameter, unit]; falls back to the pipeline shape's
    generic table when a config doesn't ship one."""
    rows = cfg.get("meta", {}).get("lookup")
    if not rows:
        return default
    return tuple((r[0], r[1], r[2]) for r in rows)


def source_label(cfg: dict[str, Any]) -> str:
    """Human source name: meta.source_name when present (configs mapped
    from the reference), else the provider/pipeline-shape name."""
    return cfg.get("meta", {}).get("source_name") or cfg["provider"]
