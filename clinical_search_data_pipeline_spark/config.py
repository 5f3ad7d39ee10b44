"""Layered job configuration: defaults <- file <- environment.

Reference S6 (SURVEY.md §2.1): every job loads a YAML file then lets
environment variables override individual keys (streaming_to_curated_stream
.py:45-62, producer_base.py:24-36). Same precedence here, JSON instead of
YAML (stdlib-only), and typed access so jobs fail fast on bad values.

Env mapping: key ``kafka.bootstrap_servers`` <- ``CSDP_KAFKA_BOOTSTRAP_SERVERS``
(prefix + upper-snake of the dotted path).
"""

from __future__ import annotations

import json
import os
from typing import Any

ENV_PREFIX = "CSDP_"


def _flatten(d: dict, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _env_key(path: str) -> str:
    return ENV_PREFIX + path.replace(".", "_").upper()


class Config:
    """Flat dotted-path view over layered config values."""

    def __init__(self, values: dict[str, Any]):
        self._values = values

    def get(self, path: str, default: Any = None) -> Any:
        return self._values.get(path, default)

    def require(self, path: str) -> Any:
        if path not in self._values:
            raise KeyError(
                f"missing config key {path!r} (set {_env_key(path)} or add it "
                "to the config file)"
            )
        return self._values[path]

    def get_int(self, path: str, default: int | None = None) -> int:
        v = self.get(path, default)
        if v is None:
            raise KeyError(f"missing int config key {path!r}")
        return int(v)

    def as_dict(self) -> dict[str, Any]:
        return dict(self._values)


def load_config(
    defaults: dict | None = None,
    config_file: str | None = None,
    environ: dict[str, str] | None = None,
) -> Config:
    """defaults <- JSON file (optional, nested ok) <- env vars (highest)."""
    env = os.environ if environ is None else environ
    values = _flatten(defaults or {})
    if config_file and os.path.exists(config_file):
        with open(config_file) as fh:
            values.update(_flatten(json.load(fh)))
    # env overrides known keys only — the defaults/file define the key space
    # (underscore/dot ambiguity makes reverse-mapping new env keys unsafe)
    for path in list(values):
        if (ev := env.get(_env_key(path))) is not None:
            values[path] = ev
    return Config(values)
