"""Run configuration and identifier templating — SURVEY.md D8/S10/S11
(razu/config.py:74-154, razu/identifiers.py:5-121, razu/run_info.py:8-62).

Engine-idiomatic design: an explicit `Settings` instance (plus thin
singleton helpers for API familiarity) with the same observable
semantics users rely on — YAML load, attribute access, set-once
immutability, bulk `add_properties`, required-key validation. Settings
feed Spark plans as *literal columns* (Catalyst constant-folds them);
nothing here is distributed state.

The identifier builders exist twice by design: Column expressions in
functions/scalars.py for the data path, and the plain-string forms
here for driver-side paths/keys — both render the same templates
(`{file_id}-{creator}-{archive}-{id}`, CDN uri,
millions/thousands S3 bucketing; identifiers.py:11-86).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Any


class Settings:
    """Set-once key/value settings (config.py:144-147: overriding an
    existing setting raises)."""

    def __init__(self, **initial: Any):
        object.__setattr__(self, "_settings", {})
        self.add_properties(**initial)

    @classmethod
    def from_yaml(cls, path: str) -> "Settings":
        import yaml  # gated: not needed unless YAML config is used

        with open(path, "r") as fh:
            data = yaml.safe_load(fh) or {}
        if not isinstance(data, dict):
            raise ValueError(f"config file {path!r} must hold a mapping")
        return cls(**data)

    def __getattr__(self, name: str) -> Any:
        settings = object.__getattribute__(self, "_settings")
        if name in settings:
            return settings[name]
        raise AttributeError(f"no setting {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        settings = object.__getattribute__(self, "_settings")
        if name in settings:
            raise ValueError(f"cannot override existing setting {name!r}")
        settings[name] = value

    def add_properties(self, **kwargs: Any) -> None:
        for name in kwargs:
            if name in object.__getattribute__(self, "_settings"):
                raise ValueError(f"cannot override existing setting {name!r}")
        object.__getattribute__(self, "_settings").update(kwargs)

    def require(self, *names: str) -> None:
        missing = [n for n in names
                   if n not in object.__getattribute__(self, "_settings")]
        if missing:
            raise AttributeError(f"missing required settings: {missing}")

    def as_dict(self) -> dict[str, Any]:
        return dict(object.__getattribute__(self, "_settings"))


_instance: Settings | None = None


def initialize(config_file: str | None = None, **kwargs: Any) -> Settings:
    """Singleton facade (config.py:119-127 semantics: re-initialize
    returns the existing instance)."""
    global _instance
    if _instance is None:
        _instance = Settings.from_yaml(config_file) if config_file else Settings(**kwargs)
    return _instance


def get_instance() -> Settings:
    global _instance
    if _instance is None:
        _instance = Settings()
    return _instance


def reset() -> None:
    global _instance
    _instance = None


# ---------------------------------------------------------------------------
# Driver-side identifier builders (identifiers.py:11-121). Column-side
# twins live in functions/scalars.py.
# ---------------------------------------------------------------------------

def make_uid(object_id: Any, file_id: str = "NL-WbDRAZU",
             creator: str = "G0321", archive: str = "661") -> str:
    return f"{file_id}-{creator}-{archive}-{object_id}"


def make_uri(uid: str, base: str = "https://data.razu.nl",
             segment: str = "id", kind: str = "object") -> str:
    return f"{base}/{segment}/{kind}/{uid}"


def make_filename(uid: str, suffix: str = "meta", ext: str = "json") -> str:
    return f"{uid}.{suffix}.{ext}"


def make_s3_key(object_id: int, uid: str) -> str:
    millions, thousands = object_id // 1_000_000, (object_id % 1_000_000) // 1_000
    return f"{millions:03d}/{thousands:03d}/{uid}"


def extract_object_id(uid_or_filename: str, file_id: str = "NL-WbDRAZU") -> str:
    """Positional token after the `{file_id}-{creator}-{archive}-`
    prefix (util.py:73-107)."""
    rest = uid_or_filename.split(f"{file_id}-", 1)[-1]
    parts = rest.split("-")
    if len(parts) < 3:
        raise ValueError(f"not a {file_id} identifier: {uid_or_filename!r}")
    return parts[2].split(".")[0]


# ---------------------------------------------------------------------------
# Run info (run_info.py:8-62) — S11. Same JSON artifact layout.
# ---------------------------------------------------------------------------

RUN_INFO_SUFFIX = "_run_info.json"


class RunInfo:
    def __init__(self, directory: str, run_id: str, name: str | None = None,
                 uri: str | None = None):
        self.directory, self.id = directory, run_id
        self.name, self.uri = name, uri
        self.start_time = ""
        self.end_time = ""
        path = self._path()
        if name is None and os.path.exists(path):
            with open(path, "r", encoding="utf-8") as fh:
                info = json.load(fh)
            self.name, self.uri = info["name"], info["uri"]
            self.start_time, self.end_time = info["start_time"], info["end_time"]

    def _path(self) -> str:
        return os.path.join(self.directory, f"{self.id}{RUN_INFO_SUFFIX}")

    def register_start(self) -> None:
        self.start_time = datetime.now(timezone.utc).isoformat()

    def register_end(self) -> None:
        self.end_time = datetime.now(timezone.utc).isoformat()

    def save(self, result: str = "") -> None:
        with open(self._path(), "w", encoding="utf-8") as fh:
            json.dump({"name": self.name, "uri": self.uri,
                       "start_time": self.start_time,
                       "end_time": self.end_time, "result": result},
                      fh, indent=4)
