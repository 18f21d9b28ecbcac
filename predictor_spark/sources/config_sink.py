"""S9 — config sink: save merged config JSON locally and POST it (plus
run debug info) to a remote endpoint with basic auth.

Reference semantics: app/config_handler.py — compose_config:19-33 (keep
only keys that differ from app defaults and plugin defaults),
save_config:35-40, save_debug_info:42-44, remote_save_config:46-57,
remote_load_config:59-70, remote_log:72-88; called from
app/main.py:303-317 after every run.

This is a driver-side control-plane surface, not a data-plane sink: the
payload is one small JSON document per run, so a plain blocking POST is
the right tool even on a 1000-executor cluster (the reference does the
same). Defaults/plugin-defaults are passed in explicitly instead of
resolved through a plugin loader — the engine's model registry has no
global default table.
"""

from __future__ import annotations

import json
import sys
from typing import Any

try:  # public `requests` — same dependency the reference uses
    import requests
    _REQUESTS_ERR = None
except ImportError as _e:  # pragma: no cover - requests ships in the image
    requests = None
    _REQUESTS_ERR = _e


def _need_requests() -> None:
    if requests is None:  # pragma: no cover
        raise ImportError(f"remote config sink needs `requests`: {_REQUESTS_ERR}")


def compose_config(
    config: dict[str, Any],
    defaults: dict[str, Any] | None = None,
    plugin_defaults: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Keep only the keys whose value differs from both the app defaults
    and the plugin defaults (config_handler.py:19-33): the saved config is
    the minimal overlay that reproduces the run."""
    defaults = defaults or {}
    plugin_defaults = plugin_defaults or {}
    out: dict[str, Any] = {}
    for k, v in config.items():
        if k not in defaults or v != defaults[k]:
            if k not in plugin_defaults or v != plugin_defaults[k]:
                out[k] = v
    return out


def save_config(
    config: dict[str, Any],
    path: str = "config_out.json",
    defaults: dict[str, Any] | None = None,
    plugin_defaults: dict[str, Any] | None = None,
) -> tuple[dict[str, Any], str]:
    """config_handler.py:35-40 — write the composed overlay as indented
    JSON; returns (config, path) like the reference."""
    composed = compose_config(config, defaults, plugin_defaults)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(composed, f, indent=4)
    return config, path


def save_debug_info(debug_info: dict[str, Any], path: str = "debug_out.json") -> None:
    """config_handler.py:42-44."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(debug_info, f, indent=4)


def load_config(path: str) -> dict[str, Any]:
    """config_handler.py:9-12."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def remote_save_config(
    config: dict[str, Any],
    url: str,
    username: str | None,
    password: str | None,
    defaults: dict[str, Any] | None = None,
    plugin_defaults: dict[str, Any] | None = None,
) -> bool:
    """config_handler.py:46-57 — POST form field ``json_config`` with
    basic auth; False (never raise) on any request failure."""
    _need_requests()
    composed = compose_config(config, defaults, plugin_defaults)
    try:
        response = requests.post(
            url,
            auth=(username, password) if username else None,
            data={"json_config": json.dumps(composed)},
        )
        response.raise_for_status()
        return True
    except requests.RequestException as e:
        print(f"Failed to save remote configuration: {e}", file=sys.stderr)
        return False


def remote_load_config(
    url: str, username: str | None = None, password: str | None = None
) -> dict[str, Any] | None:
    """config_handler.py:59-70 — GET a JSON config; None on failure."""
    _need_requests()
    try:
        if username and password:
            response = requests.get(url, auth=(username, password))
        else:
            response = requests.get(url)
        response.raise_for_status()
        return response.json()
    except requests.RequestException as e:
        print(f"Failed to load remote configuration: {e}", file=sys.stderr)
        return None


def remote_log(
    config: dict[str, Any],
    debug_info: dict[str, Any],
    url: str,
    username: str | None,
    password: str | None,
    defaults: dict[str, Any] | None = None,
    plugin_defaults: dict[str, Any] | None = None,
) -> bool:
    """config_handler.py:72-88 — POST ``json_config`` + ``json_result``
    form fields with basic auth; False on failure."""
    _need_requests()
    composed = compose_config(config, defaults, plugin_defaults)
    try:
        response = requests.post(
            url,
            auth=(username, password) if username else None,
            data={
                "json_config": json.dumps(composed),
                "json_result": json.dumps(debug_info),
            },
        )
        response.raise_for_status()
        return True
    except requests.RequestException as e:
        print(f"Failed to log remote information: {e}", file=sys.stderr)
        return False


def process_unknown_args(unknown_args: list[str]) -> dict[str, str]:
    """config_merger.py:6-7 — pair up ``--key value`` residue from the
    CLI parser."""
    return {
        unknown_args[i].lstrip("-"): unknown_args[i + 1]
        for i in range(0, len(unknown_args) - 1, 2)
    }


def convert_type(value: str):
    """config_merger.py:9-16 — int, else float, else string."""
    try:
        return int(value)
    except ValueError:
        try:
            return float(value)
        except ValueError:
            return value


def merge_config(
    defaults: dict[str, Any],
    plugin_params1: dict[str, Any],
    plugin_params2: dict[str, Any],
    file_config: dict[str, Any],
    cli_args: dict[str, Any],
    unknown_args: dict[str, str],
    cli_keys: list[str] | None = None,
) -> dict[str, Any]:
    """config_merger.py:18-77 — precedence merge of the six config
    sources: plugin1 < plugin2 < app defaults < file < CLI. CLI keys are
    applied only for flags actually present on the command line
    (``cli_keys``; the reference reads sys.argv — passed explicitly here
    so the merge is a pure function), known argparse keys win over
    unknown ones, and unknown values get int/float coercion.

    ``cli_keys`` is REQUIRED whenever cli_args is non-empty: an argparse
    namespace contains a default for every flag NOT typed on the command
    line, and applying those would silently override the file config —
    the exact precedence inversion the reference's sys.argv filter
    prevents (config_merger.py:62). unknown_args need no key list: they
    exist only because they were typed."""
    merged: dict[str, Any] = {}
    merged.update(plugin_params1)
    merged.update(plugin_params2)
    merged.update(defaults)
    merged.update(file_config)
    if cli_keys is None:
        if cli_args:
            raise ValueError(
                "merge_config: cli_keys (the flags actually present on the "
                "command line) is required when cli_args is non-empty — "
                "argparse defaults would otherwise override the file config"
            )
        cli_keys = list(unknown_args)
    for key in cli_keys:
        if key in cli_args:
            merged[key] = cli_args[key]
        elif key in unknown_args:
            merged[key] = convert_type(unknown_args[key])
    return merged
