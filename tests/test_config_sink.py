"""S9 — config sink: compose/save locally, POST config + debug info to a
remote endpoint with basic auth (app/config_handler.py semantics).

The remote tests run against an in-process HTTP server on a loopback
port — no external network.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

import pytest

from predictor_spark.sources import config_sink as cs


class _Handler(BaseHTTPRequestHandler):
    requests_seen: list[dict] = []
    fail_next = False

    def _record(self, body: bytes):
        type(self).requests_seen.append({
            "method": self.command,
            "path": self.path,
            "auth": self.headers.get("Authorization"),
            "form": {k: v[0] for k, v in parse_qs(body.decode()).items()},
        })

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self._record(body)
        if type(self).fail_next:
            type(self).fail_next = False
            self.send_response(500)
            self.end_headers()
            return
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def do_GET(self):
        self._record(b"")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps({"plugin": "tcn", "window_size": 79}).encode())

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_server():
    _Handler.requests_seen = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_compose_config_drops_defaults():
    """config_handler.py:19-33 — only non-default keys survive; a key that
    matches the app default OR the plugin default is dropped."""
    defaults = {"epochs": 100, "plugin": "ann"}
    plugin_defaults = {"filters": 19, "layers": 3}
    cfg = {"epochs": 100, "plugin": "tcn", "filters": 19, "layers": 5, "window": 79}
    out = cs.compose_config(cfg, defaults, plugin_defaults)
    assert out == {"plugin": "tcn", "layers": 5, "window": 79}


def test_save_and_load_roundtrip(tmp_path):
    cfg = {"plugin": "tcn", "epochs": 100}
    ret_cfg, path = cs.save_config(cfg, str(tmp_path / "config_out.json"),
                                   defaults={"epochs": 100})
    assert ret_cfg is cfg  # reference returns (config, path)
    assert cs.load_config(path) == {"plugin": "tcn"}


def test_remote_save_config_posts_overlay_with_auth(http_server):
    ok = cs.remote_save_config(
        {"plugin": "tcn", "epochs": 100}, http_server + "/config",
        "user", "secret", defaults={"epochs": 100})
    assert ok is True
    (req,) = _Handler.requests_seen
    assert req["method"] == "POST" and req["path"] == "/config"
    expect = "Basic " + base64.b64encode(b"user:secret").decode()
    assert req["auth"] == expect
    assert json.loads(req["form"]["json_config"]) == {"plugin": "tcn"}


def test_remote_log_posts_config_and_result(http_server):
    ok = cs.remote_log({"plugin": "tcn"}, {"mae": 0.12}, http_server + "/log",
                       "u", "p")
    assert ok is True
    (req,) = _Handler.requests_seen
    assert json.loads(req["form"]["json_config"]) == {"plugin": "tcn"}
    assert json.loads(req["form"]["json_result"]) == {"mae": 0.12}


def test_remote_failure_returns_false_not_raise(http_server, capsys):
    """config_handler.py:55-57 — HTTP failure is swallowed to a False
    return + stderr message (a failed log must not kill a 25-min run)."""
    _Handler.fail_next = True
    ok = cs.remote_save_config({"a": 1}, http_server + "/config", "u", "p")
    assert ok is False
    assert "Failed to save remote configuration" in capsys.readouterr().err
    # connection refused path (no server on port 9): also False, no raise
    assert cs.remote_log({}, {}, "http://127.0.0.1:9/", "u", "p") is False


def test_remote_load_config(http_server):
    cfg = cs.remote_load_config(http_server + "/cfg", "u", "p")
    assert cfg == {"plugin": "tcn", "window_size": 79}
    assert cs.remote_load_config("http://127.0.0.1:9/") is None


def test_merge_config_precedence():
    """config_merger.py:18-77 — plugin1 < plugin2 < defaults < file < CLI,
    CLI applied only for present flags, unknown values type-coerced."""
    merged = cs.merge_config(
        defaults={"epochs": 100, "plugin": "ann"},
        plugin_params1={"filters": 8, "epochs": 1},
        plugin_params2={"filters": 19},
        file_config={"plugin": "tcn", "window": 79},
        cli_args={"epochs": 200, "lr": 0.001},
        unknown_args={"mmd_lambda": "0.5", "tag": "run7"},
        cli_keys=["epochs", "mmd_lambda", "tag"],
    )
    assert merged["filters"] == 19        # plugin2 over plugin1
    assert merged["plugin"] == "tcn"      # file over defaults
    assert merged["window"] == 79
    assert merged["epochs"] == 200        # CLI (present flag) wins
    assert "lr" not in merged             # parsed but flag not on argv
    assert merged["mmd_lambda"] == 0.5    # unknown arg, float-coerced
    assert merged["tag"] == "run7"        # unknown arg, stays string


def test_process_unknown_args_and_convert():
    assert cs.process_unknown_args(["--a", "1", "--b", "x"]) == {"a": "1", "b": "x"}
    assert cs.convert_type("3") == 3
    assert cs.convert_type("3.5") == 3.5
    assert cs.convert_type("abc") == "abc"


def test_merge_config_requires_cli_keys_for_cli_args():
    """Without the present-flag list, argparse defaults would silently
    override the file config — merge_config refuses instead."""
    with pytest.raises(ValueError, match="cli_keys"):
        cs.merge_config({}, {}, {}, {"epochs": 6}, {"epochs": 100}, {})
    # unknown args alone need no key list: they exist because typed
    out = cs.merge_config({}, {}, {}, {"epochs": 6}, {}, {"lr": "0.1"})
    assert out == {"epochs": 6, "lr": 0.1}
