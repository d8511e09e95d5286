"""The real HTTP transport (frontier/transports.py HttpTransport) and the
--fetch-missing-resources CLI flag, exercised against a loopback HTTP server
(reference semantics: convert.js:165-200 response handling + mod.js:7-60
flag surface). No external network is touched."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from mhtml_to_html_ray.frontier.transports import HttpTransport, HttpTransportFactory
from tests.helpers import page

PNG_BYTES = b"\x89PNG\r\n\x1a\nfakepng"


class _Handler(BaseHTTPRequestHandler):
    # class-level script: path → (status, headers, body) | "close"
    routes: dict = {}
    hits: list = []

    def do_GET(self):  # noqa: N802 (http.server API)
        type(self).hits.append(self.path)
        route = self.routes.get(self.path)
        if route is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if isinstance(route, list):
            route = route.pop(0) if len(route) > 1 else route[0]
        status, headers, body = route
        self.send_response(status)
        for name, value in headers.items():
            self.send_header(name, value)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def loopback():
    _Handler.routes = {}
    _Handler.hits = []
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_port}", _Handler
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_http_transport_ok_and_content_type(loopback):
    base, handler = loopback
    handler.routes["/img.png"] = (200, {"Content-Type": "image/png"}, PNG_BYTES)
    response = HttpTransport()(f"{base}/img.png")
    assert response.ok and response.status == 200
    assert response.bytes() == PNG_BYTES
    assert response.headers.get("Content-Type") == "image/png"


def test_http_transport_error_status_not_thrown(loopback):
    base, handler = loopback
    handler.routes["/gone"] = (404, {}, b"")
    response = HttpTransport()(f"{base}/gone")
    assert not response.ok and response.status == 404


def test_http_transport_retry_after_surfaced(loopback):
    base, handler = loopback
    handler.routes["/busy"] = (503, {"Retry-After": "7"}, b"")
    response = HttpTransport()(f"{base}/busy")
    assert not response.ok and response.status == 503
    assert response.headers.get("Retry-After") == "7"


def test_http_transport_network_error_raises():
    # refused connection must RAISE (the transient path of the retry policy)
    with pytest.raises(Exception):
        HttpTransport(timeout_s=2.0)("http://127.0.0.1:9/nothing-listens-here")


def test_http_transport_factory_is_picklable():
    import pickle

    factory = pickle.loads(pickle.dumps(HttpTransportFactory(timeout_s=5.0)))
    assert isinstance(factory(), HttpTransport)


def test_fetch_missing_resources_over_http(loopback):
    """Kernel round loop (convert.js:129-163) with the real transport: the
    absent image is fetched from the loopback server and inlined."""
    import base64

    from mhtml_to_html_ray.kernel.convert import Config, convert

    base, handler = loopback
    handler.routes["/img.png"] = (200, {"Content-Type": "image/png"}, PNG_BYTES)
    mhtml = page(body=f'<img src="{base}/img.png">')
    result = convert(
        bytes(mhtml),
        Config(fetch_missing_resources=True, fetch=HttpTransport()),
    )
    expected = base64.b64encode(PNG_BYTES).decode()
    assert f"data:image/png;base64,{expected}" in result.data
    assert result.unfound_resources == []
    assert handler.hits.count("/img.png") == 1


def test_fetch_missing_retries_transient_then_succeeds(loopback):
    from mhtml_to_html_ray.kernel.convert import Config, convert

    base, handler = loopback
    handler.routes["/flaky.png"] = [
        (500, {}, b""),
        (200, {"Content-Type": "image/png"}, PNG_BYTES),
    ]
    mhtml = page(body=f'<img src="{base}/flaky.png">')
    result = convert(
        bytes(mhtml),
        Config(fetch_missing_resources=True, fetch=HttpTransport(),
               sleep_ms=lambda ms: None),
    )
    assert "data:image/png;base64," in result.data
    assert handler.hits.count("/flaky.png") == 2


def test_cli_convert_files_fetch_missing(loopback, ray_session, tmp_path):
    """mod.js flag parity end-to-end: run the CLI with
    --fetch-missing-resources against the loopback server."""
    from mhtml_to_html_ray.run import main

    base, handler = loopback
    handler.routes["/cli.png"] = (200, {"Content-Type": "image/png"}, PNG_BYTES)
    source = tmp_path / "page.mht"
    source.write_bytes(bytes(page(body=f'<img src="{base}/cli.png">')))
    assert main(["convert-files", str(source), "--fetch-missing-resources"]) == 0
    output = (tmp_path / "page.html").read_text()
    assert "data:image/png;base64," in output
    assert "/cli.png" in handler.hits[0]
