"""HTTP API contract tests — route shapes match the reference server.

Exercised through the in-process dispatcher (no sockets except one
live-server smoke test). Jobs run on the real runner thread against the
synthetic fixture, offline.
"""

import asyncio
import json
import re
import time
from pathlib import Path

import numpy as np
import pytest

from s2sr_tpu.config.settings import Settings
from s2sr_tpu.fetch.synthetic import synthetic_scene
from s2sr_tpu.server.app import create_app
from s2sr_tpu.server.http import BackgroundTasks, Request
from s2sr_tpu.utils import write_json


def make_request(method, path, body=b"", headers=None, query=None):
    return Request(method=method, path=path, query=query or {},
                   headers=headers or {}, body=body)


async def call(app, method, path, json_body=None, body=b"", headers=None):
    if json_body is not None:
        body = json.dumps(json_body).encode()
    response, background = await app.dispatch(
        make_request(method, path, body=body, headers=headers))
    if background:
        for fn, args, kwargs in background.tasks:
            fn(*args, **kwargs)
    payload = None
    if response.media_type == "application/json" and response.body:
        payload = json.loads(response.body)
    return response, payload


@pytest.fixture()
def app(tmp_path):
    data_dir = tmp_path / "data"
    aoi = tmp_path / "aoi.geojson"
    write_json({
        "type": "Feature",
        "geometry": {"type": "Polygon", "coordinates": [[
            [35.0, 32.0], [35.02, 32.0], [35.02, 32.02],
            [35.0, 32.02], [35.0, 32.0]]]},
    }, aoi)
    settings = Settings(data_dir=str(data_dir), aoi_path=str(aoi),
                        offline=True, weights_dir=str(tmp_path / "weights"),
                        tile_min_zoom=12, tile_max_zoom=13)
    (data_dir / "source").mkdir(parents=True)
    return create_app(settings)


@pytest.fixture()
def seeded_scene(app):
    path = Path(app.settings.data_dir) / "source" / "scene.tif"
    synthetic_scene(path=path, size=(64, 64))
    write_json({"scene_id": "fixture", "cloud_cover_pct": 1.0,
                "acquisition_date": "2026-08-15T00:00:00Z"},
               path.with_suffix(".json"))
    return path


def wait_for(app, job_id, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        job = app.jobs.get(job_id)
        if job and job["status"] in ("completed", "failed"):
            return job
        time.sleep(0.1)
    raise TimeoutError(f"job {job_id} stuck: {app.jobs.get(job_id)}")


def test_health(app):
    resp, payload = asyncio.run(call(app, "GET", "/health"))
    assert resp.status_code == 200
    assert payload == {"status": "healthy", "service": "up42-sentinel-poc"}


def test_config_shape(app):
    _, payload = asyncio.run(call(app, "GET", "/api/config"))
    assert set(payload) == {"mapboxAccessToken", "tileMinZoom", "tileMaxZoom",
                            "defaultCenter", "defaultZoom"}


def test_metadata_empty_state(app):
    _, payload = asyncio.run(call(app, "GET", "/api/metadata"))
    assert payload["tileset"] is None
    assert payload["tilesAvailable"] is False
    assert payload["tileEndpoints"]["wow"] == "/tiles_wow/{z}/{x}/{y}.png"


def test_tile_404(app):
    resp, payload = asyncio.run(call(app, "GET", "/tiles/10/1/2.png"))
    assert resp.status_code == 404
    assert payload == {"detail": "Tile not found"}


def test_sr_validation(app, seeded_scene):
    resp, payload = asyncio.run(call(app, "POST", "/api/sr",
                                     json_body={"scale": 5}))
    assert resp.status_code == 400
    assert payload["detail"] == "Scale must be 2, 3, or 4"
    resp, payload = asyncio.run(call(app, "POST", "/api/sr",
                                     json_body={"model": "bogus"}))
    assert resp.status_code == 400
    assert "edsr" in payload["detail"]


def test_sr_404_without_source(app):
    resp, payload = asyncio.run(call(app, "POST", "/api/sr", json_body={}))
    assert resp.status_code == 404


def test_wow_job_end_to_end(app, seeded_scene):
    resp, payload = asyncio.run(call(app, "POST", "/api/wow", json_body={
        "input_file": str(seeded_scene), "enhance_crops": True}))
    assert resp.status_code == 200
    job_id = payload["job_id"]
    assert job_id.startswith("wow_")
    job = wait_for(app, job_id)
    assert job["status"] == "completed", job["message"]
    assert job["message"] == "WOW Super-resolution complete! 🌟"
    assert Path(job["result"]["outputs"]["sr_tif"]).exists()
    # tiles_wow generated with the zoom-bump rule max+2 ≤ 20
    _, meta = asyncio.run(call(app, "GET", "/api/metadata"))
    assert meta["wowTilesAvailable"] is True

    # status endpoint returns the raw job dict
    _, status = asyncio.run(call(app, "GET", f"/api/sr/{job_id}"))
    assert status["status"] == "completed"


def test_enhance_upload_multipart(app):
    from PIL import Image
    import io

    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    boundary = "testboundary123"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="model"\r\n\r\n'
        f"realesrgan_x4\r\n"
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="image"; filename="up.png"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}",
               "content-length": str(len(body))}
    resp, payload = asyncio.run(call(app, "POST", "/api/enhance",
                                     body=body, headers=headers))
    assert resp.status_code == 200, payload
    job = wait_for(app, payload["job_id"])
    assert job["status"] == "completed", job["message"]
    # download route serves files from the job output dir
    out_dir = Path(job["output_dir"])
    pngs = list(out_dir.glob("*.png"))
    assert pngs
    resp, _ = asyncio.run(call(
        app, "GET", f"/api/sr/download/{payload['job_id']}/{pngs[0].name}"))
    assert resp.status_code == 200
    assert resp.body[:8] == b"\x89PNG\r\n\x1a\n"


def test_enhance_rejects_bad_model(app):
    boundary = "b"
    body = (f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="model"\r\n\r\nweird\r\n'
            f"--{boundary}--\r\n").encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}
    resp, payload = asyncio.run(call(app, "POST", "/api/enhance",
                                     body=body, headers=headers))
    assert resp.status_code == 400


def test_pipeline_end_to_end_offline(app):
    """Full pipeline: synthetic fetch → tiles → WOW SR → SR tiles."""
    resp, payload = asyncio.run(call(app, "POST", "/api/pipeline", json_body={
        "min_zoom": 12, "max_zoom": 13}))
    assert payload["steps"] == ["fetch", "original_tiles",
                                "super_resolution", "sr_tiles"]
    job = wait_for(app, payload["job_id"], timeout=900)
    assert job["status"] == "completed", job["message"]
    names = [s["name"] for s in job["steps"]]
    assert names == ["fetch", "original_tiles", "super_resolution", "sr_tiles"]
    assert all(s["status"] == "completed" for s in job["steps"])
    # pipeline listing filter
    _, listing = asyncio.run(call(app, "GET", "/api/pipelines"))
    assert payload["job_id"] in listing["jobs"]
    # tiles are actually served
    data_dir = Path(app.settings.data_dir)
    one = next((data_dir / "tiles").glob("*/*/*.png"))
    z, x, yname = one.parts[-3], one.parts[-2], one.parts[-1]
    resp, _ = asyncio.run(call(app, "GET", f"/tiles/{z}/{x}/{yname}"))
    assert resp.status_code == 200


def test_spa_fallback(app):
    resp, payload = asyncio.run(call(app, "GET", "/some/client/route"))
    assert resp.status_code == 200
    # with the static client present the fallback serves index.html;
    # without it, the JSON endpoint map (reference main.py:1316-1346)
    if payload is None:
        assert b"<html" in resp.body.lower()
    else:
        assert "endpoints" in payload


class live_server:
    """Context-managed real server on a background loop thread; exits
    through serve()'s graceful-shutdown path (stop event → connections
    closed → shutdown hooks → loop closed → thread joined), so tests
    leak neither sockets nor 'Task was destroyed' warnings."""

    def __init__(self, app, port: int):
        self.app, self.port = app, port

    def __enter__(self):
        import threading

        from s2sr_tpu.server.http import serve

        self.loop = asyncio.new_event_loop()
        started = __import__("threading").Event()

        async def main():
            self.stop = asyncio.Event()
            ready = asyncio.Event()
            task = asyncio.ensure_future(
                serve(self.app, host="127.0.0.1", port=self.port,
                      stop=self.stop, ready=ready))
            await ready.wait()
            started.set()
            await task

        def runner():
            asyncio.set_event_loop(self.loop)
            try:
                self.loop.run_until_complete(main())
            finally:
                self.loop.close()

        self.thread = threading.Thread(target=runner, daemon=True)
        self.thread.start()
        assert started.wait(10), "server did not start"
        return self

    def __exit__(self, *exc):
        self.loop.call_soon_threadsafe(self.stop.set)
        self.thread.join(timeout=10)
        assert not self.thread.is_alive(), "server did not shut down"
        assert self.loop.is_closed()


def test_live_socket_server(app):
    """One real TCP round-trip through the asyncio server, with a clean
    cancellation-driven shutdown (VERDICT r2 weak #7)."""
    import urllib.request

    with live_server(app, 18099):
        with urllib.request.urlopen("http://127.0.0.1:18099/health",
                                    timeout=5) as r:
            assert json.loads(r.read())["status"] == "healthy"
    # graceful exit ran the shutdown hooks: the runner refuses new work
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        app.runner.submit("post-shutdown", lambda: None)


def test_runtime_metrics(app):
    _, payload = asyncio.run(call(app, "GET", "/api/runtime"))
    assert "devices" in payload
    assert payload["max_concurrent"] >= 1
    assert isinstance(payload["jobs_by_status"], dict)


def test_prometheus_metrics_endpoint(app):
    """/metrics serves Prometheus text format 0.0.4 with runner gauges
    and per-status job counts (observability beyond the reference)."""
    app.jobs.create("m1", status="completed")
    app.jobs.create("m2", status="failed")
    resp, _ = asyncio.run(call(app, "GET", "/metrics"))
    assert resp.status_code == 200
    assert resp.media_type.startswith("text/plain")
    text = resp.body.decode()
    assert "# TYPE s2sr_jobs gauge" in text
    assert 's2sr_jobs{status="completed"} 1' in text
    assert 's2sr_jobs{status="failed"} 1' in text
    assert re.search(r"^s2sr_runner_max_concurrent \d+$", text, re.M)
    assert re.search(r"^s2sr_uptime_seconds \d", text, re.M)


# --- security hardening (ADVICE r1) ------------------------------------

def test_spa_rejects_path_traversal(app, tmp_path):
    """GET with ../ segments must never escape static_dir (ADVICE r1 #1)."""
    secret = tmp_path / "secret.txt"
    secret.write_text("credentials")
    depth = len(Path(__file__).resolve().parts) + 4
    for path in ("/" + "../" * depth + "etc/passwd",
                 f"/..%2F..%2F{secret}",
                 f"/{secret}"):
        resp, payload = asyncio.run(call(app, "GET", path))
        assert b"credentials" not in resp.body
        assert b"root:" not in resp.body


def test_upload_filename_sanitised(app):
    """Client multipart filename with ../ must stay inside the upload dir
    (ADVICE r1 #2)."""
    boundary = "bsec"
    evil_name = "../../../../escape_marker.png"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="model"\r\n\r\n'
        f"realesrgan_x4\r\n"
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="image"; filename="{evil_name}"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + b"notapng" + f"\r\n--{boundary}--\r\n".encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}

    async def dispatch_only():
        resp, _ = await app.dispatch(make_request(
            "POST", "/api/enhance", body=body, headers=headers))
        return resp

    resp = asyncio.run(dispatch_only())  # don't run the background job
    assert resp.status_code == 200
    payload = json.loads(resp.body)
    uploads = Path(app.settings.data_dir) / "uploads" / payload["job_id"]
    saved = list(uploads.iterdir())
    assert [p.name for p in saved] == ["escape_marker.png"]
    data_root = Path(app.settings.data_dir).resolve()
    escaped = [p for p in data_root.parent.rglob("escape_marker.png")
               if not p.resolve().is_relative_to(data_root)]
    assert escaped == []


def test_multipart_preserves_binary_trailing_bytes():
    """strip() must not eat payload bytes that look like CRLF (ADVICE r1 #3)."""
    boundary = "bbin"
    payload_bytes = b"\x00\x01BINARY\n\n\r"  # ends in LF LF CR
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="f"; filename="x.bin"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + payload_bytes + f"\r\n--{boundary}--\r\n".encode()
    req = make_request(
        "POST", "/x", body=body,
        headers={"content-type": f"multipart/form-data; boundary={boundary}"})
    _, files = req.multipart()
    assert files["f"].content == payload_bytes


def test_job_ids_unique_within_second():
    from s2sr_tpu.server.app import _new_job_id
    import re

    ids = [_new_job_id("wow_") for _ in range(64)]
    assert len(set(ids)) == len(ids)
    assert all(re.fullmatch(r"wow_\d{8}_\d{6}_[0-9a-f]{6}", i) for i in ids)


# --- batch coalescing (SURVEY §2d / VERDICT r1 #9) ----------------------

def test_runner_coalesces_consecutive_same_key_jobs():
    import threading

    from s2sr_tpu.server.jobs import JobRunner, JobStore

    store = JobStore()
    runner = JobRunner(store, max_concurrent=1)
    gate = threading.Event()
    runner.submit("block", lambda: gate.wait(5))

    calls = []

    def many(items):
        calls.append([j for j, _ in items])

    def single():
        calls.append("single")

    for i in range(3):
        store.create(f"j{i}")
        runner.submit(f"j{i}", single, coalesce_key=("enhance", "m"),
                      payload={"i": i}, many_fn=many)
    runner.submit("other", single, coalesce_key=("enhance", "x"),
                  payload={}, many_fn=many)
    time.sleep(0.1)
    gate.set()
    runner.join(10)
    assert ["j0", "j1", "j2"] in calls       # merged into one batch
    assert calls.count("single") == 1        # different key ran alone


def test_enhance_jobs_coalesce_end_to_end(app):
    """Two uploads queued behind a busy device run as ONE pooled SR batch."""
    import threading
    from PIL import Image
    import io

    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    boundary = "bco"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="model"\r\n\r\n'
        f"realesrgan_x4\r\n"
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="image"; filename="a.png"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}

    gate = threading.Event()
    app.runner.submit("hold", lambda: gate.wait(10))
    job_ids = []
    for _ in range(2):
        resp, payload = asyncio.run(call(app, "POST", "/api/enhance",
                                         body=body, headers=headers))
        assert resp.status_code == 200, payload
        job_ids.append(payload["job_id"])
    gate.set()
    app.runner.join(600)
    for jid in job_ids:
        job = app.jobs.get(jid)
        assert job["status"] == "completed", job["message"]
        assert job.get("coalesced") == 2


def test_api_decode_qr_upload(app):
    """/api/decode scans an uploaded QR image (QR/serial flow,
    reference qr-ocr.service.ts rebuilt server-side)."""
    import io

    from PIL import Image

    from s2sr_tpu.decode import encode_qr
    from s2sr_tpu.decode.qr_encode import render

    img = render(encode_qr("KBTX1234567890123", level="M"), scale=8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    boundary = "bqr"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="enhance_retry"\r\n\r\n'
        f"false\r\n"
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="image"; filename="plate.png"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}

    resp, payload = asyncio.run(call(
        app, "POST", "/api/decode", body=body, headers=headers))
    assert resp.status_code == 200
    assert payload["qr"]["text"] == "KBTX1234567890123"
    assert payload["serial"] == "KBTX1234567890123"
    assert payload["attempts"][0]["stage"] == "original"
    assert not payload["retried_with_enhancement"]


def test_api_decode_rejects_non_image(app):
    boundary = "bqr2"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="image"; filename="x.png"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + b"not an image" + f"\r\n--{boundary}--\r\n".encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}
    resp, _ = asyncio.run(call(
        app, "POST", "/api/decode", body=body, headers=headers))
    assert resp.status_code == 400


def test_transport_hostile_requests():
    """Raw-socket fuzz (r2): hostile requests must get clean 4xx/5xx
    responses — never a 500 from an OS error or a silently-dropped
    body — and the server must stay alive."""
    import socket
    import threading

    from s2sr_tpu.server.http import serve

    settings = Settings(data_dir="/tmp/s2sr_fuzz_data", offline=True)
    app = create_app(settings)
    port = 18999

    def raw(req: bytes) -> bytes:
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        s.sendall(req)
        try:
            data = s.recv(4096)
        except socket.timeout:
            data = b""
        s.close()
        return data.split(b"\r\n")[0]

    with live_server(app, port):
        long_path = b"GET /" + b"a" * 50000 + b" HTTP/1.1\r\n\r\n"
        assert raw(long_path) == b"HTTP/1.1 404 Not Found"
        chunked = (b"POST /api/sr HTTP/1.1\r\n"
                   b"Transfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n")
        assert raw(chunked) == b"HTTP/1.1 501 Not Implemented"
        bad_len = b"POST /api/sr HTTP/1.1\r\nContent-Length: abc\r\n\r\n"
        assert raw(bad_len) == b"HTTP/1.1 400 Bad Request"
        # still alive
        assert raw(b"GET /health HTTP/1.1\r\n\r\n") == b"HTTP/1.1 200 OK"


def _multipart_png(img: np.ndarray, fields: dict, boundary: str) -> tuple:
    """(body, headers) for a PNG upload with extra form fields."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    parts = b""
    for name, value in fields.items():
        parts += (f"--{boundary}\r\n"
                  f'Content-Disposition: form-data; name="{name}"\r\n\r\n'
                  f"{value}\r\n").encode()
    parts += (f"--{boundary}\r\n"
              f'Content-Disposition: form-data; name="image"; '
              f'filename="up.png"\r\nContent-Type: image/png\r\n\r\n'
              ).encode() + buf.getvalue()
    parts += f"\r\n--{boundary}--\r\n".encode()
    headers = {"Content-Type": f"multipart/form-data; boundary={boundary}"}
    return parts, headers


def test_live_server_mixed_concurrent_soak(app, seeded_scene):
    """Mixed workload against the REAL socket server: concurrent enhance
    uploads (device-bound, coalescible), QR decodes (executor-bound), a
    vectors job, and read-only polls all in flight at once. Every job
    must complete and the server must shut down cleanly afterwards —
    this guards against cross-request state bleed and runner/event-loop
    deadlock under true concurrency (the reference serves the same mix
    through uvicorn workers, main.py)."""
    import threading
    import urllib.request

    from s2sr_tpu.decode import encode_qr
    from s2sr_tpu.decode.qr_encode import render

    port = 18097
    base = f"http://127.0.0.1:{port}"
    errors: list[str] = []
    rng = np.random.default_rng(7)

    def http(method, path, body=None, headers=None, timeout=30):
        req = urllib.request.Request(base + path, data=body,
                                     headers=headers or {}, method=method)
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    def poll(path, deadline_s=90):
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            job = http("GET", path)
            if job["status"] in ("completed", "failed"):
                return job
            time.sleep(0.25)
        raise TimeoutError(f"{path} stuck")

    def enhance_worker(i):
        try:
            img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            body, headers = _multipart_png(
                img, {"model": "realesrgan_x4"}, f"soak{i}")
            payload = http("POST", "/api/enhance", body, headers)
            job = poll(f"/api/sr/{payload['job_id']}")
            assert job["status"] == "completed", job["message"]
        except Exception as exc:  # noqa: BLE001 — collected for the assert
            errors.append(f"enhance{i}: {exc!r}")

    def decode_worker(i):
        try:
            img = render(encode_qr(f"KBTX12345678901{i:02d}", level="M"),
                         scale=8)
            body, headers = _multipart_png(
                img, {"enhance_retry": "false"}, f"soakqr{i}")
            payload = http("POST", "/api/decode", body, headers)
            assert payload["serial"] == f"KBTX12345678901{i:02d}", payload
        except Exception as exc:  # noqa: BLE001
            errors.append(f"decode{i}: {exc!r}")

    def vectors_worker():
        try:
            payload = http("POST", "/api/vectors", b"{}",
                           {"Content-Type": "application/json"})
            job = poll(f"/api/vectors/{payload['job_id']}")
            assert job["status"] == "completed", job["message"]
        except Exception as exc:  # noqa: BLE001
            errors.append(f"vectors: {exc!r}")

    def reader_worker(stop_evt):
        try:
            while not stop_evt.is_set():
                assert http("GET", "/health")["status"] == "healthy"
                http("GET", "/api/metadata")
                http("GET", "/api/runtime")
                time.sleep(0.1)
        except Exception as exc:  # noqa: BLE001
            errors.append(f"reader: {exc!r}")

    with live_server(app, port):
        stop_evt = threading.Event()
        threads = (
            [threading.Thread(target=enhance_worker, args=(i,))
             for i in range(3)]
            + [threading.Thread(target=decode_worker, args=(i,))
               for i in range(2)]
            + [threading.Thread(target=vectors_worker)]
        )
        reader = threading.Thread(target=reader_worker, args=(stop_evt,))
        reader.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
            assert not t.is_alive(), "soak worker hung"
        stop_evt.set()
        reader.join(timeout=10)
        assert not errors, errors
        # server still fully responsive after the burst
        assert http("GET", "/health")["status"] == "healthy"


def test_shutdown_marks_queued_jobs_failed(tmp_path):
    """VERDICT r2 #8: shutdown flushes in-flight state — queued jobs are
    durably marked failed instead of silently vanishing."""
    import threading

    from s2sr_tpu.server.jobs import JobRunner, JobStore

    store = JobStore()
    runner = JobRunner(store, max_concurrent=1)
    gate = threading.Event()
    store.create("j-running", status="processing")
    store.create("j-queued", status="queued")
    runner.submit("j-running", lambda: gate.wait(5))
    runner.submit("j-queued", lambda: store.update("j-queued", status="completed"))
    time.sleep(0.1)          # let the worker pick up j-running
    gate_release = threading.Timer(0.3, gate.set)
    gate_release.start()
    runner.stop(timeout=5)
    gate_release.join()
    assert store.get("j-queued")["status"] == "failed"
    assert "shut down" in store.get("j-queued")["message"]
    with pytest.raises(RuntimeError):
        runner.submit("late", lambda: None)


# --- server review fixes (r3) -------------------------------------------

def test_download_rejects_double_encoded_traversal(app):
    """%252f in the download filename must not become a path separator:
    the transport decodes once; dispatch must NOT decode again."""
    app.jobs.create("sr_trav", status="completed",
                    output_dir=app.settings.data_dir)
    # what the transport hands dispatch after its single decode
    resp, _ = asyncio.run(call(
        app, "GET",
        "/api/sr/download/sr_trav/..%2f..%2f..%2f..%2f..%2fetc%2fpasswd"))
    assert resp.status_code == 404
    assert b"root:" not in resp.body
    # and over a real socket with the double-encoded original
    import http.client

    with live_server(app, 18095):
        conn = http.client.HTTPConnection("127.0.0.1", 18095, timeout=5)
        conn.request("GET", "/api/sr/download/sr_trav/"
                     + "..%252f" * 6 + "etc%252fpasswd")
        r = conn.getresponse()
        body = r.read()
        assert r.status == 404
        assert b"root:" not in body
        conn.close()


def test_method_not_allowed_and_head(app):
    """Wrong method on an existing path is 405+Allow (FastAPI semantics),
    and HEAD serves GET routes with the body suppressed."""
    resp, payload = asyncio.run(call(app, "POST", "/health"))
    assert resp.status_code == 405
    assert resp.headers["Allow"] == "GET"
    assert payload == {"detail": "Method Not Allowed"}

    import http.client

    with live_server(app, 18094):
        conn = http.client.HTTPConnection("127.0.0.1", 18094, timeout=5)
        conn.request("HEAD", "/health")
        r = conn.getresponse()
        body = r.read()
        assert r.status == 200
        assert body == b""
        assert int(r.getheader("Content-Length")) > 0
        conn.close()


def test_tile_coordinate_validation_422(app):
    """Non-integer path params are a 422 validation error (FastAPI
    shape), not a 500 echoing the int() exception."""
    resp, payload = asyncio.run(call(app, "GET", "/tiles/abc/1/2.png"))
    assert resp.status_code == 422
    assert payload["detail"][0]["loc"] == ["path", "z"]
    assert "integer" in payload["detail"][0]["msg"]


def test_geojson_single_content_type(app):
    """A route-supplied Content-Type replaces the default — exactly one
    header on the wire (the reference sends application/geo+json)."""
    vectors_dir = Path(app.settings.data_dir) / "vectors"
    vectors_dir.mkdir(parents=True, exist_ok=True)
    (vectors_dir / "fields.geojson").write_text(
        '{"type": "FeatureCollection", "features": []}')
    import http.client

    with live_server(app, 18093):
        conn = http.client.HTTPConnection("127.0.0.1", 18093, timeout=5)
        conn.request("GET", "/vectors/fields.geojson")
        r = conn.getresponse()
        assert r.msg.get_all("Content-Type") == ["application/geo+json"]
        r.read()
        conn.close()


def test_connection_close_case_insensitive(app):
    """RFC 9110: 'Connection: Close' (any case) must close the socket."""
    import socket

    with live_server(app, 18092):
        s = socket.create_connection(("127.0.0.1", 18092), timeout=5)
        s.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\n"
                  b"Connection: Close\r\n\r\n")
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        assert b"Connection: close" in data
        s.close()


def test_submit_capacity_and_run_sync():
    """submit() reports start-now capacity atomically; run_sync executes
    on the device-owning worker, propagates errors, and bounds waits."""
    import threading

    from s2sr_tpu.server.jobs import JobRunner, JobStore

    store = JobStore()
    runner = JobRunner(store, max_concurrent=1)
    gate = threading.Event()
    assert runner.submit("first", lambda: gate.wait(10)) is True
    assert runner.submit("second", lambda: None) is False  # slot taken
    gate.set()
    runner.join(10)

    assert runner.run_sync(lambda: 41 + 1) == 42
    with pytest.raises(ZeroDivisionError):
        runner.run_sync(lambda: 1 / 0)

    g2 = threading.Event()
    runner.submit("block", lambda: g2.wait(5))
    try:
        with pytest.raises(TimeoutError):
            runner.run_sync(lambda: None, timeout=0.2)
    finally:
        g2.set()
    runner.join(10)


def test_coalesced_batch_isolates_bad_input(app):
    """One corrupt upload in a coalesced batch fails only its own job;
    the valid jobs still complete (reference runs each independently)."""
    import io
    import threading

    from PIL import Image

    img = np.random.default_rng(2).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    def multipart(payload: bytes):
        boundary = "bmix"
        body = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="model"\r\n\r\n'
            f"realesrgan_x4\r\n"
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="image"; filename="a.png"\r\n'
            f"Content-Type: image/png\r\n\r\n"
        ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        return body, {"content-type":
                      f"multipart/form-data; boundary={boundary}"}

    gate = threading.Event()
    app.runner.submit("hold", lambda: gate.wait(10))
    job_ids = []
    for payload in (buf.getvalue(), b"this is not an image",
                    buf.getvalue()):
        body, headers = multipart(payload)
        resp, out = asyncio.run(call(app, "POST", "/api/enhance",
                                     body=body, headers=headers))
        assert resp.status_code == 200, out
        job_ids.append(out["job_id"])
    gate.set()
    app.runner.join(600)
    good0 = app.jobs.get(job_ids[0])
    bad = app.jobs.get(job_ids[1])
    good1 = app.jobs.get(job_ids[2])
    assert good0["status"] == "completed", good0["message"]
    assert good1["status"] == "completed", good1["message"]
    assert bad["status"] == "failed"


def test_multipart_filename_before_name():
    """RFC 7578 does not fix Content-Disposition parameter order: a part
    with filename BEFORE name must still key on the name parameter (the
    old regex matched the name=\"...\" tail of filename=\"...\")."""
    boundary = "bord"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; filename="photo.png"; '
            'name="image"\r\n'
            "Content-Type: image/png\r\n\r\n"
            "PNGDATA\r\n"
            f"--{boundary}--\r\n").encode()
    req = make_request("POST", "/api/decode", body=body,
                       headers={"content-type":
                                f"multipart/form-data; boundary={boundary}"})
    fields, files = req.multipart()
    assert "image" in files and files["image"].filename == "photo.png"
    assert files["image"].content == b"PNGDATA"


def test_non_object_json_body_is_422(app):
    """A JSON array/string body parses but cannot populate a request
    model — must be a 422 validation error, never a TypeError 500."""
    for raw in (b"[1,2]", b'"text"', b"5"):
        resp, payload = asyncio.run(call(
            app, "POST", "/api/sr", body=raw,
            headers={"content-type": "application/json"}))
        assert resp.status_code == 422, (raw, payload)
        assert "JSON object" in payload["detail"]


def test_download_route_on_job_without_output_dir(app):
    """Pipeline/vector jobs carry no output_dir — download must 404,
    not KeyError into a 500."""
    app.jobs.create("pipeline_x", status="completed", message="done")
    resp, payload = asyncio.run(call(
        app, "GET", "/api/sr/download/pipeline_x/out.tif"))
    assert resp.status_code == 404
    assert "no downloadable files" in payload["detail"]


def test_durable_store_never_journals_unknown_ids(tmp_path):
    """Updates for ids that were never create()d (the runner's _sync_*
    pseudo-jobs) must not reach the journal — they would come back as
    phantom jobs on the next boot."""
    from s2sr_tpu.server.persistence import DurableJobStore

    journal = tmp_path / "j.jsonl"
    store = DurableJobStore(journal)
    store.create("real", status="queued")
    assert store.update("_sync_decode_sr_1", status="failed") is False
    assert store.update("real", status="completed") is True

    store2 = DurableJobStore(journal)
    assert store2.get("_sync_decode_sr_1") is None
    assert set(store2.all()) == {"real"}
    assert store2.get("real")["status"] == "completed"


def test_runner_stop_unblocks_queued_run_sync():
    """A queued run_sync item drained by stop() must release its waiter
    immediately (RuntimeError), not leave it blocked for the timeout —
    and must not write a phantom record into the store."""
    import threading

    from s2sr_tpu.server.jobs import JobRunner, JobStore

    store = JobStore()
    runner = JobRunner(store, max_concurrent=1)
    release = threading.Event()
    runner.submit("blocker", release.wait)          # occupies the worker

    result: dict = {}

    def caller():
        try:
            runner.run_sync(lambda: "never", timeout=30, label="t")
        except Exception as exc:  # noqa: BLE001
            result["exc"] = exc

    t = threading.Thread(target=caller)
    t.start()
    # wait until the sync item is queued behind the blocker
    deadline = time.time() + 5
    while runner.queued_count < 1 and time.time() < deadline:
        time.sleep(0.01)
    assert runner.queued_count == 1
    # stop() FIRST, while the worker is still inside the blocker — the
    # sync item is then guaranteed to be drained un-run (releasing the
    # blocker first would race the worker for the queued item)
    runner.stop(timeout=0.5)
    release.set()                   # now let the blocker thread exit
    t.join(timeout=5)
    assert not t.is_alive(), "run_sync caller still blocked after stop()"
    assert isinstance(result.get("exc"), RuntimeError)
    assert "shut down" in str(result["exc"])
    assert all(not k.startswith("_sync") for k in store.all())


def test_file_response_streams_large_files(tmp_path):
    """Files past the threshold stream from disk (stream_path set, body
    empty) with the true size advertised; small files buffer as before."""
    from s2sr_tpu.server.http import _STREAM_THRESHOLD, file_response

    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 1024)
    r = file_response(small)
    assert r.stream_path is None and r.content_length() == 1024

    big = tmp_path / "big.bin"
    big.write_bytes(b"y" * (_STREAM_THRESHOLD + 1))
    r = file_response(big)
    assert r.stream_path == big and r.body == b""
    assert r.content_length() == _STREAM_THRESHOLD + 1


def test_live_socket_streams_large_download(tmp_path):
    """A >8 MB download travels the chunked streaming path over a real
    socket: exact Content-Length, exact bytes, keep-alive preserved
    (a second request on the same connection still works)."""
    import hashlib
    import http.client

    from s2sr_tpu.server.http import _STREAM_THRESHOLD

    # fresh app on its own data dir so the job store is clean
    data_dir = tmp_path / "data"
    (data_dir / "source").mkdir(parents=True)
    settings = Settings(data_dir=str(data_dir), offline=True,
                        weights_dir=str(tmp_path / "w"))
    app2 = create_app(settings)

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    payload = np.random.default_rng(7).integers(
        0, 256, _STREAM_THRESHOLD + 12345).astype(np.uint8).tobytes()
    (out_dir / "big.tif").write_bytes(payload)
    app2.jobs.create("wow_big", status="completed",
                     output_dir=str(out_dir))

    with live_server(app2, 18101):
        conn = http.client.HTTPConnection("127.0.0.1", 18101, timeout=30)
        conn.request("GET", "/api/sr/download/wow_big/big.tif")
        r = conn.getresponse()
        assert r.status == 200
        assert int(r.headers["Content-Length"]) == len(payload)
        body = r.read()
        assert len(body) == len(payload)
        assert hashlib.sha256(body).hexdigest() == \
            hashlib.sha256(payload).hexdigest()
        # connection stays usable after a streamed response
        conn.request("GET", "/health")
        r2 = conn.getresponse()
        assert r2.status == 200 and b"healthy" in r2.read()
        conn.close()


def test_wow_precision_turbo_end_to_end(app, seeded_scene):
    """VERDICT r4 #4: per-request turbo. precision="turbo" routes the
    job through the int8-mixed engine; the chosen mode + quality caveat
    are echoed in the job result and /api/metadata lists the resident
    int8 engine alongside the default."""
    resp, payload = asyncio.run(call(app, "POST", "/api/wow", json_body={
        "input_file": str(seeded_scene), "enhance_crops": False,
        "precision": "turbo"}))
    assert resp.status_code == 200, payload
    # int8 engine construction calibrates on CPU (~1-2 min alone, more
    # when the 1-core box is shared) — give the job extra headroom
    job = wait_for(app, payload["job_id"], timeout=600)
    assert job["status"] == "completed", job["message"]
    assert job["precision"] == "int8"
    md = job["result"]["sr_metadata"]
    assert md["precision"] == "int8"
    assert "-0.03 dB" in md["precision_note"]

    _, meta = asyncio.run(call(app, "GET", "/api/metadata"))
    precisions = {m["precision"] for m in meta["models"].values()}
    assert "int8" in precisions


def test_wow_precision_invalid_rejected(app, seeded_scene):
    resp, payload = asyncio.run(call(app, "POST", "/api/wow", json_body={
        "input_file": str(seeded_scene), "precision": "fp8"}))
    assert resp.status_code == 400
    assert "precision" in payload["detail"].lower()


def test_enhance_precision_field_echoed(app):
    """/api/enhance accepts a multipart precision field; the response
    and job record carry it, and the coalesce identity includes it."""
    from PIL import Image
    import io

    img = np.random.default_rng(1).integers(
        0, 255, (40, 40, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    boundary = "precb"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="precision"\r\n\r\n'
        f"turbo\r\n"
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="image"; filename="p.png"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}",
               "content-length": str(len(body))}
    resp, payload = asyncio.run(call(app, "POST", "/api/enhance",
                                     body=body, headers=headers))
    assert resp.status_code == 200, payload
    assert payload["precision"] == "int8"
    job = wait_for(app, payload["job_id"], timeout=600)
    assert job["status"] == "completed", job["message"]
    assert job["precision"] == "int8"
    assert job["result"]["sr_metadata"]["precision"] == "int8"
