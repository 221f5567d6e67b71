"""HTTP serving API tests (stdlib client against an in-process server)."""

import io
import json
import urllib.request
import wave

import numpy as np
import pytest

from qwen3_tts_tpu.serve.api import TtsServer


@pytest.fixture(scope="module")
def server(tiny_engine):
    tiny_engine.set_max_steps(4)
    srv = TtsServer(tiny_engine, host="127.0.0.1", port=0).start()
    yield srv
    srv.stop()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def test_health(server):
    with urllib.request.urlopen(_url(server, "/health"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert "vivian" in body["speakers"]


def test_tts_endpoint(server):
    req = urllib.request.Request(
        _url(server, "/tts"),
        data=json.dumps({"text": "server test", "speaker": "vivian",
                         "seed": 5, "max_steps": 4}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        rtf = r.headers.get("X-QTTS-RTF")
        data = r.read()
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 24000
        assert w.getnchannels() == 1
    assert rtf is not None


def test_tts_stream_endpoint(server):
    req = urllib.request.Request(
        _url(server, "/tts?stream=1"),
        data=json.dumps({"text": "stream", "seed": 2,
                         "max_steps": 4}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("audio/L16")
        pcm = r.read()  # urllib de-chunks transfer-encoding
    samples = np.frombuffer(pcm, np.int16)
    spf = 4  # tiny config samples_per_frame
    assert len(samples) % spf == 0


def test_bad_request(server):
    req = urllib.request.Request(
        _url(server, "/tts"), data=b"not json",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_not_found(server):
    try:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_tts_via_online_batcher(tiny_engine):
    """Server in batched mode routes /tts through the continuous scheduler."""
    import urllib.request
    from qwen3_tts_tpu.serve.api import TtsServer
    from qwen3_tts_tpu.serve.online import OnlineBatcher

    tiny_engine.set_max_steps(4)
    ob = OnlineBatcher(tiny_engine, batch_size=2, bucket=32,
                       max_frames_per_stream=3, idle_poll_s=0.01).start()
    srv = TtsServer(tiny_engine, host="127.0.0.1", port=0, batcher=ob).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/tts",
            data=json.dumps({"text": "batched", "max_steps": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            frames = int(r.headers["X-QTTS-Frames"])
            data = r.read()
        assert frames <= 3
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnframes() == frames * 4  # tiny spf = 4
    finally:
        srv.stop()
        ob.stop()
