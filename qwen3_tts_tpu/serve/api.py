"""Minimal HTTP serving API (stdlib http.server; no extra dependencies).

Endpoints:
  GET  /health            -> {"status": "ok", "speakers": [...]}
  POST /tts               -> audio/wav
        body: {"text": "...", "speaker": "vivian", "instruction": null,
               "max_steps": 512, "temperature": 0.7, "top_k": 40,
               "top_p": 0.9, "seed": null}
  POST /tts?stream=1      -> chunked audio/l16 (raw PCM16 chunks as they
                             are generated; ~333 ms of audio per chunk)

The reference exposes no server (SURVEY.md §1: CLI only); this is the
production-serving front of the framework.  Two execution modes:
  * direct (default): requests serialize through a lock on the engine —
    right for single-user / streaming use;
  * batched: pass `TtsServer(..., batcher=OnlineBatcher(engine, ...))` and
    non-streaming /tts requests are submitted to the continuous-batching
    scheduler, so concurrent requests share device batches.
"""

from __future__ import annotations

import io
import json
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..core import protocol as P
from ..core.config import SamplerConfig


def _wav_bytes(samples: np.ndarray, rate: int = P.SAMPLE_RATE) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.clip(np.rint(samples * 32767.0), -32768, 32767)
                      .astype(np.int16).tobytes())
    return buf.getvalue()


def make_handler(engine, lock: threading.Lock, batcher=None):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            from ..utils.logging import get_logger
            get_logger().info("http " + fmt % args)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/health"):
                body = json.dumps({
                    "status": "ok",
                    "speakers": sorted(engine.speakers),
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            try:
                self._do_post()
            except BrokenPipeError:
                pass
            except Exception as e:   # engine failure -> 500, keep serving
                from ..utils.logging import get_logger
                get_logger().exception("tts request failed")
                try:
                    self.send_error(500, f"synthesis failed: {e}")
                except Exception:
                    pass

        def _do_post(self):
            if not self.path.startswith("/tts"):
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
            except (KeyError, json.JSONDecodeError) as e:
                self.send_error(400, f"bad request: {e}")
                return
            stream = "stream=1" in (self.path.split("?", 1) + [""])[1]
            voice = engine.get_speaker(req.get("speaker", P.DEFAULT_SPEAKER))
            instruct = req.get("instruction")
            if batcher is not None and not stream:
                from .batch import BatchRequest
                fut = batcher.submit(BatchRequest(
                    text, voice, instruct,
                    max_frames=req.get("max_steps")))
                result = fut.result()
                body = _wav_bytes(result.audio.samples)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("X-QTTS-Frames", str(result.frames))
                self.end_headers()
                self.wfile.write(body)
                return
            with lock:
                engine.set_sampler_config(SamplerConfig(
                    temperature=float(req.get("temperature", 0.7)),
                    top_k=int(req.get("top_k", 40)),
                    top_p=float(req.get("top_p", 0.9)),
                    seed=req.get("seed")))
                if "max_steps" in req:
                    engine.set_max_steps(int(req["max_steps"]))
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/L16;rate=24000")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for chunk in engine.generate_stream(text, voice, instruct):
                        pcm = np.clip(np.rint(chunk * 32767.0), -32768, 32767
                                      ).astype(np.int16).tobytes()
                        self.wfile.write(f"{len(pcm):x}\r\n".encode())
                        self.wfile.write(pcm + b"\r\n")
                    self.wfile.write(b"0\r\n\r\n")
                    return
                audio = engine.generate_with_voice(text, voice, instruct)
            body = _wav_bytes(audio.samples)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            if engine.last_metrics:
                self.send_header("X-QTTS-RTF",
                                 f"{engine.last_metrics.rtf:.4f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


class TtsServer:
    """Threaded HTTP server wrapping one engine."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8777,
                 batcher=None):
        self.engine = engine
        self.batcher = batcher
        self._lock = threading.Lock()
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(engine, self._lock, batcher))
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "TtsServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)


def main(argv=None) -> int:
    import argparse
    ap = argparse.ArgumentParser(prog="qwen3_tts_tpu.serve.api")
    ap.add_argument("--model-dir", default="models")
    ap.add_argument("--quant", default="none")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--batch", type=int, default=4,
                    help="continuous-batching lanes (0 = serialized "
                         "single-stream per request)")
    ap.add_argument("--bucket", type=int, default=128,
                    help="prompt bucket for the batched scheduler")
    ap.add_argument("--buckets", default=None,
                    help="comma-separated prompt buckets, e.g. 64,128,256: "
                         "routes each request to the smallest fitting "
                         "bucket's scheduler (overrides --bucket)")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile serving programs before listening")
    args = ap.parse_args(argv)
    from ..engine import TtsEngine
    engine = TtsEngine(model_dir=args.model_dir, quant=args.quant)
    buckets = ([int(x) for x in args.buckets.split(",")]
               if args.buckets else None)
    if args.warmup:
        engine.warmup(buckets=tuple(buckets) if buckets
                      else (args.bucket or 128,),
                      batch_sizes=(max(args.batch, 1),))
    batcher = None
    if args.batch > 0:
        if buckets:
            from .online import OnlineRouter
            batcher = OnlineRouter(engine, batch_size=args.batch,
                                   buckets=buckets)
        else:
            from .online import OnlineBatcher
            batcher = OnlineBatcher(engine, batch_size=args.batch,
                                    bucket=args.bucket).start()
    server = TtsServer(engine, args.host, args.port, batcher=batcher)
    print(f"serving on {args.host}:{server.port}")
    server.start()
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
