"""Structured logging for the framework (SURVEY.md §5 observability row:
the reference only has println!s; here a proper logger with optional JSON
event emission for serving metrics)."""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_LOGGER: Optional[logging.Logger] = None


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("qwen3_tts_tpu")
        if not logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s %(message)s"))
            logger.addHandler(handler)
        logger.setLevel(os.environ.get("QTTS_LOG_LEVEL", "WARNING").upper())
        _LOGGER = logger
    return _LOGGER


def log_event(event: str, **fields: Any) -> None:
    """Emit a JSON metrics event (RTF, TTFT, steps, EOS cause, ...) when
    QTTS_JSON_METRICS=1; always logged at DEBUG level."""
    record: Dict[str, Any] = {"event": event, "ts": time.time(), **fields}
    line = json.dumps(record, default=str)
    if os.environ.get("QTTS_JSON_METRICS"):
        print(line, file=sys.stderr, flush=True)
    get_logger().debug(line)
