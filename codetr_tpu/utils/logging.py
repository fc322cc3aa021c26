"""Logging / observability.

The reference's story is thin but real: mmengine MMLogger for load-time
warnings (swin.py:659-661), python ``warnings`` (codetr.py:121), and C++
ILogger implementations with a severity filter (codetr_inference.cpp:165-178,
plugin logger bridge deformable_attention_plugin.cpp:471-507).  The TPU
framework centralizes the same roles here:

- ``get_logger()``: namespaced stdlib logger with a severity filter set once
  (CODETR_LOG_LEVEL env var or ``set_level``) — the ILogger analog.
- ``warn_once``: deduplicated warnings (mmengine print_log-style), used for
  checkpoint remap notices and numeric-contract diagnostics.
- ``log_load_report``: checkpoint load summary (matched / missing /
  unexpected keys) — the analog of mmengine's load_state_dict report.
"""

from __future__ import annotations

import logging
import os
from typing import Iterable, Set

_LOGGER_NAME = "codetr_tpu"
_seen_warnings: Set[str] = set()


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s",
                              datefmt="%H:%M:%S")
        )
        logger.addHandler(handler)
        logger.propagate = False
        logger.setLevel(os.environ.get("CODETR_LOG_LEVEL", "INFO").upper())
    return logger


def set_level(level: str) -> None:
    get_logger().setLevel(level.upper())


def warn_once(msg: str) -> None:
    """Deduplicated warning (repeated remap notices collapse to one line)."""
    if msg not in _seen_warnings:
        _seen_warnings.add(msg)
        get_logger().warning(msg)


def log_load_report(
    matched: int, missing: Iterable[str], unexpected: Iterable[str], source: str
) -> None:
    """Checkpoint load summary (mmengine _load_checkpoint_to_model analog)."""
    logger = get_logger()
    missing = list(missing)
    unexpected = list(unexpected)
    logger.info("loaded %d params from %s", matched, source)
    if missing:
        logger.warning(
            "missing %d keys (kept at init): %s%s", len(missing),
            ", ".join(missing[:5]), " ..." if len(missing) > 5 else "",
        )
    if unexpected:
        logger.warning(
            "unexpected %d checkpoint keys (ignored): %s%s", len(unexpected),
            ", ".join(unexpected[:5]), " ..." if len(unexpected) > 5 else "",
        )
