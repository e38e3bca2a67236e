"""Named logger with per-channel levels.

Equivalent of the reference's compile-time-filtered named logger
(include/xerus/misc/namedLogger.h, tensorLogger.h:29-37) using stdlib logging
with runtime-settable levels per channel.
"""

from __future__ import annotations

import logging

_ROOT = "xerus_tpu"

logging.getLogger(_ROOT).addHandler(logging.NullHandler())


def get_logger(channel: str = "") -> logging.Logger:
    name = f"{_ROOT}.{channel}" if channel else _ROOT
    return logging.getLogger(name)


def set_log_level(level, channel: str = "") -> None:
    get_logger(channel).setLevel(level)
