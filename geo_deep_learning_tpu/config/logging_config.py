"""Logging setup.

Reference equivalent: ``config/logging_config.py:8-20`` +
``config/log_config.yaml`` (colorlog dictConfig loaded at import time).
colorlog is optional here; without it a plain formatter with the same
layout is used. Called explicitly by the CLI rather than as an import
side effect.
"""

from __future__ import annotations

import logging
import logging.config

_FORMAT = "%(asctime)s %(levelname)-8s %(name)s: %(message)s"


def setup_logging(level: int | str = logging.INFO) -> None:
    handlers: dict = {
        "console": {
            "class": "logging.StreamHandler",
            "formatter": "default",
            "stream": "ext://sys.stdout",
        }
    }
    formatters: dict = {"default": {"format": _FORMAT}}
    try:
        import colorlog  # noqa: F401

        formatters["default"] = {
            "()": "colorlog.ColoredFormatter",
            "format": "%(log_color)s" + _FORMAT,
        }
    except ImportError:
        pass
    logging.config.dictConfig(
        {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": formatters,
            "handlers": handlers,
            "root": {"level": level, "handlers": ["console"]},
        }
    )
