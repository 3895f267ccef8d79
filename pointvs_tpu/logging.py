"""Globally accessible named loggers with stream + file handlers.

Behavioural counterpart of the reference's point_vs/logging.py: LOGLEVEL env
var controls verbosity, an optional log_path adds an `output.log` file
handler, and DataFrame/Series messages are pretty-printed.
"""
from __future__ import annotations

import logging as _logging
import os
from pathlib import Path


class DFLogger(_logging.Logger):
    """Logger that renders pandas objects legibly."""

    def _format_msg(self, msg):
        try:
            import pandas as pd
            if isinstance(msg, (pd.DataFrame, pd.Series)):
                body = msg.to_string().replace('\n', '\n\t')
                return f'--- DataFrame with contents ---\n\t{body}'
        except ImportError:
            pass
        return msg

    def _log(self, level, msg, args, **kwargs):
        super()._log(level, self._format_msg(msg), args, **kwargs)


_logging.setLoggerClass(DFLogger)

_FORMAT = _logging.Formatter(
    '{asctime} [{levelname}] [{module}:{lineno}] {name}: {message}',
    '%Y:%m:%d %H:%M:%S', style='{')


def get_logger(log_name: str = 'PointVS-TPU', log_path=None, level=None):
    """Create or fetch a named logger; optionally attach a file handler."""
    logger = _logging.getLogger(log_name)
    logger.propagate = False
    level = level or os.environ.get('LOGLEVEL', 'INFO').upper()
    logger.setLevel(level)

    if not any(type(h) is _logging.StreamHandler for h in logger.handlers):
        handler = _logging.StreamHandler()
        handler.setFormatter(_FORMAT)
        handler.setLevel(level)
        logger.addHandler(handler)

    if log_path is not None:
        fname = str(Path(log_path, 'output.log'))
        if not any(isinstance(h, _logging.FileHandler)
                   and getattr(h, 'baseFilename', None) == fname
                   for h in logger.handlers):
            fhandler = _logging.FileHandler(fname, mode='w', encoding='utf-8')
            fhandler.setFormatter(_FORMAT)
            fhandler.setLevel(level)
            logger.addHandler(fhandler)

    return logger
