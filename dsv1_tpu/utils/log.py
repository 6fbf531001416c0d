"""Leveled logging (reference dsv.h:215-234, dsv.c:19-39).

Levels: 0=ERROR 1=WARNING 2=INFO 3=DEBUG. Messages print with a
file/function prefix like the reference's DSV_LOG_LVL macros; the CLI's
-l<n> flag sets the level (default WARNING, dsv_main.c:749).
"""

import inspect
import sys

ERROR, WARNING, INFO, DEBUG = 0, 1, 2, 3
_NAMES = ["ERROR", "WARNING", "INFO", "DEBUG"]
_level = WARNING


def set_level(lvl: int):
    global _level
    _level = max(ERROR, min(int(lvl), DEBUG))


def get_level() -> int:
    return _level


def _log(lvl: int, msg: str):
    if lvl > _level:
        return
    fr = inspect.stack()[2]
    print(f"[{_NAMES[lvl]}] {fr.filename.rsplit('/', 1)[-1]}:"
          f"{fr.function}({fr.lineno}): {msg}", file=sys.stderr)


def error(msg: str):
    _log(ERROR, msg)


def warning(msg: str):
    _log(WARNING, msg)


def info(msg: str):
    _log(INFO, msg)


def debug(msg: str):
    _log(DEBUG, msg)
