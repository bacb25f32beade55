"""Logging conventions — the reference's [INFO ]/[WARN ]/[ERROR] printf
style plus the compile-gated DEBUGMSG (reference: src/joins/joincommon.h:48-56,
--enable-debug configure.ac:68-73; here gated by SMJ_DEBUG=1).

Statistics deliberately go to stderr and results to stdout so scripts can
split the streams (joincommon.c:177-196)."""

from __future__ import annotations

import os
import sys

DEBUG = os.environ.get("SMJ_DEBUG", "0") == "1"


def debugmsg(msg: str) -> None:
    if DEBUG:
        print(f"[DEBUG] {msg}", file=sys.stderr)


def info(msg: str) -> None:
    print(f"[INFO ] {msg}", file=sys.stderr)


def warn(msg: str) -> None:
    print(f"[WARN ] {msg}", file=sys.stderr)


def error(msg: str) -> None:
    print(f"[ERROR] {msg}", file=sys.stderr)
