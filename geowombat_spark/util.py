"""Filename/date utilities — driver-side helpers mirroring
``/root/reference/src/geowombat/core/util.py:61-196``.

These never touch executors: they order the *path list* a scan plan is
built from (``gw.open(list, time_names=...)``), so plain Python is the
right tool — cited here to keep the API map complete.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import re
from collections import OrderedDict
from pathlib import Path

#: filename date shapes tried, most-specific first (regex stand-in for the
#: reference's optional ``dateparser`` dependency, ``util.py:80-96``)
_DATE_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(\d{4})-(\d{2})-(\d{2})", "%Y-%m-%d"),
    (r"(\d{4})(\d{2})(\d{2})", "%Y%m%d"),
    (r"(\d{4})-(\d{2})", "%Y-%m"),
)


def parse_filename_dates(filenames) -> list:
    """Parse a date out of every file name (``util.py:61-103``): first
    date-shaped substring wins. Like the reference, if ANY name fails to
    parse the whole list falls back to the 1..N ordinal sequence (so
    time_names stay aligned with the file list)."""
    filenames = list(filenames)
    out = []
    for fn in filenames:
        base = os.path.splitext(os.path.basename(str(fn)))[0]
        parsed = None
        for pat, fmt in _DATE_PATTERNS:
            m = re.search(pat, base)
            if m:
                try:
                    parsed = dt.datetime.strptime(m.group(0), fmt)
                    break
                except ValueError:
                    continue
        if parsed is None:
            return list(range(1, len(filenames) + 1))
        out.append(parsed)
    return out


def sort_images_by_date(
    image_path=None,
    image_wildcard: str = "*",
    date_pos: int = 0,
    date_start: int = 0,
    date_end: int = 8,
    split_by: str = "_",
    date_format: str = "%Y%m%d",
    file_list=None,
    prepend_str: str | None = None,
) -> "OrderedDict[str, dt.datetime]":
    """Positional filename-date sort (``util.py:134-196``): split each base
    name by ``split_by``, take piece ``date_pos``, slice
    ``[date_start:date_end]``, parse with ``date_format``; return an
    OrderedDict of name → datetime in ascending date order (the reference's
    contract: ``keys()`` feed ``gw.open``, ``values()`` are the
    time_names)."""
    if file_list:
        fl = [str(f) for f in file_list]
    else:
        fl = sorted(glob.glob(str(Path(image_path) / image_wildcard)))
    if prepend_str:
        fl = [prepend_str + f for f in fl]
    dates = []
    for fn in fl:
        base = os.path.splitext(os.path.basename(fn))[0]
        piece = base.split(split_by)[date_pos]
        dates.append(
            dt.datetime.strptime(piece[date_start:date_end], date_format)
        )
    return OrderedDict(
        sorted(zip(fl, dates), key=lambda kv: (kv[1], kv[0]))
    )
