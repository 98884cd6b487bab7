"""date_time_tz_ranges parsing (F5) — native re-implementation.

The reference delegates to ``findyourpaths/phil/datetime``
(``/root/reference/scrape/scrape.go:1697-1798``), which is not vendored.
This module re-implements the subset exercised by the golden fixtures,
whose observable rendering rules are:

* ISO ``YYYY-MM-DD``            -> ``YYYY-MM-DD``          (date-only)
* ``Month D, YYYY`` (comma)      -> ``YYYY-MM-DD``          (date-only)
* ``Mon D YYYY``   (no comma)    -> ``YYYY-MM-DDT00:00:00Z`` (midnight UTC)
* month+day with no year         -> resolved against baseYear
  (baseYear protocol: scan sorted ``*__Aurl`` record keys for a
  parseable year, else the reference year —
  ``/root/reference/scrape/scrape.go:1708-1757``)

``HasStartMonthAndDay`` gates emission of the ``__Pdate_time_tz_ranges``
key (scrape.go:1781-1787).

Known gap vs the reference (documented, asserted in tests): phil's
behavior on long non-date prose occasionally hallucinates ranges from
stray number words (see ``realpython-github-io`` goldens, ~5/66 rows);
those pathological outputs additionally embed the wall-clock date of the
reference's golden regeneration and are not reproducible by design.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime

MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jun": 6, "jul": 7,
    "aug": 8, "sep": 9, "sept": 9, "oct": 10, "nov": 11, "dec": 12,
}

_MONTH_ALT = "|".join(sorted(MONTHS, key=len, reverse=True))

# ISO date
_ISO_RE = re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b")
# "March 14, 1879" / "Feb 3, 2023"  (comma form)
_MDY_COMMA_RE = re.compile(
    rf"(?i)\b({_MONTH_ALT})\.?\s+(\d{{1,2}})(?:st|nd|rd|th)?\s*,\s*(\d{{4}})\b"
)
# "Jan 30 2023" (no comma)
_MDY_RE = re.compile(rf"(?i)\b({_MONTH_ALT})\.?\s+(\d{{1,2}})(?:st|nd|rd|th)?\s+(\d{{4}})\b")
# "14 March 1879" (day-first)
_DMY_RE = re.compile(rf"(?i)\b(\d{{1,2}})(?:st|nd|rd|th)?\.?\s+({_MONTH_ALT})\.?\s*,?\s*(\d{{4}})\b")
# "Feb 3" (month+day, no year)
_MD_RE = re.compile(rf"(?i)\b({_MONTH_ALT})\.?\s+(\d{{1,2}})(?:st|nd|rd|th)?\b")
# "3 Feb"
_DM_RE = re.compile(rf"(?i)\b(\d{{1,2}})(?:st|nd|rd|th)?\.?\s+({_MONTH_ALT})\b")
# "10.03.2023" dotted day-first (continental)
_DOTTED_DMY_RE = re.compile(r"\b(\d{1,2})\.(\d{1,2})\.(\d{4})\b")
# time "19:00" / "7:30pm"
_TIME_RE = re.compile(r"\b(\d{1,2}):(\d{2})(?::(\d{2}))?\s*(am|pm|AM|PM)?\b")

_YEAR_RE = re.compile(r"(?i)\b(20[0-9][0-9])\b")


@dataclass
class DateTimePoint:
    year: int = 0
    month: int = 0
    day: int = 0
    hour: int | None = None
    minute: int | None = None
    second: int | None = None
    utc: bool = False

    tz: str | None = None  # rendered zone suffix ("Z" / "+01:00")

    def render(self) -> str:
        s = f"{self.year:04d}-{self.month:02d}-{self.day:02d}"
        if self.hour is not None:
            s += f"T{self.hour:02d}:{self.minute or 0:02d}:{self.second or 0:02d}"
            if self.tz:
                s += self.tz
            elif self.utc:
                s += "Z"
        return s


@dataclass
class DateTimeRange:
    start: DateTimePoint
    end: DateTimePoint | None = None

    def render(self) -> str:
        if self.end is not None:
            return f"{self.start.render()} - {self.end.render()}"
        return self.start.render()


class DateTimeRanges:
    def __init__(self, items: list[DateTimeRange]):
        self.items = items

    def has_start_month_and_day(self) -> bool:
        for rng in self.items:
            if rng.start.month and rng.start.day:
                return True
        return False

    def __str__(self) -> str:
        return ", ".join(r.render() for r in self.items)


def _tz_suffix(y: int, mo: int, d: int, hh: int, mm: int, date_location: str) -> str:
    """RFC3339 zone suffix for the location at that local time (phil
    renders explicit-time points in the config's DateLocation zone)."""
    if not date_location:
        return "Z"
    try:
        from datetime import timedelta
        from zoneinfo import ZoneInfo

        off = datetime(y, mo, d, hh, mm, tzinfo=ZoneInfo(date_location)).utcoffset()
        if off is None:
            return "Z"
        total = int(off.total_seconds())
        sign = "+" if total >= 0 else "-"
        total = abs(total)
        return f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"
    except Exception:
        return "Z"


def _find_time(text: str):
    """First explicit clock time in the text → (hour, minute) or None."""
    m = _TIME_RE.search(text)
    if not m:
        return None
    hh, mm = int(m.group(1)), int(m.group(2))
    ampm = (m.group(4) or "").lower()
    if ampm == "pm" and hh < 12:
        hh += 12
    elif ampm == "am" and hh == 12:
        hh = 0
    if hh > 23 or mm > 59:
        return None
    return hh, mm


def _with_time(pt: DateTimePoint, text: str, date_location: str) -> DateTimePoint:
    t = _find_time(text)
    if t is not None:
        pt.hour, pt.minute, pt.second = t[0], t[1], 0
        pt.tz = _tz_suffix(pt.year, pt.month, pt.day, t[0], t[1], date_location)
    return pt


def _validate(y: int, m: int, d: int) -> bool:
    try:
        datetime(y if y else 2000, m, d)
        return True
    except ValueError:
        return False


def parse_ranges(text: str, base_year: int = 0, ref_time=None, date_location: str = "",
                 date_language: str = "") -> DateTimeRanges | None:
    """Parse the first date(-range) out of free text.

    Mirrors the phil call in extractField: returns None when nothing
    date-like is found. Only the fixture-exercised subset is implemented.
    """
    if not text:
        return None

    # priority 1: ISO date
    m = _ISO_RE.search(text)
    if m:
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if _validate(y, mo, d):
            return DateTimeRanges([DateTimeRange(DateTimePoint(y, mo, d))])

    # priority 2: Month D, YYYY (comma) — date-only rendering
    m = _MDY_COMMA_RE.search(text)
    if m:
        mo = MONTHS[m.group(1).lower()]
        d, y = int(m.group(2)), int(m.group(3))
        if _validate(y, mo, d):
            return DateTimeRanges([DateTimeRange(DateTimePoint(y, mo, d))])

    # priority 3: Mon D YYYY (no comma) — phil renders midnight UTC
    m = _MDY_RE.search(text)
    if m:
        mo = MONTHS[m.group(1).lower()]
        d, y = int(m.group(2)), int(m.group(3))
        if _validate(y, mo, d):
            pt = DateTimePoint(y, mo, d, hour=0, minute=0, second=0, utc=True)
            return DateTimeRanges([DateTimeRange(pt)])

    # priority 4: D Month YYYY
    m = _DMY_RE.search(text)
    if m:
        d, mo, y = int(m.group(1)), MONTHS[m.group(2).lower()], int(m.group(3))
        if _validate(y, mo, d):
            return DateTimeRanges([DateTimeRange(DateTimePoint(y, mo, d))])

    # priority 4b: dotted continental "10.03.2023" (day-first), with the
    # text's explicit clock time attached when present
    # (scrape_test.go:697-735 expects 2023-03-10T20:00 Europe/Berlin)
    m = _DOTTED_DMY_RE.search(text)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if mo <= 12 and _validate(y, mo, d):
            pt = _with_time(DateTimePoint(y, mo, d), text, date_location)
            return DateTimeRanges([DateTimeRange(pt)])

    # priority 5: month+day without year -> baseYear. When both orders
    # match (e.g. "10 March 20:00" also matches "March 20"), the
    # earliest-starting match wins — phil scans left to right
    # (scrape_test.go:737-775).
    m_md = _MD_RE.search(text)
    m_dm = _DM_RE.search(text)
    if m_md and m_dm and m_dm.start() < m_md.start():
        m_md, m_dm = None, m_dm
    if m_md:
        mo, d = MONTHS[m_md.group(1).lower()], int(m_md.group(2))
        y = base_year or (ref_time.year if ref_time else datetime.now().year)
        if _validate(y, mo, d):
            return DateTimeRanges([DateTimeRange(DateTimePoint(y, mo, d))])
    if m_dm:
        d, mo = int(m_dm.group(1)), MONTHS[m_dm.group(2).lower()]
        y = base_year or (ref_time.year if ref_time else datetime.now().year)
        if _validate(y, mo, d):
            pt = _with_time(DateTimePoint(y, mo, d), text, date_location)
            return DateTimeRanges([DateTimeRange(pt)])

    return None


def year_from_text(text: str, ref_time=None, date_location: str = "") -> int:
    """baseYear probe over a URL string (scrape.go:1717-1750): return the
    year of the first parseable datetime carrying an explicit year."""
    rngs = parse_ranges(text, base_year=0, ref_time=ref_time, date_location=date_location)
    if rngs is not None:
        for rng in rngs.items:
            if rng.start.year:
                return rng.start.year
            if rng.end is not None and rng.end.year:
                return rng.end.year
    m = _YEAR_RE.search(text)
    # phil accepts bare years inside URLs like /2023/05/ only when a date
    # parse succeeds; a lone year match is not sufficient
    return 0
