"""Holiday calendar machinery.

Reference: Models/StateSpace/StateModels/Holiday.hpp — Holiday /
SingleDayHoliday / OrdinaryAnnualHoliday with FixedDateHoliday,
NthWeekdayInMonthHoliday, LastWeekdayInMonthHoliday, FloatingHoliday
(EasterSunday, USDaylightSavingsTime*), DateRangeHoliday, and the
CreateHoliday name registry (Holiday.cpp:346-385) — plus the date
arithmetic of cpputil/Date.hpp.

TPU-native design: holidays are host-side Python objects over
``datetime.date``; their only job is to emit static integer index arrays
(``which_day[t]`` = day-into-window or -1) that parameterize jitted
state models (RandomWalkHoliday / RegressionHoliday /
HierarchicalRegressionHoliday). No date logic is ever traced.

A holiday's influence window runs from ``days_before`` days before the
holiday date through ``days_after`` days after (inclusive), so the
window width is ``days_before + days_after + 1``.
"""

from __future__ import annotations

import dataclasses
import datetime

import numpy as np

_ONE_DAY = datetime.timedelta(days=1)


class Holiday:
    """Base class. Subclasses implement ``date_in_year(year) -> date``
    (single-day annual holidays) or override ``active_day(date)``."""

    days_before: int = 1
    days_after: int = 1

    def maximum_window_width(self) -> int:
        return self.days_before + self.days_after + 1

    def date_in_year(self, year: int) -> datetime.date:
        raise NotImplementedError

    def active_day(self, date: datetime.date) -> int:
        """Days into the influence window (0-based), or -1 if inactive
        (reference Holiday::days_into_influence_window)."""
        for year in (date.year - 1, date.year, date.year + 1):
            try:
                d = self.date_in_year(year)
            except ValueError:
                continue
            start = d - datetime.timedelta(days=self.days_before)
            end = d + datetime.timedelta(days=self.days_after)
            if start <= date <= end:
                return (date - start).days
        return -1

    def active(self, date: datetime.date) -> bool:
        return self.active_day(date) >= 0

    # SingleDayHoliday navigation (Holiday.hpp:93-100)
    def date_on_or_after(self, date: datetime.date) -> datetime.date:
        d = self.date_in_year(date.year)
        return d if d >= date else self.date_in_year(date.year + 1)

    def date_on_or_before(self, date: datetime.date) -> datetime.date:
        d = self.date_in_year(date.year)
        return d if d <= date else self.date_in_year(date.year - 1)

    def nearest(self, date: datetime.date) -> datetime.date:
        after = self.date_on_or_after(date)
        before = self.date_on_or_before(date)
        return after if (after - date) <= (date - before) else before


@dataclasses.dataclass
class FixedDateHoliday(Holiday):
    """Same calendar date each year (reference FixedDateHoliday)."""

    month: int
    day: int
    days_before: int = 1
    days_after: int = 1

    def date_in_year(self, year):
        return datetime.date(year, self.month, self.day)


def nth_weekday_of_month(n: int, weekday: int, month: int,
                         year: int) -> datetime.date:
    """n-th (1-based) `weekday` (Mon=0..Sun=6) of `month` in `year`."""
    first = datetime.date(year, month, 1)
    offset = (weekday - first.weekday()) % 7
    return first + datetime.timedelta(days=offset + 7 * (n - 1))


def last_weekday_of_month(weekday: int, month: int,
                          year: int) -> datetime.date:
    nxt = (datetime.date(year + 1, 1, 1) if month == 12
           else datetime.date(year, month + 1, 1))
    last = nxt - _ONE_DAY
    return last - datetime.timedelta(days=(last.weekday() - weekday) % 7)


@dataclasses.dataclass
class NthWeekdayInMonthHoliday(Holiday):
    """E.g. Thanksgiving = 4th Thursday of November (reference
    NthWeekdayInMonthHoliday). weekday: Mon=0 .. Sun=6."""

    week: int
    weekday: int
    month: int
    days_before: int = 1
    days_after: int = 1

    def date_in_year(self, year):
        return nth_weekday_of_month(self.week, self.weekday, self.month,
                                    year)


@dataclasses.dataclass
class LastWeekdayInMonthHoliday(Holiday):
    """E.g. Memorial Day = last Monday of May (reference
    LastWeekdayInMonthHoliday)."""

    weekday: int
    month: int
    days_before: int = 1
    days_after: int = 1

    def date_in_year(self, year):
        return last_weekday_of_month(self.weekday, self.month, year)


@dataclasses.dataclass
class EasterSunday(Holiday):
    """Gregorian Easter via the anonymous computus (reference
    EasterSunday, Holiday.cpp:315 supports 1900-2600)."""

    days_before: int = 1
    days_after: int = 1

    def date_in_year(self, year):
        a = year % 19
        b, c = divmod(year, 100)
        d, e = divmod(b, 4)
        f = (b + 8) // 25
        g = (b - f + 1) // 3
        h = (19 * a + b - d - g + 15) % 30
        i, k = divmod(c, 4)
        m = (32 + 2 * e + 2 * i - h - k) % 7
        n = (a + 11 * h + 22 * m) // 451
        month, day = divmod(h + m - 7 * n + 114, 31)
        return datetime.date(year, month, day + 1)


@dataclasses.dataclass
class USDaylightSavingsTimeBegins(Holiday):
    """2nd Sunday of March from 2007; first Sunday of April 1987-2006
    (reference USDaylightSavingsTimeBegins, supported from 1967)."""

    days_before: int = 1
    days_after: int = 1

    def date_in_year(self, year):
        if year >= 2007:
            return nth_weekday_of_month(2, 6, 3, year)
        if year >= 1987:
            return nth_weekday_of_month(1, 6, 4, year)
        return last_weekday_of_month(6, 4, year)


@dataclasses.dataclass
class USDaylightSavingsTimeEnds(Holiday):
    """First Sunday of November from 2007; last Sunday of October
    before."""

    days_before: int = 1
    days_after: int = 1

    def date_in_year(self, year):
        if year >= 2007:
            return nth_weekday_of_month(1, 6, 11, year)
        return last_weekday_of_month(6, 10, year)


class DateRangeHoliday(Holiday):
    """Arbitrary explicit influence ranges, e.g. Super Bowl weekends per
    year (reference DateRangeHoliday, Holiday.hpp:210-246)."""

    def __init__(self, begin, end):
        begin = list(begin)
        end = list(end)
        assert len(begin) == len(end)
        for b, e in zip(begin, end):
            assert e >= b, (b, e)
        self._begin = begin
        self._end = end
        self._width = (max(((e - b).days + 1 for b, e in zip(begin, end)),
                           default=0))

    def add_dates(self, begin: datetime.date, end: datetime.date):
        assert end >= begin
        self._begin.append(begin)
        self._end.append(end)
        self._width = max(self._width, (end - begin).days + 1)

    def maximum_window_width(self):
        return self._width

    def active_day(self, date):
        for b, e in zip(self._begin, self._end):
            if b <= date <= e:
                return (date - b).days
        return -1

    def date_in_year(self, year):
        for b in self._begin:
            if b.year == year:
                return b
        raise ValueError(f"no occurrence in {year}")


_NAMED = {
    "NewYearsDay": lambda b, a: FixedDateHoliday(1, 1, b, a),
    "MartinLutherKingDay": lambda b, a: NthWeekdayInMonthHoliday(
        3, 0, 1, b, a),
    "SuperBowlSunday": lambda b, a: NthWeekdayInMonthHoliday(1, 6, 2, b, a),
    "PresidentsDay": lambda b, a: NthWeekdayInMonthHoliday(3, 0, 2, b, a),
    "ValentinesDay": lambda b, a: FixedDateHoliday(2, 14, b, a),
    "SaintPatricksDay": lambda b, a: FixedDateHoliday(3, 17, b, a),
    "USDaylightSavingsTimeBegins":
        lambda b, a: USDaylightSavingsTimeBegins(b, a),
    "USDaylightSavingsTimeEnds":
        lambda b, a: USDaylightSavingsTimeEnds(b, a),
    "EasterSunday": lambda b, a: EasterSunday(b, a),
    "USMothersDay": lambda b, a: NthWeekdayInMonthHoliday(2, 6, 5, b, a),
    "IndependenceDay": lambda b, a: FixedDateHoliday(7, 4, b, a),
    "LaborDay": lambda b, a: NthWeekdayInMonthHoliday(1, 0, 9, b, a),
    "ColumbusDay": lambda b, a: NthWeekdayInMonthHoliday(2, 0, 10, b, a),
    "Halloween": lambda b, a: FixedDateHoliday(10, 31, b, a),
    "Thanksgiving": lambda b, a: NthWeekdayInMonthHoliday(4, 3, 11, b, a),
    "MemorialDay": lambda b, a: LastWeekdayInMonthHoliday(0, 5, b, a),
    "VeteransDay": lambda b, a: FixedDateHoliday(11, 11, b, a),
    "Christmas": lambda b, a: FixedDateHoliday(12, 25, b, a),
}


def named_holidays():
    """Names accepted by create_named_holiday (reference
    Holiday.cpp:346-385 CreateHoliday registry)."""
    return sorted(_NAMED)


def create_named_holiday(name: str, days_before: int = 1,
                         days_after: int = 1) -> Holiday:
    if name not in _NAMED:
        raise ValueError(
            f"unknown holiday {name!r}; known: {named_holidays()}")
    return _NAMED[name](days_before, days_after)


def _as_date(d) -> datetime.date:
    if isinstance(d, datetime.datetime):
        return d.date()
    if isinstance(d, datetime.date):
        return d
    return datetime.date.fromisoformat(str(d))


def holiday_day_indices(holiday: Holiday, first_date, t_len: int,
                        step_days: int = 1) -> np.ndarray:
    """[T] int array: day-into-window at each (daily) timestep, -1 when
    inactive — the `active` input of statespace.RandomWalkHoliday
    (reference RegressionHolidayBaseImpl::observe_time_dimension builds
    the same which_day_ mapping)."""
    d0 = _as_date(first_date)
    out = np.empty((t_len,), np.int32)
    for t in range(t_len):
        out[t] = holiday.active_day(
            d0 + datetime.timedelta(days=t * step_days))
    return out


def holiday_window_arrays(holidays, first_date, t_len: int,
                          step_days: int = 1):
    """(which_holiday [T], which_day [T], max_width) for a LIST of
    holidays — the multi-holiday mapping of RegressionHolidayBaseImpl
    (RegressionHolidayStateModel.hpp which_holiday_/which_day_). Both
    arrays are -1 where no holiday is active; overlapping windows
    resolve to the first active holiday in list order."""
    d0 = _as_date(first_date)
    which_h = np.full((t_len,), -1, np.int32)
    which_d = np.full((t_len,), -1, np.int32)
    for t in range(t_len):
        date = d0 + datetime.timedelta(days=t * step_days)
        for hi, h in enumerate(holidays):
            day = h.active_day(date)
            if day >= 0:
                which_h[t] = hi
                which_d[t] = day
                break
    width = max((h.maximum_window_width() for h in holidays), default=0)
    return which_h, which_d, width
