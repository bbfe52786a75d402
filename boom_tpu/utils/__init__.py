"""Host-side utilities: dates/holidays, progress tracking.

Reference: cpputil/Date.hpp (date arithmetic) and
Models/StateSpace/StateModels/Holiday.hpp (holiday calendar machinery).
Calendar logic is inherently host-side preprocessing — it produces static
index arrays consumed by jitted state-space programs — so the TPU-native
form is plain Python over ``datetime.date`` emitting numpy arrays.
"""

from boom_tpu.utils.dates import (
    DateRangeHoliday,
    EasterSunday,
    FixedDateHoliday,
    Holiday,
    LastWeekdayInMonthHoliday,
    NthWeekdayInMonthHoliday,
    USDaylightSavingsTimeBegins,
    USDaylightSavingsTimeEnds,
    create_named_holiday,
    holiday_day_indices,
    holiday_window_arrays,
    named_holidays,
)
from boom_tpu.utils.progress import ProgressTracker

__all__ = [
    "Holiday", "FixedDateHoliday", "NthWeekdayInMonthHoliday",
    "LastWeekdayInMonthHoliday", "EasterSunday", "DateRangeHoliday",
    "USDaylightSavingsTimeBegins", "USDaylightSavingsTimeEnds",
    "create_named_holiday", "named_holidays", "holiday_day_indices",
    "holiday_window_arrays", "ProgressTracker",
]

from boom_tpu.utils.timestamps import (
    TimestampInfo,
    collapse_to_grid,
    is_regular,
    regularize_timestamps,
)
