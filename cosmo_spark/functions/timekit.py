"""MJD time kernel (SURVEY.md §4 custom item 4).

The reference converts Modified Julian Date floats to datetimes with astropy
(``Time(x, format='mjd').to_datetime()``, ref: cosmo/monitor_helpers.py:52-76)
and parses day-of-year strings ``yyyy.ddd`` (ref: cosmo/monitor_helpers.py:15-25)
and ``yyyy.ddd:hh:mm:ss`` SMS stamps (ref: cosmo/sms/ingest_sms.py:28).

Spark-native equivalents, all pure Column expressions:
MJD epoch 0 is 1858-11-17; Unix epoch 0 is MJD 40587.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MJD_UNIX_EPOCH = 40587.0
SECONDS_PER_DAY = 86400.0


def mjd_to_ts(mjd: Column | str) -> Column:
    """MJD double -> TimestampType (UTC).

    ref: cosmo/monitor_helpers.py:73 (``Time(expstart, format='mjd')``).
    """
    mjd = F.col(mjd) if isinstance(mjd, str) else mjd
    return F.timestamp_seconds((mjd - F.lit(MJD_UNIX_EPOCH)) * F.lit(SECONDS_PER_DAY))


def ts_to_mjd(ts: Column | str) -> Column:
    """TimestampType -> MJD double (microsecond-precise)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(ts) / F.lit(SECONDS_PER_DAY * 1e6) + F.lit(MJD_UNIX_EPOCH)


def absolute_time(expstart_mjd: Column | str, offset_seconds: Column | str) -> Column:
    """Exposure-relative seconds -> absolute timestamp.

    ref: cosmo/monitor_helpers.py:52-76 (``absolute_time``: EXPSTART MJD plus a
    per-flash/per-event seconds offset).
    """
    expstart_mjd = F.col(expstart_mjd) if isinstance(expstart_mjd, str) else expstart_mjd
    offset_seconds = F.col(offset_seconds) if isinstance(offset_seconds, str) else offset_seconds
    return F.timestamp_seconds(
        (expstart_mjd - F.lit(MJD_UNIX_EPOCH)) * F.lit(SECONDS_PER_DAY) + offset_seconds
    )


def doy_str_to_ts(s: Column | str) -> Column:
    """Parse ``yyyy.ddd`` day-of-year strings (ref: cosmo/monitor_helpers.py:15-25).

    Also accepts the SMS long form ``yyyy.ddd:hh:mm:ss``
    (ref: cosmo/sms/ingest_sms.py:28) — time-of-day defaults to midnight
    when absent.
    """
    s = F.col(s) if isinstance(s, str) else s
    padded = F.when(F.length(s) == 8, F.concat(s, F.lit(":00:00:00"))).otherwise(s)
    return F.to_timestamp(padded, "yyyy.DDD:HH:mm:ss")


def ts_to_doy_str(ts: Column | str) -> Column:
    """Timestamp -> ``yyyy.ddd`` string (zero-padded day-of-year)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(ts, "yyyy.DDD")


def decimal_year(ts: Column | str) -> Column:
    """Decimal (Besselian-style) year, e.g. 2024.5 ≈ start of July.

    ref: cosmo/monitors/acq_monitors.py:241-242 (``Time(...).byear`` used for
    plotting axes). Here: year + (day_of_year - 1 + fraction_of_day) / days_in_year.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    year = F.year(ts)
    doy = F.dayofyear(ts) - F.lit(1)
    frac_day = (
        F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)
    ) / F.lit(SECONDS_PER_DAY)
    leap = (year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0))
    days_in_year = F.when(leap, F.lit(366.0)).otherwise(F.lit(365.0))
    return year + (doy + frac_day) / days_in_year
