"""Cron schedule generator (`CronWindowProcessor.java` analog)."""

from __future__ import annotations

from datetime import datetime

import pytest

from siddhi_operator_spark.operators.cron import cron_fires, next_fire_after


def test_every_4h_at_30():
    fires = cron_fires(
        "0 30 */4 * * ?",
        datetime(2024, 1, 1),
        datetime(2024, 1, 2),
    )
    assert fires[:3] == [
        datetime(2024, 1, 1, 0, 30),
        datetime(2024, 1, 1, 4, 30),
        datetime(2024, 1, 1, 8, 30),
    ]
    assert len(fires) == 6  # six on Jan 1; Jan 2 00:30 is past the end


def test_range_is_exclusive_start_inclusive_end():
    fires = cron_fires(
        "0 0 * * * ?",
        datetime(2024, 1, 1, 5, 0),
        datetime(2024, 1, 1, 7, 0),
    )
    # 05:00 itself excluded (start is exclusive), 07:00 included
    assert fires == [datetime(2024, 1, 1, 6, 0), datetime(2024, 1, 1, 7, 0)]


def test_dow_quartz_numbering():
    # 2024-01-01 is a Monday → Quartz dow 2
    fires = cron_fires(
        "0 0 12 ? * 2", datetime(2024, 1, 1), datetime(2024, 1, 14)
    )
    assert fires == [
        datetime(2024, 1, 1, 12, 0),
        datetime(2024, 1, 8, 12, 0),
    ]


def test_lists_and_ranges():
    fires = cron_fires(
        "0 15,45 9-10 * * ?", datetime(2024, 3, 5), datetime(2024, 3, 5, 23)
    )
    assert fires == [
        datetime(2024, 3, 5, 9, 15),
        datetime(2024, 3, 5, 9, 45),
        datetime(2024, 3, 5, 10, 15),
        datetime(2024, 3, 5, 10, 45),
    ]


def test_next_fire_after():
    assert next_fire_after("0 30 */4 * * ?", datetime(2024, 1, 1, 4, 30)) == (
        datetime(2024, 1, 1, 8, 30)
    )


def test_bad_field_rejected():
    with pytest.raises(ValueError):
        cron_fires("0 99 * * * ?", datetime(2024, 1, 1), datetime(2024, 1, 2))
    with pytest.raises(ValueError):
        cron_fires("0 0 *", datetime(2024, 1, 1), datetime(2024, 1, 2))
