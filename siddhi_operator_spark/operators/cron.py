"""Cron-schedule window support — Siddhi `cron('<expr>')`
(`[core] query/processor/stream/window/CronWindowProcessor.java`;
SURVEY.md §3.3).

The reference registers a Quartz cron trigger and flushes the window's
events at each fire. Batch/analytics mode reproduces that by
materializing the fire schedule over the data's event-time range and
assigning every event to the emission that flushes it (the first fire
strictly after the event, with fire-instant events rolling to the next
fire — Quartz fires flush *then* accept).

Only the schedule generator lives here; the DataFrame operator is
``windows.cron_window``. The generator supports the Quartz 6-field
subset `sec min hour dom mon dow` with `*`, `*/n`, `a`, `a-b`,
`a,b,c` and `?` (dom/dow no-value). Day-of-week uses Quartz numbering
(1 = Sunday … 7 = Saturday); when both dom and dow are restricted the
Quartz OR-semantics applies.
"""

from __future__ import annotations

from datetime import datetime, timedelta


def _parse_field(field: str, lo: int, hi: int) -> set[int] | None:
    """None = unrestricted (`*` or `?`)."""
    if field in ("*", "?"):
        return None
    vals: set[int] = set()
    for part in field.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*" or part == "":
            rng = range(lo, hi + 1, step)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1, step)
        else:
            rng = range(int(part), (hi + 1) if step > 1 else int(part) + 1, step)
        vals.update(rng)
    if not vals <= set(range(lo, hi + 1)):
        raise ValueError(f"cron field {field!r} out of range [{lo},{hi}]")
    return vals


def cron_fires(
    expr: str, start: datetime, end: datetime, max_fires: int = 200_000
) -> list[datetime]:
    """All fire instants in ``(start, end]`` for a Quartz-subset cron
    expression, ascending. Iterates days × matching h/m/s sets (never
    second-by-second), so sparse schedules over long ranges stay cheap."""
    parts = expr.split()
    if len(parts) != 6:
        raise ValueError(
            f"cron expression needs 6 fields 'sec min hour dom mon dow', got {expr!r}"
        )
    secs = _parse_field(parts[0], 0, 59)
    mins = _parse_field(parts[1], 0, 59)
    hours = _parse_field(parts[2], 0, 23)
    doms = _parse_field(parts[3], 1, 31)
    mons = _parse_field(parts[4], 1, 12)
    dows = _parse_field(parts[5], 1, 7)

    s_list = sorted(secs) if secs is not None else list(range(60))
    m_list = sorted(mins) if mins is not None else list(range(60))
    h_list = sorted(hours) if hours is not None else list(range(24))

    def day_matches(d: datetime) -> bool:
        if mons is not None and d.month not in mons:
            return False
        # Quartz: 1 = Sunday … 7 = Saturday; python weekday(): 0 = Monday
        q_dow = (d.weekday() + 1) % 7 + 1
        if doms is not None and dows is not None:  # Quartz OR-semantics
            return d.day in doms or q_dow in dows
        if doms is not None:
            return d.day in doms
        if dows is not None:
            return q_dow in dows
        return True

    fires: list[datetime] = []
    day = datetime(start.year, start.month, start.day)
    while day <= end:
        if day_matches(day):
            for h in h_list:
                for m in m_list:
                    for s in s_list:
                        t = day + timedelta(hours=h, minutes=m, seconds=s)
                        if start < t <= end:
                            fires.append(t)
                            if len(fires) > max_fires:
                                raise ValueError(
                                    f"cron {expr!r} fires > {max_fires} times "
                                    "in range; widen the schedule"
                                )
        day += timedelta(days=1)
    return fires


def next_fire_after(expr: str, t: datetime, horizon_days: int = 400) -> datetime:
    """First fire strictly after ``t`` (bounded search)."""
    fires = cron_fires(expr, t, t + timedelta(days=horizon_days), max_fires=500_000)
    if not fires:
        raise ValueError(f"cron {expr!r} never fires within {horizon_days} days of {t}")
    return fires[0]
