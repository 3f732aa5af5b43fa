from .timefn import (
    micros_of_day,
    tod_between,
    session_kind,
    date_market_type,
    session_id,
    third_wednesday,
)

__all__ = [
    "micros_of_day",
    "tod_between",
    "session_kind",
    "date_market_type",
    "session_id",
    "third_wednesday",
]
