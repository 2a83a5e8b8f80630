"""Identity-hash key generators (md5 over concatenated natural-key parts).

Parity targets (reference): airline functions.py:70-73, flight
functions.py:195-198, passenger functions.py:253-256, booking
functions.py:320-323.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "|"


def _hash_parts(*parts: Column | str) -> Column:
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    padded: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            padded.append(F.lit(_SEP))
        padded.append(F.coalesce(c.cast("string"), F.lit("")))
    return F.md5(F.concat(*padded))


def airline_hash(key: Column | str, name: Column | str) -> Column:
    return _hash_parts(key, name)


def flight_hash(key: Column | str, origin: Column | str, dest: Column | str) -> Column:
    return _hash_parts(key, origin, dest)


def passenger_hash(key: Column | str, email: Column | str) -> Column:
    return _hash_parts(key, email)


def booking_hash(ref: Column | str, passenger: Column | str, flight: Column | str) -> Column:
    return _hash_parts(ref, passenger, flight)
