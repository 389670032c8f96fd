"""Stock regex constraints — parity with ``src/Data/Schematic/Helpers.hs:7-59``.

All patterns are in the shared POSIX-ERE ∩ Java ∩ Python subset (character
classes, bounded repeats, alternation), so they run JVM-side via ``rlike``.
"""

from __future__ import annotations

from .ast import TRegex

UUID_REGEX = (
    "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
)

ISO8601_DATE = "[1-9][0-9]{3}-(0[1-9]|1[0-2])-([0-2][0-9]|3[0-1])"
ISO8601_TIME = "([0-1][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]"
ISO8601_DATETIME = ISO8601_DATE + "(T" + ISO8601_TIME + ")?"
ISO8601_UTC = "(Z|\\+00:00)"
ISO8601_DATETIME_UTC = ISO8601_DATE + "T" + ISO8601_TIME + ISO8601_UTC
ISO8601_TZ = "\\+[0-1][0-9]:[0-6][0-9]"
ISO8601_DATETIME_ZONED = ISO8601_DATE + "T" + ISO8601_TIME + ISO8601_TZ

IS_UUID = (TRegex(UUID_REGEX),)
IS_DATE = (TRegex(ISO8601_DATE),)
IS_TIME = (TRegex(ISO8601_TIME),)
IS_DATETIME = (TRegex(ISO8601_DATETIME),)
IS_UTC_DATETIME = (TRegex(ISO8601_DATETIME_UTC),)
IS_ZONED_DATETIME = (TRegex(ISO8601_DATETIME_ZONED),)
