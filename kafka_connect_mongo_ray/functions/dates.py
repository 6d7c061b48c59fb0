"""Date formatting (T9) — analog of ``source/DateUtil.kt:9-19``:
epoch-ms ↔ ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` fixed-format UTC."""

from __future__ import annotations

from datetime import datetime, timezone

ISO_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def iso_from_epoch_ms(ms: int) -> str:
    dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    return dt.strftime(ISO_FMT)[:-3] + "Z"


def iso_from_epoch_s(s: int) -> str:
    return iso_from_epoch_ms(int(s) * 1000)


def epoch_ms_from_iso(text: str) -> int:
    dt = datetime.strptime(text, ISO_FMT + "Z").replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)
