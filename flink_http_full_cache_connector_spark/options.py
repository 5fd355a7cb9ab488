"""Connector option parsing & validation.

Mirrors the reference factory's option surface and error behavior
(``HttpLookupTableSourceFactory.scala:27-123``): required ``url``; optional
``xpath`` (RFC-6901 JSON pointer), ``method`` (parsed/validated but the
runtime always issues GET — dead option replicated for parity,
``HttpInputFormatProvider.scala:89-94``), ``cache.refresh-interval``
(ISO-8601 duration string, default PT5M), ``connect.timeout.seconds`` (10),
``read.timeout.seconds`` (30), ``max.retries`` (3), ``retry.delay.ms``
(1000).  Validation failures raise :class:`ValidationException` with the
reference's message text so plan-time errors are recognizable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ValidationException(ValueError):
    """Plan-time option validation error (≙ Flink's ValidationException)."""


FACTORY_IDENTIFIER = "http-lookup-full-cache"

#: option key → default (None ⇒ no default; ``url`` is the only required key)
OPTION_DEFAULTS: dict[str, object] = {
    "url": None,
    "xpath": "",
    "method": "GET",
    "cache.refresh-interval": "PT5M",
    "connect.timeout.seconds": 10,
    "read.timeout.seconds": 30,
    "max.retries": 3,
    "retry.delay.ms": 1000,
}

_REQUIRED_OPTIONS = ("url",)

# ISO-8601 duration, the subset java.time.Duration.parse accepts:
# PnDTnHnMn.nS (at least one component; case-insensitive; optional sign).
_ISO8601_DURATION = re.compile(
    r"^[+-]?P(?=.)((?P<days>\d+)D)?"
    r"(T(?=.)((?P<hours>\d+)H)?((?P<minutes>\d+)M)?"
    r"((?P<seconds>\d+)(\.(?P<fraction>\d{1,9}))?S)?)?$",
    re.IGNORECASE,
)


def parse_iso8601_duration_seconds(text: str) -> float:
    """Parse a java.time.Duration-style ISO-8601 duration into seconds.

    Raises ``ValueError`` on malformed input (caller wraps it with the
    reference's message text).
    """
    m = _ISO8601_DURATION.match(text.strip())
    if m is None:
        raise ValueError(f"not an ISO-8601 duration: {text!r}")
    days = int(m.group("days") or 0)
    hours = int(m.group("hours") or 0)
    minutes = int(m.group("minutes") or 0)
    seconds = int(m.group("seconds") or 0)
    fraction = m.group("fraction") or ""
    frac = int(fraction) / (10 ** len(fraction)) if fraction else 0.0
    total = days * 86400 + hours * 3600 + minutes * 60 + seconds + frac
    if text.strip().startswith("-"):
        total = -total
    return total


@dataclass(frozen=True)
class HttpLookupOptions:
    """Validated options for the http-lookup-full-cache source."""

    url: str
    xpath: str = ""
    method: str = "GET"
    cache_refresh_interval: str = "PT5M"
    connect_timeout_seconds: int = 10
    read_timeout_seconds: int = 30
    max_retries: int = 3
    retry_delay_ms: int = 1000
    #: parsed refresh interval, seconds (derived)
    refresh_interval_seconds: float = field(default=300.0, compare=False)

    def as_dict(self) -> dict[str, str]:
        return {
            "url": self.url,
            "xpath": self.xpath,
            "method": self.method,
            "cache.refresh-interval": self.cache_refresh_interval,
            "connect.timeout.seconds": str(self.connect_timeout_seconds),
            "read.timeout.seconds": str(self.read_timeout_seconds),
            "max.retries": str(self.max_retries),
            "retry.delay.ms": str(self.retry_delay_ms),
        }


def _as_int(key: str, value: object) -> int:
    try:
        return int(str(value))
    except (TypeError, ValueError):
        raise ValidationException(
            f"Invalid value for {key}: {value}. Must be an integer."
        ) from None


def validate_options(options: dict[str, object]) -> HttpLookupOptions:
    """Validate a DDL-style ``WITH(...)`` options dict.

    Reference parity (``HttpLookupTableSourceFactory.scala:58-123``):
    unknown options rejected (FactoryUtil.validate), missing ``url``
    rejected, ISO-8601 refresh-interval format-checked, timeouts/retry-delay
    must be positive, max.retries non-negative.
    """
    unknown = set(options) - set(OPTION_DEFAULTS) - {"connector", "format"}
    if unknown:
        raise ValidationException(
            "Unsupported options found for '"
            + FACTORY_IDENTIFIER
            + "'.\n\nUnsupported options:\n\n"
            + "\n".join(sorted(str(k) for k in unknown))
        )

    for key in _REQUIRED_OPTIONS:
        if key not in options or options[key] in (None, ""):
            raise ValidationException(
                "One or more required options are missing.\n\n"
                "Missing required options are:\n\n" + key
            )

    url = str(options["url"])
    xpath = str(options.get("xpath", OPTION_DEFAULTS["xpath"]) or "")
    method = str(options.get("method", OPTION_DEFAULTS["method"]))

    refresh_str = str(
        options.get("cache.refresh-interval", OPTION_DEFAULTS["cache.refresh-interval"])
    )
    try:
        refresh_seconds = parse_iso8601_duration_seconds(refresh_str)
    except ValueError:
        raise ValidationException(
            f"Invalid format for cache.refresh-interval: '{refresh_str}'. "
            "Expected format is ISO-8601 duration (e.g., PT5M for 5 minutes)."
        ) from None

    connect_timeout = _as_int(
        "connect.timeout.seconds",
        options.get("connect.timeout.seconds", OPTION_DEFAULTS["connect.timeout.seconds"]),
    )
    if connect_timeout <= 0:
        raise ValidationException(
            f"Invalid value for connect.timeout.seconds: {connect_timeout}. Must be positive."
        )

    read_timeout = _as_int(
        "read.timeout.seconds",
        options.get("read.timeout.seconds", OPTION_DEFAULTS["read.timeout.seconds"]),
    )
    if read_timeout <= 0:
        raise ValidationException(
            f"Invalid value for read.timeout.seconds: {read_timeout}. Must be positive."
        )

    max_retries = _as_int(
        "max.retries", options.get("max.retries", OPTION_DEFAULTS["max.retries"])
    )
    if max_retries < 0:
        raise ValidationException(
            f"Invalid value for max.retries: {max_retries}. Must be non-negative."
        )

    retry_delay = _as_int(
        "retry.delay.ms", options.get("retry.delay.ms", OPTION_DEFAULTS["retry.delay.ms"])
    )
    if retry_delay <= 0:
        raise ValidationException(
            f"Invalid value for retry.delay.ms: {retry_delay}. Must be positive."
        )

    return HttpLookupOptions(
        url=url,
        xpath=xpath,
        method=method,
        cache_refresh_interval=refresh_str,
        connect_timeout_seconds=connect_timeout,
        read_timeout_seconds=read_timeout,
        max_retries=max_retries,
        retry_delay_ms=retry_delay,
        refresh_interval_seconds=refresh_seconds,
    )
