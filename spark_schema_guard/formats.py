"""Named-format regex bank, per JSON-Schema draft dialect.

Behavioral parity with the reference's format tables
(``fastjsonschema/draft04.py:28-35``, ``draft06.py:8-17``, ``draft07.py:5-19``,
``draft2019.py:5-15``): the *accepted language* of every format here matches
the reference (pinned by tests, e.g. ipv4 rejecting leading zeros —
``tests/test_format.py:62-65``).  Patterns are evaluated with Python ``re``
``.match`` semantics on the executors (inside Arrow-batched pandas UDFs) or,
when the JVM fast path is selected, translated for Java regex (``\\Z`` → ``\\z``).

The bank is built programmatically per dialect so later dialects extend
earlier ones, mirroring the reference's class-level dict inheritance.
"""

from __future__ import annotations

import re

# -- building blocks -----------------------------------------------------

# one decimal octet 0-255, no leading zeros (CVE-2021-28918 parity)
_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4_BODY = r"({o}\.){{3}}{o}".format(o=_OCTET)

_H16 = r"[0-9A-Fa-f]{1,4}"


def _ipv6_pattern() -> str:
    """RFC-4291 textual forms incl. ``::`` elision and embedded IPv4 tail.

    Built as an alternation over the position of the ``::`` gap — the same
    language the reference's single hand-written literal accepts."""
    octet = r"(?:[0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])"
    v4 = r"(?:(?:{o}\.){{3}}{o})".format(o=octet)
    tail = r"(?:{h}:{h}|{v4})".format(h=_H16, v4=v4)
    parts = [
        r"(?:{h}:){{6}}{t}".format(h=_H16, t=tail),
        r"::(?:{h}:){{5}}{t}".format(h=_H16, t=tail),
        r"(?:{h})?::(?:{h}:){{4}}{t}".format(h=_H16, t=tail),
        r"(?:{h}:{h})?::(?:{h}:){{3}}{t}".format(h=_H16, t=tail),
        r"(?:(?:{h}:){{0,2}}{h})?::(?:{h}:){{2}}{t}".format(h=_H16, t=tail),
        r"(?:(?:{h}:){{0,3}}{h})?::{h}:{t}".format(h=_H16, t=tail),
        r"(?:(?:{h}:){{0,4}}{h})?::{t}".format(h=_H16, t=tail),
        r"(?:(?:{h}:){{0,5}}{h})?::{h}".format(h=_H16),
        r"(?:(?:{h}:){{0,6}}{h})?::".format(h=_H16),
    ]
    return r"^(?:" + r"|".join(parts) + r")\Z"


_LABEL = r"[a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]"

FORMATS_DRAFT04 = {
    "date-time": (
        r"^\d{4}-[01]\d-[0-3]\d(t|T)[0-2]\d:[0-5]\d:[0-5]\d(?:\.\d+)?"
        r"(?:[+-][0-2]\d:[0-5]\d|[+-][0-2]\d[0-5]\d|z|Z)\Z"
    ),
    "email": r"^(?!.*\.\..*@)[^@.][^@]*(?<!\.)@[^@]+\.[^@]+\Z",
    "hostname": r"^(({l})\.)*({L})\Z".format(
        l=_LABEL, L=r"[A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\-]{0,61}[A-Za-z0-9]"
    ),
    "ipv4": r"^" + _IPV4_BODY + r"\Z",
    "ipv6": _ipv6_pattern(),
    "uri": r"^\w+:(\/?\/?)[^\s]+\Z",
}

FORMATS_DRAFT06 = dict(
    FORMATS_DRAFT04,
    **{
        "json-pointer": r"^(/(([^/~])|(~[01]))*)*\Z",
        "uri-reference": r"^(\w+:(\/?\/?))?[^#\\\s]*(#[^\\\s]*)?\Z",
        "uri-template": (
            r"^(?:(?:[^\x00-\x20\"'<>%\\^`{|}]|%[0-9a-f]{2})|"
            r"\{[+#./;?&=,!@|]?(?:[a-z0-9_]|%[0-9a-f]{2})+"
            r"(?::[1-9][0-9]{0,3}|\*)?(?:,(?:[a-z0-9_]|%[0-9a-f]{2})+"
            r"(?::[1-9][0-9]{0,3}|\*)?)*\})*\Z"
        ),
    },
)

FORMATS_DRAFT07 = dict(
    FORMATS_DRAFT06,
    **{
        "date": r"^(?P<year>\d{4})-(?P<month>(0[1-9]|1[0-2]))-(?P<day>(0[1-9]|[12]\d|3[01]))\Z",
        "iri": r"^\w+:(\/?\/?)[^\s]+\Z",
        "iri-reference": r"^(\w+:(\/?\/?))?[^#\\\s]*(#[^\\\s]*)?\Z",
        "idn-email": r"^[^@]+@[^@]+\.[^@]+\Z",
        "idn-hostname": (
            r"^(?!-)(xn--)?[a-zA-Z0-9][a-zA-Z0-9-_]{0,61}[a-zA-Z0-9]{0,1}\."
            r"(?!-)(xn--)?([a-zA-Z0-9\-]{1,50}|[a-zA-Z0-9-]{1,30}\.[a-zA-Z]{2,})$"
        ),
        "relative-json-pointer": r"^(?:0|[1-9][0-9]*)(?:#|(?:\/(?:[^~/]|~0|~1)*)*)\Z",
        "time": (
            r"^(?P<hour>\d{1,2}):(?P<minute>\d{1,2})"
            r"(?::(?P<second>\d{1,2})(?:\.(?P<microsecond>\d{1,6}))?"
            r"([zZ]|[+-]\d\d:\d\d)?)?\Z"
        ),
    },
)

FORMATS_DRAFT2019 = dict(
    FORMATS_DRAFT07,
    **{
        "uuid": r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}\Z",
        "duration": (
            r"^P(?!$)"
            r"(?:"
            r"[0-9]+W"
            r"|(?:[0-9]+Y)?(?:[0-9]+M)?(?:[0-9]+D)?(?:T(?=[0-9])(?:[0-9]+H)?(?:[0-9]+M)?(?:[0-9]+S)?)?"
            r")\Z"
        ),
    },
)


def compile_bank(table: dict) -> dict:
    """Pre-compile a format table once on the driver.  The compiled bank is
    captured in pandas-UDF closures and shipped to executors exactly once per
    task (the Spark analog of the reference hoisting ``REGEX_PATTERNS`` into
    module globals, ``generator.py:92``)."""
    return {name: re.compile(pattern) for name, pattern in table.items()}


def jvm_pattern(pattern: str) -> str:
    """Translate a Python-``re`` anchored pattern for Java regex (``rlike``):
    Python ``\\Z`` (absolute end) is ``\\z`` in Java, named groups spell
    ``(?P<name>`` / ``(?P=name)`` in Python but ``(?<name>`` / ``\\k<name>``
    in Java (the draft-07 date/time format regexes use them), and Python's
    open-lower-bound quantifier ``{,n}`` must be written ``{0,n}``."""
    out = pattern.replace(r"\Z", r"\z")
    out = re.sub(r"\(\?P<([A-Za-z][A-Za-z0-9]*)>", r"(?<\1>", out)
    out = re.sub(r"\(\?P=([A-Za-z][A-Za-z0-9]*)\)", r"\\k<\1>", out)
    out = re.sub(r"(?<!\\)\{,(\d+)\}", r"{0,\1}", out)
    return out
