"""C-printf-compatible float formatting.

The reference writes outputs via hprintf with C format strings
(reference: cmd_cram_demuxlet.cpp:506,760,774,830-874). Byte parity requires
identical decimal rendering. Both glibc printf and CPython's %-formatting
perform correctly-rounded binary->decimal conversion, so Python's operators
match glibc for %f/%g/%e of finite doubles, and for inf/nan ("inf"/"-inf"/
"nan"). tests/test_cformat.py verifies this against a compiled C program over
adversarial values.
"""

from __future__ import annotations


def f(x: float, prec: int) -> str:
    """C `%.<prec>lf`."""
    return "%.*f" % (prec, x)


def g(x: float, prec: int) -> str:
    """C `%.<prec>lg`."""
    return "%.*g" % (prec, x)


def lf5(x: float) -> str:
    return "%.5f" % x


def lf4(x: float) -> str:
    return "%.4f" % x


def lf3(x: float) -> str:
    return "%.3f" % x


def lg3(x: float) -> str:
    return "%.3g" % x


def lg5(x: float) -> str:
    return "%.5g" % x
