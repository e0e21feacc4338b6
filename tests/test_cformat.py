"""Verify Python %-formatting matches glibc printf for the reference's formats.

The reference writes %.5lf/%.4lf/%.3lf/%.3lg/%.5lg via hprintf
(cmd_cram_demuxlet.cpp:506,760,774,830-874); byte parity requires identical
rendering. We compile a C golden generator and diff."""

import math
import os
import struct
import subprocess
import tempfile

C_SRC = r"""
#include <stdio.h>
#include <stdint.h>
int main() {
    uint64_t bits; double x;
    while (fread(&bits, 8, 1, stdin) == 1) {
        union { uint64_t u; double d; } u; u.u = bits; x = u.d;
        printf("%.5lf|%.4lf|%.3lf|%.3lg|%.5lg\n", x, x, x, x, x);
    }
    return 0;
}
"""


def test_formats_match_glibc(tmp_path):
    src = tmp_path / "golden.c"
    src.write_text(C_SRC)
    exe = tmp_path / "golden"
    subprocess.run(["gcc", "-O2", "-o", str(exe), str(src)], check=True)

    values = [
        0.0,
        -0.0,
        1.0,
        -1.0,
        0.5,
        1e-300,
        -1e300,
        1.5e-6,
        0.000123456,
        123456789.987654321,
        math.pi,
        -math.e * 100,
        2.5,
        -2.5,
        0.125,
        0.0005,
        0.00005,
        9.99995,
        0.99999949999,
        1.0000005,
        float("inf"),
        float("-inf"),
        float("nan"),
        -755.38471,
        1e6,
        999999.5,
        -0.0001,
        3.525,
        3.515,
        1234.00005,
    ]
    # add adversarial half-way-rounding values
    import random

    rng = random.Random(0)
    for _ in range(2000):
        values.append(rng.uniform(-1e4, 1e4))
        values.append(rng.uniform(-1, 1) * 10 ** rng.randrange(-12, 12))

    payload = b"".join(struct.pack("<d", v) for v in values)
    out = subprocess.run(
        [str(exe)], input=payload, capture_output=True, check=True
    ).stdout.decode()
    got_lines = out.splitlines()
    for v, line in zip(values, got_lines):
        py = "%.5f|%.4f|%.3f|%.3g|%.5g" % (v, v, v, v, v)
        assert py == line, f"value {v!r}: python={py} c={line}"
