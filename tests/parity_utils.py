"""Output canonicalization for parity comparison.

At alpha=0.5 the pair likelihood is exactly symmetric in (j,k)
(p = 0.25*(l+m)), so llkAB[j,k,.5] and llkAB[k,j,.5] differ only by
floating-point summation order — which of the two wins the doublet argmax is
fp noise in ANY implementation (including the C++ reference, where the two
are accumulated in transposed order, cmd_cram_demuxlet.cpp:671-684). Byte
parity is therefore defined modulo the (j,k)<->(k,j) swap of a best doublet
at alpha=0.5: canonicalize .best rows to the sorted pair before diffing.
"""

from __future__ import annotations


def canonicalize_best_line(line: str) -> str:
    cols = line.split("\t")
    if len(cols) != 22 or cols[0] == "BARCODE":
        return line
    best = cols[5]
    d1, d2 = cols[11], cols[12]
    alpha = cols[13]
    if alpha != "0.500" or d1 <= d2:
        return line
    # swap DBL.1ST/DBL.2ND, LLK1/LLK2, LLK10/LLK20
    cols[11], cols[12] = d2, d1
    cols[15], cols[16] = cols[16], cols[15]
    cols[17], cols[18] = cols[18], cols[17]
    if best.startswith("DBL-"):
        parts = best.split("-")
        # DBL-<s1>-<s2>-<alpha>; sample ids may contain '-' so rebuild from
        # the known d1/d2 columns
        cols[5] = f"DBL-{d2}-{d1}-{parts[-1]}"
    elif best.startswith("AMB-"):
        # AMB-<i1>-<i2>-<j>/<k>: swap the j/k tail
        head, _, tail = best.rpartition("-")
        if "/" in tail:
            a, b = tail.split("/", 1)
            cols[5] = f"{head}-{b}/{a}"
    return "\t".join(cols)


def canonicalize_best(lines):
    return [canonicalize_best_line(l) for l in lines]
