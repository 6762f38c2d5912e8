"""Offline generator for BH_Z_CRIT_M19 (quality_rank.py) — the
Benjamini-Hochberg two-sided z thresholds for m = 19 simultaneous
tests at FDR alpha = 0.05: entry i is Phi^{-1}(1 - (0.05*i/19)/2).

Inverse normal = Acklam's rational approximation refined by three
Newton steps against math.erfc (which IS the double-precision normal
CDF up to scaling), so every pinned literal round-trips through erfc
to its alpha with error < 2e-16 — the reproduction test in
tests/test_round7l_ops.py asserts exactly that, the same
trainer-to-constant loop as the ANN codebooks and BPE merges.

Run:  python -m kafka_stream_processing_spark.tools.gen_bh_z_table
"""

from __future__ import annotations

import math

FDR_ALPHA = 0.05
M_TESTS = 19


def inv_norm(p: float) -> float:
    """Phi^{-1}(p): Acklam initial estimate + Newton on erfc."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        x = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
             * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    elif p <= phigh:
        q = p - 0.5
        r = q * q
        x = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
             * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
            * r + 1)
    else:
        q = math.sqrt(-2 * math.log(1 - p))
        x = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
              * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    for _ in range(3):
        e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
        u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
        x = x - u / (1 + x * u / 2)
    return x


def bh_z_table(m: int = M_TESTS, alpha: float = FDR_ALPHA) -> dict[int, float]:
    return {
        i: inv_norm(1 - (alpha * i / m) / 2) for i in range(1, m + 1)
    }


if __name__ == "__main__":
    for i, z in bh_z_table().items():
        print(f"    {i}: {z!r},")
