"""Environment-proof exact arithmetic helpers.

The driver's correctness gate hashes rendered values from Spark and
DuckDB; any float quotient near a ``round(x, 6)`` boundary can flip
between engines/versions (the r3 ``order_seasonality`` failure). The
helpers here keep ratio-style outputs in pure BIGINT arithmetic so
both engines produce bit-identical integers.
"""

from __future__ import annotations


def ppm_expr(part: str, total: str) -> str:
    """SQL expression (Spark SQL ``DIV`` spelling): floor(part * 1e6
    / total) computed entirely in BIGINT via a two-level remainder
    split — ``(p*1000 div t)*1000 + ((p*1000 mod t)*1000) div t``.
    Every intermediate stays <= total*1000, so the result is exact
    for totals up to ~9.2e15 (vs ~9.2e12 for the naive ``p*1e6``).
    Both operands must be non-negative and fit in BIGINT; each is
    explicitly CAST to BIGINT so small literals cannot be typed
    INT32 (DuckDB overflows INT32 on ``p*1000`` at p > ~2.1e6) and
    HUGEINT sums are pinned back to one integer width. The RESULT
    must also fit: callers with part > total (the lift_e6 shapes)
    must guarantee part/total < ~9.2e12 — shares (part <= total)
    are always safe.
    """
    p, t = f"CAST({part} AS BIGINT)", f"CAST({total} AS BIGINT)"
    return f"(({p} * 1000) DIV {t}) * 1000 + ((({p} * 1000) % {t}) * 1000) DIV {t}"


def checked_mul_expr(a: str, b: str) -> str:
    """Spark SQL BIGINT product with a runtime overflow guard
    (ADVICE r4): ``a * b`` feeding :func:`ppm_expr` as the PART
    operand must stay under ~9.2e15 (the helper multiplies it by
    1000 twice), and Spark's non-ANSI BIGINT multiply WRAPS silently
    on overflow — corrupting lift_e6 at extreme scale with no error.
    This guard pre-checks the magnitude in doubles and raises via
    ``assert_true`` instead of wrapping (DuckDB needs no twin: it
    errors loudly on BIGINT overflow by itself). The check is one
    double multiply per row of an already-aggregated pair table —
    off the corpus-scale path.
    """
    A, B = f"CAST({a} AS BIGINT)", f"CAST({b} AS BIGINT)"
    cond = f"CAST({A} AS DOUBLE) * CAST({B} AS DOUBLE) <= 9.0e15"
    return (
        f"IF(assert_true({cond}, 'exact-ppm overflow: product exceeds"
        f" 9.0e15 exact bound') IS NULL, {A} * {B}, NULL)"
    )


def ppm_sql(part: str, total: str) -> str:
    """DuckDB spelling of :func:`ppm_expr` (``//`` integer division).
    Keep the two in lockstep — they are the oracle-parity contract.
    """
    p, t = f"CAST({part} AS BIGINT)", f"CAST({total} AS BIGINT)"
    return f"(({p} * 1000) // {t}) * 1000 + ((({p} * 1000) % {t}) * 1000) // {t}"
