"""Complex-number column algebra over ``struct<re:double, im:double>``.

Spark has no complex type (SURVEY.md §1.2); visibilities are carried as
a two-field struct and every operation is written component-wise so it
stays inside whole-stage codegen (no UDFs).

Reference semantics: pyuvdata ``data_array`` is a numpy complex array
(reference processors.py:13, pyuvdata public API); SSINS magnitude
``|V|`` feeds the INS statistic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def c_struct(re: Column, im: Column) -> Column:
    """Pack real/imaginary columns into the canonical vis struct."""
    return F.struct(re.alias("re"), im.alias("im"))


def c_add(a: Column, b: Column) -> Column:
    return c_struct(a["re"] + b["re"], a["im"] + b["im"])


def c_sub(a: Column, b: Column) -> Column:
    return c_struct(a["re"] - b["re"], a["im"] - b["im"])


def c_mul(a: Column, b: Column) -> Column:
    return c_struct(
        a["re"] * b["re"] - a["im"] * b["im"],
        a["re"] * b["im"] + a["im"] * b["re"],
    )


def c_conj(a: Column) -> Column:
    return c_struct(a["re"], -a["im"])


def c_scale(a: Column, k: Column | float) -> Column:
    return c_struct(a["re"] * k, a["im"] * k)


def c_abs(a: Column) -> Column:
    """|V| = hypot(re, im) — JVM intrinsic, overflow-safe (SURVEY X7)."""
    return F.hypot(a["re"], a["im"])
