"""The pyuvdata-``select`` surface as DataFrame predicates
(SURVEY.md §2.2, reference configurators.py:66-97,258-261).

Every option is a pushdown-eligible predicate or a broadcast
semi/anti-join — Catalyst pushes the scalar ones to the parquet scan
(visible as PushedFilters in .explain), so selective reads never touch
pruned row groups. This replaces the reference's re-read-with-times
slicing (processors.py:170-172) outright.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SpectrumType = Literal["all", "auto", "cross"]


@dataclass
class SelectOptions:
    """Mirror of the reference option surface (configurators.py:74-97).

    Validation is eager like the reference (V6 at configurators.py:179-180).
    """

    sel_ants: list[int] | None = None      # F1
    skip_ants: list[int] | None = None     # F2
    sel_pols: list[str] | None = None      # F3
    freq_range: tuple[float, float] | None = None  # F4
    time_limit: int | None = None          # F5
    remove_flagged_ants: bool = True       # F6 (default: configurators.py:70)
    spectrum_type: SpectrumType = "all"    # F7 (configurators.py:86-87)
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.sel_ants and self.skip_ants:
            raise ValueError("sel_ants and skip_ants are mutually exclusive")

    def suffix(self) -> str:
        """X9 output-name suffix derivation (configurators.py:125-134)."""
        parts = []
        if self.spectrum_type != "all":
            parts.append(self.spectrum_type)
        if self.sel_ants:
            parts.append("sel" + "-".join(map(str, self.sel_ants)))
        if self.skip_ants:
            parts.append("skip" + "-".join(map(str, self.skip_ants)))
        if self.sel_pols:
            parts.append("".join(self.sel_pols))
        return ("." + ".".join(parts)) if parts else ""


def spectrum_predicate(spectrum_type: SpectrumType):
    """F7: auto = ant1==ant2, cross = ant1!=ant2 (configurators.py:86-87)."""
    if spectrum_type == "auto":
        return F.col("ant1") == F.col("ant2")
    if spectrum_type == "cross":
        return F.col("ant1") != F.col("ant2")
    return F.lit(True)


def apply_select(
    vis: DataFrame,
    opts: SelectOptions,
    antenna_dim: DataFrame | None = None,
) -> DataFrame:
    """Apply the full select surface to a long-format visibility frame."""
    df = vis
    if opts.sel_ants:                                      # F1
        df = df.where(
            F.col("ant1").isin(opts.sel_ants) & F.col("ant2").isin(opts.sel_ants)
        )
    if opts.skip_ants:                                     # F2
        df = df.where(
            ~F.col("ant1").isin(opts.skip_ants) & ~F.col("ant2").isin(opts.skip_ants)
        )
    if opts.sel_pols:                                      # F3
        df = df.where(F.col("pol").isin(opts.sel_pols))
    if opts.freq_range:                                    # F4
        lo, hi = opts.freq_range
        df = df.where(F.col("freq_hz").between(lo, hi))
    if opts.spectrum_type != "all":                        # F7
        df = df.where(spectrum_predicate(opts.spectrum_type))
    if opts.remove_flagged_ants and antenna_dim is not None:  # F6
        flagged = F.broadcast(
            antenna_dim.where(F.col("flagged")).select(F.col("ant").alias("_fa"))
        )
        df = (
            df.join(flagged, df["ant1"] == F.col("_fa"), "left_anti")
            .join(flagged, df["ant2"] == F.col("_fa"), "left_anti")
        )
    if opts.time_limit is not None:                        # F5
        # first N distinct times, then a broadcast semi-join — never a
        # global sort of the fact table.
        times = (
            df.select("time_idx").distinct().orderBy("time_idx")
            .limit(opts.time_limit)
        )
        df = df.join(F.broadcast(times), "time_idx", "left_semi")
    return df
