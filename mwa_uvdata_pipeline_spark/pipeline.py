"""End-to-end pipeline facade: the reference's ``SS.read`` option
surface (SURVEY.md §2.9) composed in its execution order, feeding the
SSINS chain (§2.10).

Reference defaults (configurators.py:66-71): diff=True, flag_init=True,
remove_coarse_band=False, correct_van_vleck=False,
remove_flagged_ants=True, flag_choice=None. ``run_check`` has no
equivalent — schema-on-read replaces pyuvdata's O(data) consistency
scan (configurators.py:224,261).

Everything here is lazy plan construction; Catalyst fuses the predicate
stages into the scan and the whole chain runs as two shuffles (the diff
window and the INS aggregation) regardless of how many options are on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from mwa_uvdata_pipeline_spark.operators.diff import time_diff
from mwa_uvdata_pipeline_spark.operators.flags import (
    correct_van_vleck,
    flag_init,
    remove_coarse_band,
    seed_flags,
)
from mwa_uvdata_pipeline_spark.operators.ins import incoherent_noise_spectrum, zscore
from mwa_uvdata_pipeline_spark.operators.matchfilter import (
    MatchFilterConfig,
    match_filter,
)
from mwa_uvdata_pipeline_spark.operators.select import SelectOptions, apply_select


@dataclass
class ReadOptions:
    """SS.read surface (reference configurators.py:66-71,215-225)."""

    diff: bool = True                   # W1 (configurators.py:66)
    flag_init: bool = True              # configurators.py:67
    remove_coarse_band: bool = False    # configurators.py:68 ("low freq res")
    correct_van_vleck: bool = False     # configurators.py:69 ("slow")
    flag_choice: str | None = None      # configurators.py:71
    fine_per_coarse: int = 8
    edge_width: int = 1
    gain_dim: DataFrame | None = None
    van_vleck_sigma: float = 1.0


@dataclass
class PipelineConfig:
    read: ReadOptions = field(default_factory=ReadOptions)
    select: SelectOptions = field(default_factory=SelectOptions)
    mf: MatchFilterConfig = field(default_factory=MatchFilterConfig)

    def output_suffix(self) -> str:
        """X9 naming: '.diff' prefix plus the select tags
        (reference configurators.py:125-134)."""
        return (".diff" if self.read.diff else "") + self.select.suffix()


def ss_read(
    vis: DataFrame,
    opts: ReadOptions | None = None,
    select: SelectOptions | None = None,
    antenna_dim: DataFrame | None = None,
) -> DataFrame:
    """The read-time transform chain in reference order: seed flags →
    initial flagging → corrections → select → time diff."""
    opts = opts or ReadOptions()
    df = seed_flags(vis, opts.flag_choice)
    if opts.flag_init:
        df = flag_init(df, opts.fine_per_coarse, opts.edge_width)
    if opts.correct_van_vleck:
        df = correct_van_vleck(df, opts.van_vleck_sigma)
    if opts.remove_coarse_band:
        df = remove_coarse_band(df, opts.gain_dim)
    if select is not None:
        df = apply_select(df, select, antenna_dim)
    if opts.diff:
        df = time_diff(df)
    return df


def ssins_pipeline(
    vis: DataFrame,
    cfg: PipelineConfig | None = None,
    antenna_dim: DataFrame | None = None,
) -> DataFrame:
    """Flagship query (SURVEY.md §7 phase 1): read-chain → INS →
    z-score → match filter. Returns the per-(time, chan, pol) flag
    table with narrow/streak/time-broadcast verdicts."""
    cfg = cfg or PipelineConfig()
    d = ss_read(vis, cfg.read, cfg.select, antenna_dim)
    ins = incoherent_noise_spectrum(d, spectrum_type=cfg.select.spectrum_type)
    return match_filter(zscore(ins), cfg.mf)
