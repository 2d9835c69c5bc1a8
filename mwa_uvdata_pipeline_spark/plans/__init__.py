"""Query-plan registry: every entry is one operator family from
SURVEY.md §2 expressed over the driver test tables, with a DuckDB
oracle twin where SQL-expressible.

``PLANS`` maps name → Plan(spark_fn, oracle_sql, bench flag).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Plan:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    bench: bool = False
    doc: str = ""


PLANS: dict[str, Plan] = {}


def register(name: str, sql: str | None = None, bench: bool = False, doc: str = ""):
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        PLANS[name] = Plan(name=name, spark=fn, sql=sql, bench=bench, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition a tiny single-file scan to the cluster's
    default parallelism BEFORE per-row-heavy work (explode, token
    shingling, vector math, Python decode).

    The driver fixtures are one single-row-group parquet file per
    table, so without this the first stage of every lineage — often
    the expansion-heavy one — is ONE task on one core (optimization
    guide §2.5/§8: derive partition counts from the environment, and
    shuffle the narrow pre-expansion rows, not the expanded ones).
    Downstream groupBys whose keys contain ``cols`` reuse the hash
    partitioning (HashPartitioning on a subset of the grouping keys
    satisfies ClusteredDistribution), so this usually moves the
    lineage's FIRST exchange from after the expansion to before it
    rather than adding one. On a real many-file scan the exchange
    degenerates to a cheap narrow reshuffle."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def _events_ts_is_nanos(path: str) -> bool:
    """Read ONE parquet footer to learn the physical ``ts`` type.

    Footer-only metadata read (no row groups), cached per path so a
    registry sweep touches each fixture footer once.
    """
    import os

    if path in _EVENTS_NANOS_CACHE:
        return _EVENTS_NANOS_CACHE[path]
    try:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = [
                f for f in sorted(os.listdir(path)) if f.endswith(".parquet")
            ]
            probe = os.path.join(path, parts[0]) if parts else path
        nanos = str(pq.read_schema(probe).field("ts").type) == "timestamp[ns]"
    except Exception:
        nanos = False
    _EVENTS_NANOS_CACHE[path] = nanos
    return nanos


_EVENTS_NANOS_CACHE: dict[str, bool] = {}

#: Session confs a loader had to set and could not restore (the conf
#: must outlive the returned lazy DataFrame). Conf name -> reason.
#: Surfaced by :func:`session_conf_residues` so reports/tools can tell
#: the user the session's parquet-nanos read behavior changed, instead
#: of the residue being a silent global side effect (ADVICE r5).
_SESSION_CONF_RESIDUES: dict[str, str] = {}


def session_conf_residues() -> dict[str, str]:
    """Session confs left set by table loaders, with reasons.

    Empty in the common case: ``load_events`` only sets
    ``spark.sql.legacy.parquet.nanosAsLong`` when the events footer
    physically carries TIMESTAMP(NANOS). When non-empty, any later
    parquet read of a nanos timestamp column in this session returns
    bigint — callers that care should branch on this (as
    ``load_events`` itself does via the footer probe)."""
    return dict(_SESSION_CONF_RESIDUES)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with ``ts`` tolerant of parquet timestamp drift.

    The driver has shipped events.parquet both as TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects — read nanos as long and
    truncate to micros, exactly DuckDB's nanos→micros cast) and as
    plain micros (which Spark 4 reads as TIMESTAMP_NTZ). Plans must
    work over either, so epoch arithmetic goes through ``epoch_us``.

    The legacy ``nanosAsLong`` session conf is set ONLY when the file
    footer actually carries nanos (decided by a one-footer pyarrow
    probe), so the common micros path leaves the session conf
    untouched — a table loader must not globally change how unrelated
    nanos columns read. In the nanos case the conf has to stay set for
    the lifetime of the returned (lazy) DataFrame because Spark's scan
    re-reads it at execution time; that narrow residue is documented
    here rather than hidden.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    if _events_ts_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _SESSION_CONF_RESIDUES["spark.sql.legacy.parquet.nanosAsLong"] = (
            f"events footer at {path} carries TIMESTAMP(NANOS); conf must "
            "stay set for the lifetime of the lazy scan"
        )
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def epoch_us(df: DataFrame, colname: str = "ts"):
    """NTZ-safe epoch microseconds for a timestamp column.

    ``F.unix_micros`` only accepts TIMESTAMP (with local time zone);
    the test tables carry TIMESTAMP_NTZ, where the naive wall time IS
    the UTC instant (DuckDB's ``epoch_us`` convention). The NTZ path
    is a pure wall-clock difference from the NTZ epoch literal —
    genuinely session-tz independent (``to_utc_timestamp`` would first
    implicitly cast NTZ→LTZ through the session zone, which is only
    correct under a pinned UTC session).
    """
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(colname) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {colname})"
        )
    return F.unix_micros(F.col(colname))


_FIXTURE_DIRS: dict[tuple[str, str], str] = {}
_SCRATCH_DIRS: list[str] = []
_CLEANUP_ON = False


def _cleanup_tmp_dirs() -> None:
    import shutil

    for d in list(_FIXTURE_DIRS.values()) + _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _ensure_cleanup() -> None:
    global _CLEANUP_ON
    if not _CLEANUP_ON:
        import atexit

        atexit.register(_cleanup_tmp_dirs)
        _CLEANUP_ON = True


def fixture_dir(kind: str, sf_dir: str, build) -> str:
    """Process-cached temp directory for a DERIVED fixture.

    Several plans rewrite a test table into another layout (hive
    partitions, JSONL, CSV, streaming replay slices) before querying
    it. Building that copy inside the plan function meant every
    construction — bench builds each entry 4x — wrote a fresh
    ``mkdtemp`` full dataset copy and never removed it (ADVICE r4).
    The layout is a pure function of (kind, sf_dir), so it is built
    once per process here, reused by later constructions, and removed
    at exit. Consumers MUST treat the returned directory as read-only.
    """
    import tempfile

    key = (kind, sf_dir)
    if key not in _FIXTURE_DIRS:
        out = tempfile.mkdtemp(prefix=f"{kind}_")
        build(out)
        _ensure_cleanup()
        _FIXTURE_DIRS[key] = out
    return _FIXTURE_DIRS[key]


def scratch_dir(prefix: str) -> str:
    """Fresh per-call temp dir (sinks/checkpoints that cannot be
    shared between runs), removed at process exit."""
    import tempfile

    out = tempfile.mkdtemp(prefix=prefix)
    _ensure_cleanup()
    _SCRATCH_DIRS.append(out)
    return out


def _last_verified_round() -> dict[str, int]:
    """name → latest round whose CORRECTNESS_r*.json has a green
    hash_match row for it (absent = never driver-verified)."""
    import json
    import re
    from pathlib import Path

    last: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def plan_src_hash(plan: Plan) -> str:
    """md5 of the registered plan function's own source text.

    Function-level (not module-level) on purpose: one edited entry in
    a 7k-line module must not invalidate every sibling entry — the
    driver sample is 50/round and a module-wide stamp would flood it.
    Limitation, documented: edits to shared HELPERS a plan calls do
    not change its hash; mark such entries explicitly with
    ``tools/refresh_verified.py --mark-changed``.
    """
    import hashlib
    import inspect

    try:
        src = inspect.getsource(plan.spark)
    except (OSError, TypeError):
        src = repr(plan.spark)
    return hashlib.md5(src.encode()).hexdigest()


def _load_verified() -> dict[str, dict]:
    """VERIFIED.json: name → {round, src} recorded at the entry's last
    green driver row (maintained by tools/refresh_verified.py, run at
    round start before any plan edit)."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parents[2] / "VERIFIED.json"
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def _stale_key(
    name: str,
    last_round: int,
    recorded_src: str | None,
    current_src: str,
) -> tuple[int, str]:
    """Rotation sort key: (effective round, name) — ascending.

    An entry whose plan source CHANGED since its last green driver row
    (or that has no recorded hash at all) sorts with the
    never-verified group (round 0): its existing driver rows certify
    superseded code, so re-verification must not wait out the
    stalest-first queue. Pure function so the policy is unit-testable
    without touching the filesystem.
    """
    if recorded_src is None or recorded_src != current_src:
        return (0, name)
    return (last_round, name)


def load_all() -> dict[str, Plan]:
    """Import every plan module (side effect: registry population).

    Returned order is STALEST-FIRST and CODE-CHANGE-AWARE: entries the
    driver has never hash-verified AND entries whose plan-function
    source changed since their last green row (per VERIFIED.json's
    recorded source hash) come first, then the rest by the round they
    were last verified (oldest first). The correctness harness checks
    a bounded prefix of the registry, so this rotation keeps every
    operator under recent driver coverage — and a rewritten plan gets
    re-verified next round instead of when its old green row ages out.
    """
    from mwa_uvdata_pipeline_spark.plans import (  # noqa: F401
        domain,
        events,
        relational,
        text,
        tpch,
    )

    last = _last_verified_round()
    verified = _load_verified()
    if not verified:
        # No VERIFIED.json (fresh checkout before the first refresh):
        # degrade to pure stalest-first rather than treating every
        # entry as changed, which would collapse the rotation to
        # alphabetical and starve the genuinely stale cohort.
        ordered = sorted(PLANS, key=lambda n: (last.get(n, 0), n))
        return {name: PLANS[name] for name in ordered}
    ordered = sorted(
        PLANS,
        key=lambda n: _stale_key(
            n,
            last.get(n, 0),
            (verified.get(n) or {}).get("src"),
            plan_src_hash(PLANS[n]),
        ),
    )
    return {name: PLANS[name] for name in ordered}
