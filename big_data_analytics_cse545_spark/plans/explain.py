"""Physical-plan inspection helpers — the engine's scale-readiness gates.

The reference has no optimizer to inspect (RDD lineage only, SURVEY §4);
our engine's contract is that Catalyst produces the plan a 100 TB run
needs: filters pushed into the parquet scan, only referenced columns
read, small dims broadcast, hot paths inside whole-stage codegen. These
helpers turn those properties into assertable strings so tests/ can pin
them (tests/test_plans.py) instead of hoping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        getattr(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode,
            "fromString",
        )(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every file scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column sets actually read from parquet (ReadSchema), one entry per
    scan — column pruning is visible as missing columns here."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def runtime_shuffle_exchanges(df: DataFrame) -> tuple[int, int, int]:
    """Runtime-truthful shuffle-exchange count as
    ``(outer, cached_internal, n_cached_relations)``.

    The textual explain inlines every persisted relation's BUILD plan
    under each of its InMemoryRelation references, so a regex count
    multiplies the cached build's exchanges by the reference count —
    g01's 6-iteration loop reads 85+ "Exchange" lines while a run
    executes 34 (the r8 plan-audit finding). This walks the physical
    tree via py4j instead: InMemoryTableScan is a LEAF (its reads hit
    the cache), and each DISTINCT cached relation's build plan is
    counted exactly once — which is what a run actually executes.
    AdaptiveSparkPlanExec is unwrapped to its initialPlan (AQE may
    still elide some of these at runtime; this is the upper bound the
    static audit wants). ReusedExchange re-reads an exchange counted
    elsewhere, so it adds nothing.
    """

    def unwrap(n):
        if n.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            return n.initialPlan()
        return n

    def kids(n):
        ch = n.children()
        return [ch.apply(i) for i in range(ch.size())]

    def count(n, cached):
        n = unwrap(n)
        nm = n.getClass().getSimpleName()
        if nm == "InMemoryTableScanExec":
            cp = n.relation().cacheBuilder().cachedPlan()
            key = cp.id()
            if key not in cached:
                cached[key] = 0  # break cycles while this plan is walked
                cached[key] = count(cp, cached)
            return 0
        c = 1 if nm == "ShuffleExchangeExec" else 0
        return c + sum(count(x, cached) for x in kids(n))

    cached: dict[int, int] = {}
    outer = count(df._jdf.queryExecution().executedPlan(), cached)
    return outer, sum(cached.values()), len(cached)


def shuffle_exchanges(df: DataFrame) -> list[str]:
    """Shuffle Exchange nodes (hash/range/single-partition) in the plan
    — broadcast exchanges excluded. Each entry is the partitioning spec,
    so tests can pin both the count and the keys a query shuffles on."""
    text = explain_str(df, "simple")
    return [
        m.group(1)
        for m in re.finditer(
            r"Exchange (hashpartitioning\([^)]*\)|rangepartitioning\([^)]*\)|SinglePartition)",
            text,
        )
    ]


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — wider/fewer is better.

    Uses the codegen explain mode: with AQE enabled the simple plan is
    printed before stage finalization and carries no codegen markers.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # AQE finalizes stages lazily, so a pre-execution explain reports
        # zero codegen subtrees; re-plan the same logical plan without AQE
        # (round-trip through a temp view forces fresh physical planning).
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df.createOrReplaceTempView("_codegen_probe")
        probe = spark.table("_codegen_probe")
        m = re.search(
            r"Found (\d+) WholeStageCodegen subtrees", explain_str(probe, "codegen")
        )
        return int(m.group(1)) if m else 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.catalog.dropTempView("_codegen_probe")
