"""Registry of driver-checked queries.

Every operator from SURVEY.md section 2 registers here:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- (when SQL-expressible) an equivalent ANSI/DuckDB oracle SQL string.

Rules that keep the differential oracle honest (SURVEY.md section 5.2):
- alias every computed column identically on both sides;
- make every row-set deterministic (unique-key tie-breaks under LIMIT /
  window ordering);
- keep float math either exact (integral-valued doubles, single IEEE
  ops) or explicitly rounded the same way on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Canonical battery-module order. The driver certifies the FIRST 50
# names in registration order, so that order must be a function of
# THIS list alone - never of which module some test or notebook
# happened to import first (a stray `import plans.analytics_r9` would
# otherwise prepend its registrations and silently shift the certified
# window). all_queries() re-sorts by (module rank, within-module
# registration sequence); unknown modules (ad-hoc registrations) sort
# last, past the window.
_MODULE_ORDER = [
    "relational",
    "marketdata",
    "llm_ops",
    "events",
    "dataflow_queries",
    "tail",
    "analytics_ext",
    "analytics_r7",
    "analytics_r8",
    "analytics_r9",
    "analytics_r10",
    "analytics_r11",
    "analytics_r12",
    "analytics_r13",
    "analytics_r14",
    "analytics_r15",
]
_SEQ: dict[str, tuple[int, int]] = {}
_counter = 0


def _module_rank(fn: QueryFn) -> int:
    mod = fn.__module__.rsplit(".", 1)[-1]
    try:
        return _MODULE_ORDER.index(mod)
    except ValueError:
        return len(_MODULE_ORDER)


def q(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` -> rows-only driver check
    (for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        global _counter
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        _SEQ[name] = (_module_rank(fn), _counter)
        _counter += 1
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_batteries()
    return {
        n: _QUERIES[n] for n in sorted(_QUERIES, key=lambda n: _SEQ[n])
    }


def all_oracles() -> dict[str, str]:
    _load_batteries()
    return dict(_ORACLE)


_loaded = False


def _load_batteries() -> None:
    global _loaded
    if _loaded:
        return
    # Import for registration side effects. Order IS the driver's
    # certification order (its correctness run covers the first 50
    # registered queries): the SQL-surface battery first, then the
    # market-data analytics, then the LLM-pipeline operators, then the
    # reference-dataflow composites.
    from . import relational  # noqa: F401
    from . import marketdata  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import events  # noqa: F401
    from . import dataflow_queries  # noqa: F401
    from . import tail  # noqa: F401  (past-the-window queries LAST)
    from . import analytics_ext  # noqa: F401  (round-4 extensions, past window)
    from . import analytics_r7  # noqa: F401  (round-7 extensions, past window)
    from . import analytics_r8  # noqa: F401  (round-8 extensions, past window)
    from . import analytics_r9  # noqa: F401  (round-9 extensions, past window)
    from . import analytics_r10  # noqa: F401  (round-10 extensions, past window)
    from . import analytics_r11  # noqa: F401  (round-11 extensions, past window)
    from . import analytics_r12  # noqa: F401  (round-12 extensions, past window)
    from . import analytics_r13  # noqa: F401  (round-13 extensions, past window)
    from . import analytics_r14  # noqa: F401  (round-14 extensions, past window)
    from . import analytics_r15  # noqa: F401  (round-15 extensions, past window)

    _loaded = True
