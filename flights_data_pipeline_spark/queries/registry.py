"""Query registry plumbing.

A *query* is a named, tested unit of the engine contract:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark-side implementation
  (DataFrame API or spark.sql over registered views).
* ``oracle`` — an equivalent ANSI SQL string for DuckDB, or ``None`` for
  genuinely non-SQL-expressible operators (the driver then records a
  weaker rows-only check; the judge sees which).

Column names are part of the contract: the driver sorts columns by name
before hashing values, so every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    #: DuckDB oracle SQL; a zero-arg callable is resolved LAZILY (and
    #: once) at ``oracle_sql_map()`` time — for oracles that embed
    #: pinned values computed from the corpus (``pinned_oracles``),
    #: so module import stays free of I/O.
    oracle: str | Callable[[], str] | None
    doc: str

    def oracle_text(self) -> str | None:
        if callable(self.oracle):
            self.oracle = self.oracle()
        return self.oracle


REGISTRY: dict[str, Query] = {}


def query(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _driver_sample_order() -> list[str]:
    """Order the registry so the driver's head-first 50-query sample
    rotates through EVERYTHING over successive rounds.

    The driver verifies the first ~50 entries of ``queries()`` per
    round; a fixed insertion order would re-sample the same head
    forever and leave the tail without an acceptance signal. We read
    the accumulated ``CORRECTNESS_r*.json`` files (the driver's own
    output, committed at the repo root) and sort:

    1. queries whose LATEST driver check failed (re-verify fixes first),
    2. queries never driver-sampled,
    3. everything else, least-recently-sampled first.

    Ties break on name for determinism. Falls back to insertion order
    if the history files are unreadable (e.g. the package is used
    outside this repo).
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, tuple[int, bool, bool]] = {}  # name -> (round, passed, was_rows_only)
    try:
        for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            with open(path) as f:
                data = json.load(f)
            for name, res in data.items():
                if not isinstance(res, dict):
                    continue
                rows_only = res.get("err") == "no_oracle"
                if rows_only:
                    # rows-only query: the driver recorded its weaker
                    # check — that IS a successful sample, not a fail
                    passed = True
                else:
                    passed = bool(
                        res.get("rows_match")
                        and res.get("schema_match", True)
                        and res.get("hash_match", True)
                    )
                prev = latest.get(name)
                if prev is None or rnd >= prev[0]:
                    latest[name] = (rnd, passed, rows_only)
    except (OSError, ValueError):
        return list(REGISTRY)

    return _order_from_history(list(REGISTRY), latest)


def _order_from_history(
    names: list[str], latest: dict[str, tuple[int, bool, bool]]
) -> list[str]:
    """Pure ordering kernel: latest-fail first, never-sampled second
    (a stale rows-only datapoint for a query that has SINCE gained an
    oracle counts as never-sampled — the upgrade must be re-certified,
    round-7 VERDICT task 3), then passed least-recently-sampled-first;
    name breaks ties."""

    def key(name: str):
        hist = latest.get(name)
        if hist is None:
            return (1, 0, name)  # never sampled
        rnd, passed, rows_only = hist
        if not passed:
            return (0, rnd, name)  # latest check failed — front of queue
        q = REGISTRY.get(name)
        if rows_only and q is not None and q.oracle is not None:
            # oracle gained since the stale rows-only sample: the hash
            # gate has never seen it — treat as never-sampled
            return (1, rnd, name)
        return (2, rnd, name)  # passed; least-recent first

    return sorted(names, key=key)


def queries_map() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _driver_sample_order()}


def oracle_sql_map() -> dict[str, str]:
    out: dict[str, str] = {}
    for name in _driver_sample_order():
        text = REGISTRY[name].oracle_text()
        if text is not None:
            out[name] = text
    return out


#: the shared heavy subtrees whose composers need special sweep
#: treatment (see :func:`lsh_composer_clan`): the MinHash/LSH
#: candidate pipeline and the winnowing fingerprint pass.
_CLAN_SEED_HELPERS = frozenset(
    {
        "_minhash_per_doc",
        "_lsh_candidates",
        "winnow_fp_set",
    }
)


def _called_names(fn) -> set[str]:
    """Names invoked by ``fn``: direct calls (``helper(...)``/
    ``other_query(...)``) plus registry compositions
    (``REGISTRY["name"].fn(...)``) — docstrings and comments never
    match (the substring-scan false-positive class)."""
    import ast
    import inspect
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, SyntaxError, TypeError):
        return set()
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name):
                out.add(f.id)
            elif isinstance(f, ast.Attribute):
                out.add(f.attr)
        if (
            isinstance(node, ast.Subscript)
            and isinstance(node.value, ast.Name)
            and node.value.id == "REGISTRY"
            and isinstance(node.slice, ast.Constant)
            and isinstance(node.slice.value, str)
        ):
            out.add(node.slice.value)
    return out


def _transitive_called_names(fn, memo: dict) -> set[str]:
    """:func:`_called_names` closed transitively through module-level
    helper FUNCTIONS defined inside this package: a called name that
    resolves (via the caller's ``__globals__``) to a package-local
    function contributes its own call set too. This is what lets a
    non-registry wrapper around an LSH kernel (the ``_candidate_runs``
    pattern, which previously had to be hand-seeded) carry its
    composers into the clan automatically — the round-11 ADVICE's
    hand-list failure mode, closed structurally."""
    key = (getattr(fn, "__module__", None), getattr(fn, "__qualname__", None))
    hit = memo.get(key)
    if hit is not None:
        return hit
    memo[key] = set()  # cycle guard: recursion sees an empty set
    names = _called_names(fn)
    out = set(names)
    g = getattr(fn, "__globals__", {})
    for n in names:
        obj = g.get(n)
        if (
            callable(obj)
            and obj is not fn
            and getattr(obj, "__module__", "").startswith(
                __name__.split(".queries")[0]
            )
            and hasattr(obj, "__globals__")  # plain function, not a class
        ):
            out |= _transitive_called_names(obj, memo)
    memo[key] = out
    return out


def lsh_composer_clan() -> list[str]:
    """Every registered query that (transitively) composes the
    MinHash/LSH candidate pipeline or the winnowing fingerprint
    subtree — the family whose executions pin deep tiered-JIT +
    localCheckpoint state and therefore need the sweep-tail + GC
    protocol in ``tools/bench_full.py``.

    Discovered from the registry by AST call-graph inspection (direct
    helper calls — walked TRANSITIVELY through package-local helper
    functions — composed-query calls by name, and
    ``REGISTRY["..."].fn`` compositions), closed to a fixpoint — a new
    composer joins the clan the day it is registered, instead of
    rotating the sweep's one inflated draw onto itself (the round-10
    VERDICT's structural-fix mandate; the hand-maintained list missed
    ``split_leakage_report`` exactly this way, and the hand-seeded
    ``_candidate_runs`` helper was the same failure mode one level
    down — both now fall out of the transitive walk)."""
    memo: dict = {}
    deps = {
        name: _transitive_called_names(q.fn, memo)
        for name, q in REGISTRY.items()
    }
    clan = {n for n, d in deps.items() if d & _CLAN_SEED_HELPERS}
    while True:
        grown = clan | {n for n, d in deps.items() if d & clan}
        if grown == clan:
            return sorted(clan)
        clan = grown
