"""Incremental view maintenance for JOINS (delta propagation).

``operators/merge.merge_additive_parquet`` maintains AGGREGATE
materializations incrementally (partial sums roll up by addition);
this module does the same for a materialized equi-JOIN under
append-only sources — the other half of classic IVM:

    Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

so maintaining ``J = A ⋈ B`` after appending ΔA and ΔB touches only
delta-sized join inputs against the stored sides — never a
recomputation of ``A ⋈ B``. At 100 TB that is the difference between
joining a day's increment against a bucketed history (delta-sized
shuffle; the stored side is pruned/co-bucketed) and re-joining two
petabyte tables nightly.

Two tiers: ``IncrementalJoin`` covers append-only deltas (the shape
daily fact loads actually have); ``IncrementalJoinRetract`` is the
general form — signed multiplicities (differential-dataflow style), so
updates and deletes flow through the same delta rule as retractions.
Local-filesystem state with plain parquet appends (a crashed apply can
leave a partial append — production state lives behind the manifest
sink's two-phase commit, ``io/pysource.py``, or a table format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IncrementalJoin:
    """Materialized ``A ⋈ B`` (inner equi-join on shared column names)
    maintained under append-only deltas.

    The two inputs must share ONLY the join columns (the usual
    pre-renamed star-join shape); anything else would make the join
    output schema ambiguous, so ``initialize`` rejects it.
    """

    def __init__(self, spark: SparkSession, state_dir: str, on: list[str]):
        self.spark = spark
        self.state = state_dir.rstrip("/")
        self.on = list(on)

    def _a(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.state}/A")

    def _b(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.state}/B")

    def initialize(self, a: DataFrame, b: DataFrame) -> None:
        missing = [c for c in self.on if c not in a.columns or c not in b.columns]
        if missing:
            raise ValueError(
                f"IncrementalJoin: join columns {missing} absent from an input"
            )
        shared = (set(a.columns) & set(b.columns)) - set(self.on)
        if shared:
            raise ValueError(
                f"IncrementalJoin: non-key columns shared by both sides "
                f"{sorted(shared)}; rename before initializing"
            )
        a.write.mode("overwrite").parquet(f"{self.state}/A")
        b.write.mode("overwrite").parquet(f"{self.state}/B")
        a.join(b, self.on).write.mode("overwrite").parquet(f"{self.state}/J")

    def apply(
        self,
        delta_a: DataFrame | None = None,
        delta_b: DataFrame | None = None,
    ) -> int:
        """Fold ΔA / ΔB into the state; returns the number of join rows
        appended. The three delta terms are evaluated against the OLD
        stored sides (A ⋈ ΔB uses pre-append A — the ΔA ⋈ ΔB term then
        covers the cross product exactly once)."""
        # Pin the deltas: each is read by up to 3 join terms plus the
        # state append. A non-deterministic source (live directory
        # scan, sampled input) re-evaluated per use could leave J
        # inconsistent with the stored A/B — materialize once.
        if delta_a is not None:
            delta_a = delta_a.localCheckpoint(eager=True)
        if delta_b is not None:
            delta_b = delta_b.localCheckpoint(eager=True)
        terms: list[DataFrame] = []
        a_old, b_old = self._a(), self._b()
        if delta_a is not None:
            terms.append(delta_a.join(b_old, self.on))
        if delta_b is not None:
            terms.append(a_old.join(delta_b, self.on))
        if delta_a is not None and delta_b is not None:
            terms.append(delta_a.join(delta_b, self.on))
        if not terms:
            return 0
        j_delta = terms[0]
        for t in terms[1:]:
            j_delta = j_delta.unionByName(t)
        # align column order with the stored view before appending
        j_cols = self.read().columns
        j_delta = j_delta.select(*j_cols)
        n = j_delta.count()
        j_delta.write.mode("append").parquet(f"{self.state}/J")
        if delta_a is not None:
            delta_a.select(*a_old.columns).write.mode("append").parquet(
                f"{self.state}/A"
            )
        if delta_b is not None:
            delta_b.select(*b_old.columns).write.mode("append").parquet(
                f"{self.state}/B"
            )
        return n

    def read(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.state}/J")


class IncrementalJoinRetract:
    """Multiplicity-annotated incremental join: the general IVM form
    that also handles UPDATES and DELETES, not just appends.

    Every stored relation carries a signed ``__mult`` column (bag
    semantics with multiplicities — the differential-dataflow /
    DBSP formulation): an insert is ``+1``, a delete ``-1``, an update
    is a delete + an insert. The delta rule is unchanged —
    ``Δ(A ⋈ B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB`` — with join multiplicities
    MULTIPLYING (``mult(j) = mult(a)·mult(b)``), which is exactly what
    makes retractions flow through: a −1 row joined against +k history
    emits −k join rows, cancelling what the original insert produced.

    State is append-only parquet of signed rows; ``compact()`` folds
    the log (groupBy all payload columns, sum multiplicities, drop
    zeros) — the same fold a reader applies logically, so compaction
    never changes the view. At 100 TB the log-then-compact split is
    the production shape: appends are cheap and atomic per batch,
    compaction amortizes, and the compacted multiplicity of any row is
    provably the net of its inserts and deletes.
    """

    def __init__(self, spark: SparkSession, state_dir: str, on: list[str]):
        self.spark = spark
        self.state = state_dir.rstrip("/")
        self.on = list(on)

    @staticmethod
    def _signed(df: DataFrame, mult: int) -> DataFrame:
        """Sign an input changeset. An unsigned input gets ``__mult =
        mult``. A pre-signed input (e.g. rows read back from the
        maintained state, carrying ``+1``) keeps its magnitude but is
        re-signed by ``mult``: a retract of a ``+k`` row must enter the
        delta as ``-k``, never as an insert."""
        from pyspark.sql import functions as F

        if "__mult" in df.columns:
            if mult == 1:
                return df.withColumn("__mult", F.col("__mult").cast("bigint"))
            return df.withColumn(
                "__mult", (F.col("__mult") * F.lit(mult)).cast("bigint")
            )
        return df.withColumn("__mult", F.lit(mult).cast("bigint"))

    def _read_rel(self, name: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.state}/{name}")

    def initialize(self, a: DataFrame, b: DataFrame) -> None:
        missing = [c for c in self.on if c not in a.columns or c not in b.columns]
        if missing:
            raise ValueError(
                f"IncrementalJoinRetract: join columns {missing} absent"
            )
        shared = (set(a.columns) & set(b.columns)) - set(self.on)
        if shared:
            raise ValueError(
                f"IncrementalJoinRetract: non-key columns shared: "
                f"{sorted(shared)}"
            )
        sa, sb = self._signed(a, 1), self._signed(b, 1)
        sa.write.mode("overwrite").parquet(f"{self.state}/A")
        sb.write.mode("overwrite").parquet(f"{self.state}/B")
        self._join_signed(sa, sb).write.mode("overwrite").parquet(
            f"{self.state}/J"
        )

    def _join_signed(self, sa: DataFrame, sb: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        a = sa.withColumnRenamed("__mult", "__ma")
        b = sb.withColumnRenamed("__mult", "__mb")
        return (
            a.join(b, self.on)
            .withColumn("__mult", F.col("__ma") * F.col("__mb"))
            .drop("__ma", "__mb")
        )

    def apply(
        self,
        delta_a: DataFrame | None = None,
        retract_a: DataFrame | None = None,
        delta_b: DataFrame | None = None,
        retract_b: DataFrame | None = None,
    ) -> None:
        """Fold signed changes in. ``retract_*`` rows must describe
        currently-live rows (net multiplicity goes negative otherwise —
        compact() will surface that as a ValueError)."""
        da = None
        if delta_a is not None or retract_a is not None:
            parts = []
            if delta_a is not None:
                parts.append(self._signed(delta_a, 1))
            if retract_a is not None:
                parts.append(self._signed(retract_a, -1))
            da = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        db = None
        if delta_b is not None or retract_b is not None:
            parts = []
            if delta_b is not None:
                parts.append(self._signed(delta_b, 1))
            if retract_b is not None:
                parts.append(self._signed(retract_b, -1))
            db = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        if da is None and db is None:
            return
        # Same consistency pin as IncrementalJoin.apply: each signed
        # delta feeds up to 3 join terms plus its state append.
        if da is not None:
            da = da.localCheckpoint(eager=True)
        if db is not None:
            db = db.localCheckpoint(eager=True)

        a_old, b_old = self._read_rel("A"), self._read_rel("B")
        terms = []
        if da is not None:
            terms.append(self._join_signed(da, b_old))
        if db is not None:
            terms.append(self._join_signed(a_old, db))
        if da is not None and db is not None:
            terms.append(self._join_signed(da, db))
        j_delta = terms[0]
        for t in terms[1:]:
            j_delta = j_delta.unionByName(t)
        j_cols = self._read_rel("J").columns
        j_delta.select(*j_cols).write.mode("append").parquet(f"{self.state}/J")
        if da is not None:
            da.select(*a_old.columns).write.mode("append").parquet(
                f"{self.state}/A"
            )
        if db is not None:
            db.select(*b_old.columns).write.mode("append").parquet(
                f"{self.state}/B"
            )

    def _compacted(self, name: str) -> DataFrame:
        from pyspark.sql import functions as F

        rel = self._read_rel(name)
        payload = [c for c in rel.columns if c != "__mult"]
        return (
            rel.groupBy(*payload)
            .agg(F.sum("__mult").cast("bigint").alias("__mult"))
            .filter(F.col("__mult") != 0)
        )

    def compact(self) -> None:
        """Fold each relation's log; a net-negative multiplicity means
        a retraction had no matching insert — corrupted input, raised
        rather than silently clamped."""
        for name in ("A", "B", "J"):
            folded = self._compacted(name)
            if folded.filter("__mult < 0").limit(1).count() > 0:
                raise ValueError(
                    f"IncrementalJoinRetract: relation {name} has net-"
                    "negative multiplicities (retraction without insert)"
                )
            tmp = f"{self.state}/{name}__compact"
            folded.write.mode("overwrite").parquet(tmp)
            out = self.spark.read.parquet(tmp)
            out.write.mode("overwrite").parquet(f"{self.state}/{name}")

    def read(self) -> DataFrame:
        """The logical view: net-positive rows with their multiplicity."""
        return self._compacted("J")
