"""Model-based property test for snapshot-manifest commits: a random
sequence of overwrite/append/compact/vacuum ops must always leave the
table equal to a trivial in-memory model, with time travel consistent
for every version the retention window still holds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from habits_etl_spark.sinks import manifest as M

# op encodings: ("overwrite", lo, n) | ("append", lo, n) | ("compact",)
#               | ("vacuum", retain)
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), st.integers(0, 50), st.integers(1, 8)),
        st.tuples(st.just("append"), st.integers(0, 50), st.integers(1, 8)),
        st.tuples(st.just("compact")),
        st.tuples(st.just("vacuum"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_random_commit_sequences_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("mprop") / "t")
    model: list[int] = []  # multiset of v values
    history: dict[int, list[int]] = {}  # version -> model snapshot

    def df_of(lo, n):
        return spark.range(lo, lo + n).select(F.col("id").alias("v"))

    for op in ops:
        kind = op[0]
        if kind == "overwrite":
            _, lo, n = op
            M.overwrite_snapshot(spark, df_of(lo, n), path)
            model = list(range(lo, lo + n))
        elif kind == "append":
            _, lo, n = op
            M.append_snapshot(spark, df_of(lo, n), path)
            model = model + list(range(lo, lo + n))
        elif kind == "compact":
            if M.current_manifest(path) is None:
                continue
            M.compact_snapshot(spark, path, target_files=1)
        elif kind == "vacuum":
            M.vacuum(path, retain_versions=op[1])
        cur = M.current_manifest(path)
        if cur is not None:
            history[cur["version"]] = sorted(model)
            # current read always equals the model
            got = sorted(r.v for r in M.read_snapshot(spark, path).collect())
            assert got == sorted(model), (op, got)

    # time travel: every version whose manifest survived vacuum must
    # reproduce the model as it was at that commit
    if M.current_manifest(path) is not None:
        for v, snapshot in history.items():
            try:
                m = M.manifest_at(path, v)
            except KeyError:
                continue  # vacuumed past — allowed
            got = sorted(
                r.v for r in spark.read.parquet(*m["files"]).collect()
            ) if m["files"] else []
            assert got == snapshot, (v, got, snapshot)
