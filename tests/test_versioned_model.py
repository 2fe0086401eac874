"""Model-based fuzzing of the versioned snapshot store: random
operation sequences (overwrite / append / key-delete / restore / purge
/ time-travel reads) applied to BOTH the real store and a 20-line
in-memory model; every version of the real table must read back
exactly what the model predicts. Derandomized hypothesis examples so
CI is stable — the same discipline as test_property_fuzz.

The model is the SPEC: a version is a list of (commit rows) plus
key tombstones scoped to the commits that existed when the delete ran
(later re-inserts survive); purge applies tombstones physically and
must change nothing a reader can see.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from data_spark.io import (
    delete_versioned,
    purge_deletes,
    read_versioned,
    restore_version,
    table_versions,
    write_versioned,
)

# an operation is one of:
#  ("overwrite", [keys]) / ("append", [keys]) — rows are (k, k*10.0)
#  ("delete", [keys]) — key tombstone
#  ("restore", fraction) — restore an earlier version (scaled index)
#  ("purge",) — physically apply tombstones
keys_lists = st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=6)
op = st.one_of(
    st.tuples(st.just("overwrite"), keys_lists),
    st.tuples(st.just("append"), keys_lists),
    st.tuples(st.just("delete"), keys_lists),
    st.tuples(st.just("restore"), st.floats(min_value=0.0, max_value=1.0)),
    st.tuples(st.just("purge")),
)


class _Model:
    """Reference semantics: snapshots of visible row-multisets."""

    def __init__(self):
        self.snapshots: list[list[tuple]] = []  # per version: visible rows

    def overwrite(self, rows):
        self.snapshots.append(sorted(rows))

    def append(self, rows):
        base = self.snapshots[-1] if self.snapshots else []
        self.snapshots.append(sorted(base + rows))

    def delete(self, ks):
        base = self.snapshots[-1]
        self.snapshots.append(sorted(r for r in base if r[0] not in set(ks)))

    def restore(self, version):
        self.snapshots.append(list(self.snapshots[version]))

    def purge(self):
        self.snapshots.append(list(self.snapshots[-1]))


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op, min_size=2, max_size=8))
def test_store_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("vstore") / "t")
    model = _Model()

    def rows_for(ks):
        return [(k, k * 10.0) for k in ks]

    def df_for(ks):
        return spark.createDataFrame(rows_for(ks), "k long, x double")

    # the store needs a first commit; force an overwrite up front
    first = ops[0]
    if first[0] != "overwrite":
        ops = [("overwrite", [1, 2, 3])] + ops
    for o in ops:
        kind = o[0]
        if kind == "overwrite":
            write_versioned(df_for(o[1]), table, "overwrite")
            model.overwrite(rows_for(o[1]))
        elif kind == "append":
            write_versioned(df_for(o[1]), table, "append")
            model.append(rows_for(o[1]))
        elif kind == "delete":
            delete_versioned(
                spark.createDataFrame([(k,) for k in o[1]], "k long"), table
            )
            model.delete(o[1])
        elif kind == "restore":
            versions = table_versions(table)
            target = versions[int(o[1] * (len(versions) - 1))]
            restore_version(table, target)
            model.restore(target)
        elif kind == "purge":
            before = len(table_versions(table))
            purge_deletes(spark, table)
            if len(table_versions(table)) > before:
                model.purge()
            # purge with no tombstones is a version no-op; model skips too

    versions = table_versions(table)
    assert len(versions) == len(model.snapshots)
    # EVERY version (not just the head) must read back the model's snapshot
    for v, expected in zip(versions, model.snapshots):
        got = sorted(tuple(r) for r in read_versioned(spark, table, v).collect())
        assert got == expected, f"version {v}: {got} != {expected}"
