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

import pytest

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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Branch/WAP + partition-spec extension: the same discipline over the
# r9 surface. Every version is (branch, visible-rows); branch appends
# fork from main when the branch doesn't exist yet; publish appends a
# MAIN version with the branch head's rows; random commits are
# hive-partitioned to keep the per-commit spec machinery inside the
# fuzzed path. Explicit-version reads AND per-branch head reads must
# match the model.
# ---------------------------------------------------------------------------

branch_name = st.sampled_from(["b1", "b2"])
partitioned = st.booleans()
bop = st.one_of(
    st.tuples(st.just("overwrite"), keys_lists, partitioned),
    st.tuples(st.just("append"), keys_lists, partitioned),
    st.tuples(st.just("bappend"), branch_name, keys_lists, partitioned),
    st.tuples(st.just("delete"), keys_lists),
    st.tuples(st.just("bdelete"), branch_name, keys_lists),
    st.tuples(st.just("publish"), branch_name),
    st.tuples(st.just("restore"), st.floats(min_value=0.0, max_value=1.0)),
    # merge: (upsert keys, delete keys) — one atomic version
    st.tuples(st.just("merge"), keys_lists, keys_lists),
)


class _BranchModel:
    """Per-version (branch, rows) chain; branch resolution mirrors
    branch_head/publish_branch semantics."""

    def __init__(self):
        self.versions: list[tuple[str, list]] = []

    def head(self, branch):
        for b, rows in reversed(self.versions):
            if b == branch:
                return rows
        return None

    def commit(self, branch, rows):
        self.versions.append((branch, sorted(rows)))

    def base_for(self, branch):
        got = self.head(branch)
        if got is not None:
            return got
        return self.head("main") or []


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(bop, min_size=3, max_size=9))
@pytest.mark.slow
def test_store_matches_model_with_branches(spark, tmp_path_factory, ops):
    from data_spark.io import branch_head, publish_branch

    table = str(tmp_path_factory.mktemp("bstore") / "t")
    model = _BranchModel()

    def rows_for(ks):
        return [(k, k * 10.0, str(k % 3)) for k in ks]

    def df_for(ks):
        return spark.createDataFrame(rows_for(ks), "k long, x double, p string")

    first = ops[0]
    if first[0] != "overwrite":
        ops = [("overwrite", [1, 2, 3], False)] + ops
    for o in ops:
        kind = o[0]
        if kind == "overwrite":
            _, ks, part = o
            write_versioned(
                df_for(ks), table, "overwrite", partition_by=["p"] if part else None
            )
            model.commit("main", rows_for(ks))
        elif kind == "append":
            _, ks, part = o
            write_versioned(
                df_for(ks), table, "append", partition_by=["p"] if part else None
            )
            model.commit("main", sorted(model.base_for("main") + rows_for(ks)))
        elif kind == "bappend":
            _, b, ks, part = o
            write_versioned(
                df_for(ks),
                table,
                "append",
                branch=b,
                partition_by=["p"] if part else None,
            )
            model.commit(b, sorted(model.base_for(b) + rows_for(ks)))
        elif kind == "delete":
            delete_versioned(
                spark.createDataFrame([(k,) for k in o[1]], "k long"), table
            )
            base = model.head("main")
            model.commit("main", [r for r in base if r[0] not in set(o[1])])
        elif kind == "bdelete":
            _, b, ks = o
            if model.head(b) is None:
                continue  # store raises on a branchless delete; model skips
            delete_versioned(
                spark.createDataFrame([(k,) for k in ks], "k long"), table, branch=b
            )
            base = model.head(b)
            model.commit(b, [r for r in base if r[0] not in set(ks)])
        elif kind == "publish":
            _, b = o
            if model.head(b) is None:
                continue
            publish_branch(table, b)
            model.commit("main", list(model.head(b)))
        elif kind == "restore":
            versions = table_versions(table)
            target = versions[int(o[1] * (len(versions) - 1))]
            restore_version(table, target)
            model.commit("main", list(model.versions[target][1]))
        elif kind == "merge":
            from data_spark.io import merge_versioned

            _, ups, dels = o
            ups = sorted(set(ups) - set(dels))
            src = spark.createDataFrame(
                [(k, k * 10.0 + 1, str(k % 3), False) for k in ups]
                + [(k, 0.0, "0", True) for k in sorted(set(dels))],
                "k long, x double, p string, is_del boolean",
            )
            merge_versioned(src, table, keys=["k"], delete_col="is_del")
            base = model.head("main")
            touched = set(ups) | set(dels)
            model.commit(
                "main",
                [r for r in base if r[0] not in touched]
                + [(k, k * 10.0 + 1, str(k % 3)) for k in ups],
            )

    versions = table_versions(table)
    assert len(versions) == len(model.versions)
    # every version reads back its model rows (column-order pinned:
    # spec'd commits surface the partition column last)
    for v, (_b, expected) in zip(versions, model.versions):
        got = sorted(
            tuple(r)
            for r in read_versioned(spark, table, v).select("k", "x", "p").collect()
        )
        assert got == expected, f"version {v}: {got} != {expected}"
    # and every live branch head resolves to its chain's last state
    for b in ("main", "b1", "b2"):
        expected = model.head(b)
        assert (branch_head(table, b) is not None) == (expected is not None)
        if expected is not None:
            got = sorted(
                tuple(r)
                for r in read_versioned(spark, table, branch=b)
                .select("k", "x", "p")
                .collect()
            )
            assert got == expected, f"branch {b}: {got} != {expected}"


# ---------------------------------------------------------------------------
# r10 extension: threshold maintenance inside the fuzzed op stream, and
# the Change-Data-Feed composition invariant. maintain_versioned may
# publish 0, 1, or 2 versions (purge and/or collapse) — the model
# mirrors exactly what the report says ran, and every version must
# still read back the model's snapshot. For sequences containing no
# content-rewriting ops (restore / later overwrite), applying
# read_changes(0, head) to version 0's snapshot must reproduce the
# head snapshot (inserts/deletes/update images, multiset semantics).
# ---------------------------------------------------------------------------

# the trailing boolean on delete/merge is change_feed: sequences mix
# commit-time-stored and reconstructed CDF versions in ONE feed, and
# every invariant below must hold identically for both serving modes
mop = st.one_of(
    st.tuples(st.just("append"), keys_lists),
    st.tuples(st.just("delete"), keys_lists, st.booleans()),
    st.tuples(st.just("merge"), keys_lists, keys_lists, st.booleans()),
    st.tuples(st.just("maintain")),
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(mop, min_size=2, max_size=8))
@pytest.mark.slow
def test_maintenance_and_change_feed_match_model(spark, tmp_path_factory, ops):
    from data_spark.io import maintain_versioned, merge_versioned, read_changes

    table = str(tmp_path_factory.mktemp("vmaint") / "t")
    model = _Model()

    def rows_for(ks):
        return [(k, k * 10.0) for k in ks]

    def df_for(ks):
        return spark.createDataFrame(rows_for(ks), "k long, x double")

    write_versioned(df_for([1, 2, 3]), table, "overwrite")
    model.overwrite(rows_for([1, 2, 3]))
    for o in ops:
        kind = o[0]
        if kind == "append":
            write_versioned(df_for(o[1]), table, "append")
            model.append(rows_for(o[1]))
        elif kind == "delete":
            delete_versioned(
                spark.createDataFrame([(k,) for k in o[1]], "k long"),
                table,
                change_feed=o[2],
            )
            model.delete(o[1])
        elif kind == "merge":
            ups, dels = o[1], o[2]
            src = spark.createDataFrame(
                [(k, k * 10.0, False) for k in ups]
                + [(k, k * 10.0, True) for k in dels],
                "k long, x double, del boolean",
            )
            merge_versioned(
                src, table, keys=["k"], delete_col="del", change_feed=o[3]
            )
            base = model.snapshots[-1]
            touched = set(ups) | set(dels)
            model.snapshots.append(
                sorted(
                    [r for r in base if r[0] not in touched]
                    + [(k, k * 10.0) for k in ups]
                )
            )
        elif kind == "maintain":
            rep = maintain_versioned(
                spark, table, max_delete_entries=1, max_commits=2
            )
            if rep["purged"] is not None:
                model.purge()
            if rep["collapsed"] is not None:
                model.purge()  # collapse is layout-only too

    versions = table_versions(table)
    assert len(versions) == len(model.snapshots)
    for v, expected in zip(versions, model.snapshots):
        got = sorted(tuple(r) for r in read_versioned(spark, table, v).collect())
        assert got == expected, f"version {v}: {got} != {expected}"

    # CDF composition: apply the feed to the first snapshot -> head.
    # (No restore/overwrite ops in this op set, so the invariant holds;
    # layout versions are legitimately skipped.)
    feed = read_changes(spark, table, from_version=0, skip_layout_versions=True)
    rows = feed.collect()
    state = list(model.snapshots[0])
    for v in sorted({r["_commit_version"] for r in rows}):
        gone = {
            r["k"]
            for r in rows
            if r["_commit_version"] == v
            and r["_change_type"] in ("delete", "update_preimage")
        }
        state = [t for t in state if t[0] not in gone]
        state += [
            (r["k"], r["x"])
            for r in rows
            if r["_commit_version"] == v
            and r["_change_type"] in ("insert", "update_postimage")
        ]
    assert sorted(state) == model.snapshots[-1]
