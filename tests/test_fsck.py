"""verify_integrity (fsck): the audit must pass on healthy tables under
churn/evolution, and each structural-invariant breach — lost file, wrong
bucket function (the round-2 retry-bug corruption class), stats lie,
constraint breach, tampered ledger — must be detected and located."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

from tests.test_lake import EVENT_DDL, _events


def _rows(n, start_seq=1, year=2005):
    out = []
    seq = start_seq
    for i in range(n):
        out.append(("I", seq, f"c{i:03d}", 0, "user", f"t{seq}", None,
                    f"{year}-03-{(i % 27) + 1:02d}", None))
        seq += 1
    return out


def _mk(spark, path, **kw):
    t = LakeTable(spark, path, num_buckets=8, merge_mode="mor", **kw)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def test_healthy_table_passes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(20)), batch_id=0,
                    transform=apply_chain)
    # churn: update + delete + schema evolution + a constraint
    t.apply_changes(
        _events(spark, [
            ("U", 21, "c000", 0, "user", "edit", None, "2005-03-01", None),
            ("D", 22, "c001", 0, None, None, None, None, None),
            ("I", 23, "c900", 0, "assistant", "new", "calc", "2006-01-02",
             None),
        ]),
        batch_id=1, transform=apply_chain,
    )
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    rep = t.verify_integrity()
    assert rep["ok"], rep
    assert all(c["ok"] for c in rep["checks"].values()), rep
    assert rep["checks"]["manifest_refs"]["file_sets"] > 0
    # historical snapshots audit clean too
    assert t.verify_integrity(version=1)["ok"]


def test_detects_missing_file_set(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(10)), batch_id=0,
                    transform=apply_chain)
    man = t.manifest()
    victim = next(
        fs["path"]
        for e in man["buckets"].values()
        for fs in LakeTable._bucket_files(e)
    )
    shutil.rmtree(os.path.join(t.path, victim))
    rep = t.verify_integrity()
    assert not rep["ok"]
    assert not rep["checks"]["manifest_refs"]["ok"]
    assert victim in rep["checks"]["manifest_refs"]["missing"]


def _flip_bucket_fn(table_path):
    """Simulate the round-2 retry-bug corruption: the manifest silently
    adopts xxhash64 while the data on disk was bucketed with hash32."""
    ledger = os.path.join(table_path, "_ledger")
    latest = sorted(
        f for f in os.listdir(ledger)
        if f.startswith("v") and f.endswith(".json")
    )[-1]
    p = os.path.join(ledger, latest)
    with open(p) as fh:
        man = json.load(fh)
    assert man["bucket_fn"] == "hash32"
    man["bucket_fn"] = "xxhash64"
    with open(p, "w") as fh:
        json.dump(man, fh)


def test_detects_wrong_bucket_function(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(20)), batch_id=0,
                    transform=apply_chain)
    _flip_bucket_fn(t.path)
    rt = LakeTable(spark, t.path)
    assert rt.bucket_fn == "xxhash64"  # the corruption took
    rep = rt.verify_integrity()
    assert not rep["ok"]
    bad = rep["checks"]["bucket_assignment"]
    assert not bad["ok"] and bad["misplaced_rows"] > 0
    assert bad["file_set_dirs"]  # damage is located


def test_detects_split_live_key(spark, tmp_path):
    """after the bucket-fn flip, an update to an existing key lands in the
    NEW function's bucket while the old row stays live in the old one —
    the duplicate-live-rows symptom the audit must catch."""
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(20)), batch_id=0,
                    transform=apply_chain)
    _flip_bucket_fn(t.path)
    rt = LakeTable(spark, t.path, num_buckets=8, merge_mode="mor")
    rt.apply_changes(
        _events(spark, [(("U"), 100, "c002", 0, "user", "moved", None,
                         "2005-04-01", None)]),
        batch_id=1, transform=apply_chain,
    )
    rep = rt.verify_integrity()
    assert not rep["ok"]
    # c002's hash32 and xxhash64 pmod-8 buckets differ, so the key is now
    # live twice; at minimum the misplacement itself must be flagged
    assert (rep["checks"]["unique_live_keys"]["split_keys"] > 0
            or rep["checks"]["bucket_assignment"]["misplaced_rows"] > 0)


def test_rebucket_heals_bucket_corruption(spark, tmp_path):
    """the repair path: rebucket(num_buckets) rewrites every row under
    the manifest's CURRENT bucket function, so detect -> rebucket -> clean
    audit, with no rows lost."""
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(20)), batch_id=0,
                    transform=apply_chain)
    before = sorted((r.conv_id, r.turn_idx, r.text)
                    for r in t.read().collect())
    _flip_bucket_fn(t.path)
    rt = LakeTable(spark, t.path)
    assert not rt.verify_integrity()["ok"]
    rt.rebucket(8)
    rep = rt.verify_integrity()
    assert rep["checks"]["bucket_assignment"]["ok"]
    assert rep["checks"]["unique_live_keys"]["ok"]
    assert sorted((r.conv_id, r.turn_idx, r.text)
                  for r in rt.read().collect()) == before


def test_detects_zone_map_lie(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(12)), batch_id=0,
                    transform=apply_chain)
    man = t.manifest()
    # find a stats-bearing file set and an existing key inside it
    victim = next(
        fs["path"]
        for e in man["buckets"].values()
        for fs in LakeTable._bucket_files(e)
        if (fs.get("stats") or {}).get("ts")
    )
    vdir = os.path.join(t.path, victim)
    stored = spark.read.parquet(vdir)
    probe = stored.limit(1).collect()[0]
    # smuggle a row far outside the recorded ts bounds into the file set
    # (same stored schema, same conv -> bucket placement stays valid)
    smuggled = stored.limit(1).selectExpr(
        "conv_id", "turn_idx + 999 as turn_idx", "role", "text", "tool",
        "timestamp'2055-01-01 00:00:00' as ts", "_seq + 1000 as _seq",
        "_deleted",
    ).select(*stored.columns)  # keep exact stored column order
    smuggled.write.mode("append").parquet(vdir)
    rep = t.verify_integrity()
    assert not rep["ok"]
    zm = rep["checks"]["zone_maps"]
    assert not zm["ok"]
    assert any(v["col"] == "ts" and v["path"] == victim
               for v in zm["violations"]), (zm, probe)


def test_rollback_is_not_corruption(spark, tmp_path):
    """rollback() reverts last_batch_id BY DESIGN (undone batches must
    replay); the ledger check must not flag it."""
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(5)), batch_id=0,
                    transform=apply_chain)
    t.apply_changes(_events(spark, _rows(5, start_seq=6)), batch_id=1,
                    transform=apply_chain)
    t.rollback(1)
    rep = t.verify_integrity()
    assert rep["ok"], rep["checks"]["ledger"]


def test_historical_audit_after_evolution(spark, tmp_path):
    """schema evolution AFTER the audited version is not divergence —
    the baseline is the head manifest's append-only schema list."""
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(5)), batch_id=0,
                    transform=apply_chain)
    v = t.latest_version()
    t.add_column("extra", "string")
    t.apply_changes(
        _events(spark, [("I", 50, "c900", 0, "user", "x", None,
                         "2007-01-01", None, "e")],
                ddl=EVENT_DDL + ", extra string"),
        batch_id=1, transform=apply_chain,
    )
    assert t.verify_integrity(version=v)["ok"]
    assert t.verify_integrity()["ok"]


def test_audit_survives_stats_col_rename(spark, tmp_path):
    """zone-map stats recorded under a column's old name must still be
    verified after rename_column (forward rename-log walk), and stats of
    a dropped column are skipped, not crashed on."""
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(8)), batch_id=0,
                    transform=apply_chain)
    t.rename_column("ts", "event_ts")
    rep = t.verify_integrity()
    assert rep["ok"], rep
    # the renamed stats were actually CHECKED, not skipped: smuggle an
    # out-of-bounds row in and the violation reports the canonical name
    man = t.manifest()
    victim = next(
        fs["path"] for e in man["buckets"].values()
        for fs in LakeTable._bucket_files(e)
        if (fs.get("stats") or {}).get("ts")
    )
    vdir = os.path.join(t.path, victim)
    stored = spark.read.parquet(vdir)
    stored.limit(1).selectExpr(
        "conv_id", "turn_idx + 999 as turn_idx", "role", "text", "tool",
        "timestamp'2055-01-01 00:00:00' as ts", "_seq + 1000 as _seq",
        "_deleted",
    ).select(*stored.columns).write.mode("append").parquet(vdir)
    rep2 = t.verify_integrity()
    assert any(v["col"] == "event_ts"
               for v in rep2["checks"]["zone_maps"]["violations"])


def test_detects_lost_part_file_inside_file_set(spark, tmp_path):
    """losing ONE parquet part-file inside a multi-file file-set dir must
    fail the audit via the recorded-vs-actual row-count comparison (the
    dir still exists, so the ref check alone can't see it)."""
    t = _mk(spark, str(tmp_path / "tab"), target_file_rows=5)
    t.apply_changes(_events(spark, _rows(40)), batch_id=0,
                    transform=apply_chain)
    assert t.verify_integrity()["ok"]
    man = t.manifest()
    victim = next(
        (fs["path"], fs["rows"])
        for e in man["buckets"].values()
        for fs in LakeTable._bucket_files(e)
        if fs.get("rows") and fs["rows"] > 5  # guaranteed multi-file
    )
    vdir = os.path.join(t.path, victim[0])
    part = sorted(f for f in os.listdir(vdir) if f.endswith(".parquet"))[0]
    os.remove(os.path.join(vdir, part))
    rep = t.verify_integrity()
    assert not rep["ok"]
    rc = rep["checks"]["row_counts"]
    assert not rc["ok"]
    assert any(m["path"] == victim[0] and m["actual"] < m["recorded"]
               for m in rc["mismatches"])


def test_audit_clean_on_non_utc_driver(spark, tmp_path):
    """collect() materializes timestamps as naive datetimes in the
    DRIVER-LOCAL tz (TimestampType.fromInternal) while recorded stats
    are UTC epochs — a non-UTC driver must not produce phantom zone-map
    violations. (Session tz is irrelevant here: collect() doesn't use
    it.)"""
    import time

    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(8)), batch_id=0,
                    transform=apply_chain)
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/Chicago"
    time.tzset()
    try:
        rep = t.verify_integrity()
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()
    assert rep["checks"]["zone_maps"]["ok"], rep["checks"]["zone_maps"]


def test_detects_constraint_breach(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(10)), batch_id=0,
                    transform=apply_chain)
    # force an unvalidated constraint the existing rows violate
    t.add_constraint("role_is_bot", "role = 'assistant'", validate=False)
    rep = t.verify_integrity()
    assert not rep["ok"]
    assert rep["checks"]["constraints"]["violations"]["role_is_bot"] == 10


def test_detects_ledger_tamper(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(5)), batch_id=0,
                    transform=apply_chain)
    t.apply_changes(_events(spark, _rows(5, start_seq=6)), batch_id=1,
                    transform=apply_chain)
    ledger = os.path.join(t.path, "_ledger")
    first = sorted(
        f for f in os.listdir(ledger)
        if f.startswith("v") and f.endswith(".json")
    )[0]
    p = os.path.join(ledger, first)
    with open(p) as fh:
        man = json.load(fh)
    man["last_batch_id"] = 99  # later versions now regress
    with open(p, "w") as fh:
        json.dump(man, fh)
    rep = t.verify_integrity()
    assert not rep["ok"]
    assert any("last_batch_id regressed" in i
               for i in rep["checks"]["ledger"]["issues"])


def test_detects_lost_change_feed_file(spark, tmp_path):
    """after compaction, a version's delta dir may survive ONLY as a cdf
    (change-feed) ref — losing it is invisible to the head-manifest
    checks but breaks changes() for every range crossing that version."""
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(6)), batch_id=0,
                    transform=apply_chain)
    t.apply_changes(_events(spark, _rows(6, start_seq=7)), batch_id=1,
                    transform=apply_chain)
    t.compact()  # bucket refs now point at compacted bases only
    assert t.verify_integrity()["ok"]
    ledger = os.path.join(t.path, "_ledger")
    v1 = json.load(open(os.path.join(
        ledger, sorted(f for f in os.listdir(ledger)
                       if f.startswith("v") and f.endswith(".json"))[1])))
    victim = v1["cdf"][0]["path"]
    # the dir must no longer be referenced by the head manifest's buckets
    head_refs = {
        fs["path"]
        for e in t.manifest()["buckets"].values()
        for fs in LakeTable._bucket_files(e)
    }
    assert victim not in head_refs
    shutil.rmtree(os.path.join(t.path, victim))
    rep = t.verify_integrity()
    assert not rep["ok"]
    cf = rep["checks"]["change_feed"]
    assert not cf["ok"] and any(victim in m for m in cf["missing"])


def test_refuses_branch_handle(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tab"))
    t.apply_changes(_events(spark, _rows(3)), batch_id=0,
                    transform=apply_chain)
    t.create_branch("audit")
    b = LakeTable(spark, t.path, num_buckets=8, merge_mode="mor",
                  branch="audit")
    with pytest.raises(AssertionError, match="main-opened"):
        b.verify_integrity()
