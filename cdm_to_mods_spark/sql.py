"""SQL statement front-end over lake tables — the Delta/Iceberg
SQL-extension analog (``spark.sql("MERGE INTO ...")``,
``DESCRIBE HISTORY``, ``OPTIMIZE``, ``VACUUM``) re-founded on this
engine's table APIs.

The reference drives every mutation imperatively (a Python loop calling
lxml/XSLT per record, ``convert_cdm_to_mods.py:37-74``); an engine a user
can *switch to* needs the declarative surface their existing jobs speak:
SQL DDL/DML. Spark's parser cannot be extended from Python (Delta/Iceberg
inject Scala parser extensions), so :class:`LakeCatalog` fronts a
statement router: a fixed, documented grammar is recognized here and
routed to the table APIs (``merge_into``, ``delete_where``,
``update_where``, ``rollback``, ``compact``/``maintain``,
``expire_snapshots``, ALTER/property/constraint methods); everything
SELECT-shaped is delegated to ``spark.sql`` verbatim after the catalog
registers each referenced lake table's CURRENT state as a temp view —
including Delta-style time travel (``VERSION AS OF`` / ``TIMESTAMP AS
OF`` rewritten to snapshot views before delegation).

Supported statements (case-insensitive keywords; one statement per call):

- ``CREATE TABLE [IF NOT EXISTS] t (col type, ...) USING lake
  LOCATION '/path' [OPTIONS (k 'v', ...)] [TBLPROPERTIES (k 'v', ...)]``
  — OPTIONS map to :class:`~cdm_to_mods_spark.plans.lake.LakeTable`
  constructor args (``key_cols`` comma-joined, ``num_buckets``,
  ``merge_mode``, ``partition_by`` = time granularity → a
  :class:`~cdm_to_mods_spark.plans.partitioned.PartitionedTable`, ...).
- ``DROP TABLE t`` — catalog unregister; data stays (external-table rule).
- ``SHOW TABLES`` / ``DESCRIBE [HISTORY | DETAIL] t``
- ``ALTER TABLE t ADD COLUMN c type | DROP COLUMN c |
  RENAME COLUMN a TO b | SET TBLPROPERTIES (...) |
  UNSET TBLPROPERTIES (...) | ADD CONSTRAINT n CHECK (expr) |
  DROP CONSTRAINT n``
- ``OPTIMIZE t`` — policy-driven maintenance
  (:func:`~cdm_to_mods_spark.plans.maintenance.maintain`).
- ``VACUUM t [RETAIN n SNAPSHOTS]`` — ``expire_snapshots(keep_last=n)``.
- ``RESTORE TABLE t TO VERSION AS OF v`` — ``rollback(v)``.
- ``DELETE FROM t WHERE pred`` / ``TRUNCATE TABLE t``
- ``UPDATE t SET c = expr, ... WHERE pred``
- ``INSERT INTO t [(cols)] VALUES (...), ... | <select>`` — keyed
  insert: rows become 'I' change events at the next sequence number, so
  inserting an existing key is an upsert (last-write-wins), never a
  duplicate — the keyed-table INSERT rule, documented divergence from
  Delta's append-duplicates.
- ``MERGE INTO t [AS a] USING src|(<select>) [AS b] ON <key equality>
  [WHEN MATCHED [AND c] THEN UPDATE SET ...|DELETE]
  [WHEN NOT MATCHED [AND c] THEN INSERT *|(cols) VALUES (exprs)]`` —
  the ON clause must be exactly the table's key-column equality (the
  engine merges by key; any other join shape is refused with the key
  list in the error).
- anything starting with SELECT / WITH / VALUES — delegated to
  ``spark.sql``; ``EXPLAIN [mode] <select>`` delegates the plan dump the
  same way.
- ``CREATE [OR REPLACE] VIEW v AS <select>`` / ``DROP VIEW v`` /
  ``SHOW VIEWS`` — stored SQL, re-expanded per query (views over views
  work; cycles and broken bodies refused at CREATE).
- ``CREATE MATERIALIZED VIEW mv LOCATION '/p' AS SELECT <groups +
  count(*)/sum(expr) AS name...> FROM t GROUP BY <cols>`` — NOTE the
  retractable-sum semantics: NULL contributions count as 0 (an
  all-NULL group shows 0, where SQL SUM shows NULL) and sums are
  double-typed (exactness bounded by 2^53); both are what additive
  retraction requires. /
  ``REFRESH MATERIALIZED VIEW mv`` / ``DROP MATERIALIZED VIEW mv`` —
  an incrementally-maintained aggregate
  (:class:`~cdm_to_mods_spark.plans.incremental.GenericAdditiveView`):
  O(changed rows) retract-stream refresh over ``changelog="lookup"``
  sources, reseed-full fallback elsewhere; non-additive aggregates
  refused with the reason.
- ``SHOW PARTITIONS t`` / ``SHOW CREATE TABLE t`` (the emitted DDL
  re-parses through this router).
- CDC TVFs in any SELECT: ``table_changes('t', since[, until])`` (the
  change feed) and ``row_changes('t', since[, until])`` (the typed
  changelog) — rewritten to temp views before delegation.
- Curation TVFs in any SELECT (round 5 — the training-data pipeline
  from SQL): ``dedup_exact('t')``, ``dedup_minhash_pairs('t')``,
  ``dedup_clusters('t')``, ``decontaminate('train'[, 'bench'][, n])``
  over any registered relation with (doc_id, text) columns.
- ``COPY INTO t FROM '/dir' [FILEFORMAT = fmt] [BATCH_ID = n]`` —
  loads a change-event directory through the MERGE path; BATCH_ID is
  the exactly-once token (re-running a committed id is a skip).
- Ref admin: ``ALTER TABLE t CREATE|PUBLISH|DROP BRANCH b``,
  ``ALTER TABLE t CREATE TAG n [AS OF VERSION v] | DROP TAG n``,
  ``SHOW BRANCHES|TAGS t`` — the write-audit-publish flow from SQL;
  tags resolve in ``VERSION AS OF 'tag'``.
- ``BEGIN [TRANSACTION]`` / ``COMMIT`` / ``ROLLBACK`` — available when
  the catalog is constructed over a
  :class:`~cdm_to_mods_spark.plans.txn.TableGroup`: member DML between
  BEGIN and COMMIT stages on transaction branches and becomes visible
  atomically (one group cut) at COMMIT; SELECT inside the transaction
  reads the staged state of staged members (read-your-writes); DDL and
  maintenance on members are refused until the transaction closes.

DML statements return a ONE-ROW DataFrame of the operation's metrics
(the Delta convention of ``num_affected_rows``-style results), so every
``sql()`` call uniformly returns a DataFrame.
"""

from __future__ import annotations

import json
import os
import re
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .plans.lake import LakeTable
from .plans.maintenance import maintain
from .plans.partitioned import PartitionedTable


class LakeSqlError(ValueError):
    """A statement the router recognizes but cannot execute, or one it
    does not recognize at all. The message always names the supported
    grammar so a failing statement is actionable."""


_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote nesting depth 0 (SQL expression
    lists contain commas inside function calls and string literals)."""
    out, depth, buf, i, n = [], 0, [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            q = ch
            buf.append(ch)
            i += 1
            while i < n:
                buf.append(s[i])
                if s[i] == "\\" and i + 1 < n:
                    # Spark SQL also accepts backslash escapes ('it\'s')
                    buf.append(s[i + 1])
                    i += 2
                    continue
                if s[i] == q:
                    # SQL escapes a quote by doubling it
                    if i + 1 < n and s[i + 1] == q:
                        buf.append(s[i + 1])
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _find_top_keyword(s: str, kw: str) -> int:
    """Index of the first word-bounded, case-insensitive occurrence of
    ``kw`` at paren/quote nesting depth 0, or -1 — the structural
    keyword locator (a bare regex split would match the keyword inside
    a string literal: ``SET text = 'no where here' WHERE ...``)."""
    pat = re.compile(rf"\b{kw}\b", re.I)
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            q = ch
            i += 1
            while i < n:
                if s[i] == "\\" and i + 1 < n:
                    i += 2
                    continue
                if s[i] == q:
                    if i + 1 < n and s[i + 1] == q:
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and pat.match(s, i):
            return i
        i += 1
    return -1


def _parse_kv_list(body: str) -> dict:
    """``k 'v', k2 = 'v2', k3 'v3'`` → dict (OPTIONS/TBLPROPERTIES body)."""
    out = {}
    for item in _split_top(body):
        m = re.match(
            rf"^['\"]?({_IDENT}(?:\.{_IDENT})*)['\"]?\s*=?\s*'((?:[^']|'')*)'$",
            item.strip(),
        )
        if not m:
            raise LakeSqlError(
                f"cannot parse option {item!r}: expected key 'value' or "
                "key = 'value'"
            )
        # '' is the escape for a literal apostrophe (matches the emit side
        # of SHOW CREATE TABLE, keeping emitted DDL re-parseable)
        out[m.group(1)] = m.group(2).replace("''", "'")
    return out


def _schema_from_ddl(cols_ddl: str) -> T.StructType:
    try:
        return T.StructType.fromDDL(cols_ddl)
    except AttributeError:  # older pyspark
        return T._parse_datatype_string(cols_ddl)


def _metrics_df(spark: SparkSession, metrics: dict) -> DataFrame:
    """One-row result frame; nested values JSON-stringified so the schema
    stays flat and stable."""
    flat = {
        k: (v if isinstance(v, (int, float, str, bool)) or v is None
            else json.dumps(v, default=str))
        for k, v in sorted(metrics.items())
    }
    fields, row = [], []
    for k, v in flat.items():
        if isinstance(v, bool):
            t = T.BooleanType()
        elif isinstance(v, int):
            t = T.LongType()
        elif isinstance(v, float):
            t = T.DoubleType()
        else:
            t = T.StringType()
        fields.append(T.StructField(k, t, True))
        row.append(v)
    return spark.createDataFrame([tuple(row)], T.StructType(fields))


# Constructor args an OPTIONS clause may set, with coercions.
_LAKE_OPTS = {
    "key_cols": lambda v: tuple(c.strip() for c in v.split(",")),
    "bucket_col": str,
    "num_buckets": int,
    "merge_mode": str,
    "compact_deltas": int,
    "cow_change_feed": lambda v: v.lower() == "true",
    "quarantine_path": str,
    "bucket_fn": str,
    "stats_cols": lambda v: tuple(c.strip() for c in v.split(",")),
    "schema_mode": str,
    "target_file_rows": int,
    "bloom_cols": lambda v: tuple(c.strip() for c in v.split(",")),
    "merge_engine": str,
    "agg_spec": json.loads,
    "changelog": str,
}
_PARTITIONED_OPTS = {
    "partition_col": str,
    "granularity": str,
    "stage_threshold": int,
    "apply_concurrency": int,
    "cross_partition_upsert": lambda v: v.lower() == "true",
    "index_buckets": int,
}


class LakeCatalog:
    """Name → lake-table registry plus the SQL statement router.

    The catalog is session-scoped metadata only (like a Hive metastore
    client): tables are *external* — ``register``/``DROP TABLE`` bind and
    unbind names, never touch data. Handles are duck-typed, so flat
    :class:`LakeTable` and composite :class:`PartitionedTable` both work;
    a statement needing an API the handle lacks fails with a typed error
    naming the gap.
    """

    def __init__(self, spark: SparkSession, group=None):
        """``group``: an optional :class:`~cdm_to_mods_spark.plans.txn
        .TableGroup` — its members are auto-registered, and the catalog
        gains SQL transactions: ``BEGIN [TRANSACTION]`` stages subsequent
        member DML on transaction branches, ``COMMIT`` publishes them
        atomically (group cut), ``ROLLBACK`` discards them. While a
        transaction is open, SELECT sees the staged state of staged
        members (read-your-writes) and DDL/maintenance statements on
        members are refused (branch handles cannot run them)."""
        self.spark = spark
        self._tables: dict[str, object] = {}
        self._views: dict[str, str] = {}
        self._mviews: dict[str, object] = {}
        self._group = group
        self._txn = None
        if group is not None:
            for name in group.members():
                self.register(name, group.table(name))

    # -------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        """Persist the catalog definition (member paths + view SQL) so a
        ``spark-submit`` job can :meth:`load` the same names — the
        metastore-file role. Tables are stored by PATH; reopening adopts
        each table's on-disk layout, so no constructor args are kept."""
        from .plans.txn import member_strategy

        payload = {
            "format_version": 1,
            "tables": {n: t.path for n, t in sorted(self._tables.items())},
            "strategy": {
                n: member_strategy(t)
                for n, t in sorted(self._tables.items())
            },
            "views": dict(sorted(self._views.items())),
            "materialized_views": {
                n: {
                    "path": v.path,
                    "source": self._mview_source_name(n, v),
                    **v.definition(),
                }
                for n, v in sorted(self._mviews.items())
            },
            "group": self._group.path if self._group is not None else None,
        }
        tmp = f"{path}.tmp-{uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)

    def _mview_source_name(self, name: str, view) -> str:
        for tn, t in self._tables.items():
            if t is view.source or t.path == view.source.path:
                return tn
        raise LakeSqlError(
            f"materialized view {name!r} depends on an unregistered "
            f"source table ({view.source.path}); re-register it before "
            "save()"
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeCatalog":
        with open(path) as fh:
            payload = json.load(fh)
        group = None
        if payload.get("group"):
            from .plans.txn import TableGroup

            group = TableGroup(spark, payload["group"])
        cat = cls(spark, group=group)
        from .plans.txn import _open_member

        for name, tpath in payload["tables"].items():
            if name not in cat._tables:  # group members already bound
                cat.register(name, _open_member(
                    spark, tpath,
                    strategy=payload.get("strategy", {}).get(name),
                ))
        cat._views.update(payload.get("views", {}))
        from .plans.incremental import GenericAdditiveView

        for name, mv in payload.get("materialized_views", {}).items():
            cat._mviews[name] = GenericAdditiveView(
                spark, cat.table(mv["source"]), mv["path"],
                mv["group_cols"], [tuple(a) for a in mv["aggs"]],
            )
        return cat

    # ------------------------------------------------------------ registry
    def _assert_unbound(self, name: str, *, allow_table: bool = False) -> None:
        """One name — one object: a collision would make _prepare's
        temp-view registrations silently shadow each other."""
        if name in self._tables and not allow_table:
            raise LakeSqlError(f"{name!r} is a registered table")
        if name in self._views:
            raise LakeSqlError(f"{name!r} is a stored view")
        if name in self._mviews:
            raise LakeSqlError(f"{name!r} is a materialized view")

    def register(self, name: str, table) -> None:
        if not re.fullmatch(_IDENT, name):
            raise LakeSqlError(f"invalid table name {name!r}")
        # re-registering a TABLE name rebinds it (idempotent loads);
        # stealing a view/mview name is refused
        self._assert_unbound(name, allow_table=True)
        if isinstance(table, str):
            # kind-detecting open (a _spec.json path is a partitioned
            # table). Write STRATEGY is not on disk — a path-registered
            # handle writes with constructor defaults; register the
            # owner's handle (or load() a saved catalog) to keep its
            # merge_mode/compact_deltas choices.
            from .plans.txn import _open_member

            table = _open_member(self.spark, table)
        self._tables[name] = table

    def table(self, name: str, for_write: bool = False):
        try:
            t = self._tables[name]
        except KeyError:
            raise LakeSqlError(
                f"table {name!r} is not registered; known tables: "
                f"{sorted(self._tables)}"
            ) from None
        if self._txn is not None:
            if name in self._group_members():
                if for_write:
                    # first write stages the member on the txn branch
                    return self._txn.table(name)
                staged = self._txn._branch_handles.get(name)
                if staged is not None:  # read-your-writes for staged members
                    return staged
            elif for_write:
                # a write to a NON-member inside BEGIN..COMMIT would land
                # straight on main and silently survive ROLLBACK — refuse
                # rather than break the all-or-nothing expectation
                raise LakeSqlError(
                    f"table {name!r} is not a member of the transaction "
                    "group; writing it inside an open transaction would "
                    "not be staged (it would survive ROLLBACK) — COMMIT/"
                    "ROLLBACK first, or add the table to the group"
                )
        return t

    def _group_members(self) -> set:
        return set(self._group.members()) if self._group is not None else set()

    def _refuse_in_txn(self, name: str, op: str) -> None:
        if self._txn is not None and name in self._group_members():
            raise LakeSqlError(
                f"{op} on group member {name!r} inside an open transaction"
                " — COMMIT or ROLLBACK first (DDL and maintenance do not"
                " stage on branches)"
            )

    def tables(self) -> list[str]:
        return sorted(self._tables)

    # ----------------------------------------------------------- dispatch
    def sql(self, statement: str) -> DataFrame:
        stmt = statement.strip().rstrip(";").strip()
        head = stmt.split(None, 2)
        kw = (head[0].upper() if head else "")
        kw2 = (head[1].upper() if len(head) > 1 else "")
        if kw in ("SELECT", "WITH", "VALUES"):
            return self._select(stmt)
        if kw == "EXPLAIN":
            return self._explain(stmt)
        if kw == "SHOW" and kw2 == "CREATE":
            return self._show_create(stmt)
        if kw in ("BEGIN", "START"):
            return self._begin()
        if kw == "COMMIT":
            return self._commit_txn()
        if kw == "ROLLBACK":
            return self._rollback_txn()
        if kw == "CREATE" and kw2 == "TABLE":
            return self._create_table(stmt)
        if kw == "CREATE" and kw2 in ("VIEW", "OR"):
            return self._create_view(stmt)
        if kw == "CREATE" and kw2 == "MATERIALIZED":
            return self._create_mview(stmt)
        if kw == "REFRESH":
            return self._refresh_mview(stmt)
        if kw == "DROP" and kw2 == "MATERIALIZED":
            return self._drop_mview(stmt)
        if kw == "DROP" and kw2 == "TABLE":
            return self._drop_table(stmt)
        if kw == "DROP" and kw2 == "VIEW":
            return self._drop_view(stmt)
        if kw == "SHOW" and kw2 == "TABLES":
            return self.spark.createDataFrame(
                [(n,) for n in self.tables()], "tableName string"
            )
        if kw == "SHOW" and kw2 == "VIEWS":
            return self.spark.createDataFrame(
                [(n, s) for n, s in sorted(self._views.items())],
                "viewName string, definition string",
            )
        if kw == "SHOW" and kw2 == "PARTITIONS":
            return self._show_partitions(stmt)
        if kw == "SHOW" and kw2 in ("BRANCHES", "TAGS"):
            return self._show_refs(stmt)
        if kw == "SHOW" and kw2 == "TBLPROPERTIES":
            m = re.match(rf"SHOW\s+TBLPROPERTIES\s+({_IDENT})$", stmt, re.I)
            if not m:
                raise LakeSqlError("shape: SHOW TBLPROPERTIES t")
            props = self.table(m.group(1)).properties()
            return self.spark.createDataFrame(
                sorted(props.items()), "key string, value string"
            )
        if kw == "DESCRIBE" or kw == "DESC":
            return self._describe(stmt)
        if kw == "ALTER" and kw2 == "TABLE":
            return self._alter(stmt)
        if kw == "OPTIMIZE":
            return self._optimize(stmt)
        if kw == "VACUUM":
            return self._vacuum(stmt)
        if kw == "RESTORE":
            return self._restore(stmt)
        if kw == "DELETE":
            return self._delete(stmt)
        if kw == "TRUNCATE":
            return self._truncate(stmt)
        if kw == "UPDATE":
            return self._update(stmt)
        if kw == "INSERT":
            return self._insert(stmt)
        if kw == "COPY":
            return self._copy_into(stmt)
        if kw == "MERGE":
            return self._merge(stmt)
        raise LakeSqlError(
            f"unsupported statement {kw} {kw2}: the router handles "
            "SELECT/WITH/VALUES, CREATE/DROP TABLE, SHOW TABLES, "
            "DESCRIBE [HISTORY|DETAIL], ALTER TABLE, OPTIMIZE, VACUUM, "
            "RESTORE, DELETE, TRUNCATE, UPDATE, INSERT, MERGE INTO "
            "(see cdm_to_mods_spark/sql.py docstring for shapes)"
        )

    # ------------------------------------------------------- transactions
    def _begin(self) -> DataFrame:
        if self._group is None:
            raise LakeSqlError(
                "BEGIN needs a catalog constructed over a TableGroup "
                "(LakeCatalog(spark, group=...)); standalone tables have "
                "no cross-table commit point"
            )
        if self._txn is not None:
            raise LakeSqlError(
                f"transaction {self._txn.txn_id} is already open — "
                "COMMIT or ROLLBACK it first (no nesting)"
            )
        self._txn = self._group.transaction()
        return _metrics_df(self.spark, {"txn_id": self._txn.txn_id,
                                        "state": "open"})

    def _commit_txn(self) -> DataFrame:
        if self._txn is None:
            raise LakeSqlError("COMMIT outside a transaction")
        # the catalog session leaves the transaction either way (a
        # conflict abort already rolled the branches back)
        txn, self._txn = self._txn, None
        out = txn.commit()
        return _metrics_df(self.spark, {
            "txn_id": out["txn_id"],
            "staged_tables": out.get("staged_tables", []),
            "version": out.get("version"),
            "state": "committed",
        })

    def _rollback_txn(self) -> DataFrame:
        if self._txn is None:
            raise LakeSqlError("ROLLBACK outside a transaction")
        txn, self._txn = self._txn, None
        out = txn.rollback()
        return _metrics_df(self.spark, {"txn_id": out["txn_id"],
                                        "state": "rolled_back"})

    # ------------------------------------------------------------- SELECT
    def _referenced(self, stmt: str) -> list[str]:
        toks = set(re.findall(_IDENT, stmt))
        return [n for n in self._tables if n in toks]

    def _select(self, stmt: str) -> DataFrame:
        return self.spark.sql(self._prepare(stmt))

    def _prepare(self, stmt: str) -> str:
        """Register every referenced table head / snapshot / stored view
        as a temp view and return the statement with time-travel suffixes
        rewritten — the part of SELECT delegation that EXPLAIN shares."""
        # Delta-style time travel: rewrite `t VERSION AS OF 3` /
        # `t TIMESTAMP AS OF '...'` to a snapshot temp view BEFORE
        # delegation (Spark's parser would reject the suffix).
        for name in self._referenced(stmt):
            pat = re.compile(
                rf"\b{name}\s+VERSION\s+AS\s+OF\s+(\d+)", re.I
            )
            for m in set(pat.findall(stmt)):
                v = int(m)
                view = f"{name}__v{v}"
                self.table(name).read(version=v).createOrReplaceTempView(view)
                stmt = re.sub(
                    rf"\b{name}\s+VERSION\s+AS\s+OF\s+{m}\b", view, stmt,
                    flags=re.I,
                )
            # Iceberg-style tag ref: VERSION AS OF 'tag_name'
            gpat = re.compile(
                rf"\b{name}\s+VERSION\s+AS\s+OF\s+'([^']+)'", re.I
            )
            for m in set(gpat.findall(stmt)):
                t = self.table(name)
                v = t.tag_version(m)
                view = f"{name}__v{v}"
                t.read(version=v).createOrReplaceTempView(view)
                stmt = re.sub(
                    rf"\b{name}\s+VERSION\s+AS\s+OF\s+'{re.escape(m)}'",
                    view, stmt, flags=re.I,
                )
            tpat = re.compile(
                rf"\b{name}\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", re.I
            )
            for m in set(tpat.findall(stmt)):
                t = self.table(name)
                v = t.version_as_of(_coerce_ts(m))
                view = f"{name}__v{v}"
                t.read(version=v).createOrReplaceTempView(view)
                stmt = re.sub(
                    rf"\b{name}\s+TIMESTAMP\s+AS\s+OF\s+'{re.escape(m)}'",
                    view, stmt, flags=re.I,
                )
        # current heads for every (remaining) referenced table: a temp
        # view over table.read() is a lazy logical plan — zero I/O until
        # the delegated query executes, and each call re-registers so the
        # view can never serve a stale snapshot.
        for name in self._referenced(stmt):
            self.table(name).read().createOrReplaceTempView(name)
        # stored views expand recursively (a view over a view works);
        # each expansion re-resolves its own table references, so views
        # track table heads too
        toks = set(re.findall(_IDENT, stmt))
        # materialized views serve their STORED state (refresh to
        # advance) — registered BEFORE stored views expand, so a view
        # over an mview binds this query's fresh state, not whatever
        # temp view an earlier query left behind
        for mname in [m for m in self._mviews if m in toks]:
            self._mviews[mname].read().createOrReplaceTempView(mname)
        for vname in [v for v in self._views if v in toks]:
            self._expand_view(vname, stack=())
        # Delta-style CDC TVFs: table_changes('t', since[, until]) — the
        # change feed; row_changes('t', since[, until]) — the typed
        # changelog with _change_type pre/post-images
        for fn, meth in (("table_changes", "changes"),
                         ("row_changes", "row_changes")):
            tv = re.compile(
                rf"\b{fn}\s*\(\s*'({_IDENT})'\s*,\s*(\d+)"
                rf"(?:\s*,\s*(\d+))?\s*\)",
                re.I,
            )
            for m in list(tv.finditer(stmt)):
                name, since, until = m.group(1), int(m.group(2)), m.group(3)
                t = self.table(name)
                df = getattr(t, meth)(
                    since, int(until) if until else None
                )
                view = f"{name}__{fn}_{since}_{until or 'head'}"
                df.createOrReplaceTempView(view)
                stmt = stmt.replace(m.group(0), view)
        stmt = self._rewrite_curation_tvfs(stmt)
        return stmt

    # ------------------------------------------------- curation TVFs
    def _relation(self, name: str) -> DataFrame:
        """Resolve a TVF argument to a DataFrame: registered lake table
        (head state), materialized view (stored state), stored view
        (expanded), or any live temp view — the same binding order the
        statement rewriter uses for FROM references."""
        if name in self._tables:
            return self.table(name).read()
        if name in self._mviews:
            return self._mviews[name].read()
        if name in self._views:
            self._expand_view(name, stack=())
            return self.spark.table(name)
        try:
            return self.spark.table(name)
        except Exception:
            raise LakeSqlError(f"unknown relation {name!r}")

    def _rewrite_curation_tvfs(self, stmt: str) -> str:
        """Training-data curation ops as table-valued functions (round 5)
        — the pipeline surface drivable from ``run_sql.py`` like the CDC
        TVFs above. All take relation-NAME string arguments with
        (doc_id, text) columns:

        * ``dedup_exact('t')`` → pipeline d1 (content-hash groups)
        * ``dedup_minhash_pairs('t')`` → d3 (MinHash+LSH candidates,
          exact-verified Jaccard ≥ 0.6 pairs)
        * ``dedup_clusters('t')`` → d6 (near-dup connected components,
          canonical keeper per cluster)
        * ``decontaminate('train', 'bench'[, n])`` → d7 with an explicit
          benchmark relation (n = word-gram length, default 8);
          single-argument form uses d7's deterministic hash split
        """
        from .pipeline import (
            d1_exact_dedup_df,
            d3_minhash_lsh_pairs_df,
            d6_dedup_clusters_df,
            d7_decontaminate_df,
        )

        one_arg = {
            "dedup_exact": d1_exact_dedup_df,
            "dedup_minhash_pairs": d3_minhash_lsh_pairs_df,
            "dedup_clusters": d6_dedup_clusters_df,
        }
        pat = re.compile(
            rf"\b(dedup_exact|dedup_minhash_pairs|dedup_clusters)"
            rf"\s*\(\s*'({_IDENT})'\s*\)",
            re.I,
        )
        for m in list(pat.finditer(stmt)):
            fn, name = m.group(1).lower(), m.group(2)
            df = one_arg[fn](self._relation(name))
            view = f"{name}__{fn}"
            df.createOrReplaceTempView(view)
            stmt = stmt.replace(m.group(0), view)
        dpat = re.compile(
            rf"\bdecontaminate\s*\(\s*'({_IDENT})'"
            rf"(?:\s*,\s*'({_IDENT})')?(?:\s*,\s*(\d+))?\s*\)",
            re.I,
        )
        for m in list(dpat.finditer(stmt)):
            train, bench, n = m.group(1), m.group(2), m.group(3)
            df = d7_decontaminate_df(
                self._relation(train),
                self._relation(bench) if bench else None,
                n=int(n) if n else 8,
            )
            view = f"{train}__decontaminate_{bench or 'split'}_{n or 8}"
            df.createOrReplaceTempView(view)
            stmt = stmt.replace(m.group(0), view)
        return stmt

    def _expand_view(self, name: str, stack: tuple) -> None:
        if name in stack:
            raise LakeSqlError(
                f"view cycle: {' -> '.join((*stack, name))}"
            )
        body = self._views[name]
        toks = set(re.findall(_IDENT, body))
        for tname in [t for t in self._tables if t in toks]:
            self.table(tname).read().createOrReplaceTempView(tname)
        for mname in [m for m in self._mviews if m in toks]:
            self._mviews[mname].read().createOrReplaceTempView(mname)
        # self-skip is deliberate: token matching cannot tell a column
        # named like the view from a true self-reference ('SELECT revenue
        # FROM orders' inside view `revenue` must NOT recurse). Direct
        # self-reference is refused at CREATE time instead (the
        # validation drops the temp view first — see _create_view).
        for vname in [v for v in self._views if v in toks and v != name]:
            self._expand_view(vname, stack=(*stack, name))
        self.spark.sql(body).createOrReplaceTempView(name)

    # ---------------------------------------------------------------- DDL
    def _create_table(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?({_IDENT})\s*"
            rf"\((.*)\)\s*USING\s+lake\s+LOCATION\s+'((?:[^']|'')+)'\s*(.*)$",
            stmt, re.I | re.S,
        )
        if not m:
            raise LakeSqlError(
                "CREATE TABLE shape: CREATE TABLE [IF NOT EXISTS] name "
                "(col type, ...) USING lake LOCATION '/path' "
                "[OPTIONS (...)] [TBLPROPERTIES (...)]"
            )
        if_not_exists, name, cols_ddl, location, tail = m.groups()
        location = location.replace("''", "'")
        if name in self._views or name in self._mviews:
            self._assert_unbound(name, allow_table=True)
        if name in self._tables:
            if if_not_exists:
                return _metrics_df(self.spark, {"table": name,
                                                "created": False})
            raise LakeSqlError(f"table {name!r} already registered")
        opts, props = {}, {}
        om = re.search(r"OPTIONS\s*\((.*?)\)\s*(?:TBLPROPERTIES|$)",
                       tail, re.I | re.S)
        if om:
            opts = _parse_kv_list(om.group(1))
        pm = re.search(r"TBLPROPERTIES\s*\((.*)\)\s*$", tail, re.I | re.S)
        if pm:
            props = _parse_kv_list(pm.group(1))
        schema = _schema_from_ddl(cols_ddl)
        kwargs, pkwargs = {}, {}
        # pop unconditionally: short-circuiting past the pop would leave
        # 'partitioned' in opts and trip the unknown-OPTION check below
        partitioned_flag = opts.pop("partitioned", "").lower() == "true"
        partitioned = ("partition_col" in opts or "granularity" in opts
                       or partitioned_flag)
        for k, v in opts.items():
            if k in _PARTITIONED_OPTS:
                pkwargs[k] = _PARTITIONED_OPTS[k](v)
                partitioned = True
            elif k in _LAKE_OPTS:
                kwargs[k] = _LAKE_OPTS[k](v)
            else:
                raise LakeSqlError(
                    f"unknown OPTION {k!r}; lake options: "
                    f"{sorted(_LAKE_OPTS)}; partitioned options: "
                    f"{sorted(_PARTITIONED_OPTS)}"
                )
        if partitioned:
            key_cols = kwargs.pop("key_cols", ("conv_id", "turn_idx"))
            t = PartitionedTable(self.spark, location, key_cols,
                                 **pkwargs, **kwargs)
        else:
            t = LakeTable(self.spark, location, **kwargs)
        if not t.exists():
            t.create(schema)
        for k, v in props.items():
            t.set_property(k, v)
        self._tables[name] = t
        return _metrics_df(self.spark, {"table": name, "created": True,
                                        "location": location})

    def _drop_table(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?({_IDENT})$", stmt, re.I
        )
        if not m:
            raise LakeSqlError("DROP TABLE shape: DROP TABLE [IF EXISTS] t")
        if_exists, name = m.groups()
        if name not in self._tables:
            if if_exists:
                return _metrics_df(self.spark, {"table": name,
                                                "dropped": False})
            raise LakeSqlError(f"table {name!r} is not registered")
        dependents = [
            mn for mn, mv in self._mviews.items()
            if mv.source is self._tables[name]
            or mv.source.path == self._tables[name].path
        ]
        if dependents:
            raise LakeSqlError(
                f"table {name!r} is the source of materialized view(s) "
                f"{dependents}; DROP MATERIALIZED VIEW them first"
            )
        # external-table rule: unbind the name, keep the data. A real
        # delete is expire_snapshots + filesystem removal, deliberately
        # not reachable from one SQL string.
        del self._tables[name]
        self.spark.catalog.dropTempView(name)
        return _metrics_df(self.spark, {"table": name, "dropped": True})

    def _create_view(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+({_IDENT})\s+AS\s+(.*)$",
            stmt, re.I | re.S,
        )
        if not m:
            raise LakeSqlError(
                "CREATE VIEW shape: CREATE [OR REPLACE] VIEW v AS <select>"
            )
        replace, name, body = m.groups()
        body = body.strip()
        if not re.match(r"(SELECT|WITH|VALUES)\b", body, re.I):
            raise LakeSqlError("view body must be a SELECT/WITH/VALUES")
        if name in self._tables:
            raise LakeSqlError(f"{name!r} is a registered table")
        if name in self._mviews:
            raise LakeSqlError(f"{name!r} is a materialized view")
        if name in self._views and not replace:
            raise LakeSqlError(
                f"view {name!r} already exists (CREATE OR REPLACE VIEW)"
            )
        # validate eagerly: a broken body should fail at CREATE, not at
        # first use
        self._expand_view_body_check(name, body)
        self._views[name] = body
        return _metrics_df(self.spark, {"view": name, "created": True})

    def _expand_view_body_check(self, name: str, body: str) -> None:
        prev = self._views.get(name)
        self._views[name] = body
        # drop any previous registration so a self-referential body
        # (CREATE OR REPLACE VIEW v AS ... FROM v) cannot silently
        # validate against its own prior expansion — it fails resolution
        # instead, converted to a typed error below
        self.spark.catalog.dropTempView(name)
        try:
            self._expand_view(name, stack=())
        except Exception as e:
            if prev is None:
                del self._views[name]
            else:
                self._views[name] = prev
            if (f"`{name}`" in str(e)
                    and "TABLE_OR_VIEW_NOT_FOUND" in str(e)):
                raise LakeSqlError(
                    f"view {name!r} references itself (a view cannot be "
                    "defined over its own previous state)"
                ) from e
            raise

    def _create_mview(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"CREATE\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+"
            rf"LOCATION\s+'((?:[^']|'')+)'\s+AS\s+"
            rf"SELECT\s+(.*?)\s+FROM\s+({_IDENT})\s+"
            rf"GROUP\s+BY\s+(.*)$",
            stmt, re.I | re.S,
        )
        if not m:
            raise LakeSqlError(
                "CREATE MATERIALIZED VIEW shape: CREATE MATERIALIZED "
                "VIEW mv LOCATION '/path' AS SELECT <group cols + "
                "count(*)/sum(expr) AS name, ...> FROM t GROUP BY <cols>"
            )
        name, location, sel_body, src_name, grp_body = m.groups()
        location = location.replace("''", "'")
        self._assert_unbound(name)
        # inside a transaction the source handle would be the txn BRANCH
        # (dies at COMMIT) and the build would read uncommitted rows
        self._refuse_in_txn(src_name, "CREATE MATERIALIZED VIEW over")
        src = self.table(src_name)
        group_cols = []
        for item in _split_top(grp_body):
            if not re.fullmatch(_IDENT, item):
                raise LakeSqlError(
                    f"GROUP BY term {item!r} must be a bare column "
                    "(computed group keys: project them into the table "
                    "first)"
                )
            group_cols.append(item)
        aggs, seen_groups = [], []
        for item in _split_top(sel_body):
            if re.fullmatch(_IDENT, item):
                if item not in group_cols:
                    raise LakeSqlError(
                        f"bare select column {item!r} is not in GROUP BY"
                    )
                seen_groups.append(item)
                continue
            am = re.match(
                rf"(\w+)\s*\((.*)\)\s+AS\s+({_IDENT})$", item,
                re.I | re.S,
            )
            if not am:
                raise LakeSqlError(
                    f"cannot parse aggregate {item!r}: count(*)/"
                    "sum(expr) AS name"
                )
            fn, arg, alias = am.group(1).lower(), am.group(2).strip(), \
                am.group(3)
            if fn == "count" and arg in ("*", "1"):
                aggs.append((alias, "count", None))
            elif fn == "sum":
                aggs.append((alias, "sum", arg))
            elif fn == "avg":
                raise LakeSqlError(
                    "avg is not stored directly: materialize "
                    f"sum({arg}) AS s and count(*) AS n, divide at query "
                    "time — additive maintenance only stores retractable "
                    "aggregates"
                )
            else:
                raise LakeSqlError(
                    f"aggregate {fn!r} is not additive (retracting the "
                    "current max/min/distinct needs state the view no "
                    "longer has) — supported: count(*), sum(expr)"
                )
        if not aggs:
            raise LakeSqlError("need at least one aggregate column")
        names = [n for n, _k, _e in aggs]
        bad = [n for n in names
               if n.startswith("_") or n in group_cols]
        if bad:
            raise LakeSqlError(
                f"aggregate alias(es) {bad} collide with group columns "
                "or reserved _-prefixed names"
            )
        if len(set(names)) != len(names):
            raise LakeSqlError(f"duplicate aggregate aliases in {names}")
        if sorted(seen_groups) != sorted(group_cols):
            raise LakeSqlError(
                "select list must carry every GROUP BY column "
                f"(missing {sorted(set(group_cols) - set(seen_groups))})"
            )
        from .plans.incremental import GenericAdditiveView

        view = GenericAdditiveView(self.spark, src, location,
                                   group_cols, aggs)
        out = view.refresh()  # initial build
        self._mviews[name] = view
        # surface the maintenance mode the user actually bought: a
        # changelog='lookup' source folds the stored typed changelog;
        # other change-feed sources derive pre-images at REFRESH time
        # (bucket-pruned point reads over the touched keys, reseed past
        # the touched-set cap — plans/incremental.py _lookup_fold)
        hint = (
            "incremental (retract fold over the typed changelog)"
            if getattr(src, "changelog", "none") == "lookup"
            else "incremental (refresh-time pre-image lookup over the "
                 "change feed; falls back to full recompute past the "
                 "touched-key cap or expired retention)"
        )
        return _metrics_df(self.spark, {"materialized_view": name,
                                        "created": True,
                                        "refresh_mode": hint, **out})

    def _refresh_mview(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})$", stmt, re.I
        )
        if not m:
            raise LakeSqlError(
                "REFRESH shape: REFRESH MATERIALIZED VIEW mv"
            )
        name = m.group(1)
        if name not in self._mviews:
            raise LakeSqlError(f"no materialized view {name!r}")
        return _metrics_df(self.spark, self._mviews[name].refresh())

    def _drop_mview(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"DROP\s+MATERIALIZED\s+VIEW\s+({_IDENT})$", stmt, re.I
        )
        if not m:
            raise LakeSqlError("DROP shape: DROP MATERIALIZED VIEW mv")
        name = m.group(1)
        if name not in self._mviews:
            raise LakeSqlError(f"no materialized view {name!r}")
        # catalog unbind; the view's stored state stays (external rule)
        del self._mviews[name]
        self.spark.catalog.dropTempView(name)
        return _metrics_df(self.spark, {"materialized_view": name,
                                        "dropped": True})

    def _drop_view(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"DROP\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?({_IDENT})$", stmt, re.I
        )
        if not m:
            raise LakeSqlError("DROP VIEW shape: DROP VIEW [IF EXISTS] v")
        if_exists, name = m.groups()
        if name not in self._views:
            if if_exists:
                return _metrics_df(self.spark, {"view": name,
                                                "dropped": False})
            raise LakeSqlError(f"view {name!r} does not exist")
        del self._views[name]
        self.spark.catalog.dropTempView(name)
        return _metrics_df(self.spark, {"view": name, "dropped": True})

    def _explain(self, stmt: str) -> DataFrame:
        m = re.match(
            r"EXPLAIN\s+(EXTENDED\s+|FORMATTED\s+|CODEGEN\s+|COST\s+)?(.*)$",
            stmt, re.I | re.S,
        )
        if not m:  # bare "EXPLAIN" — same typed error as a bodyless one
            raise LakeSqlError("EXPLAIN takes a SELECT/WITH/VALUES body")
        mode, body = (m.group(1) or "").strip(), m.group(2).strip()
        if not re.match(r"(SELECT|WITH|VALUES)\b", body, re.I):
            raise LakeSqlError("EXPLAIN takes a SELECT/WITH/VALUES body")
        return self.spark.sql(f"EXPLAIN {mode} {self._prepare(body)}")

    def _show_create(self, stmt: str) -> DataFrame:
        m = re.match(rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})$", stmt, re.I)
        if not m:
            raise LakeSqlError("shape: SHOW CREATE TABLE t")
        name = m.group(1)
        t = self.table(name)
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in t.schema().fields if not f.name.startswith("_")
        )
        opts = {"key_cols": ",".join(t.key_cols)}
        if isinstance(t, PartitionedTable):
            opts.update(partition_col=t.partition_col,
                        granularity=t.granularity)
            if t.cross_partition_upsert:
                opts["cross_partition_upsert"] = "true"
            opts.update({k: str(v) for k, v in t._lake_kwargs.items()
                         if isinstance(v, (str, int))})
        else:
            opts.update(bucket_col=t.bucket_col,
                        num_buckets=str(t.num_buckets),
                        merge_mode=t.merge_mode, bucket_fn=t.bucket_fn,
                        compact_deltas=str(t.compact_deltas))
            if t.merge_engine != "lww":
                opts["merge_engine"] = t.merge_engine
            if t.cow_change_feed:
                opts["cow_change_feed"] = "true"
            if getattr(t, "changelog", "none") != "none":
                opts["changelog"] = t.changelog
            if tuple(t.stats_cols or ()) not in ((), ("ts",)):
                opts["stats_cols"] = ",".join(t.stats_cols)
            if t.bloom_cols and not isinstance(t.bloom_cols, dict):
                opts["bloom_cols"] = ",".join(t.bloom_cols)
            if t.target_file_rows is not None:
                opts["target_file_rows"] = str(t.target_file_rows)
            if t.schema_mode != "evolve":
                opts["schema_mode"] = t.schema_mode
            if t.agg_spec:
                opts["agg_spec"] = json.dumps(dict(t.agg_spec))
        def _q(v) -> str:  # '' escaping so the emitted DDL re-parses
            return str(v).replace("'", "''")

        opt_body = ", ".join(f"{k} '{_q(v)}'" for k, v in opts.items())
        ddl = (f"CREATE TABLE {name} ({cols}) USING lake "
               f"LOCATION '{_q(t.path)}' OPTIONS ({opt_body})")
        props = t.properties()
        if props:
            prop_body = ", ".join(
                f"{k} '{_q(v)}'" for k, v in sorted(props.items())
            )
            ddl += f" TBLPROPERTIES ({prop_body})"
        return self.spark.createDataFrame(
            [(ddl,)], "create_statement string"
        )

    def _show_partitions(self, stmt: str) -> DataFrame:
        m = re.match(rf"SHOW\s+PARTITIONS\s+({_IDENT})$", stmt, re.I)
        if not m:
            raise LakeSqlError("SHOW PARTITIONS shape: SHOW PARTITIONS t")
        t = self.table(m.group(1))
        if not isinstance(t, PartitionedTable):
            raise LakeSqlError(
                f"{m.group(1)!r} is a flat (hash-bucketed) table; "
                "SHOW PARTITIONS applies to partitioned tables"
            )
        return self.spark.createDataFrame(
            [(p,) for p in sorted(t.partitions())], "partition string"
        )

    def _show_refs(self, stmt: str) -> DataFrame:
        m = re.match(rf"SHOW\s+(BRANCHES|TAGS)\s+({_IDENT})$", stmt, re.I)
        if not m:
            raise LakeSqlError("shape: SHOW BRANCHES|TAGS t")
        what, t = m.group(1).upper(), self.table(m.group(2))
        if what == "BRANCHES":
            return self.spark.createDataFrame(
                [(b["name"], b["forked_at"]) for b in t.branches()],
                "branch string, forked_at long",
            )
        return self.spark.createDataFrame(
            [(g["name"], g["version"]) for g in t.tags()],
            "tag string, version long",
        )

    def _describe(self, stmt: str) -> DataFrame:
        bare = re.match(rf"DESC(?:RIBE)?\s+({_IDENT})$", stmt, re.I)
        if bare and bare.group(1).upper() not in ("HISTORY", "DETAIL"):
            schema = self.table(bare.group(1)).schema()
            return self.spark.createDataFrame(
                [(f.name, f.dataType.simpleString(), f.nullable)
                 for f in schema.fields],
                "col_name string, data_type string, nullable boolean",
            )
        m = re.match(
            rf"DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+({_IDENT})"
            r"(?:\s+LIMIT\s+(\d+))?$",
            stmt, re.I,
        )
        if not m:
            raise LakeSqlError(
                "DESCRIBE shape: DESCRIBE HISTORY|DETAIL t [LIMIT n]"
            )
        what, name, limit = m.group(1).upper(), m.group(2), m.group(3)
        t = self.table(name)
        if what == "DETAIL":
            return _metrics_df(self.spark, t.describe_detail())
        hist = t.history(int(limit) if limit else None)
        rows = [
            tuple(
                json.dumps(v, default=str)
                if isinstance(v, (dict, list)) else v
                for v in (
                    h.get("version"),
                    # flat history says "operation"; the router's global
                    # manifests say "op"
                    h.get("operation", h.get("op")),
                    h.get("commit_ts"),
                    h.get("metrics"),
                )
            )
            for h in hist
        ]
        return self.spark.createDataFrame(
            rows,
            "version long, operation string, commit_ts double, "
            "metrics string",
        )

    def _alter(self, stmt: str) -> DataFrame:
        body = re.match(rf"ALTER\s+TABLE\s+({_IDENT})\s+(.*)$", stmt,
                        re.I | re.S)
        if not body:
            raise LakeSqlError("ALTER TABLE shape: ALTER TABLE t <action>")
        name, action = body.group(1), body.group(2).strip()
        self._refuse_in_txn(name, "ALTER TABLE")
        t = self.table(name)
        m = re.match(r"ADD\s+COLUMNS?\s+(.*)$", action, re.I | re.S)
        if m:
            # both the single form (ADD COLUMN c type) and the plural
            # parenthesized multi-column form (ADD COLUMNS (a int,
            # b string)) — the pre-fix single-column regex matched the
            # plural shape but shoved ', b string' into the TYPE string,
            # producing a raw ParseException deep in add_column
            cols_body = m.group(1).strip()
            if cols_body.startswith("(") and cols_body.endswith(")"):
                cols_body = cols_body[1:-1]
            items = _split_top(cols_body)
            parsed_cols = []
            for item in items:
                cm = re.match(
                    rf"({_IDENT})\s+([A-Za-z0-9_<>,() ]+)$", item.strip()
                )
                if not cm:
                    raise LakeSqlError(
                        "cannot parse column definition "
                        f"{item.strip()!r}: ADD COLUMNS takes "
                        "'name type' items"
                    )
                parsed_cols.append((cm.group(1), cm.group(2).strip()))
            if not parsed_cols:
                raise LakeSqlError(
                    "ADD COLUMNS needs at least one 'name type' item"
                )
            for cname, ctype in parsed_cols:
                out = t.add_column(cname, ctype)
            return _metrics_df(self.spark, out)
        m = re.match(rf"DROP\s+COLUMN\s+({_IDENT})$", action, re.I)
        if m:
            return _metrics_df(self.spark, t.drop_column(m.group(1)))
        m = re.match(
            rf"RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})$", action, re.I
        )
        if m:
            return _metrics_df(
                self.spark, t.rename_column(m.group(1), m.group(2))
            )
        m = re.match(
            rf"ALTER\s+COLUMN\s+({_IDENT})\s+TYPE\s+([A-Za-z0-9_() ]+)$",
            action, re.I,
        )
        if m:
            return _metrics_df(
                self.spark, t.widen_column(m.group(1), m.group(2).strip())
            )
        m = re.match(r"SET\s+TBLPROPERTIES\s*\((.*)\)$", action, re.I | re.S)
        if m:
            out = {}
            for k, v in _parse_kv_list(m.group(1)).items():
                out = t.set_property(k, v)
            return _metrics_df(self.spark, out)
        m = re.match(r"UNSET\s+TBLPROPERTIES\s*\((.*)\)$", action,
                     re.I | re.S)
        if m:
            out = {}
            for item in _split_top(m.group(1)):
                out = t.unset_property(item.strip().strip("'\""))
            return _metrics_df(self.spark, out)
        m = re.match(
            rf"ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.*)\)$",
            action, re.I | re.S,
        )
        if m:
            return _metrics_df(
                self.spark, t.add_constraint(m.group(1), m.group(2).strip())
            )
        m = re.match(rf"DROP\s+CONSTRAINT\s+({_IDENT})$", action, re.I)
        if m:
            return _metrics_df(self.spark, t.drop_constraint(m.group(1)))
        m = re.match(rf"CREATE\s+BRANCH\s+({_IDENT})$", action, re.I)
        if m:
            return _metrics_df(self.spark, t.create_branch(m.group(1)))
        m = re.match(rf"PUBLISH\s+BRANCH\s+({_IDENT})$", action, re.I)
        if m:
            return _metrics_df(self.spark, t.publish_branch(m.group(1)))
        m = re.match(rf"DROP\s+BRANCH\s+({_IDENT})$", action, re.I)
        if m:
            return _metrics_df(self.spark, t.drop_branch(m.group(1)))
        m = re.match(
            rf"CREATE\s+TAG\s+({_IDENT})(?:\s+AS\s+OF\s+VERSION\s+(\d+))?$",
            action, re.I,
        )
        if m:
            return _metrics_df(self.spark, t.tag(
                m.group(1), int(m.group(2)) if m.group(2) else None))
        m = re.match(rf"DROP\s+TAG\s+({_IDENT})$", action, re.I)
        if m:
            t.delete_tag(m.group(1))
            return _metrics_df(self.spark, {"tag": m.group(1),
                                            "dropped": True})
        raise LakeSqlError(
            f"unsupported ALTER action {action!r}: ADD COLUMN c type | "
            "DROP COLUMN c | RENAME COLUMN a TO b | ALTER COLUMN c TYPE t "
            "| SET/UNSET TBLPROPERTIES (...) | ADD CONSTRAINT n CHECK "
            "(expr) | DROP CONSTRAINT n | CREATE/PUBLISH/DROP BRANCH b "
            "| CREATE TAG n [AS OF VERSION v] | DROP TAG n"
        )

    # -------------------------------------------------------- maintenance
    def _optimize(self, stmt: str) -> DataFrame:
        m = re.match(rf"OPTIMIZE\s+({_IDENT})$", stmt, re.I)
        if not m:
            raise LakeSqlError("OPTIMIZE shape: OPTIMIZE t")
        self._refuse_in_txn(m.group(1), "OPTIMIZE")
        t = self.table(m.group(1))
        if isinstance(t, PartitionedTable):
            return _metrics_df(self.spark, t.maintain())
        return _metrics_df(self.spark, maintain(t))

    def _vacuum(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?$",
            stmt, re.I,
        )
        if not m:
            raise LakeSqlError("VACUUM shape: VACUUM t [RETAIN n SNAPSHOTS]")
        keep = int(m.group(2)) if m.group(2) else 1
        name = m.group(1)
        self._refuse_in_txn(name, "VACUUM")
        clamped_from = None
        if self._group is not None and name in self._group_members():
            # a bare expire on a group member could drop a sub-version a
            # surviving group cut still pins (member advanced via direct
            # writes no sync() published) — group.read() at that cut would
            # hit a raw FileNotFoundError, breaking the cross-table
            # snapshot-isolation guarantee. Clamp keep_last so every
            # pinned sub-version survives; TableGroup.expire() is the op
            # that shrinks the pin floor itself.
            t = self.table(name)
            floor = None
            for v in self._group._versions():
                sub_v = self._group.manifest(v)["tables"].get(name)
                if sub_v is not None:
                    floor = sub_v if floor is None else min(floor, sub_v)
            if floor is not None:
                required = t.latest_version() - floor + 1
                if required > keep:
                    clamped_from, keep = keep, required
        metrics = self.table(name).expire_snapshots(keep_last=keep)
        if clamped_from is not None:
            metrics = {
                **metrics,
                "keep_last_clamped_from": clamped_from,
                "keep_last_clamped_to": keep,
                "clamp_reason": "group cuts pin older sub-versions; "
                                "use group expire to drop cuts first",
            }
        return _metrics_df(self.spark, metrics)

    def _restore(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)$",
            stmt, re.I,
        )
        if not m:
            raise LakeSqlError(
                "RESTORE shape: RESTORE TABLE t TO VERSION AS OF v"
            )
        self._refuse_in_txn(m.group(1), "RESTORE")
        return _metrics_df(
            self.spark, self.table(m.group(1)).rollback(int(m.group(2)))
        )

    # ---------------------------------------------------------------- DML
    def _delete(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.*)$", stmt, re.I | re.S
        )
        if not m:
            raise LakeSqlError(
                "DELETE shape: DELETE FROM t WHERE pred (unconditional "
                "delete: TRUNCATE TABLE t)"
            )
        return _metrics_df(
            self.spark,
            self.table(m.group(1), for_write=True)
            .delete_where(m.group(2).strip()),
        )

    def _truncate(self, stmt: str) -> DataFrame:
        m = re.match(rf"TRUNCATE\s+TABLE\s+({_IDENT})$", stmt, re.I)
        if not m:
            raise LakeSqlError("TRUNCATE shape: TRUNCATE TABLE t")
        return _metrics_df(
            self.spark,
            self.table(m.group(1), for_write=True).delete_where("true"),
        )

    def _update(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"UPDATE\s+({_IDENT})\s+SET\s+(.*)$", stmt, re.I | re.S
        )
        wi = _find_top_keyword(m.group(2), "WHERE") if m else -1
        if not m or wi < 0:
            raise LakeSqlError(
                "UPDATE shape: UPDATE t SET c = expr, ... WHERE pred"
            )
        name = m.group(1)
        body = m.group(2)
        set_body, pred = body[:wi].rstrip(), body[wi + 5:].strip()
        assignments = {}
        for item in _split_top(set_body):
            am = re.match(rf"({_IDENT})\s*=\s*(.+)$", item, re.S)
            if not am:
                raise LakeSqlError(f"cannot parse assignment {item!r}")
            assignments[am.group(1)] = am.group(2).strip()
        return _metrics_df(
            self.spark,
            self.table(name, for_write=True)
            .update_where(pred.strip(), assignments),
        )

    def _insert(self, stmt: str) -> DataFrame:
        om = re.match(
            rf"INSERT\s+OVERWRITE\s+(?:TABLE\s+)?({_IDENT})\s+(.*)$",
            stmt, re.I | re.S,
        )
        if om:
            # full-table atomic replace: one D+U change batch through
            # overwrite_where (replaceWhere over the whole table)
            name, body = om.groups()
            t = self.table(name, for_write=True)
            df = self._select(body.strip())
            want = [f.name for f in t.schema().fields
                    if not f.name.startswith("_")]
            if len(df.columns) != len(want):
                raise LakeSqlError(
                    f"INSERT OVERWRITE produces {len(df.columns)} columns"
                    f" for schema {want}"
                )
            out = t.overwrite_where(df.toDF(*want), "true")
            return _metrics_df(self.spark, out)
        m = re.match(
            rf"INSERT\s+INTO\s+({_IDENT})\s*(\(([^)]*)\))?\s*(.*)$",
            stmt, re.I | re.S,
        )
        if not m:
            raise LakeSqlError(
                "INSERT shape: INSERT INTO t [(cols)] VALUES (...), ... "
                "| INSERT INTO t [(cols)] SELECT ... "
                "| INSERT OVERWRITE t <select>"
            )
        name, _, cols_body, rest = m.groups()
        t = self.table(name, for_write=True)
        schema = t.schema()
        cols = (
            [c.strip() for c in cols_body.split(",")]
            if cols_body else schema.fieldNames()
        )
        unknown = [c for c in cols if c not in schema.fieldNames()]
        if unknown:
            raise LakeSqlError(
                f"INSERT column(s) {unknown} not in table schema "
                f"{schema.fieldNames()}"
            )
        rest = rest.strip()
        if re.match(r"VALUES\b", rest, re.I):
            named = ", ".join(cols)
            src = self.spark.sql(f"SELECT * FROM {rest} AS _v({named})")
        else:
            src = self._select(rest)
            if len(src.columns) != len(cols):
                raise LakeSqlError(
                    f"INSERT SELECT produces {len(src.columns)} columns "
                    f"for {len(cols)} target columns"
                )
            src = src.toDF(*cols)
        missing_keys = [k for k in t.key_cols if k not in cols]
        if missing_keys:
            raise LakeSqlError(
                f"INSERT must supply key column(s) {missing_keys}"
            )
        # keyed insert = 'I' events at the next seq — an existing key is
        # upserted (LWW), never duplicated (keyed-table divergence from
        # Delta's blind append, stated in the module docstring)
        from pyspark.sql import functions as F

        # all rows of one INSERT share one seq, so duplicate keys within
        # the statement would resolve by payload comparison, not
        # statement order — refuse, like merge_into's cardinality check
        dup = (
            src.groupBy(*[F.col(k) for k in t.key_cols])
            .count().filter("count > 1").limit(1).collect()
        )
        if dup:
            k = tuple(dup[0][c] for c in t.key_cols)
            raise LakeSqlError(
                f"INSERT contains duplicate key {k}: rows in one INSERT "
                "share one sequence number, so the winner would be "
                "arbitrary — split into separate statements"
            )
        seq = t.next_seq()
        events = src.select(
            F.lit("I").alias("op"),
            F.lit(seq).cast("long").alias("seq"),
            *[
                (F.col(f.name).cast(f.dataType) if f.name in cols
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in schema.fields
                if not f.name.startswith("_")
            ],
        )
        out = t.apply_changes(events, source="sql:insert")
        return _metrics_df(self.spark, {**out, "insert_seq": seq})

    def _copy_into(self, stmt: str) -> DataFrame:
        """SQL entry to the ingest path: load a change-event directory
        (op/seq + payload rows) and MERGE it — ``BATCH_ID`` makes the
        statement exactly-once (re-running a committed id is a skip),
        the COPY INTO idempotence contract expressed with the engine's
        ledger instead of per-file bookkeeping."""
        m = re.match(
            rf"COPY\s+INTO\s+({_IDENT})\s+FROM\s+'([^']+)'"
            rf"(?:\s+FILEFORMAT\s*=\s*(\w+))?"
            rf"(?:\s+BATCH_ID\s*=\s*(\d+))?$",
            stmt, re.I,
        )
        if not m:
            raise LakeSqlError(
                "COPY shape: COPY INTO t FROM '/events/dir' "
                "[FILEFORMAT = parquet|json|csv|xlsx|debezium] "
                "[BATCH_ID = n]"
            )
        name, path, fmt, batch_id = m.groups()
        from .sources.events import read_events

        t = self.table(name, for_write=True)
        # event schema derives from the TARGET: op/seq + this table's
        # payload columns (the module-level EVENT_SCHEMA is the
        # transcripts shape — forcing it on another table would project
        # its real columns away). Transcript binlogs carrying ts_raw
        # belong to run_replay.py's transform chain, not COPY INTO.
        ev_schema = T.StructType(
            [T.StructField("op", T.StringType(), False),
             T.StructField("seq", T.LongType(), False)]
            + [T.StructField(f.name, f.dataType, True)
               for f in t.schema().fields if not f.name.startswith("_")]
        )
        events = read_events(self.spark, path,
                             fmt=(fmt or "parquet").lower(),
                             schema=ev_schema)
        out = t.apply_changes(
            events, batch_id=int(batch_id) if batch_id else None,
            source=f"sql:copy_into:{path}",
        )
        return _metrics_df(self.spark, out)

    # -------------------------------------------------------------- MERGE
    def _merge(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})"
            rf"(?:\s+(?:AS\s+)?(?!USING\b)({_IDENT}))?\s+"
            rf"USING\s+(\((?:[^()]|\([^()]*\))*\)|{_IDENT})"
            rf"(?:\s+(?:AS\s+)?(?!ON\b)({_IDENT}))?\s+"
            rf"ON\s+(.*?)\s+(WHEN\s+.*)$",
            stmt, re.I | re.S,
        )
        if not m:
            raise LakeSqlError(
                "MERGE shape: MERGE INTO t [AS a] USING src|(<select>) "
                "[AS s] ON <key equality> WHEN ... (at least one WHEN "
                "clause)"
            )
        name, talias, src_ref, salias, on_body, when_body = m.groups()
        t = self.table(name, for_write=True)
        talias = talias or name
        if src_ref.startswith("("):
            src = self._select(src_ref[1:-1].strip())
            salias = salias or "s"
        else:
            # the same table/mview/view/temp-view binding order the
            # statement rewriter uses — a bare spark.table() here (the
            # pre-fix fallback) read a stored view's STALE last
            # expansion (or raised a raw AnalysisException if it was
            # never queried) instead of re-binding fresh state
            src = self._relation(src_ref)
            salias = salias or src_ref
        # ON must be exactly key equality: the engine merges by key.
        on_keys = set()
        for conj in re.split(r"\bAND\b", on_body, flags=re.I):
            em = re.match(
                rf"\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*$",
                conj,
            )
            if not em:
                raise LakeSqlError(
                    f"MERGE ON clause term {conj.strip()!r} is not a "
                    "qualified column equality; the engine merges by key "
                    f"columns {list(t.key_cols)} only"
                )
            a, ac, b, bc = em.groups()
            pair = {a: ac, b: bc}
            if set(pair) != {talias, salias} or pair[talias] != pair[salias]:
                raise LakeSqlError(
                    f"MERGE ON term {conj.strip()!r} must equate the same "
                    f"column across aliases {talias!r}/{salias!r}"
                )
            on_keys.add(pair[talias])
        if on_keys != set(t.key_cols):
            raise LakeSqlError(
                f"MERGE ON columns {sorted(on_keys)} != table key "
                f"{sorted(t.key_cols)}: the engine merges by exactly the "
                "key columns"
            )

        def _norm(expr: str) -> str:
            # merge_into's expression scope is t./s. — rewrite the
            # statement's aliases onto it THROUGH placeholders: a direct
            # two-pass sub collides when the source alias is literally
            # 't' (the first pass's output would be rewritten again)
            expr = re.sub(rf"\b{re.escape(talias)}\.", "\x00T\x00.", expr)
            expr = re.sub(rf"\b{re.escape(salias)}\.", "\x00S\x00.", expr)
            return expr.replace("\x00T\x00.", "t.").replace(
                "\x00S\x00.", "s.")

        kwargs = {
            "when_matched_update": None,
            "when_matched_delete": None,
            "when_not_matched_insert": False,
        }
        clause_re = re.compile(
            r"WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.*?))?\s+THEN\s+",
            re.I | re.S,
        )
        starts = list(clause_re.finditer(when_body))
        if not starts:
            raise LakeSqlError("MERGE needs at least one WHEN clause")
        update_idx = delete_idx = None
        for i, cm in enumerate(starts):
            body_end = (
                starts[i + 1].start() if i + 1 < len(starts)
                else len(when_body)
            )
            action = when_body[cm.end():body_end].strip()
            is_not_matched = bool(cm.group(1))
            cond = _norm(cm.group(2).strip()) if cm.group(2) else None
            if is_not_matched:
                im = re.match(r"INSERT\s*(\*|\(([^)]*)\)\s*VALUES\s*\((.*)\))$",
                              action, re.I | re.S)
                if not im:
                    raise LakeSqlError(
                        f"WHEN NOT MATCHED action {action!r}: INSERT * or "
                        "INSERT (cols) VALUES (exprs)"
                    )
                if im.group(1) == "*":
                    kwargs["when_not_matched_insert"] = True
                else:
                    cols = [c.strip() for c in im.group(2).split(",")]
                    exprs = _split_top(im.group(3))
                    if len(cols) != len(exprs):
                        raise LakeSqlError(
                            "INSERT column/expression count mismatch"
                        )
                    kwargs["when_not_matched_insert"] = {
                        c: _norm(e) for c, e in zip(cols, exprs)
                    }
                if cond:
                    kwargs["not_matched_condition"] = cond
            elif re.match(r"DELETE$", action, re.I):
                if delete_idx is not None:
                    raise LakeSqlError(
                        "duplicate WHEN MATCHED ... DELETE clause"
                    )
                delete_idx = i
                kwargs["when_matched_delete"] = cond if cond else True
            else:
                um = re.match(r"UPDATE\s+SET\s+(.*)$", action, re.I | re.S)
                if not um:
                    raise LakeSqlError(
                        f"WHEN MATCHED action {action!r}: UPDATE SET ... "
                        "or DELETE"
                    )
                assignments = {}
                for item in _split_top(um.group(1)):
                    am = re.match(rf"(?:{_IDENT}\.)?({_IDENT})\s*=\s*(.+)$",
                                  item, re.S)
                    if not am:
                        raise LakeSqlError(
                            f"cannot parse MERGE assignment {item!r}"
                        )
                    assignments[am.group(1)] = _norm(am.group(2).strip())
                if update_idx is not None:
                    raise LakeSqlError(
                        "duplicate WHEN MATCHED ... UPDATE clause"
                    )
                update_idx = i
                kwargs["when_matched_update"] = assignments
                if cond:
                    kwargs["matched_condition"] = cond
        if (update_idx is not None and delete_idx is not None
                and update_idx < delete_idx):
            # SQL MERGE is first-match-wins in clause order; the engine
            # evaluates DELETE before UPDATE (Delta's fixed precedence).
            # An UPDATE written before a DELETE would silently invert —
            # refuse instead of misexecuting.
            raise LakeSqlError(
                "WHEN MATCHED UPDATE appears before WHEN MATCHED DELETE: "
                "the engine evaluates DELETE first, which would invert "
                "the statement's first-match-wins order — reorder the "
                "clauses (DELETE first) to state the intended precedence"
            )
        out = t.merge_into(src, **kwargs)
        return _metrics_df(self.spark, out)


def _coerce_ts(s: str) -> float:
    """Parse a TIMESTAMP AS OF literal to UNIX SECONDS —
    ``version_as_of`` compares floats against manifest ``commit_ts``
    values, so returning a datetime here (the pre-fix behavior) made
    every date-string literal crash with TypeError; the shared
    ``plans.lake._to_unix`` owns the naive-means-UTC rule."""
    from datetime import datetime

    from .plans.lake import _to_unix

    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return _to_unix(datetime.strptime(s, fmt))
        except ValueError:
            continue
    try:
        return float(s)
    except ValueError:
        raise LakeSqlError(
            f"cannot parse timestamp {s!r}: use 'YYYY-MM-DD[ HH:MM:SS]' "
            "or a unix epoch number"
        ) from None
