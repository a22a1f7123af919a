"""SQL shell entrypoint — the engine's ``spark-sql`` analog.

Runs statements from ``-e``/``-f`` against a persisted catalog
definition (``LakeCatalog.save``) or ad-hoc ``--table name=/path``
bindings, printing each result as a table. The reference drives its
pipeline from argv + config files (``convert_cdm_to_mods.py`` main);
this is the declarative equivalent a lake operator scripts against.

Usage (cluster):
    zip -r engine.zip cdm_to_mods_spark
    spark-submit --py-files engine.zip scripts/run_sql.py \
        --catalog /lake/catalog.json \
        -e "MERGE INTO transcripts t USING staged s ON ... "

Usage (local):
    python scripts/run_sql.py --table tr=/lake/transcripts \
        -e "SELECT role, count(*) AS n FROM tr GROUP BY role" \
        -e "DESCRIBE HISTORY tr LIMIT 5"

    python scripts/run_sql.py --catalog /lake/catalog.json -f batch.sql

``-f`` files hold one statement per ``;`` (statement-splitting honors
quotes/parens via the router's own splitter). ``--save`` writes the
session's catalog (including tables CREATEd by the script) back to the
catalog file — a script that provisions tables persists them for the
next job. Errors stop the script (exit 1) so orchestration notices;
``--keep-going`` runs every statement and exits 1 only at the end.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _strip_comments(text: str) -> str:
    """Strip ``--`` comments (full-line and trailing) quote-aware, with
    the quote state carried across NEWLINES — one scanner over the whole
    script. A string literal legally spanning lines must not have a
    ``--`` on its later lines treated as a comment: that would silently
    truncate the statement before the ``;`` splitter sees it."""
    out, i, n, q = [], 0, len(text), None
    while i < n:
        ch = text[i]
        if q:
            if ch == "\\" and i + 1 < n:
                out.append(ch)
                out.append(text[i + 1])
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "-" and text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j < 0 else j  # keep the newline itself
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--catalog", help="LakeCatalog.save() file to load")
    ap.add_argument("--table", action="append", default=[],
                    metavar="NAME=/path", help="ad-hoc table binding")
    ap.add_argument("--group", help="TableGroup path (enables BEGIN/COMMIT)")
    ap.add_argument("-e", action="append", default=[], dest="statements",
                    metavar="SQL", help="statement to run (repeatable)")
    ap.add_argument("-f", dest="script", help="file of ;-separated statements")
    ap.add_argument("--save", action="store_true",
                    help="write the catalog back to --catalog on success")
    ap.add_argument("--max-rows", type=int, default=50,
                    help="rows to show per result (default 50)")
    ap.add_argument("--keep-going", action="store_true",
                    help="continue past statement errors; exit 1 at the end")
    ap.add_argument("--master", default=None,
                    help="local master override (cluster: let spark-submit)")
    args = ap.parse_args()

    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.sql import LakeCatalog, _split_top

    spark = get_spark("run-sql", master=args.master)

    if args.catalog and os.path.exists(args.catalog):
        cat = LakeCatalog.load(spark, args.catalog)
    elif args.group:
        from cdm_to_mods_spark.plans.txn import TableGroup

        cat = LakeCatalog(spark, group=TableGroup(spark, args.group))
    else:
        cat = LakeCatalog(spark)
    for binding in args.table:
        name, _, path = binding.partition("=")
        if not path:
            ap.error(f"--table needs NAME=/path, got {binding!r}")
        cat.register(name, path)

    if args.save and not args.catalog:
        ap.error("--save needs --catalog")

    statements = list(args.statements)
    if args.script:
        with open(args.script) as fh:
            raw = fh.read()
        # strip -- comments BEFORE splitting: a comment's apostrophe
        # would otherwise open _split_top's quote scan and swallow the
        # next ';' (see _strip_comments above for the cross-line rule).
        statements.extend(
            s for s in _split_top(_strip_comments(raw), ";") if s.strip()
        )
    if not statements:
        ap.error("nothing to run: pass -e and/or -f")

    failed = 0
    for stmt in statements:
        one_line = " ".join(stmt.split())
        print(f"-- {one_line[:120]}")
        try:
            cat.sql(stmt).show(args.max_rows, truncate=False)
        except Exception as e:  # report, then decide by --keep-going
            print(f"ERROR: {type(e).__name__}: {e}", file=sys.stderr)
            failed += 1
            if not args.keep_going:
                return 1
    if args.save:
        cat.save(args.catalog)
        print(f"-- catalog saved to {args.catalog}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
