"""StarSession — SQL entry point with catalog integration and
materialized-view query rewriting.

The reference wires itself into Spark's analyzer/catalog via session
extensions (StarSparkSessionExtension.scala:72-120). A pure-Python
engine instead owns its SQL entry point: registered star tables become
temp views backed by their MoR snapshot DataFrames, and SELECT text is
given to the MV rewriter (starlake_spark.plans.mv) before falling
through to ``spark.sql`` — same observable semantics, no JVM plugin
(SURVEY §4 'MV query rewriting', option b).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from starlake_spark import catalog
from starlake_spark.local import local_df
from starlake_spark.table import StarTable, create_table


# quote-aware parenthesized-body fragment: a PARTITION (...) clause may
# carry ')' or ',' INSIDE a quoted literal (PARTITION (p = 'a)b')) — a
# naive [^)]* stops at the first ')' and mis-parses the value. Quoted
# segments (with SQL '' escapes) are consumed whole.
_PAREN_BODY = r"(?:'[^']*'|[^)'])*"


def _unquote_literal(val: str) -> str:
    """Render a parsed SQL literal to its string value: strip one layer
    of single quotes and undo '' escapes; bare (unquoted) tokens pass
    through. Replaces the fragile ``.strip(\"'\")`` (which mangles
    values that merely START or END with a quote)."""
    v = val.strip()
    if len(v) >= 2 and v[0] == v[-1] == "'":
        return v[1:-1].replace("''", "'")
    if len(v) >= 2 and v[0] == v[-1] == '"':
        return v[1:-1].replace('""', '"')
    return v


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens/quotes (SET a=f(x,y), b=2)."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


# DDL the reference explicitly refuses for star tables
# (NotSupportedDDLSuite.scala:112-167) — matched by name so statements
# on non-star tables fall through to Spark untouched
_UNSUPPORTED_DDL = [
    (re.compile(r"^\s*CREATE\s+TABLE\s+[\w.`]+\s+LIKE\s+(?P<name>[\w.]+)",
                re.IGNORECASE), "CREATE TABLE LIKE"),
    (re.compile(r"^\s*ANALYZE\s+TABLE\s+(?P<name>[\w.]+)", re.IGNORECASE),
     "ANALYZE TABLE"),
    (re.compile(r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+"
                r"(?:IF\s+NOT\s+EXISTS\s+)?PARTITION", re.IGNORECASE),
     "ALTER TABLE ADD PARTITION (partitions derive from the data; "
     "can not alter partitions)"),
    (re.compile(r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+"
                r"(?:IF\s+EXISTS\s+)?PARTITION", re.IGNORECASE),
     "ALTER TABLE DROP PARTITION (can not alter partitions — use "
     "TRUNCATE TABLE t PARTITION (...) or StarTable.drop_partition)"),
    (re.compile(r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RECOVER\s+"
                r"PARTITIONS", re.IGNORECASE),
     "ALTER TABLE RECOVER PARTITIONS"),
    (re.compile(r"^\s*MSCK\s+REPAIR\s+TABLE\s+(?P<name>[\w.]+)",
                re.IGNORECASE), "MSCK REPAIR TABLE"),
    (re.compile(r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+SET\s+"
                r"SERDEPROPERTIES", re.IGNORECASE),
     "ALTER TABLE SET SERDEPROPERTIES"),
    (re.compile(r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+TO\b",
                re.IGNORECASE), "ALTER TABLE RENAME TO"),
    (re.compile(r"^\s*LOAD\s+DATA\s+.*?INTO\s+TABLE\s+(?P<name>[\w.]+)",
                re.IGNORECASE | re.DOTALL), "LOAD DATA"),
    (re.compile(r"^\s*INSERT\s+OVERWRITE\s+(?:LOCAL\s+)?DIRECTORY\s+"
                r".*?USING\s+star\b", re.IGNORECASE | re.DOTALL),
     "INSERT OVERWRITE DIRECTORY"),
    (re.compile(r"^\s*CREATE\s+TABLE\s+.*?USING\s+star\b.*?CLUSTERED\s+BY",
                re.IGNORECASE | re.DOTALL),
     "CLUSTERED BY bucketing (use hashPartitions + hashBucketNum)"),
]

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<name>[\w.]+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>[\w.]+)(?:\s+WHERE\s+(?P<where>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)(?:\s+(?:AS\s+)?(?P<talias>\w+))?"
    r"\s+USING\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.+?)(?P<clauses>\s+WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_UPDATE_RE = re.compile(
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(?P<sets>\*|.+?)(?=\s+WHEN\s+|\s*$)",
    re.IGNORECASE | re.DOTALL)
_MERGE_DELETE_RE = re.compile(r"WHEN\s+MATCHED\s+THEN\s+DELETE", re.IGNORECASE)
_MERGE_NMBS_UPDATE_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+UPDATE\s+SET\s+"
    r"(?P<sets>.+?)(?=\s+WHEN\s+|\s*$)",
    re.IGNORECASE | re.DOTALL)
_MERGE_NMBS_DELETE_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE", re.IGNORECASE)
_MERGE_INSERT_STAR_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*", re.IGNORECASE)
_MERGE_INSERT_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*\((?P<cols>[^)]*)\)\s*"
    r"VALUES\s*\((?P<vals>(?:[^()]|\([^()]*\))*)\)",
    re.IGNORECASE | re.DOTALL)
_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)"
    r"(?P<tail>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROPCOLS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+COLUMNS?\s*"
    r"\(?\s*(?P<cols>[\w\s,`]+?)\s*\)?\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(?P<name>[\w.]+)"
    r"(?:\s+PARTITION\s+'(?P<part>[^']+)')?\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<version>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*$",
    re.IGNORECASE,
)
_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
    r"(?:(?P<mode>SHALLOW|DEEP)\s+)?CLONE\s+(?P<src>[\w.]+)"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?"
    r"(?:\s+LOCATION\s+'[^']+')?\s*$",
    re.IGNORECASE,
)
_ALTER_ADD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+COLUMNS?\s*"
    r"\((?P<cols>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_SETPROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+SET\s+TBLPROPERTIES\s*"
    r"\((?P<props>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_UNSETPROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+UNSET\s+TBLPROPERTIES\s*"
    r"\((?P<props>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_ADDCHECK_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+CONSTRAINT\s+"
    r"(?P<cname>\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROPCHECK_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+CONSTRAINT\s+"
    r"(?P<cname>\w+)\s*$",
    re.IGNORECASE,
)
_ALTER_CHANGETYPE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+(?:ALTER|CHANGE)\s+COLUMN\s+"
    r"(?P<col>\w+)\s+TYPE\s+(?P<type>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Hive-form CHANGE COLUMN (reference AlterTableTests.scala:563-927):
#   CHANGE [COLUMN] <path> <newName> <type> [COMMENT '..'] [FIRST|AFTER c]
_ALTER_CHANGE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+CHANGE(?:\s+COLUMN)?\s+"
    r"(?P<path>(?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s+"
    r"(?P<new>`[^`]+`|[\w$]+)\s+(?P<type>.+?)"
    r"(?:\s+COMMENT\s+'(?P<comment>(?:[^']|'')*)')?"
    r"(?:\s+(?P<first>FIRST)|\s+AFTER\s+(?P<after>`[^`]+`|[\w$]+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# one ADD COLUMNS entry: dotted/backticked path, type, optional COMMENT
_ADDCOL_ENTRY_RE = re.compile(
    r"^\s*(?P<path>(?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s+"
    r"(?P<type>.+?)(?:\s+COMMENT\s+'(?P<comment>(?:[^']|'')*)')?"
    r"(?:\s+(?P<first>FIRST)|\s+AFTER\s+(?P<after>`[^`]+`|[\w$]+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _unescape_sql_str(s: str | None) -> str | None:
    """SQL single-quoted literal body: doubled quote '' is an escaped
    quote (COMMENT 'it''s' stores "it's")."""
    return None if s is None else s.replace("''", "'")


def _unquote_path(path: str) -> str:
    """Strip backticks per dotted segment (`a b`.`c` -> 'a b.c')."""
    return ".".join(
        seg[1:-1] if seg.startswith("`") and seg.endswith("`") else seg
        for seg in re.findall(r"`[^`]+`|[^.]+", path))
_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"`?(?P<old>\w+)`?\s+TO\s+`?(?P<new>\w+)`?\s*$",
    re.IGNORECASE,
)
_ALTER_SETDEFAULT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ALTER\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s+SET\s+DEFAULT\s+(?P<expr>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# nullability ALTERs (reference DDLSuite.scala:111-170): relaxing
# NOT NULL -> nullable is safe and supported; tightening is refused
# (existing files cannot be revalidated cheaply)
_ALTER_DROPNOTNULL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+(?:ALTER|CHANGE)\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s+DROP\s+NOT\s+NULL\s*$",
    re.IGNORECASE,
)
_ALTER_SETNOTNULL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+(?:ALTER|CHANGE)\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s+SET\s+NOT\s+NULL\s*$",
    re.IGNORECASE,
)
_ALTER_DROPDEFAULT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ALTER\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s+DROP\s+DEFAULT\s*$",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<name>[\w.]+)"
    rf"(?:\s+PARTITION\s*\((?P<part>{_PAREN_BODY})\))?"
    r"(?:\s*\((?P<cols>[^)]*)\))?"
    r"\s+(?P<body>(?:SELECT|VALUES|WITH|TABLE)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)


class StarSession:
    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self._tables: dict[str, StarTable] = {}
        self._mv_enabled = True
        # name -> state signature of the temp view _sync_views last
        # built for it (see _sync_views); shadow/drop sites invalidate
        # through _unsync
        self._synced: dict[str, tuple] = {}

    # ---------- catalog ----------

    def create_table(self, df, path: str, name: str | None = None, **kw) -> StarTable:
        t = create_table(self.spark, df, path, short_name=name,
                         warehouse=self.warehouse, **kw)
        if name:
            self._tables[name] = t
        return t

    def register(self, name: str, table_or_path) -> StarTable:
        t = (table_or_path if isinstance(table_or_path, StarTable)
             else StarTable.for_path(self.spark, table_or_path))
        self._tables[name] = t
        return t

    def table(self, name: str) -> StarTable:
        if name not in self._tables:
            self._tables[name] = StarTable.for_name(self.spark, name, self.warehouse)
        return self._tables[name]

    def write_to(self, df: DataFrame, identifier: str):
        """``df.writeTo(identifier)`` equivalent (writer_v2.write_to)
        bound to this session's warehouse; accepts short names and
        ``star.`/path``` identifiers."""
        from starlake_spark.writer_v2 import StarWriterV2

        return StarWriterV2(self.spark, df, identifier,
                            warehouse=self.warehouse)

    # ---------- SQL ----------

    def _unsync(self, names) -> None:
        """Forget the sync signature for ``names`` — called by every
        site that drops or shadows a registered name's temp view
        behind _sync_views' back (MV refresh pins, schema probes, DROP
        TABLE), so the next _sync_views rebuilds those views."""
        for n in names:
            self._synced.pop(n, None)

    def _sync_views(self) -> None:
        from starlake_spark.plans.mv import _strip_mv_hidden

        for name, t in self._tables.items():
            if "." in name:
                # dotted (database-qualified) names can't be temp views;
                # sql() rewrites their occurrences to a single-part
                # alias first (_expand_dotted_names)
                continue
            is_mv = (t.info.configuration or {}
                     ).get("is_material_view") == "true"
            # skip rebuilding a view whose table state is unchanged
            # since we last built it: each rebuild costs a fresh scan
            # construction (manifest snapshot + plan), ~50-100 ms per
            # registered table per engine op — pure fixed cost when
            # nothing moved. The signature pins the object identity,
            # path, manifest version and schema version; any commit,
            # alter, or re-register changes it.
            try:
                sig = (id(t), t.store.table_path,
                       t.store.latest_version(),
                       t.info.schema_version, is_mv)
            except Exception:  # noqa: BLE001 - fall back to rebuild
                sig = None
            if sig is not None and self._synced.get(name) == sig:
                continue
            df = t.to_df()
            if is_mv:
                # incremental MVs carry hidden _mv_* partial columns —
                # never user-visible
                df = _strip_mv_hidden(df)
            df.createOrReplaceTempView(name)
            if sig is not None:
                self._synced[name] = sig

    def _load_catalog_names(self, text: str) -> None:
        """Load warehouse-catalog tables the statement mentions into the
        session, so SELECT over a name registered by another session
        (create_table(short_name=...), writeTo-create) resolves without
        an explicit register()/table() call."""
        for name in catalog.list_tables(self.warehouse):
            if name not in self._tables and "." not in name \
                    and re.search(rf"\b{re.escape(name)}\b", text):
                try:
                    self.table(name)
                except Exception:
                    pass

    def _expand_dotted_names(self, text: str) -> str:
        """Rewrite occurrences of DOTTED registered names (``db.name``
        spelling, e.g. ``star.star_test`` — DDLUsingPathSuite.scala:48-66)
        to a stable single-part alias: Spark temp views are single-part,
        so the name itself can't back a view. Matches the raw and the
        fully-backquoted spellings, outside string literals only."""
        import hashlib

        names = set(self._tables) | set(catalog.list_tables(self.warehouse))
        for name in sorted((n for n in names if "." in n),
                           key=len, reverse=True):
            quoted = "`" + "`.`".join(name.split(".")) + "`"
            pat = re.compile(re.escape(quoted) + "|"
                             + r"\b" + re.escape(name) + r"\b")
            if not pat.search(text):
                continue
            alias = "star_name_" + hashlib.md5(name.encode()).hexdigest()[:12]
            if alias not in self._tables:
                self._tables[alias] = (
                    self._tables[name] if name in self._tables
                    else StarTable.for_name(self.spark, name, self.warehouse))
            text = self._sub_outside_quotes(pat, lambda m: alias, text)
        return text

    def sql(self, text: str, rewrite: bool | None = None) -> DataFrame:
        """Run SQL over registered star tables. Star DDL/DML statements
        (CREATE/ALTER/DROP TABLE, UPDATE, DELETE) are routed to the table
        API — the reference's StarLakeCatalog + UpdateTable/DeleteFromTable
        command path (StarLakeCatalog.scala:51-546, StarLakeAnalysis) —
        and SELECT text tries MV rewrite first
        (RewriteQueryByMaterialView.scala:44-1268; any rewrite failure
        silently falls back to the original plan, :1158-1160)."""
        text = self._expand_path_idents(text)
        text = self._expand_dotted_names(text)
        self._load_catalog_names(text)
        handled = self._run_command(text.strip().rstrip(";"))
        if handled is not None:
            return handled
        hit = self._try_metadata_agg(text.strip().rstrip(";"))
        if hit is not None:
            return hit
        text = self._expand_cdf_tvf(text)
        text = self._expand_time_travel(text)
        hit = self._try_setop_pk_rewrite(text.strip().rstrip(";"))
        if hit is not None:
            return hit
        self._sync_views()
        if rewrite is None:
            rewrite = self._mv_enabled
        if rewrite:
            try:
                from starlake_spark.plans import mv

                hit = mv.try_rewrite(self, text)
                if hit is not None:
                    return hit
            except Exception:
                pass
        return self.spark.sql(text)

    # INTERSECT/EXCEPT over exactly the hash (primary-key) columns of
    # two same-bucketed star tables → left-semi/left-anti join with
    # plain equality and no dedup (reference StarLakePostHocAnalysis
    # .scala:29-96; suite StarLakePostHocAnalysisSuite.scala). Matches
    # the reference rule's narrow shape only; anything else falls
    # through to Spark, whose own ReplaceIntersectWithSemiJoin is
    # correct but keeps null-safe keys + a Distinct.
    _SETOP_PK_RE = re.compile(
        r"^\s*SELECT\s+(?P<c1>[`\w]+(?:\s*,\s*[`\w]+)*)\s+FROM\s+"
        r"(?P<a>[\w.]+)\s+(?P<op>INTERSECT|EXCEPT)(?:\s+ALL)?\s+"
        r"SELECT\s+(?P<c2>[`\w]+(?:\s*,\s*[`\w]+)*)\s+FROM\s+"
        r"(?P<b>[\w.]+)\s*$",
        re.IGNORECASE)

    def _try_setop_pk_rewrite(self, text: str):
        m = self._SETOP_PK_RE.match(text)
        if not m or not (self._known(m["a"]) and self._known(m["b"])):
            return None

        def cols(s):
            return [c.strip().strip("`").lower() for c in s.split(",")]

        c1, c2 = cols(m["c1"]), cols(m["c2"])
        ta, tb = self.table(m["a"]), self.table(m["b"])
        ha = [c.lower() for c in ta.info.hash_cols]
        hb = [c.lower() for c in tb.info.hash_cols]
        if not ha or c1 != ha or c2 != hb or ha != hb \
                or ta.info.bucket_num != tb.info.bucket_num \
                or ta.info.bucket_num <= 0:
            return None  # outside the reference rule's shape
        if m["op"].upper() == "INTERSECT":
            return ta.intersect_keys(tb)
        return ta.except_keys(tb)

    # ``star.`/path/to/table``` identifiers (reference
    # DDLUsingPathSuite.scala:89-129: SELECT/DESCRIBE on star.`<path>`;
    # DataFrameWriterV2Suite.scala:418-430 writeTo by path). Each
    # occurrence resolves the path as a star table and substitutes a
    # stable per-path registration, so EVERY statement form (SELECT,
    # DESCRIBE, UPDATE, DELETE, MERGE, COMPACT, VACUUM, ...) accepts
    # path identifiers uniformly. A non-table path fails with the
    # reference's message shape ("<path> doesn't exist").
    _PATH_IDENT_RE = re.compile(r"(?:\bstar\b|`star`)\s*\.\s*`(?P<path>[^`]+)`",
                                re.IGNORECASE)

    def _expand_path_idents(self, text: str) -> str:
        def repl(m):
            return self._path_alias(m["path"])

        return self._sub_outside_quotes(self._PATH_IDENT_RE, repl, text)

    def _path_alias(self, path: str) -> str:
        """Stable internal registration for a path identifier.

        ``star.`x``` where x contains no path separator is the
        DATABASE-qualified spelling (``star`.`star_test`` in the
        reference, DDLUsingPathSuite.scala:48-66) — resolved as the
        registered name ``star.x`` (or plain ``x``), never as a path."""
        import hashlib
        import os as _os

        from starlake_spark.meta import ManifestStore

        if "/" not in path and "\\" not in path:
            for cand in (f"star.{path}", path):
                if self._known(cand):
                    return cand
        key = _os.path.abspath(path)
        if not ManifestStore.is_star_table(key):
            raise ValueError(
                f"Table {path} doesn't exist "
                "(star.`<path>` resolves existing star tables only)")
        name = "star_path_" + hashlib.md5(key.encode()).hexdigest()[:12]
        if name not in self._tables:
            self._tables[name] = StarTable.for_path(self.spark, key)
        return name

    _META_AGG_RE = re.compile(
        r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<name>[\w.]+)\s*$",
        re.IGNORECASE | re.DOTALL)
    _META_AGG_ITEM_RE = re.compile(
        r"^(?:(?P<fn>MIN|MAX)\s*\(\s*`?(?P<col>\w+)`?\s*\)"
        r"|(?P<cnt>COUNT)\s*\(\s*\*\s*\))"
        r"(?:\s+AS\s+`?(?P<alias>\w+)`?)?$",
        re.IGNORECASE)

    def _try_metadata_agg(self, text: str):
        """Aggregate pushdown to the MANIFEST in the SQL layer: a bare
        ``SELECT min(a), max(b), count(*) FROM t`` over a star table is
        answered from write-time footer stats with ZERO Spark jobs
        (StarTable.metadata_agg). Strictly conservative: any WHERE /
        GROUP BY / expression / join — or any column metadata_agg
        refuses (strings, MoR snapshots, DVs, stats-less files) — falls
        through to the normal scan plan, so this can change cost, never
        results."""
        m = self._META_AGG_RE.match(text)
        if not m or not self._known(m["name"]):
            return None
        items = [self._META_AGG_ITEM_RE.match(i.strip())
                 for i in _split_top_level(m["items"])]
        if not items or any(i is None for i in items):
            return None
        t = self.table(m["name"])
        row, names = [], []
        try:
            cache: dict[str, dict] = {}
            for im in items:
                if im["cnt"]:
                    row.append(t.metadata_count())
                    names.append(im["alias"] or "count(1)")
                else:
                    col = im["col"]
                    if col not in cache:
                        cache[col] = t.metadata_agg(col)
                    fn = im["fn"].lower()
                    row.append(cache[col][fn])
                    names.append(im["alias"] or f"{fn}({col})")
        except ValueError:
            return None  # not exactly servable — run the real plan
        schema = T.StructType.fromJson(json.loads(t.info.schema_json))
        types = {f.name: f.dataType for f in schema.fields}
        fields = []
        for im, n in zip(items, names):
            if im["cnt"]:
                fields.append(T.StructField(n, T.LongType()))
            else:
                fields.append(T.StructField(n, types[im["col"]]))
        return local_df(self.spark, [tuple(row)],
                                          T.StructType(fields))

    _CDF_TVF_RE = re.compile(
        r"table_changes\(\s*'(?P<name>[\w.]+)'\s*,\s*"
        r"(?:(?P<start>\d+)|TIMESTAMP\s+'(?P<tstart>[^']+)')\s*"
        r"(?:,\s*(?:(?P<end>\d+)|TIMESTAMP\s+'(?P<tend>[^']+)')\s*)?\)",
        re.IGNORECASE)

    def _expand_cdf_tvf(self, text: str) -> str:
        """Delta-parity ``table_changes('t', start[, end])`` table-valued
        function: each occurrence becomes a temp view over the typed
        change feed (always carries ``_change_type`` — delete_delta
        commits surface as delete rows, Delta CDF semantics)."""
        import uuid as _uuid

        from starlake_spark.sources.datasource import table_changes

        def repl(m):
            if not self._known(m["name"]):
                return m.group(0)
            t = self.table(m["name"])
            from starlake_spark.table import _to_epoch

            kw = {}
            if m["tstart"]:
                kw["starting_timestamp"] = _to_epoch(m["tstart"])
            else:
                kw["start_version"] = int(m["start"])
            if m["tend"]:
                kw["ending_timestamp"] = _to_epoch(m["tend"])
            elif m["end"]:
                kw["end_version"] = int(m["end"])
            df = table_changes(
                self.spark, t.store.table_path,
                with_change_type=True, **kw)
            vn = f"_star_cdf_{_uuid.uuid4().hex[:12]}"
            df.createOrReplaceTempView(vn)
            return vn

        text = self._sub_outside_quotes(self._CDF_TVF_RE, repl, text)
        return self._sub_outside_quotes(self._RANGE_TVF_RE,
                                        self._range_tvf_repl, text)

    _RANGE_TVF_RE = re.compile(
        r"range_changes\(\s*'(?P<name>[\w.]+)'\s*,\s*(?P<start>\d+)\s*"
        r"(?:,\s*(?P<end>\d+)\s*)?\)",
        re.IGNORECASE)

    def _range_tvf_repl(self, m):
        """``range_changes('t', start[, end])`` TVF: the COALESCED net
        state diff of the commit window — one update pair per key no
        matter how many commits churned it (the sync-job / incremental-
        maintenance read shape), vs table_changes' per-commit history."""
        import uuid as _uuid

        from starlake_spark.sources.datasource import range_changes

        if not self._known(m["name"]):
            return m.group(0)
        t = self.table(m["name"])
        df = range_changes(
            self.spark, t.store.table_path, int(m["start"]),
            end_version=int(m["end"]) if m["end"] else None)
        vn = f"_star_rcdf_{_uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(vn)
        return vn

    @staticmethod
    def _sub_outside_quotes(rx, repl, text: str) -> str:
        """Apply ``rx`` replacements only where the MATCH STARTS outside
        a single-quoted SQL literal — a string containing e.g.
        "VERSION AS OF 1" must never be rewritten, while a legitimate
        match may still consume a trailing quoted operand (the
        TIMESTAMP AS OF '<ts>' value)."""
        spans = [m.span() for m in re.finditer(r"'[^']*'", text)]

        def _inside(pos: int) -> bool:
            return any(a < pos < b for a, b in spans)

        out, last = [], 0
        for m in rx.finditer(text):
            if _inside(m.start()):
                continue
            out.append(text[last:m.start()])
            out.append(repl(m))
            last = m.end()
        out.append(text[last:])
        return "".join(out)

    _TT_RE = re.compile(
        r"\b(?P<name>[\w.]+)\s+(?:FOR\s+)?(?:SYSTEM_)?"
        r"(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+(?P<val>\d+|'[^']*')",
        re.IGNORECASE)

    def _expand_time_travel(self, text: str) -> str:
        """Spark/Delta time-travel SELECT syntax: ``FROM t [FOR]
        VERSION AS OF n`` / ``TIMESTAMP AS OF '<ts>'`` over registered
        star tables — each occurrence becomes a temp view of the
        historical snapshot (versioned schema included, so old versions
        read under the columns they had then). Non-star names pass
        through to Spark untouched."""
        import uuid as _uuid

        def repl(m):
            if not self._known(m["name"]):
                return m.group(0)
            t = self.table(m["name"])
            if m["kind"].upper() == "VERSION":
                df = t.to_df(version=int(m["val"]))
            else:
                df = t.to_df(timestamp=m["val"].strip("'"))
            vn = f"_star_tt_{_uuid.uuid4().hex[:12]}"
            df.createOrReplaceTempView(vn)
            return vn

        return self._sub_outside_quotes(self._TT_RE, repl, text)

    # ---------- SQL command routing (StarLakeCatalog.scala:51-546) ----------

    def _empty_df(self) -> DataFrame:
        return local_df(self.spark, [], T.StructType([]))

    def _merge_from_sql(self, m) -> DataFrame:
        """MERGE INTO t [AS a] USING (src|(<subquery>)) [AS b] ON cond
        WHEN MATCHED THEN UPDATE SET */c=expr,... | DELETE
        WHEN NOT MATCHED THEN INSERT * | (cols) VALUES (exprs)
        → StarTable.merge (dml.merge_into). Beyond the reference's SQL
        surface (its catalog stops at upsert)."""
        talias = m["talias"] or "t"
        salias = m["salias"] or "s"
        src_text = m["src"].strip()
        self._sync_views()
        if src_text.startswith("("):
            source = self.spark.sql(src_text[1:-1])
        else:
            source = self.spark.table(src_text)

        clauses = m["clauses"]
        matched_update = None
        mu = _MERGE_UPDATE_RE.search(clauses)
        if mu:
            sets = mu["sets"].strip()
            if sets == "*":
                matched_update = "*"
            else:
                matched_update = {}
                for part in _split_top_level(sets):
                    col, _, expr = part.partition("=")
                    matched_update[col.strip().strip("`")] = expr.strip()
        matched_delete = bool(_MERGE_DELETE_RE.search(clauses))
        not_matched_insert = None
        if _MERGE_INSERT_STAR_RE.search(clauses):
            not_matched_insert = "*"
        else:
            mi = _MERGE_INSERT_RE.search(clauses)
            if mi:
                cols = [c.strip().strip("`") for c in _split_top_level(mi["cols"])]
                vals = _split_top_level(mi["vals"])
                if len(cols) != len(vals):
                    raise ValueError("MERGE INSERT: column/value count mismatch")
                not_matched_insert = dict(zip(cols, (v.strip() for v in vals)))
        nmbs_update = None
        mb = _MERGE_NMBS_UPDATE_RE.search(clauses)
        if mb:
            nmbs_update = {}
            for part in _split_top_level(mb["sets"].strip()):
                col, _, expr = part.partition("=")
                nmbs_update[col.strip().strip("`")] = expr.strip()
        nmbs_delete = bool(_MERGE_NMBS_DELETE_RE.search(clauses))
        self.table(m["target"]).merge(
            source, m["on"].strip(),
            matched_update=matched_update,
            matched_delete=matched_delete,
            not_matched_insert=not_matched_insert,
            target_alias=talias, source_alias=salias,
            not_matched_by_source_update=nmbs_update,
            not_matched_by_source_delete=nmbs_delete)
        return self._empty_df()

    def _insert_from_sql(self, m) -> DataFrame:
        """INSERT INTO | OVERWRITE t [(cols)] VALUES ... | SELECT ... —
        ANSI positional semantics: without a column list the query must
        produce the table's full width in schema order; with one, listed
        columns bind by position and unlisted columns land as typed
        nulls (partition/hash columns must be listed — the writer's
        NOT NULL invariant enforces that). Routing matches the table's
        ingest primitive (WriteIntoTable.scala:44-146, :96-97 — appends
        to primary-key tables are forbidden): INSERT INTO a hash table
        upserts by key; non-hash tables append; OVERWRITE replaces.
        Unknown columns are an error, never silent schema evolution."""
        t = self.table(m["name"])
        self._sync_views()
        df = self.spark.sql(m["body"].strip())
        schema = T.StructType.fromJson(json.loads(t.info.schema_json))
        # PARTITION (p = 'x'[, q]) clause (InsertIntoTableSuite static /
        # dynamic clauses): static entries pin a range-partition value
        # for every row (and under OVERWRITE scope the replacement to
        # that partition — Spark's static overwrite mode); dynamic
        # entries just name partition columns the query must produce.
        # Non-partition columns in the clause are an error.
        static_parts: dict[str, str] = {}
        dyn_parts: list[str] = []
        if m["part"]:
            rng = set(t.info.range_cols)
            for entry in _split_top_level(m["part"]):
                col, eq, val = entry.partition("=")
                col = col.strip().strip("`")
                if col not in rng:
                    raise ValueError(
                        f"PARTITION clause: '{col}' is not a range "
                        f"partition column of {m['name']} "
                        f"(partitions: {sorted(rng)})")
                if eq:
                    static_parts[col] = val.strip()
                else:
                    dyn_parts.append(col)
        if m["cols"]:
            names = [c.strip().strip("`") for c in _split_top_level(m["cols"])]
            declared = {f.name for f in schema.fields}
            unknown = [c for c in names if c not in declared]
            if unknown:
                raise ValueError(f"INSERT: unknown column(s) {unknown} in "
                                 f"{m['name']}")
            clash = [c for c in names if c in static_parts]
            if clash:
                raise ValueError(f"INSERT: column(s) {clash} appear both "
                                 "in the column list and as static "
                                 "PARTITION values")
        else:
            # dynamic PARTITION columns bind LAST (Spark's positional
            # contract for INSERT ... PARTITION (p) SELECT ..., p)
            names = [f.name for f in schema.fields
                     if f.name not in static_parts
                     and f.name not in dyn_parts] + dyn_parts
        if len(df.columns) != len(names):
            raise ValueError(
                f"INSERT: query produces {len(df.columns)} columns, "
                f"expected {len(names)} ({names})")
        df = df.toDF(*names)
        types = {f.name: f.dataType for f in schema.fields}
        for col, val in static_parts.items():
            df = df.withColumn(col, F.expr(val).cast(types[col]))
        names = names + list(static_parts)
        missing = [f for f in schema.fields if f.name not in names]
        if missing:
            defaults = {k[len("default."):]: v
                        for k, v in (t.info.configuration or {}).items()
                        if k.startswith("default.")}
            df = df.select(
                *names,
                *[(F.expr(defaults[f.name]) if f.name in defaults
                   else F.lit(None)).cast(f.dataType).alias(f.name)
                  for f in missing])
        overwrite = m["mode"].upper() == "OVERWRITE"
        if t.info.hash_cols and not overwrite:
            t.upsert(df)
        elif overwrite and static_parts:
            # static overwrite mode: replace ONLY the pinned partition
            rw = " AND ".join(f"{c} = {v}" for c, v in static_parts.items())
            t.write(df, mode="overwrite", replace_where=rw)
        else:
            t.write(df, mode="overwrite" if overwrite else "append")
        return self._empty_df()

    def _run_command(self, text: str) -> DataFrame | None:
        """Dispatch star DDL/DML text; None = not a command (fall through
        to the SELECT path). DML on names not registered as star tables is
        also passed through, matching the reference which only intercepts
        its own catalog's tables."""
        # error parity: DDL the reference refuses for star tables
        # (NotSupportedDDLSuite.scala:112-167) gets a clear refusal
        # instead of a fall-through to spark.sql and a confusing
        # catalog error; statements on unknown tables still pass through
        for rx, what in _UNSUPPORTED_DDL:
            m = rx.match(text)
            if m and (m.groupdict().get("name") is None
                      or self._known(m.group("name"))):
                raise ValueError(
                    f"{what} is not supported for star tables")

        m = _UPDATE_RE.match(text)
        if m and self._known(m["name"]):
            t = self.table(m["name"])
            self._sync_views()
            sets = {}
            for clause in _split_top_level(m["sets"]):
                col, _, expr = clause.partition("=")
                if not expr:
                    raise ValueError(f"bad SET clause: {clause!r}")
                sets[col.strip()] = F.expr(expr.strip())
            cond = F.expr(m["where"]) if m["where"] else F.lit(True)
            t.update(cond, sets)
            return self._empty_df()

        m = re.match(r"^\s*COPY\s+INTO\s+(?P<name>[\w.]+)\s+FROM\s+"
                     r"'(?P<src>[^']+)'"
                     r"(?:\s+FILEFORMAT\s*=\s*(?P<fmt>\w+))?\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            n = self.table(m["name"]).copy_into(
                m["src"], file_format=(m["fmt"] or "parquet").lower())
            return local_df(self.spark, [(n,)],
                                              "num_inserted_rows long")

        m = re.match(r"^\s*TRUNCATE\s+TABLE\s+(?P<name>[\w.]+)"
                     rf"(?:\s+PARTITION\s*\((?P<part>{_PAREN_BODY})\))?\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            t = self.table(m["name"])
            if m["part"]:
                pins: dict[str, str] = {}
                for entry in _split_top_level(m["part"]):
                    col, eq, val = entry.partition("=")
                    col = col.strip().strip("`")
                    if col not in t.info.range_cols or not eq:
                        raise ValueError(
                            f"TRUNCATE PARTITION: '{col}' is not a range "
                            f"partition column of {m['name']}")
                    pins[col] = val.strip()
                if set(pins) == set(t.info.range_cols):
                    # fully-pinned partition: metadata-only expire —
                    # zero jobs, the 100 TB shape (DropPartitionCommand)
                    rv = ",".join(f"{c}={_unquote_literal(pins[c])}"
                                  for c in t.info.range_cols)
                    t.drop_partition(rv)
                else:
                    # partial pin: predicate delete over the matching
                    # partitions (still partition-pruned)
                    t.delete(F.expr(" AND ".join(
                        f"{c} = {v}" for c, v in pins.items())))
            else:
                t.delete(None)  # expire every partition, history retained
            return self._empty_df()

        m = _DELETE_RE.match(text)
        if m and self._known(m["name"]):
            t = self.table(m["name"])
            self._sync_views()
            t.delete(F.expr(m["where"]) if m["where"] else None)
            return self._empty_df()

        m = _MERGE_RE.match(text)
        if m and self._known(m["target"]):
            return self._merge_from_sql(m)

        m = _INSERT_RE.match(text)
        if m and self._known(m["name"]):
            return self._insert_from_sql(m)

        m = _DROP_RE.match(text)
        if m and self._known(m["name"]):
            from starlake_spark.plans import mv as _mv

            name = m["name"]
            self.table(name).drop_table()
            self._tables.pop(name, None)
            try:
                catalog.unregister(name, self.warehouse)
            except Exception:
                pass
            self.spark.catalog.dropTempView(name)
            self._unsync([name])
            # cascade: views built on the dropped table go with it
            # (DropTableCommand.scala:30-247)
            _mv.drop_views_on(self, name)
            return self._empty_df()

        m = _ALTER_ADD_RE.match(text)
        if m and self._known(m["name"]):
            cols, comments, positions = [], {}, {}
            for entry in _split_top_level(m["cols"]):
                em = _ADDCOL_ENTRY_RE.match(entry)
                if not em:
                    raise ValueError(f"cannot parse ADD COLUMNS entry: "
                                     f"{entry!r}")
                path = _unquote_path(em["path"])
                cols.append((path, em["type"].strip()))
                if em["comment"] is not None:
                    comments[path] = _unescape_sql_str(em["comment"])
                if em["first"]:
                    positions[path] = "first"
                elif em["after"]:
                    positions[path] = f"after:{em['after'].strip('`')}"
            self.table(m["name"]).add_columns(cols, comments=comments,
                                              positions=positions)
            return self._empty_df()

        m = _ALTER_ADDCHECK_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).add_constraint(m["cname"], m["expr"].strip())
            return self._empty_df()

        m = _ALTER_DROPCHECK_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).drop_constraint(m["cname"])
            return self._empty_df()

        m = _ALTER_DROPNOTNULL_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).relax_nullability(m["col"])
            return self._empty_df()

        m = _ALTER_SETNOTNULL_RE.match(text)
        if m and self._known(m["name"]):
            # reference DDLSuite.scala:111-134: nullable -> NOT NULL is
            # not supported (existing files may already hold nulls, and
            # proving otherwise means a full validation scan)
            raise ValueError(
                f"ALTER COLUMN {m['col']} SET NOT NULL is not supported: "
                "tightening nullability cannot be enforced on existing "
                "files without a full scan (DDLSuite.scala:111-134)")

        m = _ALTER_SETDEFAULT_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).set_column_default(m["col"], m["expr"].strip())
            return self._empty_df()

        m = _ALTER_DROPDEFAULT_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).drop_column_default(m["col"])
            return self._empty_df()

        m = _ALTER_CHANGETYPE_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).change_column_type(m["col"], m["type"].strip())
            return self._empty_df()

        m = _ALTER_CHANGE_RE.match(text)
        if m and self._known(m["name"]):
            from starlake_spark.table import (_parse_dtype,
                                              _transform_struct_at)
            from pyspark.sql import types as _T

            path = _unquote_path(m["path"])
            new = m["new"].strip("`")
            leaf = path.split(".")[-1]
            t = self.table(m["name"])
            if new.lower() != leaf.lower():
                # reference AlterTableTests.scala:662-667 (change name)
                raise ValueError(
                    f"Renaming a column via CHANGE COLUMN is not "
                    f"supported ('{path}' to '{new}') — use ALTER TABLE "
                    f"RENAME COLUMN")
            info = t.store.table_info(refresh=True)
            schema = _T.StructType.fromJson(json.loads(info.schema_json))
            found: dict = {}

            def probe(struct: _T.StructType) -> _T.StructType:
                for f in struct.fields:
                    if f.name.lower() == leaf.lower():
                        found["f"] = f
                if "f" not in found:
                    raise ValueError(
                        f"Cannot update missing field {path} in "
                        f"{struct.simpleString()}")
                return struct

            _transform_struct_at(schema, path.split(".")[:-1], probe, path)
            cur = found["f"]
            want = _parse_dtype(m["type"].strip())
            if cur.dataType.simpleString() != want.simpleString():
                # reference AlterTableTests.scala:669-689 (incompatible)
                # + :994-1022 (complex add/remove through CHANGE): any
                # type difference through CHANGE COLUMN is refused
                raise ValueError(
                    f"Cannot change column type through CHANGE COLUMN: "
                    f"'{path}' with type "
                    f"'{type(cur.dataType).__name__} "
                    f"(nullable = {str(cur.nullable).lower()})' to "
                    f"'{new}' with type '{type(want).__name__} "
                    f"(nullable = true)' is not supported — safe "
                    f"widenings go through ALTER COLUMN ... TYPE")
            pos = ("first" if m["first"]
                   else f"after:{m['after'].strip('`')}" if m["after"]
                   else None)
            if m["comment"] is not None or pos is not None:
                t.change_column(path, comment=_unescape_sql_str(m["comment"]),
                                position=pos)
            return self._empty_df()

        m = _ALTER_RENAME_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).rename_column(m["old"], m["new"])
            return self._empty_df()

        m = _ALTER_SETPROPS_RE.match(text)
        if m and self._known(m["name"]):
            self.table(m["name"]).set_properties(_parse_kv(m["props"]))
            return self._empty_df()

        m = _ALTER_UNSETPROPS_RE.match(text)
        if m and self._known(m["name"]):
            keys = [k.strip().strip("'\"") for k in _split_top_level(m["props"])]
            self.table(m["name"]).unset_properties(keys)
            return self._empty_df()

        m = _ALTER_DROPCOLS_RE.match(text)
        if m and self._known(m["name"]):
            cols = [c.strip().strip("`") for c in m["cols"].split(",") if c.strip()]
            self.table(m["name"]).drop_columns(cols)
            return self._empty_df()

        m = _RESTORE_RE.match(text)
        if m and self._known(m["name"]):
            if m["version"] is not None:
                self.table(m["name"]).restore(int(m["version"]),
                                              partition=m["part"])
            else:
                self.table(m["name"]).restore(timestamp=m["ts"],
                                              partition=m["part"])
            return self._empty_df()

        m = _CLONE_RE.match(text)
        if m and self._known(m["src"]):
            loc = re.search(r"\bLOCATION\s+'([^']+)'", text, re.IGNORECASE)
            if not loc:
                raise ValueError("CREATE TABLE ... CLONE requires LOCATION '<path>'")
            version = int(m["version"]) if m["version"] else None
            if m["ts"]:
                from starlake_spark.table import _to_epoch

                version = self.table(m["src"]).store.version_at_timestamp(
                    _to_epoch(m["ts"]))
            shallow = (m["mode"] or "SHALLOW").upper() == "SHALLOW"
            self._tables[m["name"]] = self.table(m["src"]).clone(
                loc.group(1), version=version, shallow=shallow,
                short_name=m["name"], warehouse=self.warehouse)
            return self._empty_df()

        m = re.match(
            r"^\s*FSCK\s+(?:(?P<repair>REPAIR)\s+)?TABLE\s+"
            r"(?P<name>[\w.]+)(?:\s+(?P<deep>DEEP))?\s*$",
            text, re.IGNORECASE)
        if m and self._known(m["name"]):
            issues = self.table(m["name"]).fsck(
                deep=bool(m["deep"]), repair=bool(m["repair"]))
            return local_df(self.spark, 
                [(i["kind"], i.get("partition"), i["path"],
                  bool(i["repairable"]), i.get("detail"))
                 for i in issues],
                "kind string, partition string, path string, "
                "repairable boolean, detail string")

        m = re.match(
            r"^\s*SYNC\s+TABLE\s+(?P<name>[\w.]+)\s+FROM\s+(?P<src>[\w.]+)"
            r"(?:\s+LOCATION\s+'(?P<loc>[^']+)')?"
            r"(?:\s+(?P<full>FULL))?\s*$",
            text, re.IGNORECASE)
        if m and self._known(m["src"]):
            from starlake_spark.operators.replication import sync_table

            if self._known(m["name"]):
                dst_path = self.table(m["name"]).store.table_path
            elif m["loc"]:
                dst_path = m["loc"]
            else:
                raise ValueError(
                    "SYNC TABLE: unknown replica table "
                    f"'{m['name']}' — bootstrap needs LOCATION '<path>'")
            t, st = sync_table(self.spark, self.table(m["src"]), dst_path,
                               full=bool(m["full"]))
            self._tables[m["name"]] = t
            return local_df(self.spark, 
                [(st["mode"], st["from_version"], st["to_version"],
                  st.get("upserted"), st.get("deleted"))],
                "mode string, from_version long, to_version long, "
                "upserted long, deleted long")

        m = re.match(
            r"^\s*CONVERT\s+TO\s+STAR\s+'(?P<path>[^']+)'"
            r"(?:\s+AS\s+(?P<name>[\w.]+))?"
            r"(?:\s+PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\))?\s*$",
            text, re.IGNORECASE)
        if m:
            from starlake_spark.table import convert_to_star

            parts = [c.strip() for c in (m["parts"] or "").split(",") if c.strip()]
            t = convert_to_star(self.spark, m["path"],
                                range_partitions=parts or None,
                                short_name=m["name"], warehouse=self.warehouse)
            if m["name"]:
                self._tables[m["name"]] = t
            return self._empty_df()

        m = _CREATE_RE.match(text)
        if m and re.search(r"\bUSING\s+star\b", m["tail"], re.IGNORECASE):
            return self._create_from_sql(m["name"], m["tail"])

        m = re.match(r"^\s*SHOW\s+TABLES\s*$", text, re.IGNORECASE)
        if m:
            rows = [(n, p) for n, p in sorted(catalog.list_tables(self.warehouse).items())]
            rows += [(n, t.store.table_path) for n, t in sorted(self._tables.items())
                     if n not in catalog.list_tables(self.warehouse)]
            return local_df(self.spark, 
                rows or [], "table_name string, location string")

        m = re.match(r"^\s*DESC(?:RIBE)?\s+HISTORY\s+(?P<name>[\w.]+)\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            return self.table(m["name"]).history()

        m = re.match(r"^\s*DESC(?:RIBE)?\s+DETAIL\s+(?P<name>[\w.]+)\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            t = self.table(m["name"])
            info, s = t.info, t.stats()
            return local_df(self.spark, 
                [(info.table_id, t.store.table_path,
                  list(info.range_cols), list(info.hash_cols),
                  info.bucket_num, t.store.latest_version(),
                  s["num_files"], s["total_bytes"], s["approx_rows"],
                  s["num_partitions"])],
                "table_id string, location string, range_cols array<string>, "
                "hash_cols array<string>, bucket_num int, version long, "
                "num_files long, total_bytes long, approx_rows long, "
                "num_partitions long")

        m = re.match(r"^\s*SHOW\s+PARTITIONS\s+(?P<name>[\w.]+)\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            return self.table(m["name"]).partitions()

        m = re.match(r"^\s*SHOW\s+TBLPROPERTIES\s+(?P<name>[\w.]+)\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            props = self.table(m["name"]).info.configuration or {}
            return local_df(self.spark, 
                sorted(props.items()) or [], "key string, value string")

        m = re.match(r"^\s*SHOW\s+COLUMNS\s+(?:FROM|IN)\s+(?P<name>[\w.]+)\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            schema = T.StructType.fromJson(
                json.loads(self.table(m["name"]).info.schema_json))
            return local_df(self.spark, 
                [(f.name,) for f in schema.fields], "col_name string")

        m = re.match(r"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?"
                     r"(?P<ext>EXTENDED\s+|FORMATTED\s+)?(?P<name>[\w.]+)\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            t = self.table(m["name"])
            info = t.info
            schema = T.StructType.fromJson(json.loads(info.schema_json))
            rows = [(f.name, f.dataType.simpleString(),
                     "range partition" if f.name in info.range_cols
                     else "hash partition" if f.name in info.hash_cols else "")
                    for f in schema.fields]
            rows.append(("# bucket_num", str(info.bucket_num), ""))
            if m["ext"]:
                # DESCRIBE EXTENDED detail section (reference
                # DDLUsingPathSuite.scala:113-129 checks Provider +
                # Location key/value rows)
                rows += [
                    ("", "", ""),
                    ("# Detailed Table Information", "", ""),
                    ("Table ID", info.table_id, ""),
                    ("Location", t.store.table_path, ""),
                    ("Provider", "star", ""),
                ]
            return local_df(self.spark, 
                rows, "col_name string, data_type string, comment string")

        m = re.match(r"^\s*COMPACT\s+(?:TABLE\s+)?(?P<name>[\w.]+)"
                     rf"(?:\s+PARTITION\s*\((?P<part>{_PAREN_BODY})\))?\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            part = None
            if m["part"]:
                part = ",".join(
                    "=".join(_unquote_literal(s) for s in
                             p.split("=", 1))
                    for p in _split_top_level(m["part"]))
            self.table(m["name"]).compaction(force=True, partition=part)
            return self._empty_df()

        # OPTIMIZE t SMALL FILES [THRESHOLD <n> MB] — bin-packing merge
        # of sub-threshold files only (dml.compact_small_files)
        m = re.match(r"^\s*OPTIMIZE\s+(?P<name>[\w.]+)\s+SMALL\s+FILES"
                     r"(?:\s+THRESHOLD\s+(?P<mb>\d+)\s*MB)?\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            kw = {}
            if m["mb"]:
                kw["threshold_bytes"] = int(m["mb"]) * 1024 * 1024
            n = self.table(m["name"]).compact_small_files(**kw)
            return local_df(self.spark, [(n,)], "files_merged int")

        # OPTIMIZE t [WHERE <range-partition predicate>]
        #            [ZORDER BY (a, b)] — Delta-style alias for the
        # clustered compaction rewrite (dml.compact sort_columns); the
        # WHERE selects partitions to rewrite (maintenance-window
        # pattern: optimize only recent days), metadata-only evaluation
        m = re.match(r"^\s*OPTIMIZE\s+(?P<name>[\w.]+)"
                     r"(?:\s+WHERE\s+(?P<pred>.+?))?"
                     r"(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]*)\))?\s*$",
                     text, re.IGNORECASE | re.DOTALL)
        if m and self._known(m["name"]):
            cols = ([c.strip().strip("`") for c in m["cols"].split(",") if c.strip()]
                    if m["cols"] else None)
            mode = "zorder" if cols and len(cols) > 1 else "linear"
            self.table(m["name"]).compaction(force=True, sort_columns=cols,
                                             partition_predicate=m["pred"],
                                             cluster_mode=mode)
            return self._empty_df()

        m = re.match(r"^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+"
                     r"(?P<name>[\w.]+)\s*$", text, re.IGNORECASE)
        if m and self._known(m["name"]):
            root = self.table(m["name"]).generate_symlink_manifest()
            return local_df(self.spark, [(root,)], "manifest_root string")

        m = re.match(r"^\s*VACUUM\s+(?P<name>[\w.]+)(?:\s+RETAIN\s+"
                     r"(?P<hours>[\d.]+)\s+HOURS?)?"
                     r"(?:\s+EXPIRE\s+MANIFESTS\s+OLDER\s+THAN\s+"
                     r"(?P<mhours>[\d.]+)\s+HOURS?)?"
                     r"(?P<dry>\s+DRY\s+RUN)?\s*$",
                     text, re.IGNORECASE)
        if m and self._known(m["name"]):
            kw = {"dry_run": bool(m["dry"])}
            if m["hours"]:
                kw["retention_s"] = float(m["hours"]) * 3600.0
            if m["mhours"]:
                kw["manifest_retention_s"] = float(m["mhours"]) * 3600.0
            removed = self.table(m["name"]).cleanup(**kw)
            return local_df(self.spark, 
                [(p,) for p in removed] or [], "removed_file string")

        return None

    def _known(self, name: str) -> bool:
        if name in self._tables:
            return True
        try:
            catalog.resolve(name, self.warehouse)
            return True
        except Exception:
            return False

    def _create_from_sql(self, name: str, tail: str) -> DataFrame:
        """CREATE TABLE name [(col type, ...)] USING star [OPTIONS(...)]
        [PARTITIONED BY (...)] [LOCATION 'path'] [AS SELECT ...] —
        clause order free, as in Spark DDL. Either a column list
        (schema-only create: committed empty, range partition columns
        reordered last exactly as Spark/the reference lay them out —
        DataFrameWriterV2Suite.scala:279-293) or a CTAS body is
        required; LOCATION defaults to ``<warehouse>/<name>`` (the
        reference derives the path from the session warehouse the same
        way, catalog/StarLakeCatalog.scala:118-125)."""
        import os as _os

        loc = re.search(r"\bLOCATION\s+'([^']+)'", tail, re.IGNORECASE)
        location = (loc.group(1) if loc else
                    _os.path.join(self.warehouse or catalog.DEFAULT_WAREHOUSE,
                                  name))
        part = re.search(r"\bPARTITIONED\s+BY\s*\(([^)]*)\)", tail, re.IGNORECASE)
        opts_m = re.search(r"\b(?:OPTIONS|TBLPROPERTIES)\s*\((.*?)\)\s*(?:PARTITIONED|LOCATION|AS\b|$)",
                           tail, re.IGNORECASE | re.DOTALL)
        sel = re.search(r"\bAS\s+(SELECT\b.+)$", tail, re.IGNORECASE | re.DOTALL)
        cols_m = re.match(r"^\s*\((?P<cols>.+?)\)\s*(?:USING|PARTITIONED|"
                          r"OPTIONS|TBLPROPERTIES|LOCATION)\b",
                          tail, re.IGNORECASE | re.DOTALL)
        if not sel and not cols_m:
            raise ValueError("CREATE TABLE ... USING star needs a column "
                             "list or a CTAS body (AS SELECT ...)")
        opts = _parse_kv(opts_m.group(1)) if opts_m else {}
        if sel:
            df = self.sql(sel.group(1))
        else:
            schema = T._parse_datatype_string(cols_m["cols"])
            rng = ([c.strip().strip("`") for c in part.group(1).split(",")
                    if c.strip()] if part else [])
            order = ([f.name for f in schema.fields if f.name not in rng]
                     + [f.name for f in schema.fields if f.name in rng])
            schema = T.StructType(
                sorted(schema.fields, key=lambda f: order.index(f.name)))
            df = local_df(self.spark, [], schema)
        range_cols = ([c.strip() for c in part.group(1).split(",") if c.strip()]
                      if part else _csv_opt(opts, "rangePartitions"))
        hash_cols = _csv_opt(opts, "hashPartitions")
        bucket_num = int(opts.get("hashBucketNum", -1))
        # every other OPTIONS/TBLPROPERTIES key is a table property
        # (dml.delta.enabled, compaction.auto, bloom.index.cols, ...)
        known = {"rangepartitions", "hashpartitions", "hashbucketnum"}
        extra = {k: v for k, v in opts.items() if k.lower() not in known}
        t = self.create_table(df, location, name=name,
                              range_partitions=range_cols,
                              hash_partitions=hash_cols,
                              hash_bucket_num=bucket_num,
                              configuration=extra or None)
        self._tables[name] = t
        return self._empty_df()

    # ---------- materialized views ----------

    def create_material_view(self, name: str, path: str, sql_text: str,
                             auto_update: bool = False) -> StarTable:
        from starlake_spark.plans import mv

        return mv.create_material_view(self, name, path, sql_text, auto_update)

    def update_material_view(self, name: str) -> None:
        from starlake_spark.plans import mv

        mv.update_material_view(self, name)


def _parse_kv(text: str) -> dict[str, str]:
    """``'k' = 'v', k2 = v2`` (OPTIONS/TBLPROPERTIES body) → dict."""
    out = {}
    for item in _split_top_level(text):
        k, _, v = item.partition("=")
        if not v:
            raise ValueError(f"bad OPTIONS/TBLPROPERTIES entry: {item!r}")
        out[k.strip().strip("'\"")] = v.strip().strip("'\"")
    return out


def _csv_opt(opts: dict[str, str], key: str) -> list[str]:
    raw = opts.get(key, "")
    return [c.strip() for c in raw.split(",") if c.strip()]
