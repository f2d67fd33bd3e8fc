"""File-level min/max statistics and predicate pruning for LakeRepo.

Delta/Iceberg-style data skipping: every staged write records a per-file
stats manifest (``_stats.json`` next to the parquet files — the leading
underscore keeps Spark's reader from picking it up as data), built from
the parquet FOOTERS pyarrow already wrote — no extra Spark job, no data
scan. A conservative predicate evaluator then classifies each file for a
given WHERE condition as *may-contain-matches* or *provably-match-free*,
so DELETE/UPDATE rewrite only the overlapping files (the rest are carried
into the new commit by reference — copy-on-write at file granularity,
the same cost model as Delta without deletion vectors) and reads can skip
files the predicate excludes.

Scale shape: the manifest is KB-sized metadata per file group, evaluated
driver-side like every other commit-metadata decision in the repo; at
100 TB the win is proportional to clustering quality — a table compacted
with ``sort_by``/``zorder_by`` (``LakeRepo.compact``) has near-disjoint
per-file ranges, so a selective DELETE rewrites O(matching files), not
O(table). For point lookups on UNCLUSTERED columns — where ranges can
never exclude anything — opt-in per-file bloom indexes (r7, see the
bloom section below) restore file skipping at 1 KiB of manifest
metadata per file per column. Correctness never depends on the stats: every decision is an
over-approximation (unknown → may-match), and an unparseable predicate
disables pruning entirely.

The reference's DML path (Delta via lakeFS, ``jobs/vdt4.py:39-47``)
rewrites whole snapshots; this module is the scan/DML pruning layer the
reference delegates to Delta's own stats. No reference code reused.
"""

from __future__ import annotations

import json
import os
import re
from decimal import Decimal
from typing import Iterable


STATS_NAME = "_stats.json"

# ---------------------------------------------------------------------------
# Stats collection (parquet footer reads — pyarrow, driver-side, no Spark job)
# ---------------------------------------------------------------------------


def _jsonable(v):
    """Footer min/max → JSON-storable scalar, or None if the type is not
    one we prune on (bytes, dates, timestamps, decimals, nested)."""
    if isinstance(v, bool) or v is None:
        return None  # booleans: equality pruning is near-worthless; skip
    if isinstance(v, int) and not isinstance(v, bool):
        return v
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return None  # NaN/inf bounds are not trustworthy orderings
        return v
    if isinstance(v, str):
        return v
    return None


def file_stats(path: str) -> dict | None:
    """Per-column {min,max,nulls} + row count for one parquet file, from
    its footer. Columns whose stats are absent, non-scalar, or of an
    unsupported type are omitted (→ never pruned on). Returns None if the
    footer can't be read."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:
        return None
    rows = md.num_rows
    cols: dict[str, dict] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name or name in bad:
                continue  # nested leaves: not prunable as top-level cols
            st = c.statistics
            if st is None:
                bad.add(name)
                cols.pop(name, None)
                continue
            nulls = st.null_count if st.has_null_count else None
            entry = cols.setdefault(name, {"min": None, "max": None, "nulls": 0})
            if nulls is None:
                entry["nulls"] = None
            elif entry["nulls"] is not None:
                entry["nulls"] += nulls
            if not st.has_min_max:
                # all-null row group is fine (no values to bound); any
                # other reason for missing bounds poisons the column
                if nulls is not None and nulls == g.num_rows:
                    continue
                bad.add(name)
                cols.pop(name, None)
                continue
            lo, hi = _jsonable(st.min), _jsonable(st.max)
            if lo is None or hi is None:
                bad.add(name)
                cols.pop(name, None)
                continue
            entry["min"] = lo if entry["min"] is None else min(entry["min"], lo)
            entry["max"] = hi if entry["max"] is None else max(entry["max"], hi)
    # the file's top-level column NAME list, independent of stats
    # quality (r11): schema-evolved metadata aggregates need to tell "a
    # file from an era before this column existed" (reads as all-NULL →
    # contributes zero to COUNT(col)) apart from "the column is there
    # but its stats were stripped" (must decline). Manifests persisted
    # before this key simply decline those items — conservative.
    try:
        names = sorted(
            {
                md.schema.column(i).path.split(".", 1)[0]
                for i in range(md.num_columns)
            }
        )
    except Exception:
        names = None
    out = {"rows": rows, "cols": cols}
    if names is not None:
        out["names"] = names
    return out


def _part_files(group_dir: str) -> list[str]:
    """Data files under a group dir, relative to it, sorted."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(group_dir):
        for fn in filenames:
            if fn.startswith(("_", ".")) or not fn.endswith(".parquet"):
                continue
            out.append(os.path.relpath(os.path.join(dirpath, fn), group_dir))
    return sorted(out)


def _partition_values(rel: str) -> dict[str, object]:
    """Hive ``key=value`` segments of a part-file's path inside its
    group. Only values Spark will read back EXACTLY as the path spells
    them are kept: canonical integers (typed int), and percent-decoded
    strings containing no characters Spark's partition-type inference
    would coerce (digits, '.', '-', ':' could make it a number, date, or
    timestamp whose post-cast comparisons the raw string can't mirror).
    Everything else yields no stats → never pruned on. The null
    partition records as an all-null marker downstream."""
    from urllib.parse import unquote

    out: dict[str, object] = {}
    for seg in rel.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, raw = seg.partition("=")
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[k] = None
            continue
        v = unquote(raw)
        try:
            if str(int(v)) == v:
                out[k] = int(v)
                continue
        except ValueError:
            pass
        if v and not any(c.isdigit() or c in ".-:" for c in v):
            out[k] = v
    return out


def _inject_partition_stats(st: dict, rel: str) -> None:
    # EVERY partition key in the path joins the name list, including
    # keys whose value _partition_values declines as unrepresentable:
    # the name list must say "this file HAS the column" so a
    # metadata aggregate probing it finds the name, misses the stats,
    # and DECLINES — omitting it would read as "era predates the
    # column" and silently contribute zero (r11 review)
    if "names" in st:
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k = seg.partition("=")[0]
                if k not in st["names"]:
                    st["names"].append(k)
    for k, v in _partition_values(rel).items():
        if v is None:
            st["cols"][k] = {"min": None, "max": None, "nulls": st["rows"]}
        else:
            st["cols"][k] = {"min": v, "max": v, "nulls": 0}


def _collect_group_stats(group_dir: str) -> dict | None:
    """Per-file stats for every part file of a group (footer reads +
    path-derived partition values), or None if any footer is unreadable."""
    files: dict[str, dict] = {}
    for rel in _part_files(group_dir):
        st = file_stats(os.path.join(group_dir, rel))
        if st is None:
            return None
        _inject_partition_stats(st, rel)
        files[rel] = st
    return {"files": files} if files else None


def nullable_schema_json(schema) -> str | None:
    """A Spark schema as canonical JSON with every nullability flag set
    and field metadata stripped — exactly what parquet footer inference
    of the same files returns. Two writes of the same logical schema
    normalize to the same string, so the read-side fast path (pin the
    stored schema, skip the JVM footer-inference roundtrip) hits across
    appends regardless of per-frame nullability drift.

    Returns None (record nothing → reads fall back to inference) when the
    schema contains a type parquet footers do not round-trip verbatim —
    CHAR/VARCHAR infer back as STRING, and TIMESTAMP_NTZ's inferred type
    depends on the reading session's ``inferTimestampNTZ`` config — so a
    pinned read can never return a schema inference would not (r14
    advice; the supported envelope is everything else Spark writes to
    parquet)."""
    from pyspark.sql.types import (
        ArrayType,
        CharType,
        MapType,
        StructField,
        StructType,
        TimestampNTZType,
        VarcharType,
    )

    no_roundtrip = (CharType, VarcharType, TimestampNTZType)

    def norm(dt):
        if isinstance(dt, no_roundtrip):
            raise _NoRoundtrip()
        if isinstance(dt, StructType):
            return StructType(
                [StructField(f.name, norm(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, ArrayType):
            return ArrayType(norm(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(norm(dt.keyType), norm(dt.valueType), True)
        return dt

    try:
        return norm(schema).json()
    except _NoRoundtrip:
        return None


class _NoRoundtrip(Exception):
    """Internal: schema contains a non-footer-round-tripping type."""


def write_group_stats(group_dir: str, spark_schema_json: str | None = None) -> dict | None:
    """Build + persist the stats manifest for a freshly written file
    group. Partition values from the path ride along as exact
    min=max=value column stats, so predicates on partition columns prune
    too. ``spark_schema_json`` (non-partitioned writes only — partition
    columns live in dir names, not footers) records the written frame's
    normalized Spark schema so reads can skip footer inference.
    Best-effort: any failure leaves the group without a manifest
    (pruning then treats every file as may-match)."""
    try:
        manifest = _collect_group_stats(group_dir)
        if manifest is None:
            return None
        if spark_schema_json is not None:
            manifest["spark_schema"] = spark_schema_json
        tmp = os.path.join(group_dir, STATS_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(group_dir, STATS_NAME))
        return manifest
    except Exception:
        return None


def read_group_manifest(group_dir: str) -> dict | None:
    """The PERSISTED manifest only — None when missing or corrupt, no
    footer fallback. For callers that must stay zero-read (SHOW
    PARTITIONS lists partition dirs from the manifests' per-file rel
    paths; a data read there would defeat the point)."""
    p = os.path.join(group_dir, STATS_NAME)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def load_group_stats(group_dir: str) -> dict | None:
    """Manifest for a group dir; falls back to computing from footers for
    groups written before stats existed (not persisted — historical dirs
    stay immutable)."""
    if os.path.exists(os.path.join(group_dir, STATS_NAME)):
        return read_group_manifest(group_dir)
    return _collect_group_stats(group_dir)


# ---------------------------------------------------------------------------
# Optional per-file bloom indexes (r7): equality/IN pruning beyond min/max
# ---------------------------------------------------------------------------
#
# Min/max zonemaps only skip files when the table is clustered on the
# probed column; a point lookup on an UNCLUSTERED key scans everything.
# An opt-in per-(file, column) bloom filter fixes that: 1 KiB of bits
# per file answers "does this file possibly contain v?" with zero false
# negatives, so `WHERE k = v` DML/reads rewrite/scan only the files
# whose bloom fires — Parquet/Iceberg bloom-index semantics at the
# manifest level. Opt-in (``write_table(bloom_cols=...)`` /
# ``add_bloom_stats``) because the build must READ the column (pyarrow,
# driver-side, file-local — unlike the footer-only default stats path);
# at 100 TB the build cost rides the write, the probe cost is metadata.
# Correctness never depends on it: any malformed/absent/unsupported
# bloom is simply "may match", and floats never use blooms (canonical
# form is only defined for ints and strings).

BLOOM_M = 8192  # bits (1 KiB) per file per column
BLOOM_K = 4


def _bloom_canon(v) -> bytes | None:
    """Canonical probe bytes: defined for ints and strings only (floats
    and others → None → bloom bypassed). Cross-type equality (int col
    probed with a string literal or vice versa) never reaches the bloom:
    _Cmp.can_match gates the probe on literal type == column type, since
    Spark's PromoteStrings coercion can equate values whose canonical
    bytes differ (5 vs '05')."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, str):
        return v.encode("utf-8")
    return None


def _bloom_positions(canon: bytes, m: int = BLOOM_M) -> list[int]:
    import hashlib

    d = hashlib.md5(canon).digest()
    return [int.from_bytes(d[4 * i : 4 * i + 4], "big") % m for i in range(BLOOM_K)]


def _bloom_from_values(values) -> dict | None:
    import base64

    bits = bytearray(BLOOM_M // 8)
    for v in values:
        if v is None:
            continue
        c = _bloom_canon(v)
        if c is None:
            return None  # unsupported value type → no bloom for this file
        for pos in _bloom_positions(c):
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"m": BLOOM_M, "k": BLOOM_K, "b64": base64.b64encode(bytes(bits)).decode()}


def build_file_blooms(path: str, cols: list[str]) -> dict[str, dict]:
    """Blooms over one parquet file's non-null values for every column
    in ``cols``, read in ONE pass over the file. Columns that are absent
    or hold an unsupported type are simply missing from the result (the
    file then has no bloom for them and stays may-match)."""
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        present = [c for c in cols if c in pf.schema_arrow.names]
        if not present:
            return {}
        t = pf.read(columns=present)
    except Exception:
        return {}
    out: dict[str, dict] = {}
    for c in present:
        b = _bloom_from_values(t.column(c).to_pylist())
        if b is not None:
            out[c] = b
    return out


def build_file_bloom(path: str, col: str) -> dict | None:
    """Single-column convenience wrapper over :func:`build_file_blooms`."""
    return build_file_blooms(path, [col]).get(col)


def add_bloom_stats(group_dir: str, cols: Iterable[str]) -> bool:
    """Augment a freshly written group's persisted manifest with
    per-file blooms for ``cols``. Only groups that already carry a
    manifest are touched (historical dirs stay immutable); best-effort
    like the rest of the stats layer."""
    p = os.path.join(group_dir, STATS_NAME)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            manifest = json.load(f)
        want = list(cols)
        for rel, fst in manifest.get("files", {}).items():
            # one parquet open + one read covers every requested column
            built = build_file_blooms(os.path.join(group_dir, rel), want)
            if built:
                fst.setdefault("bloom", {}).update(built)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, p)
        return True
    except Exception:
        return False


def _bloom_may_contain(bloom: dict, lit) -> bool:
    """False ONLY when the bloom proves absence; anything unexpected
    (bad shape, unsupported literal) is may-contain."""
    import base64

    c = _bloom_canon(lit)
    if c is None:
        return True
    try:
        if bloom.get("k") != BLOOM_K:
            return True
        m = bloom["m"]
        bits = base64.b64decode(bloom["b64"])
        if m != len(bits) * 8:
            return True
        return all(bits[p >> 3] & (1 << (p & 7)) for p in _bloom_positions(c, m))
    except Exception:
        return True


def _col_bloom(stats: dict, col: str) -> dict | None:
    blooms = stats.get("bloom", {})
    b = blooms.get(col)
    if b is None:
        k = {c.lower(): c for c in blooms}.get(col.lower())
        b = blooms.get(k) if k is not None else None
    return b


# ---------------------------------------------------------------------------
# Conservative predicate → can-this-file-match evaluator
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<bq>`[^`]+`)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><=|>=|!=|<>|==|=|<|>)
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<comma>,)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN", "IS", "NULL", "TRUE", "FALSE"}


def _tokenize(cond: str) -> list[tuple[str, object]] | None:
    toks: list[tuple[str, object]] = []
    i = 0
    while i < len(cond):
        m = _TOKEN_RE.match(cond, i)
        if not m:
            if cond[i:].strip() == "":
                break
            return None
        i = m.end()
        if m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            t = m.group("num")
            toks.append(("lit", float(t) if ("." in t or "e" in t.lower()) else int(t)))
        elif m.group("bq") is not None:
            toks.append(("ident", m.group("bq")[1:-1]))
        elif m.group("word") is not None:
            w = m.group("word")
            if w.upper() in _KEYWORDS:
                toks.append(("kw", w.upper()))
            else:
                toks.append(("ident", w))
        elif m.group("op") is not None:
            op = m.group("op")
            toks.append(("op", {"==": "=", "<>": "!="}.get(op, op)))
        elif m.group("lp"):
            toks.append(("lp", "("))
        elif m.group("rp"):
            toks.append(("rp", ")"))
        elif m.group("comma"):
            toks.append(("comma", ","))
    return toks


class _Unknown:
    """Sub-expression pruning can't reason about → always may-match."""

    def can_match(self, stats: dict) -> bool:
        return True


class _Bool:
    def __init__(self, kind: str, parts: list):
        self.kind = kind  # "and" | "or"
        self.parts = parts

    def can_match(self, stats: dict) -> bool:
        if self.kind == "and":
            return all(p.can_match(stats) for p in self.parts)
        return any(p.can_match(stats) for p in self.parts)


def _num(v):
    """Exact comparable for ints/floats via Decimal (avoids 2^53 float
    collapse); strings compare as themselves."""
    if isinstance(v, (int, float)):
        return Decimal(str(v))
    return v


def _comparable(a, b) -> bool:
    na, nb = isinstance(a, (int, float)), isinstance(b, (int, float))
    return (na and nb) or (isinstance(a, str) and isinstance(b, str))


class _Cmp:
    """col <op> literal (normalized: column on the left)."""

    def __init__(self, col: str, op: str, lit):
        self.col, self.op, self.lit = col, op, lit

    def can_match(self, stats: dict) -> bool:
        if self.op == "=" and self.lit is not None:
            # bloom proof of absence beats min/max (works on UNCLUSTERED
            # columns where the range always overlaps) — but ONLY when the
            # literal's type matches the column's: Spark's PromoteStrings
            # coercion makes `int_col = '05'` TRUE for 5 while the canon
            # bytes differ (b'05' vs b'5'), so a cross-type probe could
            # prove absence of a value the engine would match. Same-type
            # equality is coercion-free, so zero false negatives hold.
            ent0 = _col_entry(stats, self.col)
            lo0 = ent0[0] if ent0 is not None else None
            same_type = (
                type(lo0) is int and type(self.lit) is int
            ) or (isinstance(lo0, str) and isinstance(self.lit, str))
            if same_type:
                b = _col_bloom(stats, self.col)
                if b is not None and not _bloom_may_contain(b, self.lit):
                    return False
        ent = _col_entry(stats, self.col)
        if ent is None:
            return True
        if self.lit is None:
            return False  # `col <op> NULL` is never TRUE in SQL
        lo, hi, nn = ent
        if nn == 0:
            return False  # all-null file: no comparison row is TRUE
        if lo is None or hi is None or not _comparable(lo, self.lit):
            return True
        # floating-point columns may hold NaN, which parquet footers
        # EXCLUDE from min/max while Spark orders it greater than every
        # value (and NaN = NaN is TRUE): any operator a NaN row could
        # satisfy must stay may-match
        if isinstance(lo, float) or isinstance(hi, float):
            if self.op in (">", ">=", "!="):
                return True
        lo, hi, v = _num(lo), _num(hi), _num(self.lit)
        if self.op == "=":
            return lo <= v <= hi
        if self.op == "!=":
            return not (lo == hi == v)
        if self.op == "<":
            return lo < v
        if self.op == "<=":
            return lo <= v
        if self.op == ">":
            return hi > v
        if self.op == ">=":
            return hi >= v
        return True


class _Between:
    def __init__(self, col: str, lo, hi):
        self.col, self.lo, self.hi = col, lo, hi

    def can_match(self, stats: dict) -> bool:
        return _Bool(
            "and", [_Cmp(self.col, ">=", self.lo), _Cmp(self.col, "<=", self.hi)]
        ).can_match(stats)


class _In:
    def __init__(self, col: str, lits: list):
        self.col, self.lits = col, lits

    def can_match(self, stats: dict) -> bool:
        return any(_Cmp(self.col, "=", v).can_match(stats) for v in self.lits)


class _IsNull:
    def __init__(self, col: str, negated: bool):
        self.col, self.negated = col, negated

    def can_match(self, stats: dict) -> bool:
        rows = stats.get("rows")
        cols = stats.get("cols", {})
        ent = cols.get(self.col)
        if ent is None:
            k = {c.lower(): c for c in cols}.get(self.col.lower())
            ent = cols.get(k) if k is not None else None
        if ent is None or rows is None:
            return True
        nulls = ent.get("nulls")
        if nulls is None:
            return True
        return (rows - nulls) > 0 if self.negated else nulls > 0


def _col_entry(stats: dict, col: str):
    """(min, max, non_null_count|None) for a column, case-insensitive;
    None if the column has no usable stats."""
    cols = stats.get("cols", {})
    ent = cols.get(col)
    if ent is None:
        lower = {k.lower(): k for k in cols}
        k = lower.get(col.lower())
        if k is None:
            return None
        ent = cols[k]
    rows = stats.get("rows")
    nulls = ent.get("nulls")
    nn = (rows - nulls) if (rows is not None and nulls is not None) else None
    return ent.get("min"), ent.get("max"), nn


class _Parser:
    """Recursive descent over the token list. Primaries that don't fit
    the supported grammar are *recovered* as `_Unknown` (skip to the next
    AND/OR/`)` at this nesting level), so `a < 5 AND f(b) = 1` still
    prunes on `a < 5`. A structural failure (unbalanced parens, garbage
    tokens) aborts the whole parse → no pruning."""

    def __init__(self, toks: list):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        e = self.or_expr()
        if self.peek()[0] is not None:
            return None  # trailing tokens we never consumed: bail out
        return e

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == ("kw", "OR"):
            self.take()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else _Bool("or", parts)

    def and_expr(self):
        parts = [self.unary()]
        while self.peek() == ("kw", "AND"):
            self.take()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else _Bool("and", parts)

    def unary(self):
        if self.peek() == ("kw", "NOT"):
            self.take()
            self.unary()  # consume the operand; NOT itself is opaque
            return _Unknown()
        return self.primary()

    def primary(self):
        start = self.i
        kind, val = self.peek()
        if kind == "lp":
            save = self.i
            self.take()
            inner = self.or_expr()
            if self.peek()[0] == "rp":
                self.take()
                return inner
            self.i = save  # not a bare parenthesized boolean → recover
            return self._recover(start)
        e = self._comparison()
        if e is None:
            return self._recover(start)
        return e

    def _comparison(self):
        kind, val = self.peek()
        # literal <op> ident (flip) or ident <op> literal / IS / BETWEEN / IN
        if kind == "lit":
            save = self.i
            self.take()
            okind, op = self.peek()
            if okind == "op":
                self.take()
                ikind, col = self.peek()
                if ikind == "ident":
                    self.take()
                    flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
                    return _Cmp(col, flip.get(op, op), val)
            self.i = save
            return None
        if kind != "ident":
            return None
        col = self.take()[1]
        okind, op = self.peek()
        if okind == "op":
            self.take()
            lkind, lit = self.peek()
            if lkind == "lit":
                self.take()
                return _Cmp(col, op, lit)
            if (lkind, lit) == ("kw", "NULL"):
                self.take()
                return _Cmp(col, op, None)
            if lkind == "kw" and lit in ("TRUE", "FALSE"):
                self.take()
                return _Unknown()  # boolean cols: not collected; stay safe
            return None
        if (okind, op) == ("kw", "IS"):
            self.take()
            negated = False
            if self.peek() == ("kw", "NOT"):
                self.take()
                negated = True
            if self.peek() == ("kw", "NULL"):
                self.take()
                return _IsNull(col, negated)
            return None
        if (okind, op) == ("kw", "BETWEEN"):
            self.take()
            lk, lo = self.peek()
            if lk != "lit":
                return None
            self.take()
            if self.peek() != ("kw", "AND"):
                return None
            self.take()
            hk, hi = self.peek()
            if hk != "lit":
                return None
            self.take()
            return _Between(col, lo, hi)
        if (okind, op) == ("kw", "IN"):
            self.take()
            if self.peek()[0] != "lp":
                return None
            self.take()
            lits = []
            while True:
                lk, lv = self.peek()
                if lk != "lit":
                    return None
                self.take()
                lits.append(lv)
                nk, _ = self.peek()
                if nk == "comma":
                    self.take()
                    continue
                if nk == "rp":
                    self.take()
                    return _In(col, lits)
                return None
        return None

    def _recover(self, start: int):
        """Skip an unsupported primary: consume until AND/OR/`)` at this
        level (or end). Unbalanced nesting aborts the parse."""
        self.i = start
        depth = 0
        consumed = 0
        while True:
            kind, val = self.peek()
            if kind is None:
                break
            if kind == "lp":
                depth += 1
            elif kind == "rp":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and (kind, val) in (("kw", "AND"), ("kw", "OR")):
                break
            self.take()
            consumed += 1
        if consumed == 0:
            raise _ParseAbort()
        return _Unknown()


class _ParseAbort(Exception):
    pass


def parse_predicate(cond: str):
    """Compile a WHERE condition into a can_match(stats) evaluator, or
    None if the text can't be handled even conservatively."""
    toks = _tokenize(cond)
    if toks is None or not toks:
        return None
    try:
        return _Parser(toks).parse()
    except _ParseAbort:
        return None


def fully_supported(tree) -> bool:
    """True when no part of the parsed predicate was recovered as opaque.
    DML pruning requires this: a recovered subtree still prunes SAFELY,
    but the condition may then contain constructs (subqueries, functions)
    the pruned rewrite can't re-execute outside the SQL rewriter."""
    if tree is None or isinstance(tree, _Unknown):
        return False
    if isinstance(tree, _Bool):
        return all(fully_supported(p) for p in tree.parts)
    return isinstance(tree, (_Cmp, _Between, _In, _IsNull))


# ---------------------------------------------------------------------------
# File-list pruning
# ---------------------------------------------------------------------------


def collect_per_file_stats(
    root: str, rel_entries: Iterable[str]
) -> list[dict] | None:
    """The per-file stats records of a snapshot's entries — group
    manifests expanded, loose files footer-read, partition constants
    injected — or None when any group lacks usable stats."""
    per_file: list[dict] = []
    for rel in rel_entries:
        full = os.path.join(root, rel)
        if os.path.isdir(full):
            manifest = load_group_stats(full)
            if not manifest or not manifest.get("files"):
                return None
            per_file.extend(manifest["files"].values())
        else:
            st = file_stats(full)
            if st is None:
                return None
            _inject_partition_stats(st, rel)
            per_file.append(st)
    return per_file


def metadata_aggregate(
    root: str,
    rel_entries: Iterable[str],
    items: list[tuple[str, str]],
    aliases: dict[str, list[str]] | None = None,
    per_file: list[dict] | None = None,
) -> list | None:
    """Answer COUNT(*) / COUNT(col) / MIN(col) / MAX(col) from stats
    manifests alone — zero data-file reads. ``items`` is a list of
    ``(fn, arg)`` with fn ∈ {count, min, max}, arg ``*`` or a column.
    Returns the value list (positionally matching ``items``) or None
    when the manifests can't answer EXACTLY, which falls back to a scan:

    - any file group without stats, or a probed column without footer
      stats / null counts, declines;
    - MIN/MAX on string-typed stats declines: parquet footers may
      TRUNCATE string bounds (safe to prune on — a widened range — but
      not to report as the exact extremum);
    - all-null files contribute to counts but not bounds; an all-null
      column answers MIN/MAX as SQL NULL.

    ``aliases`` (r11, schema-evolved tables) maps a probed column to its
    per-era PHYSICAL names, newest first: each file is probed under the
    first alias its recorded name list contains; a file containing NONE
    of them predates the column (it reads all-NULL there) and
    contributes zero to COUNT(col). Files whose manifests predate the
    name list decline unless an alias has stats directly — absence
    would be indistinguishable from stripped stats.

    At 100 TB this turns the most common dashboard probes into pure
    metadata reads (Delta/Iceberg answer COUNT(*) the same way).

    ``per_file`` lets a caller issuing SEVERAL aggregate calls over the
    same snapshot (ANALYZE TABLE's per-column loop) load the manifests
    ONCE via ``collect_per_file_stats`` instead of once per call.
    """
    if per_file is None:
        per_file = collect_per_file_stats(root, rel_entries)
        if per_file is None:
            return None

    out: list = []
    for fn, arg in items:
        if fn == "count" and arg == "*":
            out.append(sum(st["rows"] for st in per_file))
            continue
        acc = None
        total = 0
        aliased = bool(aliases and arg in aliases)
        low_aliases = [a.lower() for a in aliases[arg]] if aliased else []
        found_any = not aliased
        for st in per_file:
            if st["rows"] == 0:
                continue
            probe = arg
            if aliased:
                # match case-insensitively (Spark resolution is), but
                # probe the stats under the file's OWN spelling; a miss
                # on the recorded name list means the era predates the
                # column (all NULL here), a miss on a legacy manifest
                # (no name list) is ambiguous and declines
                names = st.get("names")
                pool = names if names is not None else st["cols"]
                lowered = {n.lower(): n for n in pool}
                probe = next(
                    (lowered[a] for a in low_aliases if a in lowered), None
                )
                if probe is None:
                    if names is not None:
                        continue
                    return None
                found_any = True
            ent = st["cols"].get(probe)
            if ent is None:
                return None  # column lacks stats in this file — no exact answer
            if fn == "count":
                if ent.get("nulls") is None:
                    return None
                total += st["rows"] - ent["nulls"]
                continue
            lo, hi = ent.get("min"), ent.get("max")
            if lo is None or hi is None:
                # all-null file contributes no bound; anything else is
                # missing stats
                if ent.get("nulls") == st["rows"]:
                    continue
                return None
            if isinstance(lo, str) or isinstance(hi, str):
                return None  # footer string bounds may be truncated
            v = lo if fn == "min" else hi
            if acc is None:
                acc = v
            else:
                acc = min(acc, v) if fn == "min" else max(acc, v)
        if not found_any:
            # no file carries ANY era name: for a real rename-lineage
            # column at least one era's files store it — this is a typo
            # (the scan path raises) or pathological; never answer 0
            return None
        out.append(total if fn == "count" else acc)
    return out


def prune_file_list(
    root: str, rel_entries: Iterable[str], cond: str
) -> tuple[list[str], list[str], dict] | None:
    """Exception-safe wrapper around :func:`_prune_file_list` — ANY
    failure in stats loading or predicate evaluation means "pruning
    unavailable", never a crashed DML/read."""
    try:
        return _prune_file_list(root, rel_entries, cond)
    except Exception:
        return None


def _prune_file_list(
    root: str, rel_entries: Iterable[str], cond: str
) -> tuple[list[str], list[str], dict] | None:
    """Split a snapshot's file entries into (safe, candidates, info) for
    a WHERE condition: *safe* entries provably contain no matching row
    and can be carried by reference; *candidates* may. Returns None when
    pruning is unavailable (unparseable predicate).

    Granularity: flat file groups split per part-file; Hive-partitioned
    groups (``key=value`` subdirs — partition values live in paths, not
    footers, and single-file reads would drop the partition columns) and
    stats-less groups stay atomic: all-safe or all-candidate.
    """
    pred = parse_predicate(cond)
    if pred is None:
        return None
    safe: list[str] = []
    cand: list[str] = []
    rows_cand = 0
    rows_known = True
    for rel in rel_entries:
        full = os.path.join(root, rel)
        if os.path.isfile(full):
            # already a part-file reference (from a prior pruned rewrite)
            st = load_group_stats(os.path.dirname(full))
            fst = (st or {}).get("files", {}).get(os.path.basename(full))
            if fst is None:
                cand.append(rel)
                rows_known = False
            elif pred.can_match(fst):
                cand.append(rel)
                rows_cand += fst["rows"]
            else:
                safe.append(rel)
            continue
        comps = rel.split("/")
        if len(comps) > 3 and comps[0] == "data" and os.path.isdir(full):
            # a partition-subdir reference from a previous pruned rewrite:
            # classify it as one unit from its group's manifest (whose
            # file keys carry the partition segments)
            group_full = os.path.join(root, *comps[:3])
            sub = "/".join(comps[3:])
            per = (load_group_stats(group_full) or {}).get("files", {})
            pfiles = [p for p in per if os.path.dirname(p) == sub or p.startswith(sub + "/")]
            if pfiles and all(not pred.can_match(per[p]) for p in pfiles):
                safe.append(rel)
            else:
                cand.append(rel)
                if pfiles:
                    rows_cand += sum(per[p]["rows"] for p in pfiles)
                else:
                    rows_known = False
            continue
        st = load_group_stats(full)
        parts = _part_files(full) if os.path.isdir(full) else []
        partitioned = any("/" in p for p in parts)
        per = (st or {}).get("files", {})
        if st is None or not parts:
            # stats-less group: candidate unless every file proves safe
            if parts and per and all(
                p in per and not pred.can_match(per[p]) for p in parts
            ):
                safe.append(rel)
            else:
                cand.append(rel)
                if parts and per and all(p in per for p in parts):
                    rows_cand += sum(per[p]["rows"] for p in parts)
                else:
                    rows_known = False
            continue
        if partitioned:
            # Hive layout: the unit is a PARTITION DIR (its files share
            # the path-encoded values; reads re-attach them via basePath,
            # so carried-by-reference subdirs keep the partition columns)
            by_dir: dict[str, list[str]] = {}
            for p in parts:
                by_dir.setdefault(os.path.dirname(p), []).append(p)
            g_safe: list[str] = []
            g_cand: list[str] = []
            g_rows = 0
            g_known = True
            for pdir, pfiles in sorted(by_dir.items()):
                prel = os.path.join(rel, pdir) if pdir else rel
                have = all(p in per for p in pfiles)
                if have and all(not pred.can_match(per[p]) for p in pfiles):
                    g_safe.append(prel)
                else:
                    g_cand.append(prel)
                    if have:
                        g_rows += sum(per[p]["rows"] for p in pfiles)
                    else:
                        g_known = False
            # all-one-way groups collapse back to the single dir entry
            # (no reason to fragment the snapshot's file list)
            if not g_cand:
                safe.append(rel)
            elif not g_safe:
                cand.append(rel)
                rows_cand += g_rows
                rows_known = rows_known and g_known
            else:
                safe.extend(g_safe)
                cand.extend(g_cand)
                rows_cand += g_rows
                rows_known = rows_known and g_known
            continue
        for p in parts:
            prel = os.path.join(rel, p)
            fst = per.get(p)
            if fst is None:
                cand.append(prel)
                rows_known = False
            elif pred.can_match(fst):
                cand.append(prel)
                rows_cand += fst["rows"]
            else:
                safe.append(prel)
    info = {"candidate_rows": rows_cand if rows_known else None}
    return safe, cand, info
