"""Versioned parquet table store — the engine's mutable-table substrate.

The reference's target engine (ClickHouse MergeTree) supports DROP /
TRUNCATE / DELETE WHERE / ALTER UPDATE, and — crucially — its parts
model makes an INSERT cost O(inserted), never O(table)
(``clickhouse/jdbsChSession.scala:284-298`` relies on exactly that for
the incremental load ops). Spark parquet files are immutable and
Delta/Iceberg jars are not in this image, so the store implements the
same parts idea directly: a table snapshot is a **manifest of
immutable data files**, and every mutation commits a new manifest plus
only the *delta* files:

    <root>/<schema>/<table>/data/g-<id>/part-*.parquet   (file groups)
    <root>/<schema>/<table>/manifests/m-<id>.json        (snapshot roots)
    <root>/<schema>/<table>/manifests/s-<id>.json        (file-list shards)
    <root>/<schema>/<table>/_current                     (atomic pointer)

Snapshot manifests are SHARDED (r11): the root holds the schema,
groups, and a per-shard index (counts + aggregated column min/max);
the file entries live in immutable ``s-*`` shards shared across
snapshots by name — Iceberg's manifest-list/manifest-file split. A
delta commit (append) serializes only its new shard + the KB-sized
root: O(delta + segments), never O(all files); targeted rewrites
reserialize only the shards that lost files. Measured at 1e6 file
entries: ~3 ms per delta commit, flat vs a 1e4-entry table
(test_manifest_sharded_commit_flat_at_1e6_files).

- ``append``       = write delta group + manifest listing old∪new files
                     (pure file adds — an append never rewrites or even
                     reads pre-existing data files).
- ``delete_where`` = rewrite ONLY the files that contain matching rows
                     (file pruning via a pushed-down probe scan).
- ``replace_files``= targeted rewrite primitive used by keyed updates.
- ``write``        = fresh single-group snapshot (recreate/overwrite).

Each manifest carries per-file row counts and column min/max taken
from the parquet footers (pyarrow, driver-side — at cluster scale this
is a tiny metadata job exactly like Iceberg's manifest scan), so
``row_count`` and the O3 watermark probe ``max_value`` are pure
metadata reads: **zero Spark jobs**, matching the role of
``system.tables.total_rows`` / ``MaxValAndCnt`` in the reference
(``jdbsChSession.scala:206-220``, ``:93-121``).

Readers never observe a half-written table: data files land first,
the manifest file lands next, and a single ``os.replace`` of the
pointer publishes the snapshot. Garbage collection is *retention
based* (keep the last ``keep_versions`` manifests AND everything
younger than ``retention_sec``), so a concurrent lazy plan still
executing against a recent snapshot cannot have its files deleted
from under it by a quick pair of writes. All commits to one store
root serialize on a process-wide per-root lock shared across
endpoints (/task and /calc hold separate busy-flags but one store).

Reference operations mapped here:
- drop/create (``clickhouse/jdbsChSession.scala:238-263``) → new snapshot
- truncate (``:693-700``) → empty manifest (schema retained)
- delete where (``:222-236``) → file-pruned rewrite
- ALTER UPDATE via dict (``:61-91``) → ``replace_files`` merge (operators/)
- OPTIMIZE FINAL (``:387-398``) → ``compact``
"""

from __future__ import annotations

import base64
import contextlib
import datetime
import decimal
import hashlib
import json
import os
import re
import shutil
import threading
import time
import urllib.parse
import uuid

try:  # POSIX only — the cross-process commit lock (r13); absent on
    import fcntl  # Windows, where commits degrade to in-process safety
except ImportError:  # pragma: no cover
    fcntl = None

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class TableNotFound(KeyError):
    pass


class SchemaMismatch(TypeError):
    """Additive schema evolution refused a column type change."""


class StoreConflict(RuntimeError):
    """A targeted rewrite raced a concurrent commit: some file it
    meant to replace is no longer in the manifest, so its replacement
    data was computed from a stale snapshot."""


# one commit lock per store root, shared by every TableStore instance in
# the process (the /task scheduler and /calc service each construct their
# own TableStore over the same root)
_ROOT_LOCKS: dict[str, threading.RLock] = {}
_ROOT_LOCKS_GUARD = threading.Lock()

# group dirs being written but not yet referenced by any manifest —
# GC must not treat them as orphans (data writes deliberately run
# OUTSIDE the commit lock so parallel loads don't serialize)
_INFLIGHT_GROUPS: set[str] = set()
_INFLIGHT_GUARD = threading.Lock()


def _root_lock(root: str) -> threading.RLock:
    # realpath, not abspath: two spellings of a symlinked root must
    # share ONE RLock, or both threads enter the commit-critical
    # section together (the flock layer below additionally keys its
    # reentrancy by owning thread, so even an aliased root that
    # realpath cannot unify — bind mounts, hardlinked dirs — blocks
    # rather than being admitted as a false re-entry)
    key = os.path.realpath(root)
    with _ROOT_LOCKS_GUARD:
        if key not in _ROOT_LOCKS:
            _ROOT_LOCKS[key] = threading.RLock()
        return _ROOT_LOCKS[key]


# ---- cross-process commit lock (r13) ---------------------------------
# The per-root RLock serializes commit metadata within ONE process; two
# PROCESSES appending to the same table would each read the same base
# manifest and the second pointer swap silently discard the first's
# delta (a classic lost update — at multi-job scale concurrent writers
# are the norm; the reference only serializes within its single server
# via the busy guard, ``server/WServer.scala:38-52``, but this store is
# a library used beyond that scheduler). Commits therefore also hold an
# ``fcntl.flock`` on ``<root>/<schema>/.locks/<table>.lock`` — a
# PER-TABLE advisory lock the kernel releases automatically on process
# death (no stale-lock recovery needed, unlike O_EXCL lockfiles). The
# lockfile lives OUTSIDE the table directory so ``drop`` can't delete
# it from under blocked waiters. Reentrancy within a process is
# tracked explicitly: flock conflicts BETWEEN fds of the same process,
# so a second acquisition while the root RLock is already held must
# not re-flock. With the file lock held, every mutation path re-reads
# the pointer before committing, so delta commits land on the true
# current base (both appends survive) and targeted rewrites detect the
# moved base and raise ``StoreConflict`` loudly — never a silent loss.
_COMMIT_LOCK_DIR = ".locks"
_FLOCK_HELD: dict[str, list] = {}  # lock path -> [fd, depth, owner tid]

# commit-path GC amortization state: (root, schema, table) ->
# (commits since last scan, last scan time) — process-local by
# design; each process amortizes its own commit latency and debris
# stays bounded per process (see TableStore.__init__ gc_every)
_GC_AMORT: dict[tuple, tuple] = {}
_GC_AMORT_GUARD = threading.Lock()
_FLOCK_GUARD = threading.Lock()


def _flock_open(path: str) -> int:
    """Open+flock ``path``, robust to the file being unlinked while we
    waited (re-stat the inode after acquiring; retry on mismatch)."""
    while True:
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            st_fd = os.fstat(fd)
            try:
                st_path = os.stat(path)
            except OSError:
                os.close(fd)
                continue  # unlinked while we waited — lock the new file
            if (st_fd.st_ino, st_fd.st_dev) != (st_path.st_ino, st_path.st_dev):
                os.close(fd)
                continue
            return fd
        except OSError:
            os.close(fd)
            raise


# ---- sharded snapshot manifests (r11) -------------------------------
# The snapshot manifest is SPLIT into a small root (``m-*.json``:
# schema, groups, per-segment index) plus immutable file-list segment
# shards (``s-*.json``), so a delta commit serializes only the NEW
# segment + the root index — O(delta + segments), never O(all files).
# Segments are content-immutable and shared across snapshots by name
# (structural sharing — exactly Iceberg's manifest-list/manifest-file
# split; the r10 verdict measured the single-JSON manifest at 4.5 s /
# 30 MB per commit at 1e5 file entries, ~linear in table size).
# Roots and segments never change after creation, so both are parsed
# once per path and cached. Legacy single-JSON manifests (inline
# ``files``) keep reading; their next commit upgrades them.
_SEG_TARGET_FILES = 8192  # full-commit packing size per shard
_SEG_FOLD_MIN_FILES = 256  # shards below this are fold candidates
_SEG_FOLD_TRIGGER = 8  # fold once this many small shards pile up
_MANIFEST_CACHE: dict[str, dict] = {}
_MANIFEST_CACHE_MAX = 1024
_SEGMENT_CACHE: dict[str, list] = {}
_SEGMENT_CACHE_MAX = 128
_CACHE_GUARD = threading.Lock()


def _load_root(path: str) -> dict:
    """Parse (cached) a root manifest file — immutable once written."""
    key = os.path.abspath(path)
    with _CACHE_GUARD:
        hit = _MANIFEST_CACHE.get(key)
    if hit is not None:
        return hit
    with open(path) as f:
        root = json.load(f)
    with _CACHE_GUARD:
        if len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_MAX:
            _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
        _MANIFEST_CACHE[key] = root
    return root


def _cache_segment(path: str, entries: list) -> None:
    key = os.path.abspath(path)
    with _CACHE_GUARD:
        if len(_SEGMENT_CACHE) >= _SEGMENT_CACHE_MAX:
            _SEGMENT_CACHE.pop(next(iter(_SEGMENT_CACHE)))
        _SEGMENT_CACHE[key] = entries


def _load_segment(path: str) -> list:
    """Parse (cached) one file-list shard. Callers must treat the
    returned entries as immutable (the store-wide convention — every
    mutation path builds NEW lists/dicts)."""
    key = os.path.abspath(path)
    with _CACHE_GUARD:
        hit = _SEGMENT_CACHE.get(key)
    if hit is not None:
        return hit
    with open(path) as f:
        entries = json.load(f)["files"]
    _cache_segment(path, entries)
    return entries


class _LazyManifest(dict):
    """In-memory snapshot view: root fields eagerly, ``files``
    materialized from the segment shards on first access. Keeps the
    many read-only ``m["files"]`` call sites working unchanged while
    the probes that only need the root index (row_count, table_bytes,
    max_value) never touch a shard."""

    def __init__(self, root: dict, mdir: str):
        super().__init__(root)
        self._mdir = mdir

    def __missing__(self, key):
        if key == "files":
            files: list = []
            for ref in self.get("segments") or []:
                files.extend(
                    _load_segment(os.path.join(self._mdir, ref["name"]))
                )
            self["files"] = files
            return files
        raise KeyError(key)


def _segref(name: str, entries: list) -> dict:
    """Root-index row for one shard: counts, owning data groups, and
    per-column min/max aggregated over the shard (present only when
    EVERY nonzero-row entry carries that column's stats — the same
    completeness contract as the per-file level, so segment-level
    probes are exact, never approximate)."""
    groups = sorted({TableStore._group_of(e["path"]) for e in entries})
    stats: dict = {}
    nonzero = [e for e in entries if e["rows"]]
    if nonzero:
        common = set(nonzero[0].get("stats") or {})
        for e in nonzero[1:]:
            common &= set(e.get("stats") or {})
        for col in sorted(common):
            try:
                mins = [e["stats"][col]["min"] for e in nonzero]
                maxs = [e["stats"][col]["max"] for e in nonzero]
                stats[col] = {
                    "min": min(mins, key=lambda v: _dec_stat(*v)),
                    "max": max(maxs, key=lambda v: _dec_stat(*v)),
                }
            except (KeyError, TypeError, ValueError):
                continue
    return {
        "name": name,
        "nfiles": len(entries),
        "rows": sum(e["rows"] for e in entries),
        "bytes": sum(e["bytes"] for e in entries),
        "groups": groups,
        "stats": stats,
    }


# ---- footer-stat encoding (JSON-safe min/max per column) ------------

def _enc_stat(v):
    """Encode a pyarrow statistics value as (json_value, type_tag).
    Strings are skipped: parquet string min/max may be truncated, so
    they are not trustworthy for exact probes."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v, "int"
    if isinstance(v, float):
        return v, "float"
    if isinstance(v, decimal.Decimal):
        return str(v), "dec"
    if isinstance(v, datetime.datetime):
        return v.isoformat(), "ts"
    if isinstance(v, datetime.date):
        return v.isoformat(), "date"
    return None


def _dec_stat(v, tag):
    if tag in ("int", "float"):
        return v
    if tag == "dec":
        return decimal.Decimal(v)
    if tag == "ts":
        return datetime.datetime.fromisoformat(v)
    if tag == "date":
        return datetime.date.fromisoformat(v)
    raise ValueError(tag)


# ---- per-file Bloom value index (string-equality skipping) ----------
# Parquet string min/max are untrusted (truncation), so string
# predicates get NO zone-map skipping. The scale fix is the one
# Iceberg (puffin blobs), Delta (bloom index) and parquet itself
# (column bloom filters) use: a small per-file Bloom filter over the
# column's distinct values, consulted at planning time — `col = 'x'`
# drops every file whose filter proves absence, with zero Spark jobs.
# md5-derived hashes keep the probe engine-agnostic and deterministic.

_BLOOM_MAX_BITS = 1 << 17  # 16 KiB per column per file, hard cap
_BLOOM_K = 6  # with ~10 bits/value → ~1% false positives


def _bloom_hashes(value: str, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"bfidx{i}:{value}".encode()).hexdigest()[:15], 16) % m
        for i in range(_BLOOM_K)
    ]


def _bloom_build(values: set[str]) -> dict:
    bits = 1024
    while bits < 10 * len(values) and bits < _BLOOM_MAX_BITS:
        bits <<= 1
    buf = bytearray(bits // 8)
    for v in values:
        for p in _bloom_hashes(v, bits):
            buf[p >> 3] |= 1 << (p & 7)
    return {
        "m": bits,
        "k": _BLOOM_K,
        "b64": base64.b64encode(bytes(buf)).decode("ascii"),
    }


def _bloom_might_contain(bloom: dict, value: str) -> bool:
    buf = base64.b64decode(bloom["b64"])
    return all(
        buf[p >> 3] & (1 << (p & 7)) for p in _bloom_hashes(value, bloom["m"])
    )


def _file_entry(
    abs_path: str, rel_path: str, bloom_columns: list[str] | None = None
) -> dict:
    """One manifest entry: row count + per-column min/max from the
    parquet footer (the same metadata Iceberg manifests carry), plus
    optional per-column Bloom filters over distinct string values
    (built from a single-column read of the just-written file — the
    write-time cost that buys planning-time file skipping)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    mins: dict[str, tuple] = {}
    maxs: dict[str, tuple] = {}
    nulls: dict[str, int] = {}
    complete: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if st is None or not st.has_min_max:
                complete.discard(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            # parquet min/max EXCLUDE nulls — a correct "every row
            # matches" verdict needs the null count too
            if st.null_count is None:
                nulls[name] = -1  # unknown → never claim "all match"
            elif name in nulls:
                # once unknown (-1), stay unknown: summing onto the
                # sentinel would fabricate a small "known" null count
                # and let delete_where's 'all' verdict drop NULL rows
                if nulls[name] >= 0:
                    nulls[name] += st.null_count
            else:
                nulls[name] = st.null_count
            try:
                lo, hi = _enc_stat(st.min), _enc_stat(st.max)
            except Exception:
                lo = hi = None
            if lo is None or hi is None:
                complete.discard(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            if rg == 0:
                complete.add(name)
            if name not in complete:
                continue
            if name not in mins or _dec_stat(*lo) < _dec_stat(*mins[name]):
                mins[name] = lo
            if name not in maxs or _dec_stat(*hi) > _dec_stat(*maxs[name]):
                maxs[name] = hi
    stats = {
        c: {"min": list(mins[c]), "max": list(maxs[c]), "nulls": nulls.get(c, -1)}
        for c in complete
        if c in mins and c in maxs
    }
    entry = {
        "path": rel_path,
        "rows": md.num_rows,
        "bytes": os.path.getsize(abs_path),
        "stats": stats,
    }
    want = [c for c in (bloom_columns or []) if c in md.schema.names]
    if want:
        tbl = pq.read_table(abs_path, columns=want)
        blooms = {}
        for c in want:
            vals = {v for v in tbl.column(c).to_pylist() if v is not None}
            blooms[c] = _bloom_build({str(v) for v in vals})
        entry["bloom"] = blooms
    return entry


# ---- zone-map predicate classification ------------------------------
# Conservative parser for the conjunctive range predicates the load
# ops actually splice (`col >= timestamp'...' AND col < 42`): enough
# to classify a data file as all-match / no-match / boundary from its
# manifest min/max WITHOUT reading it. Anything it can't parse simply
# falls back to the probe scan — never wrong, only less pruned.

_LITERAL_RE = (
    r"(?:timestamp\s*'(?P<ts>[^']+)'|date\s*'(?P<date>[^']+)'|"
    r"(?P<num>-?\d+(?:\.\d+)?)|'(?P<str>[^']*)')"
)
_COND_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<op>>=|<=|=|<|>)\s*" + _LITERAL_RE + r"\s*$"
)


def _parse_simple_conjunction(predicate: str):
    """``[(col, op, value), ...]`` for a bare AND-conjunction of
    single-column comparisons against literals; None when the
    predicate is anything richer (OR, functions, parens, strings)."""
    if re.search(r"(?i)\bor\b|\(|\)", predicate):
        return None
    conds = []
    for part in re.split(r"(?i)\band\b", predicate):
        m = _COND_RE.match(part)
        if not m:
            return None
        if m.group("ts") is not None:
            try:
                v = datetime.datetime.fromisoformat(m.group("ts"))
            except ValueError:
                return None
        elif m.group("date") is not None:
            try:
                v = datetime.date.fromisoformat(m.group("date"))
            except ValueError:
                return None
        elif m.group("str") is not None:
            v = m.group("str")  # binary-collation point comparisons
        else:
            n = m.group("num")
            v = float(n) if "." in n else int(n)
        conds.append((m.group("col"), m.group("op"), v))
    return conds or None


def _hive_values(rel_path: str) -> dict[str, str]:
    """``{col: raw_value}`` from the hive-style segments of a file's
    manifest-relative path (``data/g-x/k=3/part-0.parquet`` → k=3)."""
    out = {}
    for seg in rel_path.split(os.sep):
        if "=" in seg and not seg.endswith(".parquet"):
            k, _, v = seg.partition("=")
            out[k] = v
    return out


def _eval_point(op: str, x, v) -> bool:
    if op == ">=":
        return x >= v
    if op == ">":
        return x > v
    if op == "<=":
        return x <= v
    if op == "<":
        return x < v
    return x == v


def _classify_partition_file(fe: dict, conds) -> str | None:
    """'all'/'none' for a hive-partitioned file whose predicate
    touches only partition columns — the value is a point, so the
    decision is exact. None when a value can't be parsed/compared
    (→ caller falls back to the rewrite path)."""
    vals = _hive_values(fe["path"])
    for col, op, v in conds:
        raw = vals.get(col)
        if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
            return None
        try:
            if isinstance(v, int):
                x = int(raw)
            elif isinstance(v, float):
                x = float(raw)
            elif isinstance(v, datetime.datetime):
                x = datetime.datetime.fromisoformat(raw)
            elif isinstance(v, datetime.date):
                x = datetime.date.fromisoformat(raw)
            elif isinstance(v, str):
                # hive dirs percent-escape special chars; only exact
                # equality is decidable from the unescaped text — any
                # other operator (or a string literal against a non-
                # string partition, where Spark would coerce types)
                # falls back to the rewrite path
                if op != "=":
                    return None
                x = urllib.parse.unquote(raw)
            else:
                return None
        except ValueError:
            return None
        if not _eval_point(op, x, v):
            return "none"
    return "all"


def _classify_file(fe: dict, conds) -> str:
    """'all' (every row matches), 'none', or 'maybe' from the file's
    per-column min/max. Missing stats for a referenced column →
    'maybe' (the probe decides)."""
    verdicts = []
    for col, op, v in conds:
        s = fe["stats"].get(col)
        if s is None:
            # strings carry no zone map, but an equality against a
            # Bloom-indexed column can still prove absence ('none');
            # presence is only ever probabilistic → 'maybe', never 'all'
            bl = fe.get("bloom", {}).get(col) if isinstance(v, str) else None
            if bl is not None and op == "=" and not _bloom_might_contain(bl, v):
                verdicts.append("none")
            else:
                verdicts.append("maybe")
            continue
        try:
            lo, hi = _dec_stat(*s["min"]), _dec_stat(*s["max"])
            if op == ">=":
                verdict = "all" if lo >= v else ("none" if hi < v else "maybe")
            elif op == ">":
                verdict = "all" if lo > v else ("none" if hi <= v else "maybe")
            elif op == "<=":
                verdict = "all" if hi <= v else ("none" if lo > v else "maybe")
            elif op == "<":
                verdict = "all" if hi < v else ("none" if lo >= v else "maybe")
            else:  # "="
                verdict = (
                    "all" if lo == v and hi == v else ("none" if v < lo or v > hi else "maybe")
                )
            # min/max exclude NULLs: NULL rows never satisfy the
            # predicate, so 'none' stands, but 'all' additionally
            # requires a known zero null count (else a NULL row would
            # be wrongly deleted with the file)
            if verdict == "all" and s.get("nulls", -1) != 0:
                verdict = "maybe"
            verdicts.append(verdict)
        except TypeError:
            verdicts.append("maybe")  # incomparable literal/stat types
    if any(x == "none" for x in verdicts):
        return "none"
    if all(x == "all" for x in verdicts):
        return "all"
    return "maybe"


class TableStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keep_versions: int = 2,
        retention_sec: float = 300.0,
        auto_compact_small_files: int = 128,
        auto_compact_min_bytes: int = 32 << 20,
        gc_every: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.keep_versions = keep_versions
        self.retention_sec = retention_sec
        # commit-path GC amortization (r14): the retention scan walks
        # the whole manifests dir, and at history depth it DOMINATES
        # commit latency (measured: 8-writer mean 148 ms / p99 326 ms
        # over a 300+-commit dir, PLANS.md). Debris is bounded by
        # retention anyway, so the scan runs every ``gc_every``-th
        # commit per table (process-local counter) or when
        # ``retention_sec`` has elapsed since the table's last scan —
        # EXCEPT under a zero-retention policy (keep_versions=0 or
        # retention_sec<=0), where callers rely on the very next
        # commit collecting eagerly. ``gc_every=1`` restores the
        # every-commit scan; ``vacuum()`` remains the explicit hook.
        self.gc_every = max(1, int(gc_every))
        # background-merge policy: once a table accumulates this many
        # sub-``auto_compact_min_bytes`` data files, the next append
        # folds them (and only them) into one right-sized group.
        # ``None``/0 disables the trigger.
        self.auto_compact_small_files = auto_compact_small_files
        self.auto_compact_min_bytes = auto_compact_min_bytes
        self._lock = _root_lock(root)
        os.makedirs(root, exist_ok=True)

    @contextlib.contextmanager
    def _publish_lock(self, schema: str, table: str):
        """Commit-critical section: per-root RLock (threads) + per-table
        ``fcntl.flock`` (PROCESSES — see module notes at
        ``_COMMIT_LOCK_DIR``). Every manifest mutation re-reads the
        pointer inside this scope, so concurrent cross-process appends
        serialize and both land; ``_commit`` additionally verifies the
        base manifest is still current and raises ``StoreConflict``
        otherwise (belt and braces for any future call site that
        forgets the re-read). Reentrant: nested acquisitions by the
        RLock-holding thread bump a depth counter instead of
        re-flocking (same-process flocks on distinct fds CONFLICT)."""
        with self._lock:
            if fcntl is None:  # pragma: no cover — non-POSIX fallback
                yield
                return
            ldir = os.path.join(self.root, schema, _COMMIT_LOCK_DIR)
            os.makedirs(ldir, exist_ok=True)
            # realpath, not abspath: flock excludes by INODE, so two
            # spellings of one symlinked root already exclude across
            # processes — but the in-process reentrancy dict must see
            # them as ONE key or a same-thread reacquire via the other
            # spelling would flock a second fd and self-deadlock
            path = os.path.realpath(os.path.join(ldir, f"{table}.lock"))
            me = threading.get_ident()
            with _FLOCK_GUARD:
                ent = _FLOCK_HELD.get(path)
                # re-entry is only the SAME thread taking the lock it
                # already holds — a different thread reaching here
                # (possible only via aliased roots whose RLocks
                # differ) must fall through to _flock_open and BLOCK
                # on the OS lock, not ride the depth counter into the
                # critical section
                if ent is not None and ent[2] == me:
                    ent[1] += 1
                else:
                    ent = None
            if ent is None:
                fd = _flock_open(path)
                ent = [fd, 1, me]
                with _FLOCK_GUARD:
                    _FLOCK_HELD[path] = ent
            try:
                yield
            finally:
                with _FLOCK_GUARD:
                    ent[1] -= 1
                    last = ent[1] == 0
                    if last:
                        _FLOCK_HELD.pop(path, None)
                if last:
                    os.close(ent[0])

    # ---- paths -----------------------------------------------------
    def _tdir(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, table)

    def _pointer(self, schema: str, table: str) -> str:
        return os.path.join(self._tdir(schema, table), "_current")

    def _manifest(self, schema: str, table: str) -> dict:
        ptr = self._pointer(schema, table)
        if not os.path.exists(ptr):
            raise TableNotFound(f"{schema}.{table}")
        with open(ptr) as f:
            name = json.load(f)["manifest"]
        m = self._snapshot_view(
            os.path.join(self._tdir(schema, table), "manifests"), name
        )
        # record the base snapshot this view was derived from —
        # ``_commit`` verifies it is still current at publish time
        # (underscore keys never reach the serialized root)
        m["_base"] = name
        return m

    @staticmethod
    def _snapshot_view(mdir: str, name: str) -> "_LazyManifest":
        """Fresh mutable view over a (cached, immutable) root manifest.
        Top-level lists are copied so callers may rebind/extend them;
        file entries and segment refs are shared and must never be
        mutated in place (the store-wide convention)."""
        root = _load_root(os.path.join(mdir, name))
        m = dict(root)
        for k in ("groups", "segments", "files"):
            if k in m:
                m[k] = list(m[k])
        return _LazyManifest(m, mdir)

    def current_version_dir(self, schema: str, table: str) -> str:
        """Directory of the table's newest data group (the analogue of
        the old single-version directory; used for introspection)."""
        m = self._manifest(schema, table)
        if not m["groups"]:
            raise TableNotFound(f"{schema}.{table} has no data groups")
        return os.path.join(self._tdir(schema, table), m["groups"][-1])

    # ---- catalog ---------------------------------------------------
    def create_database(self, schema: str) -> None:
        """CREATE DATABASE IF NOT EXISTS (jdbsChSession.scala:677-691)."""
        os.makedirs(os.path.join(self.root, schema), exist_ok=True)

    def table_exists(self, schema: str, table: str) -> bool:
        """system.tables probe (jdbsChSession.scala:39-59)."""
        return os.path.exists(self._pointer(schema, table))

    def list_tables(self, schema: str) -> list[str]:
        sdir = os.path.join(self.root, schema)
        if not os.path.isdir(sdir):
            return []
        return sorted(
            t for t in os.listdir(sdir) if os.path.exists(self._pointer(schema, t))
        )

    def schema(self, schema: str, table: str) -> StructType:
        return StructType.fromJson(json.loads(self._manifest(schema, table)["schema"]))

    def columns(self, schema: str, table: str) -> list[str]:
        """system.columns probe (jdbsChSession.scala:466-485) — read
        from the manifest, no Spark job."""
        return self.schema(schema, table).fieldNames()

    def row_count(self, schema: str, table: str) -> int:
        """Row-count probe (jdbsChSession.scala:206-220, 299-308) —
        sum of manifest file rows, zero Spark jobs (the exact role of
        ``system.tables.total_rows`` in the reference)."""
        return self._manifest(schema, table)["rows"]

    def table_bytes(self, schema: str, table: str) -> int:
        """On-disk byte total from the manifest's per-file stats —
        zero Spark jobs (``system.tables.total_bytes`` analogue).
        Feeds size-adaptive dispatch (e.g. exact-scan vs IVF-routed
        MaxSim) without touching the data. Sharded roots answer from
        the segment index alone — O(segments), no shard reads."""
        m = self._manifest(schema, table)
        if m.get("segments") is not None:
            return sum(ref["bytes"] for ref in m["segments"])
        return sum(fe["bytes"] for fe in m["files"])

    def partition_stats(
        self, schema: str, table: str, column: str, values
    ) -> tuple[int, int, int]:
        """(files, rows, bytes) summed over the manifest files whose
        hive partition directory ``column=value`` matches one of
        ``values`` — the size of a partition-pruned read, known for
        zero Spark jobs. Lets an index probe decide whether the
        pruned slice is small enough to fan out across the pool."""
        want = {f"{column}={v}" for v in values}
        files = rows = nbytes = 0
        for fe in self._manifest(schema, table)["files"]:
            if any(seg in want for seg in fe["path"].split("/")):
                files += 1
                rows += fe["rows"]
                nbytes += fe["bytes"]
        return files, rows, nbytes

    def max_value(self, schema: str, table: str, column: str):
        """O3 watermark probe ≡ ``MaxValAndCnt``
        (jdbsChSession.scala:93-121): max over per-file footer maxima —
        zero Spark jobs when every file carries stats for ``column``;
        falls back to a 1-row Spark aggregate otherwise."""
        m = self._manifest(schema, table)
        if m.get("segments") is not None:
            # segment-level fast path: the root index carries exact
            # per-shard maxima whenever every nonzero file in the
            # shard has stats — O(segments), zero shard reads
            vals = []
            complete = True
            for ref in m["segments"]:
                if ref["rows"] == 0:
                    continue
                s = (ref.get("stats") or {}).get(column)
                if s is None:
                    complete = False
                    break
                vals.append(_dec_stat(*s["max"]))
            if complete:
                return max(vals) if vals else None
        if not m["files"]:
            return None
        vals = []
        for fe in m["files"]:
            if fe["rows"] == 0:
                continue
            s = fe["stats"].get(column)
            if s is None:
                # some file lacks stats → authoritative fallback
                return self.read(schema, table).agg(F.max(column)).first()[0]
            vals.append(_dec_stat(*s["max"]))
        return max(vals) if vals else None

    # ---- read ------------------------------------------------------
    def read(self, schema: str, table: str) -> DataFrame:
        return self._df_for_manifest(self._manifest(schema, table), self._tdir(schema, table))

    def _df_for_manifest(self, m: dict, tdir: str) -> DataFrame:
        """DataFrame over exactly the manifest's file list — shared by
        current reads and snapshot time travel."""
        st = StructType.fromJson(json.loads(m["schema"]))
        if m.get("partition_by"):
            # hive-partitioned groups: read each group's MANIFEST file
            # list with the group dir as basePath (partition columns
            # restored from the hive dirs) and union. File lists, not
            # directory scans — so manifest-only drops (partition
            # pruning / DROP PARTITION deletes) are authoritative even
            # while dead files await GC/compaction on disk.
            dfs = []
            for g in m["groups"]:
                paths = [
                    os.path.join(tdir, fe["path"])
                    for fe in m["files"]
                    if fe["path"].startswith(g + os.sep)
                ]
                if not paths:
                    continue
                # schema pinned like the non-partitioned branch: the
                # manifest schema includes the partition columns, and
                # Spark honors a user schema covering them — without it
                # partition-column types are re-inferred from dir names
                # on every read (string '01' silently becomes int 1,
                # drifting from what append's column alignment assumes)
                dfs.append(
                    self.spark.read.schema(st)
                    .option("basePath", os.path.join(tdir, g))
                    .parquet(*paths)
                )
            if not dfs:
                return self.spark.createDataFrame([], st)
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out
        if not m["files"]:
            return self.spark.createDataFrame([], st)
        # pinned schema: no footer sampling, stable column order
        return self.spark.read.schema(st).parquet(
            *[os.path.join(tdir, fe["path"]) for fe in m["files"]]
        )

    def prune_files(
        self, schema: str, table: str, predicate: str
    ) -> tuple[list[str], int]:
        """Zone-map file skipping: ``(candidate rel_paths, total file
        count)`` for a predicate. Files whose per-column min/max prove
        'none' are dropped WITHOUT any Spark job — the manifest-level
        scan elimination that makes clustered layouts (sort /
        Z-order, see ``operators/layout.py``) pay off: I/O scales
        with the selected key range, not table size. Predicates
        richer than an AND-of-comparisons keep every file (correct,
        just unpruned). Skipping on min/max is NULL-safe here because
        a comparison predicate is never satisfied by NULL."""
        m = self._manifest(schema, table)
        conds = _parse_simple_conjunction(predicate)
        if conds is None:
            return [fe["path"] for fe in m["files"]], len(m["files"])
        segs = m.get("segments")
        if segs is not None and "files" not in m and not m.get("partition_by"):
            # shard-level pre-skip (r11): the root index carries exact
            # aggregated min/max per shard, so a shard whose range
            # proves 'none' is dropped WITHOUT even parsing its file
            # list — planning cost scales with the matching shards,
            # not the table (clustered layouts put a key range in few
            # shards). 'all' never short-circuits here (the shard
            # stats carry no null counts) — per-file verdicts decide.
            mdir = os.path.join(self._tdir(schema, table), "manifests")
            total = sum(ref["nfiles"] for ref in segs)
            keep = []
            for ref in segs:
                if (
                    ref.get("stats")
                    and _classify_file({"stats": ref["stats"]}, conds)
                    == "none"
                ):
                    continue
                for fe in _load_segment(os.path.join(mdir, ref["name"])):
                    if _classify_file(fe, conds) != "none":
                        keep.append(fe["path"])
            return keep, total
        total = len(m["files"])
        keep = []
        for fe in m["files"]:
            if m.get("partition_by"):
                pconds = [c for c in conds if c[0] in m["partition_by"]]
                if pconds and _classify_partition_file(fe, pconds) == "none":
                    continue
            if _classify_file(fe, conds) == "none":
                continue
            keep.append(fe["path"])
        return keep, total

    def read_pruned(self, schema: str, table: str, predicate: str) -> DataFrame:
        """Filtered read with manifest-level file skipping on top of
        parquet's own row-group skipping. Result is identical to
        ``read(...).filter(predicate)`` — pruning only removes files
        the zone maps PROVE empty for the predicate."""
        if self._manifest(schema, table).get("partition_by"):
            # hive layouts need basePath handling — Spark prunes their
            # partition dirs natively from the filter
            return self.read(schema, table).filter(predicate)
        keep, _ = self.prune_files(schema, table, predicate)
        m = self._manifest(schema, table)
        st = StructType.fromJson(json.loads(m["schema"]))
        if not keep:
            return self.spark.createDataFrame([], st)
        return self.read_files(schema, table, keep).filter(predicate)

    def snapshots(self, schema: str, table: str) -> list[dict]:
        """Retained snapshots, oldest first: ``{name, created, rows}``.
        Retention (keep_versions + retention_sec) bounds how far back
        this reaches — the same knob that protects in-flight readers."""
        mdir = os.path.join(self._tdir(schema, table), "manifests")
        if not os.path.isdir(mdir):
            raise TableNotFound(f"{schema}.{table}")
        out = []
        for fn in os.listdir(mdir):
            if fn.startswith("s-"):
                continue  # file-list shards, not snapshots
            try:
                m = _load_root(os.path.join(mdir, fn))
                out.append({"name": fn, "created": m.get("created", 0), "rows": m["rows"]})
            except Exception:
                continue
        return sorted(out, key=lambda s: s["created"])

    def read_snapshot(self, schema: str, table: str, name: str) -> DataFrame:
        """Time travel: read the table as of a retained snapshot (an
        Iceberg ``VERSION AS OF``). Snapshot names come from
        :meth:`snapshots`; data files are immutable, so the read is
        exactly the historical table."""
        mdir = os.path.join(self._tdir(schema, table), "manifests")
        if not os.path.exists(os.path.join(mdir, name)):
            raise TableNotFound(f"{schema}.{table} snapshot {name}")
        m = self._snapshot_view(mdir, name)
        return self._df_for_manifest(m, self._tdir(schema, table))

    def snapshot_diff(
        self,
        schema: str,
        table: str,
        old_name: str,
        new_name: str,
        key_cols: list[str],
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """Row-level changelog between two retained snapshots — the
        Iceberg incremental-read / Delta CDF analogue. Returns
        key_cols + ``change`` ∈ {'added', 'removed', 'changed'}.

        Scale shape: data files are IMMUTABLE, so a file present in
        both manifests cannot contribute a change — only the file
        DELTA (old−new ∪ new−old) is ever read, and a small update on
        a 100 TB table diffs in time proportional to the touched
        files, not the table. Rows rewritten verbatim (compaction /
        Z-order re-clustering move rows between files without
        changing them) cancel in the key-join. Requires ``key_cols``
        to be unique per snapshot (the same contract as
        ``delete_by_keys``); ``compare_cols`` defaults to every
        non-key column."""
        tdir = self._tdir(schema, table)

        def _m(name: str) -> dict:
            p = os.path.join(tdir, "manifests", name)
            if not os.path.exists(p):
                raise TableNotFound(f"{schema}.{table} snapshot {name}")
            return self._snapshot_view(os.path.join(tdir, "manifests"), name)

        mo, mn = _m(old_name), _m(new_name)
        fo = {fe["path"] for fe in mo["files"]}
        fn = {fe["path"] for fe in mn["files"]}

        def _sub(m: dict, keep: set) -> dict:
            s = dict(m)
            s["files"] = [fe for fe in m["files"] if fe["path"] in keep]
            return s

        df_rem = self._df_for_manifest(_sub(mo, fo - fn), tdir)
        df_add = self._df_for_manifest(_sub(mn, fn - fo), tdir)
        cmp_cols = compare_cols or [
            c for c in df_add.columns if c not in key_cols
        ]
        o = df_rem.select(*key_cols, F.struct(*cmp_cols).alias("__o"))
        n = df_add.select(*key_cols, F.struct(*cmp_cols).alias("__n"))
        j = o.join(n, key_cols, "full_outer")
        return (
            j.withColumn(
                "change",
                F.when(F.col("__o").isNull(), F.lit("added"))
                .when(F.col("__n").isNull(), F.lit("removed"))
                .when(
                    ~F.col("__o").eqNullSafe(F.col("__n")), F.lit("changed")
                ),
            )
            .filter(F.col("change").isNotNull())
            .select(*key_cols, "change")
        )

    def read_with_file(
        self, schema: str, table: str, rel_paths: list[str] | None = None
    ) -> DataFrame:
        """Current snapshot (or just ``rel_paths`` of it) plus
        ``_src_file`` = manifest-relative path of the file each row
        came from (drives file pruning)."""
        tdir = os.path.abspath(self._tdir(schema, table))
        absf = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
        base = (
            self.read(schema, table)
            if rel_paths is None
            else self.read_files(schema, table, rel_paths)
        )
        return base.withColumn(
            "_src_file", F.substring(absf, len(tdir) + 2, 1 << 20)
        )

    # kept as the internal spelling used by delete_where
    _read_with_file = read_with_file

    def read_files(self, schema: str, table: str, rel_paths: list[str]) -> DataFrame:
        """Read only the named manifest-relative files of the current
        snapshot (the targeted half of a file-pruned rewrite)."""
        m = self._manifest(schema, table)
        st = StructType.fromJson(json.loads(m["schema"]))
        tdir = self._tdir(schema, table)
        return self.spark.read.schema(st).parquet(
            *[os.path.join(tdir, p) for p in rel_paths]
        )

    def partitioning(self, schema: str, table: str) -> list[str]:
        return list(self._manifest(schema, table).get("partition_by") or [])

    # ---- commit machinery ------------------------------------------
    def _write_group(
        self,
        schema: str,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None,
        bloom_columns: list[str] | None = None,
    ) -> tuple[str, list[dict]]:
        """Materialize ``df`` as a new immutable file group; returns
        (relative group path, manifest file entries). Data lands fully
        before any manifest references it. ``bloom_columns`` defaults
        to the table's current manifest setting, so append / rewrite /
        compaction keep the file index without knowing about it."""
        if bloom_columns is None and self.table_exists(schema, table):
            bloom_columns = self._manifest(schema, table).get("bloom_columns") or None
        tdir = self._tdir(schema, table)
        rel = os.path.join("data", f"g-{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}")
        gdir = os.path.join(tdir, rel)
        with _INFLIGHT_GUARD:
            _INFLIGHT_GROUPS.add(os.path.abspath(gdir))
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        try:
            writer.parquet(gdir)
        except BaseException:
            # a failed write must not pin its half-written group in
            # the in-flight registry forever — release it so vacuum()
            # can reclaim the debris after the grace period
            self._release_inflight(tdir, rel)
            raise
        entries = []
        for dirpath, _dirs, files in os.walk(gdir):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                ap = os.path.join(dirpath, fn)
                entries.append(
                    _file_entry(ap, os.path.relpath(ap, tdir), bloom_columns)
                )
        return rel, entries

    @staticmethod
    def _release_inflight(tdir: str, rel: str) -> None:
        with _INFLIGHT_GUARD:
            _INFLIGHT_GROUPS.discard(os.path.abspath(os.path.join(tdir, rel)))

    def _write_segment(self, mdir: str, entries: list) -> dict:
        """Write one immutable file-list shard; returns its root-index
        row."""
        name = f"s-{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}.json"
        path = os.path.join(mdir, name)
        with open(path, "w") as f:
            json.dump({"files": entries}, f)
        _cache_segment(path, entries)
        return _segref(name, entries)

    def _fold_small_segments(self, mdir: str, segrefs: list) -> list:
        """Shard maintenance at commit time: once enough sub-threshold
        shards pile up (one tiny shard per append), fold them into
        right-sized ones so the root index stays O(files / target).
        Amortized O(_SEG_FOLD_MIN_FILES) entries serialized per
        commit — the per-commit cost stays flat as the table grows."""
        small = [r for r in segrefs if r["nfiles"] < _SEG_FOLD_MIN_FILES]
        if len(small) < _SEG_FOLD_TRIGGER:
            return segrefs
        rest = [r for r in segrefs if r["nfiles"] >= _SEG_FOLD_MIN_FILES]
        merged: list = []
        for r in small:
            merged.extend(_load_segment(os.path.join(mdir, r["name"])))
        for i in range(0, len(merged), _SEG_TARGET_FILES):
            rest.append(
                self._write_segment(mdir, merged[i : i + _SEG_TARGET_FILES])
            )
        return rest

    def _commit(self, schema: str, table: str, manifest: dict) -> None:
        """Publish a snapshot: segment shards for the delta, small
        root manifest, then atomic pointer swap, then retention-based
        GC — all under the per-root lock.

        Three input shapes:
        - ``__delta_add`` present → delta commit: carried-over shard
          refs stay by NAME (structural sharing — nothing reread or
          rewritten), only the delta entries land in a new shard.
          O(delta + segments), the 100-TB commit path.
        - inline ``files`` (no delta marker) → full (re)pack into
          fresh shards — write()/clone()/legacy upgrades, where the
          caller just produced every entry anyway.
        - neither (segments only) → metadata-only commit (meta/schema
          change): shard refs carry over verbatim."""
        tdir = self._tdir(schema, table)
        mdir = os.path.join(tdir, "manifests")
        os.makedirs(mdir, exist_ok=True)
        base = manifest.pop("_base", None)
        if base is not None:
            # compare-and-swap: the manifest view this commit mutated
            # must still be the published snapshot. Mutation paths
            # re-read the pointer under ``_publish_lock`` so this holds
            # by construction; a mismatch means some caller committed a
            # view taken OUTSIDE the lock — publishing it would silently
            # discard the interleaved commit's rows. Fail loudly.
            cur = None
            ptr = self._pointer(schema, table)
            if os.path.exists(ptr):
                with open(ptr) as f:
                    cur = json.load(f)["manifest"]
            if cur != base:
                raise StoreConflict(
                    f"{schema}.{table}: commit built from snapshot {base} "
                    f"but {cur} is now current (concurrent commit) — "
                    f"re-read under the publish lock and retry"
                )
        delta_add = manifest.pop("__delta_add", None)
        if delta_add is None and "files" not in manifest and manifest.get(
            "segments"
        ) is not None:
            delta_add = []  # metadata-only commit
        if delta_add is not None:
            manifest.pop("files", None)
            segrefs = list(manifest.get("segments") or [])
            if delta_add:
                segrefs.append(self._write_segment(mdir, list(delta_add)))
            segrefs = self._fold_small_segments(mdir, segrefs)
        else:
            entries = manifest.pop("files", [])
            segrefs = [
                self._write_segment(mdir, entries[i : i + _SEG_TARGET_FILES])
                for i in range(0, len(entries), _SEG_TARGET_FILES)
            ]
        manifest["segments"] = segrefs
        manifest["rows"] = sum(ref["rows"] for ref in segrefs)
        manifest["created"] = time.time()
        name = f"m-{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}.json"
        root_path = os.path.join(mdir, name)
        plain = {k: v for k, v in manifest.items() if not k.startswith("_")}
        with open(root_path, "w") as f:
            json.dump(plain, f)
        with _CACHE_GUARD:
            if len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_MAX:
                _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
            _MANIFEST_CACHE[os.path.abspath(root_path)] = plain
        tmp = self._pointer(schema, table) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"manifest": name, "ts": time.time()}, f)
        os.replace(tmp, self._pointer(schema, table))  # atomic publish
        self._maybe_gc(schema, table, current=name)

    def _maybe_gc(self, schema: str, table: str, current: str) -> None:
        """Amortized commit-path GC (r14): run the full retention
        scan only on the gc_every-th commit of this table (counted
        per process) or once retention_sec has passed since this
        process last scanned it; zero-retention stores keep the
        eager every-commit scan their tests and callers contract on.
        Skipped scans leave debris that is (a) bounded — at most
        gc_every-1 commits' worth per process — and (b) still
        subject to the same retention policy when the next scan or
        an explicit vacuum() runs."""
        eager = self.keep_versions == 0 or self.retention_sec <= 0
        key = (os.path.realpath(self.root), schema, table)
        now = time.time()
        if not eager:
            with _GC_AMORT_GUARD:
                # cold state counts as freshly scanned: a fleet of
                # writer processes barrier-starting on one table must
                # not each walk a deep manifests dir on their first
                # commit (measured: the simultaneous cold scans were
                # the 8-writer p99); a process that commits fewer
                # than gc_every times leaves debris bounded by the
                # retention policy and reclaimed by any peer's next
                # scan or an explicit vacuum()
                cnt, last = _GC_AMORT.get(key, (0, now))
                cnt += 1
                if cnt < self.gc_every and now - last < self.retention_sec:
                    _GC_AMORT[key] = (cnt, last)
                    return
            # fall through: scan now, reset below on completion
        self._gc(schema, table, current=current)
        with _GC_AMORT_GUARD:
            _GC_AMORT[key] = (0, now)

    def vacuum(
        self,
        schema: str,
        table: str,
        older_than_sec: float | None = None,
    ) -> dict:
        """Crash-recovery garbage collection: remove ``g-*`` data
        groups and ``s-*`` manifest shards referenced by NO retained
        manifest — the debris a writer dying between data-file land
        and pointer publish leaves behind (data always lands fully
        BEFORE any manifest references it, so a crash can only orphan
        files, never corrupt a published snapshot). The retention-GC
        that runs on every commit collects the same debris, but only
        when the table is written again; ``vacuum`` is the explicit
        path for tables that went quiet.

        Reader safety: liveness is computed from EVERY manifest the
        retention policy keeps (newest ``keep_versions`` + anything
        younger than ``retention_sec``), so readers of any retained
        snapshot — including time-travel readers — never lose files.
        Still-in-flight writers are protected twice: the in-process
        registry (never collected) and the ``older_than_sec`` mtime
        grace (default ``retention_sec``) for writers in OTHER
        processes, whose half-written groups are younger than any
        sane grace. Returns ``{"groups": n, "segments": n,
        "manifests": n}`` removed."""
        with self._publish_lock(schema, table):
            ptr = self._pointer(schema, table)
            if not os.path.exists(ptr):
                raise TableNotFound(f"{schema}.{table}")
            with open(ptr) as f:
                current = json.load(f)["manifest"]
            return self._gc(schema, table, current, grace=older_than_sec)

    def _gc(
        self,
        schema: str,
        table: str,
        current: str,
        grace: float | None = None,
    ) -> dict:
        """Retention-based GC: keep the newest ``keep_versions``
        manifests plus anything younger than ``retention_sec`` (so
        in-flight readers of recent snapshots stay valid); delete data
        groups referenced by no retained manifest. ``grace`` overrides
        ``retention_sec`` as the age floor for UNREFERENCED debris
        only (crash orphans); retained-manifest liveness always uses
        the retention policy. Returns removal counts."""
        if grace is None:
            grace = self.retention_sec
        removed = {"groups": 0, "segments": 0, "manifests": 0}
        tdir = self._tdir(schema, table)
        mdir = os.path.join(tdir, "manifests")
        roots = []
        seg_files = []
        for fn in os.listdir(mdir):
            if fn.startswith("s-"):
                seg_files.append(fn)
                continue
            p = os.path.join(mdir, fn)
            try:
                roots.append((_load_root(p).get("created", 0), fn))
            except Exception:
                continue
        roots.sort(reverse=True)
        now = time.time()
        keep = set()
        for i, (created, fn) in enumerate(roots):
            if fn == current or i < self.keep_versions or now - created < self.retention_sec:
                keep.add(fn)
        live_groups: set[str] = set()
        live_segs: set[str] = set()
        for fn in keep:
            try:
                m = _load_root(os.path.join(mdir, fn))
            except Exception:
                continue
            live_groups.update(m["groups"])
            for ref in m.get("segments") or []:
                live_segs.add(ref["name"])
                live_groups.update(ref.get("groups") or [])
            live_groups.update(
                os.path.dirname(fe["path"]) for fe in m.get("files") or []
            )
        for _created, fn in roots:
            if fn not in keep:
                try:
                    os.remove(os.path.join(mdir, fn))
                    removed["manifests"] += 1
                except OSError:
                    pass
        for fn in seg_files:
            if fn in live_segs:
                continue
            p = os.path.join(mdir, fn)
            try:
                # a shard just written by an in-flight cross-process
                # commit isn't referenced yet — same mtime guard as
                # unreferenced data groups
                if now - os.path.getmtime(p) < grace:
                    continue
                os.remove(p)
                removed["segments"] += 1
            except OSError:
                pass
        ddir = os.path.join(tdir, "data")
        if os.path.isdir(ddir):
            with _INFLIGHT_GUARD:
                inflight = set(_INFLIGHT_GROUPS)
            now = time.time()
            for g in os.listdir(ddir):
                gpath = os.path.join(ddir, g)
                if os.path.join("data", g) in live_groups:
                    continue
                # in-flight writes aren't referenced by any manifest
                # yet — never collect them (registry covers this
                # process; the mtime guard covers other processes)
                if os.path.abspath(gpath) in inflight:
                    continue
                try:
                    if now - os.path.getmtime(gpath) < grace:
                        continue
                except OSError:
                    pass
                shutil.rmtree(gpath, ignore_errors=True)
                # a failed deletion (e.g. permissions) must not be
                # reported as removed — mirror the OSError-guarded paths
                if not os.path.exists(gpath):
                    removed["groups"] += 1
        return removed

    # ---- write operations ------------------------------------------
    def write(
        self,
        schema: str,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
        bloom_columns: list[str] | None = None,
        _if_absent: bool = False,
        _expect_base: str | None = None,
    ) -> str:
        """Full snapshot (recreate/overwrite): one new group holding
        all data; previous snapshot stays readable until GC retention
        lapses. Returns the new group directory.

        ``meta`` (JSON-serializable) rides the snapshot manifest and
        is readable via :meth:`table_meta` — state that must commit
        ATOMICALLY with the data (e.g. the incremental-view refresh
        watermark) belongs here, not in a second file.

        ``_expect_base`` (internal): the snapshot name this rewrite
        was COMPUTED from — maintenance rewrites (compact /
        deduplicate / the partitioned full-rewrite delete paths) pass
        it so ``_commit`` rejects the publish with ``StoreConflict``
        if another commit (this process or any other) landed since
        the snapshot was read. Without it a full rewrite would
        silently discard the interleaved commit's rows. Plain
        user-facing overwrites (recreate) keep last-writer-wins.

        The (possibly long) Spark data write runs OUTSIDE the commit
        lock — parallel table loads don't serialize on each other;
        only the metadata commit (manifest + pointer + GC) locks."""
        tdir = self._tdir(schema, table)
        os.makedirs(tdir, exist_ok=True)
        # write() is authoritative for the Bloom-index setting: passing
        # None on a recreate drops the index (like any other DDL reset)
        rel, entries = self._write_group(
            schema, table, df, partition_by, bloom_columns or []
        )
        try:
            with self._publish_lock(schema, table):
                if _if_absent and os.path.exists(self._pointer(schema, table)):
                    # this write is append's create-fallback and another
                    # process created the table while our data files were
                    # landing — overwriting would silently discard its
                    # rows; the caller retries as a true append
                    raise StoreConflict(
                        f"{schema}.{table}: created concurrently during "
                        f"append's create-fallback"
                    )
                manifest = {
                    "schema": df.schema.json(),
                    "partition_by": partition_by or [],
                    "bloom_columns": bloom_columns or [],
                    "groups": [rel],
                    "files": entries,
                    "meta": meta or {},
                }
                if _expect_base is not None:
                    manifest["_base"] = _expect_base
                self._commit(schema, table, manifest)
        finally:
            self._release_inflight(tdir, rel)
        return os.path.join(tdir, rel)

    def table_meta(self, schema: str, table: str) -> dict:
        """Caller metadata committed with the current snapshot."""
        return self._manifest(schema, table).get("meta", {})

    def append(
        self, schema: str, table: str, df: DataFrame, evolve: bool = False
    ) -> str:
        """Append = write ONLY the delta files and commit a manifest
        listing old∪new — O(delta), never O(table). Pre-existing data
        files are neither read nor rewritten (the MergeTree-parts
        property the reference's incremental ops assume).

        ``evolve=True`` enables additive schema evolution: columns in
        ``df`` that the table lacks are ADDED to the table schema
        (forced nullable) — a metadata-only change; existing files are
        never touched, and reads fill the new column with NULL for old
        rows because every read pins the manifest schema over the
        parquet scan. Columns the table has but ``df`` lacks are
        filled with NULL in the delta. Without ``evolve`` the historic
        contract holds: extra df columns are dropped, missing ones
        raise. Type CHANGES are refused either way — only adds."""
        if not self.table_exists(schema, table):
            try:
                return self.write(schema, table, df, _if_absent=True)
            except StoreConflict:
                pass  # raced a concurrent create — append for real below
        m = self._manifest(schema, table)
        st = StructType.fromJson(json.loads(m["schema"]))
        if evolve:
            by_name = {f.name: f for f in st.fields}
            for f in df.schema.fields:
                have = by_name.get(f.name)
                if have is None:
                    from pyspark.sql.types import StructField

                    st = st.add(StructField(f.name, f.dataType, True))
                elif have.dataType != f.dataType:
                    raise SchemaMismatch(
                        f"{schema}.{table}.{f.name}: evolution only adds "
                        f"columns; cannot change {have.dataType.simpleString()}"
                        f" to {f.dataType.simpleString()}"
                    )
            df = df.select(
                *[
                    F.col(f.name) if f.name in df.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in st.fields
                ]
            )
        else:
            df = df.select(*st.fieldNames())  # align by name, keep order
        rel, entries = self._write_group(
            schema, table, df, m.get("partition_by") or None
        )
        try:
            self._commit_delta(
                schema, table, rel, entries, evolved=st if evolve else None
            )
        finally:
            self._release_inflight(self._tdir(schema, table), rel)
        self._maybe_compact_small(schema, table)
        return os.path.join(self._tdir(schema, table), rel)

    def _commit_delta(
        self,
        schema: str,
        table: str,
        rel: str,
        entries: list,
        evolved: StructType | None = None,
    ) -> None:
        """Metadata half of an append: under the publish lock, re-read
        the CURRENT snapshot — another commit, in THIS process or any
        other, may have advanced it while the delta files were being
        written — and commit old ∪ delta. Factored from :meth:`append`
        so the commit protocol is exercisable without a SparkSession
        (the cross-process lost-update test drives it from bare-Python
        subprocesses against pre-landed group files)."""
        with self._publish_lock(schema, table):
            m = self._manifest(schema, table)
            m["groups"] = m["groups"] + [rel]
            if m.get("segments") is None:
                # legacy inline root: one-time upgrade repack
                m["files"] = m["files"] + entries
            else:
                # delta commit: old shards carry over by NAME —
                # O(delta + segments), nothing reread/rewritten
                m.pop("files", None)
                m["__delta_add"] = entries
            if evolved is not None:
                # merge again against the under-lock manifest (a
                # concurrent evolve may have added other columns).
                # Same-named column with a DIFFERENT type means a
                # racing evolve won with an incompatible add — our
                # already-written parquet files would contradict
                # the manifest schema; abort loudly instead of
                # committing a table every read would choke on.
                cur = StructType.fromJson(json.loads(m["schema"]))
                by_name2 = {f.name: f for f in cur.fields}
                for f in evolved.fields:
                    have = by_name2.get(f.name)
                    if have is None:
                        cur = cur.add(f)
                    elif have.dataType != f.dataType:
                        raise StoreConflict(
                            f"{schema}.{table}.{f.name}: concurrent "
                            f"schema evolution committed type "
                            f"{have.dataType.simpleString()}, this append "
                            f"wrote {f.dataType.simpleString()}"
                        )
                m["schema"] = cur.json()
            self._commit(schema, table, m)

    def replace_files(
        self,
        schema: str,
        table: str,
        remove_files: list[str],
        replacement: DataFrame | None,
        partition_by: list[str] | None = None,
    ) -> None:
        """Targeted rewrite: drop ``remove_files`` (manifest-relative
        paths) from the snapshot and add ``replacement`` as a new
        group. The primitive behind file-pruned DELETE and keyed
        UPDATE — untouched files carry over by reference.
        ``partition_by`` lays the replacement group out hive-style
        (the partitioned compact_small path — ``replacement`` must
        carry the partition columns)."""
        m = self._manifest(schema, table)
        rel, entries = None, []
        if replacement is not None:
            cols = StructType.fromJson(json.loads(m["schema"])).fieldNames()
            rel, entries = self._write_group(
                schema, table, replacement.select(*cols), partition_by
            )
        try:
            with self._publish_lock(schema, table):
                m = self._manifest(schema, table)
                present = {fe["path"] for fe in m["files"]}
                missing = set(remove_files) - present
                if missing:
                    # a concurrent commit already replaced these files:
                    # our replacement was computed from a stale snapshot
                    # — committing it would duplicate/resurrect rows
                    raise StoreConflict(
                        f"{schema}.{table}: {len(missing)} files to replace "
                        f"are gone (concurrent commit), e.g. {sorted(missing)[:2]}"
                    )
                self._apply_remove_add(
                    schema, table, m, set(remove_files), entries,
                    extra_group=rel,
                )
                self._commit(schema, table, m)
        finally:
            if rel is not None:
                self._release_inflight(self._tdir(schema, table), rel)

    def _apply_remove_add(
        self,
        schema: str,
        table: str,
        m: dict,
        removed: set,
        added: list,
        extra_group: str | None = None,
    ) -> None:
        """Segment-aware remove∪add: shards untouched by ``removed``
        carry over BY REFERENCE; only shards actually holding removed
        paths are rewritten (their survivors join the delta). Root
        serialization cost is O(touched shards + delta + segments) —
        a targeted rewrite on a huge table never reserializes the
        whole file list. Sets the delta markers ``_commit`` consumes
        and recomputes ``groups`` from the surviving state."""
        mdir = os.path.join(self._tdir(schema, table), "manifests")
        keep_refs: list = []
        delta: list = list(added)
        if m.get("segments") is not None:
            for ref in m["segments"]:
                ents = _load_segment(os.path.join(mdir, ref["name"]))
                if removed and any(e["path"] in removed for e in ents):
                    delta.extend(e for e in ents if e["path"] not in removed)
                else:
                    keep_refs.append(ref)
        else:  # legacy inline root
            delta.extend(
                fe for fe in m["files"] if fe["path"] not in removed
            )
        groups = set()
        for ref in keep_refs:
            groups.update(ref.get("groups") or [])
        groups.update(self._group_of(e["path"]) for e in delta)
        if extra_group is not None:
            groups.add(extra_group)
        m.pop("files", None)
        m["segments"] = keep_refs
        m["__delta_add"] = delta
        m["groups"] = sorted(groups)

    @staticmethod
    def _group_of(rel_path: str) -> str:
        """Manifest-relative file path → its data group (``data/g-…``).
        ``dirname`` is NOT equivalent for hive-partitioned files
        (``data/g-x/k=v/f.parquet`` → ``data/g-x/k=v``)."""
        parts = rel_path.split(os.sep)
        return os.sep.join(parts[:2])

    def delete_where(self, schema: str, table: str, predicate: str) -> None:
        """``delete from t where …`` (jdbsChSession.scala:222-236) with
        file pruning: a pushed-down probe scan finds the files that
        contain matching rows; only those are rewritten. Partitioned
        tables fall back to a full filtered rewrite (their rows'
        file-identity spans hive dirs)."""
        m = self._manifest(schema, table)
        if not m["files"] and not m.get("partition_by"):
            return
        if m.get("partition_by"):
            # partition pruning: a predicate over partition columns
            # only is exactly decidable per file from its hive path
            # (the value is a point) → the delete is manifest-only,
            # zero data read or written (DROP PARTITION semantics)
            conds = _parse_simple_conjunction(predicate)
            if conds is not None and {c for c, _, _ in conds} <= set(m["partition_by"]):
                verdicts = [(_classify_partition_file(fe, conds), fe["path"]) for fe in m["files"]]
                if all(v is not None for v, _ in verdicts):
                    drop = {p for v, p in verdicts if v == "all"}
                    if drop:
                        with self._publish_lock(schema, table):
                            m2 = self._manifest(schema, table)
                            # segment-aware drop: untouched shards
                            # carry over by reference; groups shrink
                            # with the files (a group left live after
                            # its last file is dropped would pin the
                            # dropped partition's data against GC)
                            self._apply_remove_add(
                                schema, table, m2, drop, []
                            )
                            self._commit(schema, table, m2)
                    return
            self.write(
                schema,
                table,
                # DELETE keeps rows where the predicate is NULL, not
                # just false — survivors are "predicate IS NOT TRUE";
                # input pinned to the CAS-base snapshot
                self._df_for_manifest(m, self._tdir(schema, table)).filter(
                    f"NOT coalesce(({predicate}), false)"
                ),
                partition_by=m["partition_by"],
                # maintenance rewrite: carry the Bloom index setting
                # (write(None) means "drop index" — a DDL reset this
                # path must not imply; ADVICE r04)
                bloom_columns=m.get("bloom_columns") or [],
                _expect_base=m.get("_base"),  # loud on concurrent commit
            )
            return
        # zone-map pruning: classify files against the predicate using
        # manifest min/max BEFORE any scan — fully-matching files are
        # dropped manifest-only (no read, no rewrite), fully-outside
        # files are untouched, and only boundary files are probed.
        # Time-clustered tables (the reference's order_by_ora_data
        # exists to create exactly that layout) delete a date range
        # with close to zero data scanned.
        conds = _parse_simple_conjunction(predicate)
        drop_whole: list[str] = []
        probe: list[dict] = []
        if conds is not None:
            for fe in m["files"]:
                verdict = _classify_file(fe, conds)
                if verdict == "all":
                    drop_whole.append(fe["path"])
                elif verdict == "maybe":
                    probe.append(fe)
        else:
            probe = list(m["files"])
        tdir = self._tdir(schema, table)
        st = StructType.fromJson(json.loads(m["schema"]))
        affected: list[str] = []
        if probe:
            tagged = self.read_with_file(
                schema, table, rel_paths=[fe["path"] for fe in probe]
            )
            affected = [
                r["_src_file"]
                for r in tagged.filter(predicate).select("_src_file").distinct().collect()
            ]
        if not affected and not drop_whole:
            return
        survivors = None
        if affected:
            survivors = (
                self.spark.read.schema(st)
                .parquet(*[os.path.join(tdir, p) for p in affected])
                # "predicate IS NOT TRUE": rows where the predicate is
                # NULL survive a DELETE (plain NOT would drop them)
                .filter(f"NOT coalesce(({predicate}), false)")
            )
        self.replace_files(schema, table, drop_whole + affected, survivors)
        # survivor files can be small slivers — same merge policy as
        # the append path once enough of them accumulate
        self._maybe_compact_small(schema, table)

    def truncate(self, schema: str, table: str) -> None:
        """truncate table (jdbsChSession.scala:693-700) — empty
        manifest, schema retained, no data written at all."""
        with self._publish_lock(schema, table):
            m = self._manifest(schema, table)
            m["groups"] = []
            m.pop("files", None)
            m["segments"] = []
            m["__delta_add"] = []
            self._commit(schema, table, m)

    def drop(self, schema: str, table: str) -> None:
        """drop table if exists (jdbsChSession.scala:238-263)."""
        with self._publish_lock(schema, table):
            tdir = self._tdir(schema, table)
            if os.path.isdir(tdir):
                shutil.rmtree(tdir)

    def _maybe_compact_small(self, schema: str, table: str) -> None:
        """Append-path trigger for :meth:`compact_small` — the
        background-merge policy MergeTree applies to small parts.
        Bounded work: only the small files are read, so an append's
        amortized cost stays O(delta), never O(table)."""
        thr = self.auto_compact_small_files
        if not thr:
            return
        m = self._manifest(schema, table)
        small = [fe for fe in m["files"] if fe["bytes"] < self.auto_compact_min_bytes]
        if len(small) >= thr:
            try:
                self.compact_small(schema, table)
            except StoreConflict:
                pass  # best-effort maintenance: a racing mutation won; retry next append

    def compact_small(self, schema: str, table: str) -> int:
        """Incremental compaction: fold ONLY the files smaller than
        ``auto_compact_min_bytes`` into one right-sized group; files
        already at target size carry over by reference (ClickHouse
        merges small parts the same way — big parts are left alone,
        ``jdbsChSession.scala:387-398`` only forces the final merge).
        Returns the number of files folded.

        Hive-partitioned tables fold PER PARTITION DIRECTORY (r11 —
        MergeTree merges parts within a partition, never across):
        each dir's slivers are read bare (partition values restored
        from the dir name, typed by the manifest schema) and rewritten
        into that dir in the replacement group; dirs with a single
        small file and every full-size file carry over by reference.
        Without this, streaming appends to a hive layout accumulate
        slivers forever (compact() was the only folding path and it
        rewrites the whole table)."""
        m = self._manifest(schema, table)
        small = [fe for fe in m["files"] if fe["bytes"] < self.auto_compact_min_bytes]
        part_cols = list(m.get("partition_by") or [])
        if not part_cols:
            if len(small) < 2:
                return 0
            paths = [fe["path"] for fe in small]
            total = sum(fe["bytes"] for fe in small)
            df = self.read_files(schema, table, paths).coalesce(
                int(max(1, total // (128 << 20) + 1))
            )
            self.replace_files(schema, table, paths, df)
            return len(paths)
        by_dir: dict[str, list[dict]] = {}
        for fe in small:
            by_dir.setdefault(os.path.dirname(fe["path"]), []).append(fe)
        fold = {d: fes for d, fes in by_dir.items() if len(fes) >= 2}
        if not fold:
            return 0
        st = StructType.fromJson(json.loads(m["schema"]))
        file_st = StructType([f for f in st.fields if f.name not in part_cols])
        tdir = self._tdir(schema, table)
        dfs = []
        paths: list[str] = []
        for d, fes in sorted(fold.items()):
            vals = _hive_values(fes[0]["path"])
            total = sum(fe["bytes"] for fe in fes)
            df = self.spark.read.schema(file_st).parquet(
                *[os.path.join(tdir, fe["path"]) for fe in fes]
            )
            for f in st.fields:
                if f.name in part_cols:
                    raw = vals.get(f.name)
                    lit_v = (
                        None
                        if raw in (None, "__HIVE_DEFAULT_PARTITION__")
                        else urllib.parse.unquote(raw)
                    )
                    df = df.withColumn(
                        f.name, F.lit(lit_v).cast(f.dataType)
                    )
            dfs.append(
                df.select(*st.fieldNames()).coalesce(
                    int(max(1, total // (128 << 20) + 1))
                )
            )
            paths.extend(fe["path"] for fe in fes)
        repl = dfs[0]
        for d2 in dfs[1:]:
            repl = repl.unionByName(d2)
        self.replace_files(
            schema, table, paths, repl, partition_by=part_cols
        )
        return len(paths)

    def compact(
        self,
        schema: str,
        table: str,
        target_partitions: int | None = None,
        cluster_by: list[str] | None = None,
        cluster_bits: int = 12,
    ) -> str:
        """``OPTIMIZE TABLE … FINAL`` analogue
        (jdbsChSession.scala:387-398): rewrite the current snapshot
        into fewer, larger files (coalesce — no shuffle), folding
        accumulated append groups back into one. Sizing rule of thumb
        at scale: total_bytes / 128 MiB.

        ``cluster_by`` makes the rewrite LAYOUT-PRESERVING for
        clustered tables (``operators/layout.py``): a plain coalesce
        would interleave appended groups and destroy the tight
        per-file min/max that ``read_pruned`` skips on, so clustered
        tables re-sort on their Morton value during the fold —
        OPTIMIZE and ZORDER in one pass, exactly how lakehouse
        engines ship it."""
        m = self._manifest(schema, table)
        if cluster_by and m.get("partition_by"):
            raise ValueError(
                "cluster_by targets unpartitioned tables (a global range "
                "shuffle would split every range across the hive dirs — "
                "MORE small files, and read_pruned prunes hive layouts on "
                "their partition dirs already)"
            )
        # rewrite input pinned to the SAME snapshot as the CAS base
        df = self._df_for_manifest(m, self._tdir(schema, table))
        if target_partitions is None:
            total = sum(fe["bytes"] for fe in m["files"])
            target_partitions = max(1, total // (128 << 20))
        if cluster_by:
            from ora_ch_spark.operators.layout import zorder_value

            df = (
                zorder_value(df, cluster_by, cluster_bits)
                .repartitionByRange(int(target_partitions), F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            df = df.coalesce(int(target_partitions))
        return self.write(
            schema,
            table,
            df,
            partition_by=m.get("partition_by") or None,
            # compaction preserves the per-file Bloom value index
            bloom_columns=m.get("bloom_columns") or [],
            # maintenance rewrite: publishing over a snapshot that
            # moved since we read it would silently discard the
            # interleaved commit — fail loudly instead (r13)
            _expect_base=m.get("_base"),
        )

    def clone(
        self, schema: str, table: str, dst_schema: str, dst_table: str
    ) -> None:
        """Zero-copy table clone (Delta ``CLONE`` / Iceberg snapshot
        branch analogue): hardlink every current data file into the
        destination's tree and commit a manifest pointing at the
        links — O(files) metadata, no data bytes copied or read.
        Divergence is free and safe: both tables mutate through their
        own manifests, hardlinked inodes survive either side's GC
        (unlink is per-directory-entry), and a post-clone rewrite on
        one side never disturbs the other."""
        m = self._manifest(schema, table)
        src_tdir = self._tdir(schema, table)
        dst_tdir = self._tdir(dst_schema, dst_table)
        entries = []
        for fe in m["files"]:
            src_p = os.path.join(src_tdir, fe["path"])
            dst_p = os.path.join(dst_tdir, fe["path"])
            os.makedirs(os.path.dirname(dst_p), exist_ok=True)
            if not os.path.exists(dst_p):
                os.link(src_p, dst_p)
            entries.append(dict(fe))
        with self._publish_lock(dst_schema, dst_table):
            self._commit(
                dst_schema,
                dst_table,
                {
                    "schema": m["schema"],
                    "partition_by": m.get("partition_by", []),
                    "bloom_columns": m.get("bloom_columns", []),
                    "groups": sorted({self._group_of(fe["path"]) for fe in entries}),
                    "files": entries,
                    "meta": dict(m.get("meta", {})),
                },
            )

    def delete_by_keys(
        self, schema: str, table: str, keys: DataFrame, key_cols: list[str]
    ) -> int:
        """Keyed hard delete — the right-to-be-forgotten primitive a
        training-data pipeline must run at table scale: remove every
        row whose ``key_cols`` tuple appears in ``keys``. A broadcast
        semi-join probe over the file-tagged read finds the data files
        holding matching keys; ONLY those files are rewritten (with a
        broadcast anti-join), everything else carries over by
        reference — O(affected files), the same pruning contract as
        the keyed update path (operators/load_ops.py). Returns the
        number of files rewritten."""
        keys = keys.select(*key_cols).dropDuplicates()
        m = self._manifest(schema, table)
        if m.get("partition_by"):
            # hive layouts: per-file rewrite would read bare parquet
            # (partition columns live in the DIRECTORY names, not the
            # files) and lose those values — full filtered rewrite
            # instead, same guard as the keyed-update path
            survivors = self._df_for_manifest(
                m, self._tdir(schema, table)
            ).join(F.broadcast(keys), on=key_cols, how="left_anti")
            self.write(
                schema,
                table,
                survivors,
                partition_by=m["partition_by"],
                bloom_columns=m.get("bloom_columns") or [],
                _expect_base=m.get("_base"),  # loud on concurrent commit
            )
            return len(m["files"])
        tagged = self.read_with_file(schema, table)
        affected = [
            r["_src_file"]
            for r in tagged.join(F.broadcast(keys), on=key_cols, how="left_semi")
            .select("_src_file")
            .distinct()
            .collect()
        ]
        if not affected:
            return 0
        survivors = self.read_files(schema, table, affected).join(
            F.broadcast(keys), on=key_cols, how="left_anti"
        )
        self.replace_files(schema, table, affected, survivors)
        return len(affected)

    def apply_ttl(
        self, schema: str, table: str, ts_col: str, older_than
    ) -> None:
        """MergeTree ``TTL <ts> + INTERVAL`` analogue: expire rows
        whose ``ts_col`` is before ``older_than`` (a
        ``datetime.datetime``). Routed through :meth:`delete_where`,
        so a time-clustered table (the layout the reference's
        ``order_by_ora_data`` exists to produce) expires whole files
        from manifest zone maps with close to zero data scanned."""
        cutoff = older_than.isoformat(sep=" ")
        self.delete_where(schema, table, f"{ts_col} < timestamp'{cutoff}'")

    def deduplicate(
        self, schema: str, table: str, by: list[str] | None = None
    ) -> str:
        """``OPTIMIZE TABLE … DEDUPLICATE [BY col, …]`` analogue:
        rewrite the snapshot keeping one row per full-row value (or
        per ``by`` key, keeping an arbitrary-but-deterministic
        winner: min of the remaining columns). Like CH, this is an
        O(table) rewrite — routine dedup belongs at ingest
        (``operators/dedup.py``); this is the repair tool."""
        # one manifest read feeds BOTH the rewrite input and the CAS
        # base — reading them separately would let an interleaved
        # commit slip between and record a base newer than the data
        m = self._manifest(schema, table)
        df = self._df_for_manifest(m, self._tdir(schema, table))
        if by:
            others = [c for c in df.columns if c not in by]
            # deterministic winner: min(struct(others)) per key group
            agg = df.groupBy(*by).agg(
                F.min(F.struct(*[F.col(c) for c in others])).alias("__w")
            )
            df = agg.select(*by, *[F.col(f"__w.{c}").alias(c) for c in others]) \
                .select(*df.columns)
        else:
            df = df.dropDuplicates()
        return self.write(
            schema,
            table,
            df,
            partition_by=m.get("partition_by") or None,
            bloom_columns=m.get("bloom_columns") or [],
            _expect_base=m.get("_base"),  # maintenance rewrite (r13)
        )
