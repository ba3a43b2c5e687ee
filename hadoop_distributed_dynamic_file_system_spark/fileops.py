"""Distributed file utilities: FsShell / DistCp / DistCh analogs.

Reference surfaces:
- FsShell (core/fs/FsShell.java:1538-1724): -ls -du -count -mv -cp -rm
  -cat -text -tail -mkdir -touchz -test -stat -getmerge ...
- FileSystem API (core/fs/FileSystem.java:327-593).
- DistCp (tools/DistCp.java, 1356 LoC): parallel copy with -update /
  -overwrite semantics → here a Spark job over a file-list DataFrame
  with a mapPartitions copy stage.
- DistCh (tools/DistCh.java): parallel chmod/chown.

Metadata ops run through Hadoop's FileSystem via py4j (works for any
scheme Spark's Hadoop client knows: file://, hdfs://, s3a://...); the
data-plane copy runs in executors via Python I/O for local/NFS paths —
on a cloud deployment swap `_copy_one` for an fsspec/boto call, the
job shape (list → repartition → copy partitions) is the scalable part.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ------------------------------------------------------------- FsShell analog
class FsShell:
    """Catalog/file-op surface backed by Hadoop FileSystem (py4j)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        self._jvm = jvm
        self._conf = jsc.hadoopConfiguration()
        self._fs_cls = jvm.org.apache.hadoop.fs.FileSystem
        self._path_cls = jvm.org.apache.hadoop.fs.Path

    def _fs(self, path: str):
        return self._fs_cls.get(self._path_cls(path).toUri(), self._conf)

    def _p(self, path: str):
        return self._path_cls(path)

    def ls(self, path: str) -> list[dict]:
        fs = self._fs(path)
        out = []
        for st in fs.listStatus(self._p(path)):
            out.append(
                {
                    "path": st.getPath().toString(),
                    "length": st.getLen(),
                    "is_dir": st.isDirectory(),
                    "mod_time": st.getModificationTime(),
                    "replication": st.getReplication(),
                }
            )
        return out

    def lsr(self, path: str) -> list[dict]:
        """-lsr: recursive listing (FsShell.java ls(…, recursive))."""
        out = []
        for entry in self.ls(path):
            out.append(entry)
            if entry["is_dir"]:
                out.extend(self.lsr(entry["path"]))
        return out

    def du(self, path: str) -> list[dict]:
        """-du: per-entry sizes one level down (dirs as subtree sums)."""
        fs = self._fs(path)
        return [
            {
                "path": st.getPath().toString(),
                "length": fs.getContentSummary(st.getPath()).getLength(),
            }
            for st in fs.listStatus(self._p(path))
        ]

    def dus(self, path: str) -> int:
        """-dus: one summary number for the whole subtree."""
        fs = self._fs(path)
        return fs.getContentSummary(self._p(path)).getLength()

    def cp(self, src: str, dst: str) -> bool:
        """-cp: copy within/between filesystems (FileUtil.copy, no
        delete-source)."""
        futil = self._jvm.org.apache.hadoop.fs.FileUtil
        return futil.copy(
            self._fs(src), self._p(src), self._fs(dst), self._p(dst),
            False, self._conf,
        )

    def put(self, local_src: str, dst: str) -> None:
        """-put: local file → target filesystem."""
        self._fs(dst).copyFromLocalFile(self._p(local_src), self._p(dst))

    def get(self, src: str, local_dst: str) -> None:
        """-get: target filesystem → local file."""
        self._fs(src).copyToLocalFile(self._p(src), self._p(local_dst))

    def count(self, path: str) -> dict:
        fs = self._fs(path)
        cs = fs.getContentSummary(self._p(path))
        return {
            "dirs": cs.getDirectoryCount(),
            "files": cs.getFileCount(),
            "bytes": cs.getLength(),
        }

    def mkdir(self, path: str) -> bool:
        return self._fs(path).mkdirs(self._p(path))

    def mv(self, src: str, dst: str) -> bool:
        return self._fs(src).rename(self._p(src), self._p(dst))

    def rm(self, path: str, recursive: bool = False, skip_trash: bool = True) -> bool:
        """-rm/-rmr. With skip_trash=False the path is MOVED into the
        trash directory instead of deleted (FsShell.java delete(): Trash
        checkpoint unless -skipTrash); -expunge clears it."""
        fs = self._fs(path)
        if skip_trash:
            return fs.delete(self._p(path), recursive)
        trash_dir = self._path_cls(fs.getHomeDirectory(), ".Trash/Current")
        fs.mkdirs(trash_dir)
        name = self._p(path).getName()
        return fs.rename(self._p(path), self._path_cls(trash_dir, name))

    def expunge(self) -> bool:
        """-expunge: drop trash checkpoints (FsShell.java:expunge). The
        local/object-store analog removes ~/.Trash under the fs home."""
        fs = self._fs_cls.get(self._conf)
        trash = self._path_cls(fs.getHomeDirectory(), ".Trash")
        return bool(fs.exists(trash)) and bool(fs.delete(trash, True))

    @staticmethod
    def _octal_to_symbolic(mode: str) -> str:
        bits = int(mode, 8)
        sym = ""
        for shift in (6, 3, 0):
            t = (bits >> shift) & 7
            sym += ("r" if t & 4 else "-") + ("w" if t & 2 else "-") + (
                "x" if t & 1 else "-"
            )
        return "-" + sym

    def chmod(self, path: str, mode: str) -> None:
        """-chmod with octal modes (FsShell.java:1538+ / FsShellPermissions).
        Symbolic +x/-w forms are DistCh's job (distch below covers trees)."""
        perm_cls = self._jvm.org.apache.hadoop.fs.permission.FsPermission
        perm = perm_cls.valueOf(self._octal_to_symbolic(mode))
        self._fs(path).setPermission(self._p(path), perm)

    def chown(self, path: str, owner: str | None, group: str | None = None) -> None:
        """-chown OWNER[:GROUP]; pass owner=None for -chgrp."""
        self._fs(path).setOwner(self._p(path), owner, group)

    def chgrp(self, path: str, group: str) -> None:
        self.chown(path, None, group)

    def tail(self, path: str, n_bytes: int = 1024) -> bytes:
        """-tail: last kilobyte of the file (FsShell.java tail())."""
        fs = self._fs(path)
        length = fs.getFileStatus(self._p(path)).getLen()
        stream = fs.open(self._p(path))
        try:
            stream.seek(max(0, length - n_bytes))
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
            return bytes(baos.toByteArray())
        finally:
            stream.close()

    def text(self, path: str, max_records: int = 1_000_000) -> str:
        """-text: decode to text — SequenceFiles ('SEQ' magic) become
        key<TAB>value lines; anything else passes through like -cat.

        This is a driver-side CLI verb (the whole decoded file lands in
        driver memory, like `hadoop fs -text | less`); `max_records`
        bounds the collect so pointing it at a billion-record
        SequenceFile can't OOM the driver. Pipelines should read the
        file as a DataFrame instead, never compose this verb."""
        if self.cat(path, max_bytes=3) == b"SEQ":
            from .sources.sequencefile import read_sequence_file_as_text

            rows = (
                read_sequence_file_as_text(self.spark, path)
                .limit(max_records)
                .collect()
            )
            return "\n".join(f"{r.key}\t{r.value}" for r in rows)
        return self.cat(path).decode("utf-8", errors="replace")

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._p(path))

    def touchz(self, path: str) -> None:
        self._fs(path).create(self._p(path), True).close()

    def stat(self, path: str) -> dict:
        st = self._fs(path).getFileStatus(self._p(path))
        return {
            "length": st.getLen(),
            "is_dir": st.isDirectory(),
            "mod_time": st.getModificationTime(),
            "access_time": st.getAccessTime(),
            "replication": st.getReplication(),
        }

    def setrep(self, path: str, replication: int) -> bool:
        """-setrep: real on HDFS; no-op on local/object stores (the
        hot-set manager is the cache-level analog, hotset.py)."""
        return self._fs(path).setReplication(self._p(path), replication)

    def cat(self, path: str, max_bytes: int = 1 << 20) -> bytes:
        # py4j copies (never mutates) Python byte arrays passed to Java,
        # so the bytes must be accumulated JVM-side and returned whole.
        fs = self._fs(path)
        stream = fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
            return bytes(baos.toByteArray())[:max_bytes]
        finally:
            stream.close()


# ------------------------------------------------------------------- DistCp
@dataclass
class CopyResult:
    copied: int
    skipped: int
    bytes: int
    deleted: int = 0


def _list_files(root: str) -> list[tuple[str, str, int, float]]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for name in files:
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, root)
            st = os.stat(src)
            out.append((src, rel, st.st_size, st.st_mtime))
    return out


def distcp(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    update: bool = False,
    overwrite: bool = False,
    delete: bool = False,
    preserve: bool = False,
    parallelism: int = 32,
) -> CopyResult:
    """DistCp: parallel tree copy as a Spark job.

    The driver lists the tree (cheap metadata pass — the reference's
    sequence-file copy list, DistCp.java 'setup'), the executors move
    bytes. `update` skips same-size existing targets; `overwrite`
    recopies unconditionally. `delete` (-delete, tools/DistCp.java
    deleteNonexistent) removes target files absent from the source
    after the copy — both listings are driver metadata passes, the
    deletes themselves are tiny so they run driver-side. `preserve`
    (-p) carries permission bits and mtime to the target; without it
    the copy writes bytes only, matching the reference's default.
    """
    files = _list_files(src_root)
    fl = spark.createDataFrame(
        files, schema="src string, rel string, size long, mtime double"
    ).repartition(min(parallelism, max(1, len(files))))

    dst = dst_root
    do_update, do_overwrite, do_preserve = update, overwrite, preserve

    def copy_partition(rows):
        copied = skipped = nbytes = 0
        for r in rows:
            target = os.path.join(dst, r.rel)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            if os.path.exists(target) and not do_overwrite:
                if do_update and os.path.getsize(target) == r.size:
                    skipped += 1
                    continue
                if not do_update:
                    skipped += 1
                    continue
            if do_preserve:
                shutil.copy2(r.src, target)  # bytes + mode + mtime
            else:
                shutil.copyfile(r.src, target)  # bytes only
            copied += 1
            nbytes += r.size
        yield (copied, skipped, nbytes)

    stats = fl.rdd.mapPartitions(copy_partition).collect()
    deleted = 0
    if delete:
        src_rels = {f[1] for f in files}
        for _, rel, _, _ in _list_files(dst_root):
            if rel not in src_rels:
                os.remove(os.path.join(dst_root, rel))
                deleted += 1
        # Reference DistCp -delete also removes target-only DIRECTORIES
        # (and the parents a stale file leaves empty): walk bottom-up,
        # dropping any dir whose relative path is absent from the
        # source tree and which is now empty. src_dirs must include
        # EMPTY source directories too (walked directly, not derived
        # from file ancestors) — a placeholder dir that exists in the
        # source with no files must survive in the target.
        src_dirs = {""}
        for cur, _dirnames, _filenames in os.walk(src_root):
            rel = os.path.relpath(cur, src_root)
            if rel != ".":
                src_dirs.add(rel)
        for cur, dirnames, filenames in os.walk(dst_root, topdown=False):
            rel = os.path.relpath(cur, dst_root)
            rel = "" if rel == "." else rel
            if rel and rel not in src_dirs and not os.listdir(cur):
                os.rmdir(cur)
                deleted += 1
    return CopyResult(
        copied=sum(s[0] for s in stats),
        skipped=sum(s[1] for s in stats),
        bytes=sum(s[2] for s in stats),
        deleted=deleted,
    )


def distch(
    spark: SparkSession,
    root: str,
    mode: int | None = None,
    owner: str | None = None,
    group: str | None = None,
    parallelism: int = 32,
) -> int:
    """DistCh (tools/DistCh.java): parallel owner/group/mode change
    over a tree, as a distributed job. Any of the three may be None
    (DistCh's ':'-separated spec leaves blanks unchanged). chown needs
    root, matching the reference's superuser requirement."""
    files = [f[0] for f in _list_files(root)]
    if not files:
        return 0
    rdd = spark.sparkContext.parallelize(files, min(parallelism, len(files)))

    def change(paths):
        import shutil

        n = 0
        for p in paths:
            changed = False
            if mode is not None:
                os.chmod(p, mode)
                changed = True
            if owner is not None or group is not None:
                shutil.chown(p, user=owner, group=group)
                changed = True
            n += int(changed)
        yield n

    return sum(rdd.mapPartitions(change).collect())


def table_report(spark: SparkSession, path: str, fmt: str = "parquet") -> dict:
    """fsck / `hadoop fsck` analog at the table level: file inventory +
    row count + per-partition row distribution (min/max/avg), the
    numbers that tell you a table needs `rebalance_table`."""
    df = spark.read.format(fmt).load(path)
    from pyspark.sql import functions as F  # local to avoid shadowing

    per_part = (
        df.groupBy(F.spark_partition_id().alias("p")).count().agg(
            F.count("*").alias("n_parts"),
            F.min("count").alias("min_rows"),
            F.max("count").alias("max_rows"),
            F.avg("count").alias("avg_rows"),
            F.sum("count").alias("rows"),
        )
    ).collect()[0]
    files = _list_files(path) if os.path.isdir(path) else [(path, "", os.path.getsize(path), 0)]
    return {
        "path": path,
        "files": len(files),
        "bytes": sum(f[2] for f in files),
        "rows": per_part.rows,
        "read_partitions": per_part.n_parts,
        "min_partition_rows": per_part.min_rows,
        "max_partition_rows": per_part.max_rows,
        "avg_partition_rows": round(per_part.avg_rows, 1),
    }


def fsck(
    spark: SparkSession,
    path: str,
    catalog_rows: int | None = None,
) -> dict:
    """fsck analog (hdfs/server/namenode/NamenodeFsck.java): integrity
    walk over a table directory. The reference walks the namespace and
    verifies every block's replicas; the engine-level twin verifies
    every parquet data file's footer (readable metadata = the file's
    row groups are indexed and complete — a truncated or torn write
    fails here without reading data pages), totals footer row counts
    against the catalog's expectation, and audits the CDC upsert-table
    layout (streaming/events.py) for orphans: entries under the table
    root that are neither a version dir (v<N>), the _LATEST pointer,
    nor a data/_SUCCESS file inside a version dir.

    The footer probes run as a Spark job over the file list (one task
    per ~file), so the walk scales with the cluster like the
    reference's block reports, not with one driver thread. Returns a
    report dict; `status` is "HEALTHY" only when nothing is flagged.
    """
    entries = sorted(os.listdir(path)) if os.path.isdir(path) else []
    is_snapshot_table = "_LATEST" in entries
    is_bucketed_table = "_MANIFEST" in entries

    corrupt: list[str] = []
    orphans: list[str] = []
    dangling_pointer = None
    versions: list[str] = []
    unreferenced: list[str] = []

    if is_bucketed_table:
        import json
        import re

        with open(os.path.join(path, "_MANIFEST")) as f:
            manifest = json.load(f)
        committed = {
            f"b{b}": v for b, v in manifest["buckets"].items()
        }
        data_files = []
        for bdir, v in sorted(committed.items()):
            vdir = os.path.join(path, bdir, v)
            if not os.path.isdir(vdir):
                dangling_pointer = f"{bdir}/{v}"
                continue
            versions.append(f"{bdir}/{v}")
            data_files += [
                (os.path.join(vdir, n), os.path.join(bdir, v, n))
                for n in sorted(os.listdir(vdir))
                if n.endswith(".parquet")
            ]
        for e in entries:
            if e == "_MANIFEST":
                continue
            if re.fullmatch(r"b\d+", e) and e in committed:
                # superseded version dirs await vacuum — reported,
                # but not a health failure
                unreferenced += [
                    f"{e}/{v}"
                    for v in sorted(os.listdir(os.path.join(path, e)))
                    if v != committed[e]
                ]
            else:
                # stray staging dirs / unknown entries = torn epoch
                orphans.append(e)
    elif is_snapshot_table:
        import re

        versions = [e for e in entries if re.fullmatch(r"v\d+", e)
                    and os.path.isdir(os.path.join(path, e))]
        with open(os.path.join(path, "_LATEST")) as f:
            current = f.read().strip()
        if current not in versions:
            dangling_pointer = current
        known = set(versions) | {"_LATEST"}
        orphans = [e for e in entries if e not in known]
        data_files = [
            (os.path.join(path, v, name), os.path.join(v, name))
            for v in versions
            for name in sorted(os.listdir(os.path.join(path, v)))
            if name.endswith(".parquet")
        ]
    else:
        data_files = [
            (src, rel)
            for src, rel, _, _ in _list_files(path)
            if rel.endswith(".parquet")
        ]
        if os.path.isfile(path):
            data_files = [(path, os.path.basename(path))]

    footer_rows = 0
    if data_files:
        probes = spark.sparkContext.parallelize(
            data_files, min(32, len(data_files))
        )

        def probe(pairs):
            import pyarrow.parquet as pq

            for src, rel in pairs:
                try:
                    meta = pq.ParquetFile(src).metadata
                    yield (rel, True, meta.num_rows, None)
                except Exception as exc:  # torn/truncated/not-parquet
                    yield (rel, False, 0, str(exc)[:200])

        results = probes.mapPartitions(probe).collect()
        corrupt = [r[0] for r in results if not r[1]]
        if is_bucketed_table:
            footer_rows = sum(r[2] for r in results)
        elif is_snapshot_table and dangling_pointer is None:
            # catalog comparison targets the COMMITTED snapshot; older
            # versions are time-travel history, not current rows
            footer_rows = sum(
                r[2] for r in results if r[0].startswith(current + os.sep)
            )
        else:
            footer_rows = sum(r[2] for r in results)

    rows_match = catalog_rows is None or footer_rows == catalog_rows
    healthy = not corrupt and not orphans and dangling_pointer is None and rows_match
    return {
        "path": path,
        "status": "HEALTHY" if healthy else "CORRUPT",
        "data_files": len(data_files),
        "corrupt_files": corrupt,
        "orphans": orphans,
        "snapshot_versions": versions,
        "unreferenced_versions": unreferenced,
        "dangling_pointer": dangling_pointer,
        "footer_rows": footer_rows,
        "catalog_rows": catalog_rows,
        "rows_match": rows_match,
    }


def rebalance_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_partition_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Balancer analog (hdfs/server/balancer/Balancer.java): the
    reference moved blocks to even out datanode utilization; the
    engine-level twin rewrites a table into evenly sized partitions
    (fixes small-file buildup and skewed partition sizes after
    incremental appends). Returns the new partition count."""
    from .operators.skew import hadoop_fs

    df = spark.read.format(fmt).load(src_path)
    # resolve the filesystem FROM the path (skew.hadoop_fs), not the
    # default FS: listing an s3a://-style src through the default
    # client would fail even though the Spark read above succeeds
    fs, jpath = hadoop_fs(spark, src_path)
    total_bytes = sum(
        f.getLen() for f in fs.listStatus(jpath) if not f.isDirectory()
    )
    n = max(1, round(total_bytes / target_partition_bytes))
    df.repartition(n).write.mode("overwrite").format(fmt).save(dst_path)
    return n


def logalyzer(
    spark: SparkSession, path: str, pattern: str, sort_cols: list[str] | None = None
) -> DataFrame:
    """Logalyzer (tools/Logalyzer.java:64-69,176-217): archive+grep+sort
    → read, regex-filter, count per match, order by chosen columns."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    hits = lines.filter(F.col("line").rlike(pattern))
    counts = hits.groupBy("line").agg(F.count("*").alias("cnt"))
    if sort_cols:
        return counts.orderBy(*sort_cols)
    return counts.orderBy(F.desc("cnt"), F.asc("line"))
