"""Command-line surface: the `bin/hadoop` analog.

Reference entry points → subcommands:
  hadoop fs -ls/-lsr/-du/-dus/-count/-mkdir/-mv/-cp/-put/-get/-rm/-cat/-stat/-touchz
                                → fs -ls PATH ... (core/fs/FsShell.java)
  hadoop jar streaming.jar -input -output -mapper -reducer
                                → streaming ...   (contrib/streaming StreamJob)
  hadoop distcp [-update] [-overwrite] SRC DST
                                → distcp ...      (tools/DistCp.java)
  hadoop jar examples.jar wordcount/grep/sort
                                → wordcount/grep/sort (examples/*.java)
  (fork) NameNode allocationLog → heat DATA_DIR [QUERY...]

Usage: python -m hadoop_distributed_dynamic_file_system_spark.cli <cmd> ...
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark():
    from .session import get_spark

    return get_spark("hddfs-cli")


def cmd_fs(args: argparse.Namespace) -> int:
    from .fileops import FsShell

    sh = FsShell(_spark())
    op, paths = args.op, args.paths
    if op == "-ls":
        for e in sh.ls(paths[0]):
            kind = "d" if e["is_dir"] else "-"
            print(f"{kind} rep={e['replication']} {e['length']:>12} {e['path']}")
    elif op == "-du":
        for e in sh.du(paths[0]):
            print(f"{e['length']:>12} {e['path']}")
    elif op == "-dus":
        print(sh.dus(paths[0]))
    elif op == "-lsr":
        for e in sh.lsr(paths[0]):
            kind = "d" if e["is_dir"] else "-"
            print(f"{kind} rep={e['replication']} {e['length']:>12} {e['path']}")
    elif op == "-cp":
        sh.cp(paths[0], paths[1])
    elif op == "-put":
        sh.put(paths[0], paths[1])
    elif op == "-get":
        sh.get(paths[0], paths[1])
    elif op == "-count":
        c = sh.count(paths[0])
        print(f"{c['dirs']} {c['files']} {c['bytes']} {paths[0]}")
    elif op == "-mkdir":
        sh.mkdir(paths[0])
    elif op == "-mv":
        sh.mv(paths[0], paths[1])
    elif op == "-rm":
        sh.rm(paths[0], recursive=False)
    elif op == "-rmr":
        sh.rm(paths[0], recursive=True)
    elif op == "-cat":
        sys.stdout.buffer.write(sh.cat(paths[0]))
    elif op == "-text":
        print(sh.text(paths[0]))
    elif op == "-tail":
        sys.stdout.buffer.write(sh.tail(paths[0]))
    elif op == "-chmod":
        sh.chmod(paths[1], paths[0])
    elif op == "-chown":
        owner, _, group = paths[0].partition(":")
        sh.chown(paths[1], owner or None, group or None)
    elif op == "-chgrp":
        sh.chgrp(paths[1], paths[0])
    elif op == "-setrep":
        sh.setrep(paths[1], int(paths[0]))
    elif op == "-expunge":
        sh.expunge()
    elif op == "-stat":
        print(json.dumps(sh.stat(paths[0])))
    elif op == "-touchz":
        sh.touchz(paths[0])
    elif op == "-test":
        return 0 if sh.exists(paths[0]) else 1
    elif op == "-getmerge":
        from .sinks import getmerge

        getmerge(_spark(), paths[0], paths[1])
    else:
        print(f"unknown fs op {op}", file=sys.stderr)
        return 2
    return 0


def cmd_streaming(args: argparse.Namespace) -> int:
    """StreamJob analog (contrib/streaming/.../StreamJob.java:251-284,
    360-371): -input/-output/-mapper/-reducer plus the option-parity
    flags -combiner, -partitioner, -inputformat, -outputformat,
    -inputreader over text files."""
    import re as _re

    from . import pipe as pipe_mod
    from .sinks import write_text
    from .sources import text as text_src

    spark = _spark()

    # -inputformat / -inputreader (StreamJob.java:360-371): class names
    # are accepted fully-qualified or bare
    fmt = (args.input_format or "TextInputFormat").rsplit(".", 1)[-1]
    if args.input_reader:
        # "StreamXmlRecordReader,begin=<page>,end=</page>"
        parts = args.input_reader.split(",")
        opts = dict(kv.split("=", 1) for kv in parts[1:] if "=" in kv)
        df = text_src.read_delimited_records(
            spark, args.input, opts.get("begin", "<"), opts.get("end", ">")
        ).withColumnRenamed("record", "line")
    elif fmt == "KeyValueTextInputFormat":
        df = text_src.read_kv_text(spark, args.input, sep=args.separator)
    else:  # TextInputFormat / LineDoc default
        df = text_src.read_text_lines(spark, args.input)

    if args.files:
        # -file: ship local scripts to the tasks (commands refer to
        # them by basename; resolved executor-side)
        out = pipe_mod.ship_and_pipe(df, args.mapper, args.files,
                                     sep=args.separator,
                                     num_key_fields=args.num_key_fields)
    else:
        out = pipe_mod.pipe(df, args.mapper, sep=args.separator,
                            num_key_fields=args.num_key_fields)

    if args.combiner:
        # -combiner runs map-side on each map task's key-sorted spill
        # (PipeCombiner): sort within the map partitions -- NO shuffle --
        # and pipe through the combiner command
        out = pipe_mod.pipe(out.sortWithinPartitions("key"), args.combiner,
                            sep=args.separator,
                            num_key_fields=args.num_key_fields)

    if args.reducer:
        partitioner = (args.partitioner or "").rsplit(".", 1)[-1]
        if partitioner == "KeyFieldBasedPartitioner":
            # route on the first numKeyFieldsForPartition fields of the
            # key (KeyFieldBasedPartitioner.java:33 + the streaming
            # num.key.fields.for.partition config)
            fields = F.split(F.col("key"), _re.escape(args.separator), -1)
            pk = F.array_join(
                F.slice(fields, 1, args.num_key_fields_for_partition),
                args.separator,
            )
            n = args.num_reduce_tasks or int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            grouped = out.repartition(n, pk).sortWithinPartitions("key")
            out = (pipe_mod.ship_and_pipe(grouped, args.reducer, args.files,
                                          sep=args.separator,
                                          num_key_fields=args.num_key_fields)
                   if args.files else
                   pipe_mod.pipe(grouped, args.reducer, sep=args.separator,
                                 num_key_fields=args.num_key_fields))
        else:  # HashPartitioner default: group by the whole key
            if args.num_reduce_tasks:
                out = out.repartition(args.num_reduce_tasks, F.col("key"))
            if args.files:
                grouped = out.repartition(F.col("key")).sortWithinPartitions("key")
                out = pipe_mod.ship_and_pipe(grouped, args.reducer, args.files,
                                             sep=args.separator,
                                             num_key_fields=args.num_key_fields)
            else:
                out = pipe_mod.pipe_reduce(
                    out, args.reducer, ["key"], sep=args.separator,
                    num_key_fields=args.num_key_fields,
                )

    # -outputformat (StreamJob.java:251-284): text (default) or SequenceFile
    ofmt = (args.output_format or "TextOutputFormat").rsplit(".", 1)[-1]
    if ofmt == "SequenceFileOutputFormat":
        from .sources.sequencefile import write_sequence_file

        write_sequence_file(out, args.output)
    else:
        write_text(out, args.output, sep=args.separator)
    return 0


def cmd_distcp(args: argparse.Namespace) -> int:
    from .fileops import distcp

    r = distcp(_spark(), args.src, args.dst, update=args.update,
               overwrite=args.overwrite, delete=args.delete,
               preserve=args.p)
    print(f"copied={r.copied} skipped={r.skipped} bytes={r.bytes} "
          f"deleted={r.deleted}")
    return 0


def cmd_fsck(args: argparse.Namespace) -> int:
    from .fileops import fsck

    rep = fsck(_spark(), args.path, catalog_rows=args.expect_rows)
    print(f"Status: {rep['status']}")
    print(f" Total files:\t{rep['data_files']}")
    print(f" Footer rows:\t{rep['footer_rows']}")
    for f in rep["corrupt_files"]:
        print(f" CORRUPT:\t{f}")
    for o in rep["orphans"]:
        print(f" ORPHAN:\t{o}")
    if rep["dangling_pointer"]:
        print(f" DANGLING POINTER:\t{rep['dangling_pointer']}")
    return 0 if rep["status"] == "HEALTHY" else 1


def cmd_wordcount(args: argparse.Namespace) -> int:
    from .operators.transforms import word_count
    from .sinks import write_text
    from .sources.text import read_text_lines

    spark = _spark()
    wc = word_count(read_text_lines(spark, args.input), "line")
    write_text(wc.orderBy(F.desc("cnt"), F.asc("word")), args.output)
    return 0


def cmd_grep(args: argparse.Namespace) -> int:
    from .operators.transforms import grep
    from .sinks import write_text
    from .sources.text import read_text_lines

    spark = _spark()
    write_text(grep(read_text_lines(spark, args.input), "line", args.regex),
               args.output)
    return 0


def cmd_sort(args: argparse.Namespace) -> int:
    """Sort example: total-order sort of text lines (optionally by a
    `sort -k` key spec, KeyFieldBasedComparator analog)."""
    from .operators.sort import sort_by_key_spec, total_order_sort
    from .sinks import write_text
    from .sources.text import read_text_lines

    spark = _spark()
    df = read_text_lines(spark, args.input)
    out = (sort_by_key_spec(df, "line", args.key_spec, sep=args.separator)
           if args.key_spec else total_order_sort(df, "line"))
    write_text(out, args.output)
    return 0


def cmd_heat(args: argparse.Namespace) -> int:
    """Run queries through the Engine and print the heat report."""
    from .engine import Engine

    eng = Engine(data_dir=args.data_dir)
    for q in args.query:
        eng.sql(q).collect()
    for row in eng.heat_report():
        print(json.dumps(row))
    return 0


def cmd_export_sql(args: argparse.Namespace) -> int:
    """Cross-engine export: every built-in query carries an equivalent
    ANSI-SQL text (the oracle pair). Emit those as .sql files (or to
    stdout) so the same logic runs on DuckDB/Trino/anything that reads
    the parquet tables — a portability escape hatch the reference's
    compiled jobs never had. No SparkSession needed."""
    import os

    from . import queries as q
    from . import queries_llm  # noqa: F401  (registers its pairs)

    names = args.name or sorted(q.ORACLE)
    missing = [n for n in names if n not in q.ORACLE]
    if missing:
        print(f"no SQL form for: {', '.join(missing)}", file=sys.stderr)
        return 2
    for n in names:
        text = q.ORACLE[n].strip() + "\n"
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            with open(os.path.join(args.out_dir, f"{n}.sql"), "w") as f:
                f.write(f"-- {n}: ANSI-SQL twin of queries()[{n!r}]\n{text}")
        else:
            print(f"-- {n}\n{text}")
    return 0


def cmd_maintain(args: argparse.Namespace) -> int:
    """Daemon tick over one or more frozen indexes (the reference's
    DynamicReplicationMonitor analog, FSNamesystem.java:4389-4560 —
    policy signal read and acted on by the system, not the operator).
    Prints one JSON decision record per table; exit 0 when every tick
    succeeded, 1 if any spec errored."""
    from .operators.maintenance import maintain_indexes

    specs = [
        {
            "table_name": t,
            "modality": args.modality,
            "id_col": args.id_col,
            "compact_threshold": args.threshold,
            "max_files_per_bucket": args.max_files_per_bucket or None,
        }
        for t in args.tables
    ]
    records = maintain_indexes(_spark(), specs, dry_run=args.dry_run)
    for r in records:
        print(json.dumps(r, default=str))
    return 1 if any(r["action"] == "error" for r in records) else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hddfs-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    fs = sub.add_parser("fs", help="FsShell file operations")
    fs.add_argument("op")
    fs.add_argument("paths", nargs="+")
    fs.set_defaults(fn=cmd_fs)

    st = sub.add_parser("streaming", help="Hadoop Streaming analog")
    st.add_argument("-input", dest="input", required=True)
    st.add_argument("-output", dest="output", required=True)
    st.add_argument("-mapper", dest="mapper", required=True)
    st.add_argument("-reducer", dest="reducer", default=None)
    st.add_argument("-numReduceTasks", dest="num_reduce_tasks", type=int, default=0)
    st.add_argument("-separator", dest="separator", default="\t")
    st.add_argument("-numKeyFields", dest="num_key_fields", type=int, default=1)
    st.add_argument("-file", dest="files", action="append", default=[])
    st.add_argument("-combiner", dest="combiner", default=None)
    st.add_argument("-partitioner", dest="partitioner", default=None)
    st.add_argument("-inputformat", dest="input_format", default=None)
    st.add_argument("-outputformat", dest="output_format", default=None)
    st.add_argument("-inputreader", dest="input_reader", default=None)
    st.add_argument("-numKeyFieldsForPartition",
                    dest="num_key_fields_for_partition", type=int, default=1)
    st.set_defaults(fn=cmd_streaming)

    dc = sub.add_parser("distcp", help="parallel tree copy")
    dc.add_argument("src")
    dc.add_argument("dst")
    dc.add_argument("-update", action="store_true")
    dc.add_argument("-overwrite", action="store_true")
    dc.add_argument("-delete", action="store_true",
                    help="remove target files absent from source")
    dc.add_argument("-p", action="store_true",
                    help="preserve mode and mtime")
    dc.set_defaults(fn=cmd_distcp)

    fk = sub.add_parser("fsck", help="table integrity walk")
    fk.add_argument("path")
    fk.add_argument("-expect-rows", dest="expect_rows", type=int,
                    default=None)
    fk.set_defaults(fn=cmd_fsck)

    wc = sub.add_parser("wordcount")
    wc.add_argument("input")
    wc.add_argument("output")
    wc.set_defaults(fn=cmd_wordcount)

    gr = sub.add_parser("grep")
    gr.add_argument("input")
    gr.add_argument("output")
    gr.add_argument("regex")
    gr.set_defaults(fn=cmd_grep)

    so = sub.add_parser("sort")
    so.add_argument("input")
    so.add_argument("output")
    so.add_argument("-k", dest="key_spec", default=None)
    so.add_argument("-separator", dest="separator", default=" ")
    so.set_defaults(fn=cmd_sort)

    ex = sub.add_parser("export-sql", help="emit ANSI-SQL twins of built-in queries")
    ex.add_argument("name", nargs="*")
    ex.add_argument("-o", dest="out_dir", default=None)
    ex.set_defaults(fn=cmd_export_sql)

    he = sub.add_parser("heat", help="access-heat report after queries")
    he.add_argument("data_dir")
    he.add_argument("query", nargs="*")
    he.set_defaults(fn=cmd_heat)

    mt = sub.add_parser(
        "maintain",
        help="index maintenance tick: census, compact if recommended",
    )
    mt.add_argument("tables", nargs="+",
                    help="catalog table name(s) of frozen indexes")
    mt.add_argument("--modality", default="band",
                    choices=["band", "media", "ivf"])
    mt.add_argument("--id-col", dest="id_col", default=None)
    mt.add_argument("--threshold", type=float, default=0.2,
                    help="dead_frac at which compaction fires")
    mt.add_argument("--max-files-per-bucket", dest="max_files_per_bucket",
                    type=int, default=8,
                    help="per-bucket file count at which compaction "
                         "fires (0 disables the fragmentation signal)")
    mt.add_argument("--dry-run", dest="dry_run", action="store_true",
                    help="report decisions without compacting")
    mt.set_defaults(fn=cmd_maintain)
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "fs":
        # FsShell ops are dash-leading (-ls, -mkdir, ...) — argparse
        # would parse them as options; dispatch directly like bin/hadoop
        ns = argparse.Namespace(op=argv[1], paths=argv[2:])
        return cmd_fs(ns)
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
