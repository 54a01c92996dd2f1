"""Command-line interface — the reference CLI's verbs over the Spark engine.

Re-expresses O25 (/root/reference/src/Cli/Program.cs:136-287: verbs
``create stats write get md del list exists`` over an index, with file or
stdin payloads and stdout output) as a thin argparse layer on
:class:`~watsondedupe_spark.engine.DedupeEngine`. Verb-for-verb parity:

    dedupe <index_root> create [--min N --max N --shift N --boundary N]
    dedupe <index_root> stats
    dedupe <index_root> write  --key K [--file PATH]      (stdin if no file)
    dedupe <index_root> get    --key K [--file PATH]      (stdout if no file)
    dedupe <index_root> md     --key K
    dedupe <index_root> del    --key K
    dedupe <index_root> list   [--prefix P --idxstart N --results N]
    dedupe <index_root> exists --key K

Exit codes: 0 success / truthy, 1 falsy (``exists`` miss), 2 usage or
engine error — matching the reference's console conventions without its
interactive REPL.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from watsondedupe_spark.chunking import ChunkSettings
from watsondedupe_spark.engine import (
    DedupeEngine,
    DuplicateKeyError,
    MAX_LIST_RESULTS,
    ObjectNotFoundError,
    SHARD_CELLS,
)
from watsondedupe_spark.session import get_spark

# verify prints at most this many violation rows (plus exact per-check
# counts computed distributed) — an unbounded collect of a rotten large
# store would be the repo's own no-driver-materialization violation
VERIFY_PRINT_CAP = 10_000


def _parse_shard(text: str) -> tuple[int, int]:
    """argparse type for --shard I/N: a malformed value ('1.5/4', '3',
    '2/0') is an argparse usage error, not a raw traceback."""
    try:
        i_s, n_s = text.split("/", 1)
        i, n = int(i_s), int(n_s)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected I/N with integer I and N, got {text!r}"
        )
    if not (n >= 1 and 0 <= i < n):
        raise argparse.ArgumentTypeError(
            f"shard index {i} out of range for {n} shards"
        )
    if n > SHARD_CELLS:
        raise argparse.ArgumentTypeError(
            f"{n} shards exceeds the {SHARD_CELLS}-cell shard grid "
            f"(use N <= {SHARD_CELLS})"
        )
    return (i, n)


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dedupe", description="content-defined dedupe index (Spark engine)"
    )
    p.add_argument("index_root", help="directory holding the index tables")
    sub = p.add_subparsers(dest="verb", required=True)

    create = sub.add_parser("create", help="initialize a new index")
    create.add_argument("--min", type=int, default=ChunkSettings().min_chunk_size)
    create.add_argument("--max", type=int, default=ChunkSettings().max_chunk_size)
    create.add_argument("--shift", type=int, default=ChunkSettings().shift_count)
    create.add_argument("--boundary", type=int, default=ChunkSettings().boundary_check_bytes)

    sub.add_parser("stats", help="index statistics")

    write = sub.add_parser("write", help="store an object")
    write.add_argument("--key", required=True)
    write.add_argument("--file", help="payload file (default: stdin)")
    write.add_argument("--replace", action="store_true", help="overwrite existing key")

    get = sub.add_parser("get", help="retrieve an object")
    get.add_argument("--key", required=True)
    get.add_argument("--file", help="output file (default: stdout)")

    md = sub.add_parser("md", help="object metadata as JSON")
    md.add_argument("--key", required=True)

    dele = sub.add_parser("del", help="delete an object (prints GC'd chunk keys)")
    dele.add_argument("--key", required=True)

    lst = sub.add_parser("list", help="enumerate objects (keyset-paginated)")
    lst.add_argument("--prefix", default=None)
    lst.add_argument("--idxstart", type=int, default=0)
    lst.add_argument("--results", type=int, default=MAX_LIST_RESULTS)

    exists = sub.add_parser("exists", help="key existence (exit 0 yes / 1 no)")
    exists.add_argument("--key", required=True)

    opt = sub.add_parser(
        "optimize", help="range-cluster each table's parts (OPTIMIZE)"
    )
    opt.add_argument(
        "--incremental",
        action="store_true",
        help="compact only parts appended since the last clustering "
        "pass — O(new bytes), not O(table); the daily job at scale",
    )
    vac = sub.add_parser(
        "vacuum", help="reclaim orphan part dirs (retention-protected VACUUM)"
    )
    vac.add_argument(
        "--grace",
        type=float,
        default=None,
        metavar="SECONDS",
        help="minimum orphan age to remove (default: the store's 1h "
        "in-flight-writer grace; shrink only when no writer can be live)",
    )
    verify = sub.add_parser(
        "verify",
        help="content-address integrity scan (exit 0 clean / 1 violations)",
    )
    verify.add_argument(
        "--since",
        type=int,
        default=None,
        metavar="VERSION",
        help="incremental scrub: payload checks only on chunk keys "
        "added after chunk_store VERSION (the daily scrub at scale)",
    )
    verify.add_argument(
        "--shard",
        type=_parse_shard,
        default=None,
        metavar="I/N",
        help="rolling scrub: cover only the chunks whose key falls in "
        "range cell I of N (union over all N shards covers every chunk "
        "once; ~1/N of the payload IO on an optimized store)",
    )
    verify.add_argument(
        "--consistent",
        action="store_true",
        help="pin the scan to the last consistency point (no torn "
        "cross-table reads while writers are live; takes no lock)",
    )
    sub.add_parser(
        "repair",
        help="recover() + payload-store canonicalization; prints deltas",
    )
    clone = sub.add_parser(
        "clone", help="consistent replica at --dest (backup/DR/migration)"
    )
    clone.add_argument("--dest", required=True)
    clone.add_argument(
        "--backend",
        choices=["file", "sqlite"],
        default=None,
        help="destination store backend (default: same as source)",
    )
    clone.add_argument(
        "--at",
        type=int,
        default=None,
        metavar="SEQ",
        help="point-in-time restore: clone the consistency point with "
        "this ledger sequence number instead of the current state",
    )
    sub.add_parser(
        "checkpoints", help="list the consistency-point ledger (for clone --at)"
    )
    restore = sub.add_parser(
        "restore",
        help="roll the index back to a consistency point IN PLACE "
        "(metadata-only; undoable while history is retained)",
    )
    restore.add_argument("--at", type=int, required=True, metavar="SEQ")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark("dedupe-cli")
        spark.sparkContext.setLogLevel("ERROR")
    try:
        return _dispatch(args, spark)
    except (DuplicateKeyError, ObjectNotFoundError, FileNotFoundError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        if owns_spark:
            spark.stop()


def _dispatch(args: argparse.Namespace, spark) -> int:
    if args.verb == "create":
        DedupeEngine.create(
            spark,
            args.index_root,
            ChunkSettings(args.min, args.max, args.shift, args.boundary),
        )
        print(f"created index at {args.index_root}")
        return 0

    engine = DedupeEngine.open(spark, args.index_root)

    if args.verb == "stats":
        s = engine.stats()
        print(
            json.dumps(
                {
                    "objects": s.object_count,
                    "chunks": s.chunk_count,
                    "logical_bytes": s.logical_bytes,
                    "physical_bytes": s.physical_bytes,
                    "ratio_x": s.ratio_x,
                    "ratio_percent": s.ratio_percent,
                }
            )
        )
        return 0

    if args.verb == "write":
        data = open(args.file, "rb").read() if args.file else sys.stdin.buffer.read()
        if args.replace:
            engine.write_or_replace(args.key, data)
        else:
            engine.write(args.key, data)
        print(f"wrote {len(data)} bytes under {args.key!r}")
        return 0

    if args.verb == "get":
        data = engine.get(args.key)
        if args.file:
            with open(args.file, "wb") as f:
                f.write(data)
        else:
            sys.stdout.buffer.write(data)
        return 0

    if args.verb == "md":
        m = engine.get_metadata(args.key)
        print(
            json.dumps(
                {
                    "id": m.id,
                    "object_key": m.object_key,
                    "original_length": m.original_length,
                    "comp_length": m.comp_length,
                    "chunk_count": m.chunk_count,
                    "created_utc": m.created_utc.isoformat(),
                    "map": [
                        {
                            "chunk_key": r.chunk_key,
                            "position": r.position,
                            "address": r.address,
                            "length": r.length,
                        }
                        for r in m.object_map
                    ],
                }
            )
        )
        return 0

    if args.verb == "del":
        for gc_key in engine.delete(args.key):
            print(gc_key)
        return 0

    if args.verb == "list":
        page = engine.list_objects(args.prefix, args.idxstart, args.results)
        for r in page.objects:
            print(f"{r.id}\t{r.object_key}\t{r.original_length}")
        if page.next_index_start is not None:
            print(f"next: --idxstart {page.next_index_start}", file=sys.stderr)
        return 0

    if args.verb == "exists":
        ok = engine.exists(args.key)
        print("true" if ok else "false")
        return 0 if ok else 1

    if args.verb == "optimize":
        print(json.dumps(engine.optimize(incremental=args.incremental)))
        return 0

    if args.verb == "vacuum":
        print(json.dumps(engine.vacuum(grace_seconds=args.grace)))
        return 0

    if args.verb == "verify":
        # a badly-rotten large store can have O(table) violations — keep
        # the exact accounting distributed (per-check groupBy counts) and
        # collect only a bounded sample of rows to print
        viol = engine.verify(
            since_version=args.since, shards=args.shard, consistent=args.consistent
        )
        counts = {r["check"]: r["n"] for r in viol.groupBy("check").agg(
            F.count("*").alias("n")).collect()}
        total = sum(counts.values())
        sample = viol.limit(VERIFY_PRINT_CAP).collect()
        for r in sample:
            print(f"{r.check}\t{r.key}")
        if total > len(sample):
            print(f"... ({total - len(sample)} more rows not shown)", file=sys.stderr)
        for check, n in sorted(counts.items()):
            print(f"{check}: {n}", file=sys.stderr)
        print(f"{total} violations", file=sys.stderr)
        return 1 if total else 0

    if args.verb == "repair":
        print(json.dumps(engine.repair()))
        return 0

    if args.verb == "clone":
        store_cls = None
        if args.backend:
            from watsondedupe_spark.store import IndexStore, SqliteIndexStore

            store_cls = {"file": IndexStore, "sqlite": SqliteIndexStore}[args.backend]
        engine.clone(args.dest, store_cls=store_cls, at=args.at)
        print(json.dumps({"cloned_to": args.dest, "at": args.at}))
        return 0

    if args.verb == "restore":
        print(json.dumps(engine.restore(args.at)))
        return 0

    if args.verb == "checkpoints":
        for r in engine.checkpoints.orderBy("seq").collect():
            print(
                f"{r.seq}\t{r.op}\t{r.created_utc}\t"
                f"o={r.objects_v} m={r.object_map_v} c={r.chunks_v} s={r.chunk_store_v}"
            )
        return 0

    raise AssertionError(f"unhandled verb {args.verb}")


if __name__ == "__main__":
    sys.exit(main())
