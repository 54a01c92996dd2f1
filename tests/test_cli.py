"""CLI parity: the reference's verb sequence (src/Cli/test.bat style)
driven end-to-end through one shared SparkSession."""

import json

import pytest

from watsondedupe_spark.cli import main


def run(spark, *argv):
    return main(list(argv), spark=spark)


def test_cli_verb_roundtrip(spark, tmp_path, capsys):
    root = str(tmp_path / "idx")
    payload = tmp_path / "payload.bin"
    payload.write_bytes(b"cli " * 2048)

    assert run(spark, root, "create", "--min", "2048", "--max", "16384", "--shift", "128") == 0
    assert run(spark, root, "exists", "--key", "k1") == 1  # miss -> exit 1
    assert run(spark, root, "write", "--key", "k1", "--file", str(payload)) == 0
    assert run(spark, root, "exists", "--key", "k1") == 0
    capsys.readouterr()

    # duplicate write rejected (DedupeLibrary.cs:203), --replace succeeds
    assert run(spark, root, "write", "--key", "k1", "--file", str(payload)) == 2
    assert run(spark, root, "write", "--key", "k1", "--file", str(payload), "--replace") == 0
    capsys.readouterr()

    out = tmp_path / "out.bin"
    assert run(spark, root, "get", "--key", "k1", "--file", str(out)) == 0
    assert out.read_bytes() == payload.read_bytes()

    assert run(spark, root, "md", "--key", "k1") == 0
    md = json.loads(capsys.readouterr().out)
    assert md["object_key"] == "k1"
    assert md["original_length"] == payload.stat().st_size
    assert md["chunk_count"] == len(md["map"])

    assert run(spark, root, "stats") == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["objects"] == 1 and stats["logical_bytes"] == payload.stat().st_size

    assert run(spark, root, "list") == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1 and "\tk1\t" in lines[0]

    assert run(spark, root, "del", "--key", "k1") == 0
    assert run(spark, root, "exists", "--key", "k1") == 1


def test_cli_errors(spark, tmp_path, capsys):
    root = str(tmp_path / "idx2")
    assert run(spark, root, "stats") == 2  # no index yet
    assert run(spark, root, "create") == 0
    assert run(spark, root, "create") == 2  # already exists
    assert run(spark, root, "get", "--key", "missing") == 2
    with pytest.raises(SystemExit):
        run(spark, root, "bogus-verb")
    capsys.readouterr()


def test_optimize_folds_parts_and_preserves_data(spark, tmp_path, capsys):
    import json as _json

    from watsondedupe_spark import cli
    from watsondedupe_spark.engine import DedupeEngine

    root = str(tmp_path / "opt_idx")
    assert cli.main([root, "create"], spark=spark) == 0
    eng = DedupeEngine.open(spark, root)
    for i in range(3):
        eng.write(f"k{i}", (f"payload {i} " * 400).encode())
    before = eng.store._state("objects")["parts"]
    assert len(before) == 3
    assert cli.main([root, "optimize"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    versions = _json.loads(out)
    assert set(versions) == {"objects", "object_map", "chunks", "chunk_store"}
    eng2 = DedupeEngine.open(spark, root)
    assert len(eng2.store._state("objects")["parts"]) == 1
    assert eng2.get("k1") == ("payload 1 " * 400).encode()
    # manifest meta (ingest high-water mark) survives the fold
    assert eng2.store.table_meta("objects")["max_id"] == 3


def test_cli_verify_and_repair(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import functions as F

    from watsondedupe_spark import cli
    from watsondedupe_spark.engine import DedupeEngine

    root = str(tmp_path / "vfy_idx")
    assert cli.main([root, "create"], spark=spark) == 0
    eng = DedupeEngine.open(spark, root)
    eng.write("k0", b"payload zero " * 400)
    assert cli.main([root, "verify"], spark=spark) == 0
    capsys.readouterr()

    # plant a garbage duplicate payload row, then verify flags it
    victim = eng.chunks.agg(F.min("chunk_key")).collect()[0][0]
    eng.store.append(
        "chunk_store",
        spark.createDataFrame(
            [(victim, bytearray(b"x"))], "chunk_key string, data binary"
        ),
    )
    assert cli.main([root, "verify"], spark=spark) == 1
    out = capsys.readouterr().out
    assert "hash_mismatch" in out and victim in out

    assert cli.main([root, "repair"], spark=spark) == 0
    deltas = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert deltas["chunk_store_canonicalized"] == -1
    assert cli.main([root, "verify"], spark=spark) == 0
