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
