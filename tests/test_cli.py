"""Console-script surface: `python -m openmsistream_spark.cli` and the
subcommand wrappers over pipelines.py (reference pyproject.toml:22-31).
"""

import os
import subprocess
import sys

import pytest

from openmsistream_spark import cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_module_help_runs_without_spark():
    """--help must work as a plain console program (no JVM start)."""
    out = subprocess.run(
        [sys.executable, "-m", "openmsistream_spark.cli", "--help"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    for cmd in (
        "upload-directory",
        "upload-file",
        "download-directory",
        "reproduce-dlq",
    ):
        assert cmd in out.stdout


def test_cli_parser_rejects_missing_topic():
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(["upload-directory", "somewhere"])


def test_cli_upload_download_roundtrip(spark, tmp_path):
    """upload-directory -> download-directory over a parquet topic
    reconstructs byte-identical files; upload-file scopes to one file."""
    watch = tmp_path / "watch"
    (watch / "sub").mkdir(parents=True)
    payload_a = os.urandom(3000)  # spans multiple 1024-byte chunks
    payload_b = b"small file contents\n"
    (watch / "a.bin").write_bytes(payload_a)
    (watch / "sub" / "b.txt").write_bytes(payload_b)
    topic = str(tmp_path / "topic")
    out_dir = str(tmp_path / "out")

    rc = cli.main(
        [
            "upload-directory", str(watch),
            "--topic", topic,
            "--chunk-size", "1024",
        ]
    )
    assert rc == 0
    rc = cli.main(["download-directory", out_dir, "--topic", topic])
    assert rc == 0
    assert (tmp_path / "out" / "a.bin").read_bytes() == payload_a
    assert (tmp_path / "out" / "sub" / "b.txt").read_bytes() == payload_b

    # single-file upload scopes the produce to exactly that file
    topic2 = str(tmp_path / "topic2")
    out2 = str(tmp_path / "out2")
    rc = cli.main(
        [
            "upload-file", str(watch / "a.bin"),
            "--topic", topic2,
            "--chunk-size", "1024",
        ]
    )
    assert rc == 0
    rc = cli.main(["download-directory", out2, "--topic", topic2])
    assert rc == 0
    assert (tmp_path / "out2" / "a.bin").read_bytes() == payload_a
    assert not (tmp_path / "out2" / "sub").exists()
